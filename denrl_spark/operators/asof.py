"""As-of join (no native Spark operator; SURVEY.md §2.5 note).

Two scale-appropriate formulations, semantics-equivalent and
test-asserted against each other:

- ``asof_join_window`` (driver query rel_asof_join uses this shape):
  union-free — an ignore-nulls running ``last_value`` over the
  interleaved stream, ONE shuffle on the by-key. The right default at
  scale: no per-group pandas materialization, plain window codegen.
- ``asof_join_cogroup``: ``groupBy(key).cogroup(...).applyInPandas``
  driving ``pd.merge_asof`` per group — the per-group escape hatch when
  the probe needs pandas-only semantics (tolerance windows, nearest
  rather than backward, multi-column asof). Arrow-batched; each task
  sees one key group's two sides.

Both implement BACKWARD as-of with STRICTLY-earlier matches
(allow_exact_matches=False): each left row picks the latest right row
with ``right.t < left.t`` within the same ``by`` key.

Determinism: duplicate right rows at the same (by, t) are tie-broken to
the MAX value in BOTH variants (the right side is sorted by (t, value)
so the positionally/temporally last row wins), so the two formulations
agree even on non-unique right keys. Null right VALUES are ignored in
both variants (the window's ignore-nulls last skips them; the cogroup
drops them before the merge): a null can never be the as-of result —
it would be indistinguishable from "no earlier row" — so the match is
the latest strictly-earlier NON-NULL value.

The value column's dtype is derived from the right frame, so any
orderable type works; the nullable-Int64 corruption guard (merge_asof
upcasts plain int64 to float64 on unmatched rows, silently corrupting
values past 2^53) is applied exactly when the value type is integral.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str = "t",
    by: str = "user_id",
    value_col: str = "rv",
) -> DataFrame:
    """left + (value_col = latest strictly-earlier right.value per by-key).

    Shape: tag both sides, union, one window over (by, t, side) with the
    right side ordered first at equal t excluded via strict ordering on
    (t), then filter back to left rows. One shuffle total.
    """
    rv_type = dict(right.dtypes)[value_col]
    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(rv_type)
    )
    r_tag = (
        right.select(by, on, F.col(value_col).alias("_rv"))
        .withColumn("_is_left", F.lit(0))
    )
    cols = [by, on, "_is_left", "_rv"]
    extra = [c for c in left.columns if c not in (by, on)]
    unioned = l_tag.select(*cols, *extra).unionByName(
        r_tag.select(*cols, *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in extra])
    )
    # strictly earlier: order by (t, _is_left) so right rows at time t
    # sort AFTER left rows at the same t and are excluded by the -1
    # bound; _rv asc last so ties at the same right (by, t) resolve to
    # the max value deterministically
    w = (
        Window.partitionBy(by)
        .orderBy(on, F.desc("_is_left"), F.asc_nulls_first("_rv"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned.withColumn(
        "_asof", F.last(F.when(F.col("_is_left") == 0, F.col("_rv")), ignorenulls=True).over(w)
    )
    return (
        out.where(F.col("_is_left") == 1)
        .select(by, on, *extra, F.col("_asof").alias(value_col))
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str = "t",
    by: str = "user_id",
    value_col: str = "rv",
) -> DataFrame:
    """Same semantics via cogrouped applyInPandas + pd.merge_asof."""
    rv_type = dict(right.dtypes)[value_col]
    int_like = rv_type in _INT_TYPES
    schema = (
        ", ".join(
            f"{name} {dtype}"
            for name, dtype in left.dtypes
        )
        + f", {value_col} {rv_type}"
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(on).reset_index(drop=True)
        r = (
            r_pdf[[on, value_col]]
            .rename(columns={value_col: "_rv"})
            # null values are ignored (module docstring): the window
            # twin's ignore-nulls last skips them, so drop before the
            # merge or a null positionally-last row would win here
            .dropna(subset=["_rv"])
            # (t, value) sort: merge_asof keeps the positionally-last
            # row per t, so duplicate right (by, t) rows deterministically
            # resolve to the max value — matching the window variant
            .sort_values([on, "_rv"])
            .reset_index(drop=True)
        )
        if r.empty:  # no right rows, or only null-valued ones
            l_pdf[value_col] = (
                pd.array([None] * len(l_pdf), dtype="Int64")
                if int_like
                else pd.Series([None] * len(l_pdf), dtype="object")
            )
            return l_pdf
        if int_like:
            # nullable Int64 BEFORE the merge: merge_asof upcasts plain
            # int64 to float64 when any left row is unmatched, silently
            # corrupting values past 2^53 (hash-sized longs)
            r["_rv"] = r["_rv"].astype("Int64")
        m = pd.merge_asof(
            l_pdf, r, on=on, direction="backward", allow_exact_matches=False
        )
        m[value_col] = m.pop("_rv").astype("Int64") if int_like else m.pop("_rv")
        return m

    return (
        left.groupBy(by)
        .cogroup(right.select(by, on, value_col).groupBy(by))
        .applyInPandas(merge, schema)
    )
