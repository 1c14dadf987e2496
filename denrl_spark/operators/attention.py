"""Target-attention generation (M2) and KL-confidence selection (K11).

- ``target_att`` (run_lstm.py:715-750, the word-level twin of
  run_jointmodel.py:710-764): per instance, an L1-normalized indicator
  over tokens of (token in relation pattern bag-of-words) OR (token is
  entity-tagged, i.e. non-O and no '/'), max-pooled over the instance's
  relations; all-zeros for negative instances; entity-indicator only
  when the instance has no relation tags.
  One Arrow-batched pandas UDF with the (tiny) BoW dict in the closure.

- KL confidence (run_jointmodel.py:1535-1547): ``loss = KL(target_att ||
  position_att).sum(T)`` with the torch KLDivLoss convention (terms with
  target==0 contribute 0), ``confidence = 1/(1+loss)``, select
  ``confidence > threshold`` (0.5 default, README.md:31). This is pure
  float-array column math, so it stays JVM-side via ``zip_with`` +
  ``aggregate`` — no Python in the selection hot path at all.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

THRESHOLD = 0.5  # run_jointmodel.py:211-213


def target_att_py(
    tokens: list[str],
    tags: list[str],
    instance_id: int,
    bow: dict[str, set],
    ent_bow: dict[str, set] | None = None,
    query_id: int = 0,
) -> list[float]:
    """Pure kernel shared with the pytest oracle. ``ent_bow`` activates
    the reference's max_ent_range branch (run_jointmodel.py:739-746): a
    relation-free instance attends to entity tokens PLUS the query
    type's entity-pattern bag-of-words."""
    n = len(tokens)
    if instance_id < 0:
        return [0.0] * n
    relations = {tag[2:] for tag in tags if "B-/" in tag}
    ent = [1.0 if (tg != "O" and "/" not in tg) else 0.0 for tg in tags]
    if not relations:
        if ent_bow is not None:
            qb = ent_bow.get(tags[query_id][2:], ())
            freq = [
                1.0 if (e or tok in qb) else 0.0 for tok, e in zip(tokens, ent)
            ]
        else:
            freq = ent
    else:
        freq = [0.0] * n
        for r in relations:
            rb = bow.get(r, ())
            for i, (tok, e) in enumerate(zip(tokens, ent)):
                if e or tok in rb:
                    freq[i] = 1.0
    s = sum(freq)
    return [f / s for f in freq] if s else freq


def with_target_att(
    instances: DataFrame,
    bow: dict[str, set],
    col_name: str = "target_att",
    ent_bow: dict[str, set] | None = None,
) -> DataFrame:
    bow = {k: set(v) for k, v in bow.items()}
    ent_bow = {k: set(v) for k, v in ent_bow.items()} if ent_bow else None

    @F.pandas_udf("array<float>")
    def gen(
        tokens: pd.Series, tags: pd.Series, iid: pd.Series, qid: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                target_att_py(list(t), list(g), int(i), bow, ent_bow, int(q))
                for t, g, i, q in zip(tokens, tags, iid, qid)
            ]
        )

    return instances.withColumn(
        col_name, gen("tokens", "ner_tags", "instance_id", "query_id")
    )


def kl_divergence(target_col: str, pa_col: str) -> Column:
    """sum_i t_i * (ln t_i - ln p_i), zero where t_i == 0 — JVM-side.

    p_i == 0 at a position with t_i > 0 contributes +Infinity (torch
    KLDivLoss convention: confidence 1/(1+KL) -> 0, never selected).
    Spark's log(0) is NULL, which would otherwise propagate NULL through
    the whole sum and silently drop the row from BOTH selected and
    not-selected filters — hence the explicit -inf substitution."""
    neg_inf = F.lit(float("-inf"))
    terms = F.zip_with(
        F.col(target_col),
        F.col(pa_col),
        lambda t, p: F.when(
            t > 0,
            t * (F.log(t) - F.when(p > 0, F.log(p)).otherwise(neg_inf)),
        ).otherwise(F.lit(0.0)),
    )
    return F.aggregate(terms, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def with_kl_confidence(
    df: DataFrame,
    target_col: str = "target_att",
    pa_col: str = "position_att",
    threshold: float = THRESHOLD,
) -> DataFrame:
    """Adds kl_loss, confidence, selected columns (K11)."""
    out = df.withColumn("kl_loss", kl_divergence(target_col, pa_col))
    out = out.withColumn("confidence", 1.0 / (1.0 + F.col("kl_loss")))
    return out.withColumn("selected", F.col("confidence") > threshold)
