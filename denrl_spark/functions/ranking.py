"""Distributed exact global ranking — no single-partition exchange.

A global ``row_number() OVER (ORDER BY ...)`` funnels the whole table
through ONE task (Spark plans it as Exchange SinglePartition + sort) —
the classic scale-killer for dense global ids. This module computes the
same dense 0-based rank distributively:

1. ``repartitionByRange`` on the order columns — partitions become
   ordered, non-overlapping intervals (range boundaries come from
   sampling, but rank correctness is independent of WHERE the
   boundaries land, only that partitions are ordered);
2. sort within partitions;
3. ``monotonically_increasing_id`` exposes (partition id, local row
   number) in its bit layout;
4. one tiny per-partition-count collect turns local numbers into
   global offsets.

Same construction as the distributed exact sampler in
operators/negatives.py; factored here for reuse by vocab building (and
any other dense-id assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_global_row_number(
    df: DataFrame, order_exprs: list[Column], out_col: str = "global_rn"
) -> DataFrame:
    """Returns ``df`` + ``out_col`` = dense 0-based rank by
    ``order_exprs`` (must be a total order for deterministic ids). The
    result is localCheckpoint-ed: the layout must be pinned so the
    count job and the consumer see identical ranks."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism * 2
    ranged = (
        df.repartitionByRange(n_parts, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", 33))
        .withColumn("_local_rn", F.col("_mid").bitwiseAND((1 << 33) - 1))
        .drop("_mid")
        .localCheckpoint()
    )
    pc = ranged.groupBy("_pid").count().collect()
    acc, offsets = 0, {}
    for pid, cnt in sorted((r["_pid"], r["count"]) for r in pc):
        offsets[pid] = acc
        acc += cnt
    limits = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "_pid long, _offset long",
    )
    return (
        ranged.join(F.broadcast(limits), "_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_local_rn"))
        .drop("_pid", "_local_rn", "_offset")
    )


def weighted_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k per group
    (Efraimidis-Spirakis A-ES): each row draws u ~ Uniform(0,1] from a
    content hash of its id and keeps key = ln(u)/w — the k LARGEST keys
    per group are a faithful weight-proportional sample. Reproducible
    under any partitioning and cluster size (the randomness is the
    row's own hash, not a seed stream), and the same construction runs
    in ANSI SQL for the oracle twin.

    u is built from the first 48 bits of md5 (exact in a double on
    both engines); the only cross-engine nondeterminism left is a
    sub-ULP ln/divide difference flipping the rank of two keys that
    are bit-adjacent — measure-zero for continuous weights.

    Weights MUST be > 0 and non-NULL (A-ES precondition: a negative
    weight flips the key sign and would always win; a NULL weight has
    no defined inclusion probability) — enforced with a per-row
    raise_error, not silently. The error string coalesces a NULL
    weight to the literal 'NULL' (concat with a NULL operand would
    otherwise null out the whole diagnostic and surface as a
    message-less job failure).

    Exact two-phase top-k, not one window per group: with a
    low-cardinality group column a single window funnels each group's
    ENTIRE row set through one task (the skew shape this module
    exists to eliminate). Phase 1 takes the local top-k within every
    (group, input-partition) slice — bounded by partition size; the
    true global top-k rows each survive their own partition by
    definition. Phase 2 re-ranks the <= k x n_partitions survivors
    per group — a tiny window."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("double")
    u = (h + 1) / F.lit(float(2**48) + 1.0)
    key = F.when(
        F.col(weight_col) > 0, F.log(u) / F.col(weight_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_sample requires positive weights; got "),
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    keyed = df.select(
        F.col(group_col), F.col(id_col), key.alias("_key"),
        F.spark_partition_id().alias("_p"),
    )
    local = Window.partitionBy(group_col, "_p").orderBy(
        F.desc("_key"), F.col(id_col)
    )
    survivors = (
        keyed.withColumn("_lrn", F.row_number().over(local))
        .where(F.col("_lrn") <= k)
    )
    final = Window.partitionBy(group_col).orderBy(F.desc("_key"), F.col(id_col))
    return (
        survivors.withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= k)
        .select(group_col, id_col)
    )
