"""Negative sampling (M5/J3/U1/O1) — seeded, partition-invariant.

Reference (run_jointmodel.py:1436-1507): for every matched instance,
make a negative twin with all-O tags, a random query position NOT used
by any instance of the same sentence, and ``instanceID := -insID - 1``;
keep usable twins (query != -100), sample ``sample_rate`` (default 0.1,
README.md:30) of them without replacement, union with the positives and
sort by sentence.

Rebuild differences (documented, SURVEY.md §7 "seeded randomness"):
- ``random.choice`` -> the usable position at index
  ``xxhash64(seed, instance_id) % n_usable`` of the ascending usable
  list, so the choice is reproducible across partitionings AND
  computable entirely JVM-side (array HOFs — the twin rewrite is pure
  whole-stage-codegen expressions, no Python stage; the previous
  formulation looped over rows inside mapInPandas and keyed the choice
  with blake2b, which has no JVM builtin).
- ``np.random.choice(n, int(rate*n))`` -> rank-by-hash: keep the
  globally-smallest ``floor(rate * n)`` rows ordered by
  ``(xxhash64(instance_id, seed), instance_id)`` — exact sample size,
  deterministic under any partitioning. Computed distributively (range
  partition on the hash + per-partition offsets), never as a
  single-partition global sort. (``exact=False`` switches to the
  one-pass ``hash % k < rate*k`` threshold with a binomial-sized
  sample — the cheapest shape when +-sqrt(n) sample-size jitter is
  acceptable.)
- global ``sort('sentID')`` -> the reference only needs sentence
  grouping, not total order (SURVEY.md §2.6 O1); downstream stages here
  group by sent_id themselves, so no global sort is issued.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SAMPLE_RATE = 0.1  # run_jointmodel.py:214


def negative_sampling(
    instances: DataFrame,
    sample_rate: float = SAMPLE_RATE,
    seed: int = 42,
    exact: bool = True,
) -> DataFrame:
    """Returns positives unioned with sampled negative twins."""
    sent_queries = instances.groupBy("sent_id").agg(
        F.collect_set("query_id").alias("used_q")
    )
    base = instances.join(sent_queries, "sent_id")

    # Twin rewrite, entirely JVM-side (runs every bootstrap round over
    # all matched instances — keeping it inside whole-stage codegen
    # matters): usable = ascending positions not claimed by any positive
    # of the sentence; choice = usable[xxhash64(seed, instance_id) % n].
    # sequence(0, n-1) DESCENDS when n < 1, hence the explicit guard.
    toks_n = F.size("tokens")
    usable = F.when(toks_n < 1, F.array().cast("array<int>")).otherwise(
        F.filter(
            F.sequence(F.lit(0), toks_n - 1),
            lambda i: ~F.array_contains("used_q", i),
        )
    )
    choice = F.element_at(
        usable,
        (
            F.pmod(F.xxhash64(F.lit(seed), "instance_id"), F.size(usable)) + 1
        ).cast("int"),
    )
    q = F.when(F.size(usable) == 0, F.lit(-100)).otherwise(choice).cast("int")
    neg = base.select(
        "conv_id",
        "turn_idx",
        "sent_id",
        (-F.col("instance_id") - 1).alias("instance_id"),
        q.alias("query_id"),
        "tokens",
        F.array_repeat(F.lit("O"), toks_n).alias("ner_tags"),
    ).where(F.col("query_id") != -100)  # F5 usable-negative filter

    if exact:
        # Distributed exact sample: keep the globally-smallest
        # floor(rate*n) rows by (xxhash64(instance_id, seed), instance_id)
        # WITHOUT a single-partition global sort. Range-partition on the
        # hash key (partitions are then ordered intervals), sort within
        # partitions, localCheckpoint to pin the layout, and derive each
        # row's global rank as per-partition offset + local row number —
        # the local number comes free from monotonically_increasing_id
        # (pid in the upper bits, partition-local counter in the lower
        # 33). Everything stays JVM-side; the only driver traffic is one
        # tiny per-partition count collect.
        spark = instances.sparkSession
        n_parts = spark.sparkContext.defaultParallelism * 2
        ranged = (
            neg.withColumn("hkey", F.xxhash64("instance_id", F.lit(seed)))
            .repartitionByRange(n_parts, "hkey", "instance_id")
            .sortWithinPartitions("hkey", "instance_id")
            .withColumn("mid", F.monotonically_increasing_id())
            .withColumn("pid", F.shiftright("mid", 33))
            .withColumn("local_rn", F.col("mid").bitwiseAND((1 << 33) - 1))
            .drop("mid")
            .localCheckpoint()  # pin partition layout: the counts job and
            # the filter job must see identical ranks
        )
        pc = ranged.groupBy("pid").count().collect()
        n = sum(r["count"] for r in pc)
        take = int(sample_rate * n)
        if take == 0:  # reference: empty idx -> keep all usable negatives
            sampled = ranged.drop("hkey", "pid", "local_rn")
        else:
            acc, offsets = 0, {}
            for pid, cnt in sorted((r["pid"], r["count"]) for r in pc):
                offsets[pid] = acc
                acc += cnt
            limits = spark.createDataFrame(
                [(int(pid), int(take - off)) for pid, off in offsets.items()],
                "pid long, local_limit long",
            )
            sampled = (
                ranged.join(F.broadcast(limits), "pid")
                .where(F.col("local_rn") < F.col("local_limit"))
                .drop("hkey", "pid", "local_rn", "local_limit")
            )
    else:
        denom = 1_000_000
        sampled = neg.where(
            F.pmod(F.xxhash64("instance_id", F.lit(seed)), F.lit(denom))
            < int(sample_rate * denom)
        )

    cols = ["conv_id", "turn_idx", "sent_id", "instance_id", "query_id", "tokens", "ner_tags"]
    return instances.select(*cols).unionByName(sampled.select(*cols))
