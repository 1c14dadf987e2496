"""Negative sampling (M5/J3/U1/O1) — seeded, partition-invariant.

Reference (run_jointmodel.py:1436-1507): for every matched instance,
make a negative twin with all-O tags, a random query position NOT used
by any instance of the same sentence, and ``instanceID := -insID - 1``;
keep usable twins (query != -100), sample ``sample_rate`` (default 0.1,
README.md:30) of them without replacement, union with the positives and
sort by sentence.

Rebuild differences (documented, SURVEY.md §7 "seeded randomness"):
- ``random.choice`` -> the usable position at index
  ``stable_id(seed, instance_id) % n_usable`` of the sorted usable list,
  so the choice is reproducible across partitionings.
- ``np.random.choice(n, int(rate*n))`` -> rank-by-hash: keep rows whose
  ``row_number()`` over ``xxhash64(instance_id, seed)`` is ``<=
  floor(rate * n)`` — exact sample size, deterministic, one extra
  aggregate. (At extreme scale use ``hash % k < rate*k`` instead and
  accept a binomial-sized sample; ``exact=False`` switches to that.)
- global ``sort('sentID')`` -> the reference only needs sentence
  grouping, not total order (SURVEY.md §2.6 O1); downstream stages here
  group by sent_id themselves, so no global sort is issued.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from denrl_spark.operators.tagging import stable_id

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

    def rewrite(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                toks = list(r.tokens)
                used = set(r.used_q)
                usable = [i for i in range(len(toks)) if i not in used]
                if not usable:
                    q = -100
                else:
                    q = usable[stable_id(seed, int(r.instance_id)) % len(usable)]
                out.append(
                    (
                        r.conv_id,
                        int(r.turn_idx),
                        int(r.sent_id),
                        -int(r.instance_id) - 1,
                        q,
                        toks,
                        ["O"] * len(toks),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "conv_id", "turn_idx", "sent_id", "instance_id",
                    "query_id", "tokens", "ner_tags",
                ],
            )

    neg = base.mapInPandas(
        rewrite,
        "conv_id string, turn_idx int, sent_id bigint, instance_id bigint, "
        "query_id int, tokens array<string>, ner_tags array<string>",
    ).where(F.col("query_id") != -100)  # F5 usable-negative filter

    if exact:
        # cache: the count() and the row_number job would otherwise both
        # re-run the negative-twin UDF and its upstream join
        neg = neg.cache()
        w = Window.orderBy(F.xxhash64("instance_id", F.lit(seed)))
        n = neg.count()
        take = int(sample_rate * n)
        sampled = (
            neg.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= take)
            .drop("rn")
        )
        if take == 0:  # reference: empty idx -> keep all usable negatives
            sampled = neg
    else:
        denom = 1_000_000
        sampled = neg.where(
            F.pmod(F.xxhash64("instance_id", F.lit(seed)), F.lit(denom))
            < int(sample_rate * denom)
        )

    cols = ["conv_id", "turn_idx", "sent_id", "instance_id", "query_id", "tokens", "ner_tags"]
    return instances.select(*cols).unionByName(sampled.select(*cols))
