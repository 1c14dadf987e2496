"""Relation-pattern mining: extraction (M3), top-k selection (A2),
bag-of-words (A4), pattern matcher (J1/J2), bounded pattern growth (U4).

Reference semantics transcribed:

- ``pattern_extract`` (run_jointmodel.py:1657-1713): per instance, for
  every non-O span (relation- OR entity-tagged — the reference keys
  patterns by ``tag[2:]`` whatever the tag), the pattern is the token
  string strictly between the query span and the target span, with the
  target's own I- continuation tokens trimmed (the ``pop(0)`` loop) and
  the query's I- continuation tracked via ``query_end``.
- ``handle_patterns`` (1749-1784): per relation, count patterns and keep
  the top ``min(int(0.1 * n_distinct), 20)``; when that k computes to 0
  ALL patterns are kept (``Counter.most_common()`` with no arg).
  Reference breaks count ties by insertion order; the rebuild breaks
  them by (count desc, pattern asc) so results are partition-invariant —
  the oracle uses the same rule.
- ``pattern_matcher`` (1786-1818): J1 = semi-join instances' extracted
  patterns against the selected pattern set on (relation, pattern);
  J2 = promote entity-only instances whose query position equals a
  selected pattern's query/target position in the same sentence. The
  reference's ``pattern2target`` keeps the LAST instance per (relation,
  pattern) (dict overwrite); the rebuild keeps the max by canonical
  order (conv_id, turn_idx, query_id) via max_by.
- growth cap (1901-1910): at most ``max_new_patterns`` (default 5)
  unseen patterns per relation per bootstrap round, in frequency order.

Spark shape: one scalar pandas UDF for extraction -> ``explode``; top-k
is groupBy + window row_number; matching is broadcast semi-joins (the
pattern set is tiny). Nothing here materializes driver state bigger
than the pattern set itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

MAX_NEW_PATTERNS = 5  # run_jointmodel.py:226-228
TOPK_CAP = 20  # max_size, run_jointmodel.py:1749


def extract_patterns_py(tokens: list[str], tags: list[str], query_id: int) -> list[dict]:
    """Pure transcription of pattern_extract's inner loop for one
    instance (run_jointmodel.py:1657-1708)."""
    query_end = query_id
    inst: dict[int, dict] = {}
    tmp_index = target_start = None
    for index, tag in enumerate(tags):
        if tag == "O":
            continue
        prefix = tag[:2]
        if index < query_id:
            if prefix == "B-":
                inst[index] = {"patterns": list(tokens[index + 1 : query_id]), "target_id": index}
                tmp_index = index
                target_start = index
            elif tmp_index is not None and index == tmp_index + 1:
                inst[target_start]["patterns"].pop(0)
                tmp_index += 1
        elif index > query_id:
            if prefix == "I-" and index == query_end + 1:
                query_end += 1
            elif prefix == "B-":
                inst[index] = {"patterns": list(tokens[query_end + 1 : index]), "target_id": index}
    return [
        {
            "relation": tags[k][2:],
            "pattern": " ".join(v["patterns"]),
            "target_id": v["target_id"],
        }
        if "patterns" in v
        else {"relation": tags[k][2:], "pattern": "", "target_id": 0}
        for k, v in inst.items()
    ]


PATTERN_ROW_SCHEMA = (
    "conv_id string, turn_idx int, sent_id bigint, instance_id bigint, "
    "query_id int, relation string, pattern string, target_id int"
)


def extract_patterns(instances: DataFrame, tags_col: str = "ner_tags") -> DataFrame:
    """Instance table -> exploded (instance, relation, pattern, target_id)
    rows. Only non-negative instances and non-empty patterns survive,
    matching handle_patterns' ``if pt:`` guard (run_jointmodel.py:1760)."""
    cols = instances.select(
        "conv_id", "turn_idx", "sent_id", "instance_id", "query_id", "tokens", tags_col
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.instance_id < 0:
                    continue
                for d in extract_patterns_py(list(r.tokens), list(getattr(r, tags_col)), int(r.query_id)):
                    rows.append(
                        (
                            r.conv_id,
                            int(r.turn_idx),
                            int(r.sent_id),
                            int(r.instance_id),
                            int(r.query_id),
                            d["relation"],
                            d["pattern"],
                            int(d["target_id"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "sent_id", "instance_id",
                    "query_id", "relation", "pattern", "target_id",
                ],
            )

    return cols.mapInPandas(gen, PATTERN_ROW_SCHEMA).where(F.col("pattern") != "")


def extract_ent_patterns_py(
    tokens: list[str], tags: list[str], query_id: int, max_ent_range: int
) -> list[dict]:
    """M4 (ent_pattern_extract, run_jointmodel.py:1623-1655): context
    windows of up to ``max_ent_range`` tokens before/after the query
    span, keyed by the query's entity type; the query's own I-
    continuation extends the span end before the post-window starts."""
    query_tag = tags[query_id][2:]
    query_end = query_id
    pre, post = [], []
    for index, tag in enumerate(tags):
        if index < query_id and query_id - index <= max_ent_range:
            pre.append(tokens[index])
        elif index > query_id:
            if tag != "O" and tag[:2] == "I-" and index == query_end + 1:
                query_end += 1
            elif index - query_end <= max_ent_range:
                post.append(tokens[index])
    return [
        {"entity": query_tag, "pattern": " ".join(p)}
        for p in (pre, post)
        if p
    ]


ENT_PATTERN_ROW_SCHEMA = (
    "conv_id string, turn_idx int, sent_id bigint, instance_id bigint, "
    "query_id int, entity string, pattern string"
)


def extract_ent_patterns(
    instances: DataFrame, max_ent_range: int = 4, tags_col: str = "ner_tags"
) -> DataFrame:
    """Instance table -> exploded (instance, entity, pattern) rows
    (optional feature, gated by max_ent_range in the reference,
    run_jointmodel.py:229-232). Top-k selection reuses topk_patterns on
    the ``entity`` column renamed to ``relation`` (A3 == A2 with
    max_size 20, run_jointmodel.py:1715-1747)."""
    cols = instances.select(
        "conv_id", "turn_idx", "sent_id", "instance_id", "query_id", "tokens", tags_col
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.instance_id < 0:
                    continue
                for d in extract_ent_patterns_py(
                    list(r.tokens), list(getattr(r, tags_col)), int(r.query_id), max_ent_range
                ):
                    rows.append(
                        (
                            r.conv_id, int(r.turn_idx), int(r.sent_id),
                            int(r.instance_id), int(r.query_id),
                            d["entity"], d["pattern"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "sent_id", "instance_id",
                    "query_id", "entity", "pattern",
                ],
            )

    return cols.mapInPandas(gen, ENT_PATTERN_ROW_SCHEMA).where(F.col("pattern") != "")


def pattern_counts(raw_patterns: DataFrame) -> DataFrame:
    """A2/A8: (relation, pattern, cnt) with a deterministic rank."""
    w = Window.partitionBy("relation").orderBy(F.desc("cnt"), F.asc("pattern"))
    return (
        raw_patterns.groupBy("relation", "pattern")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
    )


def topk_patterns(raw_patterns: DataFrame, cap: int = TOPK_CAP) -> DataFrame:
    """A2 top-k seed: per relation keep min(int(0.1*distinct), cap)
    most-frequent patterns; k==0 keeps everything
    (run_jointmodel.py:1774-1778)."""
    counts = pattern_counts(raw_patterns)
    k = (
        counts.groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .withColumn("k", F.least(F.floor(0.1 * F.col("n_distinct")), F.lit(cap)))
    )
    return (
        counts.join(F.broadcast(k), "relation")
        .where((F.col("k") == 0) | (F.col("rank") <= F.col("k")))
        .select("relation", "pattern", "cnt", "rank")
    )


def relation_bow(pattern_set: DataFrame) -> DataFrame:
    """A4: pattern set -> (relation, token) distinct bag-of-words with
    frequencies (relation_bow, run_jointmodel.py:1406-1419). Frequencies
    count pattern-list occurrences, i.e. each selected pattern once."""
    toks = pattern_set.select(
        "relation", F.explode(F.split("pattern", " ")).alias("token")
    ).where(F.col("token") != "")
    return toks.groupBy("relation", "token").agg(F.count(F.lit(1)).alias("freq"))


def pattern2target(raw_patterns: DataFrame) -> DataFrame:
    """(relation, pattern) -> single (sent_id, query_id, target_id): the
    reference keeps the last writer (dict overwrite, 1765-1767); rebuild
    keeps max by canonical order for determinism."""
    # ord must be a TOTAL order: one instance can emit the same
    # (relation, pattern) toward two different targets, so without
    # target_id in the key max_by breaks ties arbitrarily per
    # partitioning — exactly where this function promises determinism
    ordered = raw_patterns.withColumn(
        "ord",
        F.struct(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("query_id"),
            F.col("target_id"),
        ),
    )
    return ordered.groupBy("relation", "pattern").agg(
        F.max_by(F.struct("sent_id", "query_id", "target_id"), F.col("ord")).alias("t")
    ).select("relation", "pattern", "t.sent_id", "t.query_id", "t.target_id")


def match_instances(
    instances: DataFrame,
    raw_patterns: DataFrame,
    pattern_set: DataFrame,
) -> DataFrame:
    """pattern_matcher (J1+J2, run_jointmodel.py:1786-1818): returns the
    matched instance-id DataFrame (column ``instance_id``).

    J1: instances whose extracted (relation, pattern) is in the set.
    J2: entity-only instances (no '/' tag) whose (sent_id, query_id)
    coincides with a selected pattern's recorded query/target position.
    """
    pset = F.broadcast(pattern_set.select("relation", "pattern"))
    j1 = (
        raw_patterns.join(pset, ["relation", "pattern"], "left_semi")
        .select("instance_id")
        .distinct()
    )

    p2t = pattern2target(raw_patterns).join(pset, ["relation", "pattern"], "left_semi")
    sent_targets = (
        p2t.select("sent_id", F.explode(F.array("query_id", "target_id")).alias("pos"))
        .distinct()
    )
    ent_instances = instances.where(
        ~F.exists("ner_tags", lambda t: t.contains("/"))
    ).select("instance_id", "sent_id", "query_id")
    j2 = (
        ent_instances.join(
            F.broadcast(sent_targets),
            (ent_instances.sent_id == sent_targets.sent_id)
            & (ent_instances.query_id == sent_targets.pos),
            "left_semi",
        )
        .select("instance_id")
        .distinct()
    )
    return j1.unionByName(j2).distinct()


def grow_pattern_set(
    pattern_set: DataFrame,
    new_counts: DataFrame,
    max_new: int = MAX_NEW_PATTERNS,
) -> DataFrame:
    """U4 (run_jointmodel.py:1901-1910): append at most ``max_new``
    unseen patterns per relation, in frequency order, to the set."""
    unseen = new_counts.join(
        pattern_set.select("relation", "pattern"), ["relation", "pattern"], "left_anti"
    )
    w = Window.partitionBy("relation").orderBy(F.desc("cnt"), F.asc("pattern"))
    picked = (
        unseen.withColumn("new_rank", F.row_number().over(w))
        .where(F.col("new_rank") <= max_new)
        .select("relation", "pattern", "cnt", F.lit(None).cast("int").alias("rank"))
    )
    return pattern_set.select("relation", "pattern", "cnt", "rank").unionByName(picked)
