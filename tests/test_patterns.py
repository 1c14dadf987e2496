"""Pattern mining (M3/A2/A4), matcher (J1/J2), negative sampling (M5)."""

from collections import Counter

from pyspark.sql import functions as F

from denrl_spark.operators.negatives import negative_sampling
from denrl_spark.operators.patterns import (
    extract_patterns,
    extract_patterns_py,
    grow_pattern_set,
    match_instances,
    pattern_counts,
    relation_bow,
    topk_patterns,
)
from denrl_spark.operators.tagging import build_instances
from denrl_spark.sources.corpus import transcripts
from denrl_spark.sources.kb import KB

KBD = KB.default()


def test_extract_patterns_py_basic():
    # query "alice johnson" at 0-1, tail "new york" at 4-5
    toks = "alice johnson lived near new york today".split()
    tags = ["B-PERSON", "I-PERSON", "O", "O", "B-/p/lived", "I-/p/lived", "O"]
    pats = extract_patterns_py(toks, tags, 0)
    assert pats == [{"relation": "/p/lived", "pattern": "lived near", "target_id": 4}]


def test_extract_patterns_py_tail_before_query():
    # tail "new york" at 0-1 (relation tag), query "alice" at 4
    toks = "new york hosted poet alice gladly".split()
    tags = ["B-/l/c", "I-/l/c", "O", "O", "B-PERSON", "O"]
    pats = extract_patterns_py(toks, tags, 4)
    # pattern = tokens strictly between tail end and query start
    assert pats == [{"relation": "/l/c", "pattern": "hosted poet", "target_id": 0}]


def test_extract_patterns_includes_entity_targets():
    # non-related entity span also becomes a 'relation' keyed by its tag[2:]
    toks = "bob met paris today".split()
    tags = ["B-PERSON", "O", "B-LOCATION", "O"]
    pats = extract_patterns_py(toks, tags, 0)
    assert pats == [{"relation": "LOCATION", "pattern": "met", "target_id": 2}]


def _corpus_instances(spark, n=60, seed=42):
    tr = transcripts(spark, n, seed=seed)
    return build_instances(tr, KBD).cache()


def test_topk_matches_reference_rule(spark):
    ins = _corpus_instances(spark)
    raw = extract_patterns(ins).cache()
    topk = topk_patterns(raw)
    got = {
        (r["relation"], r["pattern"]): r["cnt"] for r in topk.collect()
    }
    # driver-side recomputation with the reference rule
    rows = raw.select("relation", "pattern").collect()
    per_rel = {}
    for r in rows:
        per_rel.setdefault(r["relation"], []).append(r["pattern"])
    exp = {}
    for rel, pats in per_rel.items():
        cnt = Counter(pats)
        k = min(int(0.1 * len(set(pats))), 20)
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        chosen = ordered if k == 0 else ordered[:k]
        for p, c in chosen:
            exp[(rel, p)] = c
    assert got == exp and len(exp) > 0


def test_relation_bow(spark):
    ins = _corpus_instances(spark)
    raw = extract_patterns(ins)
    pset = topk_patterns(raw).cache()
    bow = relation_bow(pset)
    row = bow.where(F.col("token") == "").count()
    assert row == 0
    # every bow token appears in some selected pattern of that relation
    joined = bow.join(pset, "relation").where(
        F.array_contains(F.split("pattern", " "), F.col("token"))
    )
    assert joined.select("relation", "token").distinct().count() == bow.count()


def test_matcher_j1_subset_and_j2_entities(spark):
    ins = _corpus_instances(spark)
    raw = extract_patterns(ins).cache()
    pset = topk_patterns(raw).cache()
    matched = match_instances(ins, raw, pset).cache()
    assert matched.count() > 0
    # all matched ids exist in the instance table
    assert matched.join(ins, "instance_id", "left_anti").count() == 0
    # J1 instances: every instance whose pattern is in the set is matched
    j1 = raw.join(pset.select("relation", "pattern"), ["relation", "pattern"], "left_semi")
    missing = j1.select("instance_id").distinct().join(matched, "instance_id", "left_anti")
    assert missing.count() == 0


def test_grow_pattern_set_cap(spark):
    ins = _corpus_instances(spark)
    raw = extract_patterns(ins).cache()
    pset = topk_patterns(raw).cache()
    counts = pattern_counts(raw)
    grown = grow_pattern_set(pset, counts, max_new=5).cache()
    added = grown.count() - pset.count()
    n_rel = counts.select("relation").distinct().count()
    assert 0 < added <= 5 * n_rel
    # no duplicates introduced
    assert grown.groupBy("relation", "pattern").count().where("count>1").count() == 0


def test_negative_sampling(spark):
    ins = _corpus_instances(spark)
    out = negative_sampling(ins, sample_rate=0.1, seed=42).cache()
    pos_n = ins.count()
    neg = out.where(F.col("instance_id") < 0).cache()
    n_neg = neg.count()
    assert out.count() == pos_n + n_neg
    assert n_neg > 0
    # all-O tags on negatives, query not used by any positive of the sentence
    assert neg.where(F.exists("ner_tags", lambda t: t != "O")).count() == 0
    used = ins.groupBy("sent_id").agg(F.collect_set("query_id").alias("uq"))
    bad = neg.join(used, "sent_id").where(
        F.array_contains("uq", F.col("query_id"))
    )
    assert bad.count() == 0
    # deterministic across partitionings
    out2 = negative_sampling(ins.repartition(13), sample_rate=0.1, seed=42)
    a = sorted(r["instance_id"] for r in out.select("instance_id").collect())
    b = sorted(r["instance_id"] for r in out2.select("instance_id").collect())
    assert a == b
    # the exact sample must never funnel through one task: no
    # single-partition exchange anywhere in the executed plan
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_negative_sampling_twin_choice_oracle(spark):
    """Cross-check of the JVM twin rewrite: recompute the query choice in
    plain Python — usable = ascending positions not used by any positive
    of the sentence, choice = usable[xxhash64(seed, instance_id) % n] —
    and compare per negative. Only the raw hash value is taken from the
    JVM (xxhash64 has no portable Python twin); the usable-set and
    indexing logic are derived independently. Also asserts the rewrite
    has NO Python stage in its physical plan (the point of the
    rewrite, VERDICT r2 #6)."""
    # checkpoint the input so the upstream instance-building Python
    # stages drop out of the plan — the no-Python assert below must see
    # only the twin rewrite itself
    ins = _corpus_instances(spark).localCheckpoint()
    seed = 42
    all_neg = negative_sampling(ins, sample_rate=1.0, seed=seed).where(
        F.col("instance_id") < 0
    )
    got = {
        int(r["instance_id"]): (int(r["query_id"]), len(r["tokens"]))
        for r in all_neg.select("instance_id", "query_id", "tokens").collect()
    }
    used = {
        int(r["sent_id"]): set(r["uq"])
        for r in ins.groupBy("sent_id")
        .agg(F.collect_set("query_id").alias("uq"))
        .collect()
    }
    hashes = {
        int(r["instance_id"]): int(r["h"])
        for r in ins.select(
            "instance_id", F.xxhash64(F.lit(seed), "instance_id").alias("h")
        ).collect()
    }
    n_checked = 0
    for r in ins.select("instance_id", "sent_id", F.size("tokens").alias("n")).collect():
        usable = [i for i in range(r["n"]) if i not in used[int(r["sent_id"])]]
        neg_id = -int(r["instance_id"]) - 1
        if not usable:
            assert neg_id not in got  # filtered as unusable
            continue
        expect_q = usable[hashes[int(r["instance_id"])] % len(usable)]
        assert got[neg_id][0] == expect_q
        n_checked += 1
    assert n_checked > 0

    plan = all_neg._jdf.queryExecution().executedPlan().toString()
    for marker in (
        "ArrowEvalPython",
        "BatchEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
        "FlatMapCoGroupsInPandas",
    ):
        assert marker not in plan, marker


def test_negative_sampling_hash_threshold_variant(spark):
    # exact=False: one-pass hash threshold — binomial size, deterministic,
    # and a subset of the usable-negative pool
    ins = _corpus_instances(spark)
    out = negative_sampling(ins, sample_rate=0.3, seed=7, exact=False).cache()
    neg = out.where(F.col("instance_id") < 0)
    n_neg = neg.count()
    assert n_neg > 0
    out2 = negative_sampling(ins.repartition(5), sample_rate=0.3, seed=7, exact=False)
    a = sorted(r["instance_id"] for r in out.select("instance_id").collect())
    b = sorted(r["instance_id"] for r in out2.select("instance_id").collect())
    assert a == b


def test_negative_sampling_zero_take_keeps_all(spark):
    # reference quirk: int(rate*n) == 0 -> keep ALL usable negatives
    ins = _corpus_instances(spark)
    out = negative_sampling(ins, sample_rate=1e-12, seed=42).cache()
    all_usable = negative_sampling(ins, sample_rate=1.0, seed=42).where(
        F.col("instance_id") < 0
    ).count()
    assert out.where(F.col("instance_id") < 0).count() == all_usable
