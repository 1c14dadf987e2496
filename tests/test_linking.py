"""Entity canonicalization (connected components) + graph materialize."""

from pyspark.sql import functions as F

from denrl_spark.operators.graph import materialize_graph
from denrl_spark.operators.linking import (
    canonicalize,
    connected_components,
    extract_mentions,
)
from denrl_spark.operators.spans import assemble_triples
from denrl_spark.operators.tagging import build_instances
from denrl_spark.sources.corpus import transcripts
from denrl_spark.sources.kb import KB

KBD = KB.default()


def test_connected_components_chain_and_star(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "node_id long")
    # chain 1-2-3-4-5, star 6<-7,8,9; 10 isolated
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 6), (8, 6), (9, 6)], "src long, dst long"
    )
    comp = {r["node_id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert {comp[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {comp[i] for i in (6, 7, 8, 9)} == {6}
    assert comp[10] == 10


def test_canonicalize_merges_case_and_punct_variants(spark):
    trips = spark.createDataFrame(
        [
            (1, "Alice Johnson", "PERSON", "new york", "/p/lived"),
            (2, "alice  johnson", "PERSON", "New-York", "/p/lived"),
            (3, "alice johnson!", "PERSON", "paris", "/p/lived"),
        ],
        "sent_id long, ent1 string, ent1_tag string, ent2 string, ent2_tag string",
    )
    cmap = canonicalize(trips)
    rows = cmap.collect()
    alice = {r["surface"]: r["canonical_id"] for r in rows if "lice" in r["surface"]}
    assert len(set(alice.values())) == 1 and len(alice) == 3
    ny = {r["surface"]: r["canonical_id"] for r in rows if "ork" in r["surface"]}
    assert len(set(ny.values())) == 1 and len(ny) == 2
    # paris distinct from the others
    all_ids = {r["canonical_id"] for r in rows}
    assert len(all_ids) == 3


def test_canonicalize_fast_path_matches_cc_fixpoint(spark):
    """The no-alias star shortcut must equal the general CC path run on
    the same (star-only) graph."""
    trips = spark.createDataFrame(
        [
            (1, "Alice Johnson", "PERSON", "new york", "/p/lived"),
            (2, "alice  johnson", "PERSON", "New-York", "/p/lived"),
            (3, "alice johnson!", "PERSON", "paris", "/p/lived"),
        ],
        "sent_id long, ent1 string, ent1_tag string, ent2 string, ent2_tag string",
    )
    fast = canonicalize(trips)
    empty_alias = spark.createDataFrame([], "src long, dst long")
    general = canonicalize(trips, alias_edges=empty_alias)
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, general.collect()))
    assert a == b


def test_canonicalize_alias_edges_merge_across_norms(spark):
    trips = spark.createDataFrame(
        [
            (1, "nyc", "LOCATION", "alice", "/p/lived"),
            (2, "new york", "LOCATION", "bob", "/p/lived"),
        ],
        "sent_id long, ent1 string, ent1_tag string, ent2 string, ent2_tag string",
    )
    m = {r["surface"]: r["mention_id"] for r in extract_mentions(trips).collect()}
    alias = spark.createDataFrame(
        [(m["nyc"], m["new york"])], "src long, dst long"
    )
    cmap = {r["surface"]: r["canonical_surface"] for r in canonicalize(trips, alias_edges=alias).collect()}
    assert cmap["nyc"] == cmap["new york"]
    assert cmap["alice"] != cmap["nyc"]


def test_materialize_graph_end_to_end(spark):
    tr = transcripts(spark, 40, seed=42)
    ins = build_instances(tr, KBD).cache()
    trips = assemble_triples(ins).cache()
    vertices, edges = materialize_graph(trips)
    v, e = vertices.cache(), edges.cache()
    assert v.count() > 0 and e.count() > 0
    # every edge endpoint exists in vertices
    missing = (
        e.select(F.col("src_id").alias("canonical_id"))
        .unionByName(e.select(F.col("dst_id").alias("canonical_id")))
        .distinct()
        .join(v, "canonical_id", "left_anti")
        .count()
    )
    assert missing == 0
    # only '/'-relation predicates in the edge table
    assert e.where(~F.col("pred").contains("/")).count() == 0
    # n_obs aggregates duplicates
    assert e.agg(F.max("n_obs")).collect()[0][0] >= 1


def test_materialize_graph_no_unbounded_broadcast(spark):
    """With broadcast joins disabled entirely, materialize_graph must
    still plan and run (shuffle join): the mention map is 10^8+ rows at
    corpus scale, so the operator may not REQUIRE a broadcast. The
    explicit-hint-free join lets AQE choose broadcast when small."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        tr = transcripts(spark, 30, seed=7)
        trips = assemble_triples(build_instances(tr, KBD)).cache()
        _, edges = materialize_graph(trips)
        assert edges.count() > 0
        plan = edges._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_tool_edges(spark):
    """Tool turns' entity touches aggregate into (tool, pred, surface)
    edges; Python-recomputed oracle over the same corpus."""
    from denrl_spark.operators.graph import R_TOOL_TOUCHES, tool_edges

    tr = transcripts(spark, 40, seed=42).cache()
    got = {
        (r["tool"], r["surface"]): (r["n_obs"], r["n_convs"], r["pred"], r["etype"])
        for r in tool_edges(tr, KBD).collect()
    }
    # independent recomputation
    expect = {}
    convs = {}
    for row in tr.where("tool is not null").collect():
        toks = row["text"].split(" ")
        grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        for g in grams:
            if g in KBD.entity_type:
                k = (row["tool"], g)
                expect[k] = expect.get(k, 0) + 1
                convs.setdefault(k, set()).add(row["conv_id"])
    assert len(got) == len(expect) > 0
    for k, n in expect.items():
        n_obs, n_convs, pred, etype = got[k]
        assert (n_obs, n_convs) == (n, len(convs[k])), k
        assert pred == R_TOOL_TOUCHES and etype == KBD.entity_type[k[1]]


def test_tool_edges_derives_ngram_cap_from_kb(spark):
    """A 3-token KB surface is matched — the n-gram explode derives its
    cap from the longest surface instead of a fixed 1/2-gram window."""
    from denrl_spark.operators.graph import tool_edges
    from denrl_spark.sources.kb import KB

    kb3 = KB({"new york city": "LOC", "york": "LOC"}, frozenset(), {})
    tr = spark.createDataFrame(
        [
            ("c1", "maps", "visit new york city today"),
            ("c2", "maps", "new york city new york city"),
            ("c3", "search", "york alone"),
        ],
        "conv_id string, tool string, text string",
    )
    got = {
        (r["tool"], r["surface"]): (r["n_obs"], r["n_convs"])
        for r in tool_edges(tr, kb3).collect()
    }
    assert got == {
        ("maps", "new york city"): (3, 2),  # 1 in c1 + 2 in c2
        ("maps", "york"): (3, 2),
        ("search", "york"): (1, 1),
    }
