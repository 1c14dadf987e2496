"""Driver-contract registry: named queries (Spark) + matching DuckDB
oracle SQL, consumed by ``__spark_entry__.py``.

Each entry exercises one or more operators from SURVEY.md §2 (tagged in
the docstrings below). Spark callables take (spark, sf_dir) and return a
DataFrame; oracle SQL runs on the driver's pre-registered DuckDB views
(region nation customer supplier part orders lineitem events documents
embeddings). Column names and types are aligned on both sides; ratio /
score outputs are integer-scaled (floor(1e6*x)) to make value-hash
comparison exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from denrl_spark.functions import textops
from denrl_spark.functions import similarity
from denrl_spark.functions.similarity import cosine_topk, lsh_near_dup_pairs, lsh_topk
from denrl_spark.plans import docs_kg

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Raw engine-keyed paths, exercised by bench.py and pytest but NOT part of
# the driver contract. Rationale (VERDICT r3 item 7): these four are the
# blake2b/xxhash64-keyed twins of the hash-green *_by_doc registry entries
# — the engine-internal content-hash keys cannot be value-hashed
# cross-engine, so in the contract they could only ever be rows-only
# checks of paths whose FULL semantics the *_by_doc variants already
# hash-verify (same fused extraction, same materialize_graph, re-keyed
# through _sent_doc_map). Keeping them contract-registered added four
# permanent `no_oracle` entries for zero extra verification; here they
# stay benchmarked and pytest-equality-checked against their oracled
# twins (tests/test_docs_kg_oracle.py::test_raw_paths_match_by_doc_twins).
RAW_QUERIES: dict[str, QueryFn] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _raw(name: str):
    def deco(fn: QueryFn) -> QueryFn:
        RAW_QUERIES[name] = fn
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table scan; the text/vector tables are lifted to cluster
    parallelism when they arrive as fewer splits than cores. The driver
    testdata is ONE parquet file per table, which pins the scan stage to
    a single task — fatal where per-row compute dominates (measured:
    the shingle stage of dedup_lsh_pairs ran 3.5s on one task at
    sf0.1/32c; with the lift the full query is ~1.8s vs 6.8s). The
    relational tables are deliberately NOT lifted: their scans are
    bandwidth-bound simple expressions where the repartition shuffle
    costs more than the single task (measured rel_agg_stats 0.4s ->
    0.7s). Same rationale as docs_kg.load_documents; a no-op at
    production scale where every table has >= cores splits. The split
    count probe is cached per (path, cores) — see
    docs_kg.lift_to_parallelism (r6: ~0.11s driver stall per probe)."""
    d = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        d = docs_kg.lift_to_parallelism(d, f"{sf_dir}/{name}.parquet")
    return d


# --------------------------------------------------------------------------
# KG stages over the documents-derived corpus (SURVEY.md §2.3/2.4/2.5)
# --------------------------------------------------------------------------

_q("kg_distant_pairs", docs_kg.distant_pairs_sql())(docs_kg.distant_pairs)
_q("kg_patterns_between", docs_kg.patterns_between_sql())(docs_kg.patterns_between)
_q("kg_topk_patterns", docs_kg.topk_patterns_docs_sql())(docs_kg.topk_patterns_docs)
# Flagship extraction path, hash-verified: the full fused gold pipeline
# re-keyed to doc_id, plus the canonicalized graph built from it. The
# DuckDB twins re-derive the semantics relationally (single-token KB =>
# span grouping degenerates to SQL; see docs_kg._gold_triples_cte).
_q("kg_gold_triples_by_doc", docs_kg.gold_triples_by_doc_sql())(
    docs_kg.gold_triples_by_doc
)
_q("kg_pred_triples_by_doc", docs_kg.gold_triples_by_doc_sql())(
    docs_kg.pred_triples_by_doc
)
# The same prediction semantics routed through the NUMERIC reference
# chain (K1 frozen GPT-2 encoder -> K2 position-attention kernel -> K3
# emissions -> K6 Viterbi), with a liveness filter that drops instances
# whose kernel output is not a proper distribution — a broken encoder
# changes the row set and fails the oracle (VERDICT r4 item 5).
_q("kg_pred_triples_numeric_by_doc", docs_kg.gold_triples_by_doc_sql())(
    docs_kg.pred_triples_numeric_by_doc
)
_q("kg_edges_by_doc", docs_kg.edges_by_doc_sql())(docs_kg.edges_by_doc)
_q("kg_vertices_by_doc", docs_kg.vertices_by_doc_sql())(docs_kg.vertices_by_doc)


@_raw("kg_gold_triples")  # full DENRL label path, blake2b sent_id keys
def kg_gold_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from denrl_spark.operators.fused import extract_triples_fused

    tr = docs_kg.transcripts_from_documents(spark, sf_dir)
    # n_partitions=0: the lifted documents scan is already at cluster
    # parallelism; skip the redundant hash exchange (guide §2.4)
    return extract_triples_fused(tr, docs_kg.docs_kb(), mode="gold", n_partitions=0)


@_raw("kg_pred_triples")  # scored prediction path, fused fast path
def kg_pred_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from denrl_spark.operators.fused import extract_triples_fused

    tr = docs_kg.transcripts_from_documents(spark, sf_dir)
    return extract_triples_fused(tr, docs_kg.docs_kb(), mode="pred", n_partitions=0)


@_raw("kg_gold_triples_modular")  # modular operator chain (tests
def kg_gold_triples_modular(spark: SparkSession, sf_dir: str) -> DataFrame:
    # assert fused == modular, this keeps both exercised by the driver
    from denrl_spark.operators.spans import assemble_triples
    from denrl_spark.operators.tagging import build_instances

    tr = docs_kg.transcripts_from_documents(spark, sf_dir)
    ins = build_instances(tr, docs_kg.docs_kb())
    return assemble_triples(ins)


@_raw("kg_edges")  # canonicalized KG edge table, engine-internal ids
def kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from denrl_spark.operators.graph import materialize_graph

    # LAZILY-materialized cache (r6; was cache + count). The r3 race —
    # concurrent subtrees of one action each re-running the Python
    # extraction (~19s vs ~6s) — cannot occur under eager="edges",
    # because materialize_graph SERIALIZES the two triple consumers: the
    # mention-map cache+count job populates this cache first (single
    # subtree), and the edges-checkpoint job then reads it warm. Dropping
    # the explicit count() removes one full pass over the triples
    # (~0.6s at sf0.1/32c). The cache (not localCheckpoint) is still
    # load-bearing: a checkpointed RDD scan reports bogus size estimates
    # that once made the planner broadcast the 3.9M-row TRIPLES side of
    # the canonical-map join; the InMemoryRelation gives exact stats, so
    # the small mention map is broadcast and the big side shuffles — the
    # right join at every scale.
    trips = kg_gold_triples(spark, sf_dir).cache()
    # eager="edges": edges come back materialized (localCheckpoint) so
    # both caches (triples here, mention map inside) can be released
    # before returning — repeated invocations in a long session no
    # longer accumulate InMemoryRelations (ADVICE r2).
    _, edges = materialize_graph(trips, eager="edges")
    trips.unpersist()
    return edges


# --------------------------------------------------------------------------
# Graph analytics over the canonical KG (stage-6 consumers; the reference
# stops at edge materialization — these are the questions its users ask next)
# --------------------------------------------------------------------------

_q("kg_edge_history", docs_kg.edge_history_sql())(docs_kg.edge_history)
# speaker-role edge provenance: who asserted the fact (user vs
# assistant) — the transcript-native KG dimension (docs_kg.edges_by_role)
_q("kg_edges_by_role", docs_kg.edges_by_role_sql())(docs_kg.edges_by_role)
# tool-usage edges over deterministic tool-call turns — the `tool` input
# modality (operators/graph.py:tool_edges) under the cross-engine oracle
_q("kg_tool_edges", docs_kg.tool_edges_sql())(docs_kg.tool_edges_docs)


ADJ_MAX_NEIGHBORS = 64


@_q(
    "kg_adjacency",
    f"""
    WITH edges AS ({{edges_sql}}),
    ranked AS (
      SELECT src_surface, pred || '>' || dst_surface AS nbr,
             row_number() OVER (PARTITION BY src_surface
                                ORDER BY pred || '>' || dst_surface) AS rn,
             count(*) OVER (PARTITION BY src_surface) AS n_edges
      FROM edges)
    SELECT src_surface,
           string_agg(nbr, ',' ORDER BY nbr) AS neighbors_csv,
           CAST(max(n_edges) AS BIGINT) AS n_edges
    FROM ranked WHERE rn <= {ADJ_MAX_NEIGHBORS} GROUP BY 1
    """.format(edges_sql=docs_kg.edges_by_doc_sql()),
)
def kg_adjacency(spark, sf_dir):
    """Adjacency-list export of the canonical KG (graph-serving shape):
    per source vertex, the first ADJ_MAX_NEIGHBORS 'pred>dst' strings
    in sorted order as one deterministic scalar, plus the TRUE total
    edge count (so a capped row is detectable: n_edges > list length).
    The fan-out cap is applied with a window rank BEFORE collect_list,
    so per-key aggregation state is bounded — an uncapped hub vertex
    (10^7+ edges) would otherwise materialize its whole neighbor set
    in one aggregation buffer, the unbounded-per-key-state shape this
    engine bans at 100 TB. Serving exports cap fan-out for the same
    reason."""
    e = docs_kg.edges_by_doc(spark, sf_dir).select(
        "src_surface", F.concat_ws(">", "pred", "dst_surface").alias("nbr")
    )
    w = Window.partitionBy("src_surface").orderBy("nbr")
    wc = Window.partitionBy("src_surface")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n_edges", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") <= ADJ_MAX_NEIGHBORS)
        .groupBy("src_surface")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("nbr"))).alias(
                "neighbors_csv"
            ),
            F.max("n_edges").alias("n_edges"),
        )
    )


@_q("kg_degree", docs_kg.degree_sql())
def kg_degree(spark, sf_dir):
    """Per-vertex degree centrality over the canonical edge table — one
    union + one map-side-combined agg (graph_analytics.degrees)."""
    from denrl_spark.operators.graph_analytics import degrees

    return degrees(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_two_hop", docs_kg.two_hop_sql())
def kg_two_hop(spark, sf_dir):
    """2-hop reachability with path counts/weights — edge self-join on
    the middle vertex (AQE splits skewed middles), one agg."""
    from denrl_spark.operators.graph_analytics import two_hop

    return two_hop(docs_kg.edges_by_doc(spark, sf_dir))


# Time-respecting 2-hop over the edge validity intervals — the
# temporal-causality reachability static two_hop can't express.
_q("kg_temporal_two_hop", docs_kg.temporal_two_hop_sql())(
    docs_kg.temporal_two_hop
)


@_q("kg_motifs", docs_kg.motif_census_sql())
def kg_motifs(spark, sf_dir):
    """Directed triad census (cycle vs feed-forward loop) at instance
    grain — the direction-aware structure signal undirected triangles
    can't see; two equi-join chains over the once-materialized
    distinct pair set."""
    from denrl_spark.operators.graph_analytics import motif_census

    return motif_census(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_triangles", docs_kg.triangles_sql())
def kg_triangles(spark, sf_dir):
    """Triangle enumeration, compact-forward oriented (va<vb<vc, each
    triangle once) — two equi-joins over the oriented distinct edges."""
    from denrl_spark.operators.graph_analytics import triangles

    return triangles(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_components", docs_kg.components_sql())
def kg_components(spark, sf_dir):
    """Connected components of the canonical KG (the same O(diameter)
    min-label propagation the entity-linking stage uses, strict
    convergence guard); component = min surface, deterministic."""
    from denrl_spark.operators.graph_analytics import components

    return components(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_link_prediction", docs_kg.link_prediction_sql())
def kg_link_prediction(spark, sf_dir):
    """Link-prediction candidates: non-adjacent pairs ranked by common
    neighbors + resource-allocation index in exact integer units
    (1e12 div deg — order-independent aggregate, unlike Adamic-Adar's
    float 1/ln(deg))."""
    from denrl_spark.operators.graph_analytics import link_prediction_ra

    return link_prediction_ra(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_pagerank", docs_kg.pagerank_sql())
def kg_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (3 rounds, d=0.85, dangling mass
    dropped), driver-looped with per-round eager checkpoints. The
    registered variant is the EXACT integer fixed-point recurrence
    (order-independent sums — a double-sum rank could flip floor() by
    an ULP between engines and partitionings); the float twin is
    pytest-verified against a numpy loop. The DuckDB oracle unrolls
    the identical integer recurrence into chained CTEs."""
    from denrl_spark.operators.graph_analytics import pagerank_fixedpoint

    return pagerank_fixedpoint(docs_kg.edges_by_doc(spark, sf_dir), iters=3)


@_q("kg_hits", docs_kg.hits_sql())
def kg_hits(spark, sf_dir):
    """Fixed-round HITS hubs/authorities (2 rounds, h0 = 1) over the
    canonical edge table — the directed-importance complement of
    PageRank (a vertex can be a strong hub without being an authority,
    which degree and PageRank both conflate). Unnormalized exact-bigint
    recurrence: per-round normalization is a positive scalar that does
    not change the ranking, and omitting it keeps every aggregate an
    order-independent integer sum, so the DuckDB twin (same rounds
    unrolled into chained CTEs) matches at hash level. Same
    O(1)-lineage checkpoint loop as kg_pagerank."""
    from denrl_spark.operators.graph_analytics import hits_scores

    return hits_scores(docs_kg.edges_by_doc(spark, sf_dir), rounds=2)


@_q("kg_katz", docs_kg.katz_sql())
def kg_katz(spark, sf_dir):
    """Truncated Katz centrality (3 rounds, alpha = 1/4) in exact
    integer fixed-point over the canonical edge table — the
    walk-count influence signal PageRank's out-degree normalization
    can't express (a prolific source dilutes its PageRank
    contributions; Katz credits every attenuated walk). Attenuation is
    one integer division per round AFTER the inflow sum, so every
    aggregate is an order-independent bigint sum and the unrolled
    chained-CTE twin matches at hash level. Same O(1)-lineage
    per-round-checkpoint loop as kg_pagerank / kg_hits."""
    from denrl_spark.operators.graph_analytics import katz_scores

    return katz_scores(docs_kg.edges_by_doc(spark, sf_dir), rounds=3)


@_q("kg_stress", docs_kg.stress_sql())
def kg_stress(spark, sf_dir):
    """Stress centrality (the betweenness-family signal in exact
    integer form): # shortest paths from a deterministic 4-root sample
    passing through each vertex, depth-truncated at 4 — betweenness
    proper accumulates sigma-ratio rationals (cross-engine float
    hazard); stress factorizes as sigma * phi with both factors exact
    bigint recurrences (Brandes two-pass, Shimbel's measure). Forward
    = root-keyed MS-BFS with per-level sigma sums; backward = per-level
    DAG-successor phi sums; unrolled chained-CTE twin; O(1)-lineage
    checkpoint loop; root sample size is the linear scale knob
    (Brandes–Pich pivot sampling at fleet scale)."""
    from denrl_spark.operators.graph_analytics import stress_scores

    return stress_scores(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_neighbor_jaccard", docs_kg.neighbor_jaccard_sql())
def kg_neighbor_jaccard(spark, sf_dir):
    """Neighborhood-Jaccard entity similarity (exact counts + integer
    1e-6 Jaccard units) — the structural-equivalence signal for
    candidate duplicate entities canonicalization can't merge by
    surface form. Adjacency self-join on the shared neighbor (AQE
    splits hot middles), map-side-combined agg, no cartesian."""
    from denrl_spark.operators.graph_analytics import neighbor_jaccard

    return neighbor_jaccard(docs_kg.edges_by_doc(spark, sf_dir))


def _min_vertex_seed(e):
    """Deterministic traversal seed shared by kg_bfs / kg_sssp: the
    minimum vertex surface of the edge table (one tiny scalar
    aggregate; None on an empty graph — callers return the empty frame
    their oracle produces)."""
    return e.agg(
        F.least(F.min("src_surface"), F.min("dst_surface")).alias("s")
    ).collect()[0]["s"]


@_q("kg_bfs", docs_kg.bfs_sql())
def kg_bfs(spark, sf_dir):
    """Multi-source BFS hop distances from the minimum vertex surface
    (deterministic seed): driver-looped min-distance propagation with
    per-round eager checkpoints and early exit at fixpoint; the DuckDB
    twin is a depth-bounded recursive closure + min(d). Converged min
    distances are unique, so fixpoint output is engine-independent;
    BOTH engines now fail loudly at diameter > 40 (bfs_distances
    raises RuntimeError, the twin raises via error() — ADVICE r4)."""
    from denrl_spark.operators.graph_analytics import bfs_distances

    e = docs_kg.edges_by_doc(spark, sf_dir).localCheckpoint()
    seed = _min_vertex_seed(e)
    if seed is None:  # empty graph -> empty result, same as the oracle
        return e.sparkSession.createDataFrame(
            [], "surface string, dist bigint"
        )
    return bfs_distances(e, [seed])


@_q("kg_kcore", docs_kg.kcore_sql())
def kg_kcore(spark, sf_dir):
    """k-core peel (k=2, fixed 6 rounds): surviving vertices and their
    core degrees — the density filter that separates the well-attested
    KG core from singleton-mention noise. Fixed-round recurrence in
    BOTH engines (the oracle unrolls the identical peel into chained
    CTEs), so results match converged or not."""
    from denrl_spark.operators.graph_analytics import kcore

    return kcore(docs_kg.edges_by_doc(spark, sf_dir), k=2, rounds=6)


# temporal tumbling-window rollup of the canonical KG (docs_kg.edges_by_window)
_q("kg_edges_by_window", docs_kg.edges_by_window_sql())(docs_kg.edges_by_window)

# canonicalization audit: the (surface -> canonical_surface) alias map
_q("kg_alias_map", docs_kg.alias_map_sql())(docs_kg.alias_map)

# window-over-window snapshot churn (new-edge drift monitor)
_q("kg_window_churn", docs_kg.window_churn_sql())(docs_kg.window_churn)


@_q("kg_clustering", docs_kg.clustering_sql())
def kg_clustering(spark, sf_dir):
    """Local clustering coefficient per vertex (deg >= 2): triangle
    membership over wedge count in integer 1e-6 units — the
    hub-vs-community diagnostic (high degree + near-zero clustering =
    boilerplate-hub suspect). One triangle pass + one degree agg."""
    from denrl_spark.operators.graph_analytics import clustering_coefficients

    return clustering_coefficients(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_reciprocity", docs_kg.reciprocity_sql())
def kg_reciprocity(spark, sf_dir):
    """Per-predicate reciprocity: the fraction of directed edges whose
    reverse edge exists under the SAME predicate (integer 1e-6 units)
    — symmetric predicates score high, functional ones ~0; drift in a
    predicate's reciprocity flags extraction-direction errors. One
    reversed-key self-join + one aggregate; self-loops excluded."""
    e = (
        docs_kg.edges_by_doc(spark, sf_dir)
        .select(
            F.col("src_surface").alias("s"), "pred",
            F.col("dst_surface").alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    rev = e.select(
        F.col("d").alias("s"), "pred", F.col("s").alias("d"),
        F.lit(1).alias("has_rev"),
    )
    return (
        e.join(rev, ["s", "pred", "d"], "left")
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.coalesce("has_rev", F.lit(0))).cast("bigint").alias("n_recip"),
            F.expr(
                "CAST(1000000 * sum(coalesce(has_rev, 0))"
                " div count(1) AS BIGINT)"
            ).alias("recip_u6"),
        )
    )


@_q(
    "kg_pred_stats",
    f"""
    WITH edges AS ({{edges_sql}})
    SELECT pred, count(*) AS n_edges,
           CAST(sum(n_obs) AS BIGINT) AS n_obs,
           count(DISTINCT src_surface) AS n_src,
           count(DISTINCT dst_surface) AS n_dst
    FROM edges GROUP BY 1
    """.format(edges_sql=docs_kg.edges_by_doc_sql()),
)
def kg_pred_stats(spark, sf_dir):
    """Relation-type profile of the canonical KG: per predicate, edge
    and observation counts plus distinct head/tail entity counts — the
    schema-drift monitor (a predicate whose head fan-out explodes
    signals extraction noise). One map-side-combined aggregate over
    the edge table."""
    return (
        docs_kg.edges_by_doc(spark, sf_dir)
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("n_obs").cast("bigint").alias("n_obs"),
            F.countDistinct("src_surface").alias("n_src"),
            F.countDistinct("dst_surface").alias("n_dst"),
        )
    )

# conversation-grain extraction yield rollup (transcript-native accounting)
_q("kg_triples_per_conv", docs_kg.triples_per_conv_sql())(docs_kg.triples_per_conv)

# edge association strength: integer-scaled PMI confidence per canonical edge
_q("kg_edge_pmi", docs_kg.edge_pmi_sql())(docs_kg.edge_pmi)

# doc-level entity co-occurrence graph (bipartite projection + integer PMI)
_q("kg_cooccurrence", docs_kg.entity_cooccurrence_sql())(
    docs_kg.entity_cooccurrence
)

# filtered corrupted-tail negatives (TransE-style KG-embedding training data)
_q("kg_negatives", docs_kg.kg_edge_negatives_sql())(docs_kg.kg_edge_negatives)


@_q("kg_ktruss", docs_kg.ktruss_sql())
def kg_ktruss(spark, sf_dir):
    """k-truss (k=3, fixed 3 peel rounds): surviving edges with their
    triangle support — the EDGE-density curation filter (keep relations
    embedded in mutually-corroborating entity cliques). Fixed-round
    recurrence in BOTH engines; the oracle unrolls the identical peel
    into MATERIALIZED chained CTEs."""
    from denrl_spark.operators.graph_analytics import ktruss

    return ktruss(docs_kg.edges_by_doc(spark, sf_dir), k=3, rounds=3)


@_q("kg_communities", docs_kg.communities_sql())
def kg_communities(spark, sf_dir):
    """Community detection (synchronous label propagation, fixed 4
    rounds, min-label ties): which canonical entities form densely
    self-referential clusters — the curation lens that groups
    topic/boilerplate neighborhoods regardless of absolute degree.
    Fixed-round recurrence in BOTH engines (the oracle unrolls the
    identical LPA into MATERIALIZED chained CTEs). VERDICT r4
    next-round item 4."""
    from denrl_spark.operators.graph_analytics import label_propagation

    return label_propagation(docs_kg.edges_by_doc(spark, sf_dir), rounds=4)


@_q("kg_scc", docs_kg.scc_sql())
def kg_scc(spark, sf_dir):
    """Strongly connected components of the DIRECTED canonical graph
    (surface, scc_id = min member, scc_size): a KG cycle is a
    mutual-assertion cluster ("A part_of B" and "B part_of A" asserted
    in different turns), and SCC condensation is the pass that exposes
    them before any DAG-shaped consumer (taxonomy induction,
    topological ordering, cycle-safe rollups) — the directed
    counterpart of kg_components, which cannot see edge direction.
    Spark side: deterministic forward-max coloring + within-color
    backward collection + peel (the Orzan/FB-coloring family), all
    equi-joins and map-side-combined aggs with loud convergence
    guards; oracle side: EXACT recursive-CTE transitive closure (the
    semantic spec, never the scale path)."""
    from denrl_spark.operators.graph_analytics import scc

    return scc(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_condensation", docs_kg.condensation_sql())
def kg_condensation(spark, sf_dir):
    """Condensation DAG: ordered pairs of distinct SCCs with crossing-
    edge counts — the cycle-free graph DAG-shaped consumers (taxonomy
    induction, topological ordering, transitive rollups) actually run
    on after kg_scc exposes the mutual-assertion clusters. Spark side:
    the V-row scc map equi-joined to the distinct edge set twice + one
    map-side-combined count; acyclicity is a theorem of SCC-ness
    (test-asserted, not re-checked at runtime)."""
    from denrl_spark.operators.graph_analytics import condensation

    return condensation(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_random_walks", docs_kg.random_walks_sql())
def kg_random_walks(spark, sf_dir):
    """DeepWalk corpus generation: one 8-step hash-seeded walk from
    every vertex of the undirected canonical graph — the random-walk
    "sentences" a skip-gram KG-embedding trainer consumes, made
    deterministic (md5-picked neighbor index into the sorted adjacency
    list) so the corpus is hash-oracle-able and restart-idempotent.
    One adjacency-array aggregation + 8 V-row equi-joins; the unrolled
    CTE twin runs the identical recurrence."""
    from denrl_spark.operators.graph_analytics import random_walks

    return random_walks(docs_kg.edges_by_doc(spark, sf_dir))


@_q("kg_walk_pairs", docs_kg.walk_pairs_sql())
def kg_walk_pairs(spark, sf_dir):
    """Skip-gram (center, context) co-occurrence counts over the
    deterministic walk corpus — the trainer-ready table that completes
    the DeepWalk stage: one walk-key self-join (constant (L+1)^2
    fan-out per walk) + one map-side-combined count."""
    from denrl_spark.operators.graph_analytics import (
        random_walks,
        walk_skipgram_pairs,
    )

    walks = random_walks(docs_kg.edges_by_doc(spark, sf_dir)).localCheckpoint()
    return walk_skipgram_pairs(walks)


@_q("kg_sssp", docs_kg.sssp_sql())
def kg_sssp(spark, sf_dir):
    """Weighted shortest paths from the minimum vertex surface:
    fixed-round min-plus propagation with exact integer edge costs
    (1e6 div n_obs — well-attested edges are cheap), the
    evidence-weighted companion of kg_bfs. Fixed rounds in BOTH
    engines (the oracle unrolls the identical relaxation into
    MATERIALIZED chained CTEs), so results match converged or not."""
    from denrl_spark.operators.graph_analytics import sssp

    e = docs_kg.edges_by_doc(spark, sf_dir).localCheckpoint()
    seed = _min_vertex_seed(e)
    if seed is None:
        return e.sparkSession.createDataFrame(
            [], "surface string, cost_u bigint"
        )
    return sssp(e, [seed], rounds=8)


@_q("kg_closeness", docs_kg.closeness_sql())
def kg_closeness(spark, sf_dir):
    """Harmonic closeness centrality (+ eccentricity + reach) for
    every vertex of the canonical graph: root-keyed multi-source BFS
    (all roots advance in the same joins — the MS-BFS batching shape)
    with early exit at fixpoint; the DuckDB twin is the all-pairs
    variant of the bfs_sql recursive closure. All-pairs is the exact
    small-graph setting; at production scale the SAME operator takes a
    sampled ``roots`` list (Eppstein–Wang estimator) — the root-keyed
    state makes sample size a linear cost knob."""
    from denrl_spark.operators.graph_analytics import closeness

    e = docs_kg.edges_by_doc(spark, sf_dir).localCheckpoint()
    return closeness(e)


# Point-in-time snapshot: edges rebuilt from observations at ts <= the
# fixed cutoff — at production scale a partition-pruned scan of the
# window-partitioned observation log (docs_kg.snapshot_asof docstring).
_q("kg_snapshot_asof", docs_kg.snapshot_asof_sql())(docs_kg.snapshot_asof)
# Snapshot DIFF between two cutoffs in one conditional-aggregate pass
# (never a two-snapshot join) — the versioned-KG what-changed query.
_q("kg_snapshot_diff", docs_kg.snapshot_diff_sql())(docs_kg.snapshot_diff)
# Freshness-weighted edge confidence: exact-integer exponential decay
# (halving per age bucket) — the recency ranking lens next to PMI.
_q("kg_edge_recency", docs_kg.edge_recency_sql())(docs_kg.edge_recency)
# Per-entity serving card: four co-partitionable V-row aggregates
# LEFT-joined with deterministic defaults — the KG lookup-API row.
_q("kg_entity_cards", docs_kg.entity_cards_sql())(docs_kg.entity_cards)
# Functional-predicate conflict detection: (src, pred) with >1 object,
# best-attested object via an argmax aggregate (no list state).
_q("kg_conflicts", docs_kg.edge_conflicts_sql())(docs_kg.edge_conflicts)
# Per-edge provenance sample: k smallest supporting docs, rank-capped
# BEFORE collect (bounded agg state), true support count alongside.
_q("kg_provenance", docs_kg.edge_provenance_sql())(docs_kg.edge_provenance)
# Entity type inference: per canonical entity the majority mention type
# (argmax aggregate), distinct-type fan-out as the homonym monitor.
_q("kg_type_profile", docs_kg.entity_type_profile_sql())(
    docs_kg.entity_type_profile
)
# Unordered predicate pairs co-firing on the same head — the
# schema-induction signal; join fan-out bounded by |P|^2 per head.
_q("kg_pred_cooccurrence", docs_kg.pred_cooccurrence_sql())(
    docs_kg.pred_cooccurrence
)
# Exact-log2 histogram of distinct-neighbor degree — the one-glance
# topology drift monitor.
_q("kg_degree_distribution", docs_kg.degree_distribution_sql())(
    docs_kg.degree_distribution
)


# --------------------------------------------------------------------------
# Relational operators on the TPC-H-ish tables (SURVEY.md §2.2/2.4-2.7)
# --------------------------------------------------------------------------

@_q(
    "rel_filter_project",  # F1 length filter + F6 column pruning
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 30",
)
def rel_filter_project(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber")
    )


@_q(
    "rel_agg_stats",  # A6/A7 metric reductions
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY 1, 2
    """,
)
def rel_agg_stats(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@_q(
    "rel_topk_per_group",  # A2/O3 top-k per group window
    """
    SELECT o_orderpriority, o_orderkey, rank FROM (
      SELECT o_orderpriority, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
      FROM orders) WHERE rank <= 3
    """,
)
def rel_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "rank")
    )


@_q(
    "rel_dedup_first_per_group",  # O4 first-instance-per-sentence dedup
    """
    SELECT o_custkey, o_orderkey FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def rel_dedup_first(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("o_custkey", "o_orderkey")
    )


@_q(
    "rel_semi_join",  # F4 set-membership filter as left-semi join
    """
    SELECT DISTINCT l_orderkey FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)
    """,
)
def rel_semi_join(spark, sf_dir):
    big = _t(spark, sf_dir, "orders").where("o_totalprice > 200000").select("o_orderkey")
    return (
        _t(spark, sf_dir, "lineitem")
        .join(big, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey")
        .distinct()
    )


@_q(
    "rel_anti_join",  # U2 id-set difference as left-anti join
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def rel_anti_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
    )


@_q(
    "rel_union_distinct",  # U1/U3 union + distinct
    """
    SELECT DISTINCT k FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000)
    """,
)
def rel_union_distinct(spark, sf_dir):
    a = (
        _t(spark, sf_dir, "customer")
        .where("c_mktsegment = 'BUILDING'")
        .select(F.col("c_nationkey").alias("k"))
    )
    b = (
        _t(spark, sf_dir, "supplier")
        .where("s_acctbal > 5000")
        .select(F.col("s_nationkey").alias("k"))
    )
    return a.unionByName(b).distinct()


@_q(
    "rel_broadcast_join_agg",  # J1-style broadcast dim join + agg
    """
    SELECT n.n_name, count(*) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def rel_broadcast_join_agg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            # money summed as exact integer cents: double-sum order and
            # cast semantics (trunc vs round) differ between engines
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("bal_cents"),
        )
    )


@_q(
    "rel_distinct_labels",  # A1 distinct label discovery (explode+distinct)
    """
    SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def rel_distinct_labels(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )


@_q(
    "rel_json_extract",  # scalar JSON function over events props
    """
    SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY 1
    """,
)
def rel_json_extract(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint"))
            .cast("bigint")
            .alias("sum_k")
        )
    )


@_q(
    "rel_sessionize",  # sessionization: lag gap + cumsum window
    """
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
    gaps AS (
      SELECT user_id, t,
             CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM e),
    sess AS (
      SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY t
             ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps)
    SELECT user_id, CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions
    FROM sess GROUP BY 1
    """,
)
def rel_sessionize(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    gaps = e.withColumn(
        "new_s",
        F.when(F.col("t") - F.lag("t").over(w) > 1800, 1).otherwise(0),
    )
    sess = gaps.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("sid").cast("bigint").alias("n_sessions")
    )


@_q(
    "rel_transition_counts",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_type, sum(n) AS t FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           CAST((1000000 * c.n) // tot.t AS BIGINT) AS p_ppm
    FROM c JOIN tot USING (from_type)
    """,
)
def rel_transition_counts(spark, sf_dir):
    """First-order Markov TRANSITION matrix over per-user event
    sequences (the sequence-mining staple behind next-event
    prediction and funnel diagnosis): each user's events ordered by
    (ts, event_id — a total order, so lead() is deterministic
    cross-engine), adjacent pairs counted into (from_type, to_type)
    cells, with the conditional probability P(to|from) in exact
    integer ppm (floor division of bigint products).

    Shape: ONE user-keyed window (no global sort — the partition key
    is the user, the natural shard of a 10^12-event log) feeding a
    map-side-combined aggregate over a |types|^2-bounded frame; the
    row-total join is over that same tiny frame. Skewed users cost
    one window partition each — at 100 TB the window is already
    co-partitioned with any upstream per-user stage."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    c = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = c.groupBy("from_type").agg(F.sum("n").alias("t"))
    return c.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.floor((1_000_000 * F.col("n")) / F.col("t"))
        .cast("long")
        .alias("p_ppm"),
    )


@_q(
    "rel_session_windows",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us FROM events),
    gaps AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       >= 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e),
    sess AS (
      SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps)
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS start_us,
           CAST(max(us) + 1800 * 1000000 AS BIGINT) AS end_us,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def rel_session_windows(spark, sf_dir):
    """Per-session bounds + counts via Spark's NATIVE session_window
    (the same operator the streaming sessionizer uses — see
    streaming.stateful.stream_session_stats, whose streaming==batch
    equality is pytest-asserted). The oracle restates the merge rule
    relationally in EXACT integer microseconds: a new session starts
    iff the gap to the previous event is >= 30 min (session_window
    merges on strict <); session end = last event + gap. Unlike
    rel_sessionize (count-only, lag rule `> 1800 s`), this emits the
    windows themselves — boundary-tie conventions differ between the
    two sessionizers by design (documented at the operator)."""
    from denrl_spark.streaming.stateful import stream_session_stats

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return stream_session_stats(ev).select(
        "user_id",
        # parquet ts is TIMESTAMP_NTZ; the session tz is pinned UTC
        # (denrl_spark.session), so the cast is the identity on micros
        F.unix_micros(F.col("session_start").cast("timestamp"))
        .cast("bigint").alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp"))
        .cast("bigint").alias("end_us"),
        F.col("n_events"),
    )


# --------------------------------------------------------------------------
# Text analysis / dedup / similarity (training-data-pipeline operators)
# --------------------------------------------------------------------------

@_q(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS n_re_tokens,
           CAST(length(text) AS INT) AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    return textops.token_stats(_t(spark, sf_dir, "documents"))


@_q(
    "text_length_histogram",
    """
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents)
    SELECT CAST(length(bin(n)) - 1 AS INT) AS log2_bucket,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(min(n) AS INT) AS min_len, CAST(max(n) AS INT) AS max_len
    FROM t WHERE n > 0 GROUP BY 1
    """,
)
def text_length_histogram(spark, sf_dir):
    """Log2-bucketed document-length histogram — the curation staple
    for choosing packing bin sizes and length cutoffs. The bucket is
    EXACT integer log2 via the binary-representation length
    (length(bin(n)) - 1): floor(ln(n)/ln(2)) in floats misbuckets
    exact powers of two (ln(8)/ln(2) = 2.9999999999999996), and both
    engines' bin() agree on positive integers. One scan, one
    map-side-combined aggregate."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).where(F.col("n") > 0)
    return (
        t.withColumn(
            "log2_bucket", (F.length(F.bin("n")) - 1).cast("int")
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.min("n").cast("int").alias("min_len"),
            F.max("n").cast("int").alias("max_len"),
        )
    )


@_q(
    "text_quality",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(floor(1000000 * len(list_filter(toks, x -> x IN ('the','a','an','that','with'))) / len(toks)) AS BIGINT) AS stop_ratio_e6,
           CAST(floor(1000000 * len(list_distinct(toks)) / len(toks)) AS BIGINT) AS uniq_ratio_e6
    FROM t
    """,
)
def text_quality(spark, sf_dir):
    return textops.quality_scores(_t(spark, sf_dir, "documents"))


@_q(
    "text_langid",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CASE WHEN len(list_filter(toks, x -> x IN ('join','scan','filter','agg','window')))
                  >= len(list_filter(toks, x -> x IN ('table','row','column','batch','stream')))
                THEN 'query_ish' ELSE 'data_ish' END AS lang_pred
    FROM t
    """,
)
def text_langid(spark, sf_dir):
    return textops.lang_id(_t(spark, sf_dir, "documents"))


@_q(
    "text_quality_linear",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CAST(('0x' || substr(md5(tok || '|w'), 1, 12))
                           AS BIGINT) % 2001 - 1000) AS BIGINT) AS score
      FROM t GROUP BY 1)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, score,
           CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS INT) AS keep
    FROM scored
    """,
)
def text_quality_linear(spark, sf_dir):
    """Frozen-hash linear bag-of-words quality classifier (the
    fastText-filter slot of CCNet/DCLM-style curation; frozen hash
    weights stand in for the untrainable checkpoint — see
    textops.hash_linear_score). Spark folds the score inside the scan
    stage (HOF aggregate over split, no explode/shuffle/UDF); the twin
    unnest+group-sums the same integer weights."""
    return textops.hash_linear_score(_t(spark, sf_dir, "documents"))


@_q(
    "text_fingerprint",
    """
    WITH t AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents)
    SELECT doc_id,
           CAST(sum(pos * (ascii(tok) * 31 + length(tok))) % 1000003 AS BIGINT) AS fp
    FROM t GROUP BY 1
    """,
)
def text_fingerprint(spark, sf_dir):
    return textops.fingerprints(_t(spark, sf_dir, "documents"))


# Gopher-rules quality gate: division-free integer thresholds, zero
# shuffle, zero Python (textops.gopher_rules docstring).
_q("text_gopher_rules", textops.gopher_rules_sql())(
    lambda spark, sf_dir: textops.gopher_rules(_t(spark, sf_dir, "documents"))
)


# Winnowing (MOSS) fingerprints: the local-dedup index between exact
# substring dedup and doc-level MinHash — windowed k-gram minima kept
# entirely in scan-stage HOFs (textops.winnow_fingerprints docstring).
_q("text_winnowing", textops.winnow_sql())(
    lambda spark, sf_dir: textops.winnow_fingerprints(
        _t(spark, sf_dir, "documents")
    )
)


@_q(
    "text_pii_scan",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INT) AS n_ssns,
           CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS INT) AS n_urls,
           CAST((len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) > 0
              OR len(regexp_extract_all(text, '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) > 0
              OR len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) > 0) AS INT) AS has_pii
    FROM documents
    """,
)
def text_pii_scan(spark, sf_dir):
    return textops.pii_scan(_t(spark, sf_dir, "documents"))


@_q(
    "text_pii_redact",
    """
    WITH s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS c1,
             regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t1
      FROM documents),
    s2 AS (
      SELECT doc_id, c1,
             len(regexp_extract_all(t1, '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS c2,
             regexp_replace(t1, '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS t2
      FROM s1),
    s3 AS (
      SELECT doc_id, c1, c2,
             len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS c3,
             regexp_replace(t2, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t3
      FROM s2)
    SELECT doc_id, t3 AS clean_text, CAST(c1 + c2 + c3 AS INT) AS n_redactions
    FROM s3
    """,
)
def text_pii_redact(spark, sf_dir):
    """Scan -> redact transform (the corpus ``pii_scan`` only counts):
    every email/phone/SSN replaced by a typed placeholder in ONE
    codegen'd expression chain, counts chained in the same fixed order
    as the oracle. Redacted text re-scans to zero hits (pytest
    property). VERDICT r4 next-round item 6."""
    return textops.pii_redact(_t(spark, sf_dir, "documents"))


@_q("text_substring_dedup", textops.substring_dedup_sql())
def text_substring_dedup(spark, sf_dir):
    """Exact substring-level dedup (Lee et al. 2022 ExactSubstr
    analog): maximal token spans whose every k-token shingle occurs
    more than once in the corpus, as exact integer removal offsets —
    the cross-document boilerplate pass doc-level MinHash/SimHash
    cannot catch. One shingle groupBy + semi-join + per-doc island
    windows. VERDICT r4 next-round item 3."""
    return textops.substring_dedup_spans(_t(spark, sf_dir, "documents"))


@_q(
    "text_tfidf_top_terms",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             CAST(floor(1000000 * tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)) AS BIGINT) AS tfidf_e6
      FROM tf JOIN df USING (token) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, token, tfidf_e6,
             CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf_e6 DESC, token ASC) AS INT) AS rank
      FROM scored)
    SELECT doc_id, rank, token, tfidf_e6 FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    return textops.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


HASH_FEATURE_DIM = 128  # hashed feature-space width (2^7)


@_q(
    "text_hash_features",
    f"""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    f AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT)
               % {HASH_FEATURE_DIM} AS feature_idx,
             CASE WHEN CAST(('0x' || substr(md5(tok), 13, 1)) AS BIGINT)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM t WHERE tok <> '')
    SELECT doc_id, feature_idx,
           count(*) AS tf,
           CAST(sum(sgn) AS BIGINT) AS signed_tf
    FROM f GROUP BY 1, 2
    """,
)
def text_hash_features(spark, sf_dir):
    """Feature-HASHING vectorizer (the HashingVectorizer /
    hashing-trick stage of a training-data pipeline): per doc, the
    sparse hashed bag-of-words — feature_idx = 48 md5 bits of the
    token mod HASH_FEATURE_DIM, raw term frequency, and the
    sign-hashed sum (sign from an independent md5 nibble; the
    textbook collision-bias correction, Weinberger et al. 2009).

    Why it matters at 100 TB: tf-idf / word->id encoding need a vocab
    build (a corpus-wide distinct + broadcast); the hashing trick
    needs NEITHER — feature space is fixed at HASH_FEATURE_DIM
    regardless of vocabulary, so the featurizer is one scan ->
    explode -> map-side-combined (doc_id, feature_idx) aggregate with
    no joins, no windows, no driver state, and streams trivially.

    Exactness: md5-prefix arithmetic is the house cross-engine hash
    idiom (kg_edge_negatives, rel_weighted_sample); counts and signed
    sums are integers, so the oracle matches at hash level."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
    sgn = F.when(
        F.conv(F.substring(F.md5("tok"), 13, 1), 16, 10).cast("long") % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select(
            "doc_id",
            (h % HASH_FEATURE_DIM).alias("feature_idx"),
            sgn.alias("sgn"),
        )
        .groupBy("doc_id", "feature_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.sum("sgn").cast("bigint").alias("signed_tf"),
        )
    )


@_q(
    "text_unigram_lm",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    counts AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1),
    tot AS (SELECT count(*) AS total FROM t)
    SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
           CAST(sum(CAST(floor(10000 * ln(CAST(c.cnt AS DOUBLE) / tot.total)) AS BIGINT)) AS BIGINT) AS lp_e4
    FROM t JOIN counts c USING (token) CROSS JOIN tot
    GROUP BY 1
    """,
)
def text_unigram_lm(spark, sf_dir):
    """Corpus-unigram-LM document scoring (KenLM-style quality filter):
    per-token floor-scaled log-probs summed as exact integers, so the
    aggregate is order-invariant and hash-oracle-able."""
    return textops.unigram_logprob(_t(spark, sf_dir, "documents"))


# Shared CTE body: per-document corpus-bigram-LM score (doc_id,
# n_bigrams, lp2_e4) — used by text_bigram_lm and text_quality_buckets.
_BIGRAM_LM_CTES = """
    t AS (SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents),
    bg AS (
      SELECT doc_id, tok || ' ' || t1 AS bigram FROM (
        SELECT doc_id, tok,
               lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
        FROM t)
      WHERE t1 IS NOT NULL),
    c2 AS (SELECT bigram, count(*) AS cnt2 FROM bg GROUP BY 1),
    c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(cnt2) AS cnt1
           FROM c2 GROUP BY 1),
    term AS (
      SELECT bigram,
             CAST(floor(10000 * ln(CAST(cnt2 AS DOUBLE) / cnt1)) AS BIGINT) AS term
      FROM c2 JOIN c1 ON string_split(c2.bigram, ' ')[1] = c1.w1),
    lm AS (
      SELECT bg.doc_id, CAST(count(*) AS INT) AS n_bigrams,
             CAST(sum(term) AS BIGINT) AS lp2_e4
      FROM bg JOIN term USING (bigram) GROUP BY 1)
"""


@_q(
    "text_bigram_lm",
    f"""
    WITH {_BIGRAM_LM_CTES}
    SELECT doc_id, n_bigrams, lp2_e4 FROM lm
    """,
)
def text_bigram_lm(spark, sf_dir):
    """Corpus-bigram-LM document scoring: per-pair conditional
    log-probs P(w2|w1), floor-scaled to integers BEFORE the sum —
    order-invariant aggregate, hash-oracle-able. The word-order-aware
    fluency filter the unigram scorer can't express."""
    return textops.bigram_logprob(_t(spark, sf_dir, "documents"))


@_q(
    "text_quality_buckets",
    f"""
    WITH {_BIGRAM_LM_CTES}
    SELECT doc_id, lang, rn, n_lang,
           CASE WHEN 3 * rn <= n_lang THEN 'head'
                WHEN 3 * rn <= 2 * n_lang THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM (
      SELECT lm.doc_id, d.lang,
             CAST(row_number() OVER (
               PARTITION BY d.lang
               ORDER BY CAST(lm.lp2_e4 AS DOUBLE) / lm.n_bigrams DESC,
                        lm.doc_id) AS INT) AS rn,
             CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n_lang
      FROM lm JOIN documents d USING (doc_id))
    """,
)
def text_quality_buckets(spark, sf_dir):
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    rank each language's documents by mean bigram-LM log-prob and split
    into head/middle/tail terciles — the standard curation move of
    keeping/weighting the most-fluent fraction per language rather than
    applying one global threshold that would starve low-resource
    languages. Deterministic cross-engine: the ranking key is the
    IEEE-exact double lp2_e4/n_bigrams (both engines divide the same
    two integers; IEEE 754 division is correctly rounded, so the
    doubles are bit-identical) with doc_id as total tie-break, and the
    tercile rule 3*rn <= k*n_lang is pure integer arithmetic.

    Scale note: the per-lang rank window sorts each language inside one
    task — fine at check scale and for tail languages, skewed for the
    head language at 100 TB. The production variant replaces the exact
    rank with sampled tercile THRESHOLDS on the score (exactly what
    CCNet does: bucket by comparing to precomputed per-lang quantiles,
    one broadcast join, no window); the exact-rank form is registered
    because sketch-based quantiles are not reproducible cross-engine."""
    docs = _t(spark, sf_dir, "documents")
    lm = textops.bigram_logprob(docs)
    scored = lm.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        (F.col("lp2_e4").cast("double") / F.col("n_bigrams")).desc(),
        F.col("doc_id"),
    )
    wc = Window.partitionBy("lang")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .withColumn("n_lang", F.count(F.lit(1)).over(wc).cast("bigint"))
        .select(
            "doc_id", "lang", "rn", "n_lang",
            F.when(3 * F.col("rn") <= F.col("n_lang"), "head")
            .when(3 * F.col("rn") <= 2 * F.col("n_lang"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# Shared SQL derivation of the transcript view (must stay in lockstep
# with docs_kg.transcripts_from_documents: conv = doc_id // 4,
# turn = doc_id % 4, role = parity, ts = TS_EPOCH_BASE + doc_id * 7)
_TRANSCRIPT_SQL = """
      SELECT printf('conv-%08d', doc_id // 4) AS conv_id,
             CAST(doc_id % 4 AS INT) AS turn_idx,
             CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
             text
      FROM documents
"""


@_q(
    "text_dialog_stats",
    f"""
    WITH t AS ({_TRANSCRIPT_SQL}),
    v AS (
      SELECT *,
             CASE WHEN role = lag(role) OVER (PARTITION BY conv_id
                                              ORDER BY turn_idx)
                  THEN 1 ELSE 0 END AS viol
      FROM t)
    SELECT conv_id,
           count(*) AS n_turns,
           CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_user,
           CAST(sum(CASE WHEN role = 'user' THEN length(text) ELSE 0 END)
                AS BIGINT) AS user_chars,
           CAST(sum(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END)
                AS BIGINT) AS asst_chars,
           CAST(CASE WHEN sum(CASE WHEN role = 'assistant'
                                   THEN length(text) ELSE 0 END) = 0 THEN -1
                ELSE (1000000 * sum(CASE WHEN role = 'user'
                                         THEN length(text) ELSE 0 END))
                     // sum(CASE WHEN role = 'assistant'
                                 THEN length(text) ELSE 0 END)
                END AS BIGINT) AS ratio_ppm,
           CAST(max(length(text)) AS BIGINT) AS max_turn_chars,
           CAST(sum(viol) AS BIGINT) AS n_role_violations
    FROM v GROUP BY 1
    """,
)
def text_dialog_stats(spark, sf_dir):
    """Per-conversation dialogue-shape statistics — the curation gate
    for instruction/agent-transcript training data (filters on turn
    count, user/assistant balance, and role-alternation violations are
    the standard quality screens for dialog corpora): n_turns, per-role
    turn and char tallies, user:assistant char ratio in exact ppm
    (integer cross-multiplication, -1 sentinel for assistant-less
    convs), max turn length, and the count of consecutive-same-role
    violations (lag window over the stable turn ordering — the
    input contract's (conv_id, turn_idx) invariant).

    Shape: ONE window + ONE aggregate, both keyed by conv_id — a
    single shuffle on the conversation key; per-conv state is a
    handful of counters, and conversations are bounded (the long-tail
    conv-length skew the north star calls out is handled by AQE skew
    splits on the conv_id exchange)."""
    t = docs_kg.transcripts_from_documents(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    v = t.withColumn(
        "viol",
        F.when(F.col("role") == F.lag("role").over(w), 1).otherwise(0),
    )
    user_chars = F.sum(
        F.when(F.col("role") == "user", F.length("text")).otherwise(0)
    )
    asst_chars = F.sum(
        F.when(F.col("role") == "assistant", F.length("text")).otherwise(0)
    )
    return (
        v.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
            .cast("bigint").alias("n_user"),
            user_chars.cast("bigint").alias("user_chars"),
            asst_chars.cast("bigint").alias("asst_chars"),
            F.max(F.length("text")).cast("bigint").alias("max_turn_chars"),
            F.sum("viol").cast("bigint").alias("n_role_violations"),
        )
        .withColumn(
            "ratio_ppm",
            F.when(F.col("asst_chars") == 0, F.lit(-1).cast("bigint"))
            .otherwise(F.expr("(1000000 * user_chars) div asst_chars"))
            .cast("bigint"),
        )
        .select(
            "conv_id", "n_turns", "n_user", "user_chars", "asst_chars",
            "ratio_ppm", "max_turn_chars", "n_role_violations",
        )
    )


CONV_PREFIX_K = 2  # turns fingerprinted for conversation-prefix dedup


@_q(
    "text_conv_prefix_dedup",
    f"""
    WITH t AS ({_TRANSCRIPT_SQL}),
    fp AS (
      SELECT conv_id,
             md5(string_agg(text, chr(31) ORDER BY turn_idx)) AS prefix_fp
      FROM t WHERE turn_idx < {CONV_PREFIX_K} GROUP BY 1),
    keep AS (
      SELECT prefix_fp, min(conv_id) AS keep_conv_id
      FROM fp GROUP BY 1)
    SELECT f.conv_id, f.prefix_fp, k.keep_conv_id,
           CAST(f.conv_id <> k.keep_conv_id AS INT) AS is_dup
    FROM fp f JOIN keep k USING (prefix_fp)
    """,
)
def text_conv_prefix_dedup(spark, sf_dir):
    """Conversation-PREFIX dedup — the agent-log staple exact dedup
    misses: retried / forked sessions share their first K turns
    verbatim while later turns diverge, so whole-text hashing sees
    distinct documents. Fingerprint = md5 over the first
    CONV_PREFIX_K turn texts joined in stable turn order (unit
    separator \\x1f, unambiguous under concatenation); keep rule =
    min conv_id per fingerprint, first-wins like dedup_exact.

    Shape: per-conv aggregate with BOUNDED state (K turn texts,
    array_sort on K structs), then a fingerprint-keyed groupBy + one
    equi-join back — the exact-dedup shuffle shape at conversation
    grain; a mass-duplicated prefix makes a hot fingerprint key,
    which the equi-join (unlike a window over the fp partition)
    lets AQE skew-split."""
    t = docs_kg.transcripts_from_documents(spark, sf_dir)
    fp = (
        t.where(F.col("turn_idx") < CONV_PREFIX_K)
        .groupBy("conv_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("turn_idx", "text"))
                        ),
                        lambda x: x["text"],
                    ),
                    "\x1f",
                )
            ).alias("prefix_fp")
        )
    )
    keep = fp.groupBy("prefix_fp").agg(
        F.min("conv_id").alias("keep_conv_id")
    )
    return fp.join(keep, "prefix_fp").select(
        "conv_id",
        "prefix_fp",
        "keep_conv_id",
        (F.col("conv_id") != F.col("keep_conv_id")).cast("int").alias("is_dup"),
    )


@_q(
    "text_source_mixture",
    """
    WITH per_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
    tot AS (
      SELECT sum(n_tokens) AS total, count(*) AS n_sources FROM per_src)
    SELECT source, n_docs, n_tokens,
           CAST(floor(1000000 * n_tokens / tot.total) AS BIGINT) AS share_e6,
           CAST(floor(1000000 * tot.total / (tot.n_sources * n_tokens))
                AS BIGINT) AS weight_e6
    FROM per_src, tot
    """,
)
def text_source_mixture(spark, sf_dir):
    """Domain-mixture table for training-data sampling: per source, doc
    and whitespace-token counts, the source's actual token share, and
    the resampling multiplier weight = total/(n_sources * n_tokens)
    that flattens the mixture to uniform-over-sources (the static
    reweighting move of Pile/CCNet-style curation; a non-uniform target
    is the same formula with target_share/actual_share). Exact integer
    math (floor to 1e-6) for cross-engine hash equality. The bigint
    intermediates bound the corpus at 1e6 * total_tokens < 2^63, i.e.
    ~9.2e12 tokens (~100 TB of text is the edge of that envelope); past
    it, drop the share scale to 1e-3 or move the two multiplies to
    decimal(38,0) — the floor semantics carry over.

    Shape: one narrow scan computing size(split(text)) per doc (no
    explode — the token ARRAY never materializes past the projection),
    one map-side-combined groupBy over a handful of sources; the totals
    come off the source-sized aggregate on the driver and return as
    literals, so there is no Exchange SinglePartition and the corpus is
    scanned exactly once. At 100 TB this is the cheapest query in the
    curation suite: it shuffles |sources| rows."""
    per_src = (
        _t(spark, sf_dir, "documents")
        .select("source", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .localCheckpoint()
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("s")
    ).collect()[0]
    total, n_sources = int(tot["t"]), int(tot["s"])
    tot_l = F.lit(total).cast("bigint")
    return per_src.select(
        "source", "n_docs", "n_tokens",
        F.floor(1_000_000 * F.col("n_tokens") / tot_l)
        .cast("bigint").alias("share_e6"),
        F.floor(1_000_000 * tot_l / (F.lit(n_sources).cast("bigint") * F.col("n_tokens")))
        .cast("bigint").alias("weight_e6"),
    )


_SHINGLE_SQL = """
      SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle FROM (
        SELECT doc_id, tok,
               lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
               lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM (SELECT doc_id,
                     generate_subscripts(string_split(text, ' '), 1) AS pos,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents))
      WHERE t2 IS NOT NULL
"""


@_q(
    "text_contamination",
    f"""
    WITH sh AS (SELECT DISTINCT * FROM ({_SHINGLE_SQL})),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT t.doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(floor(1000000 * sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*)) AS BIGINT) AS contam_e6
    FROM train t LEFT JOIN bench b USING (shingle)
    GROUP BY 1
    """,
)
def text_contamination(spark, sf_dir):
    """Benchmark decontamination scan: every 97th doc plays the held-out
    eval set; the rest is the training corpus. The benchmark's distinct
    shingle set broadcasts, so the training side never shuffles for the
    membership test (textops.contamination_scan)."""
    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    return textops.contamination_scan(train, bench)


@_q(
    "text_ngram_novelty",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    shared AS (
      SELECT shingle FROM (
        SELECT shingle, count(DISTINCT doc_id) AS nd FROM sh GROUP BY 1)
      WHERE nd >= 2),
    per AS (
      SELECT s.doc_id, count(*) AS n_sh,
             CAST(sum(CASE WHEN d.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup
      FROM sh s LEFT JOIN shared d USING (shingle)
      GROUP BY 1)
    SELECT doc.doc_id,
           CAST(coalesce(per.n_sh, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_shingles,
           CAST(CASE WHEN per.n_sh IS NULL THEN -1
                ELSE (1000000 * (per.n_sh - per.n_dup)) // per.n_sh
                END AS BIGINT) AS novelty_ppm
    FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY — the doc-level readout of
    cross-document duplication (the ranking signal for which docs are
    boilerplate-heavy enough to route through text_substring_dedup,
    and the memorization-risk score of Lee et al. 2022): for each doc,
    the count of its token-3-gram instances, how many of those occur
    in >= 2 DISTINCT docs corpus-wide, and the novel fraction in exact
    ppm (integer cross-multiplication; -1 sentinel for docs too short
    to shingle).

    Shape: shingles stay in the scan stage (array HOFs, no window);
    the shared-shingle set is ONE distinct + map-side-combined
    aggregate over the corpus shingle table (the same table the
    MinHash/contamination family scans), and the per-doc tally is one
    equi-join on the shingle key + one doc-keyed aggregate. A
    mass-duplicated shingle is a hot join key — AQE skew-splits it,
    and the join carries only a presence flag, never fan-out (shared
    has ONE row per shingle by construction)."""
    d = _t(spark, sf_dir, "documents")
    sh = textops.shingles(d)
    shared = (
        sh.distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("shingle")
    )
    per = (
        sh.join(shared.withColumn("hit", F.lit(1)), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_dup"),
        )
    )
    return (
        d.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_sh"), F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint")
            .alias("n_dup_shingles"),
            F.when(F.col("n_sh").isNull(), F.lit(-1))
            .otherwise(F.expr("(1000000 * (n_sh - n_dup)) div n_sh"))
            .cast("bigint").alias("novelty_ppm"),
        )
    )


@_q(
    "text_repetition",
    """
    WITH pos AS (
      SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS tok,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE len(string_split(text, ' ')) >= 3),
    g2 AS (
      SELECT doc_id, n_tokens, tok || ' ' || t1 AS g FROM (
        SELECT doc_id, n_tokens, tok,
               lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
        FROM pos)
      WHERE t1 IS NOT NULL),
    g3 AS (
      SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS g FROM (
        SELECT doc_id, tok,
               lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
               lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM pos)
      WHERE t2 IS NOT NULL),
    m2 AS (
      SELECT doc_id, max(n_tokens) AS n_tokens, max(c) AS maxc FROM (
        SELECT doc_id, n_tokens, g, count(*) AS c FROM g2 GROUP BY 1, 2, 3)
      GROUP BY 1),
    d3 AS (
      SELECT doc_id, count(*) AS tot3, count(DISTINCT g) AS dis3
      FROM g3 GROUP BY 1)
    SELECT m2.doc_id, CAST(m2.n_tokens AS INT) AS n_tokens,
           CAST(least(1000000, floor(1000000 * 2 * m2.maxc / m2.n_tokens)) AS BIGINT) AS top2_e6,
           CAST(floor(1000000 * (d3.tot3 - d3.dis3) / d3.tot3) AS BIGINT) AS dup3_e6
    FROM m2 JOIN d3 USING (doc_id)
    """,
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals — per-row array HOFs
    only, no shuffle at all (textops.repetition_metrics); the DuckDB
    twin re-derives the max-run fold relationally via unnest+group-by."""
    return textops.repetition_metrics(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens"), "top2_e6", "dup3_e6"
    )


def _pack_sql():
    from denrl_spark.operators.packing import pack_sequences_sql

    return pack_sequences_sql()


@_q("text_pack_sequences", _pack_sql())
def text_pack_sequences(spark, sf_dir):
    """Next-fit sequence packing into 128-token bins, 64 output shards
    (operators/packing.py) — sequential within a shard (the bin state
    is a chain), parallel across shards; the oracle replays the same
    recurrence as a recursive CTE. Reads the raw scan (no _t
    parallelism lift): the operator's own shard repartition IS the
    parallelism step, so the lift would just add a second exchange."""
    from denrl_spark.operators.packing import pack_sequences

    return pack_sequences(spark.read.parquet(f"{sf_dir}/documents.parquet"))


@_q(
    "rel_stratified_sample",
    """
    SELECT o_orderpriority, o_orderkey FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n_grp
      FROM orders)
    WHERE rn <= CAST(floor(0.1 * n_grp) AS BIGINT)
    """,
)
def rel_stratified_sample(spark, sf_dir):
    """Deterministic exact stratified sample: 10% per group, chosen by
    hash rank — the balanced-sampling primitive of dataset curation
    (per-domain/per-language quotas). One window shuffle per group key;
    reproducible under any partitioning (hash order, not row order)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    wc = Window.partitionBy("o_orderpriority")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_grp", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") <= F.floor(0.1 * F.col("n_grp")))
        .select("o_orderpriority", "o_orderkey")
    )


@_q(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id,
           count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    return textops.dedup_exact(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_minhash_sig",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    banded AS (
      SELECT doc_id, unnest(range(0, 8)) AS band, shingle FROM sh)
    SELECT doc_id, CAST(band AS INT) AS band,
           min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS mh
    FROM banded GROUP BY 1, 2
    """,
)
def dedup_minhash_sig(spark, sf_dir):
    return textops.minhash_signatures(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.col("band").cast("int").alias("band"), "mh"
    )


@_q(
    "dedup_minhash_per_row",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    banded AS (
      SELECT doc_id, unnest(range(0, 8)) AS band, shingle FROM sh)
    SELECT doc_id, CAST(band AS INT) AS band,
           min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS mh
    FROM banded GROUP BY 1, 2
    """,
)
def dedup_minhash_per_row(spark, sf_dir):
    """The per-ROW minhash signature (textops.minhash_signature_cols —
    the stateless projection the STREAMING near-dup dedup keys on),
    unpivoted to (doc_id, band, mh) and hash-verified against the same
    DuckDB twin as the aggregated batch signature: a cross-engine proof
    that the streaming and batch signatures are the same function.
    Short docs (<3 tokens, no shingles) are excluded here because the
    batch groupBy emits no row for them (the streaming op gives them an
    exact-content fallback signature instead)."""
    docs = _t(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= 3
    )
    sig = textops.minhash_signature_cols(docs)
    return sig.select("doc_id", textops.band_stack_expr(8)).select(
        "doc_id", F.col("band").cast("int").alias("band"), "mh"
    )


@_q(
    "dedup_lsh_pairs",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    banded AS (
      SELECT doc_id, unnest(range(0, 8)) AS band, shingle FROM sh),
    sig AS (
      SELECT doc_id, band, min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS mh
      FROM banded GROUP BY 1, 2),
    bstat AS (
      SELECT band, mh, count(*) AS bsz, min(doc_id) AS bmin
      FROM sig GROUP BY 1, 2),
    sig2 AS (
      SELECT sig.doc_id, sig.band, sig.mh, bstat.bsz, bstat.bmin
      FROM sig JOIN bstat ON sig.band = bstat.band AND sig.mh = bstat.mh),
    small AS (SELECT * FROM sig2 WHERE bsz <= {textops.LSH_BUCKET_CAP})
    SELECT DISTINCT doc_a, doc_b FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM small a JOIN small b ON a.band = b.band AND a.mh = b.mh
      WHERE a.doc_id < b.doc_id
      UNION ALL
      SELECT bmin AS doc_a, doc_id AS doc_b
      FROM sig2 WHERE bsz > {textops.LSH_BUCKET_CAP} AND doc_id <> bmin)
    """,
)
def dedup_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs with the oversized-bucket star-link cap
    (textops.lsh_candidate_pairs). The oracle twin reproduces the cap
    semantics exactly — small buckets pairwise, buckets above
    LSH_BUCKET_CAP star-linked to the bucket-min doc — so the hash
    match holds by construction, not corpus luck (testdata's max
    bucket is 22 at sf0.1, below the cap)."""
    return textops.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_keep_greedy",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    bands AS (
      SELECT doc_id, text, unnest(range(0, 8)) AS band FROM documents),
    sig AS (
      SELECT b.doc_id, b.band,
             coalesce(
               min(md5(CAST(b.band AS VARCHAR) || ':' || s.shingle)),
               md5(b.text)) AS mh
      FROM bands b LEFT JOIN sh s ON s.doc_id = b.doc_id
      GROUP BY b.doc_id, b.band, b.text),
    wins AS (SELECT band, mh, min(doc_id) AS win FROM sig GROUP BY 1, 2)
    SELECT s.doc_id FROM sig s
    JOIN wins w ON s.band = w.band AND s.mh = w.mh
    GROUP BY s.doc_id HAVING sum(CAST(s.doc_id = w.win AS INT)) = 8
    """,
)
def dedup_keep_greedy(spark, sf_dir):
    """Greedy first-wins LSH keep-list (textops.near_dedup_greedy, the
    rule the cross-batch streaming ingest applies): a doc is kept iff it
    is the min-doc_id claimant of EVERY one of its 8 minhash band
    buckets. The twin re-derives the per-row signature relationally
    (band-min over shingles with the md5(text) short-doc fallback
    mirrored via LEFT JOIN + coalesce) and replays the same
    win-all-bands rule. Prefix consistency of the fold (streaming ==
    one-shot) is pytest-asserted separately."""
    kept, _ = textops.near_dedup_greedy(
        _t(spark, sf_dir, "documents"), ["doc_id"]
    )
    return kept.select("doc_id")


@_q(
    "dedup_jaccard_pairs",
    f"""
    WITH sh AS (SELECT DISTINCT * FROM ({_SHINGLE_SQL})),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(floor(1000000 * shared / (na.n_sh + nb.n_sh - shared)) AS BIGINT) AS j_e6
    FROM shared
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE floor(1000000 * shared / (na.n_sh + nb.n_sh - shared)) >= 200000
    """,
)
def dedup_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard pairs, 100 TB shape: LSH candidate generation
    (bucketed band/minhash equi-join) followed by candidate-pruned exact
    verify — cost scales with |candidates| x shingles/doc, never with
    the hot-shingle square of the unfiltered shared-shingle self-join.
    The oracle is the UNPRUNED exact SQL: on corpora whose near-dup
    pairs sit at/above the 0.2 threshold with high overlap, 8-band LSH
    recall is 1.0 (asserted against the unpruned twin in
    tests/test_more_operators.py::test_jaccard_pruned_equals_unpruned),
    so the pruned output hash-matches the exact answer. The shingle
    table is computed once and shared between the candidate and verify
    stages (textops.jaccard_pairs_pruned)."""
    return textops.jaccard_pairs_pruned(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_prefix_join",
    f"""
    WITH sh AS (SELECT DISTINCT * FROM ({_SHINGLE_SQL})),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(floor(1000000 * shared / (na.n_sh + nb.n_sh - shared)) AS BIGINT) AS j_e6
    FROM shared
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE floor(1000000 * shared / (na.n_sh + nb.n_sh - shared))
          >= {textops.PREFIX_JOIN_MIN_J_E6}
    """,
)
def dedup_prefix_join(spark, sf_dir):
    """EXACT set-similarity self-join at Jaccard >= 0.5 via prefix
    filtering (SSJoin / All-Pairs / PPJoin): candidates come from an
    equi-join on each doc's n DIV 2 + 1 globally-rarest shingles, whose
    completeness at t = 0.5 is the SSJoin prefix lemma — so unlike
    dedup_jaccard_pairs (LSH candidates, recall measured per corpus)
    this oracle match is recall-1.0 by theorem on EVERY input. The
    deterministic exact path of the dedup family
    (textops.prefix_filter_pairs)."""
    return textops.prefix_join_pruned(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_containment",
    f"""
    WITH sh AS (SELECT DISTINCT * FROM ({_SHINGLE_SQL})),
    rare AS (
      SELECT shingle FROM sh GROUP BY 1
      HAVING count(*) BETWEEN 2 AND {textops.CONTAINMENT_DF_CAP}),
    rsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rsh a JOIN rsh b ON a.shingle = b.shingle
      WHERE a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    shared AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
           CAST(na.n_sh AS BIGINT) AS na, CAST(nb.n_sh AS BIGINT) AS nb,
           CAST(floor(1000000 * shared / least(na.n_sh, nb.n_sh)) AS BIGINT)
             AS cont_e6
    FROM shared
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE floor(1000000 * shared / least(na.n_sh, nb.n_sh)) >= 500000
    """,
)
def dedup_containment(spark, sf_dir):
    """Shingle-containment pairs (|A∩B| / min(|A|,|B|) >= 0.5): the
    doc-in-doc detector MinHash cannot express — Broder's containment
    vs resemblance distinction. Candidates come from shared RARE
    shingles (df <= 16 inverted-index cut, linear cost) instead of
    MinHash bands; exact re-score over full shingle sets. Both engines
    run the identical rare-shingle candidate rule, so the oracle
    matches exactly; the documented recall contract (pairs must share a
    rare shingle) lives in textops.containment_pairs."""
    return textops.containment_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_clusters",
    f"""
    WITH RECURSIVE sh AS ({_SHINGLE_SQL}),
    shd AS (SELECT DISTINCT * FROM sh),
    banded AS (
      SELECT doc_id, unnest(range(0, 8)) AS band, shingle FROM sh),
    sig AS (
      SELECT doc_id, band, min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS mh
      FROM banded GROUP BY 1, 2),
    bstat AS (
      SELECT band, mh, count(*) AS bsz, min(doc_id) AS bmin
      FROM sig GROUP BY 1, 2),
    sig2 AS (
      SELECT sig.doc_id, sig.band, sig.mh, bstat.bsz, bstat.bmin
      FROM sig JOIN bstat ON sig.band = bstat.band AND sig.mh = bstat.mh),
    small AS (SELECT * FROM sig2 WHERE bsz <= {textops.LSH_BUCKET_CAP}),
    cand AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM small a JOIN small b ON a.band = b.band AND a.mh = b.mh
        WHERE a.doc_id < b.doc_id
        UNION ALL
        SELECT bmin AS doc_a, doc_id AS doc_b
        FROM sig2 WHERE bsz > {textops.LSH_BUCKET_CAP} AND doc_id <> bmin)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
    shared AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared
      FROM cand c
      JOIN shd a ON a.doc_id = c.doc_a
      JOIN shd b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    verified AS (
      SELECT doc_a, doc_b
      FROM shared
      JOIN sizes na ON na.doc_id = doc_a
      JOIN sizes nb ON nb.doc_id = doc_b
      WHERE floor(1000000 * shared / (na.n_sh + nb.n_sh - shared)) >= 300000),
    und AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL SELECT doc_b, doc_a FROM verified),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.node)
    SELECT node AS doc_id, min(r) AS rep_doc_id,
           CAST(min(r) = node AS BIGINT) AS is_rep
    FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup clustering + representative keep-list (textops.
    near_dup_clusters: LSH candidates -> exact Jaccard verify -> CC ->
    min-doc_id representative). Oracle: the same pipeline in SQL with a
    recursive-CTE transitive closure for the components (fine at check
    scale; the Spark side uses O(diameter) label propagation)."""
    return textops.near_dup_clusters(_t(spark, sf_dir, "documents")).select(
        "doc_id", "rep_doc_id", F.col("is_rep").cast("bigint").alias("is_rep")
    )


@_q(
    "sim_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(floor(1000 * list_dot_product(qv, cv) /
                  (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))) AS BIGINT) AS cos_e3
      FROM q, c WHERE query_id <> neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_e3,
             CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_e3 DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored)
    SELECT query_id, rank, neighbor_id, cos_e3 FROM ranked WHERE rank <= 3
    """,
)
def sim_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.where("vec_id < 8"), k=3)


@_q("sim_lsh_topk", similarity.lsh_topk_sql())  # approximate ANN path
def sim_lsh_topk(spark, sf_dir):
    """Multi-probe (Hamming<=2: probe_bits defaults to 2, i.e. 22
    buckets at n_planes=6) hyperplane LSH top-k; hash-verified
    against a DuckDB twin that buckets with the identical embedded
    plane literals. Recall vs the exact baseline is measured in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.where("vec_id < 8"), k=3)


@_q("sim_ivf_topk", similarity.ivf_topk_sql())
def sim_ivf_topk(spark, sf_dir):
    """IVF-flat ANN scale path (inverted centroid lists + nprobe):
    similarity.ivf_topk, hash-verified against the DuckDB twin."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, emb.where("vec_id < 8"), k=3)


@_q("sim_prefix_rerank", similarity.prefix_rerank_sql())
def sim_prefix_rerank(spark, sf_dir):
    """Progressive dimension-reduced ANN (Matryoshka-prefix rerank):
    coarse cosine over the first 16 dims -> top-10 candidates ->
    exact full-dim rerank to top-3. The bandwidth-scaling path between
    brute force (sim_cosine_topk) and IVF (sim_ivf_topk): the coarse
    pass reads 1/4 of the vector bytes and the exact pass reads only
    candidates. similarity.prefix_rerank, hash-verified vs the twin."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.prefix_rerank(emb, emb.where("vec_id < 8"), k=3)


@_q("dedup_embedding_pairs_lsh", similarity.lsh_near_dup_pairs_sql())
def dedup_embedding_pairs_lsh(spark, sf_dir):
    """The 100 TB-shaped embedding near-dup path: LSH bucket join +
    multi-probe + exact in-bucket re-score (similarity.lsh_near_dup_pairs)
    — replaces the brute-force crossJoin of dedup_embedding_pairs, which
    stays registered as the exact small-scale baseline the recall tests
    compare against."""
    return lsh_near_dup_pairs(_t(spark, sf_dir, "embeddings"))


KNN_K = 3            # neighbors kept per vector
KNN_MIN_COS_E3 = 100  # candidate floor (synthetic embeddings are near-orthogonal)


@_q(
    "sim_knn_graph",
    f"""
    WITH pairs AS ({similarity.lsh_near_dup_pairs_sql(min_cos_e3=KNN_MIN_COS_E3)}),
    sym AS (
      SELECT vec_a AS src, vec_b AS dst, cos_e3 FROM pairs
      UNION ALL
      SELECT vec_b, vec_a, cos_e3 FROM pairs),
    ranked AS (
      SELECT src, dst, cos_e3,
             row_number() OVER (PARTITION BY src
                                ORDER BY cos_e3 DESC, dst ASC) AS rn
      FROM sym)
    SELECT src, dst, CAST(cos_e3 AS BIGINT) AS cos_e3, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {KNN_K}
    """,
)
def sim_knn_graph(spark, sf_dir):
    """Approximate k-NN GRAPH over the embedding corpus (every
    vector's top-KNN_K neighbors, not one query's): LSH candidate
    pairs (bucket join + multi-probe, the 100 TB shape — same honest
    recall contract as dedup_embedding_pairs_lsh) symmetrized, then a
    per-source window rank keeps the KNN_K best by (cos DESC, id ASC).
    The substrate of SemDeDup clustering, embedding-space diversity
    sampling, and label propagation over semantic neighbors. The rank
    window partitions by vector id — bounded state, never a global
    sort; candidate fan-in per vector is already capped by the bucket
    structure."""
    from pyspark.sql import Window as W

    pairs = lsh_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), min_cos_e3=KNN_MIN_COS_E3
    ).localCheckpoint()
    sym = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"), "cos_e3"
    ).unionByName(
        pairs.select(
            F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"), "cos_e3"
        )
    )
    w = W.partitionBy("src").orderBy(F.desc("cos_e3"), F.asc("dst"))
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("src", "dst", F.col("cos_e3").cast("bigint"),
                F.col("rn").cast("bigint"))
    )


# Semantic-dup threshold. Production SemDeDup uses ~0.9+ on real text
# embeddings; the driver's synthetic embeddings are near-orthogonal
# (max pairwise cos 0.512 at sf0.01), so the REGISTERED threshold is
# 0.4 to keep the oracle sensitive to the clustering logic (at 0.9 the
# keep-list would degenerate to everyone-is-their-own-rep and a broken
# components pass could never fail the hash check).
_SEMDEDUP_COS_E3 = 400


@_q(
    "dedup_semantic_keep",
    f"""
    WITH RECURSIVE pairs AS ({similarity.lsh_near_dup_pairs_sql(min_cos_e3=_SEMDEDUP_COS_E3)}),
    verts AS (SELECT vec_id FROM embeddings),
    und AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION
      SELECT vec_b, vec_a FROM pairs),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM verts
      UNION
      SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.node)
    SELECT node AS vec_id, min(r) AS rep_vec_id,
           CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS BIGINT) AS is_rep
    FROM reach GROUP BY node
    """,
)
def dedup_semantic_keep(spark, sf_dir):
    """SemDeDup-style semantic deduplication keep-list (Abbas et al.
    2023): the EMBEDDING-space twin of dedup_clusters — paraphrases and
    template re-renders that share no shingles but land at high
    cosine collapse to one representative per semantic cluster. Pipeline:
    LSH near-dup pairs (hyperplane buckets + multi-probe, no all-pairs
    join) -> connected components over the thresholded-cosine graph (min-label
    propagation) -> representative = min vec_id; vectors with no
    semantic twin are their own representative. Approximate with the
    same documented recall contract as dedup_embedding_pairs_lsh (pairs
    beyond probe_bits Hamming distance are unseen — both engines use
    identical literal hyperplanes, so the oracle matches exactly).

    100 TB shape: bucketed joins + O(diameter) label rounds; semantic
    clusters are cliques/short chains, and the production variant would
    cap cluster fan-in exactly like the shingle-LSH bucket cap."""
    from denrl_spark.operators.linking import connected_components

    emb = _t(spark, sf_dir, "embeddings")
    pairs = lsh_near_dup_pairs(emb, min_cos_e3=_SEMDEDUP_COS_E3)
    nodes = emb.select(F.col("vec_id").alias("node_id"))
    edges = pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    comp = connected_components(nodes, edges)
    return comp.select(
        F.col("node_id").alias("vec_id"),
        F.col("component").alias("rep_vec_id"),
        (F.col("node_id") == F.col("component")).cast("bigint").alias("is_rep"),
    )


# SimHash: 16-bit signature; bit j = sign of sum over tokens of
# (+1/-1 from the parity of hex digit j of md5(token)). The md5-hex
# digit parity is the shared Spark/DuckDB hash family (same trick as
# MinHash above).
_N_SIMHASH_BITS = 16


@_q(
    "dedup_simhash",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    w AS (SELECT doc_id, """
    + ", ".join(
        f"sum((ascii(substr(md5(tok), {j + 1}, 1)) % 2) * 2 - 1) AS w{j}"
        for j in range(_N_SIMHASH_BITS)
    )
    + """
      FROM t GROUP BY 1)
    SELECT doc_id, CAST("""
    + " + ".join(f"(CASE WHEN w{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_N_SIMHASH_BITS))
    + """ AS BIGINT) AS simhash
    FROM w
    """,
)
def dedup_simhash(spark, sf_dir):
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    sums = [
        F.sum(
            (F.ascii(F.substring(F.md5("tok"), j + 1, 1)) % 2) * 2 - 1
        ).alias(f"w{j}")
        for j in range(_N_SIMHASH_BITS)
    ]
    w = t.groupBy("doc_id").agg(*sums)
    sig = None
    for j in range(_N_SIMHASH_BITS):
        term = F.when(F.col(f"w{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return w.select("doc_id", sig.cast("bigint").alias("simhash"))


@_q(
    "dedup_embedding_pairs",  # embedding-cosine near-dup pairs
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(floor(1000 * list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) AS BIGINT) AS cos_e3
      FROM e a, e b WHERE a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cos_e3 FROM pairs WHERE cos_e3 >= 300
    """,
)
def dedup_embedding_pairs(spark, sf_dir):
    """Near-duplicate embedding pairs (cos >= 0.30): brute-force exact —
    the small-scale correctness baseline and the recall oracle for the
    production path, dedup_embedding_pairs_lsh
    (similarity.lsh_near_dup_pairs). JVM-side HOF math only."""
    from denrl_spark.functions.similarity import _dot, _norm

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.floor(
            1000 * _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
        )
        .cast("bigint")
        .alias("cos_e3"),
    )
    return scored.where(F.col("cos_e3") >= 300)


@_q(
    "sim_quantize_int8",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS amax, v FROM e),
    q AS (SELECT vec_id,
                 CAST(floor(1000000000 * amax / 127) AS BIGINT) AS scale_e9,
                 generate_subscripts(v, 1) - 1 AS dim,
                 CASE WHEN amax = 0 THEN 0
                      ELSE CAST(round(127 * unnest(v) / amax) AS BIGINT) END AS qval
          FROM m)
    SELECT vec_id, scale_e9, CAST(dim AS INT) AS dim, qval FROM q
    """,
)
def sim_quantize_int8(spark, sf_dir):
    """Per-vector symmetric int8 quantization (similarity.quantize_int8),
    emitted exploded to (vec_id, scale_e9, dim, qval) integer rows so
    the value hash is array-layout-independent. Both engines round
    half-away-from-zero, so the quantized values match bit-exactly."""
    q = similarity.quantize_int8(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", "scale_e9", F.posexplode("qvec").alias("dim", "qval")
    ).select("vec_id", "scale_e9", "dim", F.col("qval").cast("bigint").alias("qval"))


@_q("sim_pq_codes", similarity.pq_codes_sql())
def sim_pq_codes(spark, sf_dir):
    """Product-quantization encode (the IVF-PQ compression stage —
    vectors stored as n_sub one-byte codes, 32x smaller than int8):
    per (vec_id, sub), the nearest sub-codebook centroid id and exact
    integer-floored squared-L2 quantization error. Codebooks are the
    deterministic md5-ordered corpus sample (the ivf_topk discipline:
    the zero-training pick is the hash-oracle-able one; Lloyd
    refinement drops in per subspace via kmeans_centroids). Broadcast
    codebook join + min(struct) groupBy, no window, all JVM."""
    return similarity.pq_codes(_t(spark, sf_dir, "embeddings"))


@_q("sim_pq_adc", similarity.pq_adc_sql())
def sim_pq_adc(spark, sf_dir):
    """ADC top-k search over the PQ-compressed corpus (the search half
    of IVF-PQ): per-query lookup tables of exact sub-distances to the
    codebook, candidate distance = integer sum of LUT entries indexed
    by stored codes — one scan of the n_sub-bytes-per-vector codes
    table, broadcast LUT join, map-side-combined sum; full-precision
    vectors never read at query time. LUT entries are floored to
    integers BEFORE summation so the aggregate is associative and the
    engines agree exactly."""
    return similarity.pq_adc_topk(_t(spark, sf_dir, "embeddings"))


@_q("sim_mmr", similarity.mmr_topk_sql())
def sim_mmr(spark, sf_dir):
    """Maximal-marginal-relevance diversified top-k rerank (Carbonell
    & Goldstein 1998): after candidate generation, greedily select k
    results trading relevance-to-query against max similarity to the
    already-selected set — the dedup-at-selection-time step that stops
    a retrieval-backed data pipeline from keeping five near-copies of
    the same passage. All comparisons on 1e-3-floored integer cosines
    (exact cross-engine ordering); unrolled MATERIALIZED-CTE greedy
    twin; candidate-bounded per-step work (see similarity.mmr_topk)."""
    return similarity.mmr_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "rel_weighted_sample",
    """
    SELECT o_orderpriority, o_orderkey FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
                                 AS BIGINT) + 1) / 281474976710657.0)
                        / o_totalprice DESC,
                        o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 10
    """,
)
def rel_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES), 10 per priority class weighted by order value — the
    quality-weighted subsampling primitive of dataset curation
    (functions/ranking.py:weighted_sample). Content-hash randomness:
    reproducible under any partitioning, no seed stream."""
    from denrl_spark.functions.ranking import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "orders"),
        "o_orderpriority", "o_orderkey", "o_totalprice", k=10,
    )


@_q(
    "rel_sample_deterministic",  # F3 random sample, hash-seeded (reproducible)
    """
    SELECT doc_id FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    """,
)
def rel_sample_deterministic(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .where(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .select("doc_id")
    )


@_q(
    "text_vocab_top20",  # A5 vocab build
    """
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1)
    SELECT token, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) + 1 AS INT) AS token_id, cnt
    FROM counts QUALIFY token_id <= 21
    """,
)
def text_vocab_top20(spark, sf_dir):
    return (
        textops.build_vocab(_t(spark, sf_dir, "documents"))
        .where(F.col("token_id") <= 21)
    )


@_q(
    "text_encode_tokens",  # M6 word->id encode (broadcast vocab join)
    """
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    vocab AS (
      SELECT token, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) + 1 AS INT) AS token_id
      FROM counts),
    pos AS (
      SELECT doc_id,
             CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 20)
    SELECT p.doc_id, p.pos, COALESCE(v.token_id, 1) AS token_id
    FROM pos p LEFT JOIN vocab v ON p.tok = v.token
    """,
)
def text_encode_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    vocab = textops.build_vocab(docs)
    return textops.encode_tokens(docs.where("doc_id < 20"), vocab)


@_q(
    "rel_hot_keys",
    """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT count(*) AS total FROM events)
    SELECT user_id, n, CAST(floor(1000000 * n / tot.total) AS BIGINT) AS share_e6
    FROM c CROSS JOIN tot
    ORDER BY n DESC, user_id ASC LIMIT 10
    """,
)
def rel_hot_keys(spark, sf_dir):
    """Skew diagnostics: the top-10 hottest join/agg keys with their
    traffic share — the profiling step that decides salting/AQE-skew
    settings before a 100 TB run. TakeOrdered top-k (no global sort, no
    single-partition exchange). The table is scanned ONCE: the per-key
    counts are eagerly checkpointed, the total is a key-count-sized sum
    over them collected at construction time (embedding the global
    1-row aggregate in the plan would reintroduce a SinglePartition
    exchange — the one shape the plan-hygiene sweep forbids), and the
    ranking reads the same checkpoint."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("n")).collect()[0][0]
    return (
        counts.withColumn(
            "share_e6", F.floor(1_000_000 * F.col("n") / F.lit(total)).cast("bigint")
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .select("user_id", "n", "share_e6")
    )


SALT_BUCKETS = 16  # two-stage aggregate fan-out for hot keys


@_q(
    "rel_salted_agg",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY 1
    """,
)
def rel_salted_agg(spark, sf_dir):
    """Two-stage SALTED aggregate — the explicit skew-mitigation shape
    for a hot grouping key (a handful of event types absorb the whole
    stream): stage 1 groups by (key, salt=pmod(event_id, 16)) so the
    hottest key's rows spread over SALT_BUCKETS reducers, stage 2
    re-sums the 16 partials per key. Identical result to the plain
    aggregate (the oracle IS the plain aggregate; counts and integer
    cent-sums are associative), plan-asserted to carry both exchanges.
    Spark's partial (map-side) aggregation mitigates this case on its
    own; the salted form is the pattern for when it can't — high-
    cardinality-state aggs (count distinct, collect) where map-side
    combine degenerates and AQE skew handling doesn't apply to
    aggregates. Cents via floor(value*100): one IEEE double multiply,
    bit-identical cross-engine, then exact integer sums."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100).cast("bigint")
    )
    partial = (
        ev.withColumn("salt", F.pmod("event_id", F.lit(SALT_BUCKETS)))
        .groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("cents").alias("pc"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("pc").cast("bigint").alias("sum_cents"),
    )


@_q(
    "rel_salted_join",
    """
    WITH d AS (SELECT DISTINCT event_type FROM events)
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CAST(floor(e.value * 100) AS BIGINT)
                    * length(d.event_type)) AS BIGINT) AS weighted_cents
    FROM events e JOIN d USING (event_type)
    GROUP BY 1
    """,
)
def rel_salted_join(spark, sf_dir):
    """SALTED skew join — the pattern for a hot join key when the
    other side is too big to broadcast (here forced with a
    shuffle_hash hint so the demonstration survives AQE's broadcast
    rewrite): the dimension side is REPLICATED across SALT_BUCKETS
    salt values, the fact side derives salt = pmod(event_id, 16), and
    the equi-join runs on (key, salt) — the hottest key's rows land on
    16 reducers instead of one. Result identical to the unsalted join
    (the oracle IS the unsalted join); the plan is pytest-asserted to
    join on the salted key. AQE skew-join handles sort-merge skew
    adaptively; explicit salting is the deterministic form that also
    covers shuffled-hash joins and pre-AQE engines, and the join-side
    twin of rel_salted_agg."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.pmod("event_id", F.lit(SALT_BUCKETS)).alias("salt"),
    )
    dim = (
        ev.select("event_type").distinct()
        .withColumn("weight", F.length("event_type").cast("bigint"))
        .withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)])),
        )
    )
    return (
        ev.join(dim.hint("shuffle_hash"), ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("cents") * F.col("weight"))
            .cast("bigint").alias("weighted_cents"),
        )
    )


QSKETCH_BUCKETS = 128  # fixed-histogram quantile sketch resolution
QSKETCH_WIDTH = 2      # bucket width in value units (range [0, 256))


@_q(
    "rel_quantile_sketch",
    f"""
    WITH h AS (
      SELECT event_type,
             least({QSKETCH_BUCKETS - 1},
                   CAST(floor(value / {QSKETCH_WIDTH}) AS BIGINT)) AS b,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(n) AS total FROM h GROUP BY 1),
    cum AS (
      SELECT h.event_type, h.b, t.total,
             sum(h.n) OVER (PARTITION BY h.event_type ORDER BY h.b
                            ROWS UNBOUNDED PRECEDING) AS c
      FROM h JOIN tot t USING (event_type))
    SELECT event_type,
           CAST(max(total) AS BIGINT) AS n,
           CAST(min(CASE WHEN 2 * c >= total THEN b END)
                * {QSKETCH_WIDTH} AS BIGINT) AS p50_est,
           CAST(min(CASE WHEN 20 * c >= 19 * total THEN b END)
                * {QSKETCH_WIDTH} AS BIGINT) AS p95_est
    FROM cum GROUP BY 1
    """,
)
def rel_quantile_sketch(spark, sf_dir):
    """Fixed-histogram quantile SKETCH: p50/p95 estimated as the lower
    bound of the first bucket whose cumulative count crosses the rank
    threshold (cross-multiplied integer rule — 2c >= n for p50,
    20c >= 19n for p95; no floats, no interpolation). The mergeable,
    single-pass alternative to exact percentiles (rel_percentiles
    sorts within groups): at 100 TB the histogram is a
    |groups| x 128-row map-side-combined aggregate — partial maps
    merge by addition, the shuffle carries bounded state per group,
    and error is bounded by the bucket width by construction. The
    same trade Spark's approx_percentile makes, in a deterministic
    ANSI-expressible form both engines hash identically."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.lit(QSKETCH_BUCKETS - 1),
            F.floor(F.col("value") / QSKETCH_WIDTH).cast("bigint"),
        ).alias("b"),
    )
    h = ev.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("n"))
    tot = h.groupBy("event_type").agg(F.sum("n").alias("total"))
    w = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = h.join(tot, "event_type").withColumn("c", F.sum("n").over(w))
    return cum.groupBy("event_type").agg(
        F.max("total").cast("bigint").alias("n"),
        (F.min(F.when(2 * F.col("c") >= F.col("total"), F.col("b")))
         * QSKETCH_WIDTH).cast("bigint").alias("p50_est"),
        (F.min(F.when(20 * F.col("c") >= 19 * F.col("total"), F.col("b")))
         * QSKETCH_WIDTH).cast("bigint").alias("p95_est"),
    )


DEBOUNCE_S = 60  # ingest-dedup window (seconds)


@_q(
    "rel_debounce",
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events),
    g AS (
      SELECT *, t - lag(t) OVER (PARTITION BY user_id, event_type
                                 ORDER BY t, event_id) AS gap
      FROM e)
    SELECT event_id, user_id, event_type, t
    FROM g WHERE gap IS NULL OR gap > {DEBOUNCE_S}
    """,
)
def rel_debounce(spark, sf_dir):
    """Ingest DEBOUNCE dedup: drop an event when the same (user, type)
    fired within DEBOUNCE_S seconds before it — the at-ingest noise
    filter (double-clicks, retry storms, at-least-once redelivery)
    every event pipeline runs before sessionization. Keep rule: an
    event survives iff a full quiet window preceded it (gap to the
    immediately preceding event of the key — kept or dropped — is
    NULL or > DEBOUNCE_S; ties sequenced by event_id). This is
    leading-edge-after-quiet debounce: a burst collapses to its first
    event and stays suppressed while the burst continues — distinct
    from keep-first-per-fixed-window, which re-admits mid-burst.

    Shape: one window over (user, type) — single shuffle on the key,
    partition-local sort; at 10^12 events the key space is wide so no
    skew, and the window never leaves the partition."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    return (
        e.withColumn("gap", F.col("t") - F.lag("t").over(w))
        .where(F.col("gap").isNull() | (F.col("gap") > DEBOUNCE_S))
        .select("event_id", "user_id", "event_type", "t")
    )


KMV_K = 64  # k-minimum-values sketch size


@_q(
    "rel_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
               AS BIGINT) AS hv
      FROM events),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h)
    SELECT event_type,
           count(*) AS n_kept,
           CAST(max(hv) AS BIGINT) AS kth_min,
           CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
                     ELSE ({KMV_K} - 1) * 281474976710656 // max(hv)
                END AS BIGINT) AS est_distinct
    FROM ranked WHERE rn <= {KMV_K}
    GROUP BY 1
    """,
)
def rel_kmv_distinct(spark, sf_dir):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.): per
    group keep the KMV_K smallest 48-bit md5 hashes of the key;
    estimate = (k-1) * 2^48 div kth_min, exact when fewer than k
    distinct values exist. The mergeable cardinality sketch of a
    100 TB pipeline — per-partition KMV states union by keeping the k
    smallest of the union, so the shuffle carries k values per
    (group, partition) instead of the distinct set (count(DISTINCT)
    shuffles EVERY distinct value). Deterministic + ANSI-expressible
    (unlike HLL whose register layouts differ per engine), so the
    sketch itself is hash-oracled, not just its contract. The
    window-rank form here is the check-scale expression; at fleet
    scale the same sketch folds through per-partition top-k heaps
    (TakeOrdered shape) with identical output."""
    h = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                16, 10,
            ).cast("bigint").alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    kept = h.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= KMV_K
    )
    two48 = 281474976710656  # 2^48
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("hv").cast("bigint").alias("kth_min"),
        F.when(F.count(F.lit(1)) < KMV_K, F.count(F.lit(1)))
        .otherwise(F.expr(f"CAST(({KMV_K} - 1) * {two48} AS BIGINT) div max(hv)"))
        .cast("bigint").alias("est_distinct"),
    )


CMS_D = 4    # count-min sketch: hash rows
CMS_W = 256  # counters per row


def _cms_coord_sql(key: str, d: str) -> str:
    return (f"CAST(('0x' || substr(md5({d} || ':' || {key}), 1, 12)) "
            f"AS BIGINT) % {CMS_W}")


@_q(
    "rel_cms_heavy",
    f"""
    WITH keyed AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    cells AS (
      SELECT d.d AS d, {_cms_coord_sql('k', 'd.d')} AS w
      FROM keyed CROSS JOIN (VALUES (0), (1), (2), (3)) d(d)),
    sketch AS (
      SELECT d, w, count(*) AS n FROM cells GROUP BY 1, 2),
    truth AS (
      SELECT k, count(*) AS true_n FROM keyed GROUP BY 1),
    probes AS (
      SELECT t.k, t.true_n, d.d AS d, {_cms_coord_sql('t.k', 'd.d')} AS w
      FROM truth t CROSS JOIN (VALUES (0), (1), (2), (3)) d(d))
    SELECT CAST(p.k AS BIGINT) AS user_id,
           CAST(max(p.true_n) AS BIGINT) AS true_n,
           CAST(min(s.n) AS BIGINT) AS est_n
    FROM probes p JOIN sketch s ON s.d = p.d AND s.w = p.w
    GROUP BY 1
    """,
)
def rel_cms_heavy(spark, sf_dir):
    """Count-min sketch frequency estimation (Cormode & Muthukrishnan
    2005) + point queries for every key: the mergeable heavy-hitter
    sketch of a 100 TB pipeline, completing the sketch family next to
    KMV (distinct count) and the fixed histogram (quantiles). Each
    event increments CMS_D counters (row d, column md5(d:key) mod
    CMS_W); a key's estimate is the MIN over its CMS_D counters —
    >= true count by construction, with overestimate bounded by
    collisions (eps ~ e/CMS_W of the stream length at delta ~
    e^-CMS_D). Deterministic md5 coordinates make the sketch itself
    ANSI-expressible and hash-oracle-able, unlike engine-native
    approx top-k whose internal state differs per engine.

    Shape: the sketch is a D x W = 1024-counter aggregate regardless
    of input size — per-partition partial maps combine by addition,
    the shuffle carries <= D*W rows per partition; the probe side
    joins the BROADCAST sketch (1024 rows) against the per-key truth
    aggregate. At fleet scale the truth CTE disappears (that's what
    the sketch replaces) and probes run against candidate keys only;
    carrying true_n here is what makes the est >= true contract
    externally checkable."""
    keyed = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    ds = F.array(*[F.lit(d) for d in range(CMS_D)])

    def coord(key_col: str, d_col: str):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(d_col).cast("string"),
                                   F.lit(":"), F.col(key_col))),
                    1, 12,
                ),
                16, 10,
            ).cast("bigint"),
            F.lit(CMS_W),
        )

    cells = keyed.select(F.explode(ds).alias("d"), "k").select(
        "d", coord("k", "d").alias("w")
    )
    sketch = cells.groupBy("d", "w").agg(F.count(F.lit(1)).alias("n"))
    truth = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    probes = truth.select(
        "k", "true_n", F.explode(ds).alias("d")
    ).select("k", "true_n", "d", coord("k", "d").alias("w"))
    return (
        probes.join(F.broadcast(sketch), ["d", "w"])
        .groupBy("k")
        .agg(
            F.max("true_n").cast("bigint").alias("true_n"),
            F.min("n").cast("bigint").alias("est_n"),
        )
        .select(
            F.col("k").cast("bigint").alias("user_id"), "true_n", "est_n"
        )
    )


BLOOM_K = 3     # Bloom filter: hash functions per key
BLOOM_M = 4096  # bits


def _bloom_bit_sql(key: str, j: str) -> str:
    return (f"CAST(('0x' || substr(md5({j} || ':' || {key}), 1, 12)) "
            f"AS BIGINT) % {BLOOM_M}")


@_q(
    "rel_bloom_filter",
    f"""
    WITH members AS (
      SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders),
    set_bits AS (
      SELECT DISTINCT {_bloom_bit_sql('k', 'j.j')} AS bit
      FROM members CROSS JOIN (VALUES (0), (1), (2)) j(j)),
    probes AS (
      SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer),
    probe_bits AS (
      SELECT p.k, j.j AS j, {_bloom_bit_sql('p.k', 'j.j')} AS bit
      FROM probes p CROSS JOIN (VALUES (0), (1), (2)) j(j)),
    hits AS (
      SELECT pb.k,
             min(CASE WHEN sb.bit IS NOT NULL THEN 1 ELSE 0 END) AS bloom_hit
      FROM probe_bits pb LEFT JOIN set_bits sb ON sb.bit = pb.bit
      GROUP BY 1)
    SELECT CAST(h.k AS BIGINT) AS c_custkey,
           CAST(CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS is_member,
           CAST(h.bloom_hit AS INT) AS bloom_hit
    FROM hits h LEFT JOIN members m ON m.k = h.k
    """,
)
def rel_bloom_filter(spark, sf_dir):
    """Bloom-filter membership sketch (Bloom 1970) — the MEMBERSHIP
    entry completing the mergeable-sketch family next to KMV
    (distinct count), the fixed histogram (quantiles), and count-min
    (frequency): the decontamination / seen-before primitive of a
    100 TB pipeline, where "is this doc's fingerprint in the
    benchmark set" must be answered per corpus row without joining
    the corpus against the full reference set. Build: each member key
    sets BLOOM_K md5-derived bits of a BLOOM_M-bit array (bit =
    md5(j:key) mod M — deterministic coordinates make the filter
    itself ANSI-expressible and hash-oracle-able, unlike engine-native
    bloom builders whose bit layouts differ). Probe: a key "hits" iff
    ALL K of its bits are set — no false negatives by construction
    (bloom_hit >= is_member on every row, pytest property), false
    positives at ~ (set fraction)^K. Probes = every customer key,
    members = customers with orders, so the output exercises true
    hits, true misses, and (at these parameters) real false positives.

    Shape: the filter is <= M rows after a map-side-combined DISTINCT
    regardless of member count, then BROADCAST to the probe side —
    the probe scan never shuffles on the key; the truth column's
    member join exists only to make the no-false-negative contract
    externally checkable (at fleet scale it is exactly the join the
    filter replaces). Bit arrays merge by OR (here: UNION + DISTINCT),
    so per-partition partial filters combine associatively."""
    js = F.array(*[F.lit(j) for j in range(BLOOM_K)])

    def bit(key_col: str, j_col: str):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(j_col).cast("string"),
                                   F.lit(":"), F.col(key_col))),
                    1, 12,
                ),
                16, 10,
            ).cast("bigint"),
            F.lit(BLOOM_M),
        )

    members = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").cast("string").alias("k"))
        .distinct()
    )
    set_bits = (
        members.select(F.explode(js).alias("j"), "k")
        .select(bit("k", "j").alias("bit"))
        .distinct()
        .withColumn("present", F.lit(1))
    )
    probes = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("k")
    )
    hits = (
        probes.select("k", F.explode(js).alias("j"))
        .select("k", bit("k", "j").alias("bit"))
        .join(F.broadcast(set_bits), "bit", "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("present"), F.lit(0))).alias("bloom_hit"))
    )
    return (
        hits.join(
            F.broadcast(members.withColumn("mem", F.lit(1))), "k", "left"
        )
        .select(
            F.col("k").cast("bigint").alias("c_custkey"),
            F.coalesce(F.col("mem"), F.lit(0)).cast("int").alias("is_member"),
            F.col("bloom_hit").cast("int").alias("bloom_hit"),
        )
    )


@_q(
    "text_clean_normalize",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1F]', ' ', 'g'),
                '\\s+', ' ', 'g')) AS clean_text,
           CAST(length(text) - length(trim(regexp_replace(regexp_replace(lower(text),
                '[\\x00-\\x1F]', ' ', 'g'), '\\s+', ' ', 'g'))) AS INT) AS n_removed
    FROM documents
    """,
)
def text_clean_normalize(spark, sf_dir):
    """Text normalization pass (curation pre-step): lowercase, strip
    control characters, collapse whitespace — all JVM regexp, one scan,
    with a removed-char count so a pipeline can monitor cleanup volume."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[\x00-\x1F]", " "),
            r"\s+",
            " ",
        )
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        cleaned.alias("clean_text"),
        (F.length("text") - F.length(cleaned)).cast("int").alias("n_removed"),
    )


@_q(
    "rel_cube_agg",  # multi-dim rollup (cube) over documents metadata
    """
    SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY CUBE (lang, source)
    """,
)
def rel_cube_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


@_q(
    "rel_lag_delta",  # lag window: inter-event gap sums per user
    """
    WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
    d AS (SELECT user_id, t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS dt FROM e)
    SELECT user_id, CAST(sum(dt) AS BIGINT) AS total_gap, count(*) AS n_gaps
    FROM d WHERE dt IS NOT NULL GROUP BY 1
    """,
)
def rel_lag_delta(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    d = e.withColumn("dt", F.col("t") - F.lag("t").over(w)).where(
        F.col("dt").isNotNull()
    )
    return d.groupBy("user_id").agg(
        F.sum("dt").cast("bigint").alias("total_gap"),
        F.count(F.lit(1)).alias("n_gaps"),
    )


@_q(
    "rel_running_total",  # running aggregate: cumulative value per user
    """
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CAST(floor(value * 1000000) AS BIGINT) AS v_micro
      FROM events)
    SELECT event_id, user_id, t,
           CAST(sum(v_micro) OVER (
             PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS running_v_micro
    FROM e
    """,
)
def rel_running_total(spark, sf_dir):
    """Running aggregate (the account-balance / cumulative-revenue
    staple): per user, ordered by (t, event_id), the cumulative sum of
    the event value in exact integer micros. One shuffle on the
    partition key + an in-partition sort — the frame is
    rows-unbounded-preceding, which Spark evaluates streamingly in one
    pass (no per-row re-scan); never a global sort. event_id breaks
    same-second ties so the prefix order (hence every prefix sum) is
    engine-independent."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("v_micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", "t",
        F.sum("v_micro").over(w).cast("bigint").alias("running_v_micro"),
    )


@_q(
    "rel_asof_join",  # as-of join: latest prior 'click' for each 'error'
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events),
    marked AS (
      SELECT event_id, user_id, event_type, t,
             last_value(CASE WHEN event_type = 'click' THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_t
      FROM e)
    SELECT event_id, user_id, last_click_t
    FROM marked WHERE event_type = 'error' AND last_click_t IS NOT NULL
    """,
)
def rel_asof_join(spark, sf_dir):
    """As-of join expressed as an ignore-nulls running last_value — the
    shuffle-once pattern that replaces a per-row range probe at scale
    (Spark has no native ASOF; pd.merge_asof in applyInPandas is the
    per-group alternative)."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = e.withColumn(
        "last_click_t",
        F.last(F.when(F.col("event_type") == "click", F.col("t")), ignorenulls=True).over(w),
    )
    return marked.where(
        (F.col("event_type") == "error") & F.col("last_click_t").isNotNull()
    ).select("event_id", "user_id", "last_click_t")


@_q(
    "rel_funnel",  # ordered-sequence funnel: view -> click -> error
    """
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events),
    s1 AS (SELECT user_id, min(t) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.t) AS t2
           FROM e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.t) AS t3
           FROM e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'error' AND e.t > s2.t2 GROUP BY 1)
    SELECT stage, count(*) AS n_users FROM (
      SELECT 1 AS stage, user_id FROM s1
      UNION ALL SELECT 2, user_id FROM s2
      UNION ALL SELECT 3, user_id FROM s3)
    GROUP BY 1
    """,
)
def rel_funnel(spark, sf_dir):
    """Ordered-sequence funnel (the event-analytics staple Spark has
    no native operator for): per user, the earliest 'view', the
    earliest 'click' STRICTLY AFTER it, the earliest 'error' strictly
    after that; output = users surviving each stage. Shape: one
    conditional min-aggregate per stage chained through equi-joins on
    the user key (stage frames shrink monotonically) — never a
    per-user sort or a window over the whole event stream; each stage
    is map-side combinable and reuses the same shuffle key."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    )
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("t").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("t") > F.col("t1"))
        .groupBy("user_id").agg(F.min("t").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "error")
        .join(s2, "user_id")
        .where(F.col("t") > F.col("t2"))
        .groupBy("user_id").agg(F.min("t").alias("t3"))
    )
    # tall (stage, user) union + groupBy(stage): map-side-combined
    # partial counts merged per stage key — NOT a global agg per stage,
    # which would plan an Exchange SinglePartition (the hygiene sweep
    # rejects that shape; caught there)
    tall = (
        s1.select(F.lit(1).alias("stage"), "user_id")
        .unionByName(s2.select(F.lit(2).alias("stage"), "user_id"))
        .unionByName(s3.select(F.lit(3).alias("stage"), "user_id"))
    )
    return tall.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@_q(
    "rel_retention",  # daily-cohort retention triangle
    """
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events),
    first AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
    act AS (SELECT DISTINCT user_id, day FROM e)
    SELECT f.cohort AS cohort_day,
           CAST(a.day - f.cohort AS BIGINT) AS day_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN first f USING (user_id)
    GROUP BY 1, 2
    """,
)
def rel_retention(spark, sf_dir):
    """Daily-cohort retention triangle: users grouped by first-seen
    day, counted per (cohort, day-offset) of later activity — the
    other event-analytics staple beside the funnel. All math is exact
    integer epoch-days. Shape: one min-aggregate for the cohort map,
    one distinct-activity projection, one equi-join on the user key,
    one map-side-combinable count-distinct — no windows, no per-user
    sort; at production scale the cohort map is the small side."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT) div 86400").alias("day"),
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort"))
    act = e.distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_day"),
            (F.col("day") - F.col("cohort")).cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RANGE_JOIN_W = 300  # attribution window width (seconds)


@_q(
    "rel_range_join",  # interval join: clicks within 5 min before each error
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events)
    SELECT err.event_id, err.user_id,
           count(*) AS n_clicks, max(c.t) AS last_click_t
    FROM e err
    JOIN e c ON c.user_id = err.user_id AND c.event_type = 'click'
            AND c.t >= err.t - {RANGE_JOIN_W} AND c.t < err.t
    WHERE err.event_type = 'error'
    GROUP BY 1, 2
    """,
)
def rel_range_join(spark, sf_dir):
    """Interval (range) join: for each 'error' event, the count and
    latest timestamp of 'click' events by the same user in the strict
    window [t-300, t). Spark has no native range join, and the naive
    formulation is a non-equi BroadcastNestedLoop; the scale shape
    used here is the BUCKETED range join: quantize time into buckets
    the width of the range, give each probe row the two buckets its
    window can touch (explode), EQUI-join on (user_id, bucket), then
    apply the residual range predicate. Each build row lands in
    exactly one bucket, so no pair can match twice and no distinct is
    needed; cost is O(matches), shuffle is a plain hash join on
    (user_id, bucket) — the same trick as the LSH band join."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    )
    w = F.lit(RANGE_JOIN_W)
    errors = (
        e.where(F.col("event_type") == "error")
        .select(
            "event_id", "user_id", F.col("t").alias("t_err"),
            F.explode(
                F.array(F.expr(f"t div {RANGE_JOIN_W} - 1"),
                        F.expr(f"t div {RANGE_JOIN_W}"))
            ).alias("bucket"),
        )
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("t").alias("t_click"),
        F.expr(f"t div {RANGE_JOIN_W}").alias("bucket"),
    )
    return (
        errors.join(clicks, ["user_id", "bucket"])
        .where(
            (F.col("t_click") >= F.col("t_err") - w)
            & (F.col("t_click") < F.col("t_err"))
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.max("t_click").alias("last_click_t"),
        )
    )


@_q(
    "rel_upsert_latest",  # CDC latest-wins compaction with tombstones
    """
    WITH log AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CAST(floor(value * 1000000) AS BIGINT) AS v_micro,
             CASE WHEN event_id % 16 = 0 THEN 'D' ELSE 'U' END AS op
      FROM events),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY t DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type)
               AS n_versions
      FROM log)
    SELECT user_id, event_type, t AS last_t, v_micro AS last_value_micro,
           n_versions
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
)
def rel_upsert_latest(spark, sf_dir):
    """CDC changelog compaction (the Iceberg/Hudi MERGE-snapshot
    semantic): the event stream read as an upsert log keyed by
    (user_id, event_type) with sequence (t, event_id) — every 16th
    record a tombstone — compacted to the latest-wins current-state
    table; keys whose LATEST record is a delete vanish. This is the
    changelog→snapshot pass every incremental table-format pipeline
    runs at compaction time. Shape: ONE map-side-combinable
    ``max_by(payload, struct(t, event_id))`` aggregate per key — a
    single shuffle on the key, no per-key sort and no window over the
    full log (the oracle's row_number formulation is the semantic
    spec, not the scale shape; a window would sort every version of
    every key). Values carried as exact integer micros (floor(v*1e6)
    — IEEE-identical in both engines); event_id uniqueness makes the
    winner deterministic."""
    e = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id", "user_id", "event_type",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
            F.floor(F.col("value") * 1000000).cast("bigint").alias("v_micro"),
        )
        .withColumn(
            "op",
            F.when(F.pmod("event_id", F.lit(16)) == 0, F.lit("D"))
            .otherwise(F.lit("U")),
        )
    )
    latest = e.groupBy("user_id", "event_type").agg(
        F.max_by(
            F.struct("op", "t", "v_micro"), F.struct("t", "event_id")
        ).alias("m"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return (
        latest.where(F.col("m.op") == "U")
        .select(
            "user_id", "event_type",
            F.col("m.t").alias("last_t"),
            F.col("m.v_micro").alias("last_value_micro"),
            "n_versions",
        )
    )


@_q(
    "rel_pivot",  # pivot: event counts per user across types
    """
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def rel_pivot(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "view"])
        .count()
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).cast("bigint").alias("click"),
            F.coalesce("error", F.lit(0)).cast("bigint").alias("error"),
            F.coalesce("view", F.lit(0)).cast("bigint").alias("view"),
        )
    )


@_q(
    "rel_percentiles",  # exact percentiles (integer-scaled for hash parity)
    """
    SELECT o_orderpriority,
           CAST(floor(1000 * quantile_cont(o_totalprice, 0.5)) AS BIGINT) AS p50_e3,
           CAST(floor(1000 * quantile_cont(o_totalprice, 0.9)) AS BIGINT) AS p90_e3
    FROM orders GROUP BY 1
    """,
)
def rel_percentiles(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.floor(1000 * F.percentile("o_totalprice", F.lit(0.5))).cast("bigint").alias("p50_e3"),
            F.floor(1000 * F.percentile("o_totalprice", F.lit(0.9))).cast("bigint").alias("p90_e3"),
        )
    )


@_q(
    "rel_tumbling_window",  # time-bucketed aggregation (batch twin of the
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def rel_tumbling_window(spark, sf_dir):
    # streaming windowed count in streaming/ingest.py
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Final-session additions: ANN quality eval, training-data chunking,
# gaps-and-islands, joint degree distribution, sweep-line concurrency
# --------------------------------------------------------------------------

_CHUNK_W = 64  # tokens per training chunk
_CHUNK_S = 48  # stride (16-token overlap carries context across chunks)


@_q(
    "text_chunk_windows",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    c AS (
      SELECT doc_id, toks, n,
             unnest(range(0, CASE WHEN n <= {_CHUNK_W} THEN 0
                              ELSE (n - {_CHUNK_W} + {_CHUNK_S - 1}) // {_CHUNK_S}
                              END + 1)) AS chunk_idx
      FROM d)
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * {_CHUNK_S} AS INT) AS start_tok,
           CAST(least({_CHUNK_W}, n - chunk_idx * {_CHUNK_S}) AS INT) AS n_tok,
           array_to_string(
             list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                        chunk_idx * {_CHUNK_S}
                          + least({_CHUNK_W}, n - chunk_idx * {_CHUNK_S})),
             ' ') AS chunk_text
    FROM c
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping fixed-token-window CHUNKING — the stage that turns a
    variable-length document corpus into bounded training windows
    (every LLM pretraining pipeline runs this before packing; the
    16-token overlap is the standard context-carry). Chunk count is
    1 if n <= W else ceil((n-W)/S)+1, so the final window always ends
    exactly at the document tail (no padding, no dropped suffix) —
    exact integer rule, hash-safe cross-engine.

    Shape: scan -> sequence/explode -> project. ZERO Exchange: no
    join, window, or aggregate anywhere — per-doc fan-out bounded by
    len/stride, embarrassingly parallel at any scale. Complements
    text_pack_sequences (which packs the chunks into fixed budgets)
    and text_substring_dedup (which removes cross-doc repeats first)."""
    W, S = _CHUNK_W, _CHUNK_S
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    last = (
        F.when(F.col("n") <= W, F.lit(0))
        .otherwise(F.floor((F.col("n") - W + (S - 1)) / S))
        .cast("int")
    )
    c = d.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * S
    n_tok = F.least(F.lit(W), F.col("n") - start)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        n_tok.cast("int").alias("n_tok"),
        F.array_join(F.slice("toks", start + 1, n_tok), " ").alias("chunk_text"),
    )


@_q(
    "sim_recall_eval",
    f"""
    WITH exact_t AS (SELECT * FROM ({{exact_sql}})),
    ann AS (SELECT * FROM ({{ann_sql}})),
    j AS (
      SELECT e.query_id,
             CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM exact_t e
      LEFT JOIN ann a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           CAST((1000000 * sum(hit)) // count(*) AS BIGINT) AS recall_ppm
    FROM j GROUP BY 1
    """.format(
        exact_sql=ORACLES["sim_cosine_topk"],
        ann_sql=similarity.lsh_topk_sql(),
    ),
)
def sim_recall_eval(spark, sf_dir):
    """ANN QUALITY EVALUATION as a first-class query: per-query
    recall@k of the LSH index (sim_lsh_topk) against the exact
    brute-force baseline (sim_cosine_topk), in exact integer ppm.
    This is the operator a production retrieval pipeline runs after
    every index (re)build — the measured counterpart of the recall
    assertions in tests/test_similarity.py, here hash-verified
    cross-engine because BOTH sides' full top-k logic (plane literals
    included) is restated in the oracle's nested CTEs.

    Shape: the two top-k subplans (already bucketed/broadcast-shaped)
    feed one equi-join on (query_id, neighbor_id) + one query-keyed
    aggregate over k-bounded rows — eval cost is O(|queries| * k)
    beyond the index probes themselves. At 100 TB you run it on a
    sampled query set; the sample bound is the knob, not the shape."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 8")
    exact = cosine_topk(emb, q, k=3).select("query_id", "neighbor_id")
    ann = (
        lsh_topk(emb, q, k=3)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        )
        .select(
            "query_id",
            "k_exact",
            "n_hit",
            F.floor((1_000_000 * F.col("n_hit")) / F.col("k_exact"))
            .cast("long")
            .alias("recall_ppm"),
        )
    )


@_q(
    "rel_gap_islands",
    """
    WITH seq AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    kept AS (SELECT * FROM seq WHERE (event_id * 2654435761) % 4 <> 0),
    isl AS (
      SELECT user_id, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM kept)
    SELECT user_id,
           CAST(min(rn) AS INT) AS start_rn,
           CAST(max(rn) AS INT) AS end_rn,
           CAST(count(*) AS BIGINT) AS n_run
    FROM isl GROUP BY user_id, grp
    """,
)
def rel_gap_islands(spark, sf_dir):
    """GAPS-AND-ISLANDS: maximal runs of consecutive per-user sequence
    numbers that SURVIVE a filter — the canonical shape for "which
    contiguous stretches of a session remain after a drop stage"
    (retry storms, moderation removals, sampling). The survivor set is
    synthesized deterministically (Knuth-hash drop of ~1/4 of events,
    pure bigint modular arithmetic, identical cross-engine). Island
    key = rn - row_number-over-survivors: constant within a
    consecutive run, strictly different across a gap — exact integer
    rule, no flag/prefix-sum pass needed.

    Shape: two windows + one aggregate, ALL keyed by user_id (the
    natural shard of a per-user event log; no global order anywhere).
    At 100 TB the windows co-partition with any upstream per-user
    stage — one shuffle total. Complements rel_sessionize (time-gap
    islands) with the sequence-gap variant."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("rn", F.row_number().over(w))
    kept = seq.where((F.col("event_id") * F.lit(2654435761)) % 4 != 0)
    w2 = Window.partitionBy("user_id").orderBy("rn")
    isl = kept.withColumn("grp", F.col("rn") - F.row_number().over(w2))
    return (
        isl.groupBy("user_id", "grp")
        .agg(
            F.min("rn").cast("int").alias("start_rn"),
            F.max("rn").cast("int").alias("end_rn"),
            F.count(F.lit(1)).cast("bigint").alias("n_run"),
        )
        .select("user_id", "start_rn", "end_rn", "n_run")
    )


@_q(
    "kg_degree_correlation",
    f"""
    WITH edges AS ({docs_kg.edges_by_doc_sql()}),
    deg AS (SELECT * FROM ({docs_kg.degree_sql()}))
    SELECT ds.out_deg AS src_out_deg, dd.in_deg AS dst_in_deg,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(e.n_obs) AS BIGINT) AS sum_obs
    FROM edges e
    JOIN deg ds ON ds.surface = e.src_surface
    JOIN deg dd ON dd.surface = e.dst_surface
    GROUP BY 1, 2
    """,
)
def kg_degree_correlation(spark, sf_dir):
    """JOINT DEGREE DISTRIBUTION of the canonical graph: per directed
    edge, (out-degree of source, in-degree of target), histogrammed —
    the degree-assortativity signal (Newman 2002: hub-to-hub vs
    hub-to-leaf wiring) in its exact-integer, mergeable form. The
    Pearson assortativity coefficient is a closed-form function of
    these cells (moments are integer sums over the histogram), so the
    float sqrt stays OUT of the hashed surface.

    Shape: the |V|-row degree table equi-joins the edge table twice on
    the vertex key (broadcast when |V| is small, AQE-splittable
    shuffle join otherwise; skewed hubs split by AQE), then ONE
    map-side-combined aggregate over a frame bounded by the distinct
    (deg, deg) support — tiny on any power-law graph."""
    from denrl_spark.operators.graph_analytics import degree_correlation

    return degree_correlation(docs_kg.edges_by_doc(spark, sf_dir))


@_q(
    "rel_concurrency",
    """
    WITH d AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, 1 AS delta
      FROM events
      UNION ALL
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) + 1800, -1
      FROM events),
    r AS (
      SELECT event_type, t,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS run
      FROM d)
    SELECT event_type,
           CAST(t // 3600 AS BIGINT) AS hour_bucket,
           CAST(max(run) AS BIGINT) AS max_concurrent
    FROM r GROUP BY 1, 2
    """,
)
def rel_concurrency(spark, sf_dir):
    """SWEEP-LINE peak concurrency: each event opens a 30-min activity
    interval [t, t+1800); per (event_type, hour), the maximum number
    of simultaneously open intervals — the capacity-planning stat
    behind "peak concurrent sessions". Interval-end deltas sort BEFORE
    same-instant starts (ORDER BY t, delta with -1 < +1: the [s, e)
    convention), so the rule is exact and the per-bucket max is
    tie-order invariant (equal-delta ties permute prefix sums within
    the same multiset).

    Shape — the scalable TWO-PHASE sweep, not a global sort: the
    running sum decomposes as bucket_offset + within-bucket prefix.
    Phase 1 windows the deltas per (event_type, hour_bucket) —
    bounded partitions, one shuffle, and the following per-bucket
    aggregate reuses that partitioning. Phase 2 windows the tiny
    per-bucket frame (|types| x |hours| rows) per event_type to build
    exclusive offsets. The oracle restates it as the textbook single
    window; bucket granularity is the scale knob."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.unix_timestamp("ts")).cast("long").alias("t")
    )
    d = e.select("event_type", "t", F.lit(1).alias("delta")).unionByName(
        e.select(
            "event_type",
            (F.col("t") + 1800).alias("t"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("hour_bucket", F.floor(F.col("t") / 3600).cast("long"))
    w_in = (
        Window.partitionBy("event_type", "hour_bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = d.withColumn("run_in", F.sum("delta").over(w_in))
    per_bucket = runs.groupBy("event_type", "hour_bucket").agg(
        F.max("run_in").alias("max_in"),
        F.sum("delta").alias("bsum"),
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_bucket.withColumn(
        "off", F.coalesce(F.sum("bsum").over(w_off), F.lit(0))
    ).select(
        "event_type",
        "hour_bucket",
        (F.col("off") + F.col("max_in")).cast("bigint").alias("max_concurrent"),
    )


@_q(
    "rel_rollup_agg",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_stat,
           count(*) AS n,
           CAST(sum(CAST(floor(100 * o_totalprice) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rel_rollup_agg(spark, sf_dir):
    """Hierarchical ROLLUP (leaf -> per-priority subtotal -> grand
    total) with explicit GROUPING indicators so subtotal rows are
    distinguishable from genuine-NULL keys; money summed as exact
    per-row integer cents (floor(100*x) BEFORE the sum) so the hash
    never sees float accumulation order. Complements rel_cube_agg:
    rollup is the prefix-lattice shape (|levels| ~ dims, not 2^dims).
    One Expand + one map-side-combined aggregate — a single shuffle
    regardless of level count."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(100 * F.col("o_totalprice")).cast("bigint")
    )
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.grouping("o_orderstatus").cast("int").alias("g_stat"),
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            "o_orderpriority", "o_orderstatus",
            "g_prio", "g_stat", "n", "sum_cents",
        )
    )


@_q(
    "kg_pred_functionality",
    f"""
    WITH edges AS ({docs_kg.edges_by_doc_sql()})
    SELECT pred,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(DISTINCT src_surface) AS BIGINT) AS n_subj,
           CAST(count(DISTINCT dst_surface) AS BIGINT) AS n_obj,
           CAST((1000000 * count(DISTINCT src_surface)) // count(*) AS BIGINT)
             AS functionality_ppm,
           CAST((1000000 * count(DISTINCT dst_surface)) // count(*) AS BIGINT)
             AS inv_functionality_ppm
    FROM edges GROUP BY 1
    """,
)
def kg_pred_functionality(spark, sf_dir):
    """Per-predicate FUNCTIONALITY profile — the schema-induction
    statistic (PARIS/AMIE lineage: functionality = |distinct subj| /
    |edges|, 1.0 ppm-scale means every subject has exactly one object)
    that drives which predicates kg_conflicts may treat as functional
    and which direction an entity-resolution pass should trust.
    Exact integer ppm; edge grain is the DISTINCT (subj, pred, obj)
    canonical edge, so n_obs weighting never skews the profile.

    Shape: one aggregate over the edge table keyed by pred; the two
    countDistincts plan as the usual two-phase expand — still a single
    shuffle on a |preds|-bounded frame."""
    edges = docs_kg.edges_by_doc(spark, sf_dir)
    return (
        edges.groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.countDistinct("src_surface").cast("bigint").alias("n_subj"),
            F.countDistinct("dst_surface").cast("bigint").alias("n_obj"),
        )
        .select(
            "pred", "n_edges", "n_subj", "n_obj",
            F.floor((1_000_000 * F.col("n_subj")) / F.col("n_edges"))
            .cast("long").alias("functionality_ppm"),
            F.floor((1_000_000 * F.col("n_obj")) / F.col("n_edges"))
            .cast("long").alias("inv_functionality_ppm"),
        )
    )


_BM25_TERMS = ("join", "hash", "spark", "vector")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_BM25_K = 20


@_q(
    "text_bm25",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(dl) AS BIGINT) AS a FROM dd),
    tf AS (
      SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
      WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2),
    dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    c AS (
      SELECT tf.doc_id,
             CAST(floor(
               CAST(floor((1000000 * (22 * a * tf.tf))
                          / (10 * a * tf.tf + 3 * a + 9 * n * dd.dl)) AS BIGINT)
               * (2 * n - 2 * df + 1) / (2 * df + 1)) AS BIGINT) AS contrib
      FROM tf JOIN dd USING (doc_id) JOIN dfr USING (term), tot)
    SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
           CAST(sum(contrib) AS BIGINT) AS score_e6
    FROM c GROUP BY 1
    ORDER BY score_e6 DESC, doc_id ASC LIMIT {_BM25_K}
    """,
)
def text_bm25(spark, sf_dir):
    """BM25 LEXICAL RETRIEVAL top-k over the corpus for a frozen query
    term set — the keyword-search half of a hybrid retrieval stack (the
    dense half is sim_cosine_topk/sim_lsh_topk), and the standard
    quality-curation ranking for "find docs about X" audits. Okapi
    BM25 with k1 = 6/5, b = 3/4 restated in EXACT RATIONAL form so the
    score is hash-safe cross-engine:

      tf-part  = 22*A*tf / (10*A*tf + 3*A + 9*N*dl)   (A = total tokens,
                 N = docs; algebraically identical to the k1/b form with
                 avgdl = A/N, multiplied through by 10*A)
      idf-part = (2N - 2df + 1)/(2df + 1)             (the log-FREE
                 rational BM25 idf — the same monotone core the Robertson
                 log wraps; ln() is transcendental and its last ULP is
                 not portable across engines, so the repo's integer-exact
                 score convention uses the rational form directly)

    Each term contribution is floor-scaled to 1e-6 units in two steps
    (tf-part first, then idf multiply) so every intermediate is an
    exact bigint and the one double division per step has integer
    operands < 2^53 (exact while 2.2e7 * A * tf < 2^53, i.e. A up to
    ~4e8 tokens at tf<=10; past that drop the scale to 1e3 or move the
    products to decimal(38,0) — the floor semantics carry over). The
    per-term integer contributions then sum order-invariantly.

    Shape: one corpus scan -> explode filtered to the |Q| query terms
    (fan-out |Q| rows/doc max, not |doc|), map-side-combined tf
    aggregate — LOCALCHECKPOINTED so the term-sparse tf frame feeds
    both the df aggregate and the scoring join without re-evaluating
    the corpus scan twice (plan-verified: the uncheckpointed form
    scanned parquet once per subtree) — a |Q|-row df aggregate
    BROADCAST back, one doc-keyed aggregate, TakeOrdered top-k (no
    global sort, no SinglePartition). Corpus totals (N, A) come off a
    one-row driver action and return as literals — the
    text_source_mixture pattern. At 100 TB: tf rows are bounded by
    |Q| * n_docs_containing_a_term; everything downstream of the scan
    is term-sparse."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("dl", F.size("toks").cast("bigint"))
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("a"),
    ).collect()[0]
    n_docs, a_tok = int(tot["n"]), int(tot["a"])
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    # tf is unique per (doc_id, term) by construction, so a plain
    # count IS the document frequency (and matches the twin's count(*))
    dfr = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    tf_part = F.floor(
        (1_000_000 * (22 * a_tok) * F.col("tf"))
        / (10 * a_tok * F.col("tf") + 3 * a_tok + 9 * n_docs * F.col("dl"))
    ).cast("long")
    contrib = F.floor(
        tf_part * (2 * n_docs - 2 * F.col("df") + 1) / (2 * F.col("df") + 1)
    ).cast("long")
    return (
        tf.join(F.broadcast(dfr), "term")
        .select("doc_id", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            F.sum("contrib").cast("bigint").alias("score_e6"),
        )
        .orderBy(F.desc("score_e6"), F.asc("doc_id"))
        .limit(_BM25_K)
    )


@_q(
    "dedup_levenshtein",
    f"""
    WITH cand AS ({ORACLES["dedup_lsh_pairs"]}),
    t AS (SELECT doc_id, text FROM documents),
    pairs AS (
      SELECT c.doc_a, c.doc_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
             CAST(greatest(len(a.text), len(b.text)) AS BIGINT) AS maxlen
      FROM cand c
      JOIN t a ON a.doc_id = c.doc_a
      JOIN t b ON b.doc_id = c.doc_b)
    SELECT doc_a, doc_b, lev,
           CAST(floor(1000000 * (maxlen - lev) / maxlen) AS BIGINT) AS sim_e6
    FROM pairs
    WHERE maxlen > 0 AND 2 * lev <= maxlen
    """,
)
def dedup_levenshtein(spark, sf_dir):
    """EDIT-DISTANCE near-dup verification — the character-grain twin of
    the shingle-Jaccard verify: LSH candidate pairs are confirmed by
    Levenshtein similarity sim = (maxlen - lev)/maxlen >= 1/2, the
    measure that catches single-character boilerplate drift (version
    strings, date stamps) that token shingles blur. Both engines'
    built-in unit-cost levenshtein agree exactly (integer edit counts);
    sim is floor-scaled to 1e-6 integer units.

    Shape: the DP is O(la*lb) per pair, so it NEVER runs all-pairs —
    candidates come from the capped LSH bucket join
    (textops.lsh_candidate_pairs, cost ~ |candidates|), and a length
    prefilter drops hopeless pairs BEFORE the quadratic DP: lev >=
    |la - lb| always, so 2*|la - lb| > maxlen cannot pass the final
    2*lev <= maxlen cut (the filter is implied by the output predicate
    — same result set, the DP just never runs on length-skewed pairs).
    At 100 TB: two candidate-sized equi-joins on doc_id for the texts,
    then per-row compute — embarrassingly parallel, cost proportional
    to surviving candidates. The oracle nests the dedup_lsh_pairs twin
    (cap semantics included) and verifies the identical pair set."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cand = textops.lsh_candidate_pairs(docs)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    p = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("la", F.length("ta").cast("bigint"))
        .withColumn("lb", F.length("tb").cast("bigint"))
        .withColumn("maxlen", F.greatest("la", "lb"))
        .where(
            (F.col("maxlen") > 0)
            & (2 * F.abs(F.col("la") - F.col("lb")) <= F.col("maxlen"))
        )
        .withColumn("lev", F.levenshtein("ta", "tb").cast("bigint"))
        .where(2 * F.col("lev") <= F.col("maxlen"))
    )
    return p.select(
        "doc_a",
        "doc_b",
        "lev",
        F.floor(1_000_000 * (F.col("maxlen") - F.col("lev")) / F.col("maxlen"))
        .cast("long")
        .alias("sim_e6"),
    )


@_q(
    "sim_rrf",
    f"""
    WITH exact_t AS (SELECT * FROM ({{exact_sql}})),
    ann AS (SELECT * FROM ({{ann_sql}}))
    SELECT coalesce(e.query_id, a.query_id) AS query_id,
           coalesce(e.neighbor_id, a.neighbor_id) AS neighbor_id,
           CAST(CASE WHEN e.rank IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_exact,
           CAST(CASE WHEN a.rank IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_ann,
           CAST(coalesce(1000000 // (60 + e.rank), 0)
                + coalesce(1000000 // (60 + a.rank), 0) AS BIGINT) AS rrf_e6
    FROM exact_t e
    FULL OUTER JOIN ann a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    """.format(
        exact_sql=ORACLES["sim_cosine_topk"],
        ann_sql=similarity.lsh_topk_sql(),
    ),
)
def sim_rrf(spark, sf_dir):
    """HYBRID-RETRIEVAL FUSION via Reciprocal Rank Fusion (Cormack et
    al. 2009): the standard way production search stacks combine a
    lexical/exact ranking with an ANN ranking without score
    calibration. Per (query, candidate): rrf = sum over the lists that
    retrieved it of 1/(60 + rank), here as exact integer contributions
    floor(1e6/(60+rank)) summed order-invariantly (the repo's
    integer-score convention — rank is a small int, so the per-list
    term is an exact integer division, no float sum ordering to drift
    cross-engine). in_exact/in_ann flags make the provenance auditable.

    Shape: the two top-k subplans are the already-bucketed index probes
    (brute-force-baseline cosine + hyperplane-LSH ANN); fusion itself
    is ONE full-outer equi-join on (query_id, neighbor_id) over
    k-bounded rows — O(|queries| * k), trivially parallel, no new
    scale shape. At 100 TB both inputs are index probes, not scans."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 8")
    exact = cosine_topk(emb, q, k=3).select(
        "query_id", "neighbor_id", F.col("rank").alias("re")
    )
    ann = lsh_topk(emb, q, k=3).select(
        F.col("query_id").alias("qa"),
        F.col("neighbor_id").alias("na"),
        F.col("rank").alias("ra"),
    )
    j = exact.join(
        ann,
        (F.col("query_id") == F.col("qa")) & (F.col("neighbor_id") == F.col("na")),
        "full_outer",
    )
    term = lambda r: F.coalesce(
        F.floor(F.lit(1_000_000) / (60 + F.col(r))).cast("long"), F.lit(0)
    )
    return j.select(
        F.coalesce("query_id", "qa").alias("query_id"),
        F.coalesce("neighbor_id", "na").alias("neighbor_id"),
        F.col("re").isNotNull().cast("int").alias("in_exact"),
        F.col("ra").isNotNull().cast("int").alias("in_ann"),
        (term("re") + term("ra")).cast("bigint").alias("rrf_e6"),
    )


@_q(
    "rel_anomaly",
    """
    WITH v AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS v_cents
      FROM events),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v_cents) AS BIGINT) AS s,
             CAST(sum(v_cents * v_cents) AS BIGINT) AS q
      FROM v GROUP BY 1)
    SELECT v.event_id, v.event_type, v.v_cents,
           CAST(floor(1000 * (v.v_cents * n - s) /
                sqrt(CAST(n * q - s * s AS DOUBLE))) AS BIGINT) AS z_e3
    FROM v JOIN s USING (event_type)
    WHERE (v.v_cents * n - s) > 0
      AND (v.v_cents * n - s) * (v.v_cents * n - s) > 9 * (n * q - s * s)
    """,
)
def rel_anomaly(spark, sf_dir):
    """STATISTICAL ANOMALY GATE — flag events whose value sits more
    than 3 sigma above its event-type mean, the per-key outlier filter
    every metrics/billing ingest runs before aggregation. The 3-sigma
    rule is evaluated in EXACT integer algebra (the cents trick:
    v = floor(100*value) — both engines floor the identical double
    product): (v - mu) > 3*sigma  <=>  (v*n - S) > 0 AND
    (v*n - S)^2 > 9*(n*Q - S^2), with S = sum(v), Q = sum(v^2) — no
    float mean/stddev ever computed, so the flag set is hash-exact.
    The reported z_e3 IS one deterministic double op chain (bigint ->
    double conversion, IEEE-exact sqrt, one division, floor). Bigint
    envelope: needs (v*n - S)^2 and n*Q < 2^63 — at v_cents <= 5e4
    that is ~1e9 rows per key; past it, scale cents down or move the
    squares to decimal(38,0).

    Shape: one scan -> one map-side-combined per-type aggregate
    (|event_types| rows) BROADCAST back onto the stream -> stateless
    filter. No window, no sort; the heavy side is touched twice but
    shuffles zero rows at any scale."""
    v = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_cents").cast("bigint").alias("s"),
        F.sum(F.col("v_cents") * F.col("v_cents")).cast("bigint").alias("q"),
    )
    dev = F.col("v_cents") * F.col("n") - F.col("s")
    # dev = n*(v - mu) and sqrt(n*Q - S^2) = n*sigma, so z = dev/sqrt(n*Q - S^2)
    nvar = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        v.join(F.broadcast(s), "event_type")
        .where((dev > 0) & (dev * dev > 9 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))))
        .select(
            "event_id",
            "event_type",
            "v_cents",
            F.floor(1000 * dev / F.sqrt(nvar.cast("double")))
            .cast("bigint")
            .alias("z_e3"),
        )
    )


@_q("kg_coreness", docs_kg.coreness_sql())
def kg_coreness(spark, sf_dir):
    """FULL core decomposition (per-vertex core number) via the
    h-index operator, fixed 6 sweeps in both engines — the density
    rank for every entity, where kg_kcore returns only one fixed-k
    core's survivors. See graph_analytics.coreness for the
    convergence and shape contract."""
    from denrl_spark.operators.graph_analytics import coreness

    return coreness(docs_kg.edges_by_doc(spark, sf_dir), rounds=6)


@_q(
    "dedup_est_vs_exact",
    f"""
    WITH shx AS (SELECT DISTINCT * FROM ({_SHINGLE_SQL})),
    sigx AS MATERIALIZED (
      SELECT doc_id, band,
             min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS mh
      FROM (SELECT doc_id, unnest(range(0, 8)) AS band, shingle FROM shx)
      GROUP BY 1, 2),
    cand AS (SELECT * FROM ({{cand_sql}})),
    m AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS INT)
               AS n_match
      FROM cand c
      JOIN sigx sa ON sa.doc_id = c.doc_a
      JOIN sigx sb ON sb.doc_id = c.doc_b AND sb.band = sa.band
      GROUP BY 1, 2),
    sizesx AS (SELECT doc_id, count(*) AS n_sh FROM shx GROUP BY 1),
    ex AS (
      SELECT c.doc_a, c.doc_b,
             CAST(floor(1000000 * count(*) /
                  (any_value(na.n_sh) + any_value(nb.n_sh) - count(*)))
               AS BIGINT) AS exact_e6
      FROM cand c
      JOIN shx a ON a.doc_id = c.doc_a
      JOIN shx b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      JOIN sizesx na ON na.doc_id = c.doc_a
      JOIN sizesx nb ON nb.doc_id = c.doc_b
      GROUP BY 1, 2)
    SELECT m.doc_a, m.doc_b, m.n_match,
           CAST(floor(1000000 * m.n_match / 8) AS BIGINT) AS est_e6,
           CAST(coalesce(ex.exact_e6, 0) AS BIGINT) AS exact_e6,
           CAST(floor(1000000 * m.n_match / 8)
                - coalesce(ex.exact_e6, 0) AS BIGINT) AS err_e6
    FROM m LEFT JOIN ex ON ex.doc_a = m.doc_a AND ex.doc_b = m.doc_b
    """.format(cand_sql=ORACLES["dedup_lsh_pairs"]),
)
def dedup_est_vs_exact(spark, sf_dir):
    """DEDUP-INDEX QUALITY EVALUATION — the MinHash analogue of
    sim_recall_eval: per LSH candidate pair, the signature-estimated
    Jaccard (matching band-mins / 8, the unbiased min-hash estimator)
    against the exact distinct-3-gram Jaccard, with the signed error.
    This is the measured calibration a production dedup runs after
    retuning bands/shingles: a systematic positive err_e6 means the
    band count is too coarse for the corpus' similarity band and the
    verify threshold must compensate. All three scores are exact
    integers (match counts and the repo's floor-1e-6 convention), so
    the evaluation itself is hash-verified cross-engine.

    Shape: candidates from the capped LSH bucket join; the band-match
    count is a candidate-pruned equi-join against the zero-exchange
    per-row signature table (8 rows/doc, minhash_from_grams); the exact
    score is the candidate-pruned Jaccard verify. Cost ~ |candidates|,
    never |docs|^2 — evaluating the index costs no more than using it."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # r6b: gram-ARRAY checkpoint (textops.distinct_gram_docs) — the
    # signature table and the verify sizes are zero-exchange projections
    # of it; the exploded layout is re-derived in the scan stage where
    # the shingle-keyed verify join needs it.
    gd = textops.distinct_gram_docs(docs).localCheckpoint()
    cand = textops.lsh_candidate_pairs(docs, gd=gd).localCheckpoint()
    sig = textops.minhash_from_grams(gd)
    m = (
        cand.join(
            sig.select(F.col("doc_id").alias("doc_a"), "band",
                       F.col("mh").alias("mh_a")),
            "doc_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("doc_b"), "band",
                       F.col("mh").alias("mh_b")),
            ["doc_b", "band"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
            .cast("int")
            .alias("n_match")
        )
    )
    exact = textops.jaccard_verify_pairs(
        docs,
        cand,
        min_j_e6=0,
        sh=gd.select("doc_id", F.explode("grams").alias("shingle")),
        sizes=gd.select("doc_id", F.size("grams").alias("n_sh")),
    ).select("doc_a", "doc_b", F.col("j_e6").alias("exact_e6"))
    est = F.floor(1_000_000 * F.col("n_match") / 8).cast("long")
    return (
        m.join(exact, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a", "doc_b", "n_match",
            est.alias("est_e6"),
            F.coalesce("exact_e6", F.lit(0)).cast("long").alias("exact_e6"),
            (est - F.coalesce("exact_e6", F.lit(0))).cast("long").alias("err_e6"),
        )
    )


@_q(
    "rel_abtest",
    """
    WITH v AS (
      SELECT event_type, user_id % 2 AS variant,
             CASE WHEN floor(value * 100) >= 5000 THEN 1 ELSE 0 END AS s
      FROM events),
    g AS (
      SELECT event_type,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN variant = 0 THEN s ELSE 0 END) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN variant = 1 THEN s ELSE 0 END) AS BIGINT) AS x2
      FROM v GROUP BY 1)
    SELECT event_type, n1, x1, n2, x2,
           CAST(floor(1000000 * ((x1 * n2 - x2 * n1) * (x1 * n2 - x2 * n1)) * (n1 + n2)
                / (n1 * n2 * (x1 + x2) * (n1 + n2 - x1 - x2))) AS BIGINT) AS z2_e6,
           CAST(CASE WHEN ((x1 * n2 - x2 * n1) * (x1 * n2 - x2 * n1)) * (n1 + n2)
                          > 9 * n1 * n2 * (x1 + x2) * (n1 + n2 - x1 - x2)
                     THEN 1 ELSE 0 END AS INT) AS significant
    FROM g
    """,
)
def rel_abtest(spark, sf_dir):
    """TWO-PROPORTION A/B SIGNIFICANCE GATE in exact integer algebra —
    the experiment-analysis staple: per event_type, variant = user_id
    parity, success = value >= 50 (cents trick), and the pooled
    two-proportion z-test restated so the |z| > 3 decision never
    touches a float: z^2 = (x1*n2 - x2*n1)^2 * N / (n1*n2*x*(N-x))
    with x = x1+x2, N = n1+n2 — flag iff LHS_numerator > 9 * LHS_
    denominator. r6: the products run in decimal(38,0) — the r5 bigint
    algebra overflowed its documented 2^63 envelope already at sf0.1
    (~2.5e4 events/key), found by this round's first-ever full-registry
    sweep at sf0.1 and fixed here; decimal(38,0) matches the ~1.7e38
    envelope of the HUGEINT that DuckDB auto-promotes its bigint
    products to, so both engines now agree wherever either computes.
    z2_e6 is the one-double-division floor of the same exact operands,
    with the 1e6 scale folded in BEFORE the double conversion exactly
    as the oracle's left-associative expression does.

    Shape: one scan -> one map-side-combined per-type aggregate
    carrying four conditional sums -> per-row arithmetic on a
    |event_types|-sized frame. Nothing shuffles but the tiny
    aggregate at any scale."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("variant"),
        (F.floor(F.col("value") * 100) >= 5000).cast("int").alias("s"),
    )
    g = v.groupBy("event_type").agg(
        F.sum((F.col("variant") == 0).cast("int")).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("s")).otherwise(0))
        .cast("bigint").alias("x1"),
        F.sum((F.col("variant") == 1).cast("int")).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("variant") == 1, F.col("s")).otherwise(0))
        .cast("bigint").alias("x2"),
    )
    d38 = "decimal(38,0)"
    n1d, x1d = F.col("n1").cast(d38), F.col("x1").cast(d38)
    n2d, x2d = F.col("n2").cast(d38), F.col("x2").cast(d38)
    dev = x1d * n2d - x2d * n1d
    n = n1d + n2d
    x = x1d + x2d
    num = dev * dev * n
    den = n1d * n2d * x * (n - x)
    # oracle shape: ((1e6 * dev^2) * N) exact, THEN one double division
    num_scaled = F.lit(1_000_000).cast(d38) * num
    return g.select(
        "event_type", "n1", "x1", "n2", "x2",
        F.floor(num_scaled.cast("double") / den.cast("double"))
        .cast("long").alias("z2_e6"),
        (num > F.lit(9).cast(d38) * den).cast("int").alias("significant"),
    )


@_q(
    "rel_changepoint",
    """
    WITH v AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS v_cents
      FROM events),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v_cents) AS BIGINT) AS s
      FROM v GROUP BY 1),
    pre AS (
      SELECT v.event_type, v.event_id, n, s,
             CAST(row_number() OVER w AS BIGINT) AS t,
             CAST(sum(v_cents) OVER w AS BIGINT) AS p
      FROM v JOIN tot USING (event_type)
      WINDOW w AS (PARTITION BY v.event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    sel AS (
      SELECT event_type, n, abs(n * p - t * s) AS dev, t, event_id,
             row_number() OVER (PARTITION BY event_type
                   ORDER BY abs(n * p - t * s) DESC, t ASC) AS rk
      FROM pre)
    SELECT event_type, n, CAST(dev AS BIGINT) AS cusum_max,
           CAST(t AS BIGINT) AS cp_t, CAST(event_id AS BIGINT) AS cp_event_id
    FROM sel WHERE rk = 1
    """,
)
def rel_changepoint(spark, sf_dir):
    """CUSUM CHANGEPOINT LOCATOR per key — the drift detector a
    metrics/billing ingest runs to find WHEN a series shifted, where
    rel_anomaly finds single outlier rows. Classic centered CUSUM:
    C_t = sum_{i<=t}(v_i) - t*mean, maximized over t; the argmax is
    the most likely level-shift point. Evaluated in EXACT integer
    algebra scaled by n (the rel_anomaly trick): n*C_t = n*P_t - t*S
    with P_t the prefix sum, S/n the key totals — no float mean, so
    statistic and argmax are hash-exact. Ties -> smallest t. Bigint
    envelope: n*P_t <= n^2 * max_cents, ~1e7 rows/key at 1e4 cents.

    Shape: one scan, one map-side-combined per-key total BROADCAST
    back, one per-key ordered window (prefix sum + row_number — the
    key partitions the shuffle; a key's series must fit one task,
    which is the nature of an ordered statistic; at 100 TB the keys
    are the parallelism), one argmax aggregate via min(struct). The
    oracle restates the argmax as a rank-1 window over the identical
    (dev DESC, t ASC) composite."""
    v = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )
    tot = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_cents").cast("bigint").alias("s"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pre = (
        v.join(F.broadcast(tot), "event_type")
        .withColumn("t", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "p",
            F.sum("v_cents")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
    )
    dev = F.abs(F.col("n") * F.col("p") - F.col("t") * F.col("s"))
    return (
        pre.select(
            "event_type", "n", "event_id", "t", dev.alias("dev")
        )
        .groupBy("event_type")
        .agg(
            F.any_value("n").cast("bigint").alias("n"),
            F.min(
                F.struct(
                    (-F.col("dev")).alias("neg"),
                    F.col("t").alias("t"),
                    F.col("event_id").alias("e"),
                )
            ).alias("_m"),
        )
        .select(
            "event_type", "n",
            F.col("_m.neg").cast("bigint").alias("_neg"),
            F.col("_m.t").cast("bigint").alias("cp_t"),
            F.col("_m.e").cast("bigint").alias("cp_event_id"),
        )
        .select(
            "event_type", "n",
            (-F.col("_neg")).cast("bigint").alias("cusum_max"),
            "cp_t", "cp_event_id",
        )
    )


@_q(
    "sim_label_centroids",
    """
    WITH x AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(floor(1000000 * CAST(unnest(embedding) AS DOUBLE)) AS BIGINT)
               AS e6
      FROM embeddings)
    SELECT label, dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(e6) AS BIGINT) AS sum_e6,
           CAST(floor(sum(e6) / count(*)) AS BIGINT) AS mean_e6
    FROM x GROUP BY 1, 2
    """,
)
def sim_label_centroids(spark, sf_dir):
    """PER-CLASS CENTROID PROFILE of the embedding corpus — the
    cluster-prototype table that seeds IVF coarse quantizers, drives
    dataset-cartography pruning (points far from their class centroid
    are label-noise suspects), and powers nearest-class-mean
    classification. Components are quantized to exact 1e-6 integer
    units BEFORE the sum (float -> double widening is exact, floor of
    the identical double is engine-portable), so the centroid sums
    are order-invariant bigints and the whole profile hash-verifies —
    the same discipline as the LM scorers. mean_e6 floors sum/n once
    per cell. Bigint envelope: |sum_e6| <= 1e6 * max|x| * n — ~1e10
    rows per (label) at unit-norm inputs.

    Shape: one scan -> posexplode (64 rows/vector, the column store
    of the embedding table) -> ONE map-side-combined aggregate keyed
    (label, dim): |labels| * dim result rows, shuffle bounded by the
    same. No joins, no windows; at 100 TB this is a pure partial-agg
    pipeline."""
    x = similarity.quantized_components(
        _t(spark, sf_dir, "embeddings"), ["label"]
    )
    return similarity.label_centroids(x)


@_q("kg_modularity", docs_kg.modularity_sql())
def kg_modularity(spark, sf_dir):
    """COMMUNITY-QUALITY MEASUREMENT — the Newman-Girvan modularity
    decomposition of the kg_communities partition, per community:
    q_c = e_in/m - (d_sum/2m)^2, the share of edges inside the cluster
    minus the share expected under the degree-preserving null model.
    The companion measurement queries sim_recall_eval (ANN) and
    dedup_est_vs_exact (MinHash) get for their index; this one
    hash-verifies the clustering's objective value cross-engine. All
    operands are exact bigints (edge counts, degree sums); the single
    double division floor(1e9 * ((4*m*e_c - d_sum^2) / (4*m^2)))
    mirrors the oracle's op order exactly. Bigint envelope: d_sum^2
    and 4*m*e_c < 2^63, i.e. m < ~1.5e9 undirected edges; past that
    move the two products to decimal(38,0). Negative q_c (a "community"
    sparser than chance) is meaningful and preserved.

    Shape: the LPA labels (fixed-round, O(1)-lineage loop) + TWO
    V/E-keyed equi-joins and two map-side-combined aggregates; m comes
    off a one-row driver action and returns as a literal (the
    text_source_mixture pattern), so the returned plan has no global
    funnel. Cost beyond LPA itself: one pass over E and one over V."""
    from denrl_spark.operators.graph_analytics import (
        label_propagation,
        undirected_edges,
    )

    edges = docs_kg.edges_by_doc(spark, sf_dir)
    com = label_propagation(edges, rounds=4).localCheckpoint()
    u = undirected_edges(edges).localCheckpoint()
    m = u.count()
    ca = com.select(F.col("surface").alias("va"), F.col("community").alias("ca"))
    cb = com.select(F.col("surface").alias("vb"), F.col("community").alias("cb"))
    ein = (
        u.join(ca, "va")
        .join(cb, "vb")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    deg = (
        u.select(F.col("va").alias("v"))
        .unionByName(u.select(F.col("vb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    dsum = (
        com.join(deg, com["surface"] == deg["v"])
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
            F.sum("d").cast("bigint").alias("d_sum"),
        )
    )
    n1 = (
        4 * F.lit(m).cast("bigint") * F.coalesce("e_in", F.lit(0))
        - F.col("d_sum") * F.col("d_sum")
    )
    return (
        dsum.join(ein, "community", "left")
        .select(
            "community", "n_vertices",
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "d_sum",
            F.floor(
                F.lit(1_000_000_000)
                * (n1.cast("double") / F.lit(float(4 * m * m)))
            ).cast("bigint").alias("q_e9"),
        )
    )


@_q(
    "dedup_cluster_sizes",
    f"""
    WITH cl AS (SELECT * FROM ({{cl_sql}})),
    cs AS (
      SELECT rep_doc_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM cl GROUP BY 1)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM cs GROUP BY 1
    """.format(cl_sql=ORACLES["dedup_clusters"]),
)
def dedup_cluster_sizes(spark, sf_dir):
    """NEAR-DUP CLUSTER-SIZE HISTOGRAM — the monitoring artifact every
    production dedup publishes per batch: how many clusters of each
    size the pipeline found (size 1 = unique docs; a sudden mass at
    size >> 1 means a template flood or a broken shingle stage
    upstream). Deduplication rate falls out as 1 - sum(n_clusters)/
    sum(n_docs). Exact integer counts over the hash-verified cluster
    assignment, so the histogram itself is oracle-checked.

    Shape: two map-side-combined aggregates over the (doc_id ->
    rep_doc_id) keep-list — the first keyed by representative (the
    cluster key the assignment is already co-partitioned by), the
    second over the |clusters|-sized frame. Adds nothing to the dedup
    pipeline's own cost at any scale."""
    return (
        textops.near_dup_clusters(_t(spark, sf_dir, "documents"))
        .groupBy("rep_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size", "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint").alias("n_docs"),
        )
    )


@_q("kg_pred_gini", docs_kg.pred_gini_sql())
def kg_pred_gini(spark, sf_dir):
    """Per-predicate OBJECT-CONCENTRATION profile (Gini impurity of
    the observation-weighted object distribution): gini = 1 -
    sum((n_o/n)^2) = (n^2 - sum n_o^2)/n^2. Near 0 means one object
    absorbs almost every observation of the predicate — the signature
    of a boilerplate extraction (every conversation "touches" the same
    entity) that kg_pred_functionality's DISTINCT-count ratio cannot
    see (distinct objects may be many while the mass sits on one).
    Exact bigint counts up to one double division (envelope: n^2 <
    2^63, ~3e9 observations per predicate; past it scale n_obs down
    or move the squares to decimal(38,0)).

    Shape: two map-side-combined aggregates over the edge table —
    (pred, dst) then pred — shuffle bounded by distinct objects then
    |preds|. Nothing else moves at any scale."""
    obj = (
        docs_kg.edges_by_doc(spark, sf_dir)
        .groupBy("pred", "dst_surface")
        .agg(F.sum("n_obs").cast("bigint").alias("n_o"))
    )
    tot = obj.groupBy("pred").agg(
        F.sum("n_o").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_objects"),
        F.sum(F.col("n_o") * F.col("n_o")).cast("bigint").alias("ss"),
    )
    return tot.select(
        "pred",
        F.col("n").alias("n_obs"),
        "n_objects",
        F.floor(
            1_000_000
            * ((F.col("n") * F.col("n") - F.col("ss")).cast("double")
               / (F.col("n") * F.col("n")).cast("double"))
        ).cast("bigint").alias("gini_e6"),
    )


@_q(
    "sim_centroid_outliers",
    """
    WITH x AS (
      SELECT vec_id, label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(floor(1000000 * CAST(unnest(embedding) AS DOUBLE)) AS BIGINT)
               AS e6
      FROM embeddings),
    cent AS (
      SELECT label, dim,
             CAST(floor(sum(e6) / count(*)) AS BIGINT) AS mean_e6
      FROM x GROUP BY 1, 2),
    d2 AS (
      SELECT x.vec_id, x.label,
             CAST(sum((x.e6 - c.mean_e6) * (x.e6 - c.mean_e6)) AS BIGINT) AS d2
      FROM x JOIN cent c ON c.label = x.label AND c.dim = x.dim
      GROUP BY 1, 2),
    rk AS (
      SELECT vec_id, label, d2,
             CAST(row_number() OVER (PARTITION BY label
                   ORDER BY d2 DESC, vec_id ASC) AS INT) AS rank
      FROM d2)
    SELECT label, vec_id, d2, rank FROM rk WHERE rank <= 3
    """,
)
def sim_centroid_outliers(spark, sf_dir):
    """DATASET-CARTOGRAPHY PRUNING — per label, the top-3 vectors by
    squared distance to their class centroid: the label-noise suspects
    an embedding-space curation pass reviews or drops first (points
    far from their own class prototype). Distances are computed over
    the SAME 1e-6-quantized components as sim_label_centroids with the
    floored integer centroid, so d2 is an exact bigint and the ranking
    hash-verifies cross-engine (ties -> min vec_id). Envelope: d2 <=
    dim * (2e6 * max|x|)^2 — exact to |x| ~ 4e2 at dim 64.

    Shape: the exploded component frame feeds the (label, dim)-keyed
    centroid aggregate and the distance join — two columnar scans of
    the embedding table (deliberately NOT checkpointed: materializing
    the 64x-exploded frame would cost more than the second scan of a
    two-column parquet read); the centroid table is |labels| * dim
    rows and BROADCASTS back; one vec-keyed aggregate; one per-LABEL
    window (partitioned top-k, never a global sort)."""
    x = similarity.quantized_components(
        _t(spark, sf_dir, "embeddings"), ["vec_id", "label"]
    )
    cent = similarity.label_centroids(x).select("label", "dim", "mean_e6")
    d2 = (
        x.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("e6") - F.col("mean_e6")) * (F.col("e6") - F.col("mean_e6")))
            .cast("bigint")
            .alias("d2")
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.asc("vec_id"))
    return (
        d2.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("label", "vec_id", "d2", "rank")
    )


@_q(
    "rel_rolling_distinct",
    """
    WITH e AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM e GROUP BY 1),
    sup AS (
      SELECT DISTINCT user_id, day + i AS wday
      FROM e, (SELECT unnest(range(0, 7)) AS i)),
    wau AS (SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau
            FROM sup GROUP BY 1)
    SELECT d.day, d.dau, w.wau,
           CAST(floor(1000000 * d.dau / w.wau) AS BIGINT) AS stickiness_e6
    FROM dau d JOIN wau w USING (day)
    """,
)
def rel_rolling_distinct(spark, sf_dir):
    """ROLLING DISTINCT-USER ENGAGEMENT (DAU / trailing-7-day WAU /
    stickiness) — the engagement dashboard staple, and the canonical
    "distinct over a sliding window" problem. Computed WITHOUT a
    window function or re-scanning 7 days per day: each (user, day)
    activity row SUPPORTS the 7 window-end days [day, day+6], so one
    bounded explode (x7) + DISTINCT + count gives every trailing
    window in one shuffle — the same bucket-explode trick as
    rel_range_join, applied to distinct counting. Exact integers;
    stickiness = floor(1e6 * dau/wau). Days with zero direct activity
    report no row (inner join on observed days — the dashboard
    convention).

    Shape: distinct (user, day) projection -> one 7x bounded fan-out
    -> two map-side-combined aggregates + one |days|-sized equi-join.
    At 100 TB the fan-out rides the already-deduplicated (user, day)
    frame, orders of magnitude smaller than the event log."""
    e = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT) div 86400")
            .alias("day"),
        )
        .distinct()
    )
    dau = e.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    sup = (
        e.select("user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
                 "day")
        .select("user_id", (F.col("day") + F.col("i")).alias("day"))
        .distinct()
    )
    wau = sup.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    return dau.join(wau, "day").select(
        "day", "dau", "wau",
        F.floor(1_000_000 * F.col("dau") / F.col("wau"))
        .cast("bigint").alias("stickiness_e6"),
    )


@_q(
    "text_cooccur_window",
    """
    WITH tok AS (
      SELECT doc_id,
             CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT)
               AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok),
    marg AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_w FROM tok GROUP BY 1),
    right_side AS (
      SELECT doc_id, pos + i AS pos, tok
      FROM tok, (SELECT unnest(range(1, 3)) AS i)),
    pairs AS (
      SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM right_side a JOIN tok b USING (doc_id, pos)
      GROUP BY 1, 2)
    SELECT p.w1, p.w2, p.n_pair,
           CAST(floor(10000 * (CAST(p.n_pair * t AS DOUBLE)
                / CAST(ma.n_w * mb.n_w AS DOUBLE))) AS BIGINT) AS lift_e4
    FROM pairs p
    JOIN marg ma ON ma.tok = p.w1
    JOIN marg mb ON mb.tok = p.w2
    CROSS JOIN tot
    """,
)
def text_cooccur_window(spark, sf_dir):
    """WINDOWED TOKEN CO-OCCURRENCE — the word2vec/GloVe preprocessing
    matrix: counts of unordered token pairs within a +-2 word window,
    plus the PMI lift n_pair * T / (n_w1 * n_w2) in the repo's
    log-free rational form, floor-scaled to 1e-4 (one double division
    of exact bigint products — kg_edge_pmi's trick at the token
    grain). High-lift pairs are collocations; the matrix is the input
    to count-based embeddings and phrase mining.

    Shape: the non-equi "within distance 2" predicate becomes a pure
    EQUI-join by exploding each position to the <=2 positions it can
    pair with to its right (bounded fan-out, each unordered pair
    formed exactly once — the rel_range_join bucket trick at token
    grain); one pair-keyed map-side-combined count; two
    vocab-sized marginal joins (broadcast at scale). The corpus total
    comes off the |vocab|-row marginal frame on the driver and
    returns as a literal. Output rows are bounded by distinct
    co-occurring pairs, not corpus size."""
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
    )
    # the vocab-sized marginal frame is localCheckpointed: it feeds the
    # two marginal joins AND the totals action, which would otherwise
    # re-evaluate the corpus explode once each. The token frame itself
    # is deliberately NOT checkpointed (materializing the exploded
    # corpus costs more than the second columnar scan the pair join
    # pays — the sim_centroid_outliers trade).
    marg = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_w"))
        .localCheckpoint()
    )
    t_total = int(
        marg.agg(F.sum("n_w").alias("t")).collect()[0]["t"]
    )
    right = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(2))).alias("i"),
        "pos", "tok",
    ).select("doc_id", (F.col("pos") + F.col("i")).alias("pos"),
             F.col("tok").alias("tok_a"))
    pairs = (
        right.join(tok.withColumnRenamed("tok", "tok_b"), ["doc_id", "pos"])
        .select(
            F.least("tok_a", "tok_b").alias("w1"),
            F.greatest("tok_a", "tok_b").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    ma = marg.select(F.col("tok").alias("w1"), F.col("n_w").alias("n_w1"))
    mb = marg.select(F.col("tok").alias("w2"), F.col("n_w").alias("n_w2"))
    return (
        pairs.join(F.broadcast(ma), "w1")
        .join(F.broadcast(mb), "w2")
        .select(
            "w1", "w2", "n_pair",
            F.floor(
                10_000
                * ((F.col("n_pair") * F.lit(t_total)).cast("double")
                   / (F.col("n_w1") * F.col("n_w2")).cast("double"))
            ).cast("bigint").alias("lift_e4"),
        )
    )


@_q(
    "sim_knn_probe",
    """
    WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 32),
    c AS (SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    scored AS (
      SELECT query_id, true_label, neighbor_id, label,
             CAST(floor(1000 * list_dot_product(qv, cv) /
                  (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))))
               AS BIGINT) AS cos_e3
      FROM q, c WHERE query_id <> neighbor_id),
    topk AS (
      SELECT * FROM (
        SELECT query_id, true_label, label,
               row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_e3 DESC, neighbor_id ASC) AS rnk
        FROM scored) WHERE rnk <= 3),
    votes AS (
      SELECT query_id, true_label, label, count(*) AS v
      FROM topk GROUP BY 1, 2, 3),
    pred AS (
      SELECT query_id, true_label, label AS pred_label FROM (
        SELECT query_id, true_label, label,
               row_number() OVER (PARTITION BY query_id
                     ORDER BY v DESC, label ASC) AS rn
        FROM votes) WHERE rn = 1)
    SELECT true_label AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           CAST(floor(1000000 * sum(CASE WHEN pred_label = true_label
                                         THEN 1 ELSE 0 END) / count(*))
             AS BIGINT) AS acc_e6
    FROM pred GROUP BY 1
    """,
)
def sim_knn_probe(spark, sf_dir):
    """EMBEDDING-QUALITY kNN PROBE — the standard label-recovery eval
    for an embedding table: predict each probe vector's label by
    majority vote of its 3 exact-cosine neighbors (self excluded,
    vote ties -> min label, rank ties -> min neighbor_id) and report
    per-label accuracy in exact integer ppm. Falling probe accuracy
    after a re-embed is the canary that the vector space (or its
    int8/PQ compression upstream) regressed — the supervised
    counterpart of sim_recall_eval's unsupervised recall.

    Shape: the exact top-k subplan on a bounded probe sample (the
    production pattern: you probe a sample, not the corpus), one
    (query, label) vote aggregate, two per-QUERY windows over
    k-bounded rows, one |labels|-sized aggregate. Nothing beyond the
    probe's own index cost at any scale."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 32").select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    nbrs = cosine_topk(emb, emb.where("vec_id < 32"), k=3).join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    )
    votes = nbrs.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("query_id", F.col("label").alias("pred_label"))
        .join(q, "query_id")
    )
    return (
        pred.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum((F.col("pred_label") == F.col("true_label")).cast("int"))
            .cast("bigint").alias("n_correct"),
        )
        .select(
            "label", "n_queries", "n_correct",
            F.floor(1_000_000 * F.col("n_correct") / F.col("n_queries"))
            .cast("bigint").alias("acc_e6"),
        )
    )


@_q(
    "dedup_rate_by_source",
    f"""
    WITH cl AS (SELECT * FROM ({{cl_sql}})),
    j AS (
      SELECT d.source, cl.is_rep
      FROM documents d JOIN cl ON cl.doc_id = d.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_rep) AS BIGINT) AS n_kept,
           CAST(floor(1000000 * (count(*) - sum(is_rep)) / count(*))
             AS BIGINT) AS dup_rate_e6
    FROM j GROUP BY 1
    """.format(cl_sql=ORACLES["dedup_clusters"]),
)
def dedup_rate_by_source(spark, sf_dir):
    """PER-SOURCE DEDUPLICATION RATE — the ingest-quality attribution
    monitor: which source floods near-duplicates (its docs lose the
    keep-list election) vs which contributes unique material. The
    actionable drill-down of dedup_cluster_sizes: a spike here gates a
    single feed, not the whole batch. Exact integer counts over the
    hash-verified cluster assignment; rate = floor(1e6 * dropped/n).

    Shape: the keep-list joined back to the doc table on its key (at
    scale both sides are co-partitioned by doc_id) + one
    |sources|-sized map-side-combined aggregate."""
    cl = textops.near_dup_clusters(_t(spark, sf_dir, "documents"))
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        cl.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("is_rep").cast("int")).cast("bigint").alias("n_kept"),
        )
        .select(
            "source", "n_docs", "n_kept",
            F.floor(
                1_000_000 * (F.col("n_docs") - F.col("n_kept")) / F.col("n_docs")
            ).cast("bigint").alias("dup_rate_e6"),
        )
    )


@_q(
    "dedup_shingle_df_profile",
    f"""
    WITH sh AS (SELECT DISTINCT * FROM ({_SHINGLE_SQL})),
    df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
    SELECT CAST(length(bin(df)) - 1 AS INT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(max(df) AS BIGINT) AS max_df
    FROM df GROUP BY 1
    """,
)
def dedup_shingle_df_profile(spark, sf_dir):
    """SHINGLE DOCUMENT-FREQUENCY PROFILE — the boilerplate monitor
    that CALIBRATES the dedup family's knobs: the df <= 16 rare-
    shingle cut of dedup_containment and the LSH bucket cap both
    assume a long-tailed df distribution, and a mass migration into
    high-df buckets (log2-bucketed, exact via binary-representation
    length — the text_length_histogram trick) is the early warning
    that a template flood is about to degenerate the bucket join.
    n_postings per bucket = inverted-index cost attribution; max_df =
    the hottest shingle.

    Shape: the distinct (doc, shingle) projection (shared shape with
    every dedup stage) -> one shingle-keyed map-side-combined count ->
    one |distinct df values|-bounded aggregate. Nothing else moves."""
    sh = textops.shingles(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).distinct()
    df = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    return (
        df.withColumn("log2_bucket", (F.length(F.bin("df")) - 1).cast("int"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum("df").cast("bigint").alias("n_postings"),
            F.max("df").cast("bigint").alias("max_df"),
        )
    )


@_q(
    "sim_norm_profile",
    """
    WITH x AS (
      SELECT vec_id,
             CAST(floor(1000000 * CAST(unnest(embedding) AS DOUBLE)) AS BIGINT)
               AS e6
      FROM embeddings),
    n2 AS (
      SELECT vec_id, CAST(sum(e6 * e6) AS BIGINT) AS norm2
      FROM x GROUP BY 1)
    SELECT CAST(CASE WHEN norm2 = 0 THEN -1
                     ELSE length(bin(norm2)) - 1 END AS INT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(norm2) AS BIGINT) AS min_norm2,
           CAST(max(norm2) AS BIGINT) AS max_norm2
    FROM n2 GROUP BY 1
    """,
)
def sim_norm_profile(spark, sf_dir):
    """EMBEDDING NORM-HEALTH PROFILE — the first check after every
    re-embed: a collapsed-norm mode (bucket pile-up far below the
    corpus mode, or the norm2 = 0 bucket -1 appearing at all) means
    the encoder run produced degenerate vectors BEFORE any index is
    built on them. norm2 is summed over the same 1e-6-quantized
    components as the centroid family (exact bigint, order-invariant),
    log2-bucketed exactly via binary-representation length; min/max
    per bucket bound the distribution tails.

    Shape: one scan -> posexplode -> one vec-keyed map-side-combined
    aggregate -> one |buckets|-bounded aggregate. Pure partial-agg
    pipeline, no joins."""
    x = similarity.quantized_components(
        _t(spark, sf_dir, "embeddings"), ["vec_id"]
    )
    n2 = x.groupBy("vec_id").agg(
        F.sum(F.col("e6") * F.col("e6")).cast("bigint").alias("norm2")
    )
    return (
        n2.withColumn(
            "log2_bucket",
            F.when(F.col("norm2") == 0, F.lit(-1))
            .otherwise(F.length(F.bin("norm2")) - 1)
            .cast("int"),
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("norm2").cast("bigint").alias("min_norm2"),
            F.max("norm2").cast("bigint").alias("max_norm2"),
        )
    )


@_q(
    "rel_benford",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS v_cents
      FROM events
      WHERE floor(value * 100) >= 1),
    d AS (
      SELECT event_type,
             CAST(substr(CAST(v_cents AS VARCHAR), 1, 1) AS INT) AS digit
      FROM v),
    c AS (
      SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1)
    SELECT c.event_type, c.digit, c.n,
           CAST(floor(1000000 * c.n / tot.t) AS BIGINT) AS share_e6
    FROM c JOIN tot USING (event_type)
    """,
)
def rel_benford(spark, sf_dir):
    """FIRST-DIGIT (Benford) PROFILE per event key — the classic
    fabricated-or-truncated-data screen for metrics/billing feeds: a
    genuine multiplicative value stream has a monotonically falling
    leading-digit distribution, while clamped, defaulted, or
    synthesized values pile onto one digit. This query emits the
    observed profile in exact integers (digit of the cents-quantized
    value, share floored to 1e-6); the Benford expectation
    log10(1+1/d) is transcendental, so judging drift against it stays
    a consumer-side comparison — the hash-verified artifact is the
    observed distribution itself.

    Shape: one scan -> one (key, digit)-keyed map-side-combined count
    (<= 9 rows per key) -> one |keys|-sized total join. Nothing else
    moves at any scale."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_cents"),
    ).where(F.col("v_cents") >= 1)
    c = v.select(
        "event_type",
        F.substring(F.col("v_cents").cast("string"), 1, 1).cast("int")
        .alias("digit"),
    ).groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("t"))
    return c.join(F.broadcast(tot), "event_type").select(
        "event_type", "digit", "n",
        F.floor(1_000_000 * F.col("n") / F.col("t")).cast("bigint")
        .alias("share_e6"),
    )


@_q(
    "rel_conversion_latency",
    """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events WHERE event_type IN ('view', 'click')),
    v AS (SELECT user_id, min(t) AS tv FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(e.t) AS tc
      FROM e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.t > v.tv
      GROUP BY 1),
    lat AS (
      SELECT c.user_id, c.tc - v.tv AS latency_s
      FROM c JOIN v ON v.user_id = c.user_id),
    rk AS (
      SELECT latency_s,
             row_number() OVER (ORDER BY latency_s, user_id) AS rn,
             count(*) OVER () AS n
      FROM lat)
    SELECT CAST(q AS INT) AS quantile_pct,
           CAST(min(latency_s) AS BIGINT) AS latency_s
    FROM rk, (SELECT unnest([50, 90, 99]) AS q)
    WHERE rn >= (q * n + 99) // 100
    GROUP BY 1
    """,
)
def rel_conversion_latency(spark, sf_dir):
    """CONVERSION-LATENCY QUANTILES — the funnel's companion metric:
    per converting user the exact integer seconds from first view to
    first strictly-later click, then the exact p50/p90/p99 by the
    integer rank rule rn = ceil(q*n/100) (the smallest latency whose
    rank reaches the quantile — no interpolation, hash-exact; ties
    broken by user_id make the rank deterministic even on equal
    latencies). The product-analytics number a funnel dashboard pairs
    with its stage counts.

    Shape: two conditional min-aggregates chained through a shrinking
    user-keyed equi-join (the rel_funnel shape — no per-user windows),
    then the DISTRIBUTED range-partitioned ranker over the
    |converting users| frame (functions/ranking.py — no Exchange
    SinglePartition; the hygiene gate rejected the naive global
    window formulation of this query). The ranked frame is one row
    per converting user, orders of magnitude below the event log; for
    a 100 TB log whose per-user frame is still huge, substitute the
    rel_quantile_sketch histogram — this operator is the
    exact-percentile member of that family, and the oracle restates
    the identical rank rule."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    ).where(F.col("event_type").isin("view", "click"))
    v = (
        e.where("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("t").alias("tv"))
    )
    c = (
        e.where("event_type = 'click'")
        .join(v, "user_id")
        .where(F.col("t") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("t").alias("tc"))
    )
    lat = c.join(v, "user_id").select(
        "user_id", (F.col("tc") - F.col("tv")).alias("latency_s")
    )
    # global exact rank WITHOUT an Exchange SinglePartition: the
    # distributed range-partitioned ranker (functions/ranking.py, the
    # build_vocab machinery); n comes off the ranked frame's count
    # action and returns as a literal (text_source_mixture pattern)
    from denrl_spark.functions.ranking import with_global_row_number

    rk = with_global_row_number(
        lat, [F.asc("latency_s"), F.asc("user_id")], out_col="rn0"
    ).withColumn("rn", F.col("rn0") + 1)
    n = rk.count()
    q = spark.createDataFrame([(50,), (90,), (99,)], "q int")
    return (
        rk.crossJoin(F.broadcast(q))
        .where(F.col("rn") >= F.floor((F.col("q") * F.lit(n) + 99) / 100))
        .groupBy(F.col("q").cast("int").alias("quantile_pct"))
        .agg(F.min("latency_s").cast("bigint").alias("latency_s"))
    )


_RECALL_EVAL_SQL = """
    WITH exact_t AS (SELECT * FROM ({exact_sql})),
    ann AS (SELECT * FROM ({ann_sql})),
    j AS (
      SELECT e.query_id,
             CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM exact_t e
      LEFT JOIN ann a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           CAST((1000000 * sum(hit)) // count(*) AS BIGINT) AS recall_ppm
    FROM j GROUP BY 1
"""


def _recall_eval(spark, sf_dir, ann: DataFrame) -> DataFrame:
    """Shared recall@k evaluator: exact cosine top-k LEFT-joined to an
    index's top-k on (query_id, neighbor_id), per-query recall in
    exact integer ppm (the sim_recall_eval shape, factored so every
    registered index evaluates through the identical comparison)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 8")
    exact = cosine_topk(emb, q, k=3).select("query_id", "neighbor_id")
    a = ann.select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    return (
        exact.join(a, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        )
        .select(
            "query_id", "k_exact", "n_hit",
            F.floor((1_000_000 * F.col("n_hit")) / F.col("k_exact"))
            .cast("long").alias("recall_ppm"),
        )
    )


@_q(
    "sim_ivf_recall",
    _RECALL_EVAL_SQL.format(
        exact_sql=ORACLES["sim_cosine_topk"], ann_sql=ORACLES["sim_ivf_topk"]
    ),
)
def sim_ivf_recall(spark, sf_dir):
    """IVF INDEX QUALITY EVALUATION — per-query recall@3 of the
    inverted-list index (sim_ivf_topk) against exact brute force, in
    exact integer ppm: the registered, hash-verified counterpart of
    the measured-recall assertions in tests/test_similarity.py, so an
    IVF rebuild's quality regression shows up in the driver contract
    itself. Completes the one-eval-per-index rule: LSH has
    sim_recall_eval, PQ has sim_pq_recall, kNN labels have
    sim_knn_probe. Shape: two index subplans + one k-bounded equi-join
    + one query-keyed aggregate — eval costs no more than the probes."""
    emb = _t(spark, sf_dir, "embeddings")
    return _recall_eval(
        spark, sf_dir, similarity.ivf_topk(emb, emb.where("vec_id < 8"), k=3)
    )


@_q(
    "sim_pq_recall",
    _RECALL_EVAL_SQL.format(
        exact_sql=ORACLES["sim_cosine_topk"], ann_sql=ORACLES["sim_pq_adc"]
    ),
)
def sim_pq_recall(spark, sf_dir):
    """PQ-ADC INDEX QUALITY EVALUATION — per-query recall@3 of the
    product-quantized asymmetric-distance search (sim_pq_adc) against
    exact brute force, exact integer ppm. The compression-loss
    monitor: falling PQ recall after a codebook rebuild means the
    subspace quantizers stopped covering the corpus. Same shared
    evaluator shape as sim_ivf_recall / sim_recall_eval."""
    return _recall_eval(
        spark, sf_dir, similarity.pq_adc_topk(_t(spark, sf_dir, "embeddings"))
    )


@_q("kg_transitive_edges", docs_kg.transitive_edges_sql())
def kg_transitive_edges(spark, sf_dir):
    """SAME-PREDICATE CLOSURE CANDIDATES — every (A, p, C) implied by
    a 2-hop chain A-p->B-p->C, with the exact number of implying
    paths and whether the shortcut edge is PRESENT. The two halves
    are the two classic consumers: present=1 rows are transitive
    REDUNDANCY a KG compaction can drop (keeping n_paths as
    provenance); present=0 rows are the INFERRED-edge candidates a
    completion pass materializes for transitive predicates — and for
    non-transitive predicates a high closure rate flags hub-induced
    spurious extraction. Distinct edge grain so n_obs weighting never
    inflates path counts.

    Shape: the kg_two_hop middle-vertex equi-join restricted to a
    shared predicate key ((pred, mid) composite — tighter than
    two_hop's join, AQE splits hot middles), one map-side-combined
    path count, one LEFT equi-join against the direct edge set. No
    nested loops; output bounded by same-predicate 2-hop pairs."""
    de = (
        docs_kg.edges_by_doc(spark, sf_dir)
        .select(
            F.col("src_surface").alias("s"), "pred",
            F.col("dst_surface").alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint()
    )
    b = de.select(
        F.col("s").alias("mid"), F.col("pred").alias("pred"),
        F.col("d").alias("d2"),
    )
    paths = (
        de.join(b, (de["d"] == b["mid"]) & (de["pred"] == b["pred"]))
        .where(de["s"] != b["d2"])
        .groupBy(de["s"].alias("s"), de["pred"].alias("pred"),
                 b["d2"].alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    direct = de.withColumn("present", F.lit(1))
    return paths.join(direct, ["s", "pred", "d"], "left").select(
        F.col("s").alias("src_surface"), "pred",
        F.col("d").alias("dst_surface"), "n_paths",
        F.coalesce("present", F.lit(0)).cast("int").alias("present"),
    )


def _distinct_edges(spark, sf_dir):
    """Distinct directed (s, pred, d) edge set, self-loops dropped —
    the shared operand of the path-shaped KG queries."""
    return (
        docs_kg.edges_by_doc(spark, sf_dir)
        .select(
            F.col("src_surface").alias("s"), "pred",
            F.col("dst_surface").alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint()
    )


@_q("kg_metapaths", docs_kg.metapaths_sql())
def kg_metapaths(spark, sf_dir):
    """METAPATH PROFILE — the distribution of predicate SEQUENCES over
    2-hop paths (metapath2vec / HIN-mining lineage): which relation
    compositions actually occur, with path and distinct-endpoint-pair
    counts. The schema-level signal for which composite relations are
    worth materializing (a dominant (p1, p2) metapath with high
    n_pairs is a candidate derived edge type) and the input to
    metapath-guided random walks. Exact integer counts at distinct
    edge grain.

    Shape: the middle-vertex equi-join (kg_two_hop's shape, AQE skew
    split on hubs) -> ONE map-side-combined aggregate keyed by the
    |preds|^2-bounded predicate pair. Output is schema-sized, not
    graph-sized."""
    de = _distinct_edges(spark, sf_dir)
    b = de.select(
        F.col("s").alias("mid"), F.col("pred").alias("pred_b"),
        F.col("d").alias("d2"),
    )
    return (
        de.join(b, de["d"] == b["mid"])
        .where(de["s"] != b["d2"])
        .groupBy(de["pred"].alias("pred_a"), b["pred_b"].alias("pred_b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paths"),
            F.countDistinct(
                F.concat(de["s"], F.lit(">"), b["d2"])
            ).cast("bigint").alias("n_pairs"),
        )
    )


@_q("kg_edge_explanations", docs_kg.edge_explanations_sql())
def kg_edge_explanations(spark, sf_dir):
    """EDGE EXPLANATIONS — for every present direct edge, the
    alternate 2-hop routes between its endpoints (mid vertex +
    predicate sequence): the provenance answer a KG-serving API gives
    to "why/how else are X and Z related?", and the redundancy signal
    graded per edge (an edge with many alternate routes survives
    source-document deletion; one with none is single-sourced).
    Cross-predicate closure at explanation grain — kg_triangles /
    kg_motifs count these shapes, this query NAMES them.

    Shape: one (src-keyed) equi-join of the edge set to itself + one
    closing equi-join on (mid, dst) — the compact two-join closure,
    no nested loop; output bounded by closed wedges."""
    de = _distinct_edges(spark, sf_dir)
    a = de.select(
        F.col("s").alias("sa"), F.col("pred").alias("pred_a"),
        F.col("d").alias("mid"),
    )
    b = de.select(
        F.col("s").alias("sb"), F.col("pred").alias("pred_b"),
        F.col("d").alias("db"),
    )
    return (
        de.join(a, de["s"] == a["sa"])
        .join(b, (a["mid"] == b["sb"]) & (de["d"] == b["db"]))
        .where((a["mid"] != de["s"]) & (a["mid"] != de["d"]))
        .select(
            de["s"].alias("src_surface"), de["pred"].alias("pred"),
            de["d"].alias("dst_surface"),
            a["mid"].alias("mid"), "pred_a", "pred_b",
        )
    )
