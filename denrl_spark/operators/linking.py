"""Entity linking & canonicalization (north-star component; no reference
counterpart — surface-form clustering is implicit in the reference's
exact-string triple matching, run_jointmodel.py:975,981).

Pipeline: normalize mention surfaces -> build similarity edges
(normalized-form equality by default, plus caller-supplied alias edges)
-> iterative connected components over DataFrames (GraphFrames-style
label propagation: each node adopts the min component id among itself
and its neighbors until fixpoint) -> canonical node id = min member id.

Scale notes:
- node/component state is hash-partitioned on ``node_id`` each round so
  the self-join co-locates; AQE skew-join splitting handles hot mentions
  (celebrity entities), and ``salt_buckets`` pre-salts the mention->
  normalized-form grouping, the classic power-law hotspot.
- iterations are bounded (components of similarity graphs are shallow;
  min-label propagation converges in O(diameter) rounds) and each round
  is checkpoint-friendly (localCheckpoint truncates the lineage so plans
  don't grow exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from denrl_spark.operators.tagging import stable_id  # reuse content-hash ids


def normalize_surface(col: F.Column) -> F.Column:
    """Lower-case, strip punctuation, collapse whitespace — JVM-side."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")  # punctuation -> space
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def extract_mentions(triples: DataFrame) -> DataFrame:
    """Triples -> distinct mention table (surface, norm, mention_id).

    Single scan: explode([ent1, ent2]) instead of a two-branch union —
    the union shape reads the triple table twice (two scans of a
    100 TB-scale input; two passes over the cache at bench scale). The
    distinct's partial aggregation still collapses hot surfaces
    map-side before the shuffle."""
    surfaces = (
        triples.select(
            F.explode(F.array(F.col("ent1"), F.col("ent2"))).alias("surface")
        )
        .where(F.col("surface") != "")
        .distinct()
    )
    return surfaces.withColumn("norm", normalize_surface(F.col("surface"))).withColumn(
        "mention_id", F.xxhash64("surface")
    )


def mention_edges(mentions: DataFrame, salt_buckets: int = 8) -> DataFrame:
    """Similarity edges: mentions sharing a normalized form. The
    norm-grouping is salted: group (norm, salt) first (map-side combine
    shrinks hot norms), then link every member to the per-norm min id —
    a star, which is enough for connectivity."""
    salted = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("mention_id"), F.lit(salt_buckets))
    )
    local_min = salted.groupBy("norm", "salt").agg(F.min("mention_id").alias("local_min"))
    anchor = local_min.groupBy("norm").agg(F.min("local_min").alias("anchor"))
    return (
        mentions.join(anchor, "norm")
        .where(F.col("mention_id") != F.col("anchor"))
        .select(F.col("mention_id").alias("src"), F.col("anchor").alias("dst"))
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 12, strict: bool = True
) -> DataFrame:
    """(node_id) x (src, dst) -> (node_id, component) via min-label
    propagation. Deterministic; component = min node_id in component.

    Converges in O(diameter) rounds — surface-form graphs are stars
    (diameter <= 2 via the per-norm anchor in mention_edges), so
    ``max_iter`` is generous headroom for alias-edge chains. If the
    fixpoint is NOT reached within max_iter, ``strict`` raises rather
    than silently returning partially-merged components."""
    spark = nodes.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    labels = nodes.select(
        F.col("node_id"), F.col("node_id").alias("component")
    ).repartition(n_part, "node_id")
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    changed = -1
    for _ in range(max_iter):
        msgs = (
            und.join(labels, und.src == labels.node_id)
            .select(F.col("dst").alias("node_id"), "component")
        )
        new_labels = (
            labels.select("node_id", "component")
            .unionByName(msgs)
            .groupBy("node_id")
            .agg(F.min("component").alias("component"))
            .repartition(n_part, "node_id")
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if strict and changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing) — raise max_iter"
        )
    return labels


def canonicalize_surfaces(mentions: DataFrame) -> DataFrame:
    """Surface-level canonical map (the no-alias-edges star path):
    canonical surface = min(surface) over the normalized-form group.

    Window formulation: one shuffle over the distinct-mention table, no
    self-join and NO internal cache (the previous groupBy+join shape
    cached the mention table and leaked the InMemoryRelation to the
    caller, ADVICE r2). Norm groups are surface-form variants (casing /
    punctuation), bounded fan-in, so the window partition cannot be a
    power-law hotspot the way raw mention counts can. Input: any frame
    with a ``surface`` column (``norm`` derived if absent) — callers
    include batch canonicalize() and the streaming graph-delta
    compaction view (streaming/ingest.py:graph_edges_view)."""
    from pyspark.sql import Window

    if "norm" not in mentions.columns:
        mentions = mentions.withColumn("norm", normalize_surface(F.col("surface")))
    w = Window.partitionBy("norm")
    return (
        mentions.withColumn("canonical_surface", F.min("surface").over(w))
        .withColumn("canonical_id", F.xxhash64("canonical_surface"))
        .select("surface", "norm", "canonical_id", "canonical_surface")
    )


def canonicalize(
    triples: DataFrame,
    salt_buckets: int = 8,
    alias_edges: DataFrame | None = None,
) -> DataFrame:
    """Mentions -> (surface, norm, canonical_id, canonical_surface).

    Without ``alias_edges`` the similarity graph is, BY CONSTRUCTION,
    a disjoint union of per-norm stars (mention_edges links members to
    the per-norm anchor), so its connected components are exactly the
    norm groups — the iterative min-label propagation is a no-op and is
    skipped: canonical surface = min(surface) per norm, ONE map-side-
    combined aggregation + one join instead of 2+ CC rounds each with a
    localCheckpoint barrier and a convergence count. With caller-
    supplied alias edges (cross-norm links) the general fixpoint runs;
    that path caches the mention table internally (it feeds the CC
    node-set, the edge build, and the final label join) and the cache
    lives as long as the returned frame — callers running many
    alias-edge canonicalizations per session own cleanup. The default
    path is cache-free.
    """
    mentions = extract_mentions(triples)
    if alias_edges is None:
        return canonicalize_surfaces(mentions)

    mentions = mentions.cache()
    edges = mention_edges(mentions, salt_buckets=salt_buckets).unionByName(
        alias_edges.select("src", "dst")
    )
    comp = connected_components(
        mentions.select(F.col("mention_id").alias("node_id")), edges
    )
    labeled = mentions.join(
        comp, mentions.mention_id == comp.node_id
    ).select("surface", "norm", "mention_id", "component")
    canon_surface = (
        labeled.groupBy("component")
        .agg(F.min("surface").alias("canonical_surface"))
    )
    return (
        labeled.join(canon_surface, "component")
        .withColumn("canonical_id", F.xxhash64("canonical_surface"))
        .select("surface", "norm", "canonical_id", "canonical_surface")
    )
