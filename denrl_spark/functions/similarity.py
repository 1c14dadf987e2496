"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot/norms are computed with ``zip_with`` + ``aggregate`` higher-order
  functions on DOUBLE-cast arrays: strictly sequential, JVM-side, so the
  value is bit-reproducible and matches a sequential-loop oracle.
- ``lsh_topk``: the scale path — random-hyperplane (SimHash-style) LSH
  buckets shrink the candidate set before exact re-scoring, turning the
  O(N*Q) cross product into per-bucket joins. Hyperplanes are derived
  deterministically from a seed (no RNG state), so results are stable
  across partitionings and cluster sizes.

At 100 TB the brute-force variant exists only as the re-scorer inside
each LSH bucket; the bucket join is the shuffle boundary and is keyed by
(plane-bucket), which AQE can split on skew.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, cos_e3): exact top-k by cosine.
    Ties and float wobble are controlled by ranking on the 1e-3-floored
    score with neighbor id as tie-break."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(1000 * _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
            .cast("long")
            .alias("cos_e3"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e3"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_e3")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (no RNG state:
    values from a sine scramble of (seed, plane, coord))."""
    return [
        [
            math.sin(seed * 1.7 + p * 12.9898 + d * 78.233) * 2 -
            math.floor(math.sin(seed * 1.7 + p * 12.9898 + d * 78.233) * 2)
            - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _bucket_col(vec, planes: list[list[float]]):
    """Sign-bucket id of ``vec`` against the hyperplane family (JVM-side:
    one zip_with/aggregate dot per plane, bits packed little-endian)."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(x) for x in pl])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for pl in planes
    ]
    out = F.lit(0)
    for i, b in enumerate(bits):
        out = out + b * (2 ** i)
    return out


def _probe_col(n_planes: int, probe_bits: int):
    """Multi-probe bucket list: the bucket itself plus every bucket at
    Hamming distance <= probe_bits (bit flips). probe_bits=1 turns the
    classic LSH recall cliff (a near pair split by ONE plane is lost)
    into an n_planes+1-probe lookup — the standard recall/cost dial."""
    probes = [F.col("bucket")]
    if probe_bits >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    if probe_bits >= 2:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit((1 << p) | (1 << q)))
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    return F.explode(F.array(*probes)).alias("probe")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_bits: int = 2,
) -> DataFrame:
    """Approximate top-k: sign-bucket on random hyperplanes, candidate
    join within bucket (query side multi-probes Hamming-<=probe_bits
    neighbors), exact cosine re-score. Same schema as cosine_topk
    (ranks within retrieved candidates). Measured recall@3 vs the exact
    baseline is asserted in tests/test_similarity.py."""
    planes = _hyperplanes(dim, n_planes, seed)

    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("bucket", _bucket_col(F.col("qv"), planes))
        .select("query_id", "qv", _probe_col(n_planes, probe_bits))
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", _bucket_col(F.col("cv"), planes))
    scored = (
        q.join(c, q.probe == c.bucket)
        .where(F.col("query_id") != F.col("neighbor_id"))
        # a candidate can be reached through several probes: dedup before
        # the (expensive) exact re-score
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.floor(
                1000
                * _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            )
            .cast("long")
            .alias("cos_e3"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e3"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_e3")
    )


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    min_cos_e3: int = 300,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_bits: int = 2,
) -> DataFrame:
    """(vec_a, vec_b, cos_e3): embedding near-duplicate pairs with
    cos >= min_cos_e3/1000, WITHOUT the all-pairs cross join.

    Shape (the 100 TB path): sign-bucket every vector once; the probe
    side expands to Hamming-<=probe_bits buckets; candidate pairs come
    from the (probe = bucket) equi-join; ids are deduped BEFORE vectors
    are re-joined for the exact cosine re-score, so each surviving pair
    is scored exactly once and the wide array columns never ride the
    candidate shuffle. Approximate by construction: pairs whose buckets
    differ in more than probe_bits planes are not considered (recall is
    measured against the brute-force oracle in tests/test_similarity.py).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    sig = e.withColumn("bucket", _bucket_col(F.col("v"), planes))
    probes = sig.select("vec_id", _probe_col(n_planes, probe_bits))
    cand = (
        probes.alias("a")
        .join(sig.alias("b"), F.col("a.probe") == F.col("b.bucket"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    scored = (
        cand.join(e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")), "vec_a")
        .join(e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.floor(
                1000
                * _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb")))
            )
            .cast("long")
            .alias("cos_e3"),
        )
    )
    return scored.where(F.col("cos_e3") >= min_cos_e3)


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving
    compression a 100 TB embedding table runs before indexing (4x
    smaller than float32, 8x than float64): scale = max|v| / 127,
    q_i = round(v_i/scale) in [-127, 127]. Returns
    (vec_id, scale_e9, qvec array<int>); zero vectors quantize to all
    zeros with scale 0. JVM-side array HOFs only. Dequantized cosine
    error is bounded by ~1/127 per axis (round-trip asserted in
    tests)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    q = F.when(amax == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(127 * x / amax).cast("int"))
    )
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.floor(1_000_000_000 * amax / 127).cast("long").alias("scale_e9"),
        q.alias("qvec"),
    )


def pq_codes(
    embeddings: DataFrame,
    n_sub: int = 8,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization encode (Jégou et al. 2011) — the
    compression stage of an IVF-PQ index, the standard way a 100 TB
    embedding table actually ships to serving: the vector splits into
    ``n_sub`` subspaces and each sub-vector stores only the id of its
    nearest sub-codebook centroid (64 dims x float32 -> n_sub bytes,
    32x smaller than quantize_int8's output). Returns one row per
    (vec_id, sub) with the assigned ``code`` and the subspace
    quantization error ``dist_e6`` (floor(1e6 * squared L2)).

    Codebooks are the HASH-ORDERED CORPUS SAMPLE (sub-vectors of the
    same md5-ordered sample ivf_topk uses for centroids) rather than
    Lloyd-trained — the deterministic zero-training pick that makes
    the operator cross-engine hash-oracle-able; kmeans_centroids shows
    the refinement loop and drops in per-subspace the same way. ADC
    search (query-to-codebook lookup tables + code-indexed sums) is
    the natural consumer and reuses these rows as-is.

    Shape: the codebook is n_sub x n_codes x (dim/n_sub) literals
    broadcast as a tiny frame; assignment is explode(n_sub) + an
    equi-join on ``sub`` + a map-side-combined min(struct(dist, code))
    groupBy — n_sub * n_codes arithmetic rows per vector, no window,
    no shuffle beyond the vec-key groupBy, all JVM. Distances are
    fixed-order index sums of doubles, so both engines produce
    bit-identical values (IEEE)."""
    spark = embeddings.sparkSession
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    samp = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_codes)
        .collect()
    )
    if not samp:
        return spark.createDataFrame(
            [], "vec_id long, sub int, code int, dist_e6 bigint"
        )
    dim = len(samp[0]["v"])
    d_sub = dim // n_sub
    book = [
        (m, c, [float(x) for x in r["v"][m * d_sub : (m + 1) * d_sub]])
        for m in range(n_sub)
        for c, r in enumerate(samp)
    ]
    cdf = F.broadcast(
        spark.createDataFrame(book, "sub int, code int, cv array<double>")
    )
    subs = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub"),
        F.col("v"),
    ).select(
        "vec_id", "sub",
        F.slice("v", F.col("sub") * d_sub + 1, d_sub).alias("sv"),
    )
    dist = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        subs.join(cdf, "sub")
        .select("vec_id", "sub", F.struct(dist.alias("d"), F.col("code")).alias("dc"))
        .groupBy("vec_id", "sub")
        .agg(F.min("dc").alias("dc"))
    )
    return best.select(
        "vec_id",
        "sub",
        F.col("dc.code").alias("code"),
        F.floor(1_000_000 * F.col("dc.d")).cast("bigint").alias("dist_e6"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 8",
    k: int = 3,
    n_sub: int = 8,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-compressed corpus —
    the search half of IVF-PQ: each query builds an n_sub x n_codes
    lookup table of exact sub-distances to the codebook, and a
    candidate's approximate distance is the SUM OF TABLE LOOKUPS
    indexed by its stored codes; the original vectors are never read
    at query time. Returns (query_id, rank, neighbor_id, adist_e6),
    rank by (adist asc, neighbor_id).

    Determinism: each LUT entry is floored to integer e6 units BEFORE
    the per-candidate sum, so the aggregate is an associative integer
    sum (the float-order trap the unigram LM also avoids) and both
    engines agree exactly. Approximation contract: adist is the
    standard PQ distance bound — exact per-subspace distance to the
    QUANTIZED candidate, not to the original vector (recall vs the
    exact scan is the codebook's property, measured in tests).

    Shape at 100 TB: ONE scan of the codes table (n_sub rows — really
    n_sub BYTES — per vector), a broadcast LUT join (|queries| x n_sub
    x n_codes rows), one map-side-combined (query, candidate) sum, one
    per-query top-k window over Q partitions. The full-precision
    corpus stays on disk; this is exactly why serving indexes ship
    PQ."""
    spark = embeddings.sparkSession
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    samp = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_codes)
        .collect()
    )
    if not samp:
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, adist_e6 bigint"
        )
    dim = len(samp[0]["v"])
    d_sub = dim // n_sub
    book = [
        (m, c, [float(x) for x in r["v"][m * d_sub : (m + 1) * d_sub]])
        for m in range(n_sub)
        for c, r in enumerate(samp)
    ]
    cdf = F.broadcast(
        spark.createDataFrame(book, "sub int, code int, cv array<double>")
    )
    codes = pq_codes(embeddings, n_sub, n_codes, id_col, vec_col).select(
        F.col("vec_id").alias("neighbor_id"), "sub", "code"
    )
    qsubs = (
        e.where(query_pred)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub"),
            "v",
        )
        .select(
            "query_id", "sub",
            F.slice("v", F.col("sub") * d_sub + 1, d_sub).alias("sv"),
        )
    )
    sq_l2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = qsubs.join(cdf, "sub").select(
        "query_id", "sub", "code",
        F.floor(1_000_000 * sq_l2).cast("long").alias("pd_e6"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pd_e6").alias("adist_e6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_e6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"),
            "neighbor_id", "adist_e6",
        )
    )


def _pq_ctes(rel: str, n_sub: int, n_codes: int, dim: int) -> str:
    """Shared CTE body (e, samp, book, subs, scored, best) for the PQ
    twins: md5-ordered sample codebook, per-subspace slices,
    fixed-order squared-L2 index sums, (dist, code) lexicographic
    argmin (min over a packed struct mirrors Spark's min(struct))."""
    d_sub = dim // n_sub
    return f"""
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {rel}),
        samp AS (
          SELECT v, CAST(row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT)
                 AS code
          FROM (SELECT * FROM e
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                LIMIT {n_codes})),
        book AS MATERIALIZED (
          SELECT m.sub, samp.code,
                 list_transform(range(1, {d_sub} + 1),
                                i -> samp.v[m.sub * {d_sub} + i]) AS cv
          FROM samp, (SELECT unnest(range(0, {n_sub})) AS sub) m),
        subs AS (
          SELECT vec_id, m.sub,
                 list_transform(range(1, {d_sub} + 1),
                                i -> v[m.sub * {d_sub} + i]) AS sv
          FROM e, (SELECT unnest(range(0, {n_sub})) AS sub) m),
        scored AS (
          SELECT s.vec_id, s.sub, b.code,
                 list_sum(list_transform(range(1, {d_sub} + 1),
                   i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))) AS d
          FROM subs s JOIN book b ON b.sub = s.sub),
        best AS (
          SELECT vec_id, sub, min(struct_pack(d := d, code := code)) AS dc
          FROM scored GROUP BY 1, 2)"""


def pq_codes_sql(
    rel: str = "embeddings", n_sub: int = 8, n_codes: int = 8, dim: int = 64
) -> str:
    """DuckDB twin of pq_codes (see _pq_ctes)."""
    return f"""
        WITH {_pq_ctes(rel, n_sub, n_codes, dim)}
        SELECT vec_id, CAST(sub AS INT) AS sub,
               CAST(dc.code AS INT) AS code,
               CAST(floor(1000000 * dc.d) AS BIGINT) AS dist_e6
        FROM best
    """


def pq_adc_sql(
    rel: str = "embeddings",
    query_pred: str = "vec_id < 8",
    k: int = 3,
    n_sub: int = 8,
    n_codes: int = 8,
    dim: int = 64,
) -> str:
    """DuckDB twin of pq_adc_topk: same codes (shared _pq_ctes), same
    per-entry integer-floored LUT, associative integer sums, same
    (adist, neighbor) rank order."""
    d_sub = dim // n_sub
    return f"""
        WITH {_pq_ctes(rel, n_sub, n_codes, dim)},
        codes AS (SELECT vec_id AS neighbor_id, sub, dc.code AS code FROM best),
        qsubs AS (
          SELECT vec_id AS query_id, m.sub,
                 list_transform(range(1, {d_sub} + 1),
                                i -> v[m.sub * {d_sub} + i]) AS sv
          FROM e, (SELECT unnest(range(0, {n_sub})) AS sub) m
          WHERE {query_pred}),
        lut AS (
          SELECT s.query_id, s.sub, b.code,
                 CAST(floor(1000000 * list_sum(list_transform(
                   range(1, {d_sub} + 1),
                   i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))))
                 AS BIGINT) AS pd_e6
          FROM qsubs s JOIN book b ON b.sub = s.sub),
        adc_scored AS (
          SELECT l.query_id, c.neighbor_id,
                 CAST(sum(l.pd_e6) AS BIGINT) AS adist_e6
          FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
          WHERE l.query_id <> c.neighbor_id
          GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, neighbor_id, adist_e6,
                 CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY adist_e6 ASC, neighbor_id ASC) AS INT) AS rank
          FROM adc_scored)
        SELECT query_id, rank, neighbor_id, adist_e6
        FROM ranked WHERE rank <= {k}
    """


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-refined IVF centroids, fully deterministic: init = the
    hash-ordered corpus sample (the zero-training pick ivf_topk uses by
    default); each round assigns every vector to its max-cosine
    centroid (broadcast nested-loop over n_centroids rows — the small
    side by design) and recomputes each centroid as the per-dimension
    mean of its members (``dim`` avg aggregates, map-side combined; a
    cluster that loses all members keeps its previous centroid).
    Cost per round: ONE pass over the corpus + a k x dim collect — the
    textbook distributed k-means shape; training state is O(k·dim),
    never O(corpus). Returns (cid, cv) with cid = 0..k-1."""
    spark = embeddings.sparkSession
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    init = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in init]
    schema = "cid long, cv array<double>"
    if not cents:  # empty corpus: empty centroid table, like refine=0
        return spark.createDataFrame([], schema)
    dim = len(cents[0])
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(list(enumerate(cents)), schema)
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
        assigned = (
            e.crossJoin(cdf)
            .select(
                "vec_id",
                "v",
                "cid",
                (_dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("ccos"),
            )
            .withColumn("crank", F.row_number().over(w))
            .where(F.col("crank") == 1)
        )
        means = assigned.groupBy("cid").agg(
            *[F.avg(F.col("v")[i].cast("double")).alias(f"d{i}") for i in range(dim)]
        )
        for r in means.collect():
            cents[int(r["cid"])] = [float(r[f"d{i}"]) for i in range(dim)]
    return spark.createDataFrame(list(enumerate(cents)), schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize every vector to its
    nearest centroid (inverted lists keyed by centroid id), probe the
    query's ``nprobe`` nearest lists, re-score exactly within them.

    Centroids are a deterministic hash-ordered sample of the corpus
    vectors (ORDER BY md5(vec_id) LIMIT n_centroids) — the zero-training
    IVF variant that the SQL oracle mirrors; ``refine_iters > 0``
    switches to Lloyd-refined centroids (``kmeans_centroids``), which
    changes centroid VALUES but not this dataflow. Scale shape: the
    centroid table is n_centroids rows (broadcast); assignment is one
    broadcast nested-loop over it (k small by design); the probe join is
    an equi-join on centroid id, so the corpus never self-joins.
    """
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    if refine_iters > 0:
        cents = kmeans_centroids(
            embeddings, n_centroids, refine_iters, id_col, vec_col
        )
    else:
        cents = (
            e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(n_centroids)
            .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        )
    cents = F.broadcast(cents)

    def cos(a, b):
        return _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cid")
    )
    assigned = (
        e.crossJoin(cents)
        .select("vec_id", "v", "cid", cos("v", "cv").alias("ccos"))
        .withColumn("crank", F.row_number().over(w_assign))
        .where(F.col("crank") == 1)
        .select("vec_id", "v", "cid")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_probe = (
        q.crossJoin(cents)
        .select("query_id", "qv", "cid", cos("qv", "cv").alias("ccos"))
        .withColumn("crank", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
        ))
        .where(F.col("crank") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        q_probe.join(assigned, "cid")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.floor(1000 * _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v"))))
            .cast("long")
            .alias("cos_e3"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e3"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_e3")
    )


def ivf_topk_sql(
    rel: str = "embeddings",
    query_pred: str = "vec_id < 8",
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> str:
    """DuckDB twin of ivf_topk (hash-ordered centroid sample, argmin
    assignment, nprobe probe lists, exact re-score)."""
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {rel}),
        cents AS (
          SELECT vec_id AS cid, v AS cv FROM e
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}),
        assigned AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                     c.cid ASC) AS crank
            FROM e, cents c)
          WHERE crank = 1),
        q_probe AS (
          SELECT query_id, qv, cid FROM (
            SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                     c.cid ASC) AS crank
            FROM e, cents c WHERE e.{query_pred})
          WHERE crank <= {nprobe}),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 CAST(floor(1000 * list_dot_product(p.qv, a.v) /
                      (sqrt(list_dot_product(p.qv, p.qv)) *
                       sqrt(list_dot_product(a.v, a.v)))) AS BIGINT) AS cos_e3
          FROM q_probe p JOIN assigned a ON a.cid = p.cid
          WHERE p.query_id <> a.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos_e3,
                 CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_e3 DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, cos_e3 FROM ranked WHERE rank <= {k}
    """


def _sql_dot(vec_expr: str, plane: list[float]) -> str:
    lits = ", ".join(repr(x) for x in plane)
    return f"list_dot_product({vec_expr}, [{lits}])"


def lsh_topk_sql(
    rel: str = "embeddings",
    query_pred: str = "vec_id < 8",
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    probe_bits: int = 2,
) -> str:
    """DuckDB twin of lsh_topk (same literal-hyperplane trick)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = " + ".join(
        f"(CASE WHEN {_sql_dot('v', pl)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, pl in enumerate(planes)
    )
    probe_terms = ["bucket"]
    if probe_bits >= 1:
        probe_terms += [f"xor(bucket, {1 << p})" for p in range(n_planes)]
    if probe_bits >= 2:
        probe_terms += [
            f"xor(bucket, {(1 << p) | (1 << q)})"
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    probes = ", ".join(probe_terms)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {rel}),
        sig AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        qp AS (
          SELECT vec_id AS query_id, unnest([{probes}]) AS probe
          FROM sig WHERE {query_pred}),
        cand AS (
          SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
          FROM qp q JOIN sig s ON q.probe = s.bucket
          WHERE q.query_id <> s.vec_id),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 CAST(floor(1000 * list_dot_product(eq.v, en.v) /
                      (sqrt(list_dot_product(eq.v, eq.v)) *
                       sqrt(list_dot_product(en.v, en.v)))) AS BIGINT) AS cos_e3
          FROM cand c
          JOIN e eq ON eq.vec_id = c.query_id
          JOIN e en ON en.vec_id = c.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos_e3,
                 CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_e3 DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, cos_e3 FROM ranked WHERE rank <= {k}
    """


def lsh_near_dup_pairs_sql(
    rel: str = "embeddings",
    min_cos_e3: int = 300,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    probe_bits: int = 2,
) -> str:
    """DuckDB twin of lsh_near_dup_pairs: the hyperplanes are closed-form
    values computed ONCE in Python and embedded as float literals (repr
    round-trips doubles exactly), so both engines bucket with identical
    arithmetic."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = " + ".join(
        f"(CASE WHEN {_sql_dot('v', pl)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, pl in enumerate(planes)
    )
    probe_terms = ["bucket"]
    if probe_bits >= 1:
        probe_terms += [f"xor(bucket, {1 << p})" for p in range(n_planes)]
    if probe_bits >= 2:
        probe_terms += [
            f"xor(bucket, {(1 << p) | (1 << q)})"
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    probes = ", ".join(probe_terms)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {rel}),
        sig AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        probes AS (SELECT vec_id, unnest([{probes}]) AS probe FROM sig),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM probes a JOIN sig b ON a.probe = b.bucket
          WHERE a.vec_id < b.vec_id),
        scored AS (
          SELECT c.vec_a, c.vec_b,
                 CAST(floor(1000 * list_dot_product(ea.v, eb.v) /
                      (sqrt(list_dot_product(ea.v, ea.v)) *
                       sqrt(list_dot_product(eb.v, eb.v)))) AS BIGINT) AS cos_e3
          FROM cand c
          JOIN e ea ON ea.vec_id = c.vec_a
          JOIN e eb ON eb.vec_id = c.vec_b)
        SELECT vec_a, vec_b, cos_e3 FROM scored WHERE cos_e3 >= {min_cos_e3}
    """


def mmr_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 5,
    n_candidates: int = 16,
    lam_millis: int = 500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) — the rerank a retrieval-backed curation pipeline
    runs AFTER ANN so the k examples it keeps are not k near-copies of
    the same passage: greedily pick argmax of
    ``lam * rel(d) - (1 - lam) * max sim(d, already-selected)``.
    Returns (rank, vec_id, rel_e3, mmr_score); rank 0 is the pure-
    relevance pick (empty selected set contributes nothing), and
    mmr_score = lam_millis*rel_e3 - (1000-lam_millis)*maxsim_e3 — all
    arithmetic on the 1e-3-floored cosines in integer thousandths, so
    selection order is exact cross-engine (ties by vec_id ASC).

    Shape: relevance is ONE scan of the corpus against the broadcast
    1-row query (this is where ANN drops in at fleet scale — the scan
    becomes ivf/lsh/pq_adc candidate generation); everything after is
    bounded by n_candidates: the candidate frame and its pairwise
    sim matrix (<= n^2 rows) are broadcast-sized, and each of the k
    greedy steps is one anti-join + one max-aggregate + a LIMIT 1 on
    that bounded frame, localCheckpoint-ed so the step plans stay
    O(1). The greedy recurrence is inherently sequential in k — the
    per-step work, not the step count, is what scales."""
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv")
    )
    rel = (
        e.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.floor(1000 * _dot(F.col("qv"), F.col("v"))
                    / (_norm(F.col("qv")) * _norm(F.col("v"))))
            .cast("long").alias("rel_e3"),
        )
    )
    cand = (
        rel.orderBy(F.desc("rel_e3"), F.asc("vec_id"))
        .limit(n_candidates)
        .localCheckpoint()
    )
    ca = cand.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    cb = cand.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    sims = (
        ca.crossJoin(cb)
        .where(F.col("a") != F.col("b"))
        .select(
            "a", "b",
            F.floor(1000 * _dot(F.col("va"), F.col("vb"))
                    / (_norm(F.col("va")) * _norm(F.col("vb"))))
            .cast("long").alias("sim_e3"),
        )
        .localCheckpoint()
    )
    lam, mu = F.lit(lam_millis).cast("long"), F.lit(1000 - lam_millis)
    sel = (
        cand.orderBy(F.desc("rel_e3"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(0).cast("int").alias("rank"),
            "vec_id",
            "rel_e3",
            (lam * F.col("rel_e3")).cast("long").alias("mmr_score"),
        )
        .localCheckpoint()
    )
    for i in range(1, k):
        maxsim = (
            sims.join(sel.select(F.col("vec_id").alias("b")), "b")
            .groupBy("a")
            .agg(F.max("sim_e3").alias("ms"))
        )
        pick = (
            cand.join(sel.select("vec_id"), "vec_id", "left_anti")
            .join(maxsim, cand.vec_id == maxsim.a)
            .select(
                F.lit(i).cast("int").alias("rank"),
                "vec_id",
                "rel_e3",
                (lam * F.col("rel_e3") - mu * F.col("ms"))
                .cast("long").alias("mmr_score"),
            )
            .orderBy(F.desc("mmr_score"), F.asc("vec_id"))
            .limit(1)
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel


def mmr_topk_sql(
    rel: str = "embeddings",
    query_vec_id: int = 0,
    k: int = 5,
    n_candidates: int = 16,
    lam_millis: int = 500,
) -> str:
    """mmr_topk twin: the k greedy steps UNROLLED into chained
    MATERIALIZED CTEs (sel{i} is referenced by the next step's
    anti-filter, max-sim aggregate, and the final union — DuckDB
    inlines plain CTEs, re-expanding everything per reference). Every
    comparison runs on the same 1e-3-floored integer cosines as the
    Spark side."""
    cos = ("CAST(floor(1000 * list_dot_product({x}, {y}) / "
           "(sqrt(list_dot_product({x}, {x})) * "
           "sqrt(list_dot_product({y}, {y})))) AS BIGINT)")
    mu = 1000 - lam_millis
    body = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM {rel}),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
        cand AS MATERIALIZED (
          SELECT vec_id, v, {cos.format(x='qv', y='v')} AS rel_e3
          FROM e, q WHERE vec_id <> {query_vec_id}
          ORDER BY rel_e3 DESC, vec_id ASC LIMIT {n_candidates}),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 {cos.format(x='a.v', y='b.v')} AS sim_e3
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        sel0 AS MATERIALIZED (
          SELECT CAST(0 AS INT) AS rank, vec_id, rel_e3,
                 CAST({lam_millis} * rel_e3 AS BIGINT) AS mmr_score
          FROM cand ORDER BY rel_e3 DESC, vec_id ASC LIMIT 1)"""
    for i in range(1, k):
        body += f""",
        sel{i} AS MATERIALIZED (
          SELECT * FROM sel{i-1}
          UNION ALL
          SELECT * FROM (
            SELECT CAST({i} AS INT) AS rank, c.vec_id, c.rel_e3,
                   CAST({lam_millis} * c.rel_e3 - {mu} * ms.ms AS BIGINT)
                     AS mmr_score
            FROM cand c
            JOIN (SELECT s.a, max(s.sim_e3) AS ms
                  FROM sims s JOIN sel{i-1} p ON p.vec_id = s.b
                  GROUP BY 1) ms ON ms.a = c.vec_id
            WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i-1})
            ORDER BY mmr_score DESC, c.vec_id ASC LIMIT 1))"""
    return body + f"""
        SELECT rank, vec_id, rel_e3, mmr_score FROM sel{k-1}
    """


def prefix_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    prefix_dims: int = 16,
    n_cands: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Progressive dimension-reduced top-k (the Matryoshka / PCA-prefix
    rerank pattern): a COARSE pass ranks every candidate by cosine over
    only the first ``prefix_dims`` dimensions (1e-3-floored, id
    tie-break — deterministic cross-engine), keeps the top ``n_cands``
    per query, and an exact full-dimension rerank of those candidates
    emits the final top-k. Same output shape as cosine_topk /
    ivf_topk: (query_id, rank, neighbor_id, cos_e3).

    Why at scale: the coarse pass touches prefix_dims/dim of the
    vector bytes (a production deployment stores the prefix as its own
    column, so the scan prunes to it — ReadSchema does that here via
    the slice), and the exact rerank touches only n_cands rows per
    query instead of the corpus. Shape: one broadcast nested-loop of
    the small query side against the corpus (the cosine_topk baseline
    shape), one query-keyed window capped at n_cands, then a
    candidates-only rescore — no corpus self-join, no global sort."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    qp = F.slice(F.col("qv"), 1, prefix_dims)
    cp = F.slice(F.col("cv"), 1, prefix_dims)
    coarse = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "qv",
            "neighbor_id",
            "cv",
            F.floor(1000 * _dot(qp, cp) / (_norm(qp) * _norm(cp)))
            .cast("long")
            .alias("pcos_e3"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("pcos_e3"), F.asc("neighbor_id")
    )
    cands = (
        coarse.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= n_cands)
    )
    rescored = cands.select(
        "query_id",
        "neighbor_id",
        F.floor(
            1000 * _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv")))
        )
        .cast("long")
        .alias("cos_e3"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_e3"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "cos_e3",
        )
    )


def prefix_rerank_sql(
    rel: str = "embeddings",
    query_pred: str = "vec_id < 8",
    k: int = 3,
    prefix_dims: int = 16,
    n_cands: int = 10,
) -> str:
    """DuckDB twin of prefix_rerank (list slice is 1-based inclusive on
    both engines: v[1:P] == F.slice(v, 1, P))."""
    p = prefix_dims
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {rel}),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE {query_pred}),
        coarse AS (
          SELECT q.query_id, q.qv, e.vec_id AS neighbor_id, e.v AS cv,
                 CAST(floor(1000 * list_dot_product(q.qv[1:{p}], e.v[1:{p}]) /
                      (sqrt(list_dot_product(q.qv[1:{p}], q.qv[1:{p}])) *
                       sqrt(list_dot_product(e.v[1:{p}], e.v[1:{p}]))))
                   AS BIGINT) AS pcos_e3
          FROM q, e WHERE e.vec_id <> q.query_id),
        cands AS (
          SELECT query_id, qv, neighbor_id, cv FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY pcos_e3 DESC, neighbor_id ASC) AS crank
            FROM coarse)
          WHERE crank <= {n_cands}),
        rescored AS (
          SELECT query_id, neighbor_id,
                 CAST(floor(1000 * list_dot_product(qv, cv) /
                      (sqrt(list_dot_product(qv, qv)) *
                       sqrt(list_dot_product(cv, cv)))) AS BIGINT) AS cos_e3
          FROM cands),
        ranked AS (
          SELECT query_id, neighbor_id, cos_e3,
                 CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_e3 DESC, neighbor_id ASC) AS INT) AS rank
          FROM rescored)
        SELECT query_id, rank, neighbor_id, cos_e3
        FROM ranked WHERE rank <= {k}
    """


def quantized_components(
    emb: DataFrame, cols: list[str], vec_col: str = "embedding"
) -> DataFrame:
    """(cols..., dim, e6): per-component EXACT 1e-6 quantization of the
    embedding column — e6 = floor(1e6 * double(x)), the single place
    the convention lives (float -> double widening is exact and both
    engines floor the identical double). Shared by the centroid /
    outlier / norm-profile family so their cross-query claim — that
    distances and norms are computed over the SAME quantized
    components — holds by construction, not by copy-paste."""
    return emb.select(
        *cols, F.posexplode(vec_col).alias("dim", "_x")
    ).select(
        *cols,
        F.col("dim").cast("int").alias("dim"),
        F.floor(1_000_000 * F.col("_x").cast("double"))
        .cast("bigint").alias("e6"),
    )


def label_centroids(x: DataFrame) -> DataFrame:
    """(label, dim, n, sum_e6, mean_e6) over a quantized_components
    frame carrying a label column: exact bigint sums, mean floored
    once per cell — the class-prototype aggregate shared by
    sim_label_centroids and sim_centroid_outliers."""
    return (
        x.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("e6").cast("bigint").alias("sum_e6"),
        )
        .select(
            "label", "dim", "n", "sum_e6",
            F.floor(F.col("sum_e6") / F.col("n")).cast("bigint").alias("mean_e6"),
        )
    )
