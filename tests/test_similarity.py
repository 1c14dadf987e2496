"""Similarity / ANN operators: exactness of the brute-force baseline,
plan shape of the LSH paths (no cartesian product anywhere), and
MEASURED recall of the approximate operators against the exact oracle.

Recall floors are regime-honest: random-hyperplane LSH is designed for
high-cosine retrieval — on a clustered corpus (the near-dup design
point) recall must be high; on near-orthogonal noise (the sf0.01 test
embeddings, max pair cos ~0.5) collision probability is physics-bound
(p_match = (1 - theta/pi)^n_planes expanded by multi-probe), so the
floor there is the theoretical value, recorded for transparency.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from denrl_spark.functions.similarity import (
    cosine_topk,
    lsh_near_dup_pairs,
    lsh_topk,
)

DIM = 64


@pytest.fixture(scope="module")
def clustered(spark):
    """40 seeded base vectors, each with two perturbed copies at
    cosine >= ~0.97 — a deterministic near-duplicate corpus."""
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for _ in range(40):
        base = rng.randn(DIM)
        base /= np.linalg.norm(base)
        for _ in range(3):
            noise = rng.randn(DIM) * 0.02
            v = base + noise
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


def test_near_dup_recall_on_clustered_corpus(spark, clustered):
    """Design regime: high-cosine near-dups must be found."""
    e = clustered
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    from denrl_spark.functions.similarity import _dot, _norm

    exact = (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.floor(1000 * _dot("va", "vb") / (_norm("va") * _norm("vb")))
            .cast("long")
            .alias("cos_e3"),
        )
        .where(F.col("cos_e3") >= 900)
    )
    truth = _pairs(exact)
    assert len(truth) >= 40  # each cluster contributes 3 pairs
    got = _pairs(lsh_near_dup_pairs(e, min_cos_e3=900))
    recall = len(truth & got) / len(truth)
    # theory at cos .9 (theta~26deg, p~.856/plane, 6 planes, Hamming<=2):
    # ~.97; assert a robust floor (precision is covered by the subset test)
    assert recall >= 0.9, f"near-dup recall {recall:.3f} < 0.9"


def test_lsh_topk_recall_on_clustered_corpus(spark, clustered):
    queries = clustered.where("vec_id % 3 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered, queries, k=2).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(clustered, queries, k=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    # top-2 of a cluster member = its two in-cluster twins (cos ~.97)
    assert recall >= 0.9, f"topk recall {recall:.3f} < 0.9"


def test_lsh_near_dup_matches_bruteforce_within_candidates(spark, clustered):
    """Precision is exact by construction: every emitted pair is
    re-scored with the same arithmetic as the brute force, so LSH output
    is a SUBSET of the brute-force pair set at the same threshold."""
    from denrl_spark.functions.similarity import _dot, _norm

    e = clustered
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    bf = (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.floor(1000 * _dot("va", "vb") / (_norm("va") * _norm("vb")))
            .cast("long")
            .alias("cos_e3"),
        )
        .where(F.col("cos_e3") >= 500)
    )
    lsh = lsh_near_dup_pairs(e, min_cos_e3=500)
    assert _pairs(lsh) <= _pairs(bf)


def test_lsh_paths_plan_no_cartesian(spark, clustered):
    """The whole point of the LSH operators: no CartesianProduct and no
    BroadcastNestedLoopJoin in the plan (bucket equi-joins only)."""
    for df in (
        lsh_near_dup_pairs(clustered),
        lsh_topk(clustered, clustered.where("vec_id < 5")),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_recall_on_clustered_corpus(spark, clustered):
    from denrl_spark.functions.similarity import ivf_topk

    queries = clustered.where("vec_id % 3 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered, queries, k=2).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(clustered, queries, k=2, n_centroids=8, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # in-cluster twins quantize to the same centroid almost surely;
    # nprobe=3 of 8 lists covers boundary cases
    assert recall >= 0.85, f"ivf recall {recall:.3f} < 0.85"


def test_ivf_probe_join_is_equi_join(spark, clustered):
    """The corpus may only cross-join the (broadcast, n_centroids-row)
    centroid table; corpus-vs-corpus contact must be the cid equi-join."""
    from denrl_spark.functions.similarity import ivf_topk

    df = ivf_topk(clustered, clustered.where("vec_id < 5"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # any nested-loop joins present must build a broadcast side (the tiny
    # centroid table); a CartesianProduct would mean corpus x corpus
    assert "CartesianProduct" not in plan


def test_ivf_kmeans_refinement_improves_tight_budget_recall(spark, clustered):
    """Lloyd refinement must not hurt — and at the tightest probe
    budget (nprobe=1) it should sharpen the inverted lists vs the
    zero-training hash-sample centroids (measured baseline ~0.79 on
    this fixture). Also pins determinism: two runs produce identical
    results."""
    from denrl_spark.functions.similarity import ivf_topk

    queries = clustered.where("vec_id % 3 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered, queries, k=2).collect()
    }

    def recall(refine_iters):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                clustered, queries, k=2, n_centroids=8, nprobe=1,
                refine_iters=refine_iters,
            ).collect()
        }
        return len(exact & approx) / len(exact)

    base, refined = recall(0), recall(3)
    assert refined >= base, (base, refined)
    assert refined >= 0.85, refined

    a = sorted(
        map(tuple, ivf_topk(clustered, queries, k=2, refine_iters=2).collect())
    )
    b = sorted(
        map(tuple, ivf_topk(clustered, queries, k=2, refine_iters=2).collect())
    )
    assert a == b


def test_quantize_int8_round_trip_and_edge_cases(spark):
    import numpy as np

    from denrl_spark.functions.similarity import quantize_int8

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))  # zero vector
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(e).collect()}
    # zero vector: all-zero qvec, scale 0
    assert out[99]["scale_e9"] == 0 and all(q == 0 for q in out[99]["qvec"])
    for i, v in rows[:-1]:
        q = np.array(out[i]["qvec"], dtype=np.float64)
        assert np.abs(q).max() == 127  # the max-|v| axis saturates exactly
        scale = out[i]["scale_e9"] / 1e9
        deq = q * scale
        orig = np.array(v, dtype=np.float64)
        cos = deq @ orig / (np.linalg.norm(deq) * np.linalg.norm(orig))
        assert cos > 0.999, (i, cos)  # quantization barely moves direction


def test_semantic_dedup_keep_list_clusters(spark, tmp_path):
    """dedup_semantic_keep: two tight semantic clusters plus orthogonal
    singletons collapse to min-id representatives; singletons keep
    themselves. Runs the registered query end-to-end off parquet."""
    from denrl_spark.plans.driver_queries import dedup_semantic_keep

    rng = np.random.RandomState(3)
    rows = []
    vid = 0
    cluster_of = {}
    for c in range(2):
        base = rng.randn(DIM)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.randn(DIM) * 0.01
            rows.append((vid, [float(x) for x in v], c))
            cluster_of[vid] = c
            vid += 1
    # orthogonal singletons: distinct one-hot axes, cos = 0 to everything
    for axis in (10, 30, 50):
        v = [0.0] * DIM
        v[axis] = 1.0
        rows.append((vid, v, -1))
        cluster_of[vid] = f"solo{vid}"
        vid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    out = {r["vec_id"]: r for r in dedup_semantic_keep(spark, sf).collect()}
    assert len(out) == vid  # every vector classified exactly once
    # cluster members share the min-id rep; exactly one rep per cluster
    assert {out[i]["rep_vec_id"] for i in range(3)} == {0}
    assert {out[i]["rep_vec_id"] for i in range(3, 6)} == {3}
    for i in (6, 7, 8):
        assert out[i]["rep_vec_id"] == i and out[i]["is_rep"] == 1
    assert [out[i]["is_rep"] for i in range(6)] == [1, 0, 0, 1, 0, 0]


def test_pq_codes_match_numpy_transcription(spark):
    """pq_codes vs a direct numpy transcription: same md5-ordered
    sample codebook, per-subspace squared-L2 argmin with (dist, code)
    tie-break, exact floored errors; every vector emits exactly n_sub
    rows and codes index the real codebook."""
    import hashlib

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from denrl_spark.functions.similarity import pq_codes

    got = pq_codes(e).collect()
    n_sub, n_codes, d_sub = 8, 8, DIM // 8

    vecs = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows}
    order = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    book = [vecs[i] for i in order[:n_codes]]

    expect = {}
    for i, v in vecs.items():
        for m in range(n_sub):
            sv = v[m * d_sub : (m + 1) * d_sub]
            dists = [float(((sv - b[m * d_sub : (m + 1) * d_sub]) ** 2).sum())
                     for b in book]
            code = min(range(n_codes), key=lambda c: (dists[c], c))
            expect[(i, m)] = (code, int(np.floor(1_000_000 * dists[code])))

    assert len(got) == len(vecs) * n_sub
    for r in got:
        code, dist = expect[(r["vec_id"], r["sub"])]
        assert (r["code"], r["dist_e6"]) == (code, dist), (r, code, dist)
    # sampled codebook members encode themselves exactly in every subspace
    for i in order[:n_codes]:
        own = [r for r in got if r["vec_id"] == i]
        assert all(r["dist_e6"] == 0 for r in own)


def test_pq_codes_empty_corpus(spark):
    from denrl_spark.functions.similarity import pq_codes

    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert pq_codes(e).count() == 0


def test_pq_adc_matches_numpy_transcription_and_recall(spark, clustered):
    """pq_adc_topk vs a numpy transcription of the full LUT pipeline
    (same codebook, integer-floored entries, (adist, id) rank), plus a
    measured recall floor vs the exact squared-L2 scan on the
    clustered corpus — quantized distance must still surface true
    near-duplicates."""
    import hashlib

    from denrl_spark.functions.similarity import pq_adc_topk

    K = 3
    got = {}
    for r in pq_adc_topk(clustered, query_pred="vec_id < 8", k=K).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adist_e6"])
        )

    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in clustered.collect()}
    n_sub, n_codes, d_sub = 8, 8, DIM // 8
    order = sorted(rows, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    book = [rows[i] for i in order[:n_codes]]

    def sub(v, m):
        return v[m * d_sub : (m + 1) * d_sub]

    codes = {
        i: [min(range(n_codes),
                key=lambda c: (float(((sub(v, m) - sub(book[c], m)) ** 2).sum()), c))
            for m in range(n_sub)]
        for i, v in rows.items()
    }
    expect = {}
    for q in range(8):
        lut = [[int(np.floor(1e6 * ((sub(rows[q], m) - sub(book[c], m)) ** 2).sum()))
                for c in range(n_codes)] for m in range(n_sub)]
        cand = [(sum(lut[m][codes[i][m]] for m in range(n_sub)), i)
                for i in rows if i != q]
        cand.sort()
        expect[q] = [(r + 1, i, d) for r, (d, i) in enumerate(cand[:K])]
    assert got == expect

    # recall vs the exact scan: each query's true nearest neighbor (a
    # same-cluster perturbation) must appear in the ADC top-3
    hits = 0
    for q in range(8):
        exact = sorted(
            (float(((rows[q] - v) ** 2).sum()), i)
            for i, v in rows.items() if i != q
        )
        true_nn = exact[0][1]
        hits += any(n == true_nn for _, n, _ in got[q])
    assert hits >= 6  # >= 0.75 recall@3 for the true NN under 8x compression


def test_pq_partition_invariance(spark, clustered):
    """pq_codes / pq_adc_topk are pure functions of the vector set."""
    from denrl_spark.functions.similarity import pq_adc_topk, pq_codes

    sh = clustered.repartition(7)
    for op in (pq_codes, pq_adc_topk):
        a = sorted(map(tuple, op(clustered).collect()))
        b = sorted(map(tuple, op(sh).collect()))
        assert a == b and len(a) > 0, op.__name__


def test_knn_graph_ranks_cluster_mates_first(spark, clustered, tmp_path):
    """On the clustered corpus every vector's top-2 neighbors are its
    two cluster mates (cos ~0.97 vs cross-cluster noise), ranks are
    dense per source, and the rank rule matches a literal recompute
    from the pair set."""
    import os

    from denrl_spark.plans.driver_queries import (
        KNN_K,
        KNN_MIN_COS_E3,
        sim_knn_graph,
    )

    d = str(tmp_path / "knn")
    clustered.write.parquet(os.path.join(d, "embeddings.parquet"))
    rows = sim_knn_graph(spark, d).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append((r["rn"], r["dst"], r["cos_e3"]))
    assert len(by_src) == 120
    for src, lst in by_src.items():
        lst.sort()
        assert [rn for rn, *_ in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= KNN_K
        mates = {v for v in range(src // 3 * 3, src // 3 * 3 + 3) if v != src}
        assert {dst for rn, dst, _ in lst[:2]} == mates, src
    # rank rule == literal recompute over the symmetric candidate set
    from denrl_spark.functions.similarity import lsh_near_dup_pairs

    pairs = lsh_near_dup_pairs(
        clustered, min_cos_e3=KNN_MIN_COS_E3
    ).collect()
    nbrs: dict[int, list] = {}
    for p in pairs:
        nbrs.setdefault(p["vec_a"], []).append((-p["cos_e3"], p["vec_b"]))
        nbrs.setdefault(p["vec_b"], []).append((-p["cos_e3"], p["vec_a"]))
    for src, lst in nbrs.items():
        want = [v for _, v in sorted(lst)[:KNN_K]]
        got = [dst for _, dst, _ in sorted(by_src[src])]
        assert got == want, src


def test_mmr_transcription_and_diversity(spark, tmp_path):
    """mmr_topk == a literal Python transcription of the greedy MMR
    recurrence on the same 1e-3-floored cosines, AND the diversity
    term actually changes the outcome: the gadget puts three
    near-duplicate vectors closest to the query plus two moderately
    relevant but diverse ones — pure top-k keeps all three near-dups,
    MMR at lambda=0.5 must not."""
    import math
    import os

    from denrl_spark.functions.similarity import mmr_topk

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],          # the query
        1: [0.98, 0.20, 0.0, 0.0],        # near-dup cluster
        2: [0.97, 0.22, 0.0, 0.0],
        3: [0.99, 0.18, 0.0, 0.0],
        4: [0.70, 0.0, 0.71, 0.0],        # diverse, moderate relevance
        5: [0.60, 0.0, 0.0, 0.80],        # diverse, moderate relevance
        6: [0.0, 1.0, 0.0, 0.0],          # irrelevant
        7: [-0.5, 0.5, 0.5, 0.5],         # irrelevant
    }
    d = str(tmp_path / "mmr")
    spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    def cos_e3(x, y):
        dot = 0.0
        for a, b in zip(x, y):
            dot = dot + a * b
        nx = math.sqrt(sum(a * a for a in x))
        ny = math.sqrt(sum(b * b for b in y))
        return math.floor(1000 * dot / (nx * ny))

    k, n_cand, lam = 4, 6, 500
    rel = {i: cos_e3(vecs[0], v) for i, v in vecs.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:n_cand]
    sims = {(a, b): cos_e3(vecs[a], vecs[b])
            for a in cand for b in cand if a != b}
    first = min(cand, key=lambda i: (-rel[i], i))
    expect = [(0, first, rel[first], lam * rel[first])]
    sel = [first]
    for step in range(1, k):
        best = None
        for c in cand:
            if c in sel:
                continue
            ms = max(sims[(c, s)] for s in sel)
            score = lam * rel[c] - (1000 - lam) * ms
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        expect.append((step, best[1], rel[best[1]], best[2]))
        sel.append(best[1])

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    got = [
        (r["rank"], r["vec_id"], r["rel_e3"], r["mmr_score"])
        for r in mmr_topk(emb, k=k, n_candidates=n_cand).orderBy("rank").collect()
    ]
    assert got == expect
    # rank 0 is the pure-relevance argmax
    assert got[0][1] == min(rel, key=lambda i: (-rel[i], i))
    # diversity bites: plain top-k would be the 3 near-dups first,
    # MMR's first 3 picks must NOT be {1, 2, 3}
    topk_plain = sorted(rel, key=lambda i: (-rel[i], i))[:3]
    assert set(topk_plain) == {1, 2, 3}
    assert {v for _, v, _, _ in got[:3]} != {1, 2, 3}
    # both diverse-but-relevant vectors make the MMR cut
    assert {4, 5} <= {v for _, v, _, _ in got}


def test_prefix_rerank_transcription_and_exact_limit(spark):
    """prefix_rerank == a literal numpy transcription of the two-stage
    recurrence (prefix-cosine coarse rank -> top-C candidates ->
    full-dim exact rerank) at sf0.001, AND degenerates to exact
    cosine_topk when the prefix is the whole vector and the candidate
    budget covers the corpus."""
    import math

    from denrl_spark.functions.similarity import cosine_topk, prefix_rerank

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 4")
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_e3"])
        for r in prefix_rerank(emb, q, k=3, prefix_dims=16, n_cands=10)
        .orderBy("query_id", "rank")
        .collect()
    ]

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def fcos(a, b):
        return math.floor(
            1000 * float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    want = []
    for qid in sorted(v for v in vecs if v < 4):
        coarse = sorted(
            (
                (-fcos(vecs[qid][:16], vecs[n][:16]), n)
                for n in vecs
                if n != qid
            )
        )[:10]
        exact = sorted(
            ((-fcos(vecs[qid], vecs[n]), n) for _, n in coarse)
        )[:3]
        want += [
            (qid, i + 1, n, -negc) for i, (negc, n) in enumerate(exact)
        ]
    assert got == want and len(got) == 12

    # full-prefix + full-candidate budget == exact brute force
    n = emb.count()
    full = prefix_rerank(emb, q, k=3, prefix_dims=64, n_cands=n)
    exact_df = cosine_topk(emb, q, k=3)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, exact_df.collect())
    )


def test_recall_eval_matches_direct_overlap(spark):
    """sim_recall_eval == recall computed directly from the two
    registered top-k queries; bounds sanity on every row."""
    from denrl_spark.plans.driver_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["query_id"]: r for r in QUERIES["sim_recall_eval"](spark, sf).collect()}
    exact = {}
    for r in QUERIES["sim_cosine_topk"](spark, sf).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ann = {}
    for r in QUERIES["sim_lsh_topk"](spark, sf).collect():
        ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(exact)
    for qid, r in got.items():
        hits = len(exact[qid] & ann.get(qid, set()))
        assert r["k_exact"] == len(exact[qid])
        assert r["n_hit"] == hits
        assert r["recall_ppm"] == (1_000_000 * hits) // r["k_exact"]
        assert 0 <= r["recall_ppm"] <= 1_000_000


def test_rrf_fusion_matches_list_transcription(spark, tmp_path):
    """sim_rrf equals RRF recomputed in Python from the two top-k lists
    it fuses: every (query, neighbor) from either list appears exactly
    once, contributions are floor(1e6/(60+rank)) per retrieving list,
    and the provenance flags match list membership."""
    import os

    from denrl_spark.plans.driver_queries import sim_rrf

    rng = np.random.default_rng(7)
    base = rng.normal(size=(3, 64))
    rows = []
    # noise high enough that the 6-plane LSH ranking diverges from the
    # exact ranking for at least one query (the fusion has to handle
    # one-list-only candidates, not just re-rank a shared set)
    for i in range(24):
        v = base[i % 3] + rng.normal(scale=0.9, size=64)
        rows.append((i, [float(x) for x in v], i % 3))
    d = str(tmp_path / "rrf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    q = emb.where("vec_id < 8")
    exact = {(r["query_id"], r["neighbor_id"]): r["rank"]
             for r in cosine_topk(emb, q, k=3).collect()}
    ann = {(r["query_id"], r["neighbor_id"]): r["rank"]
           for r in lsh_topk(emb, q, k=3).collect()}
    exp = {}
    for key in set(exact) | set(ann):
        c = (1_000_000 // (60 + exact[key]) if key in exact else 0) + (
            1_000_000 // (60 + ann[key]) if key in ann else 0
        )
        exp[key] = (int(key in exact), int(key in ann), c)
    got = {(r["query_id"], r["neighbor_id"]): (r["in_exact"], r["in_ann"], r["rrf_e6"])
           for r in sim_rrf(spark, d).collect()}
    assert got == exp
    # both sources genuinely contribute on this corpus
    assert any(v[0] and not v[1] for v in got.values()) or any(
        v[1] and not v[0] for v in got.values()
    )
    assert any(v[0] and v[1] for v in got.values())


def test_label_centroids_exact_quantized_sums(spark, tmp_path):
    """sim_label_centroids equals a numpy transcription of the
    quantize-then-sum rule (floor to 1e-6 per component BEFORE the
    sum), including negative-mean cells where floor(sum/n) must floor
    toward -inf on both engines."""
    import os

    from denrl_spark.plans.driver_queries import sim_label_centroids

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(scale=0.5, size=64)], i % 3)
        for i in range(30)
    ]
    d = str(tmp_path / "cent")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    import math

    exp = {}
    for _, emb, lab in rows:
        for dim, x in enumerate(emb):
            e6 = math.floor(1_000_000 * float(np.float32(x)))
            k = (lab, dim)
            s, n = exp.get(k, (0, 0))
            exp[k] = (s + e6, n + 1)
    got = {(r["label"], r["dim"]): r for r in sim_label_centroids(spark, d).collect()}
    assert set(got) == set(exp)
    neg_seen = False
    for k, (s, n) in exp.items():
        r = got[k]
        assert (r["sum_e6"], r["n"]) == (s, n)
        assert r["mean_e6"] == math.floor(s / n)
        neg_seen = neg_seen or s < 0
    assert neg_seen  # the floor-toward--inf branch is actually exercised


def test_centroid_outliers_flags_planted_noise(spark, tmp_path):
    """sim_centroid_outliers ranks a planted far-from-centroid vector
    first in its class, and d2 matches the numpy transcription of the
    quantize-then-diff rule against the floored integer centroid."""
    import math
    import os

    from denrl_spark.plans.driver_queries import sim_centroid_outliers

    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        v = rng.normal(scale=0.1, size=64)
        if i == 7:
            v = v + 3.0  # planted outlier in label 7 % 2 = 1
        rows.append((i, [float(x) for x in v], i % 2))
    d = str(tmp_path / "outl")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    got = sim_centroid_outliers(spark, d).collect()
    by_label = {}
    for r in got:
        by_label.setdefault(r["label"], []).append(r)
    assert by_label[1][0]["vec_id"] == 7 or any(
        r["vec_id"] == 7 and r["rank"] == 1 for r in by_label[1]
    )

    # transcription of d2 for the flagged rows
    q = {
        vid: [math.floor(1_000_000 * float(np.float32(x))) for x in emb]
        for vid, emb, _ in rows
    }
    cent = {}
    for vid, emb, lab in rows:
        for dim in range(64):
            k = (lab, dim)
            s, n = cent.get(k, (0, 0))
            cent[k] = (s + q[vid][dim], n + 1)
    mean = {k: math.floor(s / n) for k, (s, n) in cent.items()}
    for r in got:
        lab = r["label"]
        d2 = sum((q[r["vec_id"]][dim] - mean[(lab, dim)]) ** 2 for dim in range(64))
        assert r["d2"] == d2


def test_knn_probe_majority_and_accuracy(spark, tmp_path):
    """sim_knn_probe on a 3-cluster corpus: in-cluster neighbors
    dominate the vote so per-label accuracy is 1.0; a deliberately
    mislabeled probe drops exactly its own label's accuracy."""
    import os

    from denrl_spark.plans.driver_queries import sim_knn_probe

    rng = np.random.default_rng(3)
    base = rng.normal(size=(3, 64)) * 4
    rows = []
    for i in range(24):
        v = base[i % 3] + rng.normal(scale=0.05, size=64)
        lab = i % 3
        if i == 9:            # probe 9 sits in cluster 0 but claims label 2
            lab = 2
        rows.append((i, [float(x) for x in v], lab))
    d = str(tmp_path / "knn")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    got = {r["label"]: r for r in sim_knn_probe(spark, d).collect()}
    # probes are vec_id < 32 -> all 24 rows; labels 0/1 fully correct
    assert got[0]["acc_e6"] == 1_000_000
    assert got[1]["acc_e6"] == 1_000_000
    # label 2's probe set contains the planted mislabel, which the
    # cluster-0 neighborhood votes down
    assert got[2]["n_correct"] == got[2]["n_queries"] - 1
    assert got[2]["acc_e6"] < 1_000_000
    assert sum(r["n_queries"] for r in got.values()) == 24


def test_norm_profile_buckets_and_zero_vector(spark, tmp_path):
    """sim_norm_profile: exact log2 buckets of the quantized norm2,
    the planted zero vector lands in the sentinel -1 bucket, and
    per-bucket counts reconcile with a numpy transcription."""
    import math
    import os

    from denrl_spark.plans.driver_queries import sim_norm_profile

    rng = np.random.default_rng(13)
    rows = [(i, [float(x) for x in rng.normal(scale=0.3, size=64)], 0)
            for i in range(10)]
    rows.append((99, [0.0] * 64, 0))          # degenerate vector
    rows.append((98, [4.0] * 64, 0))          # large-norm mode
    d = str(tmp_path / "norm")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    exp: dict = {}
    for _, emb, _ in rows:
        n2 = sum(math.floor(1_000_000 * float(np.float32(x))) ** 2 for x in emb)
        b = -1 if n2 == 0 else n2.bit_length() - 1
        n, lo, hi = exp.get(b, (0, None, None))
        exp[b] = (n + 1, n2 if lo is None else min(lo, n2),
                  n2 if hi is None else max(hi, n2))
    got = {r["log2_bucket"]: (r["n_vecs"], r["min_norm2"], r["max_norm2"])
           for r in sim_norm_profile(spark, d).collect()}
    assert got == exp
    assert -1 in got and got[-1] == (1, 0, 0)


def test_registered_recall_evals_reconcile(spark):
    """The three registered index evals (LSH / IVF / PQ) reconcile
    with a direct set comparison of their index's top-k against exact
    top-k on the real sf0.01 tables — the eval query IS the recall
    measurement, not an independent estimate."""
    from denrl_spark.functions.similarity import ivf_topk, pq_adc_topk
    from denrl_spark.plans.driver_queries import (
        sim_ivf_recall,
        sim_pq_recall,
    )

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.where("vec_id < 8")
    exact = {}
    for r in cosine_topk(emb, q, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    for fn, index in (
        (sim_ivf_recall, ivf_topk(emb, q, k=3)),
        (sim_pq_recall, pq_adc_topk(emb)),
    ):
        got = {r["query_id"]: r for r in fn(spark, sf).collect()}
        ann = {}
        for r in index.select("query_id", "neighbor_id").collect():
            ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert set(got) == set(exact)
        for qid, ex in exact.items():
            hit = len(ex & ann.get(qid, set()))
            r = got[qid]
            assert (r["k_exact"], r["n_hit"]) == (len(ex), hit)
            assert r["recall_ppm"] == (1_000_000 * hit) // len(ex)
