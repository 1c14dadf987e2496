"""ANN parameter-sensitivity sweep (VERDICT r2 #9): measured recall of
the approximate operators vs their tuning dials on the deterministic
clustered near-dup fixture (same construction as tests/test_similarity),
so the 100 TB operators ship with tuning guidance, not a single passing
point. Prints a markdown table; results are recorded in SCALE.md.

Usage: python tools/ann_sensitivity.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def clustered_df(spark):
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for _ in range(40):
        base = rng.randn(DIM)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.randn(DIM) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def main() -> None:
    from pyspark.sql import functions as F

    from denrl_spark.functions.similarity import cosine_topk, ivf_topk, lsh_topk
    from denrl_spark.session import get_spark

    spark = get_spark(8, app_name="ann_sweep",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    e = clustered_df(spark)
    queries = e.where("vec_id % 3 = 0").cache()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, queries, k=2).collect()
    }

    print("### hyperplane LSH top-k (k=2, clustered fixture, exact baseline = brute force)")
    print()
    print("| n_planes | probe_bits | probes/query | recall |")
    print("|---|---|---|---|")
    for n_planes in (4, 6, 8):
        for probe_bits in (0, 1, 2):
            approx = {
                (r["query_id"], r["neighbor_id"])
                for r in lsh_topk(
                    e, queries, k=2, n_planes=n_planes, probe_bits=probe_bits
                ).collect()
            }
            recall = len(exact & approx) / len(exact)
            n_probe = 1 + (n_planes if probe_bits >= 1 else 0) + (
                n_planes * (n_planes - 1) // 2 if probe_bits >= 2 else 0
            )
            print(f"| {n_planes} | {probe_bits} | {n_probe} | {recall:.3f} |")

    print()
    print("### IVF-flat top-k (k=2, same fixture/baseline)")
    print()
    print("| n_centroids | nprobe | recall |")
    print("|---|---|---|")
    for n_centroids in (8, 16):
        for nprobe in (1, 2, 4):
            approx = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_topk(
                    e, queries, k=2, n_centroids=n_centroids, nprobe=nprobe
                ).collect()
            }
            recall = len(exact & approx) / len(exact)
            print(f"| {n_centroids} | {nprobe} | {recall:.3f} |")

    print()
    print("### IVF with Lloyd refinement (n_centroids=8)")
    print()
    print("| n_centroids | nprobe | refine_iters | recall |")
    print("|---|---|---|---|")
    for nprobe in (1, 2, 4):
        for it in (0, 3):
            approx = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_topk(
                    e, queries, k=2, n_centroids=8, nprobe=nprobe, refine_iters=it
                ).collect()
            }
            recall = len(exact & approx) / len(exact)
            print(f"| 8 | {nprobe} | {it} | {recall:.3f} |")

    spark.stop()


if __name__ == "__main__":
    main()
