"""Cross-engine equality for the round-5 query family on a RANDOMIZED
adversarial fixture (seeded): short docs with heavy near-dup clusters,
events with negative / huge / sub-cent values and multi-day gaps,
clustered embeddings. The driver's check runs these queries against
the fixed testdata; this module re-runs Spark vs the registered DuckDB
oracle on a differently-shaped corpus, so a divergence that the
testdata happens to mask (fixture blind spot) still fails the suite.
Comparison = the driver's own normalize (sorted columns, stringified
objects, sorted rows)."""

from __future__ import annotations

import datetime
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from denrl_spark.plans.driver_queries import ORACLES, QUERIES

QUERY_NAMES = [
    "kg_coreness",
    "kg_modularity",
    "kg_pred_gini",
    "kg_transitive_edges",
    "text_bm25",
    "dedup_levenshtein",
    "dedup_est_vs_exact",
    "dedup_cluster_sizes",
    "dedup_rate_by_source",
    "dedup_shingle_df_profile",
    "sim_rrf",
    "sim_ivf_recall",
    "sim_pq_recall",
    "sim_knn_probe",
    "sim_label_centroids",
    "sim_centroid_outliers",
    "sim_norm_profile",
    "rel_anomaly",
    "rel_abtest",
    "rel_changepoint",
    "rel_benford",
    "rel_rolling_distinct",
    "rel_conversion_latency",
    "text_cooccur_window",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r5fix"))
    rng = np.random.default_rng(42)
    vocab = ["join", "hash", "spark", "vector", "scan", "row", "pad",
             "table", "merge", "sort"]

    docs = []
    for i in range(60):
        n = int(rng.integers(3, 25))
        words = list(rng.choice(vocab, size=n))
        if i % 5 == 0 and i > 0:       # near-dup of doc i-1 (one edit)
            words = docs[i - 1][1].split(" ")
            words = words[:-1] + ["tail%d" % i]
        docs.append(
            (i, " ".join(words), f"src{i % 3}", "en", 1)
        )
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    t0 = datetime.datetime(2024, 1, 1)
    events = []
    for i in range(400):
        et = ("view", "click", "error")[i % 3]
        # adversarial values: sub-cent, huge, exact .5 cents, and a
        # level shift in the tail
        v = [0.004, 12345.67, 0.505, 3.0, 99.0][i % 5]
        if i > 350:
            v = v * 10
        sec = int(i * 977 + (i % 7) * 86400)   # multi-day spread
        events.append((i, t0 + datetime.timedelta(seconds=sec),
                       i % 23, et, float(v), "{}"))
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))

    base = rng.normal(size=(4, 64))
    embs = []
    for i in range(40):
        v = base[i % 4] + rng.normal(scale=0.4, size=64)
        embs.append((i, [float(x) for x in v], i % 4))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def duck(fixture_dir):
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        # Spark writes a part-file DIRECTORY; DuckDB needs the glob
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{fixture_dir}/{t}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_round5_query_matches_oracle_on_random_fixture(
    spark, duck, fixture_dir, name
):
    sdf = _normalize(QUERIES[name](spark, fixture_dir).toPandas())
    odf = _normalize(duck.execute(ORACLES[name]).df())
    assert list(sdf.columns) == list(odf.columns), name
    assert len(sdf) == len(odf), name
    pd.testing.assert_frame_equal(sdf, odf)
    assert len(sdf) > 0, f"{name}: fixture produced an empty result"
