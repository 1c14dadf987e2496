"""As-of join twins: window formulation == cogroup/merge_asof formulation
== brute-force pandas oracle (backward, strictly-earlier matches)."""

import pandas as pd

from pyspark.sql import functions as F

from denrl_spark.operators.asof import asof_join_cogroup, asof_join_window


def _fixture(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "e1"), ("u1", 20, "e2"), ("u1", 20, "e3"),
            ("u2", 5, "e4"), ("u2", 50, "e5"), ("u3", 7, "e6"),
        ],
        "user_id string, t long, event_id string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 5, 100), ("u1", 20, 200), ("u1", 15, 150),
            ("u2", 50, 500), ("u2", 4, 400),
        ],
        "user_id string, t long, rv long",
    )
    return left, right


def _oracle(left_rows, right_rows):
    out = {}
    for u, lt, eid in left_rows:
        cands = [(rt, rv) for (ru, rt, rv) in right_rows if ru == u and rt < lt]
        out[eid] = max(cands)[1] if cands else None
    return out


def test_asof_twins_match_oracle(spark):
    left, right = _fixture(spark)
    exp = _oracle(
        [(r["user_id"], r["t"], r["event_id"]) for r in left.collect()],
        [(r["user_id"], r["t"], r["rv"]) for r in right.collect()],
    )
    for fn in (asof_join_window, asof_join_cogroup):
        got = {r["event_id"]: r["rv"] for r in fn(left, right).collect()}
        assert got == exp, (fn.__name__, got, exp)
    # strictly-earlier semantics: u1@20 must take rv from t=15 (150),
    # never the exact-match t=20
    assert exp["e2"] == 150 and exp["e3"] == 150
    # prior row at t=4 matches u2@5; u3 has no right rows at all -> null
    assert exp["e4"] == 400 and exp["e6"] is None


def test_asof_duplicate_right_ties_and_dtypes(spark):
    """Duplicate right rows at the same (by, t) resolve deterministically
    to the MAX value in both variants (ADVICE r2), and the value dtype
    is derived from the right frame rather than hard-coded long."""
    left = spark.createDataFrame(
        [("u1", 10, "e1"), ("u1", 3, "e2")], "user_id string, t long, event_id string"
    )
    right_dup = spark.createDataFrame(
        [("u1", 5, 7), ("u1", 5, 9), ("u1", 5, 8)],
        "user_id string, t long, rv int",  # int, not long: dtype derived
    )
    for fn in (asof_join_window, asof_join_cogroup):
        got = fn(left, right_dup).collect()
        vals = {r["event_id"]: r["rv"] for r in got}
        assert vals == {"e1": 9, "e2": None}, fn.__name__
        assert dict(fn(left, right_dup).dtypes)["rv"] == "int", fn.__name__
    # non-integral value column (double) round-trips both variants
    right_d = spark.createDataFrame(
        [("u1", 5, 2.5), ("u1", 6, 1.25)], "user_id string, t long, rv double"
    )
    for fn in (asof_join_window, asof_join_cogroup):
        vals = {r["event_id"]: r["rv"] for r in fn(left, right_d).collect()}
        assert vals == {"e1": 1.25, "e2": None}, fn.__name__


def test_asof_twins_match_on_events_table(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
        "event_id",
        "event_type",
    )
    left = ev.where("event_type = 'error'").select("user_id", "t", "event_id")
    right = (
        ev.where("event_type = 'click'")
        .groupBy("user_id", "t")
        .agg(F.min(F.xxhash64("event_id")).alias("rv"))
    )
    a = {r["event_id"]: r["rv"] for r in asof_join_window(left, right).collect()}
    b = {r["event_id"]: r["rv"] for r in asof_join_cogroup(left, right).collect()}
    assert a == b and len(a) > 0


def test_asof_null_right_values_ignored(spark):
    """Null right values can never be the as-of result in either
    variant: the match is the latest strictly-earlier NON-NULL value
    (module docstring contract)."""
    left = spark.createDataFrame(
        [("u1", 10, "e1")], "user_id string, t long, event_id string"
    )
    right = spark.createDataFrame(
        [("u1", 5, None), ("u1", 3, 7)], "user_id string, t long, rv int"
    )
    for fn in (asof_join_window, asof_join_cogroup):
        vals = {r["event_id"]: r["rv"] for r in fn(left, right).collect()}
        assert vals == {"e1": 7}, fn.__name__  # null at t=5 skipped
    right_all_null = spark.createDataFrame(
        [("u1", 5, None)], "user_id string, t long, rv int"
    )
    for fn in (asof_join_window, asof_join_cogroup):
        vals = {r["event_id"]: r["rv"] for r in fn(left, right_all_null).collect()}
        assert vals == {"e1": None}, fn.__name__
