"""End-to-end pipeline report + sources/sinks round-trips."""

from pyspark.sql import functions as F

from denrl_spark.operators.tagging import build_instances
from denrl_spark.plans.pipeline import length_partition, run_kg_pipeline
from denrl_spark.sources.corpus import transcripts
from denrl_spark.sources.io import (
    read_instances_jsonl,
    write_instances_jsonl,
    write_predictions_txt,
    write_triples_csv,
)
from denrl_spark.sources.kb import KB

KBD = KB.default()


def test_pipeline_meets_north_rule(spark, tmp_path):
    report = run_kg_pipeline(
        spark,
        n_convs=40,
        seed=42,
        bootstrap_rounds=1,
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
    )
    assert report["precision"] >= 0.95 and report["recall"] >= 0.95
    assert report["n_triples"] > 0 and report["n_edges"] > 0
    trips = spark.read.parquet(str(tmp_path / "out" / "triples"))
    assert trips.count() == report["n_triples"]


def test_jsonl_round_trip(spark, tmp_path):
    ins = build_instances(transcripts(spark, 20, seed=3), KBD)
    p = str(tmp_path / "ins_jsonl")
    write_instances_jsonl(ins, p)
    back = read_instances_jsonl(spark, p)
    a = sorted(r["instance_id"] for r in ins.select("instance_id").collect())
    b = sorted(r["instance_id"] for r in back.select("instance_id").collect())
    assert a == b
    row = back.orderBy("instance_id").first()
    assert isinstance(row["tokens"], list) and len(row["tokens"]) == len(row["ner_tags"])


def test_sinks_write(spark, tmp_path):
    import os

    from denrl_spark.sources.io import read_predictions_txt

    ins = build_instances(transcripts(spark, 10, seed=4), KBD)
    scored = ins.withColumn("pred_tags", F.col("ner_tags"))
    write_predictions_txt(scored, str(tmp_path / "preds_txt"))
    lines = spark.read.text(str(tmp_path / "preds_txt")).count()
    assert lines == ins.count()

    # multi-part output round-trips in exact reference order: part files
    # read in manifest order concatenate to the fully-sorted line list
    n_parts = len(
        [f for f in os.listdir(tmp_path / "preds_txt") if f.startswith("part-")]
    )
    assert n_parts >= 2  # genuinely distributed, no repartition(1) funnel
    expect = [
        r["value"]
        for r in scored.select(
            F.concat_ws(" ", "pred_tags").alias("value"), "sent_id", "instance_id"
        )
        .orderBy("sent_id", "instance_id")
        .collect()
    ]
    assert read_predictions_txt(str(tmp_path / "preds_txt")) == expect

    # single-file reference-parity mode still works, behind its guard
    write_predictions_txt(scored, str(tmp_path / "preds_one"), single_file=True)
    assert read_predictions_txt(str(tmp_path / "preds_one")) == expect
    import pytest as _pytest

    with _pytest.raises(ValueError, match="row guard"):
        write_predictions_txt(
            scored, str(tmp_path / "preds_guard"), single_file=True,
            single_file_max_rows=3,
        )
    from denrl_spark.operators.spans import assemble_triples

    trips = assemble_triples(ins)
    write_triples_csv(trips, str(tmp_path / "trips_csv"))
    back = spark.read.option("header", True).csv(str(tmp_path / "trips_csv"))
    assert back.count() == trips.count()


def test_length_partition_preserves_rows(spark):
    ins = build_instances(transcripts(spark, 30, seed=5), KBD).cache()
    lp = length_partition(ins, 6)
    assert lp.count() == ins.count()
    assert set(lp.columns) == set(ins.columns)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    from denrl_spark.sources.io import write_bucketed

    # warehouse dir is a static config; tables land in the session's
    # default warehouse (spark-warehouse/ under cwd) and are dropped after
    ins = build_instances(transcripts(spark, 20, seed=8), KBD)
    a = ins.select("sent_id", "instance_id")
    b = ins.select("sent_id", "query_id")
    write_bucketed(a, "bt_a", "sent_id", 4)
    write_bucketed(b, "bt_b", "sent_id", 4)
    ta, tb = spark.table("bt_a"), spark.table("bt_b")
    joined = ta.join(tb, "sent_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: the sort-merge join reads bucketed scans with no
    # Exchange (shuffle) on either side
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_glove_load_and_matrix(spark, tmp_path):
    # S3: GloVe text (tokens may contain spaces) -> aligned matrix with
    # deterministic OOV fill (run_lstm.py:367-413)
    import numpy as np

    from denrl_spark.functions.textops import build_vocab
    from denrl_spark.sources.io import embedding_matrix, read_glove_text

    dim = 4
    glove = tmp_path / "glove.txt"
    glove.write_text(
        "alice 0.1 0.2 0.3 0.4\n"
        "new york 1 2 3 4\n"      # multi-word token (840B quirk)
        "met -1 -2 -3 -4\n"
    )
    emb = read_glove_text(spark, str(glove), dim=dim)
    got = {r["token"]: r["vector"] for r in emb.collect()}
    assert got["new york"] == [1.0, 2.0, 3.0, 4.0]
    assert got["alice"] == [0.1, 0.2, 0.3, 0.4]

    docs = spark.createDataFrame(
        [(0, "alice met bob"), (1, "alice met alice")], "doc_id long, text string"
    )
    vocab = build_vocab(docs)
    w = embedding_matrix(vocab, emb, dim=dim)
    tid = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert np.allclose(w[tid["alice"]], [0.1, 0.2, 0.3, 0.4])
    assert np.allclose(w[tid["met"]], [-1, -2, -3, -4])
    # OOV ('bob') is a deterministic normal draw: same under re-run
    w2 = embedding_matrix(vocab, emb, dim=dim)
    assert np.allclose(w, w2)
    assert not np.allclose(w[tid["bob"]], 0)
    # specials (PAD=0/UNK=1) filled too
    assert not np.allclose(w[0], 0) and not np.allclose(w[1], 0)
