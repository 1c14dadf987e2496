"""Spark triple_metrics == pure-Python transcription of the reference
metric (run_jointmodel.py:959-1125) on perturbed prediction sets."""

import math

from denrl_spark.operators.evaluate import metrics_oracle, triple_metrics

LABELS = {
    1: [
        {"ent1": "alice", "ent1_tag": "PERSON", "ent2": "paris", "ent2_tag": "/p/lived"},
        {"ent1": "paris", "ent1_tag": "LOCATION", "ent2": "alice", "ent2_tag": "PERSON"},
    ],
    2: [
        {"ent1": "bob", "ent1_tag": "PERSON", "ent2": "", "ent2_tag": "None"},
    ],
    3: [
        {"ent1": "acme", "ent1_tag": "ORG", "ent2": "tokyo", "ent2_tag": "/b/founded"},
        {"ent1": "acme", "ent1_tag": "ORG", "ent2": "tokyo", "ent2_tag": "/b/founded"},
    ],
}

PREDS = {
    1: [
        {"ent1": "alice", "ent1_tag": "PERSON", "ent2": "paris", "ent2_tag": "/p/lived"},
        # wrong relation tag -> corresponding-pair error
        {"ent1": "paris", "ent1_tag": "LOCATION", "ent2": "alice", "ent2_tag": "/x/y"},
    ],
    2: [
        # wrong ent1_tag, matches notag variant only
        {"ent1": "bob", "ent1_tag": "ORG", "ent2": "", "ent2_tag": "None"},
        # spurious prediction
        {"ent1": "zed", "ent1_tag": "PERSON", "ent2": "", "ent2_tag": "None"},
    ],
    3: [
        {"ent1": "acme", "ent1_tag": "ORG", "ent2": "tokyo", "ent2_tag": "/b/founded"},
        # relation false negative (pred None, label not)
        {"ent1": "acme", "ent1_tag": "ORG", "ent2": "", "ent2_tag": "None"},
    ],
}


def to_df(spark, by_sent):
    rows = [
        (sid, d["ent1"], d["ent1_tag"], d["ent2"], d["ent2_tag"])
        for sid, ds in by_sent.items()
        for d in ds
    ]
    return spark.createDataFrame(
        rows, "sent_id long, ent1 string, ent1_tag string, ent2 string, ent2_tag string"
    )


def test_metrics_match_oracle(spark):
    got = triple_metrics(
        to_df(spark, PREDS), to_df(spark, LABELS), n_pred_sents=3, n_label_sents=3
    )
    exp = metrics_oracle(
        [PREDS[k] for k in sorted(PREDS)], [LABELS[k] for k in sorted(LABELS)]
    )
    for k, v in exp.items():
        assert math.isclose(got[k], v, abs_tol=1e-12), (k, got[k], v)


def test_metrics_computes_upstream_exactly_once(spark):
    """triple_metrics consumes preds/labels in ~7 aggregate branches; it
    must materialize each input ONCE (localCheckpoint) instead of
    re-running the upstream DAG per branch. Instrumented with an
    accumulator inside an upstream mapInPandas: the final count equals
    the row count exactly, not a multiple of it."""
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    schema = "sent_id long, ent1 string, ent1_tag string, ent2 string, ent2_tag string"
    preds = to_df(spark, PREDS).mapInPandas(counting, schema)
    m = triple_metrics(preds, to_df(spark, LABELS))
    assert m["Pos"] == 6 and m["Neg"] == 5
    assert acc.value == 6, f"upstream ran {acc.value / 6:.1f}x (expected once)"


def test_metrics_sentence_counts_derived(spark):
    # when the caller omits sentence counts they come from the same
    # single aggregate (no extra distinct-count jobs)
    got = triple_metrics(to_df(spark, PREDS), to_df(spark, LABELS))
    assert math.isclose(got["avg_pred_len"], 6 / 3)
    assert math.isclose(got["avg_true_len"], 5 / 3)


def test_identical_sets_perfect():
    exp = metrics_oracle([LABELS[k] for k in sorted(LABELS)], [LABELS[k] for k in sorted(LABELS)])
    assert exp["precision"] == exp["recall"] == exp["f1"] == 1.0


def test_duplicate_pred_counts_each():
    preds = [[LABELS[3][0], LABELS[3][0], LABELS[3][0]]]
    labels = [[LABELS[3][0]]]
    m = metrics_oracle(preds, labels)
    assert m["TP_tag"] == 3 and m["Pos"] == 3 and m["Neg"] == 1
