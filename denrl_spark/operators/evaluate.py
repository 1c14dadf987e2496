"""Triple-set evaluation (E4): P/R/F1 + error taxonomy as Spark joins.

Re-expresses ``_common_cal`` + ``compute_metrics``
(run_jointmodel.py:959-1125) relationally:

- TP(tag)    = # pred rows whose full triple exists in the label set for
  the same sentence — pred duplicates each count, label duplicates don't
  (reference: ``[ent for ent in preds if ent in labels]``) -> left-semi
  join of preds (with duplicates) against ``labels.distinct()``.
- TP(notag)  = same with ``ent1_tag`` removed (the reference pops it,
  run_jointmodel.py:1000-1007).
- error taxonomy = inner join preds x labels on (sent_id, ent1) filtered
  to non-identical pairs (the reference's "corresponding pair" loop,
  967-996), aggregated with conditional sums. Quirks preserved:
  ``ent_mention_f`` is structurally 0 (guarded by ent1 equality) and
  ``re_mention_f``'s ``!= tuple()`` guard is always true on strings.
- P = TP/Pos, R = TP/Neg, F1 harmonic (1060-1096); avg triple-list
  lengths are divided by the number of evaluated sentences (empty
  sentences emit no triple rows, so the caller passes sentence counts).

Everything is count-aggregations over two joins; at cluster scale both
joins shuffle on (sent_id, ...) keys and AQE handles sentence skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_COLS = ["sent_id", "ent1", "ent1_tag", "ent2", "ent2_tag"]


def triple_metrics(
    preds: DataFrame,
    labels: DataFrame,
    n_pred_sents: int | None = None,
    n_label_sents: int | None = None,
) -> dict:
    """Compute the reference's eval dict from two triple DataFrames.

    Exactly THREE Spark jobs regardless of how expensive the inputs are
    to produce: one localCheckpoint per input (materializes the triples
    once, truncating any upstream extraction DAG so callers need not
    remember to cache), then ONE action over the cross-joined single-row
    aggregates (counts, both TP semi-join counts, the error-taxonomy
    sums, and the per-side sentence counts all collapse into one job)."""
    preds = preds.select(*TRIPLE_COLS).localCheckpoint()
    labels = labels.select(*TRIPLE_COLS).localCheckpoint()

    p_agg = preds.agg(
        F.count(F.lit(1)).alias("pos"),
        F.countDistinct("sent_id").alias("pred_sents"),
    )
    l_agg = labels.agg(
        F.count(F.lit(1)).alias("neg"),
        F.countDistinct("sent_id").alias("label_sents"),
    )
    notag = [c for c in TRIPLE_COLS if c != "ent1_tag"]
    tp_tag_agg = (
        preds.join(labels.distinct(), TRIPLE_COLS, "left_semi")
        .agg(F.count(F.lit(1)).alias("tp_tag"))
    )
    tp_notag_agg = (
        preds.select(*notag)
        .join(labels.select(*notag).distinct(), notag, "left_semi")
        .agg(F.count(F.lit(1)).alias("tp_notag"))
    )

    p = preds.alias("p")
    l = labels.alias("l")  # noqa: E741
    pairs = p.join(
        l,
        (F.col("p.sent_id") == F.col("l.sent_id"))
        & (F.col("p.ent1") == F.col("l.ent1")),
        "inner",
    ).where(
        ~(
            (F.col("p.ent1_tag") == F.col("l.ent1_tag"))
            & (F.col("p.ent2") == F.col("l.ent2"))
            & (F.col("p.ent2_tag") == F.col("l.ent2_tag"))
        )
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    pair_agg = pairs.agg(
        F.count(F.lit(1)).alias("false_tag"),
        cnt(
            (F.col("p.ent1_tag") != F.col("l.ent1_tag"))
            & (F.col("p.ent1_tag") != "None")
            & (F.col("l.ent1_tag") != "None")
        ).alias("ent_tag_f"),
        cnt(F.col("p.ent2") != F.col("l.ent2")).alias("re_mention_f"),
        cnt(
            (F.col("p.ent2_tag") != F.col("l.ent2_tag"))
            & (F.col("p.ent2_tag") == "None")
        ).alias("re_fn"),
        cnt(
            (F.col("p.ent2_tag") != F.col("l.ent2_tag"))
            & (F.col("p.ent2_tag") != "None")
            & (F.col("l.ent2_tag") == "None")
        ).alias("re_fp"),
        cnt(
            (F.col("p.ent2_tag") != F.col("l.ent2_tag"))
            & (F.col("p.ent2_tag") != "None")
            & (F.col("l.ent2_tag") != "None")
        ).alias("re_tag_f"),
    )

    row = (
        p_agg.crossJoin(l_agg)
        .crossJoin(tp_tag_agg)
        .crossJoin(tp_notag_agg)
        .crossJoin(pair_agg)
        .collect()[0]
    )
    pos, neg = row["pos"], row["neg"]
    tp_tag, tp_notag = row["tp_tag"], row["tp_notag"]
    pred_f = row["false_tag"] or 0

    def ratio(a, b):
        return a / b if b else 0.0

    pre_notag, rec_notag = ratio(tp_notag, pos), ratio(tp_notag, neg)
    pre_tag, rec_tag = ratio(tp_tag, pos), ratio(tp_tag, neg)

    def f1(p_, r_):
        return 2 * p_ * r_ / (p_ + r_) if (p_ or r_) else 0.0

    n_pred_sents = n_pred_sents or row["pred_sents"]
    n_label_sents = n_label_sents or row["label_sents"]

    return {
        "precision": pre_notag,
        "recall": rec_notag,
        "f1": f1(pre_notag, rec_notag),
        "precision(tag)": pre_tag,
        "recall(tag)": rec_tag,
        "f1(tag)": f1(pre_tag, rec_tag),
        "ent_mention_fr": 0.0,  # structurally zero in the reference too
        "ent_tag_fr": ratio(row["ent_tag_f"] or 0, pred_f),
        "re_mention_fr": ratio(row["re_mention_f"] or 0, pred_f),
        "re_fpr": ratio(row["re_fp"] or 0, pred_f),
        "re_fnr": ratio(row["re_fn"] or 0, pred_f),
        "re_tag_fr": ratio(row["re_tag_f"] or 0, pred_f),
        "avg_pred_len": ratio(pos, n_pred_sents),
        "avg_true_len": ratio(neg, n_label_sents),
        "TP_notag": tp_notag,
        "TP_tag": tp_tag,
        "Pos": pos,
        "Neg": neg,
    }


# ---------------------------------------------------------------------------
# Pure-Python oracle: straight transcription of _common_cal +
# compute_metrics aggregation (run_jointmodel.py:959-1125) for tests.
# ---------------------------------------------------------------------------

def common_cal_oracle(preds: list[dict], labels: list[dict]):
    preds = [dict(d) for d in preds]
    labels = [dict(d) for d in labels]
    n_hyp, n_ref = len(preds), len(labels)
    false_tag = re_fn = re_fp = re_tag_f = re_mention_f = ent_mention_f = ent_tag_f = 0
    tp_tag = len([e for e in preds if e in labels])
    for e1 in preds:
        for e2 in labels:
            if e1 != e2 and e1["ent1"] == e2["ent1"]:
                false_tag += 1
                if e1["ent1"] != e2["ent1"]:
                    ent_mention_f += 1
                if e1["ent1_tag"] != e2["ent1_tag"]:
                    if e1["ent1_tag"] != "None" and e2["ent1_tag"] != "None":
                        ent_tag_f += 1
                if e1["ent2"] != e2["ent2"]:
                    if e1["ent2"] != tuple() and e2["ent2"] != tuple():
                        re_mention_f += 1
                if e1["ent2_tag"] != e2["ent2_tag"]:
                    if e1["ent2_tag"] == "None" and e2["ent2_tag"] != "None":
                        re_fn += 1
                    elif e1["ent2_tag"] != "None" and e2["ent2_tag"] == "None":
                        re_fp += 1
                    else:
                        re_tag_f += 1
    for d in preds:
        d.pop("ent1_tag", None)
    for d in labels:
        d.pop("ent1_tag", None)
    tp_notag = len([e for e in preds if e in labels])
    return (
        tp_notag, tp_tag, n_hyp, n_ref, false_tag,
        ent_mention_f, ent_tag_f, re_mention_f, re_fn, re_fp, re_tag_f,
    )


def metrics_oracle(pred_sents: list[list[dict]], label_sents: list[list[dict]]) -> dict:
    agg = [0] * 11
    for hyp, ref in zip(pred_sents, label_sents):
        vals = common_cal_oracle(hyp, ref)
        agg = [a + v for a, v in zip(agg, vals)]
    (tp_notag, tp_tag, pos, neg, pred_f,
     ent_m_f, ent_tag_f, re_m_f, re_fn, re_fp, re_tag_f) = agg

    def ratio(a, b):
        return a / b if b else 0.0

    def f1(p_, r_):
        return 2 * p_ * r_ / (p_ + r_) if (p_ or r_) else 0.0

    pre_notag, rec_notag = ratio(tp_notag, pos), ratio(tp_notag, neg)
    pre_tag, rec_tag = ratio(tp_tag, pos), ratio(tp_tag, neg)
    return {
        "precision": pre_notag,
        "recall": rec_notag,
        "f1": f1(pre_notag, rec_notag),
        "precision(tag)": pre_tag,
        "recall(tag)": rec_tag,
        "f1(tag)": f1(pre_tag, rec_tag),
        "ent_mention_fr": ratio(ent_m_f, pred_f),
        "ent_tag_fr": ratio(ent_tag_f, pred_f),
        "re_mention_fr": ratio(re_m_f, pred_f),
        "re_fpr": ratio(re_fp, pred_f),
        "re_fnr": ratio(re_fn, pred_f),
        "re_tag_fr": ratio(re_tag_f, pred_f),
        "avg_pred_len": ratio(pos, len(pred_sents)),
        "avg_true_len": ratio(neg, len(label_sents)),
        "TP_notag": tp_notag,
        "TP_tag": tp_tag,
        "Pos": pos,
        "Neg": neg,
    }
