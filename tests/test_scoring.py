"""Frozen scorer, Viterbi decode, target attention, KL confidence."""

import itertools

import math
import numpy as np

from pyspark.sql import functions as F

from denrl_spark.operators.attention import (
    target_att_py,
    with_kl_confidence,
    with_target_att,
)
from denrl_spark.operators.evaluate import triple_metrics
from denrl_spark.operators.patterns import extract_patterns, relation_bow, topk_patterns
from denrl_spark.operators.scoring import (
    bio_transitions,
    build_label_list,
    score_instances,
    viterbi_batch,
)
from denrl_spark.operators.spans import assemble_triples
from denrl_spark.operators.tagging import build_instances
from denrl_spark.sources.corpus import transcripts
from denrl_spark.sources.kb import KB

KBD = KB.default()


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(0)
    t_, v_ = 4, 5
    trans = rng.normal(size=(v_, v_)).astype(np.float32)
    em = rng.normal(size=(3, t_, v_)).astype(np.float32)
    lengths = np.array([4, 3, 1])
    got = viterbi_batch(em, trans, lengths)
    for b in range(3):
        ln = lengths[b]
        best, best_s = None, -1e18
        for path in itertools.product(range(v_), repeat=int(ln)):
            s = em[b, 0, path[0]]
            for i in range(1, int(ln)):
                s += trans[path[i - 1], path[i]] + em[b, i, path[i]]
            if s > best_s:
                best_s, best = s, path
        assert tuple(got[b, : int(ln)]) == best


def test_bio_transitions_block_illegal():
    labels = build_label_list(KBD)
    trans = bio_transitions(labels)
    li = {l: i for i, l in enumerate(labels)}
    assert trans[li["O"], li["I-PERSON"]] < -1e6
    assert trans[li["B-PERSON"], li["I-PERSON"]] == 0
    assert trans[li["B-LOCATION"], li["I-PERSON"]] < -1e6
    assert trans[li["I-PERSON"], li["I-PERSON"]] == 0


def test_target_att_py_semantics():
    toks = "alice johnson lived near new york".split()
    tags = ["B-PERSON", "I-PERSON", "O", "O", "B-/p/l", "I-/p/l"]
    bow = {"/p/l": {"lived", "near"}}
    att = target_att_py(toks, tags, 1, bow)
    # entity tokens (0,1) + bow tokens (2,3); relation-tagged tokens are NOT
    # entity evidence ('/'-tags excluded) -> 4 hits, each 0.25
    assert att == [0.25, 0.25, 0.25, 0.25, 0.0, 0.0]
    # negative instance -> zeros
    assert target_att_py(toks, tags, -5, bow) == [0.0] * 6
    # no relations -> entity indicator only
    att2 = target_att_py(toks, ["B-PERSON", "I-PERSON", "O", "O", "O", "O"], 1, bow)
    assert att2 == [0.5, 0.5, 0.0, 0.0, 0.0, 0.0]


def test_kl_confidence_jvm_matches_python(spark):
    rows = [
        ([0.5, 0.5, 0.0], [0.4, 0.4, 0.2]),
        ([0.0, 0.0, 0.0], [0.3, 0.3, 0.4]),  # zero target -> kl 0, conf 1
    ]
    df = spark.createDataFrame(rows, "target_att array<double>, position_att array<double>")
    got = with_kl_confidence(df).select("kl_loss", "confidence", "selected").collect()
    exp0 = sum(t * (math.log(t) - math.log(p)) for t, p in zip(*rows[0]) if t > 0)
    assert math.isclose(got[0]["kl_loss"], exp0, rel_tol=1e-9)
    assert math.isclose(got[0]["confidence"], 1 / (1 + exp0), rel_tol=1e-9)
    assert got[1]["kl_loss"] == 0.0 and got[1]["confidence"] == 1.0 and got[1]["selected"]


def test_scored_predictions_match_reference_triples(spark):
    """North-rule gate: predicted triples vs gold-path triples P/R >= 0.95
    (expected 1.0 on the deterministic corpus)."""
    tr = transcripts(spark, 60, seed=42)
    ins = build_instances(tr, KBD).cache()
    raw = extract_patterns(ins)
    bow_rows = relation_bow(topk_patterns(raw)).collect()
    bow: dict = {}
    for r in bow_rows:
        bow.setdefault(r["relation"], set()).add(r["token"])
    scored = score_instances(ins, KBD, bow).cache()
    # decoded tags reproduce gold tags on this corpus
    mism = scored.where(
        F.col("pred_tags").cast("string") != F.col("ner_tags").cast("string")
    ).count()
    assert mism == 0
    pred_trips = assemble_triples(scored, tags_col="pred_tags")
    gold_trips = assemble_triples(scored, tags_col="ner_tags")
    m = triple_metrics(pred_trips, gold_trips)
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95
    # position attention is a proper distribution
    bad = scored.where(
        F.abs(
            F.aggregate("position_att", F.lit(0.0).cast("double"), lambda a, x: a + x)
            - 1.0
        )
        > 1e-3
    ).count()
    assert bad == 0


def test_with_target_att_spark_matches_py(spark):
    tr = transcripts(spark, 20, seed=9)
    ins = build_instances(tr, KBD)
    bow = {"/people/person/place_lived": {"lived", "near"}}
    rows = with_target_att(ins, bow).collect()
    for r in rows[:50]:
        exp = target_att_py(list(r["tokens"]), list(r["ner_tags"]), r["instance_id"], bow)
        got = [round(float(x), 6) for x in r["target_att"]]
        assert got == [round(x, 6) for x in exp]


def test_viterbi_mask_fastpath_equals_dense():
    rng = np.random.default_rng(7)
    labels = build_label_list(KBD)
    trans = bio_transitions(labels)
    v_ = len(labels)
    em = rng.normal(size=(16, 12, v_)).astype(np.float32) * 3
    lengths = rng.integers(1, 13, size=16)
    got = viterbi_batch(em, trans, lengths)
    # dense reference recursion (the pre-optimization formula)
    b, t = em.shape[0], em.shape[1]
    score = em[:, 0, :].copy()
    back = np.zeros((b, t, v_), dtype=np.int64)
    for step in range(1, t):
        cand = score[:, :, None] + trans[None, :, :]
        bp = cand.argmax(axis=1)
        bs = np.take_along_axis(cand, bp[:, None, :], axis=1)[:, 0, :]
        ns = bs + em[:, step, :]
        act = (step < lengths)[:, None]
        score = np.where(act, ns, score)
        back[:, step, :] = np.where(act, bp, 0)
    for i in range(b):
        ln = int(lengths[i])
        cur = int(score[i].argmax())
        path = []
        for step in range(ln - 1, -1, -1):
            path.append(cur)
            if step > 0:
                cur = int(back[i, step, cur])
        assert list(got[i, :ln]) == path[::-1]


def test_target_att_ent_bow_branch():
    toks = "near alice johnson today".split()
    tags = ["O", "B-PERSON", "I-PERSON", "O"]
    # without ent_bow: entity indicator only
    assert target_att_py(toks, tags, 1, {}, None, 1) == [0.0, 0.5, 0.5, 0.0]
    # with ent_bow for PERSON containing 'near': that token joins the mass
    got = target_att_py(toks, tags, 1, {}, {"PERSON": {"near"}}, 1)
    assert got == [1 / 3, 1 / 3, 1 / 3, 0.0]


# ---------------------------------------------------------------------------
# K4/K5 CRF NLL kernels vs brute-force path enumeration
# (models/crf/crf.py:16-103, models/crf/partial_crf.py:22-126)
# ---------------------------------------------------------------------------

def _enum_logsumexp(em, trans, length, allowed=None):
    """log sum over all tag paths of length ``length`` (optionally
    restricted to ``allowed[t]`` tag sets) of emission+transition score."""
    v = em.shape[1]
    scores = []
    for path in itertools.product(range(v), repeat=length):
        if allowed is not None and any(p not in allowed[t] for t, p in enumerate(path)):
            continue
        s = sum(em[t, p] for t, p in enumerate(path))
        s += sum(trans[path[t], path[t + 1]] for t in range(length - 1))
        scores.append(s)
    m = max(scores)
    return m + math.log(sum(math.exp(s - m) for s in scores))


def _path_score(em, trans, path):
    s = sum(em[t, p] for t, p in enumerate(path))
    return s + sum(trans[path[t], path[t + 1]] for t in range(len(path) - 1))


def test_crf_nll_matches_enumeration():
    from denrl_spark.operators.scoring import crf_nll_batch

    rng = np.random.RandomState(3)
    b, t, v = 4, 4, 3
    em = rng.randn(b, t, v).astype(np.float32)
    trans = (rng.randn(v, v) * 0.5).astype(np.float32)
    lengths = np.array([4, 3, 2, 1])
    tags = rng.randint(0, v, size=(b, t))
    nll = crf_nll_batch(em, trans, lengths, tags)
    for i in range(b):
        ln = int(lengths[i])
        logz = _enum_logsumexp(em[i].astype(np.float64), trans.astype(np.float64), ln)
        gold = _path_score(
            em[i].astype(np.float64), trans.astype(np.float64), list(tags[i, :ln])
        )
        assert math.isclose(nll[i], logz - gold, rel_tol=1e-5, abs_tol=1e-5)


def test_partial_crf_nll_matches_enumeration():
    from denrl_spark.operators.scoring import partial_crf_nll_batch

    rng = np.random.RandomState(11)
    b, t, v = 3, 4, 3
    em = rng.randn(b, t, v).astype(np.float32)
    trans = (rng.randn(v, v) * 0.5).astype(np.float32)
    lengths = np.array([4, 3, 2])
    # pin one tag at observed positions, allow all at unlabeled ones
    possible = np.ones((b, t, v), dtype=bool)
    possible[0, 1, :] = [True, False, False]
    possible[0, 3, :] = [False, True, False]
    possible[1, 0, :] = [False, False, True]
    nll = partial_crf_nll_batch(em, trans, lengths, possible)
    for i in range(b):
        ln = int(lengths[i])
        allowed = [
            {j for j in range(v) if possible[i, step, j]} for step in range(ln)
        ]
        logz = _enum_logsumexp(em[i].astype(np.float64), trans.astype(np.float64), ln)
        num = _enum_logsumexp(
            em[i].astype(np.float64), trans.astype(np.float64), ln, allowed
        )
        assert math.isclose(nll[i], logz - num, rel_tol=1e-5, abs_tol=1e-5)


def test_partial_crf_nll_fully_unlabeled_is_zero():
    from denrl_spark.operators.scoring import partial_crf_nll_batch

    rng = np.random.RandomState(5)
    em = rng.randn(2, 3, 4).astype(np.float32)
    trans = rng.randn(4, 4).astype(np.float32)
    lengths = np.array([3, 2])
    possible = np.ones((2, 3, 4), dtype=bool)
    nll = partial_crf_nll_batch(em, trans, lengths, possible)
    assert np.allclose(nll, 0.0, atol=1e-6)


def test_crf_logz_consistent_with_forward_backward():
    # the alpha recursion inside forward_backward_batch and crf_logz_batch
    # must agree on the partition function
    from denrl_spark.operators.scoring import crf_logz_batch

    rng = np.random.RandomState(9)
    b, t, v = 3, 5, 4
    em = rng.randn(b, t, v).astype(np.float32)
    lengths = np.array([5, 4, 2])
    labels = ["O", "B-X", "I-X", "B-Y"]
    trans = bio_transitions(labels)
    logz = crf_logz_batch(em, trans, lengths)
    for i in range(b):
        ln = int(lengths[i])
        ref = _enum_logsumexp(em[i].astype(np.float64), trans.astype(np.float64), ln)
        assert math.isclose(logz[i], ref, rel_tol=1e-5, abs_tol=1e-5)


def test_combined_loss_matches_manual():
    # K12: crf_nll + beta * KL(sum)(log(att), target) with xlogy semantics
    from denrl_spark.operators.scoring import combined_loss_batch, crf_nll_batch

    rng = np.random.RandomState(21)
    b, t, v = 3, 4, 3
    em = rng.randn(b, t, v).astype(np.float32)
    trans = (rng.randn(v, v) * 0.5).astype(np.float32)
    lengths = np.array([4, 3, 2])
    tags = rng.randint(0, v, size=(b, t))
    att = rng.rand(b, t) + 0.1
    att /= att.sum(axis=1, keepdims=True)
    tgt = np.zeros((b, t))
    for i in range(b):
        ln = int(lengths[i])
        w = rng.rand(ln)
        tgt[i, :ln] = w / w.sum()
    tgt[1, 0] = 0.0  # exercise the 0*log0 == 0 convention
    if tgt[1].sum():
        tgt[1] /= tgt[1].sum()

    nll = crf_nll_batch(em, trans, lengths, tags)
    got = combined_loss_batch(em, trans, lengths, tags, att, tgt, beta=0.7)
    for i in range(b):
        kl = sum(
            tgt[i, j] * (math.log(tgt[i, j]) - math.log(att[i, j]))
            for j in range(int(lengths[i]))
            if tgt[i, j] > 0
        )
        assert math.isclose(got[i], nll[i] + 0.7 * kl, rel_tol=1e-9, abs_tol=1e-9)
    # beta == 0 short-circuits to the pure NLL (reference branch)
    assert np.allclose(combined_loss_batch(em, trans, lengths, tags, att, tgt, 0.0), nll)
