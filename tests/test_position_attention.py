"""K2 numeric kernel: the vectorized batch kernel must match a direct
per-target transcription of the reference loop
(modeling_gpt2.py:285-341 v1, 343-395 v2) on random tensors — the same
style of enumeration oracle as test_crf_nll_matches_enumeration."""

import numpy as np

from denrl_spark.operators.position_attention import (
    PositionAttentionWeights,
    hash_token_embeddings,
    position_att_numeric,
    position_attention_batch,
)


def _direct_transcription(hidden, query_ids, w, version):
    """Per-target loop exactly as the reference forward() composes it."""
    b, t, h = hidden.shape
    if isinstance(query_ids, int):
        h_p = hidden[:, query_ids, :]
    else:
        h_p = hidden[np.arange(b), np.asarray(query_ids)]
    all_at, all_ut = [], []
    for tgt in range(t):
        h_t = hidden[:, tgt, :]
        if version == 1:
            tail = h_p @ w.w_p.T + h_t @ w.w_h.T
            s = np.tanh(hidden @ w.w_big_h.T + tail[:, None, :]) @ w.v
        else:
            tail = h_p + h_t
            s = np.tanh(hidden + tail[:, None, :]) @ w.v
        e = np.exp(s - s.max(axis=1, keepdims=True))
        a = e / e.sum(axis=1, keepdims=True)
        c = (a[:, :, None] * hidden).sum(axis=1)
        all_at.append(a)
        all_ut.append(np.concatenate([h_t, c], axis=1))
    at = np.stack(all_at).transpose(1, 0, 2)  # B x T_target x T_pos
    at_pool = at.max(axis=1)
    z = at_pool.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = at_pool / z
    norm = np.nan_to_num(norm, nan=0.0)
    ut = np.stack(all_ut).transpose(1, 0, 2)
    return norm, ut


def test_kernel_matches_direct_transcription_both_versions():
    rng = np.random.default_rng(7)
    hidden = rng.standard_normal((3, 5, 8)).astype(np.float32)
    w = PositionAttentionWeights.seeded(8, seed=1)
    for version in (1, 2):
        got_at, got_ut = position_attention_batch(hidden, 2, w, version)
        exp_at, exp_ut = _direct_transcription(hidden, 2, w, version)
        np.testing.assert_allclose(got_at, exp_at, atol=1e-5)
        np.testing.assert_allclose(got_ut, exp_ut, atol=1e-5)
        # attention rows are normalized distributions
        np.testing.assert_allclose(got_at.sum(axis=1), 1.0, atol=1e-5)
        # u_t = [h_t ; c_t]: first half is the raw hidden state
        np.testing.assert_allclose(got_ut[:, :, :8], hidden, atol=1e-6)


def test_kernel_per_row_query_ids():
    rng = np.random.default_rng(11)
    hidden = rng.standard_normal((4, 6, 8)).astype(np.float32)
    w = PositionAttentionWeights.seeded(8, seed=2)
    qids = np.array([0, 5, 2, 3])
    got_at, got_ut = position_attention_batch(hidden, qids, w, 1)
    exp_at, exp_ut = _direct_transcription(hidden, qids, w, 1)
    np.testing.assert_allclose(got_at, exp_at, atol=1e-5)
    np.testing.assert_allclose(got_ut, exp_ut, atol=1e-5)
    # a constant per-row qid equals the scalar form
    same_at, _ = position_attention_batch(hidden, np.full(4, 2), w, 1)
    scal_at, _ = position_attention_batch(hidden, 2, w, 1)
    np.testing.assert_allclose(same_at, scal_at)


def test_hash_embeddings_stable_and_numeric_att_normalized():
    e1 = hash_token_embeddings(["alice", "met", "bob"], 16, seed=3)
    e2 = hash_token_embeddings(["alice", "met", "bob"], 16, seed=3)
    np.testing.assert_array_equal(e1, e2)  # process-stable, not hash()
    assert not np.allclose(e1[0], e1[1])  # distinct tokens differ

    w = PositionAttentionWeights.seeded(16, seed=0)
    att = position_att_numeric(["alice", "met", "bob", "smith"], 1, w)
    assert len(att) == 4
    assert abs(sum(att) - 1.0) < 1e-5
    assert position_att_numeric([], 0, w) == []


def test_score_instances_kernel_route_keeps_predictions(spark):
    """Routing position_att through the numeric kernel changes ONLY the
    attention column: pred_tags (and therefore every triple oracle) are
    identical, and the kernel column is a normalized distribution of the
    right ragged length."""
    from denrl_spark.operators.scoring import score_instances
    from denrl_spark.operators.tagging import build_instances
    from denrl_spark.sources.corpus import transcripts
    from denrl_spark.sources.kb import KB

    ins = build_instances(transcripts(spark, 8, seed=6), KB.default()).cache()
    w = PositionAttentionWeights.seeded(16, seed=0)
    base = score_instances(ins).select("instance_id", "pred_tags", "position_att")
    kern = score_instances(ins, position_kernel=w).select(
        "instance_id", "pred_tags", "position_att"
    )
    b = {r["instance_id"]: r for r in base.collect()}
    k = {r["instance_id"]: r for r in kern.collect()}
    assert b.keys() == k.keys() and len(b) > 0
    for iid in b:
        assert b[iid]["pred_tags"] == k[iid]["pred_tags"]
        att = k[iid]["position_att"]
        assert len(att) == len(b[iid]["position_att"])
        assert abs(sum(att) - 1.0) < 1e-4

    # full numeric chain: frozen encoder stack (K1) feeding the kernel
    from denrl_spark.operators.encoder import EncoderWeights

    enc = score_instances(
        ins, position_kernel=w,
        position_encoder=EncoderWeights.seeded(16, n_layer=2, n_head=4),
    ).select("instance_id", "pred_tags", "position_att")
    e = {r["instance_id"]: r for r in enc.collect()}
    assert e.keys() == b.keys()
    for iid in e:
        assert e[iid]["pred_tags"] == b[iid]["pred_tags"]
        att = e[iid]["position_att"]
        assert len(att) == len(b[iid]["position_att"])
        assert abs(sum(att) - 1.0) < 1e-4
    # contextual hidden states actually change the attention
    some = next(i for i in e if len(e[i]["position_att"]) > 2)
    assert e[some]["position_att"] != k[some]["position_att"]


def test_hash_embeddings_batch_invariant_and_generator_free(monkeypatch):
    """The vectorized embedding path: (a) a token's row is identical
    whether it arrives alone, duplicated, or in any batch; (b) rows are
    prefix-consistent across hidden_dim (slot-indexed counters); (c) no
    numpy Generator is ever constructed (VERDICT r4 item 7); (d) the
    draws look standard-normal in the aggregate."""
    toks = [f"tok{i}" for i in range(200)]
    batch = hash_token_embeddings(toks + toks[:7], 16, seed=1)
    for i in (0, 3, 199):
        single = hash_token_embeddings([toks[i]], 16, seed=1)
        np.testing.assert_array_equal(batch[i], single[0])
    np.testing.assert_array_equal(batch[:7], batch[200:])  # dup rows
    # prefix consistency over hidden_dim
    np.testing.assert_array_equal(
        hash_token_embeddings(toks, 8, seed=1), batch[:200, :8]
    )
    # odd hidden_dim exercises the half-pair slice
    assert hash_token_embeddings(toks[:3], 5, seed=1).shape == (3, 5)
    # empty input
    assert hash_token_embeddings([], 16).shape == (0, 16)
    # no Generator construction anywhere in the path
    def boom(*a, **k):
        raise AssertionError("default_rng constructed in embedding path")

    monkeypatch.setattr(np.random, "default_rng", boom)
    hash_token_embeddings(toks, 16, seed=1)
    # aggregate distribution sanity: 3200 draws, mean ~ 0, std ~ 1
    flat = batch[:200].ravel()
    assert abs(float(flat.mean())) < 0.06
    assert abs(float(flat.std()) - 1.0) < 0.05
