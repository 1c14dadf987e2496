"""K1 numeric encoder: the vectorized stack must match a direct
per-head, per-position transcription of the reference forward
(modeling_gpt2.py Attention._attn 201-226 / Block 413-478 /
GPT2Model 685-949), plus structural invariants (causality,
determinism) and composition with the K2 kernel."""

import math

import numpy as np

from denrl_spark.operators.encoder import (
    EncoderWeights,
    encode_tokens_np,
    gelu_new,
    gpt2_encode_batch,
    layer_norm,
)


def _direct_block(x, bw, n_head):
    """Reference Block.forward transcribed with explicit per-head and
    per-target loops (no broadcasting tricks)."""
    b, t, h = x.shape
    dh = h // n_head
    ln1 = layer_norm(x, bw.ln1_g, bw.ln1_b)
    qkv = ln1 @ bw.w_attn + bw.b_attn
    attn_out = np.zeros_like(x)
    for bi in range(b):
        for head in range(n_head):
            sl = slice(head * dh, (head + 1) * dh)
            q = qkv[bi, :, :h][:, sl]
            k = qkv[bi, :, h : 2 * h][:, sl]
            v = qkv[bi, :, 2 * h :][:, sl]
            for ti in range(t):
                scores = np.full(t, -1e4)
                for j in range(ti + 1):  # causal: keys <= query position
                    scores[j] = float(q[ti] @ k[j]) / math.sqrt(dh)
                e = np.exp(scores - scores.max())
                a = e / e.sum()
                attn_out[bi, ti, sl] = sum(a[j] * v[j] for j in range(t))
    x = x + attn_out @ bw.w_aproj + bw.b_aproj
    h2 = gelu_new(layer_norm(x, bw.ln2_g, bw.ln2_b) @ bw.w_fc + bw.b_fc)
    return x + h2 @ bw.w_mproj + bw.b_mproj


def _direct_encode(token_emb, ew):
    x = token_emb.astype(np.float32) + ew.wpe[: token_emb.shape[1]][None]
    for bw in ew.blocks:
        x = _direct_block(x, bw, ew.n_head)
    return layer_norm(x, ew.lnf_g, ew.lnf_b)


def test_encoder_matches_direct_transcription():
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((2, 5, 8)).astype(np.float32)
    ew = EncoderWeights.seeded(8, n_layer=2, n_head=2, max_pos=16, seed=3)
    got = gpt2_encode_batch(emb, ew)
    exp = _direct_encode(emb, ew)
    np.testing.assert_allclose(got, exp, atol=2e-5)


def test_encoder_is_causal():
    """Perturbing token j must not change hidden states at positions < j
    — the tril mask is doing its job through the full stack."""
    rng = np.random.default_rng(9)
    emb = rng.standard_normal((1, 6, 8)).astype(np.float32)
    ew = EncoderWeights.seeded(8, n_layer=2, n_head=2, max_pos=16, seed=1)
    base = gpt2_encode_batch(emb, ew)
    pert = emb.copy()
    # single-dimension bump: a constant shift across all dims would be
    # invisible (LayerNorm removes it end to end)
    pert[0, 4, 0] += 1.0
    out = gpt2_encode_batch(pert, ew)
    np.testing.assert_allclose(out[0, :4], base[0, :4], atol=1e-6)
    assert not np.allclose(out[0, 4:], base[0, 4:])


def test_encoder_position_sensitivity_and_determinism():
    ew = EncoderWeights.seeded(8, seed=2)
    a = encode_tokens_np(["alice", "met", "bob"], ew)
    b = encode_tokens_np(["alice", "met", "bob"], ew)
    np.testing.assert_array_equal(a, b)
    # same token at different positions gets different contextual states
    c = encode_tokens_np(["bob", "met", "alice"], ew)
    assert not np.allclose(a[0], c[2])
    assert a.shape == (3, 8)
    # max_pos guard
    import pytest

    with pytest.raises(ValueError, match="max_pos"):
        encode_tokens_np(["w"] * 20, EncoderWeights.seeded(8, max_pos=4))


def test_encoder_feeds_position_attention():
    """K1 -> K2 composition: contextual hidden states from the frozen
    stack drive the numeric position-attention kernel; output is a
    normalized distribution per instance."""
    from denrl_spark.operators.position_attention import (
        PositionAttentionWeights,
        position_attention_batch,
    )

    ew = EncoderWeights.seeded(16, n_layer=2, n_head=4, seed=0)
    pw = PositionAttentionWeights.seeded(16, seed=1)
    hidden = encode_tokens_np(["alice", "works", "at", "acme", "corp"], ew)
    att, ut = position_attention_batch(hidden[None], 0, pw, version=1)
    assert att.shape == (1, 5) and ut.shape == (1, 5, 32)
    np.testing.assert_allclose(att.sum(axis=1), 1.0, atol=1e-5)


def test_full_numeric_chain_k1_k2_k3_k6():
    """The complete frozen numeric scoring chain — encoder stack (K1) ->
    position attention per query (K2, all_ut) -> linear label head (K3)
    -> BIO-constrained Viterbi decode (K6) — runs end to end and
    produces structurally valid output: per-position logits over the
    label set and a decoded tag path that respects BIO transition
    constraints. Weights are frozen/seeded, so values are arbitrary but
    deterministic; the reference's trained numbers are unreachable
    without its checkpoint (documented), while every kernel in the
    chain is individually enumeration-tested."""
    from denrl_spark.operators.encoder import classifier_logits, seeded_classifier
    from denrl_spark.operators.position_attention import (
        PositionAttentionWeights,
        position_attention_batch,
    )
    from denrl_spark.operators.scoring import (
        bio_transitions,
        build_label_list,
        viterbi_batch,
    )
    from denrl_spark.sources.kb import KB

    labels = build_label_list(KB.default())
    v = len(labels)
    ew = EncoderWeights.seeded(16, n_layer=2, n_head=4, seed=0)
    pw = PositionAttentionWeights.seeded(16, seed=1)
    w_u = seeded_classifier(16, v, seed=2)

    toks = ["alice", "works", "at", "acme", "corp", "in", "berlin"]
    hidden = encode_tokens_np(toks, ew)  # (T, 16)
    _, ut = position_attention_batch(hidden[None], 0, pw)  # (1, T, 32)
    logits = classifier_logits(ut, w_u)  # (1, T, V)
    assert logits.shape == (1, len(toks), v)

    trans = bio_transitions(labels)
    path = viterbi_batch(
        logits.astype(np.float32), trans, np.array([len(toks)])
    )[0]
    decoded = [labels[t] for t in path]
    assert len(decoded) == len(toks)
    # decoded TRANSITIONS respect BIO constraints: I-X only after
    # B-X/I-X (position 0 is unconstrained — viterbi_batch carries no
    # start scores, by documented design)
    for prev, tag in zip(decoded, decoded[1:]):
        if tag.startswith("I-"):
            assert prev[2:] == tag[2:] and prev[0] in "BI", (prev, tag)
    # deterministic across calls
    hidden2 = encode_tokens_np(toks, ew)
    np.testing.assert_array_equal(hidden, hidden2)
