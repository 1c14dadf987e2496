"""Numeric position-attention kernel — K2 parity.

Re-implements the reference's ``Position_Attention`` (v1) and
``Position_Attention2`` (v2) modules
(/root/reference/models/modeling_gpt2.py:285-341 and 343-395) as a
vectorized numpy batch kernel with FROZEN seeded weights, per the
sanctioned north star (no trained checkpoint exists to load, so bit-level
parity with trained weights is impossible; the kernel itself — the
``v . tanh(W_H.H + W_p.h_p + W_h.h_t)`` additive score, per-position
softmax, context pooling, target-axis maxpool, sum-normalization with
NaN->0 — is reproduced exactly and enumeration-tested against a direct
per-target transcription of the reference loop).

Semantics per reference forward():
- ``h_p`` is the hidden state at the query position (int index applied to
  every row, or a per-row index vector).
- For every target position t: score every position j with
  ``s[j] = v . tanh(W_H.h_j + W_p.h_p + W_h.h_t)`` (v2 drops the three
  projections), softmax over j, context ``c_t = sum_j a[j] h_j``,
  ``u_t = [h_t ; c_t]``.
- Stack the per-target attention rows into (target x position), MAXPOOL
  over the TARGET axis, then normalize to sum 1 per row (NaN from a zero
  division is mapped to 0, reference line 338).

The kernel is O(B.T^2.H) memory when fully vectorized — fine for
sentence-length T (<=512 per F1's length filter). Callers batching very
long sequences should chunk over B; the engine's scoring path calls it
per length-sorted Arrow batch.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class PositionAttentionWeights:
    """Frozen projection weights: W_H, W_p, W_h (H x H) and v (H,)."""

    w_big_h: np.ndarray
    w_p: np.ndarray
    w_h: np.ndarray
    v: np.ndarray

    @classmethod
    def seeded(cls, hidden_dim: int, seed: int = 0) -> "PositionAttentionWeights":
        """Deterministic frozen init, 1/sqrt(H)-scaled normal (the
        standard linear-layer scale; any fixed full-rank weights exercise
        the same dataflow)."""
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(hidden_dim)
        shape = (hidden_dim, hidden_dim)
        return cls(
            w_big_h=(rng.standard_normal(shape) * s).astype(np.float32),
            w_p=(rng.standard_normal(shape) * s).astype(np.float32),
            w_h=(rng.standard_normal(shape) * s).astype(np.float32),
            v=(rng.standard_normal(hidden_dim) * s).astype(np.float32),
        )


def _softmax_last(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def position_attention_batch(
    hidden: np.ndarray,
    query_ids,
    weights: PositionAttentionWeights | None = None,
    version: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized transcription of the reference forward pass.

    hidden: (B, T, H) float; query_ids: int or (B,) int array.
    Returns (normalized_at (B, T), all_ut (B, T, 2H)).

    Vectorization note: the reference loops over target positions; here
    the (target x position) score tensor is built in one broadcast —
    ``s[b, t, j] = v . tanh(HW[b, j] + hp[b] + HT[b, t])`` — which is
    algebraically identical (the tanh argument only ever combines one
    target row with one position row).
    """
    hidden = np.asarray(hidden, dtype=np.float32)
    b, t, h = hidden.shape
    if weights is None:
        weights = PositionAttentionWeights.seeded(h)
    qi = (
        np.full(b, int(query_ids), dtype=np.int64)
        if np.isscalar(query_ids)
        else np.asarray(query_ids, dtype=np.int64)
    )
    h_p = hidden[np.arange(b), qi]  # (B, H)
    if version == 1:
        hw = hidden @ weights.w_big_h.T  # (B, T, H): W_H over positions
        hp = h_p @ weights.w_p.T  # (B, H)
        ht = hidden @ weights.w_h.T  # (B, T, H): W_h over targets
    elif version == 2:
        hw, hp, ht = hidden, h_p, hidden
    else:
        raise ValueError(f"unknown position-attention version {version}")
    # (B, T_target, T_pos): tanh argument broadcast, then dot with v
    s = np.tanh(hw[:, None, :, :] + hp[:, None, None, :] + ht[:, :, None, :]) @ weights.v
    a = _softmax_last(s)  # softmax over positions, per target row
    c = a @ hidden  # (B, T_target, H) contexts
    all_ut = np.concatenate([hidden, c], axis=-1)  # u_t = [h_t ; c_t]
    at_pool = a.max(axis=1)  # maxpool over the TARGET axis -> (B, T_pos)
    z = at_pool.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        normalized = at_pool / z
    normalized = np.nan_to_num(normalized, nan=0.0, posinf=0.0, neginf=0.0)
    return normalized.astype(np.float32), all_ut.astype(np.float32)


_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixer, Steele et
    al. 2014): a bijective uint64 avalanche — every output bit depends
    on every input bit. numpy uint64 arithmetic wraps mod 2^64 exactly
    like the C original."""
    x = (x + _SM64_GAMMA).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hash_token_embeddings(
    tokens: list[str], hidden_dim: int = 16, seed: int = 0
) -> np.ndarray:
    """Deterministic per-token embeddings: each token's vector is a pure
    function of (seed, token, slot) — stable across processes,
    partitionings, batch compositions, and PYTHONHASHSEED (python's
    builtin hash is not). This is the frozen encoder stand-in feeding
    the numeric kernel; a real deployment would substitute actual
    encoder hidden states.

    Vectorized (VERDICT r4 item 7): one blake2b digest per UNIQUE token
    keys a counter-mode splitmix64 stream, and the whole
    (n_unique, hidden_dim) block of standard normals comes from single
    numpy Box-Muller ops — no per-token Generator construction (the old
    per-token ``default_rng`` dominated the cost). The per-token
    determinism contract is test-pinned: a token's row is identical
    whether it arrives alone, duplicated, or in any batch, and rows are
    prefix-consistent across hidden_dim (slot-indexed counters)."""
    n = len(tokens)
    if n == 0:
        return np.empty((0, hidden_dim), dtype=np.float32)
    index: dict[str, int] = {}
    for tok in tokens:
        if tok not in index:
            index[tok] = len(index)
    keys = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(f"{seed}:{tok}".encode(), digest_size=8).digest(),
                "big",
            )
            for tok in index
        ),
        dtype=np.uint64,
        count=len(index),
    )
    n_pairs = (hidden_dim + 1) // 2
    with np.errstate(over="ignore"):
        ctr = _splitmix64(np.arange(n_pairs, dtype=np.uint64))
        a = _splitmix64(keys[:, None] ^ ctr[None, :])  # (U, n_pairs)
        b = _splitmix64(a)
    # uint64 -> 53-bit uniforms: u1 in (0, 1] so log is finite; u2 in [0, 1)
    u1 = ((a >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)
    u2 = (b >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    r = np.sqrt(-2.0 * np.log(u1))
    theta = (2.0 * np.pi) * u2
    z = np.empty((len(index), 2 * n_pairs), dtype=np.float64)
    z[:, 0::2] = r * np.cos(theta)
    z[:, 1::2] = r * np.sin(theta)
    uniq_emb = z[:, :hidden_dim].astype(np.float32)
    return uniq_emb[np.fromiter((index[t] for t in tokens), dtype=np.int64, count=n)]


def position_att_numeric(
    tokens: list[str],
    query_id: int,
    weights: PositionAttentionWeights,
    version: int = 1,
    seed: int = 0,
    hidden: np.ndarray | None = None,
) -> list[float]:
    """Per-instance normalized position attention over hash embeddings —
    the drop-in for the BoW analog in score_instances' attention slot.
    Unbatched (B=1) by design: instances in an Arrow batch have ragged
    lengths and padding would contaminate the softmax; T^2.H per row is
    tiny at sentence length. ``hidden`` optionally supplies the (T, H)
    embedding matrix (callers cache it per sentence — instances of one
    sentence share tokens and the blake2b draws dominate the cost)."""
    if not tokens:
        return []
    if hidden is None:
        hidden = hash_token_embeddings(tokens, weights.v.shape[0], seed)
    q = min(max(int(query_id), 0), len(tokens) - 1)
    att, _ = position_attention_batch(hidden[None, :, :], q, weights, version)
    return [float(x) for x in att[0]]
