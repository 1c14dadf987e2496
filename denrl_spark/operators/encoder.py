"""Frozen numeric GPT-2 encoder stack — the K1 dataflow, numerically.

Re-implements the reference encoder forward pass as a vectorized numpy
batch kernel with FROZEN seeded weights, the same treatment the K2
position-attention kernel received (operators/position_attention.py):
bit-level parity with a trained checkpoint is impossible without the
weights (none ship with the reference), but the computation itself is
reproduced exactly and enumeration-tested against a direct per-head
transcription of the reference loop.

Reference mapping (/root/reference/models/modeling_gpt2.py):
- ``Attention`` (159-283): Conv1D qkv projection, head split/merge
  (228-239), ``_attn`` (201-226) = q.k^T scaled by sqrt(d_head)
  (scale=True in GPT2Model line 692), causal tril mask applied by
  REPLACEMENT with masked_bias = -1e4 (not additive), softmax, a.v.
- ``MLP`` (398-410): c_fc -> gelu_new (tanh approximation, the GPT-2
  default activation) -> c_proj.
- ``Block`` (413-478): pre-LN residual — x += attn(ln_1(x));
  x += mlp(ln_2(x)).
- ``GPT2Model`` (685-949): hidden = wte + wpe, n_layer blocks, final
  ln_f. Here the wte output analog is the caller-supplied token
  embedding matrix (hash_token_embeddings in the frozen setting);
  learned position embeddings are a seeded frozen matrix. Dropouts are
  identity (inference mode).

All weights use the GPT-2 init scale (normal, sigma=0.02).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

_INIT_STD = 0.02
_MASKED_BIAS = -1e4
_LN_EPS = 1e-5


def gelu_new(x: np.ndarray) -> np.ndarray:
    """GPT-2's tanh-approximated GELU (transformers ``gelu_new``)."""
    return (
        0.5
        * x
        * (1.0 + np.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))
    )


def layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + _LN_EPS) * g + b


@dataclass(frozen=True)
class BlockWeights:
    ln1_g: np.ndarray
    ln1_b: np.ndarray
    w_attn: np.ndarray  # (H, 3H) Conv1D layout: out = x @ w + b
    b_attn: np.ndarray
    w_aproj: np.ndarray  # (H, H)
    b_aproj: np.ndarray
    ln2_g: np.ndarray
    ln2_b: np.ndarray
    w_fc: np.ndarray  # (H, 4H)
    b_fc: np.ndarray
    w_mproj: np.ndarray  # (4H, H)
    b_mproj: np.ndarray


@dataclass(frozen=True)
class EncoderWeights:
    blocks: tuple[BlockWeights, ...]
    lnf_g: np.ndarray
    lnf_b: np.ndarray
    wpe: np.ndarray  # (max_pos, H)
    n_head: int = field(default=2)

    @classmethod
    def seeded(
        cls,
        hidden_dim: int,
        n_layer: int = 2,
        n_head: int = 2,
        max_pos: int = 512,
        seed: int = 0,
    ) -> "EncoderWeights":
        assert hidden_dim % n_head == 0
        rng = np.random.default_rng(seed)

        def w(*shape):
            return (rng.standard_normal(shape) * _INIT_STD).astype(np.float32)

        blocks = tuple(
            BlockWeights(
                ln1_g=np.ones(hidden_dim, np.float32),
                ln1_b=np.zeros(hidden_dim, np.float32),
                w_attn=w(hidden_dim, 3 * hidden_dim),
                b_attn=w(3 * hidden_dim),
                w_aproj=w(hidden_dim, hidden_dim),
                b_aproj=w(hidden_dim),
                ln2_g=np.ones(hidden_dim, np.float32),
                ln2_b=np.zeros(hidden_dim, np.float32),
                w_fc=w(hidden_dim, 4 * hidden_dim),
                b_fc=w(4 * hidden_dim),
                w_mproj=w(4 * hidden_dim, hidden_dim),
                b_mproj=w(hidden_dim),
            )
            for _ in range(n_layer)
        )
        return cls(
            blocks=blocks,
            lnf_g=np.ones(hidden_dim, np.float32),
            lnf_b=np.zeros(hidden_dim, np.float32),
            wpe=w(max_pos, hidden_dim),
            n_head=n_head,
        )


def _softmax_last(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def causal_self_attention(x: np.ndarray, bw: BlockWeights, n_head: int) -> np.ndarray:
    """(B, T, H) -> (B, T, H): the reference ``Attention.forward`` with
    scale=True and the tril where-replacement mask."""
    b, t, h = x.shape
    dh = h // n_head
    qkv = x @ bw.w_attn + bw.b_attn  # (B, T, 3H)
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(m):  # (B, T, H) -> (B, nh, T, dh)
        return m.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    w = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(dh)  # scale=True
    mask = np.tril(np.ones((t, t), dtype=bool))
    w = np.where(mask, w, _MASKED_BIAS)  # replacement, not additive
    a = _softmax_last(w)
    out = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, h)  # merge_heads
    return out @ bw.w_aproj + bw.b_aproj


def gpt2_block(x: np.ndarray, bw: BlockWeights, n_head: int) -> np.ndarray:
    """Pre-LN residual block (reference Block.forward)."""
    x = x + causal_self_attention(layer_norm(x, bw.ln1_g, bw.ln1_b), bw, n_head)
    h = gelu_new(layer_norm(x, bw.ln2_g, bw.ln2_b) @ bw.w_fc + bw.b_fc)
    return x + (h @ bw.w_mproj + bw.b_mproj)


def gpt2_encode_batch(token_emb: np.ndarray, ew: EncoderWeights) -> np.ndarray:
    """(B, T, H) token embeddings -> (B, T, H) contextual hidden states:
    add position embeddings, run the block stack, final layer norm —
    the GPT2Model forward with dropout as identity."""
    b, t, h = token_emb.shape
    if t > ew.wpe.shape[0]:
        raise ValueError(
            f"sequence length {t} exceeds max_pos {ew.wpe.shape[0]}"
        )
    x = token_emb.astype(np.float32) + ew.wpe[:t][None, :, :]
    for bw in ew.blocks:
        x = gpt2_block(x, bw, ew.n_head)
    return layer_norm(x, ew.lnf_g, ew.lnf_b)


def encode_tokens_np(
    tokens: list[str], ew: EncoderWeights, seed: int = 0
) -> np.ndarray:
    """Convenience: hash embeddings -> encoder stack, (T, H). The frozen
    stand-in for GPT-2 wte + stack feeding the position-attention
    kernel."""
    from denrl_spark.operators.position_attention import hash_token_embeddings

    h = ew.lnf_g.shape[0]
    return gpt2_encode_batch(hash_token_embeddings(tokens, h, seed)[None], ew)[0]


def classifier_logits(u: np.ndarray, w_u: np.ndarray) -> np.ndarray:
    """K3: ``z_t = W_u . u_t`` — the bias-free linear label head over the
    position-attention outputs u_t = [h_t ; c_t]
    (modeling_gpt2.py:1470, nn.Linear(2H, V, bias=False)).
    u: (..., 2H); w_u: (V, 2H) in torch Linear layout. Returns (..., V)."""
    return u @ w_u.T


def seeded_classifier(hidden_dim: int, n_labels: int, seed: int = 0) -> np.ndarray:
    """Frozen W_u (V, 2H), GPT-2 init scale."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n_labels, 2 * hidden_dim)) * _INIT_STD).astype(
        np.float32
    )
