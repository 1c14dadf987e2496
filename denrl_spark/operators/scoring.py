"""Frozen deterministic scorer + batched Viterbi decode (K-group).

The reference's prediction path is GPT-2 encoder -> position attention ->
classifier -> CRF Viterbi (models/modeling_gpt2.py:1619-1688,
models/crf/base_crf.py:117-169). Per the rebuild's north star, the
trained encoder is replaced by a deterministic, broadcastable featurizer:
KB alignment seeds + mined pattern bag-of-words produce per-token tag
emissions, and a mask-aware vectorized Viterbi (numpy, batched over each
Arrow batch) decodes them under BIO transition constraints. Outputs per
instance: ``pred_tags`` (decoded BIO sequence) and ``position_att`` (the
normalized attention distribution used for KL-confidence selection,
analog of ``position_attentions`` in modeling_outputs.py:716).

Emission convention mirrors the reference's viterbi->one-hot trick
(modeling_gpt2.py:1690-1705): evidence tag gets +10, everything else -1;
impossible transitions score ``IMPOSSIBLE_SCORE = -1e7``
(models/crf/utils.py:5). Decoding is O(B*T*V^2) numpy inside an
iterator UDF — nothing quadratic in sentence count ever leaves the task
(SURVEY.md §4 "never collect logits").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from denrl_spark.operators.attention import target_att_py
from denrl_spark.operators.tagging import find_entity_spans, relation_for
from denrl_spark.sources.kb import KB

IMPOSSIBLE = -1e7  # models/crf/utils.py:5
EVIDENCE, NON_EVIDENCE = 10.0, -1.0  # modeling_gpt2.py:1690-1705


def build_label_list(kb: KB) -> list[str]:
    """A1 label discovery analog (run_jointmodel.py:773-794): sorted
    unique tags with I- twins synthesized for every B-."""
    labels = {"O"}
    names = set(kb.entity_type.values()) | {p for _, p, _ in kb.triples}
    for n in names:
        labels.add("B-" + n)
        labels.add("I-" + n)
    return sorted(labels)


def bio_transitions(labels: list[str]) -> np.ndarray:
    """(V, V) transition scores: I-X reachable only from B-X/I-X."""
    v = len(labels)
    t = np.zeros((v, v), dtype=np.float32)
    for j, to in enumerate(labels):
        if to.startswith("I-"):
            name = to[2:]
            for i, frm in enumerate(labels):
                if frm[2:] != name or frm == "O":
                    t[i, j] = IMPOSSIBLE
    return t


def viterbi_batch(emissions: np.ndarray, transitions: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized max-product DP over a padded batch.

    emissions: (B, T, V) float32; lengths: (B,). Returns (B, T) int tag
    ids (padding positions carry 0). Semantics of
    models/crf/base_crf.py:117-169 without learned start/end scores.
    """
    b, t, v = emissions.shape
    score = emissions[:, 0, :].copy()  # (B, V)
    back = np.zeros((b, t, v), dtype=np.int32)
    for step in range(1, t):
        cand = score[:, :, None] + transitions[None, :, :]  # (B, V, V)
        best_prev = cand.argmax(axis=1)  # (B, V)
        best_score = np.take_along_axis(cand, best_prev[:, None, :], axis=1)[:, 0, :]
        new_score = best_score + emissions[:, step, :]
        active = (step < lengths)[:, None]
        score = np.where(active, new_score, score)
        back[:, step, :] = np.where(active, best_prev, 0)
    out = np.zeros((b, t), dtype=np.int32)
    last = score.argmax(axis=1)
    for i in range(b):
        ln = int(lengths[i])
        cur = int(last[i])
        for step in range(ln - 1, -1, -1):
            out[i, step] = cur
            if step > 0:
                cur = int(back[i, step, cur])
    return out


def emissions_for_instance(
    tokens: list[str], query_id: int, kb: KB, label_index: dict[str, int], instance_id: int = 0
) -> np.ndarray:
    """Deterministic featurizer: KB span alignment -> one-hot-ish
    emissions (the frozen stand-in for encoder+classifier K1/K3)."""
    n, v = len(tokens), len(label_index)
    em = np.full((n, v), NON_EVIDENCE, dtype=np.float32)
    em[:, label_index["O"]] = 0.0
    if instance_id < 0:  # negative instance: trained target is all-O
        return em
    spans = find_entity_spans(tokens, kb)
    query = next((s for s in spans if s[0] == query_id), None)
    for s, e, surf, typ in spans:
        if query is not None and (s, e) == (query[0], query[1]):
            name = typ
        else:
            rel = relation_for(kb, query[2], surf) if query is not None else None
            name = rel if rel is not None else typ
        em[s, label_index["B-" + name]] = EVIDENCE
        for j in range(s + 1, e):
            em[j, label_index["I-" + name]] = EVIDENCE
    return em


SCORED_SCHEMA = (
    "conv_id string, turn_idx int, sent_id bigint, instance_id bigint, "
    "query_id int, tokens array<string>, ner_tags array<string>, "
    "pred_tags array<string>, position_att array<float>"
)


def score_instances(
    instances: DataFrame, kb: KB | None = None, bow: dict[str, set] | None = None
) -> DataFrame:
    """Batch inference: adds pred_tags + position_att via one Arrow pass.

    ``bow`` is the mined relation bag-of-words (A4) used for the
    position-attention distribution; the KB and BoW ride the closure
    (both tiny — the explicit-broadcast equivalent)."""
    kb = kb or KB.default()
    bow = {k: set(vv) for k, vv in (bow or {}).items()}
    labels: list[str] = build_label_list(kb)
    label_index = {l: i for i, l in enumerate(labels)}
    trans = bio_transitions(labels)

    def gen(batches):
        for pdf in batches:
            toks_col = [list(t) for t in pdf["tokens"]]
            qids = pdf["query_id"].to_numpy()
            iids = pdf["instance_id"].to_numpy()
            bsz = len(toks_col)
            if bsz == 0:
                yield pdf.assign(pred_tags=None, position_att=None)
                continue
            lengths = np.array([len(t) for t in toks_col])
            tmax = int(lengths.max())
            em = np.full((bsz, tmax, len(labels)), 0.0, dtype=np.float32)
            for i, toks in enumerate(toks_col):
                em[i, : len(toks), :] = emissions_for_instance(
                    toks, int(qids[i]), kb, label_index, int(iids[i])
                )
            ids = viterbi_batch(em, trans, lengths)
            pred_tags = [
                [labels[ids[i, j]] for j in range(int(lengths[i]))] for i in range(bsz)
            ]
            # position attention from PREDICTED tags + mined BoW (smoothed
            # so KL's log is finite) — the K2 stand-in.
            pas = []
            for i, toks in enumerate(toks_col):
                att = target_att_py(toks, pred_tags[i], int(iids[i]), bow)
                eps = 1e-6
                sm = [a + eps for a in att]
                z = sum(sm)
                pas.append([a / z for a in sm])
            out = pdf.copy()
            out["pred_tags"] = pred_tags
            out["position_att"] = pas
            yield out

    cols = instances.select(
        "conv_id", "turn_idx", "sent_id", "instance_id", "query_id", "tokens", "ner_tags"
    )
    return cols.mapInPandas(gen, SCORED_SCHEMA)
