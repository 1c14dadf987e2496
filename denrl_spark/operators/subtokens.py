"""Subtoken alignment (M1) and subword-aware decode filtering (E1).

The reference's main path tokenizes pre-split words into GPT-2 BPE
subtokens and aligns labels to pieces: the FIRST piece of a word carries
the word's label id, continuation pieces carry -100 (or the I- twin when
``label_all_tokens``), specials carry -100
(run_jointmodel.py:652-708). Decode-side, -100 pieces inherit membership
in the span of the latest true token when adjacent
(handling_score, run_jointmodel.py:1217-1295).

The rebuild's deterministic stand-in for the BPE vocabulary is a
fixed-width chunker (pieces of <= PIECE chars) — no vocab download, same
alignment semantics, exact round-trip (``''.join(pieces) == word``).
Spark surface: one Arrow-batched mapInPandas adding piece-level columns.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

PIECE = 4
IGNORE = -100  # HF convention, run_jointmodel.py:668


def subtokenize_word(word: str, piece: int = PIECE) -> list[str]:
    """Deterministic BPE stand-in: fixed-width chunks; round-trip exact."""
    return [word[i : i + piece] for i in range(0, len(word), piece)] or [""]


def align_labels(
    words: list[str],
    label_ids: list[int],
    label_all_tokens: bool = False,
    b_to_i: dict[int, int] | None = None,
) -> tuple[list[str], list[int], list[int]]:
    """M1: words + word-level label ids -> (pieces, word_ids, piece_labels).

    piece_labels: first piece of each word gets the word's label;
    continuations get -100, or (label_all_tokens) the same label with
    B->I mapped through ``b_to_i`` (run_jointmodel.py:680-696)."""
    pieces: list[str] = []
    word_ids: list[int] = []
    labels: list[int] = []
    for w_idx, (word, lab) in enumerate(zip(words, label_ids)):
        for p_idx, piece_str in enumerate(subtokenize_word(word)):
            pieces.append(piece_str)
            word_ids.append(w_idx)
            if p_idx == 0:
                labels.append(lab)
            elif label_all_tokens:
                labels.append((b_to_i or {}).get(lab, lab))
            else:
                labels.append(IGNORE)
    return pieces, word_ids, labels


def filter_label_pieces(piece_labels: list[int]) -> list[tuple[int, int]]:
    """E1 (is_label branch of handling_score): keep (index, label) pairs
    where the label is a true non-O token OR a -100 continuation directly
    adjacent to the latest kept true token; 'O' (and detached -100) drop.
    Label id 0 is treated as 'O' by the caller's convention."""
    out: list[tuple[int, int]] = []
    true_idx = None
    for idx, lab in enumerate(piece_labels):
        if lab == IGNORE:
            if true_idx is not None and idx == true_idx + 1:
                out.append((idx, lab))
                true_idx += 1
        elif lab != 0:  # not ignore_labels ('O')
            true_idx = idx
            out.append((idx, lab))
    return out


SUBTOKEN_SCHEMA = (
    "sent_id bigint, instance_id bigint, query_id int, "
    "pieces array<string>, word_ids array<int>, piece_labels array<int>, "
    "piece_query_id int"
)


def with_subtokens(
    instances: DataFrame,
    label_to_id: dict[str, int],
    label_all_tokens: bool = False,
) -> DataFrame:
    """Instance table -> piece-level table. ``piece_query_id`` is the
    piece index of the query word's first piece (query-id remap,
    run_jointmodel.py:697-708; fallback 0)."""
    b_to_i = {
        i: label_to_id.get("I-" + lab[2:], i)
        for lab, i in label_to_id.items()
        if lab.startswith("B-")
    }
    cols = instances.select(
        "sent_id", "instance_id", "query_id", "tokens", "ner_tags"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                words = list(r.tokens)
                lab_ids = [label_to_id[t] for t in r.ner_tags]
                pieces, word_ids, labels = align_labels(
                    words, lab_ids, label_all_tokens, b_to_i
                )
                try:
                    pq = word_ids.index(int(r.query_id))
                except ValueError:
                    pq = 0
                rows.append(
                    (
                        int(r.sent_id), int(r.instance_id), int(r.query_id),
                        pieces, word_ids, labels, pq,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sent_id", "instance_id", "query_id",
                    "pieces", "word_ids", "piece_labels", "piece_query_id",
                ],
            )

    return cols.mapInPandas(gen, SUBTOKEN_SCHEMA)
