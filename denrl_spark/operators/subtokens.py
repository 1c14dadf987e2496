"""Subtoken alignment (M1) and subword-aware decode filtering (E1).

The reference's main path tokenizes pre-split words into GPT-2 BPE
subtokens and aligns labels to pieces: the FIRST piece of a word carries
the word's label id, continuation pieces carry -100 (or the I- twin when
``label_all_tokens``), specials carry -100
(run_jointmodel.py:652-708). Decode-side, -100 pieces inherit membership
in the span of the latest true token when adjacent
(handling_score, run_jointmodel.py:1217-1295).

Subtokenization is REAL byte-pair encoding: ``bpe_encode`` runs the
GPT-2 merge algorithm (greedy lowest-rank adjacent pair, all
occurrences per round — matching GPT2Tokenizer.bpe) over a merge table
that is either (a) learned deterministically from the corpus with the
Sennrich procedure (``learn_bpe``; BPE training operates on the
word-frequency table, which is vocab-sized, so the driver-side learn is
scale-safe), or (b) loaded from a real GPT-2 ``merges.txt`` via
``load_merges`` (the 50k-line public data file is not vendored to keep
the repo self-contained; the loader accepts the stock HF format).
Pieces stay character-level within the pre-split word, so the
round-trip invariant ``''.join(pieces) == word`` holds and the label
alignment semantics are unchanged. The fixed-width chunker remains the
merges=None fallback. Spark surface: one Arrow-batched mapInPandas
adding piece-level columns; the rank table rides the task closure
(broadcast-equivalent, it is merge-count-sized).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame

PIECE = 4
IGNORE = -100  # HF convention, run_jointmodel.py:668
_NO_RANK = 1 << 60


def learn_bpe(word_counts: dict[str, int], n_merges: int = 200) -> list[tuple[str, str]]:
    """Sennrich BPE training over a word-frequency table: repeatedly
    merge the most frequent adjacent symbol pair (ties broken by
    lexicographically smallest pair, so the table is deterministic under
    any input ordering)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            syms = tuple(w)
            vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + cnt
        vocab = new_vocab
    return merges


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte<->printable-unicode map (public algorithm,
    openai/gpt-2 encoder.py / HF GPT2Tokenizer.byte_encoder): printable
    latin bytes map to themselves; the other 68 bytes map to 256+n in
    first-seen order, so e.g. space(32) -> U+0120 'Ġ' and newline(10) ->
    U+010A 'Ċ'. Makes every byte sequence a lossless string of
    non-whitespace symbols that the merge loop can operate on."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


BYTE_ENCODER = bytes_to_unicode()
BYTE_DECODER = {v: k for k, v in BYTE_ENCODER.items()}

# GPT-2 pre-tokenizer pattern (public, openai/gpt-2 encoder.py): splits
# contractions, letter runs, number runs, punctuation runs — each with
# an optional leading space — and trailing whitespace.
_GPT2_PAT = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

try:  # the `regex` module supports \p{L}; stdlib re does not
    import regex as _regex

    _GPT2_RE = _regex.compile(_GPT2_PAT)
except ImportError:  # pragma: no cover - container-dependent
    _GPT2_RE = None


def _pre_tokenize_fallback(text: str) -> list[str]:
    """Hand-rolled scanner twin of the GPT-2 pattern for environments
    without the ``regex`` module. Classifies by unicode category via
    str.isalpha/isnumeric (the \\p{L}/\\p{N} classes). The whitespace
    rule mirrors the pattern's backtracking: a whitespace run followed
    by a non-space yields the run minus its last space, and that last
    space prefixes the following letter/number/punct token. Whitespace
    is the Unicode White_Space property (what regex ``\\s`` matches) —
    NOT ``str.isspace()``, which additionally counts the separator
    controls \\x1c-\\x1f. Known limit: the ``regex`` module may carry a
    newer Unicode table than the stdlib, so codepoints assigned as
    letters/numbers only in the newer standard can classify
    differently between the two paths — INCLUDING inside the BMP
    (Hypothesis found U+0CDC, a Unicode-15 Kannada letter, unassigned
    in Python 3.11's table); the
    property test pins equality over the BMP."""

    def is_ws(c: str) -> bool:
        return c.isspace() and c not in "\x1c\x1d\x1e\x1f"

    out: list[str] = []
    i, n = 0, len(text)
    contractions = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    pending_space = ""
    while i < n:
        hit = next((c for c in contractions if text.startswith(c, i)), None)
        if hit is not None and not pending_space:
            out.append(hit)
            i += len(hit)
            continue
        ch = text[i]
        if is_ws(ch) and not pending_space:
            k = i
            while k < n and is_ws(text[k]):
                k += 1
            if k < n and text[k - 1] == " ":
                # run before a token, ending in a literal space: that
                # space prefixes the token (only ' ' — the ` ?` in the
                # pattern), the rest is its own chunk
                if k - i > 1:
                    out.append(text[i : k - 1])
                pending_space = " "
            elif k < n:
                # ends in non-space whitespace: run minus last char,
                # then the last char alone (regex backtracking shape)
                if k - i > 1:
                    out.append(text[i : k - 1])
                out.append(text[k - 1])
            else:  # trailing run
                out.append(text[i:k])
            i = k
            continue
        k = i
        if ch.isalpha():
            while k < n and text[k].isalpha():
                k += 1
        elif ch.isnumeric():
            while k < n and text[k].isnumeric():
                k += 1
        else:
            while k < n and not (
                is_ws(text[k]) or text[k].isalpha() or text[k].isnumeric()
            ):
                k += 1
        out.append(pending_space + text[i:k])
        pending_space = ""
        i = k
    return out


def gpt2_pre_tokenize(text: str) -> list[str]:
    """Text -> GPT-2 pre-tokenizer chunks (lossless: ``''.join`` round-
    trips). 'Hello, world!' -> ['Hello', ',', ' world', '!']."""
    if _GPT2_RE is not None:
        return _GPT2_RE.findall(text)
    return _pre_tokenize_fallback(text)


def bpe_encode_bytes(
    chunk: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """One pre-tokenizer chunk -> byte-level BPE pieces in GPT-2's
    symbol alphabet (leading space becomes 'Ġ'): utf-8 bytes ->
    byte-encoder symbols -> the standard merge loop. With the stock
    GPT-2 merge table this reproduces GPT2TokenizerFast piece-for-piece
    ('Hello world' -> ['Hello', 'Ġworld']); the 50k-line public
    merges.txt is not vendored (no network in this sandbox — load it
    via ``load_merges`` where available)."""
    symbols = "".join(BYTE_ENCODER[b] for b in chunk.encode("utf-8"))
    return bpe_encode(symbols, ranks)


def bpe_decode_bytes(pieces: list[str]) -> str:
    """Inverse of bpe_encode_bytes across chunks: symbols -> bytes ->
    text. Exact round-trip for any input."""
    return bytes(
        BYTE_DECODER[ch] for piece in pieces for ch in piece
    ).decode("utf-8")


def gpt2_encode(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Full GPT-2 tokenization: pre-tokenize -> byte-level BPE per
    chunk. Lossless: ``bpe_decode_bytes(gpt2_encode(t, r)) == t``."""
    out: list[str] = []
    for chunk in gpt2_pre_tokenize(text):
        out.extend(bpe_encode_bytes(chunk, ranks))
    return out


def load_merges(path: str) -> list[tuple[str, str]]:
    """Parse a stock GPT-2/HF ``merges.txt`` (optional ``#version``
    header, one space-separated pair per line)."""
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {p: i for i, p in enumerate(merges)}


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2 merge loop (transformers GPT2Tokenizer.bpe, the tokenizer
    the reference instantiates at run_jointmodel.py:652-661): start from
    characters; each round merge ALL occurrences of the adjacent pair
    with the lowest merge rank; stop when no adjacent pair has a rank.
    Character-level within the word, so round-trip exact."""
    if not word:
        return [""]
    parts = list(word)
    while len(parts) > 1:
        best_rank = _NO_RANK
        best_pair = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]), _NO_RANK)
            if r < best_rank:
                best_rank = r
                best_pair = (parts[i], parts[i + 1])
        if best_pair is None or best_rank == _NO_RANK:
            break
        joined = best_pair[0] + best_pair[1]
        out: list[str] = []
        i = 0
        while i < len(parts):
            if (
                i < len(parts) - 1
                and parts[i] == best_pair[0]
                and parts[i + 1] == best_pair[1]
            ):
                out.append(joined)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def subtokenize_word(
    word: str,
    piece: int = PIECE,
    ranks: dict[tuple[str, str], int] | None = None,
    byte_level: bool = False,
) -> list[str]:
    """Word -> subword pieces; real BPE when a rank table is given,
    fixed-width chunks otherwise. ``byte_level`` switches to GPT-2's
    byte alphabet with the add_prefix_space convention the reference's
    GPT2TokenizerFast applies to pre-split words
    (run_jointmodel.py:652-661): every word is encoded as ' '+word, so
    pieces carry the Ġ prefix and ``bpe_decode_bytes(pieces)`` round-
    trips to ' '+word. Character-level paths round-trip via plain
    ``''.join``."""
    if ranks is not None:
        if byte_level:
            return bpe_encode_bytes(" " + word, ranks)
        return bpe_encode(word, ranks)
    return [word[i : i + piece] for i in range(0, len(word), piece)] or [""]


def align_labels(
    words: list[str],
    label_ids: list[int],
    label_all_tokens: bool = False,
    b_to_i: dict[int, int] | None = None,
    ranks: dict[tuple[str, str], int] | None = None,
    byte_level: bool = False,
) -> tuple[list[str], list[int], list[int]]:
    """M1: words + word-level label ids -> (pieces, word_ids, piece_labels).

    piece_labels: first piece of each word gets the word's label;
    continuations get -100, or (label_all_tokens) the same label with
    B->I mapped through ``b_to_i`` (run_jointmodel.py:680-696).
    ``ranks`` selects real BPE subtokenization (see module docstring)."""
    pieces: list[str] = []
    word_ids: list[int] = []
    labels: list[int] = []
    for w_idx, (word, lab) in enumerate(zip(words, label_ids)):
        for p_idx, piece_str in enumerate(
            subtokenize_word(word, ranks=ranks, byte_level=byte_level)
        ):
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


def learn_bpe_from_instances(
    instances: DataFrame, n_merges: int = 200, max_vocab: int = 1_000_000
) -> list[tuple[str, str]]:
    """Corpus-driven merge table: distributed word-frequency aggregation
    (explode + groupBy, map-side combined), then the count table is
    collected and merges are learned driver-side — the standard
    BPE-training shape (training state is O(vocab), not O(corpus)).

    The collect is BOUNDED: on 100 TB web text distinct whitespace
    tokens run to 10^8+, so an uncapped collect OOMs the driver. The
    vocabulary is truncated to the ``max_vocab`` most frequent words
    via a distributed top-K (Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition O(k) heaps merged on the
    driver, never an Exchange SinglePartition sort). The tiebreak
    (count desc, word asc) makes the truncation boundary
    deterministic. Semantics: each BPE merge is chosen by total pair
    frequency; truncation is EXACT when the truncated tail's total
    pair mass is below every chosen merge's frequency (the normal
    web-corpus shape: head-driven merges, singleton tail), and an
    approximation otherwise — pick ``max_vocab`` >> n_merges so the
    floor clears the tail. The skewed-vocabulary test asserts merge
    identity under a tail-truncating cap."""
    from pyspark.sql import functions as F

    counts = (
        instances.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_vocab)
        .collect()
    )
    return learn_bpe({r["w"]: r["c"] for r in counts}, n_merges)


def with_subtokens(
    instances: DataFrame,
    label_to_id: dict[str, int],
    label_all_tokens: bool = False,
    merges: list[tuple[str, str]] | None = None,
    byte_level: bool = False,
) -> DataFrame:
    """Instance table -> piece-level table. ``piece_query_id`` is the
    piece index of the query word's first piece (query-id remap,
    run_jointmodel.py:697-708; fallback 0). ``merges`` (from
    learn_bpe_from_instances or load_merges) selects real BPE; the rank
    dict rides the closure, merge-table-sized."""
    ranks = merge_ranks(merges) if merges is not None else None
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
                    words, lab_ids, label_all_tokens, b_to_i, ranks, byte_level
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
