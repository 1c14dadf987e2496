"""M1 subtoken alignment + E1 subword filtering."""

from denrl_spark.operators.subtokens import (
    IGNORE,
    align_labels,
    filter_label_pieces,
    subtokenize_word,
    with_subtokens,
)
from denrl_spark.operators.tagging import build_instances
from denrl_spark.sources.corpus import transcripts
from denrl_spark.sources.kb import KB

KBD = KB.default()


def test_subtokenize_round_trip():
    for w in ["a", "abcd", "abcde", "johnson", "enterprises"]:
        assert "".join(subtokenize_word(w)) == w


def test_align_first_piece_labeled_rest_ignore():
    words = ["johnson", "met", "acme"]
    lab = [5, 0, 7]
    pieces, word_ids, labels = align_labels(words, lab)
    assert pieces == ["john", "son", "met", "acme"]
    assert word_ids == [0, 0, 1, 2]
    assert labels == [5, IGNORE, 0, 7]


def test_align_label_all_tokens_maps_b_to_i():
    # label 5 = B-X whose I- twin is 6
    pieces, _, labels = align_labels(["johnson"], [5], True, {5: 6})
    assert labels == [5, 6]


def test_filter_pieces_inherits_adjacent_subwords():
    # [B-X, -100, O, -100, B-Y] -> keep 0,1 (continuation) and 4;
    # the -100 after O is detached and drops
    got = filter_label_pieces([5, IGNORE, 0, IGNORE, 7])
    assert got == [(0, 5), (1, IGNORE), (4, 7)]


def test_with_subtokens_spark(spark):
    ins = build_instances(transcripts(spark, 15, seed=6), KBD)
    labels = sorted(
        {t for r in ins.select("ner_tags").collect() for t in r["ner_tags"]}
    )
    label_to_id = {l: i for i, l in enumerate(labels)}
    st = with_subtokens(ins, label_to_id).collect()
    assert len(st) == ins.count()
    for r in st[:30]:
        assert len(r["pieces"]) == len(r["word_ids"]) == len(r["piece_labels"])
        # query remap points at the query word's first piece
        assert r["word_ids"][r["piece_query_id"]] == r["query_id"]
        # piece round-trip: join pieces of each word == word
        # (checked indirectly: piece count >= word count)
        assert len(r["pieces"]) >= max(r["word_ids"]) + 1


# ---------------------------------------------------------------------------
# Real BPE (GPT-2 merge algorithm + Sennrich training)
# ---------------------------------------------------------------------------

def test_learn_bpe_classic_example():
    # Sennrich's worked example: {'low':5,'lower':2,'newest':6,'widest':3}
    # most frequent pair is (e,s) with count 9, then (es,t) with 9, ...
    from denrl_spark.operators.subtokens import learn_bpe

    merges = learn_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # 'lo' appears 7 times ('low','lower'); 'est' closes next at 9
    assert ("es" + "t" == "est") and merges[2] in {("l", "o"), ("n", "e"), ("w", "i")}


def test_learn_bpe_deterministic_under_ordering():
    from denrl_spark.operators.subtokens import learn_bpe

    wc = {"alpha": 3, "beta": 2, "gamma": 5, "delta": 1}
    a = learn_bpe(dict(sorted(wc.items())), 10)
    b = learn_bpe(dict(sorted(wc.items(), reverse=True)), 10)
    assert a == b


def test_bpe_encode_round_trip_and_merging():
    from denrl_spark.operators.subtokens import bpe_encode, learn_bpe, merge_ranks

    wc = {"lowest": 4, "lower": 3, "low": 7, "newest": 6}
    ranks = merge_ranks(learn_bpe(wc, 8))
    for w in ["lowest", "low", "newest", "slowest", "zzz", ""]:
        pieces = bpe_encode(w, ranks)
        assert "".join(pieces) == w
    # trained merges actually apply: 'lowest' ends in the 'est' family
    assert len(bpe_encode("lowest", ranks)) < len("lowest")


def test_bpe_merges_all_occurrences_lowest_rank_first():
    from denrl_spark.operators.subtokens import bpe_encode

    # rank 0 pair merges everywhere before rank 1 is considered
    ranks = {("a", "b"): 0, ("ab", "ab"): 1}
    assert bpe_encode("abab", ranks) == ["abab"]
    assert bpe_encode("aba", ranks) == ["ab", "a"]


def test_align_labels_with_bpe_ranks():
    from denrl_spark.operators.subtokens import learn_bpe, merge_ranks

    ranks = merge_ranks(learn_bpe({"johnson": 10, "john": 5, "son": 5}, 20))
    words = ["johnson", "met"]
    pieces, word_ids, labels = align_labels(words, [5, 0], ranks=ranks)
    assert "".join(pieces[: word_ids.index(1)]) == "johnson"
    assert labels[0] == 5  # first piece carries the word label
    assert all(l == IGNORE for l in labels[1 : word_ids.index(1)])


def test_bpe_vocab_cap_identical_merges_and_no_single_partition(spark):
    """The bounded-collect path: truncating the vocabulary to the top-K
    words must not change the learned merge table when the truncated
    tail is below the merge-frequency floor, and the top-K must plan as
    TakeOrdered (per-partition heaps), never Exchange SinglePartition."""
    from pyspark.sql import functions as F

    from denrl_spark.operators.subtokens import learn_bpe_from_instances

    # skewed vocabulary: 3 heavy words (counts 80/60/50, alphabet a-t)
    # dominate every merge decision; 20 singleton tail words drawn from a
    # DISJOINT alphabet (u-z) contribute pair counts <= 20 < 50, so no
    # merge above the floor can depend on them — the semantic condition
    # under which the top-K truncation is exact.
    heavy = [("alpha",)] * 80 + [("alphabet",)] * 60 + [("bet",)] * 50
    tail = [(f"u{chr(118 + i % 5)}x{chr(117 + (i * 3) % 6)}z{i % 10}",) for i in range(20)]
    rows = [([w],) for (w,) in heavy + tail]
    ins = spark.createDataFrame(rows, "tokens array<string>")
    full = learn_bpe_from_instances(ins, n_merges=6)
    assert len(full) == 6
    capped = learn_bpe_from_instances(ins, n_merges=6, max_vocab=3)
    assert capped == full

    plan = (
        ins.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_with_subtokens_bpe_spark(spark):
    from denrl_spark.operators.subtokens import learn_bpe_from_instances

    tr = transcripts(spark, 12, seed=3)
    ins = build_instances(tr, KBD).cache()
    merges = learn_bpe_from_instances(ins, n_merges=50)
    assert merges  # corpus yields a non-empty merge table
    labels = sorted({t for r in ins.select("ner_tags").collect() for t in r[0]})
    label_to_id = {l: i for i, l in enumerate(labels)}
    out = with_subtokens(ins, label_to_id, merges=merges)
    rows = out.collect()
    assert rows
    got_ins = {r["instance_id"]: r for r in rows}
    src = {r["instance_id"]: r for r in ins.collect()}
    for iid, r in got_ins.items():
        words = src[iid]["tokens"]
        # word_ids reconstruct the word boundaries; pieces round-trip
        joined = []
        cur, buf = None, []
        for p, w in zip(r["pieces"], r["word_ids"]):
            if w != cur and buf:
                joined.append("".join(buf))
                buf = []
            cur = w
            buf.append(p)
        joined.append("".join(buf))
        assert joined == list(words)
        # exactly one labeled piece per word (first-piece convention)
        firsts = [i for i, w in enumerate(r["word_ids"]) if i == 0 or r["word_ids"][i - 1] != w]
        for i, lab in enumerate(r["piece_labels"]):
            if i in firsts:
                assert lab != IGNORE
            else:
                assert lab == IGNORE


# ---------------------------------------------------------------------------
# GPT-2 byte-level layer (bytes_to_unicode + pre-tokenizer + Ġ convention)
# ---------------------------------------------------------------------------

from denrl_spark.operators.subtokens import (  # noqa: E402
    BYTE_ENCODER,
    bpe_decode_bytes,
    bpe_encode_bytes,
    bytes_to_unicode,
    gpt2_encode,
    gpt2_pre_tokenize,
    merge_ranks,
    _pre_tokenize_fallback,
)


def _chain(token):
    """Merge list that fully assembles ``token`` left-to-right."""
    return [(token[: i + 1], token[i + 1]) for i in range(len(token) - 1)]


def test_bytes_to_unicode_map_is_gpt2s():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("A")] == "A" and m[ord("!")] == "!"  # printables identity
    assert m[32] == "Ġ"  # space -> Ġ
    assert m[10] == "Ċ"  # newline -> Ċ


def test_gpt2_pre_tokenize_known_splits():
    assert gpt2_pre_tokenize("Hello, world!") == ["Hello", ",", " world", "!"]
    assert gpt2_pre_tokenize("I'll go") == ["I", "'ll", " go"]
    assert gpt2_pre_tokenize("a  b") == ["a", " ", " b"]
    assert gpt2_pre_tokenize("abc123 x") == ["abc", "123", " x"]
    assert gpt2_pre_tokenize("tail  ") == ["tail", "  "]
    for t in ["Hello, world!", "a  b c", "x\ny", "1+2=3", "  lead", "café's"]:
        assert "".join(gpt2_pre_tokenize(t)) == t


def test_pre_tokenize_fallback_matches_regex():
    cases = [
        "Hello, world!", "I'll go", "a  b", "abc123 x", "tail  ",
        "x\n\ny", "don't stop", "3.14 is pi", "  lead", "",
    ]
    for t in cases:
        assert _pre_tokenize_fallback(t) == gpt2_pre_tokenize(t), t


def test_gpt2_encode_known_tokenizations():
    # with a merge table containing the needed chains, the byte-level
    # pipeline reproduces the known GPT-2 pieces for these phrases
    ranks = merge_ranks(_chain("Hello") + _chain("Ġworld"))
    assert gpt2_encode("Hello world", ranks) == ["Hello", "Ġworld"]
    assert gpt2_encode("Hello, world!", ranks) == ["Hello", ",", "Ġworld", "!"]


def test_gpt2_encode_round_trips_any_unicode():
    for t in ["Hello world", "café ☕ naïve", "line1\nline2", "数 digits 123", ""]:
        assert bpe_decode_bytes(gpt2_encode(t, {})) == t


def test_byte_level_subtokenize_word_prefix_space():
    ranks = merge_ranks(_chain("Ġworld"))
    assert subtokenize_word("world", ranks=ranks, byte_level=True) == ["Ġworld"]
    # no merges: one piece per byte-symbol of ' world'
    pieces = subtokenize_word("world", ranks={}, byte_level=True)
    assert pieces[0] == "Ġ" and bpe_decode_bytes(pieces) == " world"


def test_align_labels_byte_level_first_piece_rule():
    ranks = merge_ranks(_chain("Ġjo"))
    pieces, word_ids, labels = align_labels(
        ["john", "met"], [5, 0], ranks=ranks, byte_level=True
    )
    # 'Ġjo','h','n' then 'Ġ','m','e','t' — first piece labeled, rest -100
    assert pieces[0] == "Ġjo" and word_ids[:3] == [0, 0, 0]
    assert labels[0] == 5 and set(labels[1:3]) == {IGNORE}
    assert bpe_decode_bytes(pieces) == " john met"
