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
