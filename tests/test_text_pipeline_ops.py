"""contamination_scan + repetition_metrics vs Python brute force,
including the short-doc and degenerate-repetition edges."""

from collections import Counter

import pytest

from denrl_spark.functions.textops import contamination_scan, repetition_metrics


def _sh3(text: str) -> set[str]:
    t = text.split(" ")
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sat still"),        # shares a shingle with doc 0
    (2, "completely unrelated words appear here now"),
    (3, "to be"),                                # < 3 tokens: no shingles
    (4, "spam spam spam spam spam spam"),        # degenerate repetition
]
BENCH = [
    (100, "the quick brown fox jumps high"),
    (101, "words appear here now and then"),
]


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(TRAIN), mk(BENCH)


def test_contamination_matches_bruteforce(frames):
    train, bench = frames
    got = {r["doc_id"]: r for r in contamination_scan(train, bench).collect()}
    bench_sh = set().union(*(_sh3(t) for _, t in BENCH))
    assert set(got) == {0, 1, 2, 4}  # doc 3 has no shingles -> no row
    for doc_id, text in TRAIN:
        sh = _sh3(text)
        if not sh:
            continue
        hits = len(sh & bench_sh)
        r = got[doc_id]
        assert (r["n_shingles"], r["n_hit"]) == (len(sh), hits)
        assert r["contam_e6"] == 1_000_000 * hits // len(sh)
    assert got[0]["n_hit"] > 0 and got[2]["n_hit"] > 0  # real contamination
    assert got[4]["n_hit"] == 0


def test_repetition_matches_bruteforce(frames):
    train, _ = frames
    got = {r["doc_id"]: r for r in repetition_metrics(train).collect()}
    assert set(got) == {0, 1, 2, 4}  # short doc 3 excluded
    for doc_id, text in TRAIN:
        toks = text.split(" ")
        if len(toks) < 3:
            continue
        g2 = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
        g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["top2_e6"] == int(1_000_000 * 2 * max(g2.values()) / len(toks))
        assert r["dup3_e6"] == int(
            1_000_000 * (len(g3) - len(set(g3))) / len(g3)
        )
    # the spam doc maxes both signals
    assert got[4]["dup3_e6"] == 750_000  # 4 occurrences, 1 distinct
    assert got[4]["top2_e6"] > got[0]["top2_e6"]


def test_repetition_plan_is_shuffle_free(frames):
    train, _ = frames
    plan = (
        repetition_metrics(train)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
