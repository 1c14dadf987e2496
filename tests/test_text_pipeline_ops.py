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
        # overlapping-occurrence count can push 2*maxc past n; capped
        assert r["top2_e6"] == min(
            1_000_000, int(1_000_000 * 2 * max(g2.values()) / len(toks))
        )
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


def test_pack_sequences_matches_bruteforce(spark):
    from denrl_spark.operators.packing import pack_sequences

    # shard 0: exact fit at the boundary, then overflow; shard 1: an
    # oversized doc alone in a bin, followed by a normal doc
    rows = [
        (0, "w " * 9 + "w"),    # 10 tokens
        (2, "w " * 5 + "w"),    # 6 -> 10+6=16 == capacity: fits
        (4, "w"),               # 1 -> overflow, new bin
        (1, "w " * 39 + "w"),   # 40 > capacity: bin alone
        (3, "w " * 3 + "w"),    # 4 -> used 40+4 > 16: new bin
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["shard"], r["bin_idx"], r["offset_tokens"], r["n_tokens"])
        for r in pack_sequences(docs, capacity=16, n_shards=2).collect()
    }
    assert got == {
        0: (0, 0, 0, 10),
        2: (0, 0, 10, 6),   # exact fit: offset 10, used becomes 16
        4: (0, 1, 0, 1),    # boundary overflow opens bin 1
        1: (1, 0, 0, 40),   # oversized doc occupies bin 0 alone
        3: (1, 1, 0, 4),
    }


def test_pack_sequences_invariants(spark):
    from denrl_spark.operators.packing import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = pack_sequences(docs, capacity=128, n_shards=8).collect()
    assert len(rows) == docs.count()
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["bin_idx"]), []).append(r)
    for (shard, b), members in by_bin.items():
        members.sort(key=lambda r: r["doc_id"])
        used = 0
        for r in members:
            assert r["offset_tokens"] == used
            used += r["n_tokens"]
        # a bin over capacity can only be a single oversized doc
        assert used <= 128 or len(members) == 1


def test_pack_sequences_partition_invariant(spark):
    from denrl_spark.operators.packing import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs, 128, 8).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(11), 128, 8).collect()))
    assert a == b and len(a) > 0


def test_weighted_sample_matches_python_twin(spark):
    """A-ES weighted sampling: exact match against an independent
    Python recomputation of the same content-hash keys, and the
    weight bias is visible (heavy rows dominate the sample)."""
    import hashlib
    import math

    from denrl_spark.functions.ranking import weighted_sample

    rows = [("g", i, 1000.0 if i % 10 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = sorted(r["id"] for r in weighted_sample(df, "grp", "id", "w", k=15).collect())

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        u = (h + 1) / (2**48 + 1)
        return math.log(u) / w

    ranked = sorted(rows, key=lambda r: (-key(r[1], r[2]), r[1]))
    want = sorted(r[1] for r in ranked[:15])
    assert got == want
    # 20 heavy rows (w=1000) vs 180 light (w=1): heavies dominate top-15
    n_heavy = sum(1 for i in got if i % 10 == 0)
    assert n_heavy >= 12


def test_weighted_sample_rejects_nonpositive_weights(spark):
    from denrl_spark.functions.ranking import weighted_sample

    df = spark.createDataFrame(
        [("g", 1, 2.0), ("g", 2, -1.0)], "grp string, id long, w double"
    )
    with pytest.raises(Exception, match="positive weights"):
        weighted_sample(df, "grp", "id", "w", k=1).collect()


def test_weighted_sample_null_weight_keeps_diagnostic(spark):
    """A NULL weight must raise WITH the intended message — concat with a
    NULL operand would otherwise null the whole error string and the job
    would die message-less."""
    from denrl_spark.functions.ranking import weighted_sample

    df = spark.createDataFrame(
        [("g", 1, 2.0), ("g", 2, None)], "grp string, id long, w double"
    )
    with pytest.raises(Exception, match="positive weights; got NULL"):
        weighted_sample(df, "grp", "id", "w", k=1).collect()


def test_near_dedup_greedy_prefix_consistent(spark):
    """The invariant the streaming keep-list rests on, tested directly on
    the batch operator: folding a time-ordered corpus in two chunks with
    carried-over claims yields exactly the one-shot keep-list, for
    randomized corpora with duplicate groups straddling the split."""
    import random

    from denrl_spark.functions.textops import near_dedup_greedy

    rng = random.Random(20260817)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    for trial in range(5):
        n_groups = rng.randint(2, 5)
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(5, 9)))
            for _ in range(n_groups)
        ]
        rows = []
        t = 0
        for _ in range(rng.randint(8, 16)):
            g = rng.randrange(n_groups)
            txt = texts[g]
            if rng.random() < 0.3:  # near-dup: append one token
                txt += " " + rng.choice(words)
            rows.append((t, f"d{t}", txt))
            t += 1
        df = spark.createDataFrame(rows, "ts long, doc_id string, text string")
        split = rng.randint(1, len(rows) - 1)
        one_shot, _ = near_dedup_greedy(df, ["ts", "doc_id"])
        a = df.where(f"ts < {split}")
        b = df.where(f"ts >= {split}")
        kept_a, claims_a = near_dedup_greedy(a, ["ts", "doc_id"])
        kept_b, _ = near_dedup_greedy(b, ["ts", "doc_id"], prior_claims=claims_a)
        folded = {r["doc_id"] for r in kept_a.collect()} | {
            r["doc_id"] for r in kept_b.collect()
        }
        want = {r["doc_id"] for r in one_shot.collect()}
        assert folded == want, (trial, split, sorted(folded), sorted(want))


def test_near_dedup_greedy_double_delivery_collapses(spark):
    """Rows sharing the full order key (a double-delivered record) are
    collapsed to ONE kept row, not silently dropped — the tie would
    otherwise push the per-bucket flag sum past n_bands and erase every
    copy from the keep-list."""
    from denrl_spark.functions.textops import near_dedup_greedy

    rows = [
        (1, "d1", "alpha beta gamma delta epsilon"),
        (1, "d1", "alpha beta gamma delta epsilon"),  # exact double delivery
        (2, "d2", "one two three four five"),
    ]
    df = spark.createDataFrame(rows, "ts long, doc_id string, text string")
    kept, _ = near_dedup_greedy(df, ["ts", "doc_id"])
    got = sorted((r["ts"], r["doc_id"]) for r in kept.collect())
    assert got == [(1, "d1"), (2, "d2")]


def test_pii_redact_rescans_clean(spark):
    """pii_redact property: the redacted text re-scans to ZERO email/
    phone/SSN hits, counts equal the scan's per-pattern counts, and
    URLs survive untouched (boilerplate signal, not PII)."""
    from denrl_spark.functions.textops import pii_redact, pii_scan

    rows = [
        (0, "mail me at a.user@example.com or b_x@sub.dom.org today"),
        (1, "call +1 555-123-4567 or 555 987 6543 x22"),
        (2, "ssn 123-45-6789 and a url https://ex.org/p?q=1 stay split"),
        (3, "nothing sensitive here at all"),
        (4, "combo a@b.co 111-22-3333 222-333-4444"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    red = {r["doc_id"]: r for r in pii_redact(df).collect()}
    clean = spark.createDataFrame(
        [(d, red[d]["clean_text"]) for d, _ in rows], "doc_id long, text string"
    )
    rescan = {r["doc_id"]: r for r in pii_scan(clean).collect()}
    for d, _ in rows:
        assert rescan[d]["n_emails"] == 0
        assert rescan[d]["n_phones"] == 0
        assert rescan[d]["n_ssns"] == 0
    assert "https://ex.org/p?q=1" in red[2]["clean_text"]
    assert red[3]["clean_text"] == rows[3][1] and red[3]["n_redactions"] == 0
    assert red[4]["n_redactions"] == 3
    assert red[0]["clean_text"].count("<EMAIL>") == 2


def test_substring_dedup_bounds_shared_block_exactly(spark):
    """VERDICT r4 item 3 acceptance fixture: two otherwise-distinct
    docs share a 200-token block; the operator finds it in BOTH docs
    and bounds it exactly (start offset, start+200), with no spans in
    an unrelated doc."""
    from denrl_spark.functions.textops import SUBDUP_K, substring_dedup_spans

    shared = " ".join(f"s{i}" for i in range(200))
    doc_a = " ".join(f"a{i}" for i in range(10)) + " " + shared + " " + " ".join(
        f"z{i}" for i in range(7)
    )
    doc_b = " ".join(f"b{i}" for i in range(25)) + " " + shared
    doc_c = " ".join(f"c{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b), (2, doc_c)], "doc_id long, text string"
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in substring_dedup_spans(df).collect()
    )
    n_sh = 200 - SUBDUP_K + 1
    assert spans == [(0, 10, 210, n_sh), (1, 25, 225, n_sh)]


def test_substring_dedup_within_doc_and_adjacent_runs(spark):
    """Within-doc repetition counts as duplication, and two duplicated
    runs separated by MORE than k unique tokens stay separate spans
    while touching runs merge."""
    from denrl_spark.functions.textops import substring_dedup_spans

    k = 5
    run1 = " ".join(f"r{i}" for i in range(k))      # 5 tokens, dup'd twice in doc 0
    gap = " ".join(f"g{i}" for i in range(k + 3))   # > k unique tokens between
    doc0 = run1 + " " + gap + " " + run1
    doc1 = " ".join(f"u{i}" for i in range(12))     # all unique
    df = spark.createDataFrame([(0, doc0), (1, doc1)], "doc_id long, text string")
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dedup_spans(df, k=k).collect()
    )
    # doc0 tokens: run1 [0,5), gap [5,13), run1 [13,18)
    assert spans == [(0, 0, 5), (0, 13, 18)]


def test_quality_buckets_terciles_and_determinism(spark, tmp_path):
    """text_quality_buckets: per-lang tercile sizes follow the integer
    rule (3*rn <= n / <= 2n), every doc gets exactly one bucket, the
    head bucket really does hold the best mean-bigram-LM scores, and
    the output is a pure function of the table (repartition-invariant)."""
    import math

    from denrl_spark.plans.driver_queries import (
        text_bigram_lm,
        text_quality_buckets,
    )

    rows = []
    did = 0
    for lang, n_docs in (("en", 7), ("fr", 3), ("zh", 1)):
        for i in range(n_docs):
            # vary fluency: more-repeated bigrams -> higher P(w2|w1)
            body = " ".join(["alpha beta"] * (i + 2) + [f"rare{lang}{i}"])
            rows.append((did, body, lang, "s", len(body)))
            did += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = text_quality_buckets(spark, sf).toPandas()
    assert len(out) == did and out["doc_id"].is_unique
    for lang, grp in out.groupby("lang"):
        n = len(grp)
        sizes = grp["bucket"].value_counts().to_dict()
        assert sizes.get("head", 0) == n // 3
        assert sizes.get("middle", 0) == (2 * n) // 3 - n // 3
        assert sizes.get("tail", 0) == n - (2 * n) // 3
    # ranking actually follows the LM score: per lang, every head doc's
    # mean bigram log-prob >= every tail doc's
    lm = text_bigram_lm(spark, sf).toPandas()
    lm["mean_lp"] = lm["lp2_e4"] / lm["n_bigrams"]
    j = out.merge(lm, on="doc_id")
    for lang, grp in j.groupby("lang"):
        heads = grp[grp["bucket"] == "head"]["mean_lp"]
        tails = grp[grp["bucket"] == "tail"]["mean_lp"]
        if len(heads) and len(tails):
            assert heads.min() >= tails.max()
    # single-doc language: lone doc lands in tail (3*1 > 2*1)
    assert out[out["lang"] == "zh"]["bucket"].tolist() == ["tail"]


def test_containment_pairs_doc_in_doc(spark):
    """containment_pairs finds a short doc quoted inside a long one
    (containment ~1, Jaccard far below the 0.2 dedup threshold), does
    NOT pair docs that share only boilerplate above the df cap, and
    reports exact shingle counts."""
    from denrl_spark.functions.textops import containment_pairs, jaccard_pairs

    quote = " ".join(f"quoted{i}" for i in range(12))  # 10 shingles
    host = " ".join(f"body{i}" for i in range(80)) + " " + quote
    boiler = "all rights reserved by the license holder of record"
    rows = [
        (0, quote),
        (1, host),
        # 20 docs sharing ONLY the boilerplate line (df=22 > cap=16):
        # no rare shared shingle -> no candidate
        *[(10 + i, f"unique{i}a unique{i}b unique{i}c " + boiler) for i in range(20)],
        (99, boiler),  # boilerplate-only doc: also unpaired
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(0, 1)]
    r = out[0]
    assert r["na"] == 10 and r["cont_e6"] == 1_000_000  # quote fully contained
    assert r["shared"] == 10
    # the same pair is invisible to Jaccard at the dedup threshold
    j = jaccard_pairs(docs, min_j_e6=200_000).where(
        "doc_a = 0 and doc_b = 1"
    ).count()
    assert j == 0


def test_source_mixture_weights(spark, tmp_path):
    """text_source_mixture: exact token counts per source, shares sum
    to ~1, and the uniform-target weight inverts the share (a source
    with half the tokens gets twice the multiplier)."""
    from denrl_spark.plans.driver_queries import text_source_mixture

    rows = [
        (0, "a b c d", "web", "x", 1),      # 4 tokens
        (1, "e f g h", "web", "x", 1),      # 4 tokens
        (2, "i j", "books", "x", 1),        # 2 tokens
        (3, "k l", "books", "x", 1),        # 2 tokens
        (4, "m n o p", "code", "x", 1),     # 4 tokens
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["source"]: r for r in text_source_mixture(spark, sf).collect()}
    assert out["web"]["n_tokens"] == 8 and out["books"]["n_tokens"] == 4
    assert sum(r["share_e6"] for r in out.values()) in range(999_998, 1_000_001)
    # total=16, 3 sources: weight = 1e6 * 16 / (3 * n_tokens)
    assert out["web"]["weight_e6"] == 666_666
    assert out["books"]["weight_e6"] == 1_333_333
    assert out["code"]["weight_e6"] == 1_333_333  # also 4 tokens
    # the half-share source gets exactly twice the multiplier
    assert out["books"]["weight_e6"] // 2 - out["web"]["weight_e6"] in (0, -1, 1)


def test_hash_linear_score_transcription_and_plan(spark):
    """hash_linear_score equals a direct Python transcription of the
    frozen-hash weight rule, and its plan has no shuffle (the fold
    happens in the scan stage)."""
    import hashlib

    from denrl_spark.functions.textops import hash_linear_score

    def w(tok):
        return int(hashlib.md5(f"{tok}|w".encode()).hexdigest()[:12], 16) % 2001 - 1000

    rows = [(0, "alpha beta gamma"), (1, "alpha"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in hash_linear_score(docs).collect()}
    for did, text in rows:
        toks = text.split(" ")
        exp = sum(w(t) for t in toks)
        assert out[did]["score"] == exp
        assert out[did]["n_tokens"] == len(toks)
        assert out[did]["keep"] == int(exp >= 0)
    plan = hash_linear_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curation_pipeline_composes(spark, tmp_path):
    """End-to-end curation composition over one corpus: model-based
    quality keep -> near-dup keep-list -> intersection -> mixture
    weights on the survivors -> sequence packing. Asserts the stage
    CONTRACTS compose (ids flow through, no schema friction) and each
    stage only ever shrinks the survivor set."""
    from denrl_spark.functions.textops import hash_linear_score, near_dup_clusters
    from denrl_spark.operators.packing import pack_sequences
    from denrl_spark.plans.driver_queries import text_source_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    kept_q = hash_linear_score(docs).where("keep = 1").select("doc_id")
    n1 = kept_q.count()
    assert 0 < n1 <= n0

    reps = near_dup_clusters(docs).where("is_rep").select("doc_id")
    survivors = docs.join(kept_q, "doc_id").join(reps, "doc_id")
    n2 = survivors.count()
    assert 0 < n2 <= n1

    sf = str(tmp_path)
    survivors.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    mix = text_source_mixture(spark, sf)
    rows = mix.collect()
    assert {r["source"] for r in rows} == {
        r["source"] for r in survivors.select("source").distinct().collect()
    }
    assert sum(r["share_e6"] for r in rows) <= 1_000_000

    packed = pack_sequences(survivors, capacity=128, n_shards=4)
    assert packed.count() == n2  # every survivor lands in exactly one bin slot


def _winnow_py(text, k, w, cap=4096):
    """Literal winnowing transcription: packed (hash, rightmost-tie)
    min per trailing window of w k-gram hashes."""
    import hashlib

    toks = text.split(" ")
    if len(toks) < k:
        return set()
    packed = []
    for i in range(len(toks) - k + 1):
        gram = " ".join(toks[i:i + k])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:12], 16)
        packed.append(h * cap + (cap - 1 - (i + 1)))
    n = len(packed)
    sel = set()
    for j in range(min(w, n), n + 1):  # 1-based window end
        lo = max(1, j - w + 1)
        sel.add(min(packed[lo - 1:j]))
    return {(cap - 1 - (p % cap), p // cap) for p in sel}


def test_winnowing_matches_transcription(spark):
    from denrl_spark.functions.textops import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    texts = [
        (0, "a b c d e f g h i j k l m"),
        (1, "a b c d"),                   # exactly one k-gram
        (2, "a b c"),                     # shorter than k -> no rows
        (3, "x x x x x x x x"),           # all-equal hashes: tie rule
        (4, "p q r s t u"),               # n_kg < w: single window
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(d).collect():
        got.setdefault(r["doc_id"], set()).add((r["kpos"], r["fp"]))
    for doc_id, text in texts:
        want = _winnow_py(text, WINNOW_K, WINNOW_W)
        assert got.get(doc_id, set()) == want, doc_id


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a run of >= w + k - 1 tokens share at least
    one fingerprint VALUE (the winnowing coverage guarantee); two
    token-disjoint docs share none."""
    from denrl_spark.functions.textops import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    run = " ".join(f"shared{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    d = spark.createDataFrame(
        [
            (0, "alpha beta gamma " + run + " delta epsilon"),
            (1, "one two three four five " + run),
            (2, "zeta eta theta iota kappa lam mu nu xi"),
        ],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {0: set(), 1: set(), 2: set()}
    for r in winnow_fingerprints(d).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1]
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_winnowing_density_and_plan(spark):
    """Selected density on real docs is near the theoretical 2/(w+1),
    and the operator adds no Exchange beyond the parallelism lift."""
    from denrl_spark.functions.textops import WINNOW_W, winnow_fingerprints
    from denrl_spark.plans.driver_queries import _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    n_fp = winnow_fingerprints(docs).count()
    n_kg = docs.selectExpr(
        "sum(greatest(0, size(split(text, ' ')) - 3)) AS n"
    ).collect()[0]["n"]
    density = n_fp / n_kg
    assert 0.25 < density < 0.55  # 2/(w+1) = 0.4 at w=4
    plan = (
        winnow_fingerprints(spark.createDataFrame(
            [(0, "a b c d e")], "doc_id long, text string"
        ))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_gopher_rules_transcription_and_edges(spark):
    """Gopher gate vs a literal Python recomputation on crafted docs
    hitting each rule boundary exactly (49/50 words, mean word length
    3 and 10 exact, 79/80% alpha, 1/2 stopword hits)."""
    from denrl_spark.functions.textops import (
        GOPHER_MIN_STOP_HITS,
        STOPWORDS_EN,
        gopher_rules,
    )

    base = ["the"] + ["with"] + ["word"] * 48  # 50 words, 2 stop hits
    texts = [
        (0, " ".join(base)),                        # all rules pass
        (1, " ".join(base[:49])),                   # 49 words: len fails
        (2, " ".join(["the", "a"] + ["xy"] * 48)),  # mwl 2.1: fails low
        (3, " ".join(["the", "a"] + ["x" * 11] * 48)),  # mwl > 10: fails
        (4, " ".join(["the", "a"] + ["1234"] * 9 + ["word"] * 39)),  # 82% alpha
        (5, " ".join(["the", "a"] + ["1234"] * 11 + ["word"] * 37)),  # 78%: fails
        (6, " ".join(["the"] + ["word"] * 49)),     # 1 stop hit: fails
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(d).collect()}
    for doc_id, text in texts:
        toks = text.split(" ")
        n_words = len(toks)
        n_chars = sum(len(t) for t in toks)
        n_alpha = sum(1 for t in toks if any(c.isalpha() and ord(c) < 128
                                             for c in t))
        n_stop = sum(1 for t in toks if t.lower() in STOPWORDS_EN)
        r = got[doc_id]
        assert (r["n_words"], r["n_chars"], r["n_alpha_words"],
                r["n_stop_hits"]) == (n_words, n_chars, n_alpha, n_stop)
        len_ok = 50 <= n_words <= 100_000
        mwl_ok = 3 * n_words <= n_chars <= 10 * n_words
        alpha_ok = 5 * n_alpha >= 4 * n_words
        stop_ok = n_stop >= GOPHER_MIN_STOP_HITS
        assert (r["len_ok"], r["mwl_ok"], r["alpha_ok"], r["stop_ok"]) == (
            int(len_ok), int(mwl_ok), int(alpha_ok), int(stop_ok)), doc_id
        assert r["keep"] == int(len_ok and mwl_ok and alpha_ok and stop_ok)
    assert got[0]["keep"] == 1
    assert [got[i]["keep"] for i in range(1, 7)] == [0, 0, 0, 1, 0, 0]


def test_gopher_rules_plan_is_shuffle_free(spark):
    from denrl_spark.functions.textops import gopher_rules

    plan = (
        gopher_rules(spark.createDataFrame(
            [(0, "a b c")], "doc_id long, text string"
        ))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_hash_features_transcription_and_plan(spark):
    """text_hash_features vs a literal hashlib.md5 recomputation at
    sf0.001 (idx = 48-bit md5 prefix mod DIM, sign = 13th-nibble
    parity), plus the vectorizer invariants: per-doc tf sums to the
    doc's whitespace token count, |signed_tf| <= tf with matching
    parity, and the plan is scan -> agg (no joins, no windows)."""
    import hashlib
    from collections import defaultdict

    from denrl_spark.plans.driver_queries import (
        HASH_FEATURE_DIM,
        text_hash_features,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (int(r["doc_id"]), int(r["feature_idx"])): (
            int(r["tf"]),
            int(r["signed_tf"]),
        )
        for r in text_hash_features(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    want: dict = defaultdict(lambda: [0, 0])
    tok_counts: dict = defaultdict(int)
    for r in docs:
        for tok in r["text"].split(" "):
            if not tok:
                continue
            h = hashlib.md5(tok.encode()).hexdigest()
            idx = int(h[:12], 16) % HASH_FEATURE_DIM
            sgn = 1 if int(h[12], 16) % 2 == 0 else -1
            cell = want[(int(r["doc_id"]), idx)]
            cell[0] += 1
            cell[1] += sgn
            tok_counts[int(r["doc_id"])] += 1
    assert got == {k: tuple(v) for k, v in want.items()} and len(got) > 0
    per_doc = defaultdict(int)
    for (doc_id, _), (tf, signed) in got.items():
        per_doc[doc_id] += tf
        assert abs(signed) <= tf and (signed - tf) % 2 == 0
    assert per_doc == dict(tok_counts)
    plan = (
        text_hash_features(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------------------------------------
# text_chunk_windows: literal transcription + coverage/overlap properties
# ---------------------------------------------------------------------------

def _chunks_py(tokens, W=64, S=48):
    n = len(tokens)
    last = 0 if n <= W else -(-(n - W) // S)
    out = []
    for i in range(last + 1):
        start = i * S
        n_tok = min(W, n - start)
        out.append((i, start, n_tok, " ".join(tokens[start : start + n_tok])))
    return out


def test_chunk_windows_transcription_and_coverage(spark):
    from denrl_spark.plans.driver_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["text_chunk_windows"](spark, sf).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)  # every doc chunked, incl. short ones
    for doc_id, toks in docs.items():
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        expect = _chunks_py(toks)
        assert [
            (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
            for r in rows
        ] == expect
        # coverage: stitching chunks by their declared offsets rebuilds
        # the document exactly (final window always ends at the tail)
        rebuilt = list(toks[:0])
        for r in rows:
            seg = r["chunk_text"].split(" ") if r["chunk_text"] else [""]
            rebuilt[r["start_tok"] :] = seg
        assert rebuilt == toks
        assert rows[-1]["start_tok"] + rows[-1]["n_tok"] == len(toks)


def test_chunk_windows_plan_is_exchange_free(spark):
    from denrl_spark.plans.driver_queries import QUERIES

    plan = (
        QUERIES["text_chunk_windows"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # scan -> explode -> project; the only allowed Exchange is the
    # documents-scan parallelism lift (RoundRobin), never a key shuffle
    import re
    assert not re.search(r"Exchange hashpartitioning", plan)
    assert "SortMergeJoin" not in plan and "HashJoin" not in plan


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_bm25_matches_python_transcription(spark, tmp_path):
    """text_bm25 equals a literal Python transcription of the rational
    BM25 rule (two-step floor, exact integers) on a corpus with known
    tf/df/dl, and the top-k tie-break is doc_id-ascending."""
    from denrl_spark.plans.driver_queries import _BM25_TERMS, text_bm25

    rows = [
        (0, "join join hash pad pad pad", "en", "s", 1),
        (1, "join vector pad pad", "en", "s", 1),
        (2, "pad pad pad pad pad pad pad pad", "en", "s", 1),  # no query term
        (3, "join join hash pad pad pad", "en", "s", 1),       # tie with doc 0
        (4, "spark", "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    toks = {r[0]: r[1].split(" ") for r in rows}
    n, a = len(rows), sum(len(t) for t in toks.values())
    tf = {
        (d, w): toks[d].count(w)
        for d in toks for w in set(toks[d]) if w in _BM25_TERMS
    }
    df = {w: sum(1 for (_, w2) in tf if w2 == w) for w in _BM25_TERMS}
    exp = {}
    for (d, w), t in tf.items():
        dl = len(toks[d])
        c1 = (1_000_000 * 22 * a * t) // (10 * a * t + 3 * a + 9 * n * dl)
        c = (c1 * (2 * n - 2 * df[w] + 1)) // (2 * df[w] + 1)
        s, k = exp.get(d, (0, 0))
        exp[d] = (s + c, k + 1)
    order = sorted(exp, key=lambda d: (-exp[d][0], d))
    out = text_bm25(spark, sf).collect()
    assert [r["doc_id"] for r in out] == order
    for r in out:
        assert (r["score_e6"], r["n_terms"]) == exp[r["doc_id"]]
    # identical docs 0 and 3 tie exactly; ascending doc_id breaks it
    assert order.index(0) + 1 == order.index(3)
    assert exp[0][0] == exp[3][0]


def test_dedup_levenshtein_verify(spark, tmp_path):
    """dedup_levenshtein confirms a one-edit near-dup pair with the
    exact edit count, rejects an LSH candidate below sim 1/2, and the
    length prefilter provably never changes the result set (a
    doc-in-doc candidate is dropped by 2*lev<=maxlen anyway)."""
    from denrl_spark.plans.driver_queries import dedup_levenshtein

    base = " ".join(f"w{i}" for i in range(40))
    neardup = base.replace("w7 ", "w7x ", 1)          # 1 insert
    short = " ".join(f"w{i}" for i in range(6))       # contained prefix
    host = base + " " + " ".join(f"z{i}" for i in range(200))
    rows = [
        (0, base, "en", "s", 1),
        (1, neardup, "en", "s", 1),
        (2, short, "en", "s", 1),   # shares shingles with 0 but too short
        (3, host, "en", "s", 1),    # shares shingles, fails the sim cut
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {(r["doc_a"], r["doc_b"]): r for r in dedup_levenshtein(spark, sf).collect()}
    assert (0, 1) in out
    r = out[(0, 1)]
    assert r["lev"] == _lev(base, neardup) == 1
    maxlen = max(len(base), len(neardup))
    assert r["sim_e6"] == (1_000_000 * (maxlen - 1)) // maxlen
    # every emitted pair satisfies the output predicate; the skewed
    # candidates (0,2)/(0,3) fail 2*lev<=maxlen with or without the
    # prefilter (lev >= |la-lb| > maxlen/2)
    for (da, db), rr in out.items():
        assert 2 * rr["lev"] <= max(len(rows[da][1]), len(rows[db][1]))
    assert (0, 3) not in out and (0, 2) not in out
    assert 2 * _lev(base, host) > len(host)


def test_est_vs_exact_calibration(spark, tmp_path):
    """dedup_est_vs_exact on a corpus with an identical pair and a
    partial-overlap pair: identical docs estimate AND measure 1.0 with
    zero error; for every pair the estimate equals matching-band-count
    /8 recomputed from the signature table and the exact score equals
    Python set Jaccard over distinct 3-gram shingles."""
    from denrl_spark.functions.textops import minhash_signatures
    from denrl_spark.plans.driver_queries import dedup_est_vs_exact

    base = " ".join(f"w{i}" for i in range(30))
    half = " ".join(f"w{i}" for i in range(15)) + " " + " ".join(
        f"u{i}" for i in range(15)
    )
    rows = [(0, base, "en", "s", 1), (1, base, "en", "s", 1),
            (2, half, "en", "s", 1)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {(r["doc_a"], r["doc_b"]): r for r in dedup_est_vs_exact(spark, sf).collect()}
    assert (0, 1) in out
    r01 = out[(0, 1)]
    assert r01["n_match"] == 8 and r01["est_e6"] == 1_000_000
    assert r01["exact_e6"] == 1_000_000 and r01["err_e6"] == 0

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sig = {}
    for r in minhash_signatures(docs.select("doc_id", "text")).collect():
        sig.setdefault(r["doc_id"], {})[r["band"]] = r["mh"]

    def sh3(text):
        t = text.split(" ")
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    for (a, b), r in out.items():
        n_match = sum(sig[a][k] == sig[b][k] for k in range(8))
        assert r["n_match"] == n_match
        assert r["est_e6"] == (1_000_000 * n_match) // 8
        sa, sb = sh3(rows[a][1]), sh3(rows[b][1])
        j = (1_000_000 * len(sa & sb)) // len(sa | sb)
        assert r["exact_e6"] == j and r["err_e6"] == r["est_e6"] - j


def test_cluster_sizes_histogram_reconciles(spark, tmp_path):
    """dedup_cluster_sizes on a corpus with one 3-doc near-dup cluster
    and two singletons: histogram {3:1, 1:2}, n_docs partitions the
    corpus, and dedup rate = 1 - clusters/docs falls out exactly."""
    from denrl_spark.plans.driver_queries import dedup_cluster_sizes

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base, "en", "s", 1),
        (1, base, "en", "s", 1),
        (2, base.replace("today", "tonight"), "en", "s", 1),
        (3, "completely different text about spark shuffles and joins filters",
         "en", "s", 1),
        (4, "another unrelated document mentioning tables rows and columns only",
         "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {r["cluster_size"]: r for r in dedup_cluster_sizes(spark, sf).collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[1]["n_clusters"] == 2 and got[1]["n_docs"] == 2
    assert sum(r["n_docs"] for r in got.values()) == len(rows)


def test_cooccur_window_exact_enumeration(spark, tmp_path):
    """text_cooccur_window equals brute-force enumeration of +-2
    windows on a crafted corpus: each unordered pair counted once per
    ordered occurrence, lift matches the rational-PMI transcription,
    and a cross-doc pair never forms."""
    from denrl_spark.plans.driver_queries import text_cooccur_window

    rows = [
        (0, "a b c a", "en", "s", 1),
        (1, "c d", "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    toks = {r[0]: r[1].split(" ") for r in rows}
    exp: dict = {}
    for d, ts in toks.items():
        for i, w in enumerate(ts):
            for off in (1, 2):
                if i + off < len(ts):
                    k = tuple(sorted((w, ts[i + off])))
                    exp[k] = exp.get(k, 0) + 1
    t = sum(len(ts) for ts in toks.values())
    marg: dict = {}
    for ts in toks.values():
        for w in ts:
            marg[w] = marg.get(w, 0) + 1
    got = {(r["w1"], r["w2"]): r for r in text_cooccur_window(spark, sf).collect()}
    assert {k: r["n_pair"] for k, r in got.items()} == exp
    import math
    for (w1, w2), r in got.items():
        assert r["lift_e4"] == math.floor(
            10_000 * (exp[(w1, w2)] * t / (marg[w1] * marg[w2]))
        )
    # 'b'-'d' spans documents: absent
    assert ("b", "d") not in got
    # 'a a' at distance 3 in doc 0: too far apart
    assert ("a", "a") not in got


def test_shingle_df_profile_exact_buckets(spark, tmp_path):
    """dedup_shingle_df_profile: a shingle shared by 4 docs lands in
    log2 bucket 2 exactly (power-of-two boundary), singleton shingles
    in bucket 0, and postings reconcile with the distinct
    (doc, shingle) set."""
    from denrl_spark.plans.driver_queries import dedup_shingle_df_profile

    shared = "common block of words here"  # 3 shingles, df=4
    rows = [(i, shared + f" tail{i}a tail{i}b", "en", "s", 1) for i in range(4)]
    rows.append((9, "totally unique words appear here", "en", "s", 1))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    def sh3(text):
        t = text.split(" ")
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    df: dict = {}
    for _, text, *_ in rows:
        for s in sh3(text):
            df[s] = df.get(s, 0) + 1
    exp: dict = {}
    for s, d in df.items():
        b = d.bit_length() - 1
        n, p, m = exp.get(b, (0, 0, 0))
        exp[b] = (n + 1, p + d, max(m, d))
    got = {r["log2_bucket"]: (r["n_shingles"], r["n_postings"], r["max_df"])
           for r in dedup_shingle_df_profile(spark, sf).collect()}
    assert got == exp
    assert 2 in got and got[2][2] == 4  # the df=4 boilerplate block


def test_dedup_rate_by_source_attribution(spark, tmp_path):
    """dedup_rate_by_source attributes the dup loss to the flooding
    source: a feed whose docs all lose the keep-list election reports
    the high rate, the clean feed reports zero."""
    from denrl_spark.plans.driver_queries import dedup_rate_by_source

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base, "clean", "en", 1),           # cluster rep (min doc_id)
        (1, base, "flood", "en", 1),
        (2, base, "flood", "en", 1),
        (3, base.replace("today", "tonight"), "flood", "en", 1),
        (4, "completely different text about spark shuffles and joins filters",
         "clean", "en", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {r["source"]: r for r in dedup_rate_by_source(spark, sf).collect()}
    # all three flood docs join doc 0's cluster and lose to it
    assert got["flood"]["n_docs"] == 3 and got["flood"]["n_kept"] == 0
    assert got["flood"]["dup_rate_e6"] == 1_000_000
    assert got["clean"]["n_docs"] == 2 and got["clean"]["n_kept"] == 2
    assert got["clean"]["dup_rate_e6"] == 0
