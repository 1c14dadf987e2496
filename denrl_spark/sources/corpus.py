"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Shape follows BASELINE.json ``input_hint``: an Iceberg-style table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Generation is pure-functional in ``(seed, conv_id,
turn_idx)`` — every value is derived from a splitmix64 stream keyed by the
row key, so output is identical across partitionings and cluster sizes
(no driver-side RNG, no ``Date.now``-style nondeterminism). The structural
skeleton (conversation ids, long-tail turn counts) is built with JVM-side
expressions; only the text assembly runs in an Arrow-batched ``mapInPandas``.

Long-tail lengths: most conversations have 2-10 turns; every 97th has
60-180, exercising the skew handling the reference approximates with its
LengthGroupedSampler (trainer.py:2148-2170).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from denrl_spark.sources.kb import ENTITIES, TRIPLES

_MASK = (1 << 64) - 1

# Filler vocabulary — disjoint from every KB entity token so greedy
# longest-match alignment in tagging is unambiguous.
FILLER = (
    "the a an said that who which lived worked visited moved founded met "
    "reported yesterday today quietly again later still never always very "
    "near from with about under over between during before after because "
    "company city people group market report story meeting plan idea note "
    "left right big small old young early late"
).split()

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp()


def _mix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return (z ^ (z >> 31)) & _MASK


class _Stream:
    """Deterministic integer stream keyed by (seed, conv, turn)."""

    def __init__(self, seed: int, conv: int, turn: int):
        self.state = _mix((seed * 0x632BE59BD9B4E019) ^ _mix(conv * 2654435761 + turn))

    def next(self, mod: int | None = None) -> int:
        self.state = _mix(self.state)
        return self.state % mod if mod else self.state


def _filler(st: _Stream, lo: int, hi: int) -> list[str]:
    n = lo + st.next((hi - lo) + 1)
    return [FILLER[st.next(len(FILLER))] for _ in range(n)]


def make_turn_text(seed: int, conv: int, turn: int) -> str:
    """Deterministic text for one turn. ~10% no KB entity, ~30% entities
    with no related pair, rest >=1 seed triple — the pos/neg/ent taxonomy
    at run_jointmodel.py:614-649 (see FIXTURES.md generation rules)."""
    st = _Stream(seed, conv, turn)
    kind = st.next(100)
    toks = _filler(st, 3, 7)
    if kind < 10:  # all-O turn
        toks += _filler(st, 2, 8)
    elif kind < 40:  # entity-only: unrelated entity pair (or singleton)
        for _ in range(20):
            a = ENTITIES[st.next(len(ENTITIES))][0]
            b = ENTITIES[st.next(len(ENTITIES))][0]
            if (
                a != b
                and not any(s == a and o == b or s == b and o == a for s, _, o in TRIPLES)
            ):
                break
        toks += a.split() + _filler(st, 1, 4) + b.split()
    else:  # relational: one or two seed triples
        n_triples = 1 + (st.next(100) < 25)
        for _ in range(n_triples):
            s, _, o = TRIPLES[st.next(len(TRIPLES))]
            if st.next(100) < 30:  # sometimes object precedes subject
                s, o = o, s
            toks += s.split() + _filler(st, 1, 4) + o.split() + _filler(st, 1, 3)
    toks += _filler(st, 1, 4)
    return " ".join(toks[:60])


def n_turns_for(seed: int, conv: int) -> int:
    st = _Stream(seed, conv, 0xBEEF)
    if conv % 97 == 0:
        return 60 + st.next(121)
    return 2 + st.next(9)


def transcripts(spark: SparkSession, n_convs: int = 200, seed: int = 42) -> DataFrame:
    """Build the transcript DataFrame. Structure (conv ids, turn ranges,
    roles, timestamps) is pure Spark SQL; text bodies come from one
    Arrow-batched mapInPandas over (conv, turn) keys."""
    base = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv")
        .repartition(max(spark.sparkContext.defaultParallelism, 8), "conv")
    )

    def _nturns_fn(conv: pd.Series) -> pd.Series:
        return conv.map(lambda c: n_turns_for(seed, int(c))).astype("int32")

    # Arrow-batched even at synthesis time: keeps the whole repo free of
    # row-at-a-time BatchEvalPython (plan-hygiene sweep covers this path)
    _nturns = F.pandas_udf(_nturns_fn, "int")

    turns = (
        base.withColumn("n_turns", _nturns("conv"))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .drop("n_turns")
    )

    def gen(batches):
        for pdf in batches:
            convs = pdf["conv"].to_numpy()
            tids = pdf["turn_idx"].to_numpy()
            texts, roles, tools, tss = [], [], [], []
            for c, t in zip(convs, tids):
                c, t = int(c), int(t)
                texts.append(make_turn_text(seed, c, t))
                r = _Stream(seed, c, t ^ 0x5EED).next(10)
                if r == 0:
                    roles.append("tool")
                    tools.append("search" if (c + t) % 2 else "calc")
                else:
                    roles.append("user" if t % 2 == 0 else "assistant")
                    tools.append(None)
                tss.append(
                    pd.Timestamp(_EPOCH + (c % 100000) * 3600 + t * 7, unit="s", tz="UTC")
                )
            yield pd.DataFrame(
                {
                    "conv_id": [f"conv-{c:08d}" for c in convs],
                    "turn_idx": tids.astype("int32"),
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": tss,
                }
            )

    return turns.mapInPandas(gen, TRANSCRIPT_SCHEMA)
