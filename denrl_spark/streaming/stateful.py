"""Custom stateful streaming operator: per-conversation running KG stats.

``applyInPandasWithState`` keeps (n_turns, n_triples, last_turn_idx) per
conv_id across micro-batches — the incremental-maintenance surface a
production KG deployment needs (how many triples has this conversation
contributed so far; has it gone quiet). Arbitrary stateful processing is
the one Structured Streaming surface the windowed aggregations in
ingest.py can't express.

State is intentionally tiny (three longs) — at 10^12 turns the state
store scales with DISTINCT live conversations, so the operator keys by
conv_id only and never stores token payloads.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from denrl_spark.operators.tagging import instances_for_turn
from denrl_spark.operators.spans import sentence_triples
from denrl_spark.sources.kb import KB

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_triples", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_triples", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)


def running_conv_stats(stream: DataFrame, kb: KB | None = None) -> DataFrame:
    """transcript stream -> per-conversation running stats (update mode)."""
    kb = kb or KB.default()

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        n_turns, n_triples, max_turn = (
            state.get if state.exists else (0, 0, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            if len(pdf):
                max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
                ins = instances_for_turn(conv_id, int(turn_idx), text, kb)
                if ins:
                    ins.sort(key=lambda d: (d["query_id"], d["instance_id"]))
                    n_triples += len(sentence_triples(ins))
        state.update((n_turns, n_triples, max_turn))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "n_triples": [n_triples],
                "max_turn_idx": [max_turn],
            }
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PACK_OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("bin_idx", LongType()),
        StructField("offset_tokens", LongType()),
    ]
)
# used = -1 encodes "no bin opened yet" (NextFitPacker.used is None)
PACK_STATE_SCHEMA = StructType(
    [StructField("bin_idx", LongType()), StructField("used", LongType())]
)


def stream_pack_sequences(
    docs_stream: DataFrame, capacity: int = 128, n_shards: int = 64
) -> DataFrame:
    """Streaming sequence packing: the cross-batch twin of
    operators.packing.pack_sequences — curated documents arriving on a
    stream are appended to fixed-capacity training bins CONTINUOUSLY,
    with the open bin of every shard carried across micro-batches in
    the state store. The placement recurrence is the SAME NextFitPacker
    the batch operator and the property tests drive, so
    streaming == batch equality is structural, not coincidental.

    State per shard is two longs (open bin index, tokens used) —
    O(n_shards) total regardless of corpus size; the per-micro-batch
    group frame is bounded by the batch, so the unbounded-per-key
    concat the BATCH packer avoids with mapInPandas cannot occur here
    (each micro-batch's rows per shard stream through one call).

    Ordering contract (any online packer's): rows are placed in doc_id
    order WITHIN each micro-batch, and equality with the one-shot batch
    packing additionally requires doc_id-increasing arrival across
    batches — the natural order of a curation pipeline draining
    upstream shards; out-of-order delivery changes bin assignments the
    same way it would change any append-only layout."""
    from denrl_spark.operators.packing import NextFitPacker

    d = docs_stream.select(
        F.pmod("doc_id", F.lit(n_shards)).cast("long").alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (shard,) = key
        packer = NextFitPacker(capacity)
        if state.exists:
            bin_idx, used = state.get
            packer.bin_idx = int(bin_idx)
            packer.used = None if used < 0 else int(used)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("doc_id", ignore_index=True)
            bins, offs = [], []
            for n in pdf["n_tokens"]:
                b, off = packer.place(int(n))
                bins.append(b)
                offs.append(off)
            pdf["bin_idx"] = bins
            pdf["offset_tokens"] = offs
        state.update(
            (packer.bin_idx, -1 if packer.used is None else packer.used)
        )
        if len(pdf):
            yield pdf[
                ["shard", "doc_id", "n_tokens", "bin_idx", "offset_tokens"]
            ]

    return d.groupBy("shard").applyInPandasWithState(
        update,
        PACK_OUT_SCHEMA,
        PACK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


UPSERT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("last_t", LongType()),
        StructField("last_value_micro", LongType()),
        StructField("n_versions", LongType()),
        StructField("live", BooleanType()),
    ]
)
# the latest-wins winner so far + total version count per key
UPSERT_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("event_id", LongType()),
        StructField("v_micro", LongType()),
        StructField("op", StringType()),
        StructField("n_versions", LongType()),
    ]
)


def stream_upsert_latest(changelog: DataFrame) -> DataFrame:
    """Incrementally-maintained CDC latest-wins snapshot — the
    streaming twin of the batch compaction (driver query
    rel_upsert_latest): a changelog stream with columns (user_id,
    event_type, t, event_id, v_micro, op) keyed by (user_id,
    event_type) and sequenced by (t, event_id), maintained as
    per-key current state across micro-batches via
    ``applyInPandasWithState``. Each update emits the key's new
    state; ``live = false`` marks a key whose CURRENT winner is a
    tombstone (op = 'D') — the consumer's snapshot is the last
    update per key filtered to live (exactly the batch compaction's
    output; equality is test-asserted across micro-batch
    boundaries, including late/out-of-order records, which
    latest-wins absorbs without a watermark).

    State is O(1) per key (five scalars — the winner, never the
    log), so the state store scales with DISTINCT live keys, not
    with changelog volume; batch arrival order inside a micro-batch
    is irrelevant because the winner is recomputed from the (t,
    event_id) max, the same total order the batch max_by uses."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_id, event_type = key
        if state.exists:
            t, eid, v, op, n = state.get
        else:
            t, eid, v, op, n = -1, -1, 0, "", 0
        for pdf in pdfs:
            n += len(pdf)
            for r_t, r_eid, r_v, r_op in zip(
                pdf["t"], pdf["event_id"], pdf["v_micro"], pdf["op"]
            ):
                if (int(r_t), int(r_eid)) > (t, eid):
                    t, eid, v, op = int(r_t), int(r_eid), int(r_v), str(r_op)
        state.update((t, eid, v, op, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_type": [event_type],
                "last_t": [t],
                "last_value_micro": [v],
                "n_versions": [n],
                "live": [op == "U"],
            }
        )

    return changelog.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        UPSERT_OUT_SCHEMA,
        UPSERT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


SESSION_GAP = "30 minutes"
SESSION_WATERMARK = "2 hours"


def stream_session_stats(events: DataFrame, gap: str = SESSION_GAP,
                         watermark: str = SESSION_WATERMARK) -> DataFrame:
    """Gap-based session windows over the event stream via Spark's
    NATIVE ``session_window`` — the idiomatic Structured Streaming
    form of the batch lag/cumsum sessionizer (driver query
    rel_sessionize): per (user_id, session) the event count and exact
    window bounds, with sessions merged/extended across micro-batches
    by the state store and finalized once the WATERMARK passes the
    session end (append mode — late events inside the watermark merge
    into their session; beyond it they're dropped, the documented
    trade-off of any bounded-state sessionizer).

    Works identically over a BATCH DataFrame (session_window is an
    ordinary grouping expression there) — the streaming == batch
    equality is test-asserted across out-of-order micro-batches,
    including a late event that EXTENDS an already-open session.

    State per live (user, session) is the merged window bounds +
    count — O(1), keyed by user: at 10^12 turns the store scales with
    concurrently-OPEN sessions, not history. Boundary semantics: an
    event at exactly session_end starts a NEW session (session_window
    merges on strict <), vs rel_sessionize's lag-rule `gap > 1800`
    which keeps it — the two sessionizers agree except on exact-
    boundary ties; consumers pick one convention."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    w = F.session_window("ts", gap)
    return (
        src.groupBy("user_id", w.alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


DEBOUNCE_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("t", LongType()),
    ]
)
DEBOUNCE_STATE_SCHEMA = StructType([StructField("last_t", LongType())])


def stream_debounce(events: DataFrame, window_s: int = 60) -> DataFrame:
    """Streaming twin of the batch ingest debounce (driver query
    rel_debounce): per (user_id, event_type), emit an event iff a full
    quiet window preceded it — the gap to the key's previous event
    (kept OR dropped) exceeds ``window_s`` — with the last-seen
    timestamp carried across micro-batches in the state store
    (leading-edge-after-quiet semantics; a kept event does NOT re-arm
    the window, matching the batch lag rule exactly).

    State is ONE long per live key. Ordering contract: per-key
    monotone delivery (t, event_id) across micro-batches — debounce
    is the at-ingest stage reading the ordered source log; within a
    micro-batch arrival order is irrelevant (rows are sorted before
    the fold). Batch == streaming equality is pytest-asserted over
    multi-batch splits, including a burst straddling the boundary."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_id, event_type = key
        last_t = state.get[0] if state.exists else None
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        for eid, t in zip(rows["event_id"], rows["t"]):
            if last_t is None or int(t) - last_t > window_s:
                out.append((int(eid), user_id, event_type, int(t)))
            last_t = int(t)
        state.update((last_t,))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "event_type", "t"]
        )

    d = events.select(
        "event_id", "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    )
    return d.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        DEBOUNCE_OUT_SCHEMA,
        DEBOUNCE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
