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

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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
