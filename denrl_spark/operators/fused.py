"""Fused extraction operator: transcripts -> triples in ONE Arrow pass.

The modular path (build_instances -> score_instances -> assemble_triples)
materializes the instance table between stages; the token/tag arrays are
duplicated per query instance (~2x per sentence) and cross the
JVM<->Python Arrow boundary three times. That traffic — not compute —
was the measured scaling ceiling (memory-bandwidth-bound at high worker
counts). This operator is the extraction path's whole-stage-codegen
analog: text goes in, (sent_id, ent1, ent1_tag, ent2, ent2_tag) comes
out, and all intermediate structures live in Python worker memory for
one sentence at a time.

Semantics are EXACTLY the modular path's (tests assert multiset
equality per sentence): gold mode folds distant-supervision tags
(instances_for_turn + sentence_triples); pred mode runs the frozen
scorer + Viterbi per instance before assembly (emissions_for_instance +
viterbi_batch at sentence granularity).

Use this for pure extraction jobs; use the modular operators when the
instance table itself is needed (bootstrap selection, pattern mining,
negative sampling)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from denrl_spark.operators.scoring import (
    bio_transitions,
    build_label_list,
    emissions_from_spans,
    viterbi_batch,
)
from denrl_spark.operators.spans import TRIPLE_SCHEMA, sentence_triples
from denrl_spark.operators.tagging import instances_and_spans_for_turn
from denrl_spark.sources.kb import KB


def extract_triples_fused(
    transcripts: DataFrame,
    kb: KB | None = None,
    mode: str = "gold",
    n_partitions: int | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text) -> triples, single pass."""
    if mode not in ("gold", "pred"):
        raise ValueError(mode)
    kb = kb or KB.default()
    labels = build_label_list(kb)
    label_index = {l: i for i, l in enumerate(labels)}
    trans = bio_transitions(labels)

    spark = transcripts.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    cols = transcripts.select("conv_id", "turn_idx", "text").repartition(
        n_partitions, "conv_id", "turn_idx"
    )

    def gen(batches):
        for pdf in batches:
            # 1) tag all turns of the Arrow batch (spans kept for reuse)
            sent_instances: list[list[dict]] = []
            sent_spans: list[list] = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                ins, spans = instances_and_spans_for_turn(conv_id, int(turn_idx), text, kb)
                if ins:
                    ins.sort(key=lambda d: (d["query_id"], d["instance_id"]))
                    sent_instances.append(ins)
                    sent_spans.append(spans)

            # 2) pred mode: padded Viterbi over the batch's instances,
            # length-sorted into chunks so padding waste stays ~1 (the
            # long-tail turn inflates Tmax ~5x otherwise — the DP is
            # memory-bandwidth-bound, so padded bytes are wall time).
            # Per-sentence calls would be ~2-row DP batches where the
            # per-call overhead dominates; one giant padded batch wastes
            # bandwidth; sorted chunks are the middle that scales.
            if mode == "pred" and sent_instances:
                flat = [
                    (d, sp)
                    for ins, sp in zip(sent_instances, sent_spans)
                    for d in ins
                ]
                order = sorted(range(len(flat)), key=lambda i: len(flat[i][0]["tokens"]))
                chunk = 4096
                for lo in range(0, len(order), chunk):
                    idxs = order[lo : lo + chunk]
                    lengths = np.array(
                        [len(flat[i][0]["tokens"]) for i in idxs], dtype=np.int64
                    )
                    tmax = int(lengths.max())
                    em = np.zeros((len(idxs), tmax, len(labels)), dtype=np.float32)
                    for r, i in enumerate(idxs):
                        d, sp = flat[i]
                        em[r, : lengths[r], :] = emissions_from_spans(
                            d["tokens"], sp, d["query_id"], kb, label_index, d["instance_id"]
                        )
                    ids = viterbi_batch(em, trans, lengths)
                    for r, i in enumerate(idxs):
                        flat[i][0]["ner_tags"] = [labels[j] for j in ids[r, : lengths[r]]]

            # 3) assemble per sentence
            out: list[tuple] = []
            for ins in sent_instances:
                sid = ins[0]["sent_id"]
                out.extend(
                    (sid, t["ent1"], t["ent1_tag"], t["ent2"], t["ent2_tag"])
                    for t in sentence_triples(ins)
                )
            yield pd.DataFrame(
                out, columns=["sent_id", "ent1", "ent1_tag", "ent2", "ent2_tag"]
            )

    return cols.mapInPandas(gen, TRIPLE_SCHEMA)
