"""Sequence packing: assign documents to fixed-token-capacity training
sequences ("bins"), the step between curation and tokenized training
shards in an LLM data pipeline.

Semantics: deterministic NEXT-FIT per shard — docs are ordered by
doc_id within their shard; each doc appends to the current bin if it
fits (used + n_tokens <= capacity), else opens the next bin. A doc
longer than the capacity occupies a bin alone (emitted, not dropped —
truncation is the tokenizer's call, not the packer's). Output:
(shard, doc_id, n_tokens, bin_idx, offset_tokens).

Scale shape: packing is inherently SEQUENTIAL within an output shard
(each placement depends on the bin state the previous doc left), so the
operator parallelizes the way production packers do — across shards.
Shard = pmod(doc_id, n_shards) here; at 100 TB, n_shards is the output
shard count (10^4-10^5). Memory is bounded REGARDLESS of shard size:
the implementation is repartition-by-shard + sortWithinPartitions +
``mapInPandas`` over the ARROW BATCH ITERATOR, carrying the
(shard, bin, used) state across batches and resetting on shard change
— a shard's rows stream through one batch at a time, never
materializing as one pandas frame (a groupBy().applyInPandas packer
would concatenate the whole shard into a single in-memory frame, the
unbounded-per-key-state shape this engine bans). The per-doc Python
step is a constant-time state update; the oracle twin replays the
identical recurrence as a recursive CTE that advances every shard one
row per recursion step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PACK_SCHEMA = (
    "shard long, doc_id long, n_tokens int, bin_idx long, offset_tokens long"
)


class NextFitPacker:
    """The pure next-fit recurrence, one placement at a time — the
    single source of the packing semantics, shared by the Arrow state
    machine below and the property tests (hypothesis drives it without
    Spark). A doc that does not fit the current bin opens the next;
    an oversized doc occupies its bin alone."""

    __slots__ = ("capacity", "bin_idx", "used")

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.bin_idx = 0
        self.used: int | None = None

    def place(self, n_tokens: int) -> tuple[int, int]:
        """Returns (bin_idx, offset_tokens) for a doc of n_tokens."""
        n = int(n_tokens)
        if self.used is None:
            self.bin_idx, off, self.used = 0, 0, n
        elif self.used + n <= self.capacity:
            off, self.used = self.used, self.used + n
        else:
            self.bin_idx, off, self.used = self.bin_idx + 1, 0, n
        return self.bin_idx, off


def pack_sequences(
    docs: DataFrame, capacity: int = 128, n_shards: int = 64
) -> DataFrame:
    """Next-fit packing of ``docs`` (doc_id, text, ...) into
    ``capacity``-token bins, sharded pmod(doc_id, n_shards). See the
    module docstring for the bounded-memory execution shape."""
    d = (
        docs.select(
            F.pmod("doc_id", F.lit(n_shards)).cast("long").alias("shard"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
        )
        # all rows of a shard land in one partition, in (shard, doc_id)
        # order — multiple shards may share a partition; the state
        # machine below resets on the shard boundary
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
    )

    def pack(batches):
        # state survives ACROSS Arrow batches within the partition
        cur_shard, packer = None, None
        for pdf in batches:
            bins, offs = [], []
            for s, n in zip(pdf["shard"], pdf["n_tokens"]):
                if s != cur_shard:
                    cur_shard, packer = s, NextFitPacker(capacity)
                b, off = packer.place(n)
                bins.append(b)
                offs.append(off)
            pdf = pdf.copy()
            pdf["bin_idx"] = bins
            pdf["offset_tokens"] = offs
            yield pdf[["shard", "doc_id", "n_tokens", "bin_idx", "offset_tokens"]]

    return d.mapInPandas(pack, PACK_SCHEMA)


def pack_sequences_sql(
    rel: str = "documents", capacity: int = 128, n_shards: int = 64
) -> str:
    """The identical next-fit recurrence as a recursive CTE: each
    recursion step places row rn+1 of EVERY shard (depth = max docs per
    shard, not total docs)."""
    return f"""
        WITH RECURSIVE base AS (
          SELECT doc_id % {n_shards} AS shard, doc_id,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                 row_number() OVER (PARTITION BY doc_id % {n_shards}
                                    ORDER BY doc_id) AS rn
          FROM {rel}),
        pack AS (
          SELECT shard, doc_id, n_tokens, rn,
                 CAST(0 AS BIGINT) AS bin_idx, CAST(0 AS BIGINT) AS offset_tokens,
                 CAST(n_tokens AS BIGINT) AS used
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.shard, b.doc_id, b.n_tokens, b.rn,
                 CASE WHEN p.used + b.n_tokens <= {capacity}
                      THEN p.bin_idx ELSE p.bin_idx + 1 END,
                 CASE WHEN p.used + b.n_tokens <= {capacity}
                      THEN p.used ELSE 0 END,
                 CASE WHEN p.used + b.n_tokens <= {capacity}
                      THEN p.used + b.n_tokens ELSE CAST(b.n_tokens AS BIGINT) END
          FROM pack p JOIN base b ON b.shard = p.shard AND b.rn = p.rn + 1)
        SELECT shard, doc_id, n_tokens, bin_idx, offset_tokens FROM pack
    """
