"""Sources & sinks (SURVEY.md §2.1).

- S1/S2: JSONL instance tables (the reference's native format,
  run_jointmodel.py:390-403 / run_lstm.py:606-614) — schema-declared
  reads (never inferSchema in production paths).
- S5: predictions sink — space-joined tag rows to text files
  (run_jointmodel.py:2062-2067).
- S6: triple CSV sinks (run_jointmodel.py:1048-1054).
- S7: metrics JSON log (KLloss_{epoch}.json analog).
- S4 lives in plans/checkpoints.py (manifest commit protocol).

Iceberg writes are gated: ``write_table`` uses the Iceberg catalog when
available, else partitioned parquet with identical layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

INSTANCE_SCHEMA_T = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("sent_id", T.LongType()),
        T.StructField("instance_id", T.LongType()),
        T.StructField("query_id", T.IntegerType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("ner_tags", T.ArrayType(T.StringType())),
    ]
)


def read_instances_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: JSONL -> instance DataFrame with declared schema."""
    return spark.read.schema(INSTANCE_SCHEMA_T).json(path)


def write_instances_jsonl(df: DataFrame, path: str) -> None:
    df.select([f.name for f in INSTANCE_SCHEMA_T.fields]).write.mode(
        "overwrite"
    ).json(path)


ORDER_MANIFEST = "_ORDER_MANIFEST.json"


def write_predictions_txt(
    scored: DataFrame,
    path: str,
    tags_col: str = "pred_tags",
    single_file: bool = False,
    single_file_max_rows: int = 1_000_000,
) -> None:
    """S5: one line per instance, space-joined predicted tags, globally
    ordered by (sent_id, instance_id).

    Default shape is DISTRIBUTED: ``repartitionByRange`` on the order
    key makes the partitions ordered, non-overlapping intervals, each
    sorted within; part files are written in partition-index order, so
    lexicographic part-file order IS global row order. A
    ``_ORDER_MANIFEST.json`` records that file order for consumers
    (``read_predictions_txt`` round-trips it). No task ever sees more
    than one partition of the output — the old ``repartition(1)``
    funneled the entire dataset through a single task, a scale-killer
    at any real corpus size.

    ``single_file=True`` keeps the one-file reference-parity layout but
    is guarded by an explicit row-count check (> ``single_file_max_rows``
    raises rather than silently funneling)."""
    spark = scored.sparkSession
    base = scored.select(
        F.concat_ws(" ", F.col(tags_col)).alias("value"),
        "sent_id",
        "instance_id",
    )
    def _write(parted: DataFrame) -> None:
        (
            parted.sortWithinPartitions("sent_id", "instance_id")
            .select("value")
            .write.mode("overwrite")
            .text(path)
        )

    if single_file:
        # persist around the guard: without it the count and the write
        # each run the full upstream scoring pipeline
        base = base.persist()
        try:
            n = base.count()
            if n > single_file_max_rows:
                raise ValueError(
                    f"single_file predictions output of {n} rows exceeds the "
                    f"{single_file_max_rows}-row guard; use the default "
                    "multi-part mode (order-manifested) for large outputs"
                )
            _write(base.repartition(1))
        finally:
            base.unpersist()
    else:
        _write(
            base.repartitionByRange(
                max(spark.sparkContext.defaultParallelism, 2),
                "sent_id",
                "instance_id",
            )
        )
    # manifest: sorted part names == global order (range partition i holds
    # strictly smaller keys than partition j for i < j). Listed and
    # written through the Hadoop FileSystem API so the sink works on any
    # supported FS (hdfs://, s3a://, file:), not just the local disk.
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    parts = sorted(
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.getPath().getName().startswith("part-")
    )
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path, ORDER_MANIFEST), True)
    try:
        out.write(bytearray(json.dumps(parts).encode("utf-8")))
    finally:
        out.close()


def read_predictions_txt(path: str) -> list[str]:
    """Read the S5 sink back in global order via the order manifest
    (driver-side consumer for eval-sized outputs; distributed consumers
    read the part files as a DataFrame and re-sort)."""
    with open(os.path.join(path, ORDER_MANIFEST)) as fh:
        parts = json.load(fh)
    lines: list[str] = []
    for p in parts:
        with open(os.path.join(path, p)) as fh:
            lines.extend(fh.read().splitlines())
    return lines


def write_triples_csv(triples: DataFrame, path: str) -> None:
    """S6: triple rows as CSV."""
    triples.write.mode("overwrite").option("header", True).csv(path)


def write_metrics_json(metrics: dict, out_dir: str, name: str) -> str:
    """S7: small metrics dict -> one JSON file (driver-side by design)."""
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, name)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=2)
    os.replace(tmp, p)
    return p


def read_glove_text(spark: SparkSession, path: str, dim: int = 300) -> DataFrame:
    """S3: GloVe-format text -> (token, vector array<double>).

    Reference run_lstm.py:388-413 parses each line as ``word v1..vdim``
    where the word may itself CONTAIN SPACES (the 840B file quirk the
    reference handles with ``line_split[:-vector_size]``) — so the last
    ``dim`` fields are the vector and everything before is the token.
    All JVM-side (text scan + split/slice/transform): the file streams
    through executors, never the driver, so a multi-GB vector file is
    fine."""
    parts = F.split(F.col("value"), " ")
    n = F.size(parts)
    return spark.read.text(path).select(
        F.concat_ws(" ", F.slice(parts, 1, n - dim)).alias("token"),
        F.transform(
            F.slice(parts, n - dim + 1, dim), lambda x: x.cast("double")
        ).alias("vector"),
    )


def embedding_matrix(
    vocab: DataFrame, embeddings: DataFrame, dim: int, seed: int = 42
):
    """S3: vocab-aligned (V, dim) numpy weight matrix, the broadcastable
    analog of run_lstm.py:367-385 — known tokens take their pretrained
    vector, OOV tokens take a normal(scale=0.2) draw. The reference uses
    ambient np.random state; the rebuild derives each OOV vector from
    blake2b(seed, token) so the matrix is identical under any
    partitioning/ordering (SURVEY §7 seeded-randomness rule). The
    collect is vocab-sized by construction (A5 caps the vocab) — the
    same V x dim matrix the reference materializes and broadcasts."""
    import numpy as np

    from denrl_spark.operators.tagging import stable_id

    rows = (
        vocab.select("token", "token_id")
        .join(embeddings, "token", "left")
        .collect()
    )
    v = max(r["token_id"] for r in rows) + 1 if rows else 2
    weight = np.zeros((v, dim), dtype=np.float64)
    seen = np.zeros(v, dtype=bool)
    for r in rows:
        if r["vector"] is not None:
            weight[r["token_id"]] = r["vector"]
        else:
            rng = np.random.RandomState(stable_id(seed, r["token"]) % (2**32))
            weight[r["token_id"]] = rng.normal(scale=0.2, size=dim)
        seen[r["token_id"]] = True
    for tid in np.flatnonzero(~seen):  # specials (PAD=0, UNK=1)
        rng = np.random.RandomState(stable_id(seed, int(tid)) % (2**32))
        weight[tid] = rng.normal(scale=0.2, size=dim)
    return weight


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_col``
    between tables bucketed the same way need NO shuffle (Catalyst
    reuses the bucket layout). This is the co-located-join strategy for
    repeatedly-joined big tables (e.g. instance tables keyed by sent_id
    across bootstrap rounds) at 100 TB."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def write_table(
    df: DataFrame,
    path_or_table: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Iceberg-or-parquet sink: ``catalog.db.table`` writes through the
    Iceberg catalog when its extensions are on the classpath (not in this
    sandbox), otherwise a filesystem path gets partitioned parquet."""
    if "." in path_or_table and not path_or_table.startswith(("/", "file:", "s3:")):
        try:
            w = df.writeTo(path_or_table)
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        except Exception as e:
            raise RuntimeError(
                f"catalog write to {path_or_table!r} failed (no Iceberg "
                "catalog in this environment, or the write itself errored "
                "— see the chained cause); pass a filesystem path for the "
                "parquet fallback"
            ) from e
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_table)
