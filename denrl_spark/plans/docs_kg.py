"""KG pipeline bound to the driver's ``documents`` table.

The driver's DuckDB oracle can only see the pre-registered parquet views
(TESTDATA.md), so for cross-checkable KG queries we derive a transcript
table deterministically FROM ``documents`` (4 docs -> one conversation)
and run distant supervision with a KB over the documents vocabulary
(single-token entities, so the alignment stages are expressible in ANSI
SQL for the oracle while the Spark side uses the full pipeline
machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from denrl_spark.sources.kb import KB

SYSTEM, OPERATOR, STRUCT = "SYSTEM", "OPERATOR", "STRUCTURE"

DOC_ENTITIES: list[tuple[str, str]] = [
    ("spark", SYSTEM),
    ("join", OPERATOR),
    ("scan", OPERATOR),
    ("sort", OPERATOR),
    ("merge", OPERATOR),
    ("filter", OPERATOR),
    ("window", OPERATOR),
    ("agg", OPERATOR),
    ("table", STRUCT),
    ("stream", STRUCT),
    ("batch", STRUCT),
    ("row", STRUCT),
    ("column", STRUCT),
    ("key", STRUCT),
]

R_RUNS = "/tech/system/runs"
R_CONSUMES = "/tech/operator/consumes"
R_PAIRS = "/tech/operator/pairs_with"
R_FEEDS = "/tech/structure/feeds"

DOC_TRIPLES: list[tuple[str, str, str]] = [
    ("spark", R_RUNS, "join"),
    ("spark", R_RUNS, "scan"),
    ("spark", R_RUNS, "sort"),
    ("spark", R_RUNS, "merge"),
    ("spark", R_RUNS, "filter"),
    ("spark", R_RUNS, "window"),
    ("join", R_CONSUMES, "table"),
    ("scan", R_CONSUMES, "row"),
    ("sort", R_CONSUMES, "key"),
    ("merge", R_CONSUMES, "batch"),
    ("filter", R_CONSUMES, "column"),
    ("window", R_CONSUMES, "stream"),
    ("join", R_PAIRS, "scan"),
    ("sort", R_PAIRS, "merge"),
    ("filter", R_PAIRS, "scan"),
    ("window", R_PAIRS, "agg"),
    ("agg", R_PAIRS, "join"),
    ("merge", R_PAIRS, "join"),
    ("table", R_FEEDS, "stream"),
    ("stream", R_FEEDS, "batch"),
    ("batch", R_FEEDS, "row"),
    ("row", R_FEEDS, "column"),
    ("column", R_FEEDS, "key"),
    ("key", R_FEEDS, "table"),
]


def docs_kb() -> KB:
    idx: dict[str, list[tuple[str, str]]] = {}
    for s, p, o in DOC_TRIPLES:
        idx.setdefault(s, []).append((p, o))
    return KB(dict(DOC_ENTITIES), frozenset(DOC_TRIPLES), idx)


def kb_values_sql() -> str:
    """The KB triple list as a SQL VALUES clause (for DuckDB oracles)."""
    rows = ", ".join(f"('{s}','{p}','{o}')" for s, p, o in DOC_TRIPLES)
    return f"(VALUES {rows}) AS kb(subj, pred, obj)"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> transcript rows, fully deterministic and
    SQL-reproducible: conv = doc_id // 4, turn = doc_id % 4."""
    d = load_documents(spark, sf_dir)
    return d.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") / 4).cast("long").cast("string"), 8, "0")).alias("conv_id"),
        F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("turn_idx"),
        F.when(F.pmod("doc_id", F.lit(2)) == 0, "user").otherwise("assistant").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id") * 7).alias("ts"),
    )


def kb_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DOC_TRIPLES, "subj string, pred string, obj string")


def distant_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-analog alignment join: (doc_id, subj, pred, obj) where both
    surfaces occur in the document. Broadcast nested-loop join against
    the tiny KB — the distant-supervision alignment expressed
    relationally (SQL-oracle-able)."""
    d = load_documents(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    kb = F.broadcast(kb_df(spark))
    return (
        d.join(
            kb,
            F.array_contains(d.toks, kb.subj) & F.array_contains(d.toks, kb.obj),
        )
        .select(F.col("doc_id").alias("sent_id"), "subj", "pred", "obj")
    )


def distant_pairs_sql(rel: str = "documents") -> str:
    return f"""
        SELECT d.doc_id AS sent_id, kb.subj, kb.pred, kb.obj
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {rel}) d
        JOIN {kb_values_sql()}
          ON list_contains(d.toks, kb.subj) AND list_contains(d.toks, kb.obj)
    """


def patterns_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-analog at single-token granularity: pattern = tokens strictly
    between the first subj and first obj occurrence (subj before obj),
    counted per predicate."""
    d = load_documents(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    kb = F.broadcast(kb_df(spark))
    j = d.join(
        kb,
        F.array_contains(d.toks, kb.subj) & F.array_contains(d.toks, kb.obj),
    ).select(
        "doc_id",
        "pred",
        F.array_position("toks", F.col("subj")).alias("sp"),
        F.array_position("toks", F.col("obj")).alias("op"),
        "toks",
    )
    pat = j.where(F.col("op") > F.col("sp") + 1).select(
        "pred",
        F.concat_ws(
            " ", F.slice("toks", (F.col("sp") + 1).cast("int"), (F.col("op") - F.col("sp") - 1).cast("int"))
        ).alias("pattern"),
    )
    return (
        pat.where(F.col("pattern") != "")
        .groupBy("pred", "pattern")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def patterns_between_sql(rel: str = "documents") -> str:
    return f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {rel}),
        j AS (
          SELECT d.doc_id, kb.pred,
                 list_position(d.toks, kb.subj) AS sp,
                 list_position(d.toks, kb.obj) AS op,
                 d.toks
          FROM d JOIN {kb_values_sql()}
            ON list_contains(d.toks, kb.subj) AND list_contains(d.toks, kb.obj)
        )
        SELECT pred,
               array_to_string(list_slice(toks, sp + 1, op - 1), ' ') AS pattern,
               count(*) AS cnt
        FROM j
        WHERE op > sp + 1
          AND array_to_string(list_slice(toks, sp + 1, op - 1), ' ') <> ''
        GROUP BY 1, 2
    """


def topk_patterns_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 top-k seed rule (min(int(0.1*distinct), 20); k==0 keeps all)
    over the mined doc patterns, tie-broken (cnt desc, pattern asc)."""
    from pyspark.sql import Window

    counts = patterns_between(spark, sf_dir)
    w = Window.partitionBy("pred").orderBy(F.desc("cnt"), F.asc("pattern"))
    k = counts.groupBy("pred").agg(F.count(F.lit(1)).alias("nd"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(k.withColumn("k", F.least(F.floor(0.1 * F.col("nd")), F.lit(20)))), "pred")
        .where((F.col("k") == 0) | (F.col("rank") <= F.col("k")))
        .select("pred", "pattern", "cnt", F.col("rank").cast("int").alias("rank"))
    )


def topk_patterns_docs_sql(rel: str = "documents") -> str:
    return f"""
        WITH counts AS ({patterns_between_sql(rel)}),
        ranked AS (
          SELECT pred, pattern, cnt,
                 row_number() OVER (PARTITION BY pred ORDER BY cnt DESC, pattern ASC) AS rank,
                 count(*) OVER (PARTITION BY pred) AS nd
          FROM counts
        )
        SELECT pred, pattern, cnt, CAST(rank AS INT) AS rank
        FROM ranked
        WHERE least(CAST(floor(0.1 * nd) AS BIGINT), 20) = 0
           OR rank <= least(CAST(floor(0.1 * nd) AS BIGINT), 20)
    """
