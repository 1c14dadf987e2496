"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query at sf0.001 — the full KG-construction
  gold path (documents -> transcripts -> distant-supervision instances ->
  BIO span grouping -> per-sentence triple assembly), returning the
  (sent_id, ent1, ent1_tag, ent2, ent2_tag) triple DataFrame.
- ``queries()`` / ``oracle_sql()``: operator registry, one entry per
  implemented operator family from SURVEY.md §2 plus the training-data
  pipeline operators (dedup / similarity / text analysis). SQL oracles
  live next to their Spark twins in denrl_spark/plans/driver_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: gold-path triple extraction at sf0.001."""
    from denrl_spark.operators.spans import assemble_triples
    from denrl_spark.operators.tagging import build_instances
    from denrl_spark.plans.docs_kg import docs_kb, transcripts_from_documents

    tr = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    ins = build_instances(tr, docs_kb())
    return assemble_triples(ins)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from denrl_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from denrl_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
