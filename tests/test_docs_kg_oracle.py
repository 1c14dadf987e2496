"""Hash-level oracle tests for the flagship extraction path.

The driver's DuckDB check compares (row count, schema, sorted value
hash); this test replicates that comparison locally for the doc-keyed
gold-triple / graph queries (docs_kg.gold_triples_by_doc family), so
the full fused pipeline (tagging -> fold -> span grouping -> assembly,
reference run_jointmodel.py:845-933) is verified against an independent
ANSI-SQL derivation, not just against transcribed Python kernels.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from denrl_spark.plans import docs_kg

SF_DIR = "/root/testdata/sf0.001"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize(
    "fn,sql",
    [
        (docs_kg.gold_triples_by_doc, docs_kg.gold_triples_by_doc_sql()),
        (docs_kg.edges_by_doc, docs_kg.edges_by_doc_sql()),
        (docs_kg.vertices_by_doc, docs_kg.vertices_by_doc_sql()),
    ],
    ids=["gold_triples", "edges", "vertices"],
)
def test_by_doc_queries_match_duckdb(spark, duck, fn, sql):
    sdf = _normalize(fn(spark, SF_DIR).toPandas())
    odf = _normalize(duck.execute(sql).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(sdf, odf)
