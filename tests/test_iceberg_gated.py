"""Gated Iceberg-catalog integration test (VERDICT r2 #8).

The reference's checkpoint reload (trainer.py:1274-1349) maps to Iceberg
snapshot rollback in this engine's design (plans/checkpoints.py); the
sandbox image ships no Iceberg runtime jars (verified: pyspark/jars has
none, no network to fetch them), so the snapshot/rollback path is
exercised HERE when jars are present and explicitly skipped with the
documented reason otherwise. The manifest-based fallback (the substitute
actually used in-sandbox) is covered by
tests/test_pipeline_io.py::test_checkpoint_resume_skips_committed.

The test runs in a subprocess because the Iceberg extension + catalog
must be set at session construction and the test JVM is a singleton.
"""

import glob
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iceberg_jar() -> str | None:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = glob.glob(os.path.join(jars, "iceberg-spark-runtime*.jar"))
    hits += glob.glob("/opt/spark/jars/iceberg-spark-runtime*.jar")
    return hits[0] if hits else None


_SUBPROC = r"""
import sys
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.ck", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.ck.type", "hadoop")
    .config("spark.sql.catalog.ck.warehouse", {wh!r})
    .getOrCreate()
)
from denrl_spark.sources.io import write_table
df1 = spark.range(10).withColumnRenamed("id", "v")
write_table(df1, "ck.db.t", mode="overwrite")
snap1 = spark.sql("SELECT snapshot_id FROM ck.db.t.snapshots ORDER BY committed_at").collect()[0][0]
write_table(spark.range(5).withColumnRenamed("id", "v"), "ck.db.t", mode="append")
assert spark.table("ck.db.t").count() == 15
spark.sql(f"CALL ck.system.rollback_to_snapshot('db.t', {{snap1}})".format(snap1=snap1))
assert spark.table("ck.db.t").count() == 10, "rollback did not restore snapshot 1"
print("ICEBERG_OK")
"""


def test_iceberg_snapshot_rollback(tmp_path):
    if _iceberg_jar() is None:
        pytest.skip(
            "Iceberg runtime jars absent from this sandbox image (pyspark/jars "
            "has no iceberg-spark-runtime*, no network to fetch); the "
            "manifest-based checkpoint fallback is tested in "
            "test_pipeline_io.py"
        )
    code = _SUBPROC.format(root=ROOT, wh=str(tmp_path / "wh"))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ICEBERG_OK" in out.stdout
