"""SparkSession factory tuned for the KG-construction workload.

Local mode stands in for a multi-executor cluster; every knob here is the
one you would set on a 1000-executor job, scaled down:

- ``spark.sql.shuffle.partitions`` ~ total cores (local) / 2-3x total cores
  (cluster). The default 200 over-parallelizes tiny local runs and
  under-parallelizes 100 TB ones.
- AQE on, with skew-join splitting: conversation lengths are long-tailed
  (FIXTURES.md), so per-conversation groupings skew without it.
- Arrow enabled: all scoring kernels are pandas UDFs (BASELINE.json
  input_hint: "no per-row Python").
- UTC session timezone so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app_name: str = "denrl_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session. ``cpus`` controls local parallelism;
    the bench harness uses this to evidence N -> 4N scaling (local[8] vs
    local[32])."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # single-JVM local mode: the driver heap IS the executor heap.
        # 24g OOMed the composite bootstrap pipeline at 6.9M turns
        # (32 concurrent tasks x multi-consumer caches); 48g clears it
        # with headroom on the 128 GiB box. On a real cluster this maps
        # to per-executor memory, not one process.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
