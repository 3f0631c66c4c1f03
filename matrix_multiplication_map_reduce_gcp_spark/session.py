"""SparkSession bootstrap tuned for the local[32] test box but with
settings that carry to a real multi-executor cluster.

The reference hand-rolled its own scheduler/shuffle over HTTP+GCS
(reference orchestrator/main.py:84-146); here Spark's DAG scheduler,
AQE and shuffle service replace all of it — this module only sets the
knobs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "matrix_multiplication_map_reduce_gcp_spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = APP_NAME,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned session.

    Scale notes (these matter at 100 TB, and are no-ops locally):
    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching replace hand-tuned chunk sizes
      (the reference hardcoded chunk = n/10, orchestrator/main.py:47-48).
    - shuffle.partitions ~ cores locally; on a cluster this is sized by
      AQE's advisory partition size instead (coalescing from a high
      initial count), so we also set the advisory size explicitly.
    - Arrow enabled: every pandas_udf / toPandas crossing is batched.
    - UTC session TZ: keeps timestamps comparable with the DuckDB oracle.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Engine-wide posture: parquet TIMESTAMP(NANOS) columns read as
        # raw longs (Spark has no nanos timestamp type); the catalog's
        # events loader converts them to microsecond timestamps. For
        # sessions we don't build (the driver's), the same posture is
        # applied at runtime by catalog.ensure_nanos_conf — keep the
        # two in sync.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
