"""SparkSession factory.

The reference hand-configures a fixed local session (KafkaSparkProcessor.scala:31-38:
local[6], 5g executor memory, Mongo URIs). Here the session is tuned for the
engine's actual execution model: Catalyst + AQE pick physical strategies, Arrow
accelerates the few pandas-UDF paths, and shuffle partitioning is sized by the
environment rather than hard-coded.

Scale notes (100 TB design target):
- AQE is on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast demotion replace every manual knob the reference hard-codes.
- ``spark.sql.shuffle.partitions`` here is a local-mode default; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as long
  as it is high enough (set it ~2-3x total cores there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs every entry point applies even when the caller (e.g. the
# verification driver) owns the session. All of these are runtime-settable.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark rejects by default;
    # read as int64 nanos and convert in the loader (sources/loaders.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics: parquet naive timestamps and the
    # DuckDB oracle both interpret in UTC.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for the pandas-UDF paths (multimodal, custom stateful ops).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-owned session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this deployment; loaders degrade gracefully
    return spark


def get_spark(app_name: str = "rtta-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a session tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_confs(spark)
    return spark
