"""SparkSession factory and runtime configuration.

Local-mode defaults are tuned for the test harness (local[N], single JVM);
the same code runs unchanged on a cluster because every knob here is either
runtime-settable or a benign default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and required) to set on an already-running session,
# e.g. the driver harness's session which we do not construct ourselves.
_RUNTIME_CONFS = {
    # Deterministic timestamp semantics; matches the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # The events table stores timestamp[ns]; Spark rejects TIMESTAMP(NANOS)
    # unless it is surfaced as a raw long (nanoseconds since epoch).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime coalescing + skew-join handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Parquet pushdown (defaults are on; pinned for explicitness).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Arrow transfer for pandas/Pandas-UDF interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent).

    Call this before touching any table: the driver harness owns its own
    SparkSession, so everything we need must be settable at runtime.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - static conf on some builds
            pass
    try:
        # Split small file sets into at least one partition per core —
        # default 128 MB split sizing leaves a 32-core machine running a
        # 3-partition scan. On a real cluster this floor is harmless: big
        # datasets already exceed it.
        spark.conf.set(
            "spark.sql.files.minPartitionNum",
            str(spark.sparkContext.defaultParallelism),
        )
    except Exception:  # pragma: no cover
        pass
    return spark


def get_spark(
    app_name: str = "lakeshack_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` with a pre-set ``spark.master``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure_session(spark)
