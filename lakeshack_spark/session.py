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


#: Unary logical nodes a "simple scan" chain may pass through: a freshly
#: loaded table plus the select/filter/withColumn/alias dressing our
#: loaders add. Anything else (Aggregate, Window, Generate, …) implies
#: either a shuffle boundary that already re-partitions or a plan whose
#: partition count is not the single-row-group file hazard this module
#: guards against.
_SIMPLE_SCAN_UNARY = frozenset(
    {"Project", "Filter", "SubqueryAlias", "View", "GlobalLimit",
     "LocalLimit", "Sort", "Repartition", "RepartitionByExpression"}
)


def _is_simple_scan(df) -> bool:
    """True iff the ANALYZED plan is projection/filter-class unary nodes
    and Unions over leaf relations. Walks the analyzed plan (cheap —
    analysis is cached on the QueryExecution and never triggers
    optimization or physical planning), so callers can skip the
    ``df.rdd`` partition probe — which forces a FULL physical planning
    pass + RDD conversion — on complex trees (ADVICE r8: several hot
    operators call :func:`spread_small_input`, making big query trees
    pay that planning pass twice). Union is explicitly ALLOWED: it
    introduces no shuffle, so a union of single-row-group scans stays
    under-partitioned — exactly the hazard this guard exists for
    (measured: the bench's planted-rows unions lost their spread and
    srp/repeated-passages serialized when unions were rejected).
    Unknown/exotic plans conservatively return True (fall through to
    the probe, preserving old behavior). The node budget also fails
    OPEN (VERDICT r9 #4): exhausting it means every node inspected so
    far was an allowed scan/union shape, and a >64-node union of
    single-row-group scans is precisely the serialization hazard —
    skipping the probe there would silently lose the spread. The
    budget exists only to bound the classifier's own walk, not to
    veto the probe."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        budget = 64
        while stack:
            budget -= 1
            if budget < 0:
                # Every node seen so far was an allowed shape — treat
                # the (pathologically wide) tree as a scan and let the
                # partition probe decide, preserving the spread on
                # wide unions of under-partitioned scans.
                return True
            node = stack.pop()
            kids = node.children()
            n = kids.size()
            if n == 0:
                continue
            name = node.getClass().getSimpleName()
            if n == 1 and name in _SIMPLE_SCAN_UNARY:
                stack.append(kids.apply(0))
            elif name == "Union":
                for i in range(n):
                    stack.append(kids.apply(i))
            else:
                return False
        return True
    except Exception:  # pragma: no cover - py4j surface drift
        return True


def spread_small_input(df):
    """Repartition an under-partitioned DataFrame to defaultParallelism.

    Single-row-group parquet files defeat both 128 MB split sizing AND
    ``spark.sql.files.minPartitionNum`` (byte-range splits can't divide a
    row group: only the split holding the group's midpoint gets rows), so
    a small-file table scans as ONE partition and every heavy per-row
    operator downstream serializes on one core (measured: simhash
    near-pairs, the quality trio, SRP banding all single-task at bench
    scale). Heavy operators call this on their input: a corpus that is
    already partitioned at cluster scale passes through untouched — no
    gratuitous full-corpus shuffle — while an under-partitioned one pays
    one small shuffle to use the whole machine. Values are unaffected
    (pure repartition).

    The partition probe (``df.rdd.getNumPartitions()``) forces physical
    planning of the whole tree, so it only runs when the analyzed plan
    is a simple scan chain (:func:`_is_simple_scan`) — exactly the shape
    the single-row-group hazard applies to; joins/aggregates upstream
    mean a shuffle already set the partition count and the probe would
    be pure planning overhead."""
    if not _is_simple_scan(df):
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans
        return df
    return df.repartition(par) if n < par else df


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
