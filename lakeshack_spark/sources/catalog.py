"""Catalog of the harness's TPC-H-ish tables (TESTDATA.md) with
type-normalizing loaders.

Quirk handled here: ``events.ts`` has shipped in two physical flavors
across testdata generations — Parquet ``TIMESTAMP(NANOS)`` (which Spark
cannot represent; ``spark.sql.legacy.parquet.nanosAsLong`` surfaces it as
a raw nanos long) and plain ``TIMESTAMP(MICROS)``. ``normalize_events``
folds both into one canonical shape: ``ts`` = nanoseconds-since-epoch
long, plus a derived ``ts_utc`` TimestampType column. Queries that must
hash-match the DuckDB oracle exactly do arithmetic in the nanos domain
(``ts`` ↔ DuckDB ``epoch_ns(ts)`` — epoch_ns works on both flavors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from lakeshack_spark.session import configure_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events(df: DataFrame) -> DataFrame:
    """Canonical events shape regardless of the on-disk timestamp flavor:
    ``ts`` becomes nanoseconds-since-epoch (long), ``ts_utc`` a derived
    µs-truncated TimestampType. Map-only column expressions, so the same
    normalization runs unchanged over ``readStream`` inputs.
    """
    # The NTZ branch below is only correct under a UTC session timezone
    # (ntz→timestamp cast interprets the wall in the session zone), and
    # documented readStream usage wires normalize_events directly without
    # going through load_table — so pin the session config here, not just
    # there. Map-only; safe to call at stream-construction time.
    configure_session(df.sparkSession)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        # µs flavor: ts_utc IS the source value; ts derives from it with
        # exact integer epoch math (unix_micros is a long). NTZ walls are
        # UTC instants under the session's UTC timezone, matching
        # DuckDB's epoch_ns on the same naive value.
        return df.withColumn("ts_utc", F.col("ts").cast("timestamp")).withColumn(
            "ts", F.unix_micros(F.col("ts_utc")) * F.lit(1000)
        )
    # nanos-long flavor. Exact integer division: nanos epoch values
    # (~1.7e18) exceed double's 2^53 range, so `(ts / 1000).cast("long")`
    # could be off by 1 µs near boundaries.
    return df.withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table; normalizes the events timestamp."""
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = normalize_events(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
