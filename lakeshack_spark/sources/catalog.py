"""Catalog of the harness's TPC-H-ish tables (TESTDATA.md) with
type-normalizing loaders.

Quirk handled here: ``events.ts`` is Parquet ``TIMESTAMP(NANOS)``, which
Spark cannot represent (TimestampType is microseconds). We read it with
``spark.sql.legacy.parquet.nanosAsLong`` as a raw long ``ts`` (nanoseconds
since epoch) and add a derived ``ts_utc`` TimestampType column truncated to
microseconds. Queries that must hash-match the DuckDB oracle exactly do
arithmetic in the nanos domain (``ts`` ↔ DuckDB ``epoch_ns(ts)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table; normalizes the events timestamp."""
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # Exact integer division: nanos epoch values (~1.7e18) exceed
        # double's 2^53 range, so `(ts / 1000).cast("long")` could be off
        # by 1 µs near boundaries.
        df = df.withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
