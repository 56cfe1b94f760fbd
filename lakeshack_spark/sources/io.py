"""Generic source/sink layer: the format surface beyond Parquet.

The reference reads exactly one format (Parquet over pyarrow.fs local/S3,
lakeshack/lakeshack.py:82-90). Spark's DataSource V2 gives every format the
same pruned/pushdown scan pipeline, so the engine exposes a thin uniform
wrapper: schema-explicit reads (never infer on the hot path — inference is
a full extra pass over CSV/JSON), clustered writes for any format that
supports files, and the streaming variants.

S3/object stores: paths are scheme-transparent (`s3a://bucket/...`) — the
same code path the local tests pin; executor-side readers with pushdown are
the compute-near-storage answer to the reference's S3 Select offload (O2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from lakeshack_spark.session import configure_session

_READ_FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Schema-explicit batch read. CSV defaults to header=true."""
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {_READ_FORMATS}")
    configure_session(spark)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Streaming file source (schema required — streaming never infers)."""
    configure_session(spark)
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
