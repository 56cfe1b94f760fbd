"""Clustered Parquet writer.

The reference produces clustered files *externally* and its docs prescribe
exactly this Spark recipe (docs/source/lakeshack.rst:252-263):
``repartitionByRange(n, col)`` + ``sortWithinPartitions(col)``. Range
partitioning gives each output file a narrow, (mostly) non-overlapping
cluster-key interval — the property the zone-map metastore exploits ("1 + ε
row groups per partition per id", docs/source/lakeshack.rst:443-445) — and
sorted data compresses better.

Scale notes: ``repartitionByRange`` samples the key distribution, so skewed
keys still split evenly across output files; pick ``n_files`` so each file
lands near the row-group/file sweet spot (~128 MB-1 GB at 100 TB scale).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_column: str,
    n_files: int,
    sort_columns: Sequence[str] = (),
    partition_by: Sequence[str] = (),
    row_group_rows: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` range-clustered, internally sorted
    Parquet files, optionally under Hive-style partition dirs (the
    reference's load-date convention, docs/source/lakeshack.rst:103-161).
    """
    out = df.repartitionByRange(n_files, cluster_column).sortWithinPartitions(
        cluster_column, *sort_columns
    )
    writer = out.write.mode(mode)
    if row_group_rows is not None:
        writer = writer.option("parquet.page.row.count.limit", str(row_group_rows))
        writer = writer.option("parquet.block.size", str(row_group_rows * 1024))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def bucket_write(
    df: DataFrame,
    table: str,
    bucket_column: str,
    n_buckets: int,
    sort_columns: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, sorted table registered in the session
    catalog: ``bucketBy(n_buckets, bucket_column)`` + ``sortBy``.

    Bucketing is the co-located-join layout: two tables bucketed the same
    way on their join key hash-partition identically at write time, so a
    join between them needs NO Exchange — the shuffle is paid once, at
    write, instead of on every query. At 100 TB this is the difference
    between an every-query multi-TB shuffle and a mostly-local sort-merge
    join; it composes with ``cluster_write``'s zone-map layout (bucket on
    the join key, range-cluster *within* sorted buckets on the filter
    key). Pick ``n_buckets`` ≈ dataset_size / 1 GB and keep it IDENTICAL
    across the tables you intend to co-join — mismatched bucket counts
    re-shuffle one side (Spark re-bucketing join support notwithstanding).

    ``path`` makes the table external (data at ``path``, metadata in the
    catalog). Plain ``spark.read.parquet`` on the files ignores bucketing
    — read back via ``spark.table(table)`` so Catalyst sees the layout.
    """
    sorts = list(sort_columns) or [bucket_column]
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_column)
        .sortBy(*sorts)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a :func:`bucket_write` table with its bucket layout visible to
    Catalyst (file-path reads of the same data lose the layout and
    re-shuffle on join)."""
    return spark.table(table)
