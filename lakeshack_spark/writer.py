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

from pyspark.sql import DataFrame


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
