"""Compaction: overlapping per-batch clustering → one global clustering;
results preserved, pruning selectivity restored."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.engine import Lakeshack
from lakeshack_spark.maintenance import compact
from lakeshack_spark.sources.catalog import load_table
from lakeshack_spark.writer import cluster_write

SF = "/root/testdata/sf0.001"


def test_compact_restores_point_lookup_selectivity(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake"))
    store = str(tmp_path_factory.mktemp("stats"))
    orders = load_table(spark, SF, "orders")

    # 4 appended batches, each internally clustered → overlapping ranges
    for i in range(4):
        cluster_write(
            orders.filter(F.col("o_orderkey") % 4 == i),
            lake, "o_custkey", n_files=2, mode="append",
        )
    shack = Lakeshack(
        spark, lake, "o_custkey", ["o_orderdate"],
        store_path=store, schema=orders.schema,
    )
    shack.update_metastore()
    assert shack.metastore.stats_df().count() == 8
    before = len(shack.candidate_files([7]))
    assert before >= 4  # every batch's range covers custkey 7

    removed = compact(shack, n_files=8)
    assert removed == 8
    stats = shack.metastore.stats_df()
    assert stats.count() == 8
    after = len(shack.candidate_files([7]))
    assert after <= 2  # global clustering: 1 file (+1 for boundary overlap)

    # row-for-row identical dataset
    assert shack.query(list(range(1500))).count() == orders.count()
    got = spark.read.schema(orders.schema).parquet(lake + "/compact-*.parquet")
    assert got.exceptAll(orders).count() == 0
    assert orders.exceptAll(got).count() == 0


def test_compact_empty_dataset_is_noop(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("empty_lake"))
    orders = load_table(spark, SF, "orders")
    shack = Lakeshack(
        spark, lake, "o_custkey",
        store_path=str(tmp_path_factory.mktemp("stats")), schema=orders.schema,
    )
    assert compact(shack, n_files=4) == 0
