"""Bucketed (co-located) join layout: the write-once-shuffle-never path.

Two tables bucketed identically on the join key hash-partition the same
way at write time, so joining them needs no Exchange — the property that
turns an every-query multi-TB shuffle into a mostly-local sort-merge join
at 100 TB.
"""

from __future__ import annotations

import pytest

from lakeshack_spark import plans
from lakeshack_spark.sources.catalog import load_table
from lakeshack_spark.writer import bucket_write, read_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    paths = {"orders": str(root / "orders"), "customer": str(root / "customer")}
    bucket_write(orders, "t_orders_b", "o_custkey", 4, path=paths["orders"])
    bucket_write(customer, "t_customer_b", "c_custkey", 4, path=paths["customer"])
    yield paths
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def _joined(spark):
    o = read_bucketed(spark, "t_orders_b")
    c = read_bucketed(spark, "t_customer_b")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name"
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Force SMJ (tiny tables would broadcast and hide the layout benefit).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plans.explain_str(_joined(spark))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correct(spark, bucketed_tables):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    expected = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    assert _joined(spark).count() == expected


def test_path_read_loses_bucketing(spark, bucketed_tables):
    # Reading the files directly (not via the catalog) must still be
    # CORRECT — but the layout is invisible, so the join shuffles. This
    # pins the footgun bucket_write's docstring warns about.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(bucketed_tables["orders"])
        c = spark.read.parquet(bucketed_tables["customer"])
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        plan = plans.explain_str(joined)
        assert "Exchange" in plan
        assert joined.count() == _joined(spark).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
