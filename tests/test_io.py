"""Format round-trips through the uniform source/sink layer."""

from __future__ import annotations

import pytest

from lakeshack_spark.sources.catalog import load_table
from lakeshack_spark.sources.io import read_table, write_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, tmp_path_factory, fmt):
    src = load_table(spark, SF, "nation")
    out = str(tmp_path_factory.mktemp(f"io_{fmt}"))
    write_table(src, out, fmt=fmt)
    back = read_table(spark, out, fmt=fmt, schema=src.schema)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_partitioned_write_prunes(spark, tmp_path_factory):
    src = load_table(spark, SF, "orders")
    out = str(tmp_path_factory.mktemp("io_part"))
    write_table(src, out, fmt="parquet", partition_by=("o_orderstatus",))
    back = read_table(spark, out, schema=None)
    from lakeshack_spark import plans

    one = back.filter(back.o_orderstatus == "O")
    # Hive-style partition pruning: only the o_orderstatus=O directory scans
    plan = plans.explain_str(one)
    assert one.count() == src.filter(src.o_orderstatus == "O").count()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_table(spark, "/tmp/x", fmt="avroX")
