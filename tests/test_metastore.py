"""Metastore ingest + pruning semantics, mirroring the reference's
tests/test_metastore.py truth tables (SURVEY §5) on the regenerated fixture.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.metastore import FileStatsMetastore

MID_2021_08_01 = datetime(2021, 8, 1)
GLOBAL_MIN_TS = datetime.fromtimestamp(1_626_365_594)
TEN_IDS = ["01", "22", "35", "4f", "70", "8a", "a0", "bf", "d1", "f0"]


@pytest.fixture(scope="module")
def metastore(spark, sales_fixture, tmp_path_factory):
    root, files = sales_fixture
    schema = spark.read.parquet(files[0]).schema
    store = str(tmp_path_factory.mktemp("stats"))
    ms = FileStatsMetastore(spark, store, schema, "id", ["timestamp"])
    n = ms.update(root)
    assert n == 10
    return ms


def test_update_is_idempotent(metastore, sales_fixture):
    root, _files = sales_fixture
    assert metastore.update(root) == 0
    assert metastore.stats_df().count() == 10


def test_stats_match_filenames(metastore):
    """Each file's stored id_min/id_max must equal the range encoded in its
    filename (reference tests/test_metastore.py:203-227 reconstructs the
    filename from the stats row)."""
    for row in metastore.stats_df().collect():
        stem = row["filepath"].rsplit("/", 1)[-1]
        id_range = stem.split("-")[2].split(".")[0]
        assert id_range == f"{row['id_min']}_{row['id_max']}"
        assert row["num_rows"] == 100


def test_in_list_pruning_with_ideal_clustering(metastore):
    """Non-overlapping per-file id ranges: a 10-value spread IN-list touches
    all 10 files, one value per file-ish; a single value touches few."""
    pruned = metastore.prune(TEN_IDS)
    assert len(pruned) == 10
    assert sorted({v for vals in pruned.values() for v in vals}) == sorted(TEN_IDS)


def test_range_clause_truth_table(metastore):
    """Operator × boundary truth table (reference
    tests/test_metastore.py:290-362): strict < global-min excludes all
    files, <= keeps exactly the pinned-min file, >= mid-2021-08-01 keeps
    all 10, <= mid keeps 1."""
    all_ids = TEN_IDS
    assert len(metastore.prune(all_ids, [("timestamp", "<", GLOBAL_MIN_TS)])) == 0
    assert len(metastore.prune(all_ids, [("timestamp", "<=", GLOBAL_MIN_TS)])) == 1
    assert len(metastore.prune(all_ids, [("timestamp", ">=", MID_2021_08_01)])) == 10
    assert len(metastore.prune(all_ids, [("timestamp", "<=", MID_2021_08_01)])) == 1
    assert len(metastore.prune(all_ids, [("timestamp", ">", MID_2021_08_01)])) == 10
    assert len(metastore.prune(all_ids, [("timestamp", "<", MID_2021_08_01)])) == 1
    assert len(metastore.prune(all_ids, [("timestamp", "=", MID_2021_08_01)])) == 1


def test_unknown_operator_raises(metastore):
    with pytest.raises(ValueError):
        metastore.prune(["00"], [("timestamp", "!=", MID_2021_08_01)])


def test_untracked_column_does_not_prune(metastore):
    """Clauses on columns the metastore does not index must not prune
    anything (pruning best-effort, filtering exact —
    reference tests/test_lakeshack.py:265-284)."""
    pruned = metastore.prune(TEN_IDS, [("x", ">=", 10_000)])
    assert len(pruned) == 10


def test_date_variant_pruning(spark, tmp_path_factory):
    """date32 temporal variant (reference tests/test_metastore.py dt
    tests)."""
    from tests.fixture_sales import generate_sales_fixture

    root = str(tmp_path_factory.mktemp("sales_dt"))
    files = generate_sales_fixture(root, variant="dt")
    schema = spark.read.parquet(files[0]).schema
    store = str(tmp_path_factory.mktemp("stats_dt"))
    ms = FileStatsMetastore(spark, store, schema, "id", ["timestamp"])
    assert ms.update(root) == 10
    assert len(ms.prune(TEN_IDS, [("timestamp", "<=", MID_2021_08_01.date())])) == 1


def test_distributed_prune_path_matches_driver_path(metastore):
    """Forcing the Spark interval-join path (as if the stats table were
    huge) must give identical pruning to the driver-side fast path."""
    fast = metastore.prune(TEN_IDS, [("timestamp", ">=", MID_2021_08_01)])
    old = metastore.DRIVER_PRUNE_MAX_FILES
    metastore.DRIVER_PRUNE_MAX_FILES = 0
    try:
        slow = metastore.prune(TEN_IDS, [("timestamp", ">=", MID_2021_08_01)])
    finally:
        metastore.DRIVER_PRUNE_MAX_FILES = old
    assert fast == slow


def test_non_indexable_optional_column_skipped(spark, sales_fixture):
    """A non-indexable optional column type is skipped with a warning, not
    an error (reference lakeshack/metastore.py:540-553)."""
    from pyspark.sql import types as T

    root, files = sales_fixture
    schema = spark.read.parquet(files[0]).schema
    schema = T.StructType(
        schema.fields + [T.StructField("blob", T.ArrayType(T.IntegerType()))]
    )
    ms = FileStatsMetastore(spark, "/tmp/unused_stats", schema, "id", ["blob"])
    assert ms.optional_columns == []
