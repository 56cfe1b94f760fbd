"""Per-file HLL distinct-sketch index: build, incremental update,
merge-don't-recount, group rollups, store validation."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from lakeshack_spark.sketchindex import DistinctSketchIndex


def _write_lake(spark, path, n=4000, parts=4, start=0):
    df = spark.createDataFrame(
        [Row(k=start + i, grp=f"g{i % 3}") for i in range(n)]
    )
    df.repartition(parts, "k").write.mode("append").parquet(path)


def test_estimate_within_bounds_and_idempotent_update(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _write_lake(spark, lake, n=4000, parts=4)
    idx = DistinctSketchIndex(spark, str(tmp_path / "hll"), "k")
    assert idx.update(lake) == 4
    assert idx.update(lake) == 0  # idempotent: nothing new to sketch
    est = idx.estimate()
    assert abs(est - 4000) / 4000 < 0.05  # lg_k=12 → ~1.6 % σ; 3σ bound


def test_incremental_append_updates_estimate(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _write_lake(spark, lake, n=2000, parts=2)
    idx = DistinctSketchIndex(spark, str(tmp_path / "hll"), "k")
    idx.update(lake)
    e1 = idx.estimate()
    # Append a new file population with entirely new keys; only the new
    # files get sketched.
    _write_lake(spark, lake, n=2000, parts=2, start=10_000)
    assert idx.update(lake) == 2
    e2 = idx.estimate()
    assert abs(e1 - 2000) / 2000 < 0.05
    assert abs(e2 - 4000) / 4000 < 0.05


def test_merge_subset_of_files_no_rescan(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _write_lake(spark, lake, n=4000, parts=4)
    idx = DistinctSketchIndex(spark, str(tmp_path / "hll"), "k")
    idx.update(lake)
    import pyarrow.dataset as pads

    files = sorted(
        {r["filepath"] for r in spark.read.parquet(str(tmp_path / "hll"))
         .select("filepath").distinct().collect()}
    )
    half = files[:2]
    exact_half = (
        pads.dataset(half, format="parquet").to_table(columns=["k"])
    )
    n_exact = len(set(exact_half.column("k").to_pylist()))
    est = idx.estimate(files=half)
    assert abs(est - n_exact) / max(n_exact, 1) < 0.05


def test_group_rollup_estimates(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _write_lake(spark, lake, n=3000, parts=3)
    idx = DistinctSketchIndex(
        spark, str(tmp_path / "hll"), "k", group_col="grp"
    )
    idx.update(lake)
    rows = {r["grp"]: r for r in idx.estimates().collect()}
    assert set(rows) == {"g0", "g1", "g2"}
    for g, r in rows.items():
        assert abs(r["estimate"] - 1000) / 1000 < 0.05
        assert r["n_rows"] == 1000
        assert r["n_files"] == 3  # every file holds every group


def test_store_validation_rejects_column_drift(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _write_lake(spark, lake, n=100, parts=1)
    DistinctSketchIndex(spark, str(tmp_path / "hll"), "k").update(lake)
    with pytest.raises(ValueError, match="inconsistent"):
        DistinctSketchIndex(spark, str(tmp_path / "hll"), "grp").update(lake)
