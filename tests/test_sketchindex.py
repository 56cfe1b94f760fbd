"""Per-file HLL distinct-sketch index: build, incremental update,
merge-don't-recount, group rollups, store validation."""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# KLL quantile-sketch index
# ---------------------------------------------------------------------------


def _rank_of(spark, lake, col, v, grp=None):
    df = spark.read.parquet(lake)
    if grp is not None:
        df = df.filter(F.col("grp") == grp)
    n = df.count()
    return df.filter(F.col(col) <= v).count() / n


class TestQuantileSketchIndex:
    def test_quantiles_within_bounds_and_idempotent(self, spark, tmp_path):
        from lakeshack_spark.sketchindex import QuantileSketchIndex

        lake = str(tmp_path / "lake")
        # skewed values: k^2 — uniform quantile picks would be wrong, so
        # this actually tests the sketch, not luck
        df = spark.range(6000).select(
            (F.col("id") * F.col("id")).alias("x"),
            (F.col("id") % 3).cast("string").alias("grp"),
        )
        df.repartition(4, "x").write.parquet(lake)
        idx = QuantileSketchIndex(spark, str(tmp_path / "kll"), "x")
        assert idx.update(lake) == 4
        assert idx.update(lake) == 0
        row = idx.quantiles([0.1, 0.5, 0.99]).collect()[0].asDict()
        assert row["n_rows"] == 6000 and row["n_files"] == 4
        for p in (0.1, 0.5, 0.99):
            v = row[f"q_{str(p).replace('.', '_')}"]
            assert abs(_rank_of(spark, lake, "x", v) - p) <= 0.02, (p, v)

    def test_update_skips_own_sidecar_inside_lake(self, spark, tmp_path):
        """An incremental update AFTER the sidecar exists inside the lake
        directory must not try to sketch the sidecar's own parquet (the
        hidden-subdir listing rule)."""
        from lakeshack_spark.sketchindex import QuantileSketchIndex

        lake = str(tmp_path / "lake")
        spark.range(1000).select(F.col("id").alias("x")).repartition(2).write.parquet(lake)
        idx = QuantileSketchIndex(spark, f"{lake}/_lakeshack_kll/x", "x")
        assert idx.update(lake) == 2
        assert idx.update(lake) == 0  # would crash/sketch sketches otherwise
        spark.range(1000, 1500).select(F.col("id").alias("x")).coalesce(
            1
        ).write.mode("append").parquet(lake)
        assert idx.update(lake) == 1
        row = idx.quantiles([0.5]).collect()[0]
        assert row["n_rows"] == 1500

    def test_grouped_quantiles_and_file_subset(self, spark, tmp_path):
        from lakeshack_spark.sketchindex import QuantileSketchIndex

        lake = str(tmp_path / "lake")
        df = spark.range(3000).select(
            F.col("id").alias("x"), (F.col("id") % 2).cast("string").alias("grp")
        )
        df.repartition(3, "x").write.parquet(lake)
        idx = QuantileSketchIndex(
            spark, str(tmp_path / "kll"), "x", group_col="grp"
        )
        idx.update(lake)
        rows = {r["grp"]: r.asDict() for r in idx.quantiles([0.5]).collect()}
        assert set(rows) == {"0", "1"}
        for g, r in rows.items():
            assert r["n_rows"] == 1500
            assert abs(_rank_of(spark, lake, "x", r["q_0_5"], g) - 0.5) <= 0.02
        # subset of files: a 1-file slice merges only that file's sketch
        import glob as _glob

        one = sorted(_glob.glob(f"{lake}/*.parquet"))[:1]
        sub = idx.quantiles([0.5], files=one).collect()
        assert sum(r["n_rows"] for r in sub) == spark.read.parquet(*one).count()

    def test_double_kind_and_rank_inverse(self, spark, tmp_path):
        from lakeshack_spark.sketchindex import QuantileSketchIndex

        lake = str(tmp_path / "lake")
        spark.range(2000).select(
            (F.col("id") / 7.0).alias("x")
        ).repartition(2).write.parquet(lake)
        idx = QuantileSketchIndex(
            spark, str(tmp_path / "kll"), "x", kind="double"
        )
        idx.update(lake)
        q = idx.quantiles([0.25]).collect()[0]["q_0_25"]
        assert abs(_rank_of(spark, lake, "x", q) - 0.25) <= 0.02
        r = idx.ranks([q]).collect()[0]["r_0"]
        assert abs(r - 0.25) <= 0.02  # sketch's own rank agrees

    def test_store_validation(self, spark, tmp_path):
        from lakeshack_spark.sketchindex import QuantileSketchIndex

        lake = str(tmp_path / "lake")
        spark.range(100).select(F.col("id").alias("x")).coalesce(1).write.parquet(lake)
        store = str(tmp_path / "kll")
        QuantileSketchIndex(spark, store, "x").update(lake)
        with pytest.raises(ValueError, match="inconsistent"):
            QuantileSketchIndex(spark, store, "y").update(lake)
        with pytest.raises(ValueError, match="kind"):
            QuantileSketchIndex(spark, store, "x", kind="decimal")
        # existing store's k/kind win over a mismatched constructor arg
        idx2 = QuantileSketchIndex(spark, store, "x", k=200)
        assert idx2.update(lake) == 0
        assert idx2.quantiles([0.5]).collect()[0]["n_rows"] == 100


def test_list_parquet_files_skips_hidden_subdirs_not_root(spark, tmp_path):
    """Hidden-dir listing rule: _/.-prefixed COMPONENTS below the listed
    root are side data (sidecars, staging) and excluded from data
    listings; a store ROOTED at a _-named directory still lists."""
    from lakeshack_spark.metastore import list_parquet_files

    lake = tmp_path / "lake"
    (lake / "_lakeshack_kll").mkdir(parents=True)
    (lake / ".staging").mkdir()
    (lake / "year=2024").mkdir()
    for p in ("a.parquet", "_lakeshack_kll/s.parquet", ".staging/t.parquet",
              "year=2024/b.parquet"):
        (lake / p).write_bytes(b"PAR1")
    got = {f.rsplit("lake/", 1)[-1] for f in list_parquet_files(str(lake))}
    assert got == {"a.parquet", "year=2024/b.parquet"}
    rooted = list_parquet_files(str(lake / "_lakeshack_kll"))
    assert [f.rsplit("/", 1)[-1] for f in rooted] == ["s.parquet"]


# ---------------------------------------------------------------------------
# Theta sketch index (set algebra)
# ---------------------------------------------------------------------------


class TestThetaSketchIndex:
    def test_overlap_estimates_and_idempotent(self, spark, tmp_path):
        from lakeshack_spark.sketchindex import ThetaSketchIndex

        lake = str(tmp_path / "lake")
        # group a: keys 0..2999, group b: keys 2000..4999 → overlap 1000
        df = spark.range(3000).select(
            F.col("id").alias("k"), F.lit("a").alias("g")
        ).unionByName(
            spark.range(2000, 5000).select(
                F.col("id").alias("k"), F.lit("b").alias("g")
            )
        )
        df.repartition(4, "k").write.parquet(lake)
        idx = ThetaSketchIndex(spark, str(tmp_path / "theta"), "k", group_col="g")
        assert idx.update(lake) == 4
        assert idx.update(lake) == 0
        row = idx.overlap({"group": "a"}, {"group": "b"}).collect()[0]
        assert abs(row["est_left"] - 3000) / 3000 < 0.05
        assert abs(row["est_right"] - 3000) / 3000 < 0.05
        assert abs(row["est_union"] - 5000) / 5000 < 0.05
        assert abs(row["est_intersection"] - 1000) / 1000 < 0.10
        assert abs(row["est_difference"] - 2000) / 2000 < 0.10

    def test_file_slice_sides_and_estimate(self, spark, tmp_path):
        import glob as _glob

        from lakeshack_spark.sketchindex import ThetaSketchIndex

        lake = str(tmp_path / "lake")
        # two disjoint file populations written separately
        spark.range(1000).select(F.col("id").alias("k")).coalesce(1).write.parquet(lake)
        spark.range(500, 1500).select(F.col("id").alias("k")).coalesce(1).write.mode(
            "append"
        ).parquet(lake)
        idx = ThetaSketchIndex(spark, str(tmp_path / "theta"), "k")
        assert idx.update(lake) == 2
        files = sorted(_glob.glob(f"{lake}/*.parquet"), key=os.path.getmtime)
        a, b = [files[0]], [files[1]]
        row = idx.overlap({"files": a}, {"files": b}).collect()[0]
        assert abs(row["est_intersection"] - 500) / 500 < 0.10
        assert abs(idx.estimate() - 1500) / 1500 < 0.05

    def test_store_validation(self, spark, tmp_path):
        from lakeshack_spark.sketchindex import ThetaSketchIndex

        lake = str(tmp_path / "lake")
        spark.range(100).select(F.col("id").alias("k")).coalesce(1).write.parquet(lake)
        store = str(tmp_path / "theta")
        ThetaSketchIndex(spark, store, "k").update(lake)
        with pytest.raises(ValueError, match="inconsistent"):
            ThetaSketchIndex(spark, store, "other").update(lake)
        with pytest.raises(ValueError, match="empty"):
            ThetaSketchIndex(spark, str(tmp_path / "nope"), "k").estimate()
