"""Z-order layout: multi-column zone-map pruning through the SAME footer
stats the linear layout uses — only the file layout changes.

The pinned claim: on a 2-D uniform dataset cut into 64 files, a linear
(single-column) clustering prunes well on its key and not at all on the
second column; the Morton layout prunes on BOTH (each file's per-column
range is ~domain/√64), and a conjunctive box query touches a handful of
files. Results are exact either way — pruning is best-effort, the scan
re-filters (README.rst:12-19)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.engine import Lakeshack
from lakeshack_spark.maintenance import zorder_compact
from lakeshack_spark.operators.zorder import zorder_value, zorder_write
from lakeshack_spark.writer import cluster_write

N = 1 << 14  # 16384 rows on a 128 x 128 (x, y) grid, 2 rows per cell
N_FILES = 64


@pytest.fixture(scope="module")
def grid(spark):
    # Deterministic 2-D uniform grid: x and y are independent uniform
    # 0..127; payload disambiguates rows sharing a cell.
    return spark.range(N).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") / 128).cast("long") % 128).alias("y"),
        F.col("id").alias("payload"),
    )


def _shack(spark, grid, root, write):
    lake = str(root / "lake")
    write(grid, lake)
    shack = Lakeshack(
        spark, lake, "x", ["y"],
        store_path=str(root / "stats"), schema=grid.schema,
    )
    shack.update_metastore()
    return shack


@pytest.fixture(scope="module")
def linear(spark, grid, tmp_path_factory):
    return _shack(
        spark, grid, tmp_path_factory.mktemp("linear"),
        lambda df, p: cluster_write(df, p, "x", N_FILES),
    )


@pytest.fixture(scope="module")
def zordered(spark, grid, tmp_path_factory):
    return _shack(
        spark, grid, tmp_path_factory.mktemp("zorder"),
        lambda df, p: zorder_write(df, p, ["x", "y"], N_FILES),
    )


def test_zorder_value_is_monotone_in_each_column(spark, grid):
    # Within one y, increasing x must not decrease the x-bits of the
    # z-value's bucket — proxy check: the z-value of (x, y) strictly
    # grows when BOTH coordinates grow (Morton order preserves the
    # product partial order).
    rows = (
        grid.select("x", "y")
        .distinct()
        .withColumn("z", zorder_value(grid, ["x", "y"]))
        .collect()
    )
    z = {(r.x, r.y): r.z for r in rows}
    assert z[(3, 3)] < z[(4, 4)] < z[(100, 100)]
    assert z[(0, 0)] == min(z.values())
    assert z[(127, 127)] == max(z.values())


def test_box_query_prunes_on_both_columns(linear, zordered):
    xs = list(range(40, 48))
    box = [("y", ">=", 40), ("y", "<=", 47)]

    lin_x = len(linear.candidate_files(xs))
    lin_box = len(linear.candidate_files(xs, box))
    z_box = len(zordered.candidate_files(xs, box))

    # Linear layout: x-range is tight (8/128 of the domain ≈ 4 files +
    # boundary), but y stats are useless — the box prunes nothing more.
    assert lin_x <= 8
    assert lin_box == lin_x
    # Morton layout: the 8x8 box is ~0.4% of the area; even with
    # quantile-bucket wobble it touches a small corner of the files —
    # comparable to linear's x-only pruning (which is near-optimal for
    # THIS query) while also serving y-side queries the linear layout
    # can't prune at all (next test).
    assert z_box <= 8


def test_single_column_queries_prune_under_zorder(linear, zordered):
    xs = list(range(128))  # all cluster values: isolate the y clause
    yband = [("y", ">=", 100), ("y", "<=", 107)]
    assert len(linear.candidate_files(xs, yband)) == N_FILES  # no y locality
    # each file's y-range is ~domain/sqrt(64) = 16 wide → an 8-wide band
    # intersects ~2 of the 8 y-strata (16 of 64 files + boundary slack)
    assert len(zordered.candidate_files(xs, yband)) <= 24
    # and x alone still prunes (worse than linear's 4, better than all)
    xband = list(range(40, 48))
    assert len(zordered.candidate_files(xband)) <= 24


def test_results_identical_across_layouts(linear, zordered):
    xs = list(range(40, 48))
    box = [("y", ">=", 40), ("y", "<=", 47)]
    lin = sorted(tuple(r) for r in linear.query(xs, box).collect())
    zor = sorted(tuple(r) for r in zordered.query(xs, box).collect())
    assert lin == zor
    assert len(lin) == 8 * 8 * (N // (128 * 128))


def test_zorder_compact_rewrites_in_place(spark, grid, tmp_path_factory):
    root = tmp_path_factory.mktemp("zcompact")
    lake = str(root / "lake")
    # messy append layout: 4 batches clustered on x only
    for i in range(4):
        cluster_write(
            grid.filter(F.col("payload") % 4 == i), lake, "x",
            n_files=4, mode="append",
        )
    shack = Lakeshack(
        spark, lake, "x", ["y"], store_path=str(root / "stats"),
        schema=grid.schema,
    )
    shack.update_metastore()
    before = len(shack.candidate_files(list(range(128)), [("y", ">=", 0), ("y", "<=", 7)]))
    assert before == 16  # every file survives: y stats span everything

    assert zorder_compact(shack, n_files=16, zorder_columns=("x", "y")) == 16
    after = len(shack.candidate_files(list(range(128)), [("y", ">=", 0), ("y", "<=", 7)]))
    assert after <= 8
    got = spark.read.schema(grid.schema).parquet(lake + "/compact-*.parquet")
    assert got.count() == N
    assert got.exceptAll(grid).count() == 0


def test_zorder_compact_rejects_untracked_columns(spark, grid, tmp_path_factory):
    root = tmp_path_factory.mktemp("zreject")
    lake = str(root / "lake")
    cluster_write(grid, lake, "x", n_files=2)
    shack = Lakeshack(
        spark, lake, "x", store_path=str(root / "stats"), schema=grid.schema
    )
    shack.update_metastore()
    with pytest.raises(ValueError, match="not stats-tracked"):
        zorder_compact(shack, n_files=4, zorder_columns=("x", "y"))


def test_zorder_handles_date_and_timestamp_columns(spark, tmp_path_factory):
    # ANSI mode rejects cast(date as double); the normalizer must route
    # temporal types through their epoch forms and still produce a
    # monotone z-value per column.
    df = spark.range(512).select(
        F.col("id"),
        F.expr("date_add(DATE'2020-01-01', cast(id % 64 as int))").alias("d"),
        F.timestamp_micros((F.col("id") % 32) * 3_600_000_000).alias("ts"),
    )
    z = df.withColumn("z", zorder_value(df, ["d", "ts"])).collect()
    by_key = {}
    for r in z:
        by_key.setdefault((r.d, r.ts), set()).add(r.z)
    # z-value is a pure function of (d, ts)
    assert all(len(v) == 1 for v in by_key.values())
    zmap = {k: v.pop() for k, v in by_key.items()}
    ks = sorted(zmap)
    assert zmap[ks[0]] == min(zmap.values())
    assert zmap[ks[-1]] == max(zmap.values())


def test_zorder_quantile_buckets_balance_skewed_columns(spark, tmp_path_factory):
    # 90% of the mass in x < 100, a sparse tail to ~1e6: uniform min/max
    # binning would put ~all rows in one bucket (one giant file range);
    # quantile cutpoints must keep the layout balanced so pruning still
    # subdivides the dense region.
    n = 1 << 13
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.col("id") % 100)
        .otherwise((F.col("id") * 121) % 1_000_000)
        .alias("x"),
        (F.col("id") % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    lake = str(tmp_path_factory.mktemp("skewed") / "lake")
    zorder_write(df, lake, ["x", "y"], n_files=16)
    import glob

    sizes = []
    for f in sorted(glob.glob(lake + "/part-*.parquet")):
        sizes.append(spark.read.parquet(f).count())
    assert sum(sizes) == n
    # range partitioning on the z-value keeps files balanced despite the
    # skew: no file more than ~3x the mean
    assert max(sizes) <= 3 * (n // len(sizes))
    # and the dense region is subdivided: a tight x-band inside x<100
    # must NOT touch every file (uniform binning would collapse x<100
    # into one bucket value -> no locality)
    shack = Lakeshack(
        spark, lake, "x", ["y"],
        store_path=str(tmp_path_factory.mktemp("skewed_stats")), schema=df.schema,
    )
    shack.update_metastore()
    touched = len(shack.candidate_files(list(range(10, 20))))
    assert touched < 16
