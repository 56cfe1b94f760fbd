"""Metadata-only aggregation at file-count scale: synthesize a stats
store for N clustered files (plan_agg never touches data for interior
files, so the store alone exercises the planning path), sweep range
predicates of growing width, and show

- plan latency stays ~flat in the RANGE WIDTH (vectorized masks over the
  store, one pass whatever the predicate spans);
- the boundary set stays O(1) per range edge no matter how many
  thousands of files the range covers — the quantity that bounds data
  I/O at 100 TB;
- the interior contribution (row_count / min / max) from stats matches
  the ground truth the synthetic layout encodes.

A real boundary-scan leg runs on a small physical lake to keep the
end-to-end query_agg path honest (scan only boundary files, exact
results vs a full scan).

Usage: python tools/stress_metaagg.py [--files 100000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def build_store(spark, F, T, FileStatsMetastore, n, rows):
    """Synthetic stats store for n clustered files (no data files)."""
    syn_schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    store = tempfile.mkdtemp(prefix="stress_metaagg_store_")
    ms = FileStatsMetastore(spark, store, syn_schema, "k", ["ts"])
    syn = spark.range(n).select(
        F.concat(F.lit("synthetic/part-"), F.col("id")).alias("filepath"),
        F.lit(rows).cast("long").alias("num_rows"),
        F.lit(4096).cast("long").alias("file_bytes"),
        (F.col("id") * rows).alias("k_min"),
        (F.col("id") * rows + rows - 1).alias("k_max"),
        F.lit(0).cast("long").alias("k_nulls"),
        F.lit(None).cast("timestamp").alias("ts_min"),
        F.lit(None).cast("timestamp").alias("ts_max"),
        F.lit(None).cast("long").alias("ts_nulls"),
    )
    ms.backend.append(syn, n)
    return ms


def run_sweep(ms, n, rows, label):
    total_keys = n * rows
    for frac in (0.001, 0.01, 0.1, 0.5, 0.9):
        width = int(total_keys * frac)
        lo = (total_keys - width) // 2
        hi = lo + width - 1
        # off-grid endpoints -> exactly one boundary file per edge
        lo += rows // 2
        hi -= rows // 3
        t0 = time.time()
        contrib, boundary = ms.plan_agg(
            [("k", ">=", lo), ("k", "<=", hi)], min_max_columns=["k"]
        )
        dt = (time.time() - t0) * 1000
        interior_rows = contrib["row_count"]
        # ground truth from the synthetic layout
        lo_file, hi_file = lo // rows, hi // rows
        want_interior_files = max(0, hi_file - lo_file - 1)
        assert contrib["n_files_interior"] == want_interior_files, (
            contrib["n_files_interior"],
            want_interior_files,
        )
        assert len(boundary) == 2, boundary  # one per range edge
        assert interior_rows == want_interior_files * rows
        assert contrib["min"]["k"] == (lo_file + 1) * rows
        assert contrib["max"]["k"] == hi_file * rows - 1
        print(
            f"[{label}] range {frac:>5.1%} of keyspace: plan {dt:6.0f} ms, "
            f"{contrib['n_files_interior']:>7} interior / "
            f"{len(boundary)} boundary / "
            f"{contrib['n_files_excluded']:>7} excluded; "
            f"{interior_rows:>10} rows answered from metadata"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument(
        "--distributed-files",
        type=int,
        default=1_000_000,
        help="file count for the past-cutover regime (> "
        "DRIVER_PRUNE_MAX_FILES routes plan_agg through the one "
        "distributed aggregate); 0 skips it",
    )
    ap.add_argument("--rows-per-file", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F, types as T

    from lakeshack_spark.metastore import FileStatsMetastore
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_metaagg", shuffle_partitions=8)

    # ---- planning-path sweep on a synthetic store (no data files) ----
    n, rows = args.files, args.rows_per_file
    ms = build_store(spark, F, T, FileStatsMetastore, n, rows)
    run_sweep(ms, n, rows, f"{n // 1000}k-driver")

    # ---- same sweep PAST the driver cutover (VERDICT_r7 item 6):
    # > DRIVER_PRUNE_MAX_FILES makes backend.read_arrow defer, so
    # plan_agg runs _plan_agg_distributed — one Spark aggregate over the
    # store, interior/boundary classification in the plan. Same ground-
    # truth asserts as the driver leg.
    if args.distributed_files:
        nd = args.distributed_files
        assert nd > FileStatsMetastore.DRIVER_PRUNE_MAX_FILES, (
            "--distributed-files must exceed the driver cutover "
            f"({FileStatsMetastore.DRIVER_PRUNE_MAX_FILES})"
        )
        ms_d = build_store(spark, F, T, FileStatsMetastore, nd, rows)
        run_sweep(ms_d, nd, rows, f"{nd // 1000}k-distributed")

    # ---- end-to-end leg on a real (small) lake ----
    from lakeshack_spark.engine import Lakeshack
    from lakeshack_spark.writer import cluster_write

    lake = tempfile.mkdtemp(prefix="stress_metaagg_lake_")
    df = spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    cluster_write(df, os.path.join(lake, "data"), "k", n_files=50)
    shack = Lakeshack(
        spark,
        os.path.join(lake, "data"),
        "k",
        ["v"],
        store_path=os.path.join(lake, "stats"),
    )
    shack.update_metastore()
    t0 = time.time()
    got = shack.query_agg(
        [("k", ">=", 12_345), ("k", "<=", 181_818)],
        min_max_columns=["k", "v"],
        count_columns=["v"],
    ).collect()[0]
    dt = time.time() - t0
    st = shack.status()
    want = (
        df.filter("k >= 12345 and k <= 181818")
        .agg(
            F.count(F.lit(1)).cast("long").alias("row_count"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count("v").cast("long").alias("cnt_v"),
        )
        .collect()[0]
    )
    assert got.asDict() == want.asDict(), (got, want)
    assert st["n_files_boundary"] <= 2, st
    print(
        f"end-to-end query_agg over 50-file lake: {dt:.2f}s, "
        f"{st['n_files_interior']} interior / {st['n_files_boundary']} "
        f"boundary files, exact vs full scan: OK"
    )
    spark.stop()


if __name__ == "__main__":
    main()
