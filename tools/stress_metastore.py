"""Metastore scale stress: N clustered files → ingest throughput, prune
latency, and pruning selectivity. Local stand-in for the millions-of-files
regime (the driver-side prune path is exercised up to its 100k-file
cutover; the distributed path above it).

Usage: python tools/stress_metastore.py [--files 1000] [--rows-per-file 1000]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=1000)
    ap.add_argument("--rows-per-file", type=int, default=1000)
    ap.add_argument(
        "--distributed-files",
        type=int,
        default=None,
        help="store size for the distributed-prune probe (default 2.5x "
        "the driver cutover; pass 1000000 for the million-file regime)",
    )
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakeshack_spark.engine import Lakeshack
    from lakeshack_spark.session import get_spark

    lake = tempfile.mkdtemp(prefix="stress_lake_")
    n, rows = args.files, args.rows_per_file
    t0 = time.time()
    # Ideal clustering: file i owns keys [i*rows, (i+1)*rows)
    for i in range(n):
        keys = np.arange(i * rows, (i + 1) * rows, dtype=np.int64)
        table = pa.table(
            {
                "k": keys,
                "ts": pa.array(
                    (1_700_000_000 + keys % 86_400) * 1_000_000,
                    type=pa.timestamp("us"),
                ),
                "v": np.random.default_rng(i).random(rows),
            }
        )
        pq.write_table(table, f"{lake}/part-{i:05d}.parquet", row_group_size=rows)
    print(f"wrote {n} files x {rows} rows in {time.time()-t0:.1f}s")

    spark = get_spark(app_name="stress_metastore")
    shack = Lakeshack(spark, lake, cluster_column="k", optional_columns=["ts"])
    t0 = time.time()
    n_new = shack.update_metastore()
    t_ingest = time.time() - t0
    print(f"ingest: {n_new} files in {t_ingest:.1f}s ({n_new/t_ingest:.0f} files/s)")

    t0 = time.time()
    assert shack.update_metastore() == 0
    print(f"idempotent re-ingest: {time.time()-t0:.1f}s")

    lookups = [5, rows * n // 2, rows * n - 1]
    for key in lookups:
        t0 = time.time()
        files = shack.candidate_files([key])
        dt = (time.time() - t0) * 1000
        print(f"prune k={key}: {len(files)}/{n} files in {dt:.0f}ms")
        assert len(files) == 1, files

    t0 = time.time()
    got = shack.query([5, rows * n // 2, rows * n - 1]).count()
    print(f"end-to-end 3-key lookup: {got} rows in {time.time()-t0:.1f}s")

    # 50 consecutive incremental updates (2 new files each): latency must
    # stay flat — the reconcile/append path is DataFrame-only, with no
    # driver materialization of stored filepaths or kept rows, so cost
    # tracks the NEW files, not the store size.
    lat = []
    for u in range(50):
        for j in range(2):
            i = n + u * 2 + j
            keys = np.arange(i * rows, (i + 1) * rows, dtype=np.int64)
            table = pa.table(
                {
                    "k": keys,
                    "ts": pa.array(
                        (1_700_000_000 + keys % 86_400) * 1_000_000,
                        type=pa.timestamp("us"),
                    ),
                    "v": np.random.default_rng(i).random(rows),
                }
            )
            pq.write_table(
                table, f"{lake}/part-{i:05d}.parquet", row_group_size=rows
            )
        t0 = time.time()
        assert shack.update_metastore() == 2
        lat.append(time.time() - t0)
    lat_sorted = sorted(lat)
    print(
        f"50 incremental updates: first={lat[0]:.2f}s last={lat[-1]:.2f}s "
        f"median={lat_sorted[25]:.2f}s p90={lat_sorted[45]:.2f}s"
    )
    n_total = shack.metastore.stats_df().count()
    assert n_total == n + 100, n_total

    # Driver-side prune at the 100k-file cutover: synthesize the stats
    # rows directly (prune never touches data files) and time the
    # vectorized arrow fast path — target <100 ms for a point lookup on a
    # 100k-row store, and low hundreds of ms for a 1000-value IN-list.
    from pyspark.sql import functions as F, types as T

    from lakeshack_spark.metastore import FileStatsMetastore

    syn_schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    syn_store = tempfile.mkdtemp(prefix="stress_stats_syn_")
    ms = FileStatsMetastore(spark, syn_store, syn_schema, "k", ["ts"])
    n_syn = ms.DRIVER_PRUNE_MAX_FILES  # exactly at the fast-path limit
    syn_rows = spark.range(n_syn).select(
        F.concat(F.lit("synthetic/part-"), F.col("id")).alias("filepath"),
        F.lit(1000).cast("long").alias("num_rows"),
        F.lit(4096).cast("long").alias("file_bytes"),
        (F.col("id") * 1000).alias("k_min"),
        (F.col("id") * 1000 + 999).alias("k_max"),
        F.lit(0).cast("long").alias("k_nulls"),
        F.lit(None).cast("timestamp").alias("ts_min"),
        F.lit(None).cast("timestamp").alias("ts_max"),
        F.lit(None).cast("long").alias("ts_nulls"),
    )
    ms.backend.append(syn_rows, n_syn)
    for n_vals in (1, 10, 1000):
        in_list = list(range(0, n_syn * 1000, max(1, n_syn * 1000 // n_vals)))[
            :n_vals
        ]
        t0 = time.time()
        mapping = ms.prune(in_list)
        dt = (time.time() - t0) * 1000
        print(
            f"synthetic {n_syn}-file prune, {n_vals}-value IN-list: "
            f"{len(mapping)} files in {dt:.0f}ms"
        )
        assert len(mapping) == len(in_list)
        if n_vals == 1:
            assert dt < 1000, "point-lookup prune should be ~instant"

    # Distributed-prune probe PAST the fast path: a store LARGER than
    # DRIVER_PRUNE_MAX_FILES routes through the Spark interval-join path
    # end-to-end (read_arrow defers once count_rows exceeds the limit).
    # The equivalence sweep pins driver≡distributed at unit scale only;
    # this runs the real cutover size and checks the mapping against a
    # driver-side pass over the same store (limit raised for the check —
    # 250k stats rows are still driver-feasible, which is exactly why the
    # default cutover is conservative).
    n_big = args.distributed_files or int(
        FileStatsMetastore.DRIVER_PRUNE_MAX_FILES * 2.5
    )
    big_store = tempfile.mkdtemp(prefix="stress_stats_big_")
    ms_big = FileStatsMetastore(spark, big_store, syn_schema, "k", ["ts"])
    big_rows = spark.range(n_big).select(
        F.concat(F.lit("synthetic/part-"), F.col("id")).alias("filepath"),
        F.lit(1000).cast("long").alias("num_rows"),
        F.lit(4096).cast("long").alias("file_bytes"),
        (F.col("id") * 1000).alias("k_min"),
        (F.col("id") * 1000 + 999).alias("k_max"),
        F.lit(0).cast("long").alias("k_nulls"),
        F.lit(None).cast("timestamp").alias("ts_min"),
        F.lit(None).cast("timestamp").alias("ts_max"),
        F.lit(None).cast("long").alias("ts_nulls"),
    )
    ms_big.backend.append(big_rows, n_big)
    for n_vals in (3, 1000):
        step = max(1, n_big * 1000 // n_vals)
        in_list = list(range(0, n_big * 1000, step))[:n_vals]
        clauses = [("k", ">=", 1000)]  # prunes exactly the first file
        t0 = time.time()
        dist = ms_big.prune(in_list, clauses)
        dt_dist = time.time() - t0
        print(
            f"distributed {n_big}-file prune, {n_vals}-value IN-list: "
            f"{len(dist)} files in {dt_dist:.1f}s"
        )
        if n_big <= 500_000:
            # driver-side equivalence check is itself driver-feasible
            # only up to a few hundred k stats rows
            old = ms_big.DRIVER_PRUNE_MAX_FILES
            ms_big.DRIVER_PRUNE_MAX_FILES = n_big + 1
            try:
                t0 = time.time()
                drv = ms_big.prune(in_list, clauses)
                dt_drv = time.time() - t0
            finally:
                ms_big.DRIVER_PRUNE_MAX_FILES = old
            print(f"  driver-side check: {len(drv)} files in {dt_drv:.1f}s")
            assert dist == drv, "distributed mapping diverged from driver check"
        want = len([v for v in in_list if v >= 1000])
        assert len(dist) == want, (len(dist), want)
    spark.stop()


if __name__ == "__main__":
    main()
