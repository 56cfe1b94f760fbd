"""Streaming CDC-merge scale stress: narrow-key batches against a
2M-row, 64-file clustered VersionedTable must rewrite O(batch) files.

The bench's streaming key times 5 batches of modulo-spread updates
(every file hit — a worst case); this tool asserts the CLUSTERED-key
claim the 100 TB story actually rests on (versioning.merge: "with a
clustered key a small CDC batch rewrites O(batch) files out of
thousands"): the table is range-clustered on the key, each streaming
micro-batch updates one narrow key window, and every version's
manifest is checked to carry all but a handful of files BY REFERENCE.

Asserts per batch: exactly-once batch markers, ≤ max_rewrites files
rewritten (vs 64 total), carried files identical by name to the
parent's. Asserts at the end: every updated key reads back its new
value, every untouched key its old one (exact aggregate identity).
Prints per-batch rewrite counts and end-to-end rows/s.

Usage: python tools/stress_streaming.py [--rows 2000000] [--files 64]
       [--batches 5] [--width 5000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--width", type=int, default=5_000,
                    help="keys updated per batch (one narrow window)")
    ap.add_argument("--max-rewrites", type=int, default=4,
                    help="per-batch ceiling on rewritten files (a width-"
                    "window spans ≤2 range files + 1 new file + slack)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.session import get_spark
    from lakeshack_spark.streaming.ivm import stream_merge_versioned
    from lakeshack_spark.versioning import VersionedTable

    spark = get_spark(app_name="stress_streaming")
    n, nf, nb, w = args.rows, args.files, args.batches, args.width

    root = tempfile.mkdtemp(prefix="stress_stream_")
    try:
        table_dir = f"{root}/table"
        vt = VersionedTable(spark, table_dir)
        base = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("val")
        )
        t0 = time.time()
        vt.create(base.repartitionByRange(nf, "k"))
        create_sec = time.time() - t0
        n_files0 = len(vt.manifest(vt.latest_version())["files"])
        print(f"seed: {n} rows in {n_files0} range-clustered files, "
              f"{create_sec:.1f}s")

        # batch i updates keys [i*stride, i*stride + w): one narrow
        # window far from the others (stride >> w)
        stride = n // nb
        total_changes = 0
        for i in range(nb):
            sl = spark.range(i * stride, i * stride + w).select(
                F.col("id").alias("k"), (F.col("id") * 7).alias("val")
            )
            total_changes += w
            sl.coalesce(1).write.mode("overwrite").parquet(
                f"{root}/landing/slice{i}"
            )
        stream = (
            spark.readStream.schema("k long, val long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{root}/landing/*")
        )
        t0 = time.time()
        stream_merge_versioned(
            stream, table_dir, ["k"], update_cols=["val"],
            checkpoint_dir=f"{root}/ckpt",
        ).awaitTermination()
        stream_sec = time.time() - t0

        vers = vt.versions()
        assert len(vers) == 1 + nb, f"versions {vers}"
        batch_ids = sorted(
            vt.manifest(v)["meta"].get("batch_id") for v in vers[1:]
        )
        assert batch_ids == list(range(nb)), batch_ids
        rewrites = []
        for child in vers[1:]:
            child_m = vt.manifest(child)
            parent_m = vt.manifest(child_m["parent"])
            carried = set(child_m["files"]) & set(parent_m["files"])
            new = [f for f in child_m["files"] if f not in carried]
            dropped = [f for f in parent_m["files"] if f not in carried]
            assert len(dropped) <= args.max_rewrites, (
                f"v{child} rewrote {len(dropped)} files for a {w}-key "
                f"batch — clustered-key selectivity broken"
            )
            rewrites.append(
                {"version": child, "rewritten": len(dropped),
                 "new": len(new), "carried": len(carried)}
            )
        # exact end-state: updated windows carry val = 7k, rest 3k
        final = vt.read()
        in_window = F.lit(False)
        for i in range(nb):
            in_window = in_window | (
                (F.col("k") >= i * stride) & (F.col("k") < i * stride + w)
            )
        bad = final.filter(
            (in_window & (F.col("val") != F.col("k") * 7))
            | (~in_window & (F.col("val") != F.col("k") * 3))
        ).count()
        n_final = final.count()
        assert bad == 0, f"{bad} rows with wrong values"
        assert n_final == n, f"{n_final} rows after merges"

        per_batch = " ".join(
            f"v{r['version']}:{r['rewritten']}/{n_files0}" for r in rewrites
        )
        print(
            f"{nb} streaming merge commits of {w} keys each: "
            f"{stream_sec:.1f}s ({total_changes / stream_sec:.0f} rows/s); "
            f"files rewritten per batch: {per_batch}; all {n} end-state "
            f"values exact"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
