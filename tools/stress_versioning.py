"""Versioned-table scale stress: many commits → manifest metadata cost,
time-travel read planning, CoW delete locality, vacuum accounting.

What the 100 TB story needs evidence for: (a) commit cost stays
O(changed files) — appending batch k never rewrites or re-lists the
k-1 earlier commits' data; (b) reading ANY version plans exactly that
manifest's file list with no directory walk (so read planning cost is
manifest parse, not lake size); (c) a copy-on-write delete touches only
files containing matches; (d) expire() reclaims exactly the
unreferenced files.

Usage: python tools/stress_versioning.py [--commits 60] [--rows-per-commit 5000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=60)
    ap.add_argument("--rows-per-commit", type=int, default=5000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.session import get_spark
    from lakeshack_spark.versioning import VersionedTable

    spark = get_spark(app_name="stress_versioning", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="stress_vt_")
    vt = VersionedTable(spark, os.path.join(root, "tbl"))
    rows = args.rows_per_commit

    def batch(i: int):
        return spark.range(i * rows, (i + 1) * rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("grp"),
            (F.col("id") * 31 % 1000).alias("val"),
        )

    t0 = time.time()
    vt.create(batch(0).coalesce(2))
    commit_times = []
    for i in range(1, args.commits):
        t = time.time()
        vt.append(batch(i).coalesce(2))
        commit_times.append(time.time() - t)
    n = args.commits
    print(
        f"{n} commits in {time.time()-t0:.1f}s; append cost first5="
        f"{sum(commit_times[:5])/5:.3f}s last5={sum(commit_times[-5:])/5:.3f}s "
        "(flat = O(changed files), not O(history))"
    )

    # Time-travel read planning: old version vs latest.
    for v in (1, n // 2, n):
        t = time.time()
        c = vt.read(v).count()
        print(f"read v{v}: {c} rows ({time.time()-t:.2f}s, "
              f"{vt.manifest(v)['n_files']} files planned)")
        assert c == rows * v

    # CoW delete aligned with the layout (one commit's key range, the
    # clustered-delete case): only that commit's files may be rewritten.
    lo, hi = (n - 1) * rows, n * rows
    pred = f"k >= {lo} AND k < {hi}"
    before = set(vt.manifest(n)["files"])
    t = time.time()
    v_del = vt.delete_where(pred)
    after = set(vt.manifest(v_del)["files"])
    carried = len(before & after)
    print(
        f"delete [{lo},{hi}) in {time.time()-t:.1f}s: {carried}/{len(before)}"
        f" files carried by reference, {len(before) - carried} rewritten"
    )
    assert carried == len(before) - 2  # exactly the last commit's 2 files
    assert vt.read(v_del).filter(pred).count() == 0
    n_del = vt.read(n).filter(pred).count()
    assert n_del == rows  # history intact

    # Vacuum: keep only the delete's version — exactly the files its CoW
    # rewrite replaced become unreferenced and are reclaimed.
    n_data = sum(len(fs) for _, _, fs in os.walk(os.path.join(vt.table_dir, "data")))
    t = time.time()
    removed = vt.expire(keep_last=1)
    print(
        f"expire(keep_last=1) removed {removed}/{n_data} data files "
        f"({time.time()-t:.1f}s); versions left: {vt.versions()}"
    )
    assert removed == len(before) - carried  # == the rewritten originals
    assert vt.read(v_del).count() == rows * n - n_del  # survivor still exact

    # ---- MERGE commits: per-commit cost bounded by the batch's key span,
    # not by history or table size -------------------------------------
    from pyspark.sql import functions as F

    base_v = vt.latest_version()
    n_keys = vt.count_rows(base_v)
    lat = []
    for i in range(10):
        cdc = spark.createDataFrame(
            [(int(k), -1, -1, False) for k in range(i * 7, i * 7 + 5)],
            "k long, grp long, val long, is_delete boolean",
        )
        t = time.time()
        vt.merge(cdc, ["k"], delete_col="is_delete")
        lat.append(time.time() - t)
    print(
        f"10 merge commits (5-key batches): first={lat[0]:.1f}s "
        f"last={lat[-1]:.1f}s median={sorted(lat)[5]:.1f}s "
        f"(flat => cost is O(touched files), not O(history))"
    )
    assert sorted(lat)[5] < 3 * lat[0] + 2  # flat within noise

    # ---- MoR delete vs CoW delete: the write-cost trade ---------------
    before_files = set(vt.manifest(vt.latest_version())["files"])
    t = time.time()
    v_mor = vt.delete_where_mor("k % 97 = 13")
    mor_s = time.time() - t
    assert set(vt.manifest(v_mor)["files"]) == before_files  # ZERO rewrite
    n_after_mor = vt.read(v_mor).count()
    t = time.time()
    v_purge = vt.apply_dvs()
    purge_s = time.time() - t
    assert vt.read(v_purge).count() == n_after_mor
    print(
        f"MoR delete committed in {mor_s:.1f}s with 0 files rewritten; "
        f"deferred purge materialized in {purge_s:.1f}s "
        f"(count via manifests: {vt.count_rows(v_purge)})"
    )
    assert vt.count_rows(v_purge) == n_after_mor  # manifest sum == scan

    # ---- WAP: staged appends invisible while audited -------------------
    vt.stage_append(
        spark.createDataFrame(
            [(10**9, 1, 1)], "k long, grp long, val long"
        ),
        "stress-wap",
    )
    assert vt.count_rows(vt.latest_version()) == n_after_mor  # invisible
    vt.publish("stress-wap")
    assert vt.count_rows(vt.latest_version()) == n_after_mor + 1
    print("WAP stage/publish: staged rows invisible until publish: OK")
    spark.stop()


if __name__ == "__main__":
    main()
