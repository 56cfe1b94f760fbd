"""Snapshot-versioned table: time travel, copy-on-write delete, the
O_EXCL commit point, and vacuum retention."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from lakeshack_spark.versioning import ConcurrentCommitError, VersionedTable


def _mk(spark, tmp_path, rows):
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame([Row(k=i, grp=i % 3, val=i * 10) for i in rows])
    assert vt.create(df.repartition(3, "grp")) == 1
    return vt


def test_create_append_delete_time_travel(spark, tmp_path):
    vt = _mk(spark, tmp_path, range(30))
    assert vt.append(
        spark.createDataFrame([Row(k=100 + i, grp=9, val=-1) for i in range(5)])
    ) == 2
    assert vt.delete_where(F.col("grp") == 0) == 3

    # Every version stays readable with its own contents.
    assert vt.read(1).count() == 30
    assert vt.read(2).count() == 35
    v3 = vt.read(3)
    assert v3.count() == 35 - 10  # grp==0 in v1's rows: k%3==0 → 10 rows
    assert v3.filter(F.col("grp") == 0).count() == 0
    # Latest == explicit latest version.
    assert vt.read().count() == v3.count()
    assert [e["op"] for e in vt.log()] == ["create", "append", "delete"]


def test_delete_rewrites_only_affected_files(spark, tmp_path):
    vt = _mk(spark, tmp_path, range(30))
    before = set(vt.manifest(1)["files"])
    # grp-partitioned write: grp==1 rows live in a subset of files.
    vt.delete_where("grp = 1")
    after = set(vt.manifest(2)["files"])
    carried = before & after
    assert carried, "unaffected files must carry over by reference"
    # Carried files are byte-identical paths (immutable data).
    for f in carried:
        assert os.path.exists(os.path.join(vt.table_dir, f))
    # Old version still sees the deleted rows.
    assert vt.read(1).filter("grp = 1").count() == 10


def test_commit_is_atomic_o_excl(spark, tmp_path, monkeypatch):
    vt = _mk(spark, tmp_path, range(6))
    # Both writers read latest=1 and race for v2: the second to reach the
    # O_EXCL manifest create must lose, even though it wrote data first.
    winner = vt.manifest(1) | {"version": 2, "parent": 1, "op": "append"}
    with open(vt._manifest_path(2), "w") as fh:
        json.dump(winner, fh)
    monkeypatch.setattr(vt, "latest_version", lambda: 1)  # stale read
    with pytest.raises(ConcurrentCommitError):
        vt.append(spark.createDataFrame([Row(k=99, grp=0, val=0)]))
    # The loser's orphan data dirs were cleaned up: every commit dir on
    # disk is referenced by some manifest.
    referenced = set()
    for v in vt.versions():
        for f in vt.manifest(v)["files"]:
            referenced.add(f.split(os.sep)[1])
    on_disk = set(os.listdir(os.path.join(vt.table_dir, "data")))
    assert on_disk == referenced


def test_expire_vacuums_unreferenced_files(spark, tmp_path):
    vt = _mk(spark, tmp_path, range(30))
    vt.delete_where("grp = 0")
    vt.delete_where("grp = 1")
    n_before = sum(
        len(files) for _, _, files in os.walk(os.path.join(vt.table_dir, "data"))
    )
    removed = vt.expire(keep_last=1)
    assert vt.versions() == [3]
    assert removed > 0
    # Survivor version still fully readable.
    assert vt.read(3).filter("grp in (0, 1)").count() == 0
    assert vt.read(3).count() == 10
    n_after = sum(
        len(files) for _, _, files in os.walk(os.path.join(vt.table_dir, "data"))
    )
    assert n_after == n_before - removed
    with pytest.raises(FileNotFoundError):
        vt.manifest(1)


def test_read_empty_snapshot_keeps_schema(spark, tmp_path):
    vt = _mk(spark, tmp_path, range(3))
    vt.delete_where(F.lit(True))
    empty = vt.read(2)
    assert empty.count() == 0
    assert empty.schema == vt.read(1).schema


def test_snapshot_pruned_query_selective_and_exact(spark):
    """AS-OF pruned lookup: plans candidate ∩ manifest (fewer files than
    the store holds), and equals the unpruned filter on the same
    version — pruning is pure I/O avoidance, never a semantic."""
    from tests.conftest import SF_SMOKE
    from lakeshack_spark.queries import _versioned_orders_shack
    from lakeshack_spark.versioning import snapshot_pruned_query

    vt, shack = _versioned_orders_shack(spark, SF_SMOKE)
    values = [11, 47, 102, 999]
    clauses = [("o_totalprice", ">=", 50000.0)]
    # The store indexes every commit's files (all versions); membership
    # in a given version is the manifest intersection's job.
    candidates = shack.candidate_files(values, clauses)
    got = snapshot_pruned_query(vt, shack, 1, values, clauses)
    want = vt.read(1).filter(
        F.col("o_custkey").isin(values) & (F.col("o_totalprice") >= 50000.0)
    )
    a = sorted((r.o_orderkey, r.o_custkey) for r in got.collect())
    b = sorted((r.o_orderkey, r.o_custkey) for r in want.collect())
    assert a == b and a
    # Selectivity: the range-clustered layout must let the zone map drop
    # at least one of v1's four files for this 4-key IN-list.
    members = {f.split("/")[-1] for f in vt.manifest(1)["files"]}
    chosen = {c.split("/")[-1] for c in candidates} & members
    assert len(chosen) < len(members), (chosen, members)


# ---------------------------------------------------------------------------
# MERGE commits + streaming CDC apply
# ---------------------------------------------------------------------------


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    from lakeshack_spark.operators.diff import merge_upsert

    base = spark.range(800).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.create(base.repartitionByRange(8, "k").sortWithinPartitions("k"))
    m1 = vt.manifest(1)
    assert m1["n_files"] == 8
    cdc = spark.createDataFrame(
        [(5, 999, False), (6, 998, False), (7, 0, True), (2000, 42, False)],
        "k long, v long, is_delete boolean",
    )
    assert vt.merge(cdc, ["k"], delete_col="is_delete") == 2
    m2 = vt.manifest(2)
    carried = set(m1["files"]) & set(m2["files"])
    # keys 5/6/7 live in ONE of the 8 range files: 7 carry by reference
    assert len(carried) == 7, (len(carried), m2["n_files"])
    got = {(r.k, r.v) for r in vt.read(2).collect()}
    want = {
        (r.k, r.v)
        for r in merge_upsert(base, cdc, ["k"], delete_col="is_delete").collect()
    }
    assert got == want
    # v1 still intact (time travel across the merge)
    assert vt.read(1).count() == 800
    assert m2["op"] == "merge" and m2["meta"] == {}


def test_stream_merge_versioned_exactly_once(spark, tmp_path_factory):
    """Streaming CDC apply into a VersionedTable: three micro-batches →
    three merge commits; the final snapshot equals the sequential batch
    merges; a REPLAY stream (fresh checkpoint, same batch ids) finds its
    batch_id markers in the manifests and commits nothing."""
    import os as _os
    import time as _time

    from lakeshack_spark.streaming.ivm import stream_merge_versioned

    table_dir = str(tmp_path_factory.mktemp("vmerge") / "t")
    vt = VersionedTable(spark, table_dir)
    vt.create(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k long, v long"
        ).coalesce(1)
    )
    schema = "k long, v long, is_delete boolean"
    batches = [
        [(1, 11, False), (4, 40, False)],   # update k1, insert k4
        [(2, 0, True), (3, 33, False)],     # delete k2, update k3
        [(5, 50, False), (4, 44, False)],   # insert k5, update k4
    ]
    landing = tmp_path_factory.mktemp("vmerge_landing")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / f"slice{i}"))
        t = _time.time() - 300 + i * 10
        for root, _, files in _os.walk(str(landing / f"slice{i}")):
            for f in files:
                _os.utime(_os.path.join(root, f), (t, t))

    def start(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{landing}/*")
        )
        return stream_merge_versioned(
            stream,
            table_dir,
            ["k"],
            delete_col="is_delete",
            checkpoint_dir=str(tmp_path_factory.mktemp(ckpt)),
        )

    start("ck1").awaitTermination(300)
    assert vt.versions() == [1, 2, 3, 4]
    got = {(r.k, r.v) for r in vt.read().collect()}
    assert got == {(1, 11), (3, 33), (4, 44), (5, 50)}
    ids = [vt.manifest(v)["meta"].get("batch_id") for v in (2, 3, 4)]
    assert ids == [0, 1, 2]
    # replay: a fresh checkpoint re-delivers batch ids 0..2 over the same
    # files — every one finds its marker and skips
    start("ck2").awaitTermination(300)
    assert vt.versions() == [1, 2, 3, 4]
    assert {(r.k, r.v) for r in vt.read().collect()} == got
    # every intermediate version stays time-travel readable
    assert vt.read(2).count() == 4  # +k4, k1 updated


def test_wap_stage_audit_publish_abort(spark, tmp_path):
    """Write-Audit-Publish: staged appends are invisible to every read
    path until published; abort removes the staged payload; publish is
    idempotent on its wap_id (the crash-between-commit-and-cleanup
    replay)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileExistsError):
        vt.stage_append(
            spark.createDataFrame([(1, 1)], "k long, v long"), "w0"
        )
    vt.create(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    vt.stage_append(
        spark.createDataFrame([(3, 30), (4, 40)], "k long, v long"), "w1"
    )
    vt.stage_append(
        spark.createDataFrame([(9, -1)], "k long, v long"), "w2"
    )
    # invisible until published
    assert vt.versions() == [1] and vt.read().count() == 2
    assert vt.staged_ids() == ["w1", "w2"]
    # the audit surface is the would-be table
    assert vt.read_staged("w1").count() == 4
    # duplicate wap_id rejected, its orphan data cleaned
    from lakeshack_spark.versioning import ConcurrentCommitError

    n_dirs = len(os.listdir(str(tmp_path / "t" / "data")))
    with pytest.raises(ConcurrentCommitError):
        vt.stage_append(
            spark.createDataFrame([(5, 50)], "k long, v long"), "w1"
        )
    assert len(os.listdir(str(tmp_path / "t" / "data"))) == n_dirs
    # abort drops the staged manifest AND its data dirs
    vt.abort("w2")
    assert vt.staged_ids() == ["w1"]
    assert len(os.listdir(str(tmp_path / "t" / "data"))) == n_dirs - 1
    v = vt.publish("w1")
    assert v == 2 and vt.read().count() == 4
    assert vt.manifest(2)["meta"] == {"wap_id": "w1"}
    assert vt.staged_ids() == []
    # replayed publish: finds the marker, returns the same version
    assert vt.publish("w1") == 2
    assert vt.versions() == [1, 2]
    # staged data published BY REFERENCE: v2 carries v1's file + staged
    assert set(vt.manifest(1)["files"]) < set(vt.manifest(2)["files"])


def test_compact_folds_small_files_and_preserves_history(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.create(
        spark.createDataFrame([(i, i * 2) for i in range(10)], "k long, v long")
        .coalesce(1)
    )
    for b in range(4):  # per-batch appends accrete small files
        vt.append(
            spark.createDataFrame(
                [(100 + b * 10 + i, i) for i in range(5)], "k long, v long"
            ).coalesce(1)
        )
    n_before = vt.manifest(vt.latest_version())["n_files"]
    assert n_before == 5
    before = {(r.k, r.v) for r in vt.read().collect()}
    v = vt.compact()
    assert v == 6
    m = vt.manifest(v)
    assert m["op"] == "compact" and m["n_files"] == 1
    assert {(r.k, r.v) for r in vt.read().collect()} == before
    # history intact: every pre-compaction version still reads
    assert [vt.read(i).count() for i in range(1, 6)] == [10, 15, 20, 25, 30]
    # a second compact is a no-op that does NOT burn a version
    assert vt.compact() == v and vt.versions()[-1] == v
    # vacuum after compaction reclaims exactly the folded originals
    removed = vt.expire(keep_last=1)
    assert removed == 5
    assert {(r.k, r.v) for r in vt.read().collect()} == before


def test_mor_delete_deletion_vectors(spark, tmp_path):
    """Merge-on-read delete: a KB deletion vector, zero files rewritten;
    deletes stack; purge (apply_dvs) rewrites only tombstone-bearing
    files; CoW ops on a DV snapshot auto-materialize first; vacuum
    reclaims DV files."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.create(
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
    )
    v2 = vt.delete_where_mor("k % 10 = 3")
    m2 = vt.manifest(v2)
    assert m2["op"] == "delete_mor" and len(m2["dvs"]) == 1
    assert m2["files"] == vt.manifest(1)["files"]  # ZERO rewrite
    assert vt.read(v2).count() == 90 and vt.read(1).count() == 100
    # stacking: second MoR delete appends its DV, tombstoned rows never
    # re-match (the planning scan is DV-aware)
    v3 = vt.delete_where_mor("k % 10 = 4 or k % 10 = 3")
    m3 = vt.manifest(v3)
    assert len(m3["dvs"]) == 2 and m3["files"] == m2["files"]
    assert vt.read(v3).count() == 80
    dv2 = spark.read.parquet(str(tmp_path / "t" / m3["dvs"][1]))
    assert dv2.count() == 10  # only the NEW tombstones, not re-deletes
    # append on a DV snapshot carries the DVs (old files untouched)
    v4 = vt.append(spark.createDataFrame([(200, 1)], "k long, v long"))
    assert vt.manifest(v4)["dvs"] == m3["dvs"]
    assert vt.read(v4).count() == 81
    # purge: rewrite ONLY tombstone-bearing files; clean files carry
    v5 = vt.apply_dvs()
    m5 = vt.manifest(v5)
    assert m5["op"] == "purge" and m5["dvs"] == []
    dv_all = spark.read.parquet(
        *[str(tmp_path / "t" / d) for d in m3["dvs"]]
    )
    affected = {r["file"] for r in dv_all.select("file").distinct().collect()}
    carried = set(vt.manifest(v4)["files"]) - affected
    assert carried <= set(m5["files"])  # clean files carry by reference
    assert not (affected & set(m5["files"]))  # tombstoned ones rewrote
    got = sorted(r.k for r in vt.read(v5).collect())
    assert len(got) == 81 and all(
        k % 10 not in (3, 4) for k in got if k < 200
    )
    # apply_dvs on a clean snapshot is a no-op version-wise
    assert vt.apply_dvs() == v5
    # CoW delete on a DV snapshot materializes first (no resurrection)
    vt.delete_where_mor("k = 0")
    vt.delete_where("k >= 150")
    assert sorted(r.k for r in vt.read().collect()) == [
        k for k in range(1, 100) if k % 10 not in (3, 4)
    ]
    # vacuum reclaims DV files of expired versions
    import glob as _glob

    n_dv_files = len(_glob.glob(str(tmp_path / "t" / "data" / "_dv-*" / "*.parquet")))
    assert n_dv_files >= 3
    vt.expire(keep_last=1)
    left = _glob.glob(str(tmp_path / "t" / "data" / "_dv-*" / "*.parquet"))
    assert left == [], left


def test_count_rows_manifest_only_and_fallback(spark, tmp_path):
    """COUNT(*) AS OF from manifest sums: footer counts minus DV
    tombstones; pre-row-count manifests fall back to a scan."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.create(
        spark.range(60)
        .select(F.col("id").alias("k"))
        .repartitionByRange(3, "k")
    )
    vt.delete_where_mor("k % 3 = 0")
    vt.append(spark.createDataFrame([(100,), (101,)], "k long"))
    assert [vt.count_rows(v) for v in (1, 2, 3)] == [60, 40, 42]
    # every count agrees with the (DV-aware) scan
    for v in (1, 2, 3):
        assert vt.count_rows(v) == vt.read(v).count()
    # legacy manifest without file_rows: fallback to scan count
    p = vt._manifest_path(3)
    m = json.load(open(p))
    m.pop("file_rows"), m.pop("dv_rows")
    json.dump(m, open(p, "w"))
    assert vt.count_rows(3) == 42
