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
