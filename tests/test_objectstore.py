"""Non-file filesystem legs for discovery, footer ingest, and pruned reads.

The reference's primary deployment is an object store: ``Metastore.update``
takes an explicit ``pyarrow.fs.FileSystem`` (lakeshack/metastore.py:209,
the docs' S3 walkthrough passes ``fs.S3FileSystem(region=...)``,
lakeshack/metastore.py:65-75) and ``_gather_metadata`` walks it with
``FileSelector(recursive=True)`` (lakeshack/metastore.py:368-376). No S3
endpoint exists in this sandbox — same as the reference's own test suite —
so these legs run the same code paths against in-process non-file
filesystems:

- ``SubTreeFileSystem``: a real pyarrow C++ filesystem with object-store
  path semantics (bucket-relative keys, no scheme, no os.walk), picklable
  to executors exactly like ``S3FileSystem`` — drives the explicit-
  ``filesystem=`` branch of ``list_parquet_files`` and the executor-side
  footer reads end-to-end.
- ``viewfs://``: a genuinely non-``file`` URI scheme served by the JVM
  Hadoop FileSystem — drives the Hadoop recursive-listing branch and a
  Spark pruned read over non-file URIs.
- ``mock://``: pyarrow's in-memory filesystem behind ``FileSystem.from_uri``
  — drives the (scheme, bucket)-keyed filesystem cache inside
  ``_footer_stats_for_files`` and proves one resolution per bucket, not
  per file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import pytest

from lakeshack_spark.metastore import (
    FileStatsMetastore,
    _footer_stats_for_files,
    list_parquet_files,
)


def _write_lake(root: str) -> dict[str, tuple[int, int, int]]:
    """Four disjoint-id-range parquet files plus sidecar/hidden decoys.
    Returns {relative filename: (id_min, id_max, n_rows)}."""
    os.makedirs(root, exist_ok=True)
    truth = {}
    for i, (lo, hi) in enumerate([(0, 99), (100, 199), (200, 299), (300, 399)]):
        ids = list(range(lo, hi + 1))
        tbl = pa.table({"id": ids, "x": [v * 2.0 for v in ids]})
        name = f"part-{i}.parquet"
        pq.write_table(tbl, os.path.join(root, name))
        truth[name] = (lo, hi, len(ids))
    # Decoys the lister must skip: metastore sidecar, staging dir, hidden
    # dir, non-parquet name, underscore-prefixed file.
    for sub in ("_lakeshack_stats", "_staging", ".hidden"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        pq.write_table(
            pa.table({"id": [1]}), os.path.join(root, sub, "decoy.parquet")
        )
    with open(os.path.join(root, "notes.txt"), "w") as f:
        f.write("not parquet")
    pq.write_table(pa.table({"id": [1]}), os.path.join(root, "_temp.parquet"))
    return truth


@pytest.fixture(scope="module")
def subtree_lake(tmp_path_factory):
    """(filesystem, lake-relative root, truth) — the lake lives under a
    SubTreeFileSystem so every path the engine sees is a scheme-less
    object-store-style key relative to the subtree root."""
    base = tmp_path_factory.mktemp("objstore")
    truth = _write_lake(str(base / "bucket" / "lake"))
    fs = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())
    return fs, "bucket/lake", truth


def test_explicit_fs_listing_matches_reference_selector(subtree_lake):
    fs, lake, truth = subtree_lake
    files = list_parquet_files(lake, filesystem=fs)
    assert files == sorted(f"{lake}/{name}" for name in truth)
    # single-file form (reference's get_file_info(...).is_file branch)
    one = f"{lake}/part-0.parquet"
    assert list_parquet_files(one, filesystem=fs) == [one]
    # missing path → empty, never raises
    assert list_parquet_files("bucket/nope", filesystem=fs) == []
    # a store listed AT a hidden-named root still lists its own files
    side = list_parquet_files(
        f"{lake}/_staging", filesystem=fs, skip_side_dirs=False
    )
    assert side == [f"{lake}/_staging/decoy.parquet"]


def test_explicit_fs_ingest_prune_and_read(spark, subtree_lake, tmp_path):
    """End-to-end over the explicit filesystem: update() pickles the fs to
    executors for footer reads, stats match local ground truth, pruning
    answers from relative keys, and the pruned read returns exact rows."""
    fs, lake, truth = subtree_lake
    schema = pa.schema([("id", pa.int64()), ("x", pa.float64())])
    ms = FileStatsMetastore(spark, str(tmp_path / "store"), schema, "id")
    n = ms.update(lake, filesystem=fs)
    assert n == len(truth)
    assert ms.update(lake, filesystem=fs) == 0  # idempotent second pass

    stats = {r["filepath"]: r for r in ms.stats_df().collect()}
    assert sorted(stats) == sorted(f"{lake}/{name}" for name in truth)
    for name, (lo, hi, n_rows) in truth.items():
        row = stats[f"{lake}/{name}"]
        assert (row["id_min"], row["id_max"], row["num_rows"]) == (lo, hi, n_rows)
        assert row["file_bytes"] > 0

    pruned = ms.query([150, 350])
    assert sorted(pruned) == [f"{lake}/part-1.parquet", f"{lake}/part-3.parquet"]
    assert pruned[f"{lake}/part-1.parquet"] == [150]

    # Pruned read through the SAME filesystem object (the reference reads
    # via ds.dataset(filepaths, filesystem=...), lakeshack/lakeshack.py:551).
    tbl = pq.read_table(f"{lake}/part-1.parquet", filesystem=fs)
    got = tbl.filter(pa.compute.equal(tbl["id"], 150))
    assert got.num_rows == 1 and got["x"][0].as_py() == 300.0


def test_viewfs_hadoop_listing_and_pruned_spark_read(spark, tmp_path):
    """A genuinely non-file URI scheme through the JVM listing branch:
    viewfs:// mounts the local lake, list_parquet_files returns qualified
    viewfs URIs with the sidecar/hidden rules applied, and spark.read
    executes a pruned scan over those URIs."""
    truth = _write_lake(str(tmp_path / "lake"))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set(
        "fs.viewfs.mounttable.objstoretest.link./lake",
        "file://" + str(tmp_path / "lake"),
    )
    files = list_parquet_files("viewfs://objstoretest/lake", spark)
    assert files == sorted(
        f"viewfs://objstoretest/lake/{name}" for name in truth
    )
    pruned = [f for f in files if f.endswith(("part-1.parquet", "part-3.parquet"))]
    df = spark.read.parquet(*pruned)
    assert df.count() == 200
    assert df.agg({"id": "min"}).collect()[0][0] == 100


def test_scheme_bucket_fs_cache_resolves_once_per_bucket(monkeypatch):
    """The executor-side footer reader caches filesystems by
    (scheme, bucket) — S3 resolves region/credentials PER BUCKET, so the
    cache key must include the authority while still amortizing one
    resolution across every file in the bucket. Driven here over mock://
    (pyarrow's in-memory store behind FileSystem.from_uri)."""
    # The reader resolves S3-convention relative paths: bucket stays IN
    # the path (from_uri("s3://b/k") → (fs, "b/k")), so each mock bucket's
    # filesystem carries its files under "<bucket>/..." keys.
    buckets = {}
    paths = []
    for bucket in ("b1", "b2"):
        fs = pafs.FileSystem.from_uri(f"mock://{bucket}/")[0]
        fs.create_dir(f"{bucket}/data")
        for i in range(3):
            key = f"{bucket}/data/f{i}.parquet"
            with fs.open_output_stream(key) as out:
                pq.write_table(pa.table({"id": [i, i + 10]}), out)
            paths.append(f"mock://{key}")
        buckets[bucket] = fs

    calls = []

    class CountingFileSystem:
        """Stands in for pafs.FileSystem in the reader's module lookup —
        the Cython class itself rejects attribute patches."""

        @staticmethod
        def from_uri(uri):
            calls.append(uri)
            bucket = uri.split("://", 1)[1].split("/", 1)[0]
            return buckets[bucket], uri.split("://", 1)[1]

    monkeypatch.setattr(pafs, "FileSystem", CountingFileSystem)
    rows = list(_footer_stats_for_files(paths, ["id"]))
    assert len(rows) == 6
    by_path = {r["filepath"]: r for r in rows}
    assert by_path["mock://b1/data/f2.parquet"]["id_min"] == 2
    assert by_path["mock://b2/data/f0.parquet"]["id_max"] == 10
    assert all(r["num_rows"] == 2 and r["file_bytes"] > 0 for r in rows)
    # one from_uri resolution per bucket, not per file
    assert len(calls) == 2
    assert sorted(c.split("/")[2] for c in calls) == ["b1", "b2"]
