"""Snapshot-versioned tables with time travel: the Delta/Iceberg commit
model re-built on plain Parquet + JSON manifests.

The reference treats datasets as immutable file sets and delegates all
mutation to "rewrite and re-ingest" (docs/source/lakeshack.rst:120-161 —
late data handled by immutable load-date partitions;
lakeshack/metastore.py:480-560 — the metastore only ever *adds* file
rows). That model loses history: once a file is rewritten the old
version is gone. This module adds the missing lakehouse third leg next
to ``maintenance.compact`` / ``maintenance.delete_rows``: every commit
is a new *snapshot manifest* over immutable data files, so any past
version stays readable (time travel) and a reader never observes a
half-applied change.

Layout (all paths relative to the table root)::

    data/commit-<uuid>/part-*.parquet   immutable, written once
    _manifests/v000001.json             {"version", "parent", "op",
                                         "files": [...], "schema"}

Commit protocol
    Data files are written FIRST (into a fresh ``commit-<uuid>`` dir no
    manifest references yet), then the manifest is created with
    ``os.open(..., O_CREAT | O_EXCL)`` — the atomic commit point. Two
    writers racing to the same version number: exactly one wins, the
    loser raises :class:`ConcurrentCommitError` with its orphaned data
    dir cleaned up. This is the local-FS stand-in for a log store's
    conditional PUT (Delta's ``_delta_log`` / Iceberg's metadata swap);
    at 100 TB the same protocol runs against DynamoDB/S3 conditional
    writes — the data movement, which is all the cost, is identical.

100 TB shape
    - A manifest lists file paths, not row data: O(#files) driver-side
      metadata, the same scaling contract as Delta's checkpoint.
    - Reads plan exactly the manifest's file list — no directory
      listing, no eventual-consistency window, and dead files from
      aborted commits are invisible (they are simply never referenced).
    - ``delete_where`` is copy-on-write bounded to AFFECTED files: one
      distributed pass tags matches with ``input_file_name`` and only
      files that actually contain matches are rewritten; everything
      else is carried by reference into the new manifest. Composes with
      the zone-map metastore for the candidate cut exactly like
      ``maintenance.delete_rows``.
    - Old versions are reclaimed by an explicit ``expire`` (vacuum)
      retention pass, never implicitly — crash-window readers of an
      expired version fail loudly on the missing manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from lakeshack_spark.session import configure_session


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


def _local(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


class VersionedTable:
    """Snapshot-versioned Parquet table rooted at ``table_dir``."""

    def __init__(self, spark: SparkSession, table_dir: str):
        configure_session(spark)
        self.spark = spark
        self.table_dir = _local(table_dir.rstrip("/"))
        if "://" in table_dir and not table_dir.startswith("file://"):
            raise NotImplementedError(
                "VersionedTable's O_EXCL manifest commit is local-FS; on "
                "object storage back the manifest with a conditional-PUT "
                "log store (Delta/Iceberg handoff)"
            )
        self._manifest_dir = os.path.join(self.table_dir, "_manifests")
        self._data_dir = os.path.join(self.table_dir, "data")

    # ---------------------------------------------------------- metadata

    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for name in os.listdir(self._manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no snapshots under {self.table_dir}")
        return vs[-1]

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version:06d}.json")

    def manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def log(self) -> list[dict]:
        """Commit history, oldest first (op + file/row accounting +
        commit metadata such as a streaming batch id)."""
        return [
            {
                **{k: m[k] for k in ("version", "parent", "op", "n_files")},
                "meta": m.get("meta", {}),
            }
            for m in (self.manifest(v) for v in self.versions())
        ]

    # -------------------------------------------------------------- read

    def read(self, version: int | None = None) -> DataFrame:
        """The table AS OF ``version`` (default: latest). Plans exactly
        the manifest's file list — no directory listing. Snapshots with
        DELETION VECTORS (merge-on-read deletes) subtract the tombstoned
        (file, row position) pairs with one anti-join against the
        KB-sized DV sidecar; DV-free snapshots read the bare scan."""
        m = self.manifest(self.latest_version() if version is None else version)
        return self._read_manifest_like(m)

    def _read_manifest_like(self, m: dict) -> DataFrame:
        paths = [os.path.join(self.table_dir, f) for f in m["files"]]
        if not paths:
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(m["schema"])
            return self.spark.createDataFrame([], schema)
        if not m.get("dvs"):
            return self.spark.read.schema(
                _schema_from_manifest(m)
            ).parquet(*paths)
        schema = _schema_from_manifest(m)
        return self._scan_with_pos(m).select(*[f.name for f in schema.fields])

    def _scan_with_pos(self, m: dict) -> DataFrame:
        """DV-aware scan of a manifest's files carrying the physical row
        identity (``__dv_file`` = table-relative path, ``__dv_pos`` =
        parquet row index via ``_metadata.row_index``, SPARK-37980).
        Rows already tombstoned by the manifest's deletion vectors are
        subtracted with one broadcast anti-join — the DV writer and the
        reader derive the file key with the SAME expression
        (:meth:`_rel_file_col`), so the keys match exactly."""
        from pyspark.sql import functions as F

        paths = [os.path.join(self.table_dir, f) for f in m["files"]]
        df = self.spark.read.schema(_schema_from_manifest(m)).parquet(*paths)
        keyed = df.select(
            "*",
            self._rel_file_col().alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        dvs = m.get("dvs", [])
        if dvs:
            dv = self.spark.read.parquet(
                *[os.path.join(self.table_dir, d) for d in dvs]
            )
            keyed = keyed.join(
                F.broadcast(
                    dv.withColumnRenamed("file", "__dv_file")
                    .withColumnRenamed("pos", "__dv_pos")
                ),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        return keyed

    def _rel_file_col(self):
        """Table-relative path of the file a row came from, derived from
        the reader's ``_metadata.file_path`` — the one shared spelling
        the DV writer and the DV-aware reader both use."""
        from pyspark.sql import functions as F

        abs_col = F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/*", "/"
        )
        return F.substring(
            abs_col, len(self.table_dir.rstrip("/")) + 2, 1_000_000
        )

    # ------------------------------------------------------------ commits

    def create(self, df: DataFrame) -> int:
        """Initial snapshot (v1). Fails if the table already exists."""
        if self.versions():
            raise FileExistsError(
                f"{self.table_dir} already versioned; use append/delete_where"
            )
        files = self._write_data(df)
        return self._commit(1, parent=0, op="create", files=files, df=df)

    def append(self, df: DataFrame) -> int:
        """New snapshot = parent's files + ``df``'s rows as new files."""
        parent = self.latest_version()
        m = self.manifest(parent)
        files = m["files"] + self._write_data(df)
        return self._commit(
            parent + 1,
            parent=parent,
            op="append",
            files=files,
            df=df,
            dvs=m.get("dvs", []),
        )

    def delete_where(self, condition) -> int:
        """Copy-on-write delete: new snapshot without rows matching
        ``condition`` (Column or SQL string). Only files that actually
        contain matches are rewritten; the rest carry over by reference.
        """
        from pyspark.sql import functions as F

        if isinstance(condition, str):
            condition = F.expr(condition)
        parent = self.latest_version()
        if self.manifest(parent).get("dvs"):
            # a DV-bearing snapshot must materialize first: the survivor
            # rewrite below reads raw files and would resurrect
            # tombstoned rows
            parent = self.apply_dvs()
        m = self.manifest(parent)
        current = self.read(parent)
        # One distributed planning pass: which files hold matches?
        # (Bounded collect — O(#files), the same contract as the
        # manifest itself.)
        hit_uris = {
            r["__f"]
            for r in current.withColumn("__f", F.input_file_name())
            .filter(condition)
            .select("__f")
            .distinct()
            .collect()
        }
        hit_rel = {
            os.path.relpath(_local(u), self.table_dir) for u in hit_uris
        }
        carried = [f for f in m["files"] if f not in hit_rel]
        new_files: list[str] = []
        if hit_rel:
            survivors = (
                self.spark.read.schema(_schema_from_manifest(m))
                .parquet(*[os.path.join(self.table_dir, f) for f in hit_rel])
                .filter(~condition)
            )
            new_files = self._write_data(survivors)
        return self._commit(
            parent + 1,
            parent=parent,
            op="delete",
            files=carried + new_files,
            df=current,
        )

    def merge(
        self,
        source: DataFrame,
        key_cols: list[str],
        update_cols: list[str] | None = None,
        delete_col: str | None = None,
        insert: bool = True,
        meta: dict | None = None,
    ) -> int:
        """Copy-on-write MERGE INTO (Delta/Iceberg semantics via
        operators.diff.merge_upsert): one planning pass finds the files
        that contain any source key (null-safe semi probe — bounded
        collect, O(#files) like the manifest); only those files rewrite
        through the merge, every other file carries over BY REFERENCE,
        and not-matched inserts land in the rewrite set. With a
        clustered key a small CDC batch rewrites O(batch) files out of
        thousands — the update-path twin of ``delete_where``.

        ``meta`` is recorded on the manifest (e.g. a streaming batch id
        for exactly-once replay detection). Source keys must be unique
        (merge_upsert's contract — pre-aggregate CDC feeds to
        latest-per-key first).
        """
        from functools import reduce

        from pyspark.sql import functions as F

        from lakeshack_spark.operators.diff import merge_upsert

        parent = self.latest_version()
        if self.manifest(parent).get("dvs"):
            parent = self.apply_dvs()  # hit files are read raw below
        m = self.manifest(parent)
        current = self.read(parent)
        keys = source.select(*key_cols).distinct()
        cond = reduce(
            lambda a, b: a & b,
            [current[k].eqNullSafe(keys[k]) for k in key_cols],
        )
        hit_uris = {
            r["__f"]
            for r in current.withColumn("__f", F.input_file_name())
            .join(keys, cond, "left_semi")
            .select("__f")
            .distinct()
            .collect()
        }
        hit_rel = {
            os.path.relpath(_local(u), self.table_dir) for u in hit_uris
        }
        carried = [f for f in m["files"] if f not in hit_rel]
        if hit_rel:
            hit_rows = self.spark.read.schema(
                _schema_from_manifest(m)
            ).parquet(*[os.path.join(self.table_dir, f) for f in hit_rel])
        else:
            hit_rows = self.spark.createDataFrame(
                [], _schema_from_manifest(m)
            )
        merged = merge_upsert(
            hit_rows,
            source,
            key_cols,
            update_cols=update_cols,
            delete_col=delete_col,
            insert=insert,
        )
        new_files = self._write_data(merged)
        return self._commit(
            parent + 1,
            parent=parent,
            op="merge",
            files=carried + new_files,
            df=current,
            meta=meta,
        )

    def delete_where_mor(self, condition) -> int:
        """MERGE-ON-READ delete (Delta/Iceberg deletion vectors): instead
        of rewriting the files that contain matches (``delete_where``'s
        copy-on-write), commit a KB-sized DELETION VECTOR — the (file,
        row position) pairs of the matching rows — and leave every data
        file untouched. Reads subtract the DV with one broadcast
        anti-join. The write costs O(matches) instead of O(rewritten
        bytes): the right half of the delete trade-off for wide tables /
        small deletes / frequent deletes, with ``apply_dvs`` as the
        deferred CoW catch-up. Deletes stack (a second MoR delete
        appends its DV; already-tombstoned rows never re-match because
        the planning scan is DV-aware)."""
        from pyspark.sql import functions as F

        if isinstance(condition, str):
            condition = F.expr(condition)
        parent = self.latest_version()
        m = self.manifest(parent)
        dv_rows = (
            self._scan_with_pos(m)
            .filter(condition)
            .select(F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos"))
        )
        new_dvs = self._write_dv(dv_rows)
        return self._commit(
            parent + 1,
            parent=parent,
            op="delete_mor",
            files=m["files"],
            df=self.spark.createDataFrame([], _schema_from_manifest(m)),
            dvs=m.get("dvs", []) + new_dvs,
        )

    def apply_dvs(self) -> int:
        """Materialize the current snapshot's deletion vectors (Delta's
        REORG PURGE): rewrite ONLY the files the DVs actually tombstone
        rows in, carry every clean file by reference, and commit a
        DV-free snapshot. Returns the current version unchanged when no
        DVs exist."""
        from pyspark.sql import functions as F

        parent = self.latest_version()
        m = self.manifest(parent)
        dvs = m.get("dvs", [])
        if not dvs:
            return parent
        dv = self.spark.read.parquet(
            *[os.path.join(self.table_dir, d) for d in dvs]
        )
        affected = {r["file"] for r in dv.select("file").distinct().collect()}
        affected &= set(m["files"])
        carried = [f for f in m["files"] if f not in affected]
        new_files: list[str] = []
        if affected:
            sub = dict(m)
            sub["files"] = sorted(affected)
            survivors = self._read_manifest_like(sub)
            new_files = self._write_data(survivors)
        return self._commit(
            parent + 1,
            parent=parent,
            op="purge",
            files=carried + new_files,
            df=self.spark.createDataFrame([], _schema_from_manifest(m)),
            dvs=[],
        )

    @staticmethod
    def _footer_rows_abs(path: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows

    def _footer_rows(self, rel: str) -> int:
        return self._footer_rows_abs(os.path.join(self.table_dir, rel))

    def count_rows(self, version: int | None = None) -> int:
        """``COUNT(*) AS OF version`` answered from the MANIFEST alone —
        Σ per-file footer counts minus Σ deletion-vector tombstones,
        zero data I/O and zero Spark jobs (the versioned twin of the
        metastore's ``plan_agg`` interior path). Manifests written
        before row counts existed fall back to a scan count."""
        m = self.manifest(
            self.latest_version() if version is None else version
        )
        fr, dr = m.get("file_rows"), m.get("dv_rows")
        if fr is None or set(fr) != set(m["files"]) or (
            m.get("dvs") and (dr is None or set(dr) != set(m["dvs"]))
        ):
            return self._read_manifest_like(m).count()
        return sum(fr.values()) - sum((dr or {}).values())

    def _write_dv(self, df: DataFrame) -> list[str]:
        """Write deletion-vector rows as immutable files under a fresh
        ``data/dv-*`` dir; return their table-relative paths."""
        # "_"-prefixed so a metastore/data listing over <table>/data never
        # mistakes a DV sidecar for a data file (the hidden-subdir rule)
        dv_dir = f"_dv-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self._data_dir, dv_dir)
        df.coalesce(1).write.mode("error").parquet(out)
        return [
            os.path.join("data", dv_dir, n)
            for n in sorted(os.listdir(out))
            if n.endswith(".parquet")
        ]

    def compact(self, small_bytes: int = 32 * 1024 * 1024) -> int:
        """Small-file maintenance commit: fold every data file under
        ``small_bytes`` into right-sized replacements, carrying larger
        files BY REFERENCE — the OPTIMIZE/bin-pack half of the
        Delta/Iceberg maintenance pair (z-ordering lives in
        operators.zorder for plain lakes). Streaming merge commits and
        per-batch appends accrete small files; without folding, every
        read's task count grows with commit HISTORY instead of data
        size. Older versions keep reading the original files until
        ``expire`` reclaims them — compaction is just another snapshot.
        Returns the new version (or the current one when fewer than two
        small files exist — a no-op must not burn a version)."""
        parent = self.latest_version()
        if self.manifest(parent).get("dvs"):
            parent = self.apply_dvs()  # small files are read raw below
        m = self.manifest(parent)
        sizes = {
            f: os.path.getsize(os.path.join(self.table_dir, f))
            for f in m["files"]
        }
        small = [f for f in m["files"] if sizes[f] < small_bytes]
        if len(small) <= 1:
            return parent
        carried = [f for f in m["files"] if f not in set(small)]
        rows = self.spark.read.schema(_schema_from_manifest(m)).parquet(
            *[os.path.join(self.table_dir, f) for f in small]
        )
        n_out = max(1, sum(sizes[f] for f in small) // small_bytes + 1)
        new_files = self._write_data(rows.coalesce(n_out))
        return self._commit(
            parent + 1,
            parent=parent,
            op="compact",
            files=carried + new_files,
            df=rows,
        )

    # --------------------------------------------- write-audit-publish

    def _staged_path(self, wap_id: str) -> str:
        if not wap_id or "/" in wap_id or wap_id.startswith("."):
            raise ValueError(f"invalid wap_id {wap_id!r}")
        return os.path.join(self._manifest_dir, f"staged-{wap_id}.json")

    def staged_ids(self) -> list[str]:
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(
            n[len("staged-"):-len(".json")]
            for n in os.listdir(self._manifest_dir)
            if n.startswith("staged-") and n.endswith(".json")
        )

    def stage_append(self, df: DataFrame, wap_id: str) -> None:
        """Write-Audit-Publish, step 1 (the Iceberg WAP pattern): write
        ``df``'s rows as immutable files and a ``staged-<wap_id>``
        manifest that NO read path sees — ``read()``, ``versions()``,
        time travel and concurrent writers are all oblivious until
        ``publish``. The staged manifest is created O_EXCL, so a wap_id
        names exactly one payload. Audit with
        :meth:`read_staged` (+ e.g. ``operators.quality
        .check_expectations``), then :meth:`publish` or :meth:`abort`.
        """
        if not self.versions():
            raise FileExistsError(
                f"{self.table_dir} has no initial snapshot; create() first"
            )
        files = self._write_data(df)
        manifest = {
            "wap_id": wap_id,
            "op": "append",
            "files": files,
            "schema": json.loads(df.schema.json()),
        }
        os.makedirs(self._manifest_dir, exist_ok=True)
        try:
            fd = os.open(
                self._staged_path(wap_id), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            for f in files:
                d = os.path.dirname(os.path.join(self.table_dir, f))
                shutil.rmtree(d, ignore_errors=True)
            raise ConcurrentCommitError(
                f"wap_id {wap_id!r} already staged on {self.table_dir}"
            ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)

    def read_staged(self, wap_id: str) -> DataFrame:
        """What the table WOULD be if ``wap_id`` published now: the
        latest snapshot plus the staged rows — the audit surface."""
        with open(self._staged_path(wap_id)) as fh:
            staged = json.load(fh)
        m = self.manifest(self.latest_version())
        paths = [
            os.path.join(self.table_dir, f)
            for f in m["files"] + staged["files"]
        ]
        return self.spark.read.schema(_schema_from_manifest(m)).parquet(*paths)

    def publish(self, wap_id: str) -> int:
        """WAP step 3a: fold the staged files into a new version (append
        by reference — the staged data never rewrites) with the wap_id
        recorded in the manifest meta. IDEMPOTENT: replaying a publish
        whose commit already landed (crash between commit and staged-
        manifest cleanup) finds the wap_id marker, finishes the cleanup
        and returns the existing version."""
        for v in self.versions():
            m = self.manifest(v)
            if m.get("meta", {}).get("wap_id") == wap_id:
                staged_path = self._staged_path(wap_id)
                if os.path.exists(staged_path):
                    os.remove(staged_path)
                return v
        with open(self._staged_path(wap_id)) as fh:
            staged = json.load(fh)
        from pyspark.sql import types as T

        schema_df = self.spark.createDataFrame(
            [], T.StructType.fromJson(staged["schema"])
        )
        parent = self.latest_version()
        version = self._commit(
            parent + 1,
            parent=parent,
            op="append",
            files=self.manifest(parent)["files"] + staged["files"],
            df=schema_df,
            meta={"wap_id": wap_id},
            dvs=self.manifest(parent).get("dvs", []),
        )
        os.remove(self._staged_path(wap_id))
        return version

    def abort(self, wap_id: str) -> None:
        """WAP step 3b: drop the staged manifest and the data files only
        it references (they live in their own commit dirs, so no
        published version can be touched)."""
        with open(self._staged_path(wap_id)) as fh:
            staged = json.load(fh)
        os.remove(self._staged_path(wap_id))
        for f in staged["files"]:
            d = os.path.dirname(os.path.join(self.table_dir, f))
            shutil.rmtree(d, ignore_errors=True)

    def expire(self, keep_last: int) -> int:
        """Vacuum: drop all but the newest ``keep_last`` manifests, then
        remove data files no surviving manifest references. Returns the
        number of data files deleted."""
        vs = self.versions()
        drop, keep = vs[:-keep_last], vs[-keep_last:]
        live: set[str] = set()
        for v in keep:
            mk = self.manifest(v)
            live.update(mk["files"])
            live.update(mk.get("dvs", []))
        removed = 0
        for v in drop:
            md = self.manifest(v)
            for f in md["files"] + md.get("dvs", []):
                if f not in live:
                    path = os.path.join(self.table_dir, f)
                    if os.path.exists(path):
                        os.remove(path)
                        removed += 1
            os.remove(self._manifest_path(v))
        return removed

    # ----------------------------------------------------------- helpers

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write ``df`` as immutable files under a fresh commit dir;
        return their table-relative paths."""
        commit = f"commit-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self._data_dir, commit)
        df.write.mode("error").parquet(out)
        rel = []
        for name in sorted(os.listdir(out)):
            if name.endswith(".parquet"):
                rel.append(os.path.join("data", commit, name))
        return rel

    def _commit(
        self,
        version: int,
        parent: int,
        op: str,
        files: list[str],
        df: DataFrame,
        meta: dict | None = None,
        dvs: list[str] | None = None,
    ) -> int:
        # Per-file footer row counts (Delta's numRecords): carried files
        # reuse the parent's entry, only NEW files read their (local)
        # footer — O(new files) driver work, and COUNT(*) AS OF any
        # version becomes a manifest sum (count_rows). DV files get the
        # same treatment: a DV file's row count IS its tombstone count.
        parent_rows = (
            self.manifest(parent).get("file_rows", {}) if parent else {}
        )
        parent_dv_rows = (
            self.manifest(parent).get("dv_rows", {}) if parent else {}
        )
        file_rows = {
            f: parent_rows.get(f, self._footer_rows(f)) for f in files
        }
        dv_rows = {
            d: parent_dv_rows.get(d, self._footer_rows(d))
            for d in (dvs or [])
        }
        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "files": files,
            "n_files": len(files),
            "schema": json.loads(df.schema.json()),
            "meta": meta or {},
            "dvs": dvs or [],
            "file_rows": file_rows,
            "dv_rows": dv_rows,
        }
        os.makedirs(self._manifest_dir, exist_ok=True)
        path = self._manifest_path(version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # Lost the race: our data dirs are orphans no manifest
            # references — clean up the ones unique to this attempt.
            for f in files:
                full = os.path.join(self.table_dir, f)
                d = os.path.dirname(full)
                if os.path.basename(d).startswith("commit-") and not any(
                    f in self.manifest(v)["files"] for v in self.versions()
                ):
                    shutil.rmtree(d, ignore_errors=True)
            raise ConcurrentCommitError(
                f"version {version} of {self.table_dir} was committed "
                "concurrently; re-read latest and retry"
            ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)
        return version


def _schema_from_manifest(m: dict):
    from pyspark.sql import types as T

    return T.StructType.fromJson(m["schema"])


def snapshot_pruned_query(
    vt: VersionedTable,
    shack,
    version: int,
    cluster_column_values,
    optional_where_clauses=(),
    columns=None,
) -> DataFrame:
    """Zone-map-pruned point lookup AS OF a snapshot: the reference's
    query semantics (IN-list ∧ AND-ed clauses ∧ projection,
    engine.Lakeshack.query) composed with time travel.

    Data files are immutable, so ONE stats store over ``<table>/data``
    serves every version — pruning and versioning compose by set
    intersection: scan exactly ``candidate_files ∩ manifest(version)``.
    Orphans from aborted commits may carry stats rows; the manifest
    intersection makes them invisible, and pruning false-positives stay
    harmless because the exact predicate is re-applied (the reference's
    own contract, README.rst:12-19). At 100 TB both sides of the
    intersection are metadata: the prune is a stats-table filter, the
    manifest a file list — no data touched until the final scan of the
    (typically single-file) survivor set."""
    from lakeshack_spark.engine import build_predicate

    if not isinstance(cluster_column_values, (list, tuple)):
        cluster_column_values = [cluster_column_values]
    m = vt.manifest(version)
    members = {os.path.join(vt.table_dir, f) for f in m["files"]}
    candidates = shack.candidate_files(
        cluster_column_values, optional_where_clauses
    )
    chosen = sorted(set(candidates) & members)
    if chosen:
        df = vt.spark.read.schema(_schema_from_manifest(m)).parquet(*chosen)
    else:
        df = vt.spark.createDataFrame([], _schema_from_manifest(m))
    df = df.filter(
        build_predicate(
            shack.cluster_column, cluster_column_values, optional_where_clauses
        )
    )
    if columns is not None:
        df = df.select(*columns)
    return df


def snapshot_agg(
    vt: VersionedTable,
    shack,
    version: int,
    optional_where_clauses=(),
    min_max_columns=(),
    count_columns=(),
) -> DataFrame:
    """Metadata-only COUNT/MIN/MAX AS OF a snapshot: ``Lakeshack
    .query_agg`` restricted to ``manifest(version)``'s file list — the
    aggregation twin of :func:`snapshot_pruned_query`, composing the
    zone-map classification (interior files answered from footer stats,
    boundary files scanned) with time travel over the SAME immutable
    per-file stats store that serves every version. Snapshots carrying
    deletion vectors must ``apply_dvs`` first: footer stats cannot see
    tombstones, so a metadata answer would overcount."""
    m = vt.manifest(version)
    if m.get("dvs"):
        raise ValueError(
            f"version {version} carries deletion vectors; footer stats "
            "cannot subtract tombstones — run apply_dvs() first or "
            "aggregate over vt.read(version)"
        )
    members = [os.path.join(vt.table_dir, f) for f in m["files"]]
    return shack.query_agg(
        optional_where_clauses,
        min_max_columns=min_max_columns,
        count_columns=count_columns,
        files=members,
    )
