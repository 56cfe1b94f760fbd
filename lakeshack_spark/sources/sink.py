"""Custom PySpark data SINK: clustered-lake append that indexes itself.

`df.write.format("lakeshack_sink").option("path", lake).option(
"cluster_column", col).mode("append").save()` writes each partition as
one Parquet file (executor-side, Arrow record batches — the
DataSourceArrowWriter fast path) and, in the driver-side ``commit()``,
registers exactly the committed files in the lake's co-located stats
metastore. This is the write half of the reference's deployment story
(cluster with Spark, then ``Metastore.update``,
/root/reference/docs/source/lakeshack.rst:252-263 + 322-334) collapsed
into ONE sink: data and zone-map index can no longer drift apart.

Commit protocol (Hadoop-v1 shape): tasks write into the shared
``_staging`` directory under names unique per (process, partition,
task attempt); ``commit()`` moves exactly the files its messages name
into the lake root and only then indexes them; ``abort()`` sweeps the
same message-named files. A failed/retried task's orphan lives only in
staging (never visible to readers or the index), and the metastore
ingest is idempotent (filepath anti-join) so a replayed commit
re-indexes nothing. Staging assumes a filesystem with atomic rename
that all writers share (local or NFS/HDFS-style); for object stores
write direct and rely on the idempotent index — the documented trade.

Clustering is the CALLER's plan, as in the reference's own docs: run
``df.repartitionByRange(n, col).sortWithinPartitions(col)`` upstream
(or ``writer.cluster_write`` for a materialized lake) — a sink cannot
repartition its input. The sink records whatever file layout arrives.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyarrow import RecordBatch
    from pyspark.sql.types import StructType


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: Optional[str]
    n_rows: int


class LakeshackSinkWriter(DataSourceArrowWriter):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "lakeshack_sink requires .option('path', <lake dir>)"
            )
        self.path = path.rstrip("/")
        self.cluster_column = options.get("cluster_column")
        self.optional_columns = [
            c for c in options.get("optional_columns", "").split(",") if c
        ]
        # staging must be DERIVABLE from options alone: the streaming
        # path re-instantiates the writer in separate worker processes
        # (write-side and commit-side see different instances), so a
        # per-instance random token would desynchronize them — measured
        # as commit() missing the files write() staged. Uniqueness lives
        # in the FILE names (pid + task attempt id) instead; moves are
        # message-driven, so concurrent jobs sharing the dir don't
        # interfere.
        self.staging = f"{self.path}/_staging"

    # ---- executor side -------------------------------------------------
    def write(self, iterator: Iterator["RecordBatch"]) -> _FileCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        writer = None
        fname = None
        n_rows = 0
        try:
            for batch in iterator:
                if writer is None:
                    os.makedirs(self.staging, exist_ok=True)
                    fname = (
                        f"{self.staging}/part-{os.getpid()}"
                        f"-{part:05d}-{attempt}.parquet"
                    )
                    writer = pq.ParquetWriter(fname, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                n_rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        # empty partition: no file (a zero-row parquet would still cost a
        # footer read + a stats row at every future ingest)
        return _FileCommit(
            filename=os.path.basename(fname) if fname else None,
            n_rows=n_rows,
        )

    # ---- driver side ---------------------------------------------------
    def commit(self, messages: List[Optional["WriterCommitMessage"]]) -> None:
        moved = []
        for m in messages:
            if m is None or m.filename is None:
                continue
            src = f"{self.staging}/{m.filename}"
            dst = f"{self.path}/{m.filename}"
            os.replace(src, dst)
            moved.append(dst)
        # remove staging only if empty: a concurrent job (or the next
        # micro-batch already writing) may still own files in it
        try:
            os.rmdir(self.staging)
        except OSError:
            pass
        if moved and self.cluster_column:
            self._index_committed(moved)

    def _index_committed(self, files: List[str]) -> None:
        """Index the committed files in the lake's co-located
        ``_lakeshack_stats`` Parquet store WITHOUT Spark: commit() runs
        in the data-source Python worker, where no SparkSession exists
        (``getActiveSession()`` is None) — and none is needed, because
        indexing a batch of files is footer METADATA work. Reuses the
        exact executor-side row builder the Spark ingest uses
        (metastore._footer_stats_for_files) and appends one Parquet
        file whose schema mirrors FileStatsMetastore.stats_schema
        (string/int→long/float→double/date/timestamp-µs-UTC — pinned
        against a Spark-built store by a parity test, including that a
        later Spark ``update_metastore()`` reads the sink-written store
        and ingests 0 new files). Filepath dedup against the existing
        store keeps replayed commits idempotent, same anti-join
        semantics as the Spark path."""
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        from lakeshack_spark.metastore import _footer_stats_for_files

        store = f"{self.path}/_lakeshack_stats"

        def stat_type(t):
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return pa.string()
            if pa.types.is_integer(t):
                return pa.int64()
            if pa.types.is_floating(t):
                return pa.float64()
            if pa.types.is_date(t):
                return pa.date32()
            if pa.types.is_timestamp(t):
                return pa.timestamp("us", tz="UTC")
            return None

        data_schema = pq.read_schema(files[0])
        tracked = [self.cluster_column]
        for c in self.optional_columns:
            if (
                c in data_schema.names
                and stat_type(data_schema.field(c).type) is not None
            ):
                tracked.append(c)
        existing_files = (
            [
                f"{store}/{f}"
                for f in os.listdir(store)
                if f.endswith(".parquet")
            ]
            if os.path.isdir(store)
            else []
        )
        if existing_files:
            ds = pads.dataset(existing_files, format="parquet")
            schema = ds.schema
            seen = set(
                ds.to_table(columns=["filepath"])["filepath"].to_pylist()
            )
        else:
            fields = [
                pa.field("filepath", pa.string(), nullable=False),
                pa.field("num_rows", pa.int64(), nullable=False),
                pa.field("file_bytes", pa.int64()),
            ]
            for c in tracked:
                st = stat_type(data_schema.field(c).type)
                fields.append(pa.field(f"{c}_min", st))
                fields.append(pa.field(f"{c}_max", st))
            schema = pa.schema(fields)
            seen = set()
        rows = [
            r
            for r in _footer_stats_for_files(files, tracked)
            if r["filepath"] not in seen
        ]
        if not rows:
            return
        cols = {
            f.name: [r.get(f.name) for r in rows] for f in schema
        }
        table = pa.table(
            {n: pa.array(v, type=schema.field(n).type) for n, v in cols.items()},
            schema=schema,
        )
        os.makedirs(store, exist_ok=True)
        # name derived from the indexed CONTENT: unique per batch, and a
        # replayed commit rewrites the same file with identical rows
        # (idempotent) instead of colliding with other batches' rows
        import hashlib

        token = hashlib.md5(
            "|".join(sorted(r["filepath"] for r in rows)).encode("utf-8")
        ).hexdigest()[:12]
        pq.write_table(table, f"{store}/part-sink-{token}.parquet")

    def abort(self, messages: List[Optional["WriterCommitMessage"]]) -> None:
        # sweep only THIS job's staged files (message-driven, same
        # reasoning as commit); the dir goes when the last owner leaves
        for m in messages or []:
            if m is not None and getattr(m, "filename", None):
                try:
                    os.remove(f"{self.staging}/{m.filename}")
                except OSError:
                    pass
        try:
            os.rmdir(self.staging)
        except OSError:
            pass


class LakeshackSinkDataSource(DataSource):
    """Register with ``spark.dataSource.register(LakeshackSinkDataSource)``.

    Options: ``path`` (required, lake root), ``cluster_column``
    (optional — when set, commit() indexes the lake's co-located
    ``_lakeshack_stats`` store), ``optional_columns`` (comma-separated
    extra range-indexed columns). Append-only: ``mode("overwrite")``
    raises — truncating a lake plus its index is a maintenance action
    (see maintenance.compact), not a side effect of a write.
    """

    @classmethod
    def name(cls) -> str:
        return "lakeshack_sink"

    def writer(self, schema: "StructType", overwrite: bool):
        if overwrite:
            raise ValueError(
                "lakeshack_sink is append-only; use maintenance.compact "
                "or delete the lake explicitly instead of overwrite mode"
            )
        return LakeshackSinkWriter(self.options)

    def streamWriter(self, schema: "StructType", overwrite: bool):
        if overwrite:
            raise ValueError("lakeshack_sink is append-only")
        return LakeshackSinkStreamWriter(self.options)


class LakeshackSinkStreamWriter(LakeshackSinkWriter, DataSourceStreamArrowWriter):
    """Streaming twin: `stream.writeStream.format("lakeshack_sink")` —
    every micro-batch commits through the SAME staging + move + index
    protocol, so the lake and its zone-map index advance together batch
    by batch (the streaming/ingest.py clustered-commit story expressed
    as a first-class sink). The staging dir is shared across batches —
    safe because commit(batchId) moves only the files ITS batch's
    messages name (task attempt ids keep names unique), batches run
    sequentially, and a replayed batch re-writes and re-moves its own
    files while the filepath-dedup index ignores the rerun."""

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        LakeshackSinkWriter.commit(self, messages)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        # earlier batches' files were moved at their own commit; staging
        # holds only the failed batch's output
        LakeshackSinkWriter.abort(self, messages)
