"""File-level min/max statistics metastore ("zone map") for Parquet datasets.

Reference parity: lakeshack/metastore.py (560 lines) — one row per Parquet
file holding ``filepath`` plus ``{col}_min`` / ``{col}_max`` for the cluster
column and each optional column, built from Parquet *footer* statistics only
(reference ``Metastore._get_min_max``, lakeshack/metastore.py:278-339), with
idempotent ingest (anti-join on filepath, lakeshack/metastore.py:243-260) and
an interval-overlap pruning query (lakeshack/metastore.py:414-481).

Spark-first design:

- The stats table is itself Parquet, loaded as a DataFrame; pruning is a
  filter + broadcast range-join on that DataFrame — no RDBMS round-trips
  (the reference issues one SQL query *per cluster value*,
  lakeshack/metastore.py:474-476).
- Ingest fans footer reads out across executors with ``mapPartitions`` +
  pyarrow: metadata-only I/O, so a 100 TB dataset with millions of files
  costs millions of ~10 KB footer reads spread over the cluster, never a
  data read.
- At 1000-executor scale the stats table for 10M files is ~GBs — still a
  single broadcastable DataFrame; pruning stays a sub-second driver-side
  plan step.
"""

from __future__ import annotations

import logging
import os
from datetime import date, datetime, timezone
from typing import Any, Iterable, Iterator, Sequence

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, Row, SparkSession, functions as F, types as T

from lakeshack_spark.stats_backends import StatsBackend, make_backend

logger = logging.getLogger(__name__)

#: Comparison operators accepted in optional where-clauses, and how each one
#: inverts onto file-level [min, max] intervals for pruning
#: (truth table from lakeshack/metastore.py:453-467).
PRUNE_OPS = (">=", ">", "=", "==", "<", "<=")

#: Nullness clauses prune on the per-column NULL-count stats instead of
#: the [min, max] interval: `IS NOT NULL` skips provably all-NULL files,
#: `IS NULL` skips provably NULL-free files (extension beyond the
#: reference's operator set — its metastore has no null counts). The
#: clause value slot is ignored (pass None).
NULLNESS_OPS = ("is_null", "is_not_null")

ALL_CLAUSE_OPS = PRUNE_OPS + NULLNESS_OPS


def _arrow_tz_map(schema: Any) -> dict[str, str]:
    """Column → IANA zone for tz-aware timestamp columns of a pyarrow
    schema (what a reference user's ``dataset.schema`` carries); empty for
    a Spark StructType, whose TimestampType has no embedded zone."""
    try:
        import pyarrow as pa
    except ImportError:  # pragma: no cover
        return {}
    if not isinstance(schema, pa.Schema):
        return {}
    return {
        f.name: f.type.tz
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.tz is not None
    }


def as_spark_schema(schema: Any) -> T.StructType:
    """Accept either a Spark StructType or a pyarrow.Schema (what a
    reference user holds — ``dataset.schema``, lakeshack/metastore.py's
    constructor input) and return a StructType."""
    if isinstance(schema, T.StructType):
        return schema
    import pyarrow as pa

    if isinstance(schema, pa.Schema):
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(schema)
    raise TypeError(
        f"schema must be a StructType or pyarrow.Schema, got {type(schema)}"
    )


def _spark_stat_type(dtype: T.DataType) -> T.DataType | None:
    """Spark type used to *store* min/max for a data column of ``dtype``.

    Mirrors ``Metastore._map_pa_type`` (lakeshack/metastore.py:483-511):
    string→string, any integer→long, any floating→double, date→date,
    timestamp→timestamp; anything else is not indexable (returns None and
    the caller skips the column with a warning,
    lakeshack/metastore.py:540-553).
    """
    if isinstance(dtype, (T.StringType, T.VarcharType, T.CharType)):
        return T.StringType()
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return T.LongType()
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return T.DoubleType()
    if isinstance(dtype, T.DateType):
        return T.DateType()
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return T.TimestampType()
    return None


def _to_py_stat(value: Any) -> Any:
    """Normalize a pyarrow footer statistic to a plain Python value.

    tz-aware timestamps are converted to naive UTC (the engine runs with
    ``spark.sql.session.timeZone=UTC``); the reference instead re-localizes
    with pytz (lakeshack/metastore.py:312-331) because it round-trips
    through SQLAlchemy.
    """
    if isinstance(value, datetime) and value.tzinfo is not None:
        return value.astimezone(timezone.utc).replace(tzinfo=None)
    return value


def _plain_py(value: Any) -> Any:
    """pyarrow ``.as_py()`` returns pandas Timestamps when pandas is
    importable; normalize to stdlib datetimes (Spark literal rows and
    plain comparisons both want those)."""
    return value.to_pydatetime() if hasattr(value, "to_pydatetime") else value


def _strip_arrow_tz(table):
    """Vectorized twin of :func:`_to_py_stat` for a whole Arrow table:
    tz-aware timestamp columns become naive (the stored instants are
    already UTC; Arrow's cast keeps the instant and renders the UTC
    wall)."""
    import pyarrow as pa

    fields = []
    changed = False
    for f in table.schema:
        if isinstance(f.type, pa.TimestampType) and f.type.tz is not None:
            fields.append(pa.field(f.name, pa.timestamp(f.type.unit)))
            changed = True
        else:
            fields.append(f)
    return table.cast(pa.schema(fields)) if changed else table


def _arrow_path(filepath: str) -> str:
    """Normalize a Hadoop-style URI into one pyarrow understands
    (s3a -> s3, file -> bare local path)."""
    p = _strip_file_scheme(filepath)
    if p.startswith("s3a://"):
        p = "s3://" + p[len("s3a://"):]
    return p


def _file_size(filepath: str) -> int | None:
    """Physical file size in bytes, via the local filesystem or the
    pyarrow filesystem the URI resolves to. None when undeterminable
    (byte telemetry must never fail ingest or a query)."""
    try:
        p = _arrow_path(filepath)
        if _is_remote(p):
            import pyarrow.fs as pafs

            fs, rel = pafs.FileSystem.from_uri(p)
            return fs.get_file_info(rel).size
        return os.path.getsize(p)
    except Exception as exc:
        logger.warning("could not size file %s: %s", filepath, exc)
        return None


def _footer_stats_for_files(
    filepaths: Iterable[str],
    columns: Sequence[str],
    filesystem: Any = None,
) -> Iterator[dict[str, Any]]:
    """Executor-side: read Parquet *footers* only and emit one stats row per
    file: ``{filepath, num_rows, file_bytes, {col}_min, {col}_max,
    {col}_nulls, ...}``.

    Seeds from row group 0 then folds min/max across all row groups, like
    ``Metastore._get_min_max`` (lakeshack/metastore.py:307-337). Columns with
    missing statistics get NULL min/max (the file then always survives
    pruning for predicates on that column — safe, just not skippable).
    ``file_bytes`` is captured here from the SAME open handle that serves
    the footer read (``NativeFile.size()`` — no second filesystem stat),
    so per-query byte telemetry is a column sum over the store instead of
    one filesystem stat per candidate file per query. Filesystem objects
    are resolved once per scheme per partition, not per file.

    An explicit ``filesystem`` (reference ``Metastore._get_min_max``'s
    third argument, lakeshack/metastore.py:280-301) bypasses URI-scheme
    resolution entirely: paths are opened verbatim against it. pyarrow
    filesystems pickle with their configuration, so the same object the
    caller built (credentials, endpoint, region) is what executors use.
    """
    import pyarrow.fs as pafs  # local imports: run on executors
    import pyarrow.parquet as pq

    fs_cache: dict[tuple[str, str], Any] = {}

    def open_with_size(path: str):
        if filesystem is not None:
            handle = filesystem.open_input_file(path)
            return pq.ParquetFile(handle), handle.size()
        p = _arrow_path(path)
        scheme = p.split("://", 1)[0] if "://" in p else ""
        rel = p.split("://", 1)[1] if scheme else p
        # Cache key includes the bucket/authority, not just the scheme:
        # FileSystem.from_uri resolves S3 region/credentials PER BUCKET,
        # so a partition spanning buckets in different regions must not
        # reuse the first bucket's filesystem (files would fail to open
        # and be skipped as unreadable — a silent partial index).
        netloc = rel.split("/", 1)[0] if scheme else ""
        fs = fs_cache.get((scheme, netloc))
        if fs is None:
            fs = (
                pafs.FileSystem.from_uri(p)[0]
                if scheme
                else pafs.LocalFileSystem()
            )
            fs_cache[(scheme, netloc)] = fs
        handle = fs.open_input_file(rel)
        return pq.ParquetFile(handle), handle.size()

    for filepath in filepaths:
        try:
            pf, n_bytes = open_with_size(filepath)
        except Exception as exc:  # non-parquet / unreadable: skip with a log
            logger.warning("skipping unreadable file %s: %s", filepath, exc)
            continue
        md = pf.metadata
        name_to_idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        row: dict[str, Any] = {
            "filepath": filepath,
            "num_rows": md.num_rows,
            "file_bytes": n_bytes,
        }
        for col in columns:
            cmin = cmax = None
            have_min_max = True
            nulls: int | None = 0
            idx = name_to_idx.get(col)
            if idx is None:
                have_min_max = False
                nulls = None
            else:
                for rg in range(md.num_row_groups):
                    rg_meta = md.row_group(rg)
                    stats = rg_meta.column(idx).statistics
                    # min/max and null_count availability are INDEPENDENT
                    # (an all-NULL row group has a null_count but no
                    # min/max), so each folds under its own flag. A row
                    # group PROVABLY all-NULL (null_count == its rows)
                    # contributes nothing to min/max and does not poison
                    # the fold.
                    if stats is not None and stats.has_min_max:
                        lo, hi = _to_py_stat(stats.min), _to_py_stat(stats.max)
                        cmin = lo if cmin is None or lo < cmin else cmin
                        cmax = hi if cmax is None or hi > cmax else cmax
                    elif not (
                        stats is not None
                        and stats.has_null_count
                        and stats.null_count == rg_meta.num_rows
                    ):
                        have_min_max = False
                    if stats is None or not stats.has_null_count:
                        nulls = None
                    elif nulls is not None:
                        nulls += stats.null_count
            row[f"{col}_min"] = cmin if have_min_max else None
            row[f"{col}_max"] = cmax if have_min_max else None
            row[f"{col}_nulls"] = nulls
        yield row


def interval_keeps(op: str, lo: Any, hi: Any, value: Any) -> bool:
    """The zone-map survival predicate for one clause against one file's
    [lo, hi] interval — the pure core of the truth table
    (lakeshack/metastore.py:453-467). NULL stats always keep the file
    (pruning is best-effort; the scan re-applies exact predicates)."""
    if lo is None or hi is None:
        return True
    if op == ">=":
        return hi >= value
    if op == ">":
        return hi > value
    if op == "<=":
        return lo <= value
    if op == "<":
        return lo < value
    return lo <= value <= hi  # "=", "=="


def nullness_keeps(op: str, nulls: Any, num_rows: Any) -> bool:
    """The survival predicate for a nullness clause against one file's
    null-count stat — the pure core the vectorized paths mirror. An
    UNKNOWN null count (None) always keeps the file (best-effort
    pruning; the scan re-applies the exact predicate)."""
    if nulls is None:
        return True
    if op == "is_not_null":
        return num_rows is None or nulls < num_rows
    return nulls > 0  # "is_null"


def _is_remote(path: str) -> bool:
    scheme = path.split("://", 1)[0] if "://" in path else ""
    return scheme not in ("", "file")


def _strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def list_parquet_files(
    path: str,
    spark: SparkSession | None = None,
    skip_side_dirs: bool = True,
    filesystem: Any = None,
) -> list[str]:
    """Recursive Parquet file discovery (reference ``_gather_metadata``,
    lakeshack/metastore.py:341-412). Accepts a single file or a directory;
    skips non-Parquet names and Spark/metastore side files.

    Local paths walk the filesystem directly; remote schemes (s3a://,
    hdfs://, ...) go through the JVM Hadoop FileSystem so the same engine
    runs against object storage — pass ``spark`` for those. (The reference
    swaps pyarrow.fs implementations the same way,
    lakeshack/metastore.py:206-231.)

    An explicit ``filesystem`` (any ``pyarrow.fs.FileSystem`` — S3,
    SubTree, GCS) takes precedence over URI-scheme resolution and walks
    via ``FileSelector(recursive=True)`` exactly like the reference
    (lakeshack/metastore.py:368-376); ``path`` is then interpreted in
    that filesystem's own terms (e.g. ``bucket/prefix`` for S3 — no
    scheme).

    ``skip_side_dirs`` excludes co-located metadata sidecars from *data*
    listings — the ``_lakeshack_stats`` store plus ANY ``_``/``.``-prefixed
    directory component BELOW the listed root (the Spark/Hive hidden-dir
    convention, which the ``_lakeshack_hll``/``_lakeshack_kll``/
    ``_lakeshack_bloom`` sidecars and write-staging dirs all follow;
    without this an incremental sidecar ``update(lake)`` after the FIRST
    build would try to index the sidecar's own parquet). Pass False when
    listing a store itself — the root directory's own name is never the
    reason to skip.
    """

    def keep(name: str) -> bool:
        return name.endswith(".parquet") and not name.startswith((".", "_"))

    def hidden_below_root(rel_dir: str) -> bool:
        return any(
            part.startswith((".", "_"))
            for part in rel_dir.replace("\\", "/").split("/")
            if part not in ("", ".")
        )

    if filesystem is not None:
        import pyarrow.fs as pafs

        root_info = filesystem.get_file_info(path)
        if root_info.type == pafs.FileType.File:
            return [path]
        if root_info.type == pafs.FileType.NotFound:
            return []
        root = path.rstrip("/")
        found = []
        selector = pafs.FileSelector(root, recursive=True)
        for info in filesystem.get_file_info(selector):
            if info.type != pafs.FileType.File:
                continue
            full = info.path
            if skip_side_dirs and "_lakeshack_stats" in full:
                continue
            parent = full.rsplit("/", 1)[0] if "/" in full else ""
            rel = parent[len(root):] if parent.startswith(root) else ""
            if skip_side_dirs and hidden_below_root(rel):
                continue
            if keep(full.rsplit("/", 1)[-1]):
                found.append(full)
        return sorted(found)

    if _is_remote(path):
        if spark is None:
            raise ValueError(f"remote path {path!r} requires a SparkSession")
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return []
        root_str = fs.makeQualified(hpath).toString().rstrip("/")
        found: list[str] = []
        it = fs.listFiles(hpath, True)  # recursive
        while it.hasNext():
            status = it.next()
            p = status.getPath()
            full = p.toString()
            if skip_side_dirs and "_lakeshack_stats" in full:
                continue
            parent = p.getParent().toString()
            rel = parent[len(root_str):] if parent.startswith(root_str) else ""
            if skip_side_dirs and hidden_below_root(rel):
                continue
            if keep(p.getName()):
                found.append(full)
        return sorted(found)

    path = _strip_file_scheme(path)
    if os.path.isfile(path):
        return [path]
    found = []
    for root, _dirs, files in os.walk(path):
        if skip_side_dirs and "_lakeshack_stats" in root:
            continue
        if skip_side_dirs and hidden_below_root(os.path.relpath(root, path)):
            continue
        for name in sorted(files):
            if keep(name):
                found.append(os.path.join(root, name))
    return sorted(found)


class FileStatsMetastore:
    """Min/max-per-file stats table over immutable Parquet files.

    Parameters mirror ``Metastore.__init__`` (lakeshack/metastore.py:79-204):
    column roles are real metadata here, not ``_min``-suffix naming
    conventions recovered by parsing DB columns
    (lakeshack/metastore.py:117-126), and storage is a swappable
    :class:`~lakeshack_spark.stats_backends.StatsBackend` — Parquet
    directory by default, a DuckDB file when ``store_path`` ends in
    ``.duckdb`` (parity with the reference's any-RDBMS SQLAlchemy store,
    lakeshack/metastore.py:79-98).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        schema: T.StructType,
        cluster_column: str,
        optional_columns: Sequence[str] = (),
        backend: StatsBackend | None = None,
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        #: Column → IANA zone when the declared schema is a pyarrow schema
        #: with tz-aware timestamps — retained so ``stats_df`` can render
        #: stats in the schema's zone on request (the reference re-localizes
        #: on ingest via pytz, lakeshack/metastore.py:312-331; we store
        #: canonical naive-UTC and localize on READ, see stats_df).
        self.schema_tz = _arrow_tz_map(schema)
        schema = as_spark_schema(schema)
        self.data_schema = schema
        self.cluster_column = cluster_column
        field_types = {f.name: f.dataType for f in schema.fields}
        if cluster_column not in field_types:
            raise ValueError(f"cluster column {cluster_column!r} not in schema")
        if _spark_stat_type(field_types[cluster_column]) is None:
            raise ValueError(
                f"cluster column {cluster_column!r} has non-indexable type "
                f"{field_types[cluster_column]}"
            )
        # Optional columns with non-indexable types are skipped with a
        # warning (parity: lakeshack/metastore.py:540-553).
        self.optional_columns: list[str] = []
        for col in optional_columns:
            if col not in field_types:
                raise ValueError(f"optional column {col!r} not in schema")
            if _spark_stat_type(field_types[col]) is None:
                logger.warning(
                    "optional column %s has non-indexable type %s; skipping",
                    col,
                    field_types[col],
                )
            else:
                self.optional_columns.append(col)
        self.tracked_columns = [cluster_column, *self.optional_columns]
        fields = [
            T.StructField("filepath", T.StringType(), False),
            T.StructField("num_rows", T.LongType(), False),
            T.StructField("file_bytes", T.LongType(), True),
        ]
        for col in self.tracked_columns:
            stat_type = _spark_stat_type(field_types[col])
            fields.append(T.StructField(f"{col}_min", stat_type, True))
            fields.append(T.StructField(f"{col}_max", stat_type, True))
            # NULL-count per tracked column (Delta/Iceberg track the same
            # nullCount): NULL means UNKNOWN (footer had no null_count).
            # Enables metadata-only aggregation (plan_agg: a file is
            # "interior" to a predicate only if its clause columns are
            # provably NULL-free) — min/max alone can never prove that.
            fields.append(T.StructField(f"{col}_nulls", T.LongType(), True))
        self.stats_schema = T.StructType(fields)
        self.backend = backend or make_backend(spark, store_path)
        self.backend.bind(self.stats_schema)
        self._validate_existing_store()

    def _validate_existing_store(self) -> None:
        """Reconnect-time validation: an existing store at ``store_path``
        whose columns or types do not match the declared table must fail
        fast — silently reading mismatched stats would *mis-prune* (wrong
        query results, not an error). Mirrors the reference's column-by-
        column reflection check on reconnect
        (lakeshack/metastore.py:128-204)."""
        actual = self.backend.actual_schema()
        if actual is None:
            return
        expected = {f.name: f.dataType for f in self.stats_schema.fields}
        got = {f.name: f.dataType for f in actual.fields}
        problems = []
        for name, dtype in expected.items():
            if name not in got:
                problems.append(f"missing column {name!r}")
            elif got[name] != dtype:
                problems.append(
                    f"column {name!r} has type {got[name].simpleString()}, "
                    f"expected {dtype.simpleString()}"
                )
        problems.extend(
            f"unexpected column {name!r}" for name in got if name not in expected
        )
        # Additive, derivable-from-the-files upgrades backfill in place
        # rather than failing reconnect (any REAL mismatch still raises):
        # `file_bytes` (pre-byte-telemetry stores) and `{col}_nulls`
        # (pre-null-count stores) are both recoverable from the indexed
        # files themselves.
        nulls_cols = {f"{c}_nulls" for c in self.tracked_columns}
        migratable = {"missing column 'file_bytes'"} | {
            f"missing column {c!r}" for c in nulls_cols
        }
        if problems and set(problems) <= migratable:
            if "missing column 'file_bytes'" in problems:
                self._migrate_add_file_bytes()
            if set(problems) & {f"missing column {c!r}" for c in nulls_cols}:
                self._migrate_add_null_counts()
            return
        if problems:
            raise ValueError(
                f"existing stats store at {self.store_path!r} does not match "
                f"the declared table (cluster column {self.cluster_column!r}, "
                f"optional columns {self.optional_columns}): "
                + "; ".join(sorted(problems))
            )

    def _migrate_add_file_bytes(self) -> None:
        """One-time in-place upgrade of a pre-``file_bytes`` store: stat
        every indexed file (executor-side, Arrow-batched) and rewrite the
        store with the size column filled. Cost ≈ what ONE query's byte
        telemetry used to cost, paid once instead of per query."""
        logger.warning(
            "stats store at %s predates file_bytes; backfilling file sizes",
            self.store_path,
        )

        @F.pandas_udf(T.LongType())
        def _sizes(paths: pd.Series) -> pd.Series:
            return paths.map(_file_size)

        # Explicit-schema read: the Parquet backend surfaces the missing
        # column as NULLs, the DuckDB backend aligns columns in read_df.
        old = self.backend.read_df()
        filled = old.withColumn(
            "file_bytes", F.coalesce(F.col("file_bytes"), _sizes("filepath"))
        ).select(*[f.name for f in self.stats_schema.fields])
        self.backend.rewrite(filled)

    def _migrate_add_null_counts(self) -> None:
        """One-time in-place upgrade of a pre-``{col}_nulls`` store:
        re-read the indexed files' footers (executor fan-out, the same
        path ingest uses — footers are immutable, so the refreshed
        min/max agree with the stored ones) and fill the null-count
        columns. Files that have become unreadable keep NULL (= unknown)
        counts — conservative: such files are never classified interior
        by ``plan_agg`` and always fall back to the scan."""
        logger.warning(
            "stats store at %s predates null-count stats; backfilling "
            "from the indexed files' footers",
            self.store_path,
        )
        old = self.backend.read_df().dropDuplicates(["filepath"])
        files = [r["filepath"] for r in old.select("filepath").collect()]
        names = [f.name for f in self.stats_schema.fields]
        nulls_cols = [f"{c}_nulls" for c in self.tracked_columns]
        if files:
            sc = self.spark.sparkContext
            n_slices = min(len(files), max(sc.defaultParallelism, 1))
            tracked = list(self.tracked_columns)
            schema = self.stats_schema
            rows_rdd = sc.parallelize(files, n_slices).mapPartitions(
                lambda part: (
                    Row(**{f.name: r.get(f.name) for f in schema.fields})
                    for r in _footer_stats_for_files(part, tracked)
                )
            )
            fresh = self.spark.createDataFrame(rows_rdd, schema).select(
                "filepath", *nulls_cols
            )
            filled = (
                old.drop(*nulls_cols)
                .join(fresh, "filepath", "left")
                .select(*names)
            )
        else:
            filled = old.select(*names)
        self.backend.rewrite(filled)

    # ------------------------------------------------------------- ingest

    def _exists(self) -> bool:
        return self.backend.exists()

    def stats_df(self, localize: bool = False) -> DataFrame:
        """The stats table as a DataFrame (empty if never updated).

        Timestamp stats are STORED canonical naive-UTC (``_to_py_stat``
        normalizes tz-aware footer stats at ingest); the reference instead
        re-localizes min/max into the schema's timezone via pytz
        (lakeshack/metastore.py:312-331). ``localize=True`` reproduces the
        reference's view for a tz-aware pyarrow schema: min/max of each
        tz-aware column are rendered as wall time in that column's schema
        zone (``from_utc_timestamp``, read-side only — the store stays
        UTC, so pruning math and cross-zone stores never skew).

        Deduplicated by filepath: two *concurrent* ``update()`` calls can
        both anti-join against the same pre-append snapshot and append the
        same file's stats row twice (the reference instead drops the
        collision on the DB's unique constraint,
        lakeshack/metastore.py:268-270). Duplicate rows are always
        identical — both writers read the same immutable footer — so any
        row per filepath is the right one; read-side dedup makes the race
        harmless without a lock. Reconcile rewrites through this view, so
        duplicates also physically disappear on the next maintenance
        pass."""
        df = self.backend.read_df().dropDuplicates(["filepath"])
        if localize:
            for col in self.tracked_columns:
                tz = self.schema_tz.get(col)
                if tz is None:
                    continue
                for stat in (f"{col}_min", f"{col}_max"):
                    df = df.withColumn(stat, F.from_utc_timestamp(stat, tz))
        return df

    def update(
        self,
        parquet_file_or_dir: str | Sequence[str],
        filesystem: Any = None,
        n_workers: int | None = None,
    ) -> int:
        """Idempotent ingest: discover files → distributed footer reads →
        anti-join against already-ingested filepaths → append.

        Returns the number of newly ingested files. Replaces the reference's
        ThreadPool + read-then-insert (lakeshack/metastore.py:206-276) with
        an executor fan-out and a left-anti join, so concurrent/incremental
        updates stay metadata-only at any file count. ``n_workers`` is
        accepted for reference signature compatibility
        (lakeshack/metastore.py:206-211) and ignored — the executor
        fan-out replaces the thread pool, sized by cluster parallelism.

        ``filesystem`` is the reference's explicit
        ``pyarrow.fs.FileSystem`` (lakeshack/metastore.py:209, default
        LocalFileSystem; the docs' S3 walkthrough passes
        ``fs.S3FileSystem(region=...)``, lakeshack/metastore.py:65-75).
        When given, discovery runs through ``FileSelector`` on that object
        and footer reads open paths against it verbatim — paths are in the
        filesystem's own terms (``bucket/key``, no scheme), and the object
        is PICKLED to executors, so credentials/endpoint/region carried on
        it apply there (pyarrow filesystems serialize their config). When
        None, filesystems resolve per path URI scheme with a
        (scheme, bucket)-keyed cache and credentials must be ambient.
        """
        del n_workers
        roots = (
            [parquet_file_or_dir]
            if isinstance(parquet_file_or_dir, str)
            else list(parquet_file_or_dir)
        )
        files = [
            f
            for p in roots
            for f in list_parquet_files(p, self.spark, filesystem=filesystem)
        ]
        self._reconcile_deleted(roots, set(files))
        if not files:
            return 0
        sc = self.spark.sparkContext
        n_slices = min(len(files), max(sc.defaultParallelism, 1))
        tracked = list(self.tracked_columns)
        schema = self.stats_schema
        fs = filesystem
        rows_rdd = sc.parallelize(files, n_slices).mapPartitions(
            lambda part: (
                Row(**{f.name: r.get(f.name) for f in schema.fields})
                for r in _footer_stats_for_files(part, tracked, filesystem=fs)
            )
        )
        new_stats = self.spark.createDataFrame(rows_rdd, schema).persist()
        # Unreadable files are skipped executor-side with per-file logs; a
        # PARTIAL index must also be loud at the summary level — silently
        # indexing 0 of N files (bad credentials, wrong endpoint) would
        # surface only as empty query results.
        n_read = new_stats.count()
        if n_read < len(files):
            logger.warning(
                "indexed footer stats for only %d of %d discovered files "
                "(unreadable files were skipped — see executor warnings); "
                "queries will not see the missing files' rows",
                n_read,
                len(files),
            )
        existing = self.stats_df().select("filepath")
        fresh = new_stats.join(existing, "filepath", "left_anti")
        fresh = fresh.persist()
        n_new = fresh.count()
        if n_new:
            self.backend.append(fresh, n_new)
        fresh.unpersist()
        new_stats.unpersist()
        self.backend.maybe_compact()
        return n_new

    def _store_files(self) -> list[str]:
        return self.backend.store_files()  # type: ignore[attr-defined]

    def compact_store(self) -> int:
        """Fold the store's physical fragmentation (per-update append
        files on the Parquet backend; no-op under an RDBMS backend).
        Returns the resulting file count."""
        return self.backend.compact()

    def _reconcile_deleted(
        self, roots: Sequence[str], live_files: set[str]
    ) -> int:
        """Drop stats rows for files that no longer exist under ``roots``
        (rewrites/compactions/overwritten batches replace files with new
        names — stale rows would send queries to deleted paths). Rewrites
        the store only when stale rows exist. Returns rows dropped.

        Runs as DataFrame anti-joins end-to-end: no stored filepath list
        and no kept-row set ever materializes on the driver (the round-1
        version collected both — GBs through the driver per ingest tick at
        10M files). The listing in ``live_files`` already exists driver-
        side (it drove discovery), so parallelizing it adds nothing new.
        """
        if not self._exists():
            return 0
        stats = self.stats_df()
        norm_roots = [r.rstrip("/") for r in roots]
        under_roots = F.lit(False)
        for r in norm_roots:
            under_roots = (
                under_roots
                | (F.col("filepath") == r)
                | F.col("filepath").startswith(r + "/")
            )
        live_df = self.spark.createDataFrame(
            [(f,) for f in sorted(live_files)],
            T.StructType([T.StructField("filepath", T.StringType(), False)]),
        )
        stale = stats.filter(under_roots).join(live_df, "filepath", "left_anti")
        n_stale = stale.count()
        if not n_stale:
            return 0
        # Kept = rows outside the updated roots, plus under-root rows that
        # are still live. live_df is bounded (it IS the driver-side
        # listing), so IT is the broadcast side — broadcasting the stale
        # set instead would re-materialize up to the whole store on the
        # driver exactly when a rewrite replaces most files.
        keep = stats.filter(~under_roots).unionByName(
            stats.filter(under_roots).join(
                F.broadcast(live_df), "filepath", "left_semi"
            )
        )
        self.backend.rewrite(keep)
        logger.info("reconciled %d stale stats rows", n_stale)
        return n_stale

    # ------------------------------------------------------------- pruning

    def _clause_prune_filter(self, clauses: Sequence[tuple[str, str, Any]]):
        """AND-ed file-survival predicate over stats columns for the
        range-clause truth table (lakeshack/metastore.py:453-467):

        - ``col >= v`` keeps the file iff ``v <= col_max``
        - ``col >  v`` keeps the file iff ``v <  col_max``
        - ``col <= v`` keeps the file iff ``v >= col_min``
        - ``col <  v`` keeps the file iff ``v >  col_min``
        - ``col = v``  keeps the file iff ``col_min <= v <= col_max``

        A file with NULL stats for the column always survives (pruning is
        best-effort; the scan re-applies exact predicates).
        """
        pred = F.lit(True)
        for col, op, value in clauses:
            if op not in ALL_CLAUSE_OPS:
                raise ValueError(
                    f"unsupported operator {op!r}; use one of {ALL_CLAUSE_OPS}"
                )
            if col not in self.tracked_columns:
                continue  # untracked column: cannot prune, scan still filters
            if op in NULLNESS_OPS:
                nl = F.col(f"{col}_nulls")
                if op == "is_not_null":
                    keep_n = nl < F.col("num_rows")
                else:
                    keep_n = nl > 0
                # UNKNOWN null count keeps the file (nullness_keeps)
                pred = pred & (nl.isNull() | keep_n)
                continue
            lo, hi = F.col(f"{col}_min"), F.col(f"{col}_max")
            lit = F.lit(value)
            if op == ">=":
                keep = hi >= lit
            elif op == ">":
                keep = hi > lit
            elif op == "<=":
                keep = lo <= lit
            elif op == "<":
                keep = lo < lit
            else:  # "=", "=="
                keep = (lo <= lit) & (hi >= lit)
            # Either stat NULL keeps the file, matching interval_keeps: a
            # non-NULL min with NULL max under >=/> would evaluate
            # hi>=lit to NULL and silently prune in this distributed path
            # while the driver fast path keeps it.
            pred = pred & (lo.isNull() | hi.isNull() | keep)
        return pred

    #: Below this stats-table row count, pruning runs driver-side on a
    #: direct pyarrow read — metadata operations on metadata-sized tables
    #: should not launch distributed jobs (a 10k-file dataset's stats are
    #: ~1 MB; even 1M files is ~100 MB, still driver-feasible).
    DRIVER_PRUNE_MAX_FILES = 100_000

    def _prune_driver_side(
        self,
        values: list[Any],
        clauses: Sequence[tuple[str, str, Any]],
    ) -> "tuple[dict[str, list[Any]], Any] | None":
        """Fast path: vectorized interval tests over the backend's
        driver-side Arrow read — pyarrow compute kernels, one boolean mask
        per clause and per IN-list value, so a 100k-file store with a big
        IN-list prunes in milliseconds where the old per-row Python loop
        was O(files × (clauses + values)) interpreted work.

        Returns ``(mapping, stats_table)`` — the table is handed back so
        one query reads the store exactly once (``stats_summary`` reuses
        it) — or None when the backend defers (remote or too-large store;
        caller falls back to the distributed path).
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        values = [_to_py_stat(v) for v in values]
        clauses = [(c, op, _to_py_stat(v)) for c, op, v in clauses]
        for _col, op, _value in clauses:
            if op not in ALL_CLAUSE_OPS:
                raise ValueError(
                    f"unsupported operator {op!r}; use one of {ALL_CLAUSE_OPS}"
                )

        table = self.backend.read_arrow(self.DRIVER_PRUNE_MAX_FILES)
        if table is None:
            return None
        # Spark writes TimestampType as UTC-adjusted; drop the zone (the
        # instants are already UTC) so comparisons against naive clause
        # values work — the vectorized twin of _to_py_stat.
        table = _strip_arrow_tz(table)
        n = table.num_rows
        if n == 0:
            return {}, table

        def np_mask(arr) -> "np.ndarray":
            return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=bool)

        keep = np.ones(n, dtype=bool)
        for col, op, value in clauses:
            if col not in self.tracked_columns:
                continue  # untracked column: cannot prune, scan still filters
            if op in NULLNESS_OPS:
                # pre-null-count stores (or synthetic stats tables) have
                # no {col}_nulls column: unknown → keep, like NULL stats
                if f"{col}_nulls" not in table.column_names:
                    continue
                nl = table.column(f"{col}_nulls")
                if op == "is_not_null":
                    cond_n = pc.less(nl, table.column("num_rows"))
                else:
                    cond_n = pc.greater(nl, pa.scalar(0))
                keep &= np_mask(pc.or_kleene(pc.is_null(nl), cond_n))
                continue
            lo, hi = table.column(f"{col}_min"), table.column(f"{col}_max")
            # pa.scalar WITHOUT a forced type: casting 10.5 to an int64
            # stat column would TRUNCATE to 10 and silently over-prune
            # (x_min=10 under `< 10.5` must be kept); Arrow's comparison
            # kernels promote mixed numeric operands instead, matching
            # the Python and Spark paths.
            sv = pa.scalar(value)
            if op == ">=":
                cond = pc.greater_equal(hi, sv)
            elif op == ">":
                cond = pc.greater(hi, sv)
            elif op == "<=":
                cond = pc.less_equal(lo, sv)
            elif op == "<":
                cond = pc.less(lo, sv)
            else:  # "=", "=="
                cond = pc.and_kleene(
                    pc.less_equal(lo, sv), pc.greater_equal(hi, sv)
                )
            # NULL stats always keep the file (interval_keeps): the
            # is_null disjuncts absorb the NULL comparison results under
            # Kleene logic, so `survive` is null-free.
            survive = pc.or_kleene(
                pc.or_kleene(pc.is_null(lo), pc.is_null(hi)), cond
            )
            keep &= np_mask(survive)

        lo_c = table.column(f"{self.cluster_column}_min")
        hi_c = table.column(f"{self.cluster_column}_max")
        either_null = pc.or_(pc.is_null(lo_c), pc.is_null(hi_c))
        null_np = np_mask(either_null)
        lo_np = lo_c.to_numpy(zero_copy_only=False)
        hi_np = hi_c.to_numpy(zero_copy_only=False)
        value_masks: list[np.ndarray] = []
        if lo_np.dtype != object:
            # Numeric/temporal cluster columns: two C-level comparisons
            # per value (NaN/NaT from NULL stats compare False and are
            # re-kept by the null mask) — far cheaper than per-value
            # Arrow kernel dispatch on big IN-lists.
            for v in values:
                v_np = np.datetime64(v) if isinstance(v, (datetime, date)) else v
                value_masks.append(((lo_np <= v_np) & (hi_np >= v_np)) | null_np)
        else:
            for v in values:
                contained = pc.and_kleene(
                    pc.less_equal(lo_c, pa.scalar(v)),
                    pc.greater_equal(hi_c, pa.scalar(v)),
                )
                value_masks.append(np_mask(pc.or_kleene(either_null, contained)))

        # `keep` applies once at selection time; surviving rows then index
        # a (files × values) sub-matrix so the match lists assemble from
        # tiny nonzero scans instead of per-(file, value) Python probes.
        any_match = np.logical_or.reduce(value_masks) & keep
        idxs = np.nonzero(any_match)[0]
        paths = table.column("filepath").take(pa.array(idxs)).to_pylist()
        sub = (
            np.column_stack([m[idxs] for m in value_masks])
            if idxs.size
            else np.empty((0, len(values)), dtype=bool)
        )
        out = {
            p: sorted(values[k] for k in np.nonzero(sub[j])[0])
            for j, p in enumerate(paths)
        }
        return out, table

    def prune(
        self,
        cluster_column_values: Sequence[Any] | Any,
        optional_where_clauses: Sequence[tuple[str, str, Any]] = (),
    ) -> dict[str, list[Any]]:
        """``{filepath: [candidate cluster values]}`` for files whose
        [min, max] interval might contain each value AND that survive every
        range clause — reference ``Metastore.query``
        (lakeshack/metastore.py:414-481), vectorized as one broadcast
        interval-join instead of one DB query per value.

        Small stats tables (the overwhelmingly common case — one row per
        *file*) are pruned driver-side with zero Spark jobs; the
        distributed path kicks in past ``DRIVER_PRUNE_MAX_FILES``.
        """
        return self._prune_impl(cluster_column_values, optional_where_clauses)[0]

    def _prune_impl(
        self,
        cluster_column_values: Sequence[Any] | Any,
        optional_where_clauses: Sequence[tuple[str, str, Any]] = (),
    ) -> "tuple[dict[str, list[Any]], Any]":
        """Shared pruning core: ``(mapping, stats_table_or_None)`` — the
        Arrow table is returned when the driver fast path read it, so
        telemetry can reuse the SAME read instead of re-reading the store
        per query."""
        if not isinstance(cluster_column_values, (list, tuple)):
            cluster_column_values = [cluster_column_values]
        values = list(dict.fromkeys(cluster_column_values))
        if not values:
            return {}, None
        if not self._exists():
            return {}, None
        fast = self._prune_driver_side(values, optional_where_clauses)
        if fast is not None:
            return fast
        cluster_type = _spark_stat_type(
            {f.name: f.dataType for f in self.data_schema.fields}[self.cluster_column]
        )
        values_df = self.spark.createDataFrame(
            [(v,) for v in values],
            T.StructType([T.StructField("__cluster_value", cluster_type, False)]),
        )
        lo = F.col(f"{self.cluster_column}_min")
        hi = F.col(f"{self.cluster_column}_max")
        v = F.col("__cluster_value")
        survivors = self.stats_df().filter(
            self._clause_prune_filter(optional_where_clauses)
        )
        # NULL cluster-column stats must keep the file for EVERY candidate
        # value (pruning is best-effort; the scan re-applies exact
        # predicates) — a bare range condition evaluates NULL→false and
        # would silently drop such files, diverging from interval_keeps and
        # the driver-side fast path.
        matched = survivors.join(
            F.broadcast(values_df),
            lo.isNull() | hi.isNull() | ((v >= lo) & (v <= hi)),
            "inner",
        )
        rows = (
            matched.groupBy("filepath")
            .agg(F.collect_set("__cluster_value").alias("values"))
            .collect()
        )
        return {r["filepath"]: sorted(r["values"]) for r in rows}, None

    def prune_files(
        self,
        cluster_column_values: Sequence[Any] | Any,
        optional_where_clauses: Sequence[tuple[str, str, Any]] = (),
    ) -> list[str]:
        """Just the surviving file list, sorted."""
        return sorted(self.prune(cluster_column_values, optional_where_clauses))

    def query(
        self,
        cluster_column_values: Sequence[Any] | Any,
        optional_where_clauses: Sequence[tuple[str, str, Any]] = (),
    ) -> dict[str, list[Any]]:
        """Drop-in compatibility alias for the reference's
        ``Metastore.query`` (lakeshack/metastore.py:414-481): identical
        name, arguments, and ``{filepath: [matching values]}`` result."""
        return self.prune(cluster_column_values, optional_where_clauses)

    def prune_files_with_summary(
        self,
        cluster_column_values: Sequence[Any] | Any,
        optional_where_clauses: Sequence[tuple[str, str, Any]] = (),
    ) -> tuple[list[str], dict[str, Any]]:
        """Pruned file list plus the planning-time I/O summary, reading
        the stats store exactly ONCE on the driver fast path (the engine's
        per-query entry point — a metadata counter must not double the
        planning I/O)."""
        mapping, table = self._prune_impl(
            cluster_column_values, optional_where_clauses
        )
        files = sorted(mapping)
        return files, self.stats_summary(files, table=table)

    def stats_summary(
        self, candidate_files: Sequence[str] = (), table: Any = None
    ) -> dict[str, Any]:
        """Planning-time I/O accounting from the stats store: total /
        candidate / pruned file counts plus the candidate files' footer
        row-count and byte totals (upper bounds on what the scan can
        touch — ``file_bytes`` is captured at ingest, so NO filesystem
        calls happen here).

        Reference parity: the ``n_files`` / ``n_records`` counters the
        reference logs per query (lakeshack/lakeshack.py:463-472,566-577).
        Pass ``table`` (an already-read stats Arrow table) to reuse the
        prune-time read; otherwise driver-side on the arrow fast path
        (zero Spark jobs), one metadata-sized aggregate past
        ``DRIVER_PRUNE_MAX_FILES``. Filepath-deduped to match
        ``stats_df()``'s concurrent-update discipline.
        """
        cand = set(candidate_files)
        if not self.backend.exists():
            return {
                "n_files_total": 0,
                "n_files_candidate": len(cand),
                "n_files_pruned": 0,
                "n_rows_candidate": 0,
                "bytes_candidate": 0,
            }
        if table is None:
            table = self.backend.read_arrow(self.DRIVER_PRUNE_MAX_FILES)
        if table is not None and "filepath" in table.column_names:
            have_bytes = "file_bytes" in table.column_names
            fb = table.column("file_bytes").to_pylist() if have_bytes else None
            seen: dict[str, tuple[int, int | None]] = {}
            for i, (p, n) in enumerate(
                zip(
                    table.column("filepath").to_pylist(),
                    table.column("num_rows").to_pylist(),
                )
            ):
                if p not in seen:
                    seen[p] = (n, fb[i] if fb is not None else None)
            n_total = len(seen)
            rows_cand = sum(n for p, (n, _b) in seen.items() if p in cand)
            cand_bytes = [b for p, (_n, b) in seen.items() if p in cand]
            # None means UNKNOWN, never a partial sum: a candidate whose
            # size could not be determined at ingest would silently
            # under-report the "upper I/O bound" otherwise.
            bytes_cand = (
                None if any(b is None for b in cand_bytes) else sum(cand_bytes)
            )
        else:
            row = self.stats_df().agg(
                F.count("*").alias("n"),
                F.sum(
                    F.when(
                        F.col("filepath").isin(list(cand)), F.col("num_rows")
                    ).otherwise(F.lit(0))
                ).alias("rc"),
                F.sum(
                    F.when(
                        F.col("filepath").isin(list(cand)), F.col("file_bytes")
                    ).otherwise(F.lit(0))
                ).alias("bc"),
                F.sum(
                    F.when(
                        F.col("filepath").isin(list(cand))
                        & F.col("file_bytes").isNull(),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ).alias("nulls"),
            ).collect()[0]
            n_total = row["n"] or 0
            rows_cand = row["rc"] or 0
            # None means UNKNOWN (see driver-side branch)
            bytes_cand = None if (row["nulls"] or 0) > 0 else (row["bc"] or 0)
        return {
            "n_files_total": n_total,
            "n_files_candidate": len(cand),
            "n_files_pruned": n_total - len(cand),
            "n_rows_candidate": rows_cand,
            "bytes_candidate": bytes_cand,
        }

    # -------------------------------------------- metadata-only aggregation

    def _validate_agg_columns(
        self,
        min_max_columns: Sequence[str],
        count_columns: Sequence[str],
    ) -> None:
        field_types = {f.name: f.dataType for f in self.data_schema.fields}
        for col in (*min_max_columns, *count_columns):
            if col not in self.tracked_columns:
                raise ValueError(
                    f"aggregation column {col!r} is not tracked by this "
                    f"metastore (tracked: {self.tracked_columns}); only "
                    "tracked columns have footer stats to serve from"
                )
        for col in min_max_columns:
            if isinstance(field_types[col], (T.StringType, T.BinaryType)):
                # The Parquet spec allows WRITERS to truncate min/max of
                # variable-length values (is_{min,max}_value_exact flags
                # the footer does not surface through pyarrow). Inexact
                # bounds are fine for PRUNING (the scan re-filters) but
                # would be a silently wrong ANSWER here.
                raise ValueError(
                    f"min/max of {col!r} cannot be served from footer "
                    "stats: variable-length min/max may be truncated by "
                    "the writer; use count_columns or scan"
                )

    def plan_agg(
        self,
        clauses: Sequence[tuple[str, str, Any]] = (),
        min_max_columns: Sequence[str] = (),
        count_columns: Sequence[str] = (),
        files: Sequence[str] | None = None,
    ) -> tuple[dict[str, Any], list[str]]:
        """Plan a metadata-served aggregation: classify every indexed file
        against the AND-ed ``clauses`` as

        - **excluded** — the zone map proves no row matches (the prune
          truth table, :meth:`_clause_prune_filter`);
        - **interior** — the zone map proves EVERY row matches: each
          clause column's ``[min, max]`` lies wholly inside the clause
          AND is provably NULL-free (``{col}_nulls == 0`` — rows with a
          NULL clause value fail a comparison predicate, so an unknown
          or positive null count forfeits interior status);
        - **boundary** — everything else: must be scanned with the exact
          predicate.

        Returns ``(contrib, boundary_files)`` where ``contrib`` carries
        the interior files' contribution straight from the stats store —
        ``row_count`` (Σ num_rows), per-column ``min``/``max`` (footer
        min/max ignore NULLs, exactly like SQL MIN/MAX) and non-NULL
        ``cnt`` (Σ num_rows − nulls) — plus file-classification counters.
        An interior file additionally needs serveable stats for every
        requested aggregation column (non-NULL min/max, or a null count
        proving the file all-NULL; known null count for ``cnt``);
        otherwise it demotes to boundary.

        At 100 TB this is the COUNT/MIN/MAX analogue of file pruning: a
        range predicate on the cluster column touches O(boundary) ≈ 1–2
        files whatever the lake size — the interior of the range is
        answered from the metadata-sized stats store with zero data I/O.
        Driver-vectorized on the Arrow fast path; one distributed
        aggregate past ``DRIVER_PRUNE_MAX_FILES``.
        """
        clauses = [(c, op, _to_py_stat(v)) for c, op, v in clauses]
        for _col, op, _value in clauses:
            if op not in ALL_CLAUSE_OPS:
                raise ValueError(
                    f"unsupported operator {op!r}; use one of {ALL_CLAUSE_OPS}"
                )
        self._validate_agg_columns(min_max_columns, count_columns)
        min_max_columns = list(dict.fromkeys(min_max_columns))
        count_columns = list(dict.fromkeys(count_columns))
        empty_contrib = {
            "n_files_total": 0,
            "n_files_interior": 0,
            "n_files_boundary": 0,
            "n_files_excluded": 0,
            "row_count": 0,
            "cnt": {c: 0 for c in count_columns},
            "min": {c: None for c in min_max_columns},
            "max": {c: None for c in min_max_columns},
        }
        subset = None if files is None else sorted(set(files))
        if not self._exists():
            # files the store has never indexed are conservatively
            # boundary: the scan computes them exactly
            if subset:
                out = dict(empty_contrib)
                out["n_files_boundary"] = len(subset)
                return out, subset
            return empty_contrib, []
        table = self.backend.read_arrow(self.DRIVER_PRUNE_MAX_FILES)
        if table is None:
            return self._plan_agg_distributed(
                clauses, min_max_columns, count_columns, empty_contrib, subset
            )

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        table = _strip_arrow_tz(table)
        paths = table.column("filepath").to_pylist()
        seen: set[str] = set()
        first = [
            i for i, p in enumerate(paths) if not (p in seen or seen.add(p))
        ]
        if len(first) < len(paths):
            table = table.take(pa.array(first))
            paths = table.column("filepath").to_pylist()
        missing: list[str] = []
        if subset is not None:
            fset = set(subset)
            sel = [i for i, p in enumerate(paths) if p in fset]
            missing = sorted(fset - set(paths))  # unindexed: boundary
            table = table.take(pa.array(sel))
            paths = table.column("filepath").to_pylist()
        n = table.num_rows
        if n == 0:
            out = dict(empty_contrib)
            out["n_files_boundary"] = len(missing)
            return out, missing

        def np_bool(arr) -> "np.ndarray":
            return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=bool)

        survive = np.ones(n, dtype=bool)
        full = np.ones(n, dtype=bool)
        num_rows_col = table.column("num_rows")
        for col, op, value in clauses:
            if col not in self.tracked_columns:
                # Untracked clause column: cannot prove anything — every
                # file survives (the scan filters exactly) and none is
                # interior.
                full &= False
                continue
            nulls = table.column(f"{col}_nulls")
            if op in NULLNESS_OPS:
                if op == "is_not_null":
                    keep_n = pc.less(nulls, num_rows_col)
                    full_n = pc.equal(nulls, pa.scalar(0))
                else:
                    keep_n = pc.greater(nulls, pa.scalar(0))
                    full_n = pc.equal(nulls, num_rows_col)
                survive &= np_bool(
                    pc.or_kleene(pc.is_null(nulls), keep_n)
                )
                full &= np_bool(pc.fill_null(full_n, False))
                continue
            lo = table.column(f"{col}_min")
            hi = table.column(f"{col}_max")
            sv = pa.scalar(value)
            if op == ">=":
                keep_c, full_c = pc.greater_equal(hi, sv), pc.greater_equal(lo, sv)
            elif op == ">":
                keep_c, full_c = pc.greater(hi, sv), pc.greater(lo, sv)
            elif op == "<=":
                keep_c, full_c = pc.less_equal(lo, sv), pc.less_equal(hi, sv)
            elif op == "<":
                keep_c, full_c = pc.less(lo, sv), pc.less(hi, sv)
            else:  # "=", "=="
                keep_c = pc.and_kleene(
                    pc.less_equal(lo, sv), pc.greater_equal(hi, sv)
                )
                full_c = pc.and_kleene(pc.equal(lo, sv), pc.equal(hi, sv))
            survive &= np_bool(
                pc.or_kleene(
                    pc.or_kleene(pc.is_null(lo), pc.is_null(hi)), keep_c
                )
            )
            # NULL stats / unknown null count → NOT interior (conservative
            # direction is the opposite of pruning's).
            full &= np_bool(pc.fill_null(full_c, False))
            full &= np_bool(pc.fill_null(pc.equal(nulls, pa.scalar(0)), False))

        serveable = np.ones(n, dtype=bool)
        for col in min_max_columns:
            mn = table.column(f"{col}_min")
            mx = table.column(f"{col}_max")
            nl = table.column(f"{col}_nulls")
            ok = pc.or_kleene(
                pc.and_kleene(
                    pc.invert(pc.is_null(mn)), pc.invert(pc.is_null(mx))
                ),
                pc.equal(nl, num_rows_col),  # provably all-NULL: serves as "no contribution"
            )
            serveable &= np_bool(pc.fill_null(ok, False))
        for col in count_columns:
            serveable &= np_bool(pc.invert(pc.is_null(table.column(f"{col}_nulls"))))

        interior = survive & full & serveable
        boundary_mask = survive & ~interior
        idx = pa.array(np.nonzero(interior)[0])
        boundary = sorted(
            table.column("filepath")
            .take(pa.array(np.nonzero(boundary_mask)[0]))
            .to_pylist()
            + missing
        )
        contrib = dict(empty_contrib)
        contrib.update(
            n_files_total=n,
            n_files_interior=int(interior.sum()),
            n_files_boundary=len(boundary),
            n_files_excluded=int((~survive).sum()),
            row_count=int(pc.sum(num_rows_col.take(idx)).as_py() or 0),
            cnt={
                c: int(
                    pc.sum(
                        pc.subtract(
                            num_rows_col, table.column(f"{c}_nulls")
                        ).take(idx)
                    ).as_py()
                    or 0
                )
                for c in count_columns
            },
            # .as_py() yields pandas Timestamps when pandas is installed;
            # downstream builds Spark literal rows, which want datetimes.
            min={
                c: _plain_py(pc.min(table.column(f"{c}_min").take(idx)).as_py())
                for c in min_max_columns
            },
            max={
                c: _plain_py(pc.max(table.column(f"{c}_max").take(idx)).as_py())
                for c in min_max_columns
            },
        )
        return contrib, boundary

    def _plan_agg_distributed(
        self,
        clauses: Sequence[tuple[str, str, Any]],
        min_max_columns: Sequence[str],
        count_columns: Sequence[str],
        empty_contrib: dict[str, Any],
        subset: list[str] | None = None,
    ) -> tuple[dict[str, Any], list[str]]:
        """Past-``DRIVER_PRUNE_MAX_FILES`` twin of the Arrow fast path:
        the same classification as Column expressions over ``stats_df()``
        — ONE metadata-sized aggregate for the interior contribution plus
        one bounded collect of the boundary file list (the scan needs
        that list driver-side regardless, exactly like ``prune``)."""
        df = self.stats_df()
        missing: list[str] = []
        if subset is not None:
            df = df.filter(F.col("filepath").isin(subset))
            present = {
                r["filepath"] for r in df.select("filepath").collect()
            }
            missing = sorted(set(subset) - present)  # unindexed: boundary
        survive = self._clause_prune_filter(clauses)
        full = F.lit(True)
        for col, op, value in clauses:
            if col not in self.tracked_columns:
                full = F.lit(False)
                continue
            if op in NULLNESS_OPS:
                nl = F.col(f"{col}_nulls")
                full_n = (
                    (nl == 0) if op == "is_not_null" else (nl == F.col("num_rows"))
                )
                full = full & F.coalesce(full_n, F.lit(False))
                continue
            lo, hi = F.col(f"{col}_min"), F.col(f"{col}_max")
            lit = F.lit(value)
            if op == ">=":
                full_c = lo >= lit
            elif op == ">":
                full_c = lo > lit
            elif op == "<=":
                full_c = hi <= lit
            elif op == "<":
                full_c = hi < lit
            else:  # "=", "=="
                full_c = (lo == lit) & (hi == lit)
            full = (
                full
                & F.coalesce(full_c, F.lit(False))
                & F.coalesce(F.col(f"{col}_nulls") == 0, F.lit(False))
            )
        serveable = F.lit(True)
        for col in min_max_columns:
            serveable = serveable & F.coalesce(
                (
                    F.col(f"{col}_min").isNotNull()
                    & F.col(f"{col}_max").isNotNull()
                )
                | (F.col(f"{col}_nulls") == F.col("num_rows")),
                F.lit(False),
            )
        for col in count_columns:
            serveable = serveable & F.col(f"{col}_nulls").isNotNull()
        flagged = df.select(
            "*",
            survive.alias("__survive"),
            (survive & full & serveable).alias("__interior"),
        ).persist()
        try:
            aggs = [
                F.count(F.lit(1)).alias("__total"),
                F.sum(F.when(F.col("__interior"), 1).otherwise(0)).alias(
                    "__n_interior"
                ),
                F.sum(F.when(~F.col("__survive"), 1).otherwise(0)).alias(
                    "__n_excluded"
                ),
                F.sum(
                    F.when(F.col("__interior"), F.col("num_rows")).otherwise(0)
                ).alias("__rows"),
            ]
            for c in min_max_columns:
                aggs.append(
                    F.min(
                        F.when(F.col("__interior"), F.col(f"{c}_min"))
                    ).alias(f"__min_{c}")
                )
                aggs.append(
                    F.max(
                        F.when(F.col("__interior"), F.col(f"{c}_max"))
                    ).alias(f"__max_{c}")
                )
            for c in count_columns:
                aggs.append(
                    F.sum(
                        F.when(
                            F.col("__interior"),
                            F.col("num_rows") - F.col(f"{c}_nulls"),
                        ).otherwise(0)
                    ).alias(f"__cnt_{c}")
                )
            row = flagged.agg(*aggs).collect()[0]
            boundary = sorted(
                [
                    r["filepath"]
                    for r in flagged.filter(
                        F.col("__survive") & ~F.col("__interior")
                    )
                    .select("filepath")
                    .collect()
                ]
                + missing
            )
        finally:
            flagged.unpersist()
        contrib = dict(empty_contrib)
        contrib.update(
            n_files_total=row["__total"] or 0,
            n_files_interior=row["__n_interior"] or 0,
            n_files_boundary=len(boundary),
            n_files_excluded=row["__n_excluded"] or 0,
            row_count=row["__rows"] or 0,
            cnt={c: row[f"__cnt_{c}"] or 0 for c in count_columns},
            min={c: row[f"__min_{c}"] for c in min_max_columns},
            max={c: row[f"__max_{c}"] for c in min_max_columns},
        )
        return contrib, boundary
