"""Pluggable storage backends for the file-stats metastore.

The reference persists its stats table in any SQLAlchemy-supported RDBMS
(lakeshack/metastore.py:79-98 — SQLite in every test/doc); this module is
the same swappable-storage idea with the engine's two natural homes:

- :class:`ParquetStatsBackend` (default): the stats table is itself
  Parquet, readable as a DataFrame by every executor. The right choice on
  a cluster — appends/rewrites are Spark jobs and pruning can run
  distributed past the driver-side threshold.
- :class:`DuckDBStatsBackend`: a single-file RDBMS store (``*.duckdb``),
  driver-side like the reference's database connection. The right choice
  for single-node deployments or when the stats table should live next to
  other operational tables. Stats are metadata-scale (one row per data
  FILE), so driver-side reads are bounded by design — the same argument
  the reference makes for its DB round-trips.

A backend only moves bytes: discovery, footer reads, idempotency joins,
validation policy, and pruning semantics all live in
:class:`~lakeshack_spark.metastore.FileStatsMetastore` and are identical
across backends (the backend-parametrized tests in
``tests/test_metastore.py`` pin that).
"""

from __future__ import annotations

import abc
import logging
import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession, types as T

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

logger = logging.getLogger(__name__)


def make_backend(spark: SparkSession, store_path: str) -> "StatsBackend":
    """Pick a backend from the store path: ``*.duckdb`` (or a
    ``duckdb:///`` URL) → DuckDB file, anything else → Parquet directory.

    Reference users pass SQLAlchemy store URLs (``sqlite:///stats.db``,
    lakeshack/metastore.py:79-98); an unsupported dialect raises with the
    supported equivalent spelled out rather than silently creating a
    Parquet directory named like a URL."""
    for scheme, cls in (("duckdb://", DuckDBStatsBackend), ("sqlite://", SQLiteStatsBackend)):
        if store_path.startswith(scheme):
            # SQLAlchemy URL convention: three slashes = relative path,
            # four = absolute — i.e. strip exactly one separator slash.
            rest = store_path[len(scheme):]
            return cls(spark, rest[1:] if rest.startswith("/") else rest)
    if "://" in store_path:
        scheme = store_path.split("://", 1)[0]
        # SQLAlchemy's dialect[+driver] spelling (the reference accepts
        # any create_engine URL, ref lakeshack/metastore.py:79-98):
        # postgresql:// and mysql:// route to the generic DB-API backend
        # with their conventional drivers; an explicit +driver names the
        # DB-API module directly (e.g. postgresql+psycopg2://...).
        dialect, _, driver = scheme.partition("+")
        if dialect in ("postgresql", "postgres", "mysql") or driver:
            return DbApiStatsBackend(spark, store_path)
        if dialect in ("mssql", "oracle"):
            raise ValueError(
                f"RDBMS store URL {store_path!r} is not supported; "
                "supported RDBMS stores: DuckDB/SQLite file paths (or "
                "duckdb:/// / sqlite:/// URLs) and PostgreSQL/MySQL via "
                "the generic DB-API backend (postgresql://, mysql://, or "
                "an explicit dialect+driver:// URL)"
            )
    if store_path.endswith(".duckdb"):
        return DuckDBStatsBackend(spark, store_path)
    # Deliberately NOT routing bare ".db" here: it is a generic suffix a
    # pre-existing Parquet store directory may legitimately carry, and
    # rerouting it would break reconnects to such stores. SQLite users
    # pass sqlite:/// URLs (the reference's spelling) or .sqlite paths.
    if store_path.endswith((".sqlite", ".sqlite3")):
        return SQLiteStatsBackend(spark, store_path)
    return ParquetStatsBackend(spark, store_path)


class StatsBackend(abc.ABC):
    """Storage contract for the stats table. ``bind`` is called once by
    the metastore with the expected stats schema before any other use."""

    stats_schema: T.StructType

    def bind(self, stats_schema: T.StructType) -> None:
        self.stats_schema = stats_schema

    @abc.abstractmethod
    def exists(self) -> bool: ...

    @abc.abstractmethod
    def actual_schema(self) -> T.StructType | None:
        """Schema of an existing store, or None when nothing exists yet.
        Used for reconnect validation — must reflect what is stored, not
        what is expected."""

    @abc.abstractmethod
    def read_df(self) -> DataFrame:
        """The stats table as a DataFrame (empty if never written)."""

    @abc.abstractmethod
    def read_arrow(self, max_rows: int) -> "pa.Table | None":
        """Driver-side fast-path read; None when the caller should use
        the distributed path instead (remote store / too large)."""

    @abc.abstractmethod
    def append(self, df: DataFrame, n_rows: int) -> None: ...

    @abc.abstractmethod
    def rewrite(self, df: DataFrame) -> int:
        """Replace the store contents with ``df``; returns rows written."""

    @abc.abstractmethod
    def compact(self) -> int:
        """Fold physical fragmentation; returns resulting file count (0
        when the backend has nothing to compact)."""

    def maybe_compact(self) -> None:
        """Best-effort automatic compaction hook after appends."""

    @abc.abstractmethod
    def drop(self) -> None:
        """Delete the store entirely (maintenance rebuilds call this)."""


# --------------------------------------------------------------- parquet


class ParquetStatsBackend(StatsBackend):
    """Stats table as Parquet files under a directory (the default)."""

    #: Target stats rows per store file: ~500k rows ≈ 100 MB of stats —
    #: appends stay single-file until updates are huge, and compaction
    #: folds a 10M-file dataset's store into ~20 files.
    STATS_ROWS_PER_FILE = 500_000

    #: Auto-compact once per-update appends have accumulated this many
    #: files (keeps the prune-time read to a few files no matter how many
    #: ingest ticks have run).
    STATS_COMPACT_FILE_THRESHOLD = 64

    def __init__(self, spark: SparkSession, store_path: str) -> None:
        self.spark = spark
        self.store_path = store_path

    # -- helpers

    def _n_output_files(self, n_rows: int) -> int:
        return max(1, -(-n_rows // self.STATS_ROWS_PER_FILE))

    def store_files(self) -> list[str]:
        from lakeshack_spark.metastore import list_parquet_files

        return list_parquet_files(self.store_path, self.spark, skip_side_dirs=False)

    # -- contract

    def exists(self) -> bool:
        try:
            return bool(self.store_files())
        except Exception:
            return False

    def actual_schema(self) -> T.StructType | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self.store_path).schema

    def read_df(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], self.stats_schema)
        return self.spark.read.schema(self.stats_schema).parquet(self.store_path)

    def read_arrow(self, max_rows: int) -> "pa.Table | None":
        from lakeshack_spark.metastore import _is_remote

        import pyarrow.dataset as pads

        if _is_remote(self.store_path):
            return None  # remote store: executors read it, not the driver
        dataset = pads.dataset(self.store_files(), format="parquet")
        if dataset.count_rows() > max_rows:
            return None
        return dataset.to_table()

    def append(self, df: DataFrame, n_rows: int) -> None:
        # Output file count sized by row count (stats rows are tiny),
        # never a hard-coded single-task funnel.
        df.coalesce(self._n_output_files(n_rows)).write.mode("append").parquet(
            self.store_path
        )

    def rewrite(self, df: DataFrame) -> int:
        """Stage to a sibling directory sized by row count, then swap —
        no driver materialization. (Local swap is rename-based and not
        atomic under concurrent readers; at production scale the same
        rewrite runs under a table-format commit — see the maintenance
        module docstring.)"""
        import shutil

        from lakeshack_spark.metastore import _is_remote, _strip_file_scheme

        staging = self.store_path.rstrip("/") + "__staging"
        n_rows = df.count()
        df.repartition(self._n_output_files(n_rows)).write.mode("overwrite").parquet(
            staging
        )
        if _is_remote(self.store_path):
            jvm = self.spark.sparkContext._jvm
            jsc = self.spark.sparkContext._jsc
            dst = jvm.org.apache.hadoop.fs.Path(self.store_path)
            src = jvm.org.apache.hadoop.fs.Path(staging)
            fs = dst.getFileSystem(jsc.hadoopConfiguration())
            if fs.exists(dst):
                fs.delete(dst, True)
            fs.rename(src, dst)
        else:
            store = _strip_file_scheme(self.store_path)
            stag = _strip_file_scheme(staging)
            if os.path.exists(store):
                shutil.rmtree(store)
            os.replace(stag, store)
        return n_rows

    def compact(self) -> int:
        if not self.exists():
            return 0
        self.rewrite(self.read_df())
        return len(self.store_files())

    def maybe_compact(self) -> None:
        try:
            if len(self.store_files()) > self.STATS_COMPACT_FILE_THRESHOLD:
                self.compact()
        except Exception as exc:  # compaction is best-effort maintenance
            logger.warning("stats store compaction skipped: %s", exc)

    def drop(self) -> None:
        import shutil

        from lakeshack_spark.metastore import _is_remote, _strip_file_scheme

        if _is_remote(self.store_path):
            jvm = self.spark.sparkContext._jvm
            jsc = self.spark.sparkContext._jsc
            p = jvm.org.apache.hadoop.fs.Path(self.store_path)
            fs = p.getFileSystem(jsc.hadoopConfiguration())
            if fs.exists(p):
                fs.delete(p, True)
            return
        path = _strip_file_scheme(self.store_path)
        if os.path.exists(path):
            shutil.rmtree(path)


# ---------------------------------------------------------------- duckdb

#: Spark ⇄ DuckDB DDL type map for the (narrow) set of stat column types
#: (mirrors the reference's ``Metastore._map_pa_type`` → SQLAlchemy map,
#: lakeshack/metastore.py:483-511).
_SPARK_TO_DUCK = {
    T.LongType(): "BIGINT",
    T.DoubleType(): "DOUBLE",
    T.StringType(): "VARCHAR",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
}
_DUCK_TO_SPARK = {v: k for k, v in _SPARK_TO_DUCK.items()}


class _DriverDbStatsBackend(StatsBackend):
    """Shared plumbing for single-file RDBMS stores (DuckDB, SQLite):
    driver-side by construction like the reference's SQLAlchemy engine.
    Timestamp stats are stored naive-UTC (the engine runs with
    ``spark.sql.session.timeZone=UTC``), matching what the Parquet
    backend's footer normalization produces."""

    TABLE = "file_stats"

    def __init__(self, spark: SparkSession, db_path: str) -> None:
        self.spark = spark
        self.db_path = db_path

    @staticmethod
    def _strip_tz(table: "pa.Table") -> "pa.Table":
        """Spark's toArrow stamps TimestampType as timestamp[us, UTC];
        drop the zone (values are already UTC instants) so the DB stores
        plain TIMESTAMP. Shares the metastore's vectorized normalizer."""
        from lakeshack_spark.metastore import _strip_arrow_tz

        return _strip_arrow_tz(table)

    def read_df(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], self.stats_schema)
        table = self.read_arrow(0)
        if table.num_rows == 0:
            return self.spark.createDataFrame([], self.stats_schema)
        pdf = table.to_pandas()
        # Align to the bound schema like the Parquet backend's explicit-
        # schema read: columns an older store lacks surface as NULLs (the
        # metastore's migration path fills them and rewrites).
        for f in self.stats_schema.fields:
            if f.name not in pdf.columns:
                pdf[f.name] = None
        return self.spark.createDataFrame(
            pdf[[f.name for f in self.stats_schema.fields]], self.stats_schema
        )

    def compact(self) -> int:
        return 0  # the RDBMS manages its own physical layout

    def drop(self) -> None:
        if os.path.exists(self.db_path):
            os.remove(self.db_path)


class DuckDBStatsBackend(_DriverDbStatsBackend):
    """Stats table in a single-file DuckDB database — see
    :class:`_DriverDbStatsBackend` for the storage model."""

    def _connect(self):
        import duckdb

        return duckdb.connect(self.db_path)

    def _table_exists(self, con) -> bool:
        rows = con.execute(
            "SELECT 1 FROM information_schema.tables WHERE table_name = ?",
            [self.TABLE],
        ).fetchall()
        return bool(rows)

    def _ddl(self) -> str:
        cols = []
        for f in self.stats_schema.fields:
            try:
                duck = _SPARK_TO_DUCK[f.dataType]
            except KeyError:  # pragma: no cover - stat types are closed
                raise ValueError(
                    f"stat column {f.name!r} has unmappable type {f.dataType}"
                )
            pk = " PRIMARY KEY" if f.name == "filepath" else ""
            null = "" if f.nullable else " NOT NULL"
            cols.append(f'"{f.name}" {duck}{pk}{null}')
        return f'CREATE TABLE IF NOT EXISTS "{self.TABLE}" ({", ".join(cols)})'

    # -- contract

    def exists(self) -> bool:
        if not os.path.exists(self.db_path):
            return False
        with self._connect() as con:
            return self._table_exists(con)

    def actual_schema(self) -> T.StructType | None:
        if not self.exists():
            return None
        with self._connect() as con:
            desc = con.execute(f'DESCRIBE "{self.TABLE}"').fetchall()
        fields = []
        for name, coltype, *_rest in desc:
            spark_type = _DUCK_TO_SPARK.get(coltype.upper())
            if spark_type is None:
                # Surface the mismatch as an impossible type so the
                # metastore's validation reports it instead of crashing.
                spark_type = T.NullType()
            fields.append(T.StructField(name, spark_type, True))
        return T.StructType(fields)

    def read_arrow(self, max_rows: int) -> "pa.Table":
        """The store is driver-side by definition (single-file DB), so
        the fast path always applies; ``max_rows`` is a no-op here."""
        with self._connect() as con:
            if not self._table_exists(con):
                import pyarrow as pa

                return pa.table({})
            return con.execute(f'SELECT * FROM "{self.TABLE}"').fetch_arrow_table()

    def append(self, df: DataFrame, n_rows: int) -> None:
        table = self._strip_tz(df.toArrow())
        cols = ", ".join(f'"{f.name}"' for f in self.stats_schema.fields)
        with self._connect() as con:
            con.execute(self._ddl())
            con.register("__new_stats", table)
            con.execute(
                f'INSERT INTO "{self.TABLE}" ({cols}) '
                f"SELECT {cols} FROM __new_stats"
            )

    def rewrite(self, df: DataFrame) -> int:
        # DROP + CREATE + INSERT in one transaction, not DELETE + INSERT:
        # DuckDB's ART index keeps deleted keys visible until commit, so
        # re-inserting a surviving filepath inside the same transaction
        # would trip the primary-key constraint.
        table = self._strip_tz(df.toArrow())
        cols = ", ".join(f'"{f.name}"' for f in self.stats_schema.fields)
        with self._connect() as con:
            con.execute("BEGIN")
            con.execute(f'DROP TABLE IF EXISTS "{self.TABLE}"')
            con.execute(self._ddl())
            con.register("__rewrite_stats", table)
            con.execute(
                f'INSERT INTO "{self.TABLE}" ({cols}) '
                f"SELECT {cols} FROM __rewrite_stats"
            )
            con.execute("COMMIT")
        return table.num_rows


# ---------------------------------------------------------------- sqlite

#: Spark ⇄ SQLite declared-type map. SQLite columns carry type AFFINITY,
#: not strict types, but the DECLARED type string round-trips verbatim
#: through ``PRAGMA table_info`` — so DATE/TIMESTAMP keep their logical
#: identity for reconnect validation even though values are stored as
#: ISO-8601 TEXT (exactly how SQLAlchemy's SQLite dialect persists the
#: reference's Date/DateTime stat columns, ref lakeshack/metastore.py:483-511).
_SPARK_TO_SQLITE = dict(_SPARK_TO_DUCK)
_SQLITE_TO_SPARK = {v: k for k, v in _SPARK_TO_SQLITE.items()}


def _arrow_stat_type(dtype: T.DataType):
    import pyarrow as pa

    return {
        T.LongType(): pa.int64(),
        T.DoubleType(): pa.float64(),
        T.StringType(): pa.string(),
        T.DateType(): pa.date32(),
        T.TimestampType(): pa.timestamp("us"),
    }[dtype]


class SQLiteStatsBackend(_DriverDbStatsBackend):
    """Stats table in a single-file SQLite database via stdlib ``sqlite3``
    — the reference's actual deployment story: every reference test and
    doc connects the metastore with a ``sqlite:///`` store URL
    (ref lakeshack/metastore.py:79-98, tests/test_metastore.py,
    docs/source/lakeshack.rst:322-334), so an existing reference store URL
    points here unchanged.

    Temporal stats are stored as ISO-8601 TEXT under DATE/TIMESTAMP
    declared types and converted back on read; ints/floats/strings map to
    native SQLite storage classes. Rewrites follow the DROP + CREATE +
    INSERT discipline shared with the DuckDB backend (there it dodges the
    ART-index deleted-key trap; here it keeps the two paths identical)."""

    def _connect(self):
        import sqlite3

        con = sqlite3.connect(self.db_path)
        con.isolation_level = None  # explicit BEGIN/COMMIT below
        return con

    def _table_exists(self, con) -> bool:
        rows = con.execute(
            "SELECT 1 FROM sqlite_master WHERE type = 'table' AND name = ?",
            [self.TABLE],
        ).fetchall()
        return bool(rows)

    def _ddl(self) -> str:
        cols = []
        for f in self.stats_schema.fields:
            try:
                decl = _SPARK_TO_SQLITE[f.dataType]
            except KeyError:  # pragma: no cover - stat types are closed
                raise ValueError(
                    f"stat column {f.name!r} has unmappable type {f.dataType}"
                )
            pk = " PRIMARY KEY" if f.name == "filepath" else ""
            null = "" if f.nullable else " NOT NULL"
            cols.append(f'"{f.name}" {decl}{pk}{null}')
        return f'CREATE TABLE IF NOT EXISTS "{self.TABLE}" ({", ".join(cols)})'

    @staticmethod
    def _to_db(v):
        import datetime as _dt

        if isinstance(v, _dt.datetime):  # before date: datetime IS a date
            return v.isoformat(sep=" ")
        if isinstance(v, _dt.date):
            return v.isoformat()
        return v

    @staticmethod
    def _from_db(v, dtype: T.DataType):
        import datetime as _dt

        if v is None:
            return None
        if dtype == T.TimestampType():
            return _dt.datetime.fromisoformat(v)
        if dtype == T.DateType():
            return _dt.date.fromisoformat(v)
        return v

    def _rows(self, table: "pa.Table") -> tuple[list[str], list[tuple]]:
        names = [f.name for f in self.stats_schema.fields]
        rows = [
            tuple(self._to_db(rec.get(n)) for n in names)
            for rec in table.to_pylist()
        ]
        return names, rows

    def _insert(self, con, names: list[str], rows: list[tuple]) -> None:
        cols = ", ".join(f'"{n}"' for n in names)
        ph = ", ".join("?" for _ in names)
        con.executemany(
            f'INSERT INTO "{self.TABLE}" ({cols}) VALUES ({ph})', rows
        )

    # -- contract

    def exists(self) -> bool:
        if not os.path.exists(self.db_path):
            return False
        con = self._connect()
        try:
            return self._table_exists(con)
        finally:
            con.close()

    def actual_schema(self) -> T.StructType | None:
        if not self.exists():
            return None
        con = self._connect()
        try:
            info = con.execute(f'PRAGMA table_info("{self.TABLE}")').fetchall()
        finally:
            con.close()
        fields = []
        for _cid, name, decl, _notnull, _dflt, _pk in info:
            spark_type = _SQLITE_TO_SPARK.get((decl or "").upper())
            if spark_type is None:
                # Surface the mismatch as an impossible type so the
                # metastore's validation reports it instead of crashing.
                spark_type = T.NullType()
            fields.append(T.StructField(name, spark_type, True))
        return T.StructType(fields)

    def read_arrow(self, max_rows: int) -> "pa.Table":
        """Driver-side by definition (single-file DB); ``max_rows`` is a
        no-op like the DuckDB backend's."""
        import pyarrow as pa

        if not self.exists():
            return pa.table({})
        actual = self.actual_schema()
        names = [f.name for f in actual.fields]
        cols = ", ".join(f'"{n}"' for n in names)
        con = self._connect()
        try:
            rows = con.execute(f'SELECT {cols} FROM "{self.TABLE}"').fetchall()
        finally:
            con.close()
        arrays, fields = [], []
        for i, f in enumerate(actual.fields):
            at = _arrow_stat_type(f.dataType)
            arrays.append(
                pa.array([self._from_db(r[i], f.dataType) for r in rows], type=at)
            )
            fields.append(pa.field(f.name, at))
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))

    def append(self, df: DataFrame, n_rows: int) -> None:
        names, rows = self._rows(self._strip_tz(df.toArrow()))
        con = self._connect()
        try:
            con.execute("BEGIN")
            con.execute(self._ddl())
            self._insert(con, names, rows)
            con.execute("COMMIT")
        finally:
            con.close()

    def rewrite(self, df: DataFrame) -> int:
        names, rows = self._rows(self._strip_tz(df.toArrow()))
        con = self._connect()
        try:
            con.execute("BEGIN")
            con.execute(f'DROP TABLE IF EXISTS "{self.TABLE}"')
            con.execute(self._ddl())
            self._insert(con, names, rows)
            con.execute("COMMIT")
        finally:
            con.close()
        return len(rows)


# ----------------------------------------------------------- generic DB-API

#: ANSI declared types for the generic dialect (PostgreSQL-compatible;
#: DuckDB and MySQL accept the same spellings).
_SPARK_TO_ANSI = {
    T.LongType(): "BIGINT",
    T.DoubleType(): "DOUBLE PRECISION",
    T.StringType(): "VARCHAR",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
}
#: information_schema data_type strings across engines (PG lowercases and
#: expands; DuckDB/MySQL report the short forms) — compared upper-cased.
_ANSI_TO_SPARK = {
    "BIGINT": T.LongType(),
    "INT8": T.LongType(),
    "DOUBLE": T.DoubleType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "FLOAT8": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "CHARACTER VARYING": T.StringType(),
    "TEXT": T.StringType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "TIMESTAMP WITHOUT TIME ZONE": T.TimestampType(),
    "DATETIME": T.TimestampType(),
}

#: Conventional DB-API driver module per dialect (SQLAlchemy's own
#: defaults); an explicit ``dialect+driver://`` URL overrides.
_DEFAULT_DRIVERS = {
    "postgresql": "psycopg2",
    "postgres": "psycopg2",
    "mysql": "pymysql",
}


class DbApiStatsBackend(_DriverDbStatsBackend):
    """Stats table behind ANY DB-API 2.0 driver, addressed by a
    SQLAlchemy-style URL — the reference's ``create_engine(store_url)``
    surface (ref lakeshack/metastore.py:79-98) for server RDBMSes:
    ``postgresql://user:pw@host/db``, ``mysql://...``, or an explicit
    ``dialect+driver://`` naming the DB-API module (SQLAlchemy's own
    convention). SQL stays in the ANSI subset every target speaks
    (information_schema, CREATE TABLE IF NOT EXISTS, qmark/pyformat
    placeholders), and temporal values cross the driver as native
    date/datetime objects per the DB-API spec.

    The driver module resolves lazily with a guided error naming the
    missing package.

    Tested matrix: (a) ``postgresql+duckdb:///file`` routes the full
    generic path through DuckDB's DB-API module — same SQL, same
    placeholders, same information_schema reads a server would get; and
    (b) ``postgresql+lakeshack_spark.pgwire://`` runs the same suite
    against a REAL PostgreSQL server over the v3 wire protocol
    (:mod:`lakeshack_spark.pgwire`, trust auth on a unix socket), so the
    networked type round trips (BIGINT/DOUBLE PRECISION/VARCHAR/TIMESTAMP
    text-mode encode/decode, CREATE DATABASE isolation, executemany
    batching, information_schema reflection) are exercised end to end.
    MySQL dialect quirks (backtick quoting, VARCHAR(512) keys,
    ``DATABASE()`` scoping) are unit-tested against composed SQL; no
    MySQL server runs in CI."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        connect_factory=None,
        paramstyle: str | None = None,
    ) -> None:
        super().__init__(spark, url)
        self.url = url
        scheme = url.split("://", 1)[0] if "://" in url else ""
        self.dialect, _, driver = scheme.partition("+")
        self.driver = driver or _DEFAULT_DRIVERS.get(self.dialect)
        if connect_factory is None and self.driver is None:
            raise ValueError(
                f"cannot infer a DB-API driver for store URL {url!r}; use "
                "an explicit dialect+driver:// URL (the driver part names "
                "the DB-API module, e.g. postgresql+psycopg2://)"
            )
        self._connect_factory = connect_factory
        self._paramstyle = paramstyle

    # -- driver plumbing

    def _module(self):
        import importlib

        try:
            return importlib.import_module(self.driver)
        except ImportError as exc:
            raise ImportError(
                f"store URL {self.url!r} needs the DB-API module "
                f"{self.driver!r}, which is not installed; install it or "
                "use a DuckDB/SQLite store path instead"
            ) from exc

    def _local_path(self) -> str:
        # three slashes = relative, four = absolute (SQLAlchemy rule)
        rest = self.url.split("://", 1)[1]
        return rest[1:] if rest.startswith("/") else rest

    def _plain_url(self) -> str:
        """The URL with any +driver qualifier removed — what libpq-style
        ``connect(dsn)`` drivers expect."""
        return f"{self.dialect}://" + self.url.split("://", 1)[1]

    def _connect(self):
        if self._connect_factory is not None:
            return self._connect_factory()
        mod = self._module()
        if self.driver == "duckdb":
            return mod.connect(self._local_path())
        if self.driver == "pymysql":
            from urllib.parse import urlparse

            u = urlparse(self._plain_url())
            return mod.connect(
                host=u.hostname or "localhost",
                port=u.port or 3306,
                user=u.username,
                password=u.password or "",
                database=u.path.lstrip("/"),
            )
        # libpq-style drivers (psycopg2 et al.) take the URL as the DSN
        return mod.connect(self._plain_url())

    def _ph(self) -> str:
        style = self._paramstyle
        if style is None and self.driver is not None:
            # resolve from the driver module even when a connect_factory
            # was injected — psycopg2/pymysql factories still speak
            # pyformat, and hard-defaulting to qmark would hand them '?'
            # placeholders they reject (self-review r6)
            try:
                import importlib

                style = getattr(
                    importlib.import_module(self.driver), "paramstyle", None
                )
            except ImportError:
                style = None
        return "?" if (style or "qmark") == "qmark" else "%s"

    def _q(self, name: str) -> str:
        """Quoted identifier: MySQL's default sql_mode parses double-
        quoted identifiers as string literals — backticks there, ANSI
        double quotes everywhere else (self-review r6)."""
        if self.dialect == "mysql":
            return f"`{name}`"
        return f'"{name}"'

    def _schema_filter(self) -> str:
        """information_schema predicates must scope to the CURRENT
        schema/database — a same-named table in another schema on a
        shared server would otherwise satisfy exists() and feed
        actual_schema foreign columns (self-review r6)."""
        if self.dialect == "mysql":
            return " AND table_schema = DATABASE()"
        return " AND table_schema = current_schema()"

    @staticmethod
    def _commit(con) -> None:
        try:
            con.commit()
        except Exception:  # autocommit drivers may refuse an empty commit
            pass

    def _table_exists(self, con) -> bool:
        cur = con.cursor()
        cur.execute(
            "SELECT 1 FROM information_schema.tables WHERE table_name = "
            + self._ph()
            + self._schema_filter(),
            (self.TABLE,),
        )
        return bool(cur.fetchall())

    def _ddl(self) -> str:
        cols = []
        for f in self.stats_schema.fields:
            try:
                decl = _SPARK_TO_ANSI[f.dataType]
            except KeyError:  # pragma: no cover - stat types are closed
                raise ValueError(
                    f"stat column {f.name!r} has unmappable type {f.dataType}"
                )
            if self.dialect == "mysql" and decl == "VARCHAR":
                # MySQL requires a VARCHAR length, and an indexable (PK)
                # key must fit InnoDB's 3072-byte limit: 512 utf8mb4
                # chars = 2048 bytes (self-review r6)
                decl = "VARCHAR(512)"
            pk = " PRIMARY KEY" if f.name == "filepath" else ""
            null = "" if f.nullable else " NOT NULL"
            cols.append(f"{self._q(f.name)} {decl}{pk}{null}")
        return (
            f"CREATE TABLE IF NOT EXISTS {self._q(self.TABLE)} "
            f"({', '.join(cols)})"
        )

    def _insert(self, con, names: list[str], rows: list[tuple]) -> None:
        cols = ", ".join(self._q(n) for n in names)
        ph = ", ".join(self._ph() for _ in names)
        con.cursor().executemany(
            f"INSERT INTO {self._q(self.TABLE)} ({cols}) VALUES ({ph})", rows
        )

    # -- contract

    def exists(self) -> bool:
        con = self._connect()
        try:
            return self._table_exists(con)
        finally:
            con.close()

    def actual_schema(self) -> T.StructType | None:
        con = self._connect()
        try:
            if not self._table_exists(con):
                return None
            cur = con.cursor()
            cur.execute(
                "SELECT column_name, data_type FROM "
                "information_schema.columns WHERE table_name = "
                + self._ph()
                + self._schema_filter()
                + " ORDER BY ordinal_position",
                (self.TABLE,),
            )
            info = cur.fetchall()
        finally:
            con.close()
        fields = []
        for name, decl in info:
            spark_type = _ANSI_TO_SPARK.get((decl or "").upper())
            if spark_type is None:
                # Surface the mismatch as an impossible type so the
                # metastore's validation reports it instead of crashing.
                spark_type = T.NullType()
            fields.append(T.StructField(name, spark_type, True))
        return T.StructType(fields)

    def read_arrow(self, max_rows: int) -> "pa.Table":
        """Driver-side like the reference's DB round trips; ``max_rows``
        is a no-op (stats are metadata-scale by design)."""
        import pyarrow as pa

        actual = self.actual_schema()
        if actual is None:
            return pa.table({})
        names = [f.name for f in actual.fields]
        cols = ", ".join(self._q(n) for n in names)
        con = self._connect()
        try:
            cur = con.cursor()
            cur.execute(f"SELECT {cols} FROM {self._q(self.TABLE)}")
            rows = cur.fetchall()
        finally:
            con.close()
        arrays, fields = [], []
        for i, f in enumerate(actual.fields):
            at = _arrow_stat_type(f.dataType)
            arrays.append(pa.array([r[i] for r in rows], type=at))
            fields.append(pa.field(f.name, at))
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))

    def _native_rows(self, table: "pa.Table") -> tuple[list[str], list[tuple]]:
        names = [f.name for f in self.stats_schema.fields]
        return names, [
            tuple(rec.get(n) for n in names) for rec in table.to_pylist()
        ]

    def append(self, df: DataFrame, n_rows: int) -> None:
        names, rows = self._native_rows(self._strip_tz(df.toArrow()))
        con = self._connect()
        try:
            con.cursor().execute(self._ddl())
            self._insert(con, names, rows)
            self._commit(con)
        finally:
            con.close()

    def rewrite(self, df: DataFrame) -> int:
        names, rows = self._native_rows(self._strip_tz(df.toArrow()))
        con = self._connect()
        try:
            cur = con.cursor()
            cur.execute(f"DROP TABLE IF EXISTS {self._q(self.TABLE)}")
            cur.execute(self._ddl())
            self._insert(con, names, rows)
            self._commit(con)
        finally:
            con.close()
        return len(rows)

    def drop(self) -> None:
        con = self._connect()
        try:
            con.cursor().execute(f"DROP TABLE IF EXISTS {self._q(self.TABLE)}")
            self._commit(con)
        finally:
            con.close()
