"""Minimal pure-Python DB-API 2.0 driver for PostgreSQL (wire protocol v3).

Why this exists: :class:`~lakeshack_spark.stats_backends.DbApiStatsBackend`
gives the stats store the reference's any-RDBMS surface
(``create_engine(store_url)``, lakeshack/metastore.py:79-98), but a server
driver like psycopg2 is a binary dependency this environment cannot
install. This module implements exactly the slice of the PostgreSQL
Frontend/Backend protocol (v3.0, as publicly documented in the PostgreSQL
manual's "Frontend/Backend Protocol" chapter) that the backend's ANSI SQL
needs, so the generic DB-API path can be exercised against a REAL
PostgreSQL server over a real socket — types, information_schema,
transactions and all — with zero dependencies.

Scope (deliberate):

- **Simple query protocol only** ('Q' messages, text-format results).
  Parameters are interpolated client-side as SQL literals — the same
  strategy psycopg2 uses — with ``paramstyle = "pyformat"`` so
  ``DbApiStatsBackend._ph()`` hands us ``%s`` placeholders.
- **Auth**: trust (code 0) and cleartext password (code 3). No MD5/SCRAM
  — local test clusters run trust; production users should install a
  real driver (``postgresql+psycopg2://`` URLs resolve that instead).
- **Types**: text-mode decode by OID for the types the stats schema can
  produce (bool, int2/4/8, float4/8, numeric, text/varchar/name, date,
  timestamp, timestamptz). Unknown OIDs come back as str.
- **Connections are autocommit** at the protocol level (each simple
  Query runs in its own implicit transaction); ``commit()`` is a no-op
  kept for DB-API shape. The backend's statements are individually
  atomic, which is all it relies on from the DuckDB/SQLite legs too.

DSN form: libpq-style URI, e.g.
``postgresql://user@/dbname?host=/path/to/socketdir&port=5432`` (unix
socket) or ``postgresql://user:pw@localhost:5432/dbname`` (TCP).
"""

from __future__ import annotations

import datetime as dt
import socket
import struct
from decimal import Decimal
from typing import Any, Sequence
from urllib.parse import parse_qs, unquote, urlparse

apilevel = "2.0"
threadsafety = 1
paramstyle = "pyformat"

_PROTOCOL_V3 = 196608  # 3 << 16


class Error(Exception):
    """DB-API base error; carries the server's ErrorResponse fields."""


class DatabaseError(Error):
    pass


class InterfaceError(Error):
    pass


def _parse_bool(s: str) -> bool:
    return s == "t"


def _parse_timestamp(s: str) -> dt.datetime:
    # "2026-08-15 08:47:34.004859" with optional "+HH[:MM]" zone offset
    # (timestamptz under DateStyle=ISO); we return naive datetimes like
    # the rest of the engine's canonical-naive-UTC convention.
    for sep in ("+", "-"):
        # zone offset only ever follows the time part (position > 18)
        idx = s.rfind(sep)
        if idx > 18:
            s = s[:idx]
            break
    return dt.datetime.fromisoformat(s)


#: OID → text-value decoder (PostgreSQL catalog pg_type; OIDs are stable
#: public constants documented in the protocol/manual).
_DECODERS = {
    16: _parse_bool,  # bool
    20: int,  # int8
    21: int,  # int2
    23: int,  # int4
    26: int,  # oid
    700: float,  # float4
    701: float,  # float8
    1700: Decimal,  # numeric
    1082: dt.date.fromisoformat,  # date
    1114: _parse_timestamp,  # timestamp
    1184: _parse_timestamp,  # timestamptz
}


def _escape_literal(v: Any) -> str:
    """Render one Python value as a PostgreSQL SQL literal (client-side
    interpolation, standard_conforming_strings assumed on — the server
    default since 9.1)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "'NaN'::float8"
        if v == float("inf"):
            return "'Infinity'::float8"
        if v == float("-inf"):
            return "'-Infinity'::float8"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return "'\\x" + bytes(v).hex() + "'::bytea"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise InterfaceError(f"cannot render {type(v).__name__} as a SQL literal")


def _interpolate(sql: str, params: Sequence[Any] | None) -> str:
    if not params:
        return sql
    parts = sql.split("%s")
    if len(parts) - 1 != len(params):
        raise InterfaceError(
            f"statement has {len(parts) - 1} %s placeholders, "
            f"got {len(params)} parameters"
        )
    out = [parts[0]]
    for part, v in zip(parts[1:], params):
        out.append(_escape_literal(v))
        out.append(part)
    return "".join(out)


class Connection:
    def __init__(self, dsn: str) -> None:
        u = urlparse(dsn)
        q = {k: vs[-1] for k, vs in parse_qs(u.query).items()}
        user = unquote(u.username or "") or "postgres"
        password = unquote(u.password or "") if u.password else None
        database = unquote(u.path.lstrip("/")) or user
        host = u.hostname or q.get("host") or "/var/run/postgresql"
        port = int(u.port or q.get("port") or 5432)
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port))
        self._buf = b""
        self._startup(user, database, password)

    # -- wire plumbing

    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(type_byte + struct.pack("!i", 4 + len(payload)) + payload)

    def _read_message(self) -> tuple[bytes, bytes]:
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise InterfaceError("server closed the connection")
            self._buf += chunk
        mtype = self._buf[0:1]
        (ln,) = struct.unpack("!i", self._buf[1:5])
        while len(self._buf) < 1 + ln:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise InterfaceError("server closed the connection")
            self._buf += chunk
        payload = self._buf[5 : 1 + ln]
        self._buf = self._buf[1 + ln :]
        return mtype, payload

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        i = 0
        while i < len(payload) and payload[i : i + 1] != b"\x00":
            code = chr(payload[i])
            end = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1 : end].decode("utf-8", "replace")
            i = end + 1
        return fields

    def _startup(self, user: str, database: str, password: str | None) -> None:
        params = (
            f"user\x00{user}\x00database\x00{database}\x00"
            "client_encoding\x00UTF8\x00\x00"
        ).encode()
        self._sock.sendall(struct.pack("!ii", 8 + len(params), _PROTOCOL_V3) + params)
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code == 0:
                    continue  # AuthenticationOk
                if code == 3:  # cleartext password
                    if password is None:
                        raise InterfaceError("server requires a password")
                    self._send(b"p", password.encode() + b"\x00")
                    continue
                raise InterfaceError(
                    f"unsupported authentication method {code} (this "
                    "minimal driver speaks trust/cleartext only — install "
                    "a full driver for MD5/SCRAM servers)"
                )
            if mtype == b"E":
                raise DatabaseError(self._error_fields(payload).get("M", "startup failed"))
            if mtype == b"Z":
                return  # ReadyForQuery
            # ParameterStatus (S), BackendKeyData (K), NoticeResponse (N)

    def _simple_query(self, sql: str):
        """Run one simple-protocol Query; return (description, rows)."""
        self._send(b"Q", sql.encode() + b"\x00")
        description = None
        oids: list[int] = []
        rows: list[tuple] = []
        error: dict[str, str] | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":  # RowDescription
                (nfields,) = struct.unpack("!h", payload[:2])
                i = 2
                description, oids = [], []
                for _ in range(nfields):
                    end = payload.index(b"\x00", i)
                    name = payload[i:end].decode()
                    i = end + 1
                    _tbl, _att, oid, _len, _mod, _fmt = struct.unpack(
                        "!ihihih", payload[i : i + 18]
                    )
                    i += 18
                    oids.append(oid)
                    description.append((name, oid, None, None, None, None, None))
            elif mtype == b"D":  # DataRow (text format)
                (ncols,) = struct.unpack("!h", payload[:2])
                i = 2
                vals: list[Any] = []
                for c in range(ncols):
                    (vlen,) = struct.unpack("!i", payload[i : i + 4])
                    i += 4
                    if vlen == -1:
                        vals.append(None)
                        continue
                    text = payload[i : i + vlen].decode("utf-8", "replace")
                    i += vlen
                    decoder = _DECODERS.get(oids[c])
                    vals.append(decoder(text) if decoder else text)
                rows.append(tuple(vals))
            elif mtype == b"E":
                error = self._error_fields(payload)
            elif mtype == b"Z":  # ReadyForQuery — end of cycle, always sent
                if error is not None:
                    raise DatabaseError(
                        f"{error.get('S', 'ERROR')}: {error.get('M', '?')}"
                    )
                return description, rows
            # else: CommandComplete (C), EmptyQueryResponse (I),
            # NoticeResponse (N), ParameterStatus (S) — consumed

    # -- DB-API surface

    def cursor(self) -> "Cursor":
        return Cursor(self)

    def commit(self) -> None:
        """No-op: simple-protocol statements outside an explicit BEGIN are
        each their own transaction (protocol-level autocommit)."""

    def rollback(self) -> None:
        self._simple_query("ROLLBACK")

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()


class Cursor:
    def __init__(self, connection: Connection) -> None:
        self.connection = connection
        self.description = None
        self.rowcount = -1
        self._rows: list[tuple] = []
        self._pos = 0

    def execute(self, sql: str, params: Sequence[Any] | None = None) -> "Cursor":
        desc, rows = self.connection._simple_query(_interpolate(sql, params))
        self.description = desc
        self._rows = rows
        self._pos = 0
        self.rowcount = len(rows) if desc is not None else -1
        return self

    def executemany(self, sql: str, seq_of_params) -> "Cursor":
        """One round trip: every interpolated statement ships in a single
        simple-protocol Query (semicolon-joined), which PostgreSQL runs as
        ONE implicit transaction — same all-or-nothing behavior the other
        backends get from their multi-row INSERT."""
        stmts = [_interpolate(sql, p) for p in seq_of_params]
        if stmts:
            self.connection._simple_query(";".join(stmts))
        self.description = None
        self._rows, self._pos, self.rowcount = [], 0, -1
        return self

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchall(self) -> list[tuple]:
        rows = self._rows[self._pos :]
        self._pos = len(self._rows)
        return rows

    def close(self) -> None:
        self._rows = []


def connect(dsn: str, **_ignored: Any) -> Connection:
    """DB-API entry point: ``connect("postgresql://user@/db?host=/sock")``."""
    return Connection(dsn)
