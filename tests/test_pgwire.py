"""Unit + server tests for the minimal PostgreSQL wire driver.

The integration surface (DDL, executemany, information_schema,
reconnect/migration) runs in test_metastore.py's ``pgwire`` backend leg;
this file pins the driver's own contracts: literal escaping, placeholder
arithmetic, typed text-mode decoding, and error-then-resync behavior on
one connection.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from lakeshack_spark import pgwire
from lakeshack_spark.pgwire import (
    DatabaseError,
    InterfaceError,
    _escape_literal,
    _interpolate,
)


def test_escape_literal_matrix():
    assert _escape_literal(None) == "NULL"
    assert _escape_literal(True) == "TRUE" and _escape_literal(False) == "FALSE"
    assert _escape_literal(42) == "42"
    assert _escape_literal(-1.5) == "-1.5"
    assert _escape_literal(float("nan")) == "'NaN'::float8"
    assert _escape_literal(float("inf")) == "'Infinity'::float8"
    assert _escape_literal(float("-inf")) == "'-Infinity'::float8"
    assert _escape_literal("it's") == "'it''s'"
    assert _escape_literal("back\\slash") == "'back\\slash'"  # std strings
    assert (
        _escape_literal(dt.datetime(2021, 8, 1, 12, 30, 15, 123456))
        == "TIMESTAMP '2021-08-01 12:30:15.123456'"
    )
    assert _escape_literal(dt.date(2021, 8, 1)) == "DATE '2021-08-01'"
    assert _escape_literal(b"\x00\xff") == "'\\x00ff'::bytea"
    assert _escape_literal(Decimal("12.340")) == "12.340"
    with pytest.raises(InterfaceError):
        _escape_literal(object())


def test_interpolate_placeholder_arithmetic():
    assert _interpolate("SELECT 1", None) == "SELECT 1"
    assert (
        _interpolate("SELECT %s, %s", (1, "a'b")) == "SELECT 1, 'a''b'"
    )
    with pytest.raises(InterfaceError):
        _interpolate("SELECT %s", (1, 2))
    with pytest.raises(InterfaceError):
        _interpolate("SELECT %s, %s", (1,))


def test_bool_is_escaped_before_int():
    """bool is an int subclass — must render TRUE/FALSE, not 1/0, so a
    BOOLEAN column insert round-trips."""
    assert _interpolate("%s", (True,)) == "TRUE"


@pytest.fixture()
def pg_con(pg_server):
    con = pgwire.connect(f"postgresql://lakeshack@/postgres?host={pg_server}")
    yield con
    con.close()


def test_typed_text_mode_decoding(pg_con):
    cur = pg_con.cursor()
    cur.execute(
        "SELECT 1::int2 AS a, 2::int4 AS b, 3::int8 AS c, 4.5::float4 AS d, "
        "6.5::float8 AS e, 7.25::numeric AS f, TRUE AS g, 'x'::text AS h, "
        "DATE '2021-08-01' AS i, TIMESTAMP '2021-08-01 12:30:15.5' AS j, "
        "NULL::bigint AS k"
    )
    (row,) = cur.fetchall()
    assert row == (
        1, 2, 3, 4.5, 6.5, Decimal("7.25"), True, "x",
        dt.date(2021, 8, 1), dt.datetime(2021, 8, 1, 12, 30, 15, 500000), None,
    )
    assert [d[0] for d in cur.description] == list("abcdefghijk")


def test_timestamptz_decodes_offset(pg_con):
    cur = pg_con.cursor()
    cur.execute("SET TIME ZONE 'UTC'")
    cur.execute("SELECT TIMESTAMPTZ '2021-08-01 12:30:15+00' AS ts")
    (row,) = cur.fetchall()
    assert row == (dt.datetime(2021, 8, 1, 12, 30, 15),)


def test_error_then_resync_on_same_connection(pg_con):
    cur = pg_con.cursor()
    with pytest.raises(DatabaseError, match="syntax error"):
        cur.execute("SELECT definitely not sql !")
    cur.execute("SELECT 42 AS ok")  # connection stays usable
    assert cur.fetchall() == [(42,)]


def test_executemany_is_one_transaction(pg_con):
    """Semicolon-joined executemany runs as one implicit transaction: a
    failing row rolls back every row of the batch."""
    cur = pg_con.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS atomic_t (a BIGINT PRIMARY KEY)")
    cur.execute("DELETE FROM atomic_t")
    with pytest.raises(DatabaseError):
        cur.executemany(
            "INSERT INTO atomic_t (a) VALUES (%s)", [(1,), (2,), (1,)]
        )  # duplicate key on the 3rd
    cur.execute("SELECT count(*) FROM atomic_t")
    assert cur.fetchall() == [(0,)]
    cur.execute("DROP TABLE atomic_t")


def test_missing_database_raises(pg_server):
    with pytest.raises(DatabaseError, match="does not exist"):
        pgwire.connect(f"postgresql://lakeshack@/no_such_db?host={pg_server}")
