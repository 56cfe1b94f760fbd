"""Self-check harness mirroring the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, then compare row count, column names, and exact cell
values (order-insensitive).

Usage: python tools/selfcheck.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-columns, sorted-rows canonical form for comparison.

    Mirrors the driver's canonicalizer: complex (array/struct/map) cells
    are NOT tolerated — ``complex_columns`` must be checked first so such
    queries fail here before they crash the driver."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        order = df.sort_values(by=list(df.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    return df


def complex_columns(schema) -> list[str]:
    """Names of output columns whose Spark type is array/struct/map.

    The driver's canonicalizer crashes on such cells (unhashable
    numpy.ndarray), so any query emitting one must fail the local gate
    even when it is a rows-only (no-oracle) entry."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
    ]


def dtype_class(dtype) -> str:
    """Coarse dtype class used by the driver-mirror strictness check.

    The driver's order-insensitive value-hash is dtype-sensitive: a
    DuckDB ``SUM(BIGINT)`` comes back HUGEINT → pandas float64 while the
    Spark twin is int64, and even though every cell compares equal the
    driver hashes them differently (VERDICT_r6 #1: time_travel /
    orc_roundtrip / schema_evolution went red on exactly this). Classes
    are {bool, int, float, other} — temporal/string/decimal all map to
    "other" since the known driver-hash skew is numeric-kind only."""
    from pandas.api import types as pt

    if pt.is_bool_dtype(dtype):
        return "bool"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    return "other"


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: {len(a)} vs {len(b)}"
    ca, cb = canon(a), canon(b)
    if len(ca):
        for col in ca.columns:
            da, db = dtype_class(ca[col].dtype), dtype_class(cb[col].dtype)
            if da != db and not (ca[col].isna().all() and cb[col].isna().all()):
                return False, (
                    f"col {col}: dtype-class skew spark={ca[col].dtype}({da}) "
                    f"oracle={cb[col].dtype}({db}) — driver value-hash is "
                    "dtype-sensitive (cast the oracle aggregate, e.g. "
                    "CAST(SUM(...) AS BIGINT))"
                )
    for col in ca.columns:
        va, vb = ca[col].tolist(), cb[col].tolist()
        for i, (x, y) in enumerate(zip(va, vb)):
            if not cells_equal(x, y):
                return False, f"col {col} row {i}: spark={x!r} oracle={y!r}"
    return True, ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from lakeshack_spark.session import get_spark
    from lakeshack_spark.sources.catalog import TABLE_NAMES

    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_ok = n_bad = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            frame = fn(spark, args.sf)
            bad_cols = complex_columns(frame.schema)
            if bad_cols:
                print(
                    f"FAIL  {name}: complex-typed output columns {bad_cols} "
                    "(driver canonicalizer rejects array/struct/map cells "
                    "— output scalars)"
                )
                n_bad += 1
                continue
            sdf = frame.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            n_bad += 1
            continue
        ok, why = frames_equal(sdf, odf)
        if ok:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_ok += 1
        else:
            print(f"FAIL  {name}: {why}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_weak} rows-only, {n_bad} FAILED")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
