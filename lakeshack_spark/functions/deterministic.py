"""Deterministic aggregate helpers.

Floating-point SUM/AVG depend on accumulation order, which differs across
engines (and across Spark task schedules). For cross-engine-exact results
(the DuckDB oracle hash-matches us cell-for-cell) — and for run-to-run
reproducibility on a real cluster — we sum in *decimal* space: cast each
addend to DECIMAL(38, s) (a deterministic per-value rounding of the same
IEEE double in every engine), add exactly, and convert the exact total back
to double once at the end.

Choosing the scale ``s`` matters twice:

- Per-row cast: pick ``s`` ≥ the true decimal width of the addend so the
  cast is *exact* in every engine (rounding modes differ: Spark rounds
  HALF_UP, DuckDB truncates decimal rescales). TPC-H-ish money columns are
  2-decimal, so products of three of them are exact at s=6.
- Final decimal→double: engines convert ``unscaled_int / 10^s``; once the
  unscaled total exceeds 2^53 the conversion is no longer exact-then-
  correctly-rounded everywhere (observed: DuckDB 1 ulp off Java's
  BigDecimal.doubleValue). Keep ``total × 10^s < 9e15`` — at s=6 that
  allows totals up to ~9e9.

This costs one decimal conversion per row; at 100 TB it stays inside
whole-stage codegen (no Python), and partial aggregation (map-side combine)
still applies since decimal addition is associative.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _sum_sql(expr: str, scale: int) -> str:
    # DECIMAL(18,s): Spark's compact (single long) decimal representation —
    # measurably faster in codegen than DECIMAL(38,s), and 18-s integer
    # digits comfortably hold every per-row value here. The SUM accumulator
    # widens automatically (Spark: 28,s; DuckDB: 38,s) so totals stay exact.
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def dsum(expr: str, scale: int = 6) -> Column:
    """Order-insensitive exact SUM of a double expression via decimal space."""
    return F.expr(_sum_sql(expr, scale))


def davg(expr: str, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided in double."""
    return F.expr(f"{_sum_sql(expr, scale)} / COUNT({expr})")


def oracle_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB-side text equivalent of :func:`dsum` (same SQL)."""
    return _sum_sql(expr, scale)


def oracle_davg(expr: str, scale: int = 6) -> str:
    """DuckDB-side text equivalent of :func:`davg` (same SQL)."""
    return f"{_sum_sql(expr, scale)} / COUNT({expr})"
