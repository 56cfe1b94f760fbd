"""Deterministic aggregate helpers.

Floating-point SUM/AVG depend on accumulation order, which differs across
engines (and across Spark task schedules). For cross-engine-exact results
(the DuckDB oracle hash-matches us cell-for-cell) — and for run-to-run
reproducibility on a real cluster — we sum in *integer* space: scale each
addend by 10^s, round to the nearest integer (a deterministic per-value
operation on the same IEEE double in every engine), add exactly as BIGINT,
and divide back once at the end.

Correctness contract:

- ``scale`` must be ≥ the true decimal width of the addend, so the
  round-to-integer is exact (our TPC-H-ish money columns are 2-decimal;
  products of three of them are exact at s=6). With insufficient scale the
  two engines' rounding modes could disagree on boundary values.
- Keep ``total × 10^s < 9e15`` (2^53): beyond that the final
  BIGINT→DOUBLE conversion is no longer exact and engines may differ by
  1 ulp. At s=6 that allows totals to ~9e9 — rescale s down for larger
  totals.

Why integer and not decimal: Spark's compact DECIMAL(18,s) aggregation
measures ~2.5× slower than native long sums in whole-stage codegen, with
identical exactness under the contract above. (An earlier decimal-based
revision of this module documents the same 2^53 trap.)

Partial aggregation (map-side combine) applies as usual — integer addition
is associative.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _sum_sql(expr: str, scale: int) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * 1e{scale}) AS BIGINT)) AS DOUBLE)"
        f" / 1e{scale}"
    )


def dsum(expr: str, scale: int = 6) -> Column:
    """Order-insensitive exact SUM of a double expression via the scaled-
    integer domain."""
    return F.expr(_sum_sql(expr, scale))


def davg(expr: str, scale: int = 6) -> Column:
    """Deterministic AVG: exact scaled-integer sum / count, divided in
    double."""
    return F.expr(f"({_sum_sql(expr, scale)}) / COUNT({expr})")


def oracle_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB-side text equivalent of :func:`dsum` (same SQL)."""
    return _sum_sql(expr, scale)


def oracle_davg(expr: str, scale: int = 6) -> str:
    """DuckDB-side text equivalent of :func:`davg` (same SQL)."""
    return f"({_sum_sql(expr, scale)}) / COUNT({expr})"
