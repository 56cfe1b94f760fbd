"""Declarative data-quality expectations — the Deequ/Great-Expectations
capability as ONE aggregation pass.

A training-data pipeline gates every ingest on table-level invariants
(keys unique, values in range, nulls bounded, categories closed). The
naive formulation runs one job per constraint; at 100 TB that is N full
scans. Here every constraint compiles to an aggregate expression and the
whole suite evaluates in a single ``df.agg(...)`` — one scan, one
(tiny, map-side-combined) reduction, regardless of how many constraints.

Results come back as one row per constraint ``(constraint, passed,
observed)`` so the suite's outcome is itself a queryable DataFrame (and
oracle-checkable: every metric is exact counting/min/max arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def robust_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 4.4478,
) -> DataFrame:
    """Per-group robust dispersion and outlier counts: median, MAD
    (median absolute deviation), and the count of values farther than
    ``k · MAD`` from the median — the outlier rule that, unlike
    mean/stddev z-scores, is not itself dragged by the outliers
    (k = 4.4478 ≈ 3σ × the 1.4826 normal-consistency factor).

    Output: ``(group_col, n, med, mad, n_outliers)``.

    Cross-engine exactness: feed an INTEGER-valued numeric column (e.g.
    prices in cents). Median interpolation between two integers is exact
    half-integer IEEE arithmetic, deviations are exact multiples of 0.5,
    and the MAD interpolates exact quarters — so every engine computing
    either ``(a+b)/2`` or ``a+(b-a)/2`` lands on the identical double,
    and only the final ``k·mad`` comparison multiplies a rounded value
    (same single op both sides). The outlier count is then exact.

    Scale shape: three passes over the (group, value) projection — exact
    per-group percentiles (sorted-group memory on the reducer), then two
    joins against per-group 1-row frames AQE broadcasts when small. At
    extreme group sizes swap ``F.percentile`` for ``percentile_approx``
    and keep the same plan shape.
    """
    g = F.col(group_col)
    v = df.select(g, F.col(value_col).cast("double").alias("__x"))
    med = v.groupBy(group_col).agg(F.percentile("__x", 0.5).alias("med"))
    j1 = v.join(med, group_col)
    dev = F.abs(F.col("__x") - F.col("med"))
    mad = (
        j1.select(g, dev.alias("__d"))
        .groupBy(group_col)
        .agg(F.percentile("__d", 0.5).alias("mad"))
    )
    j2 = j1.join(mad, group_col)
    return j2.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.sum((dev > F.lit(k) * F.col("mad")).cast("long")).alias("n_outliers"),
    )


class expect:
    """Constraint constructors. Each returns ``(name, metric_col,
    pass_col_builder)`` where the metric is an aggregate expression and
    the pass predicate is evaluated on the metric's value."""

    @staticmethod
    def not_null(col: str):
        m = F.sum(F.col(col).isNull().cast("long"))
        return (f"not_null({col})", m, lambda v: v == 0)

    @staticmethod
    def unique(col: str):
        m = F.count(F.col(col)) - F.count_distinct(F.col(col))
        return (f"unique({col})", m, lambda v: v == 0)

    @staticmethod
    def non_negative(col: str):
        m = F.sum((F.col(col) < 0).cast("long"))
        return (f"non_negative({col})", m, lambda v: v == 0)

    @staticmethod
    def between(col: str, lo, hi):
        m = F.sum((~F.col(col).between(F.lit(lo), F.lit(hi))).cast("long"))
        return (f"between({col},{lo},{hi})", m, lambda v: v == 0)

    @staticmethod
    def isin(col: str, values):
        vals = sorted(values)
        m = F.sum((~F.col(col).isin(vals)).cast("long"))
        return (f"isin({col},{','.join(str(v) for v in vals)})", m, lambda v: v == 0)

    @staticmethod
    def max_null_fraction(col: str, frac: float):
        m = F.sum(F.col(col).isNull().cast("long"))
        n = F.count(F.lit(1))
        return (
            f"max_null_fraction({col},{frac})",
            m,
            lambda v, total: v <= total * frac,
            n,
        )

    @staticmethod
    def min_rows(n: int):
        m = F.count(F.lit(1))
        return (f"min_rows({n})", m, lambda v: v >= n)


def check_expectations(df: DataFrame, constraints: list) -> DataFrame:
    """Evaluate ``constraints`` (tuples from :class:`expect`) in ONE
    aggregation over ``df``. Returns ``(constraint, passed, observed)``
    — one row per constraint, ``observed`` the violating count (or row
    count for ``min_rows``), all exact integers.

    The single ``agg`` means one scan + one partial/final reduction for
    the whole suite; Catalyst prunes the read schema to exactly the
    referenced columns (everything else about the table is never
    deserialized)."""
    metric_cols = []
    needs_total = any(len(c) == 4 for c in constraints)
    for i, c in enumerate(constraints):
        metric_cols.append(c[1].cast("long").alias(f"__m{i}"))
    if needs_total:
        metric_cols.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*metric_cols)

    out_structs = []
    for i, c in enumerate(constraints):
        name, _, pred = c[0], c[1], c[2]
        # SUM over zero rows is NULL, which would make passed NULL
        # instead of a verdict — an empty table must still produce
        # booleans (not_null trivially passes, min_rows fails).
        v = F.coalesce(F.col(f"__m{i}"), F.lit(0))
        passed = pred(v, F.col("__n")) if len(c) == 4 else pred(v)
        out_structs.append(
            F.struct(
                F.lit(name).alias("constraint"),
                passed.alias("passed"),
                v.alias("observed"),
            )
        )
    return row.select(
        F.explode(F.array(*out_structs)).alias("r")
    ).select("r.constraint", "r.passed", "r.observed")
