"""Grouped second-moment statistics (covariance / correlation / OLS
slope) with cross-engine exact determinism.

The reference has no statistics surface at all (its docs punt aggregation
to pandas, docs/source/lakeshack.rst:426-428); Spark has `F.covar_pop` /
`F.corr`, but those accumulate floating-point moments whose value depends
on partitioning — useless under a value-hash gate and quietly
non-reproducible between runs at scale. This module computes the five
raw moments (Σx, Σy, Σx², Σy², Σxy) in EXACT int64 over caller-scaled
integer inputs, then derives

- ``cov_num  = n·Σxy − Σx·Σy``            (= n² · covariance, exact int)
- ``varx_num = n·Σx² − (Σx)²``            (= n² · variance of x, exact int)
- ``vary_num = n·Σy² − (Σy)²``
- ``corr2    = cov_num² / (varx_num · vary_num)``  (double)
- ``slope    = cov_num / varx_num``                 (double, the OLS slope
  of y on x — the built-in JVM twin of the grouped pandas-UDF OLS entry)

Exactness recipe (the BM25/KS cross-engine discipline): every integer is
exact while ``n·Σxy`` etc. stay below 2^63; each derived double is a
fixed chain of SINGLE IEEE operations on values converted from int64 by
one correctly-rounded conversion (Java long→double and C++
int64→double both round to nearest), so Spark and an ANSI oracle agree
bit-for-bit — provided the oracle also converts straight from int64
(DuckDB: ``CAST(CAST(SUM(..) AS BIGINT) AS DOUBLE)`` — HUGEINT→DOUBLE is
a two-limb conversion that can double-round). ``corr2`` is the SQUARED
Pearson correlation (= R² of the simple regression): sqrt is a libm call
with no cross-library bit guarantee, so the gate ships r²; callers
wanting r use ``signed_corr`` (unit-tested, production path).

Scale shape: one hash aggregate with map-side partial combine — the five
moments are classic partial aggregates, so the shuffle carries one row
per (partition, group) whatever the data size. No window, no second
pass, no driver collect.

Domain bounds (documented, caller-checked): with |x| ≤ X, |y| ≤ Y and n
rows per group, exactness needs n·X·Y < 2^63 (int64) and the derived
numerators below 2^63; numerators above 2^53 remain EXACT as integers
(and hash-gateable) while their double images round — identically in
both engines, so derived doubles stay bit-equal regardless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def grouped_linear_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    by: str,
) -> DataFrame:
    """Per-``by``-group exact moment statistics of integer expressions
    ``x`` and ``y`` (caller scales/rounds to ints — e.g. cents, basis
    points): ``(by, n_rows, cov_num, varx_num, vary_num, corr2, slope)``.

    ``corr2``/``slope`` are NULL for degenerate groups (zero variance),
    computed with the identical CASE both engines evaluate.
    """
    xx = x.cast("long")
    yy = y.cast("long")
    base = df.select(F.col(by), xx.alias("__x"), yy.alias("__y"))
    mom = base.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("__n")
    cov_num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).alias(
        "cov_num"
    )
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov_d = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    corr2 = F.when(
        (varx > 0) & (vary > 0),
        (cov_d * cov_d) / (varx.cast("double") * vary.cast("double")),
    ).alias("corr2")
    slope = F.when(varx > 0, cov_d / varx.cast("double")).alias("slope")
    return mom.select(
        by,
        n.alias("n_rows"),
        cov_num,
        varx.alias("varx_num"),
        vary.alias("vary_num"),
        corr2,
        slope,
    )


def signed_corr(stats_df: DataFrame) -> DataFrame:
    """Production convenience over :func:`grouped_linear_stats` output:
    adds ``corr = sign(cov_num) · sqrt(corr2)`` (libm sqrt — correct and
    unit-tested, but NOT cross-engine bit-guaranteed, hence outside the
    hash gate)."""
    return stats_df.withColumn(
        "corr", F.signum(F.col("cov_num").cast("double")) * F.sqrt("corr2")
    )
