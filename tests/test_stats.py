"""Grouped exact moment statistics (operators.stats): hand-computed
truth, degenerate groups, float-path agreement, partition invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from lakeshack_spark.operators import stats


def _stats(spark, rows, parts=1):
    df = spark.createDataFrame([Row(g=g, x=x, y=y) for g, x, y in rows])
    if parts > 1:
        df = df.repartition(parts)
    return {
        r["g"]: r.asDict()
        for r in stats.grouped_linear_stats(
            df, F.col("x"), F.col("y"), by="g"
        ).collect()
    }


def test_hand_computed_small_case(spark):
    # g=a: (1,2),(2,4),(3,6) — perfect line y=2x: corr2=1, slope=2
    # g=b: (1,5),(2,5),(3,5) — zero y-variance: corr2 NULL, slope 0
    # g=c: (4,4) — single row: both variances 0 → NULL/NULL
    rows = [
        ("a", 1, 2), ("a", 2, 4), ("a", 3, 6),
        ("b", 1, 5), ("b", 2, 5), ("b", 3, 5),
        ("c", 4, 4),
    ]
    out = _stats(spark, rows)
    a = out["a"]
    # n=3 sx=6 sy=12 sxx=14 syy=56 sxy=28
    assert (a["n_rows"], a["cov_num"], a["varx_num"], a["vary_num"]) == (
        3, 3 * 28 - 72, 3 * 14 - 36, 3 * 56 - 144,
    )
    assert a["corr2"] == 1.0 and a["slope"] == 2.0
    b = out["b"]
    assert b["vary_num"] == 0 and b["cov_num"] == 0
    assert b["corr2"] is None and b["slope"] == 0.0
    c = out["c"]
    assert c["corr2"] is None and c["slope"] is None


def test_partition_invariance_exact(spark):
    """The int64 moment path is order-independent: 1 vs 16 partitions
    produce IDENTICAL rows including the derived doubles (exactly the
    property F.corr's float accumulation lacks)."""
    rows = [("g", i % 37, (i * i) % 101) for i in range(5000)]
    assert _stats(spark, rows, parts=1) == _stats(spark, rows, parts=16)


def test_matches_float_corr_and_signed_corr(spark):
    rows = [("g", i % 23, (3 * i + (i % 7)) % 50) for i in range(2000)]
    df = spark.createDataFrame([Row(g=g, x=x, y=y) for g, x, y in rows])
    got = stats.signed_corr(
        stats.grouped_linear_stats(df, F.col("x"), F.col("y"), by="g")
    ).collect()[0]
    ref = df.agg(
        F.corr("x", "y").alias("c"), F.covar_pop("x", "y").alias("cov")
    ).collect()[0]
    assert math.isclose(got["corr"], ref["c"], rel_tol=1e-9)
    n = len(rows)
    assert math.isclose(got["cov_num"] / (n * n), ref["cov"], rel_tol=1e-9)
    assert math.isclose(got["corr"] ** 2, got["corr2"], rel_tol=1e-12)


def test_negative_correlation_sign(spark):
    rows = [("g", i, 100 - 2 * i) for i in range(50)]
    df = spark.createDataFrame([Row(g=g, x=x, y=y) for g, x, y in rows])
    out = stats.signed_corr(
        stats.grouped_linear_stats(df, F.col("x"), F.col("y"), by="g")
    ).collect()[0]
    assert out["cov_num"] < 0 and out["slope"] == -2.0
    assert math.isclose(out["corr"], -1.0, rel_tol=1e-12)
