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


def hashed_distribution_drift(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n_buckets: int = 16,
) -> DataFrame:
    """Distribution-drift monitor: per ``group_col`` slice, the
    chi-square distance between the slice's hashed-token-bucket
    distribution and the WHOLE corpus's — the "did this source/shard/
    day drift from the corpus profile?" gate every continuously-fed
    training pipeline runs (the PSI/chi² monitoring shape, with fixed
    hashed buckets so the feature space never grows).

    Output: ``(group_col, n_tokens, chi2)`` with

        chi2 = Σ_b (p_gb − p_cb)² / p_cb        (b = 0..n_buckets−1)

    over buckets where the corpus share ``p_cb`` is non-zero.

    Cross-engine exactness (the repo's float recipe): bucket counts are
    exact int64 (md5-hash bucketing, one explode + conditional sums);
    each share is ONE int→double division; the chi² accumulates the
    bounded bucket list in FIXED left-to-right order (an expression
    chain, not a data-order SUM), so every IEEE operation is
    correctly-rounded identically in Spark and DuckDB and the statistic
    is bit-reproducible — gate entry ``drift_chi2_docs``.

    Scale shape: one O(total tokens) explode feeding TWO bounded
    aggregations (per-group and 1-row corpus, both map-side combined,
    n_buckets conditional sums wide), one broadcast of the 1-row corpus
    profile. No joins on token rows, no per-row Python; n_buckets is a
    plan-size constant (keep it ≤ a few hundred).
    """
    from lakeshack_spark.operators.dedup import _h64
    from lakeshack_spark.operators.text import words_col

    words = df.select(
        F.col(group_col), F.explode(words_col(text_col)).alias("term")
    )
    toks = words.select(
        F.col(group_col),
        (
            _h64(F.concat(F.lit("b:"), F.col("term"))) % F.lit(n_buckets)
        ).alias("bkt"),
    )
    cnt = [
        F.sum(F.when(F.col("bkt") == i, 1).otherwise(0))
        .cast("long")
        .alias(f"c{i}")
        for i in range(n_buckets)
    ]
    per_group = toks.groupBy(group_col).agg(
        F.count("*").alias("n_tokens"), *cnt
    )
    corpus = toks.agg(F.count("*").alias("N"), *[
        c.alias(f"t{i}") for i, c in enumerate(cnt)
    ])
    j = per_group.crossJoin(F.broadcast(corpus))
    chi2 = None
    for i in range(n_buckets):
        pg = F.col(f"c{i}").cast("double") / F.col("n_tokens").cast("double")
        pc = F.col(f"t{i}").cast("double") / F.col("N").cast("double")
        term = F.when(
            F.col(f"t{i}") > 0, (pg - pc) * (pg - pc) / pc
        ).otherwise(F.lit(0.0))
        chi2 = term if chi2 is None else chi2 + term
    return j.select(group_col, "n_tokens", chi2.alias("chi2"))
