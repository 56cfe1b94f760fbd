"""Skew mitigation: explicit salting for aggregations and joins.

AQE (`spark.sql.adaptive.skewJoin`) already splits skewed *join* partitions
at runtime — that is the first line of defense and is enabled by the
session factory. These helpers cover the cases AQE does not: skewed
aggregation keys (one giant group serializes into one task) and broadcast-
averse skewed joins on engines/configs without AQE.

Both are exact rewrites for decomposable aggregates: COUNT/SUM/MIN/MAX
split across salt buckets and recombine losslessly (decimal sums stay
exact because decimal addition is associative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_col(df: DataFrame, salt_buckets: int, salt_cols: list[str] | None) -> Column:
    """Salt in [0, salt_buckets).

    With ``salt_cols``: hash-mod over those columns — fully deterministic
    per row content. Without: round-robin on ``monotonically_increasing_id``
    — the default, because content-hashing EVERY column collapses when a
    hot key's rows are byte-identical (the classic skew case: the salt
    would put all of them back into one bucket, silently disabling the
    mitigation). The id-based salt spreads identical rows perfectly; it
    depends on physical partitioning, which is safe here because the salt
    never reaches results — every consumer re-aggregates or drops it, so
    query output is identical for ANY salt assignment (that invariance,
    not salt stability, is what the repo's no-RNG rule protects; task
    retries re-derive the id deterministically within a partition, unlike
    rand())."""
    if salt_cols is not None:
        from lakeshack_spark.operators.dedup import _h64

        return F.pmod(
            _h64(F.concat_ws("\x1f", *[F.col(c) for c in salt_cols])),
            F.lit(salt_buckets),
        ).cast("int")
    return (F.monotonically_increasing_id() % salt_buckets).cast("int")


def salted_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """COUNT(*) per key, resistant to a single key dominating the data:
    phase 1 groups by (keys, salt) — splitting a hot key across
    ``salt_buckets`` tasks — phase 2 sums the partials per key."""
    salted = df.withColumn("__salt", _salt_col(df, salt_buckets, salt_cols))
    partial = salted.groupBy(*keys, "__salt").agg(F.count("*").alias("__n"))
    return partial.groupBy(*keys).agg(F.sum("__n").alias("n"))


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_expr: str,
    scale: int = 6,
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic decimal SUM per key with salting; exact regardless of
    how rows land in buckets (decimal addition is associative)."""
    salted = df.withColumn("__salt", _salt_col(df, salt_buckets, salt_cols))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.expr(f"SUM(CAST(({value_expr}) AS DECIMAL(18,{scale})))").alias("__s")
    )
    return partial.groupBy(*keys).agg(
        F.expr("CAST(SUM(__s) AS DOUBLE)").alias("total")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join with a skewed left key distribution: salt the left
    side, replicate each right row into every bucket, join on
    (key, salt). Right side grows ×salt_buckets — use only when the right
    side is small-ish but above the broadcast threshold and AQE is
    unavailable; otherwise prefer broadcast() or AQE skew-join."""
    l = left.withColumn("__salt", _salt_col(left, salt_buckets, salt_cols))
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return l.join(r, [key, "__salt"]).drop("__salt")
