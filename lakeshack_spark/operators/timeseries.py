"""Time-series regularization: calendar-spine gap filling + forward fill.

The warehouse "resample" op: per-key observations at irregular times
become a dense regular grid (one row per key per step) with missing
steps forward-filled from the last observation — what dashboards, joins
against other regular series, and training-window extraction all expect.

Scale shape: the spine is ONE `sequence` explode per key (rows = keys ×
steps, the output size — nothing quadratic), the observation join is a
(key, step) equi-join, and the forward fill is a running `last(ignore
nulls)` window per key — a single shuffle on the key, linear scan within
it. No driver-side calendar materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill(
    observations: DataFrame,
    key_col: str,
    step_col: str,
    value_col: str,
    start: int,
    end: int,
) -> DataFrame:
    """Dense per-key grid over integer steps ``[start, end]`` with
    forward fill.

    ``observations`` holds at most one row per (key, step) — pre-
    aggregate first (duplicate grid cells would make the fill value
    order-dependent). Returns one row per (key, step) in the range:
    ``value`` = the observation at that step or the latest earlier one
    (NULL before a key's first observation — leading gaps are honest,
    not zero), and ``is_gap`` marking filled rows. Observations outside
    the range are excluded from the grid AND from the fill source, so
    the result is self-contained (reproducible from the window alone).
    Deterministic: the fill scans (key, step) order with unique steps.
    """
    if start > end:
        # F.sequence counts DOWN on an inverted range (CLAUDE.md) — the
        # caller would get a dense all-NULL grid for an empty interval.
        raise ValueError(f"gap_fill: start ({start}) > end ({end})")
    keys = observations.select(F.col(key_col).alias("__k")).distinct()
    spine = keys.select(
        "__k",
        F.explode(
            F.sequence(F.lit(start), F.lit(end))
        ).alias("__t"),
    )
    obs = observations.select(
        F.col(key_col).alias("__k"),
        F.col(step_col).alias("__t"),
        F.col(value_col).alias("__v"),
    ).filter((F.col("__t") >= start) & (F.col("__t") <= end))
    w = (
        Window.partitionBy("__k")
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(obs, ["__k", "__t"], "left")
    return joined.select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(step_col),
        F.last("__v", ignorenulls=True).over(w).alias("value"),
        F.col("__v").isNull().alias("is_gap"),
    )


def interpolate_fill(
    observations: DataFrame,
    key_col: str,
    step_col: str,
    value_col: str,
    start: int,
    end: int,
) -> DataFrame:
    """Dense per-key grid over ``[start, end]`` with LINEAR interpolation
    between the surrounding observations — :func:`gap_fill`'s
    step-function sibling for quantities that trend between samples
    (sensor readings, balances, rates).

    For a gap step ``t`` between observations ``(t0, v0)`` and
    ``(t1, v1)``: ``value = (v0·(t1−t) + v1·(t−t0)) / (t1−t0)`` —
    integer inputs make the numerator/denominator exact int64 and the
    single division a correctly-rounded IEEE op, so the interpolated
    doubles are bit-reproducible cross-engine (the repo's one-division
    recipe). Leading/trailing gaps (no observation on one side) stay
    NULL — linear interpolation with one anchor would be extrapolation.
    Observation rows return their value exactly via a direct cast, not
    the division. Same range-exclusion and uniqueness contract as
    :func:`gap_fill`; one spine join + two windows, no driver round
    trip.
    """
    if start > end:
        raise ValueError(f"interpolate_fill: start ({start}) > end ({end})")
    keys = observations.select(F.col(key_col).alias("__k")).distinct()
    spine = keys.select(
        "__k",
        F.explode(F.sequence(F.lit(start), F.lit(end))).alias("__t"),
    )
    obs = observations.select(
        F.col(key_col).alias("__k"),
        F.col(step_col).alias("__t"),
        F.col(value_col).alias("__v"),
    ).filter((F.col("__t") >= start) & (F.col("__t") <= end))
    joined = spine.join(obs, ["__k", "__t"], "left")
    w_prev = (
        Window.partitionBy("__k")
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("__k")
        .orderBy("__t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    has = F.col("__v").isNotNull()
    t = F.col("__t").cast("long")
    t0 = F.last(F.when(has, t), ignorenulls=True).over(w_prev)
    v0 = F.last("__v", ignorenulls=True).over(w_prev).cast("long")
    t1 = F.first(F.when(has, t), ignorenulls=True).over(w_next)
    v1 = F.first("__v", ignorenulls=True).over(w_next).cast("long")
    interp = (
        (v0 * (t1 - t) + v1 * (t - t0)).cast("double")
        / (t1 - t0).cast("double")
    )
    value = (
        F.when(has, F.col("__v").cast("double"))
        .when(t0.isNotNull() & t1.isNotNull(), interp)
        .otherwise(F.lit(None).cast("double"))
    )
    return joined.select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(step_col),
        value.alias("value"),
        (~has).alias("is_gap"),
    )


# ---------------------------------------------------------------------
# Continuous aggregates: materialized bucket rollups that merge upward
# ---------------------------------------------------------------------


def bucket_rollup(
    events: DataFrame,
    bucket_width: int,
    time_col: str = "ts",
    group_cols: tuple[str, ...] = (),
    value_col: str = "value",
    scale: int = 8,
) -> DataFrame:
    """The finest layer of a continuous aggregate (TimescaleDB's
    "continuous aggregate" / warehouse rollup-table pattern): per
    (bucket, groups) row count + SCALED-INTEGER value sum, where
    ``bucket = time_col div bucket_width`` in the time column's integer
    domain (ns for the canonical events ``ts``).

    The sum is kept as the ``functions.deterministic`` integer partial —
    NOT divided back to double — precisely so coarser layers merge by
    exact integer addition (:func:`rollup_merge`) and finalize once.
    A cascade hourly→daily→monthly is then bit-identical to aggregating
    the raw stream at any layer, which is what makes serving queries
    from the materialization safe. Scale shape: one groupBy with
    map-side combine; the materialized layer is O(buckets × groups),
    data-size-independent, and refreshing a late bucket is an O(batch)
    upsert (see diff.incremental_agg_maintain for the delta path).
    """
    return (
        events.withColumn("bucket", F.expr(f"{time_col} div {bucket_width}"))
        .groupBy("bucket", *group_cols)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.expr(f"CAST(ROUND(({value_col}) * 1e{scale}) AS BIGINT)")
            ).alias("sum_scaled"),
        )
    )


def rollup_merge(
    layer: DataFrame,
    factor: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A coarser continuous-aggregate layer from a finer one — merges
    the finer buckets' partials (exact integer addition; counts and
    scaled sums are both associative) WITHOUT re-reading raw data. A
    daily layer from hourly costs O(hourly rows), not O(events)."""
    return (
        layer.withColumn("bucket", F.expr(f"bucket div {factor}"))
        .groupBy("bucket", *group_cols)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_scaled").alias("sum_scaled"),
        )
    )


def rollup_finalize(layer: DataFrame, scale: int = 8) -> DataFrame:
    """Serve a layer: one division converts the exact integer partial to
    the double the direct aggregate would have produced."""
    return layer.withColumn(
        "sum_value",
        F.expr(f"CAST(sum_scaled AS DOUBLE) / 1e{scale}"),
    ).drop("sum_scaled")
