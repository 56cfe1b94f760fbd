"""Relational operators Spark lacks as single calls, composed from
DataFrame primitives: as-of join and sessionization.

Both are expressed with equi-join + window (no Python), so Catalyst keeps
pushdown/codegen and AQE handles skew. For streaming sessionization see
:mod:`lakeshack_spark.streaming`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    left_key: str | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the single right row with the same key(s)
    and the greatest ``right_time <= left_time`` (backward; forward = least
    ``right_time >= left_time``). ``left_key`` is a unique left row id used
    to partition the pick-one window (defaults to all left columns);
    ``right_tiebreak`` resolves equal right times deterministically.

    Physical plan: equi-join on the key(s) + inequality filter + per-left-
    row window top-1. At scale prefer bucketing both sides on the key; for
    strongly skewed keys AQE skew-join splits the hot partitions. (A
    merge-based as-of would need a custom physical operator; the join+window
    form stays entirely in codegen and scales with the join, not n².)
    """
    keys = [on] if isinstance(on, str) else list(on)
    lt, rt = F.col(f"__l.{left_time}"), F.col(f"__r.{right_time}")
    cond = [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in keys]
    cond.append(rt <= lt if direction == "backward" else rt >= lt)
    joined = left.alias("__l").join(right.alias("__r"), cond, "left")
    order = [rt.desc() if direction == "backward" else rt.asc()]
    if right_tiebreak:
        tb = F.col(f"__r.{right_tiebreak}")
        order.append(tb.desc() if direction == "backward" else tb.asc())
    part = (
        [F.col(f"__l.{left_key}")]
        if left_key
        else [F.col(f"__l.{c}") for c in left.columns]
    )
    w = Window.partitionBy(*part).orderBy(*order)
    picked = joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    # Output: all left columns, plus right columns minus the join keys
    # (suffixed _right on residual name collisions).
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    for c in right.columns:
        if c in keys:
            continue
        alias = f"{c}_right" if c in left.columns else c
        out_cols.append(F.col(f"__r.{c}").alias(alias))
    return picked.select(*out_cols)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap: int | Column = 30 * 60,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Classic gap-based sessionization: a new session starts when the gap
    to the previous event of the same user exceeds ``gap`` (same units as
    ``time_col``; pass nanoseconds for the events table's raw ``ts``).

    Adds ``session_id`` (1-based per user). One shuffle on the user key;
    the windows reuse that partitioning.
    """
    order = [F.col(time_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(time_col)).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
