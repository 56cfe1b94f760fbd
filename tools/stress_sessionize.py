"""Sessionization decade-up stress: planted gap structure at 1M and 10M
events, the session id of EVERY row closed-form exact.

Sessionize is the windowed-analytics family's representative shape: one
shuffle on the user key, then lag + running sum inside each user
partition. The 100 TB question is per-key window cost across MANY keys
(the parallel regime — unlike stress_topk's one-reducer hazard, which
is the other window regime and has its own tool). This tool plants:

- U users × E events per user, event j of user u at time
  t = j·10 + (j div B)·1000 — within a B-event block consecutive deltas
  are 10; at each block boundary the delta is 1010;
- gap threshold 500 ⇒ a session break exactly at every block boundary,
  so ``session_id`` of event j MUST equal 1 + (j div B) for every one
  of the 10M rows — asserted as one distributed mismatch count (no
  driver-side rows), plus the exact distinct session count
  U·ceil(E/B).

Usage: python tools/stress_sessionize.py [sizes_csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeshack_spark.operators.relational import sessionize
from lakeshack_spark.session import get_spark

EVENTS_PER_USER = 1_000
BLOCK = 40          # events per session
GAP_THRESHOLD = 500  # time units; intra-block delta 10, boundary 1010


def build_events(spark, n_rows: int):
    """Distributed generation: id → (user, event index j, planted time)."""
    par = spark.sparkContext.defaultParallelism
    e = EVENTS_PER_USER
    return spark.range(n_rows, numPartitions=par).select(
        F.expr(f"id div {e}").alias("user_id"),
        (F.col("id") % e).alias("j"),
        F.expr(f"(id % {e}) * 10 + ((id % {e}) div {BLOCK}) * 1000").alias(
            "ts"
        ),
    )


def stress_sessionize(spark, n_rows: int, warmup: bool = False) -> None:
    events = build_events(spark, n_rows).persist()
    n = events.count()
    n_users = n // EVENTS_PER_USER
    sessions_per_user = -(-EVENTS_PER_USER // BLOCK)  # ceil

    t0 = time.monotonic()
    out = sessionize(
        events, user_col="user_id", time_col="ts", gap=GAP_THRESHOLD
    ).persist()
    n_out = out.count()
    total = time.monotonic() - t0

    assert n_out == n, (n_out, n)
    # closed form: session_id == 1 + (j div BLOCK) for EVERY row
    bad = out.filter(
        F.expr(f"session_id != 1 + (j div {BLOCK})")
    ).count()
    assert bad == 0, f"{bad} rows off the closed-form session id"
    n_sessions = (
        out.select("user_id", "session_id").distinct().count()
    )
    # A non-multiple-of-EVENTS_PER_USER size leaves a partial last user
    # with ceil(m/BLOCK) sessions of their own (ADVICE r11).
    tail = n % EVENTS_PER_USER
    expected_sessions = n_users * sessions_per_user + -(-tail // BLOCK)
    assert n_sessions == expected_sessions, (
        n_sessions, expected_sessions, n_users, sessions_per_user, tail
    )
    tag = " (warm-up, uncounted)" if warmup else ""
    print(
        f"sessionize_planted{tag}: {n} events / {n_users} users "
        f"({sessions_per_user} sessions each, {n_sessions} total) in "
        f"{total:.2f}s; every session_id closed-form exact"
    )
    out.unpersist()
    events.unpersist()


def main() -> None:
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "1000000,10000000"
        ).split(",")
        if s
    ]
    spark = get_spark(app_name="stress_sessionize")
    try:
        stress_sessionize(spark, 50_000, warmup=True)
        for n in sizes:
            stress_sessionize(spark, n)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
