"""As-of join decade-up stress: planted grid matches at 1M and 10M left
rows, every match CLOSED-FORM exact.

The as-of join (operators.relational.asof_join) is the one relational
operator whose intermediate blows past its inputs: the equi-join on the
key keeps every right row at-or-before each left row (avg R/2 matches
per left row) before max_by collapses the group — the 100 TB question
is whether the map-side partial combine really keeps the SHUFFLE at
|left| rows while the join intermediate is |left|·R/2. This tool plants
a closed-form instance and measures exactly that shape:

- right side: K keys × R grid quotes per key at times g·S, value
  key·1000003 + g (derivable from the key and grid slot alone);
- left side: N probes, key = id mod K, time t = (id·2654435761) mod
  (R·S) — a deterministic scatter covering the grid range, no RNG;
- backward as-of truth for EVERY left row: grid slot g* = t div S, so
  matched value MUST equal key·1000003 + (t div S) and matched time
  (t div S)·S — asserted as one distributed count of mismatches (zero
  collect of data rows).

Sizes default to 1M and 10M left rows against 10k keys × 100 quotes
(1M right rows; ~50 right matches per left row on average, i.e. a
~500M-row join intermediate at the 10M point). Usage:

    python tools/stress_asof.py [left_sizes_csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeshack_spark.operators.relational import asof_join
from lakeshack_spark.session import get_spark

K_KEYS = 10_000
R_QUOTES = 100
STEP = 1_000
VAL_MULT = 1_000_003
SCATTER = 2_654_435_761  # Knuth multiplicative constant — deterministic


def build_sides(spark, n_left: int):
    par = spark.sparkContext.defaultParallelism
    t_range = R_QUOTES * STEP
    left = (
        spark.range(n_left, numPartitions=par)
        .select(
            F.col("id"),
            (F.col("id") % K_KEYS).alias("key"),
            ((F.col("id") * SCATTER) % t_range).alias("t"),
        )
    )
    right = (
        spark.range(K_KEYS * R_QUOTES, numPartitions=par)
        .select(
            (F.col("id") % K_KEYS).alias("key"),
            F.expr(f"(id div {K_KEYS}) * {STEP}").alias("rt"),
            F.expr(
                f"(id % {K_KEYS}) * {VAL_MULT} + (id div {K_KEYS})"
            ).alias("quote"),
        )
    )
    return left, right


def stress_asof(spark, n_left: int, warmup: bool = False) -> None:
    left, right = build_sides(spark, n_left)
    left = left.persist()
    right = right.persist()
    n_l, n_r = left.count(), right.count()

    t0 = time.monotonic()
    out = asof_join(
        left, right, on="key", left_time="t", right_time="rt",
        left_key="id",
    ).persist()
    n_out = out.count()
    total = time.monotonic() - t0

    assert n_out == n_l, (n_out, n_l)
    # closed form: slot = t div STEP → quote = key·VAL_MULT + slot,
    # rt = slot·STEP. One distributed mismatch count; no row collect.
    bad = out.filter(
        F.expr(
            f"quote != key * {VAL_MULT} + (t div {STEP}) "
            f"or rt != (t div {STEP}) * {STEP}"
        )
    ).count()
    assert bad == 0, f"{bad} rows off the closed-form as-of match"
    avg_matches = (R_QUOTES + 1) / 2
    tag = " (warm-up, uncounted)" if warmup else ""
    print(
        f"asof_planted{tag}: left {n_l} x right {n_r} ({K_KEYS} keys, "
        f"~{avg_matches:.0f} matches/row -> ~{int(n_l * avg_matches)} "
        f"join intermediate) in {total:.2f}s; every match closed-form "
        f"exact"
    )
    out.unpersist()
    left.unpersist()
    right.unpersist()


def main() -> None:
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1000000,10000000").split(",")
        if s
    ]
    spark = get_spark(app_name="stress_asof")
    try:
        # uncounted warm-up (positional, not size-membership — the
        # stress_ivf ADVICE r10 rule)
        stress_asof(spark, 50_000, warmup=True)
        for n in sizes:
            stress_asof(spark, n)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
