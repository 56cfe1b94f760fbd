"""As-of join decade-up stress: planted grid matches at 1M and 10M left
rows, every match CLOSED-FORM exact.

The as-of join has two strategies (operators.relational.asof_join) and
this tool races both on the same planted truth. The join strategy's
intermediate blows past its inputs: the equi-join on the key keeps
every right row at-or-before each left row (avg R/2 matches per left
row) before max_by collapses the group, so even with the map-side
partial combine keeping the SHUFFLE at |left| rows, the |left|·R/2
intermediate scan dominates (r11 measured exponent 0.71 across the
decade). The union carry-forward strategy (default since r12) never
joins — one |L|+|R| shuffle + per-key sort + running last() — so its
cost tracks the inputs: r12 measured 1.45 s @ 1M → 2.24 s @ 10M
(exponent 0.19) vs the join form's 6.8 s → 31.7 s. This tool plants a
closed-form instance and measures exactly that shape:

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
~500M-row join intermediate at the 10M point — which only the join
strategy ever materializes; the union strategy's intermediate is the
11M-row union itself). Both strategies run per size, both asserted
against the same closed form. Usage:

    python tools/stress_asof.py [left_sizes_csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeshack_spark.operators.relational import asof_join, resolve_asof_strategy
from lakeshack_spark.session import get_spark

K_KEYS = 10_000
R_QUOTES = 100
STEP = 1_000
VAL_MULT = 1_000_003
SCATTER = 2_654_435_761  # Knuth multiplicative constant — deterministic


def build_sides(spark, n_left: int, n_keys: int = K_KEYS):
    """Planted grid over ``n_keys`` keys; ``n_keys=1`` is the hot-key
    worst case for the union strategy (EVERY row lands in one window
    group — the caveat asof_join's docstring documents: a window key
    cannot be AQE-skew-split, so the group sorts/buffers on one task
    with spill). The closed form is key-count independent."""
    par = spark.sparkContext.defaultParallelism
    t_range = R_QUOTES * STEP
    left = (
        spark.range(n_left, numPartitions=par)
        .select(
            F.col("id"),
            (F.col("id") % n_keys).alias("key"),
            ((F.col("id") * SCATTER) % t_range).alias("t"),
        )
    )
    right = (
        spark.range(n_keys * R_QUOTES, numPartitions=par)
        .select(
            (F.col("id") % n_keys).alias("key"),
            F.expr(f"(id div {n_keys}) * {STEP}").alias("rt"),
            F.expr(
                f"(id % {n_keys}) * {VAL_MULT} + (id div {n_keys})"
            ).alias("quote"),
        )
    )
    return left, right


def stress_asof(
    spark, n_left: int, strategy: str, warmup: bool = False,
    n_keys: int = K_KEYS,
) -> None:
    left, right = build_sides(spark, n_left, n_keys)
    left = left.persist()
    right = right.persist()
    n_l, n_r = left.count(), right.count()

    resolved, est_note = strategy, ""
    if strategy == "auto":
        # rehearsal resolve, timed and reported but OUTSIDE the measured
        # window (the measured asof_join("auto") pays its own estimate)
        t_est = time.monotonic()
        resolved = resolve_asof_strategy(left, "key", "t", left_key="id")
        est_note = (
            f" auto->{resolved} estimator {time.monotonic() - t_est:.2f}s;"
        )

    t0 = time.monotonic()
    out = asof_join(
        left, right, on="key", left_time="t", right_time="rt",
        left_key="id", strategy=strategy,
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
    shape = (
        f"|L|+|R| = {n_l + n_r} scan intermediate"
        if resolved == "union"
        else f"~{int(n_l * avg_matches)} join intermediate"
    )
    tag = " (warm-up, uncounted)" if warmup else ""
    hot = " HOT-KEY" if n_keys == 1 else ""
    print(
        f"asof_planted[{strategy}]{tag}: left {n_l} x right {n_r} "
        f"({n_keys}{hot} keys, ~{avg_matches:.0f} matches/row -> {shape})"
        f"{est_note} in {total:.2f}s; every match closed-form exact"
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
    # second arg: strategies csv (default both) — e.g. union-only for a
    # 100M decade point where the join form's ~5G-row intermediate is
    # pure wait, not signal; "auto" runs the priced resolver (r13) and
    # reports its pick + estimator cost alongside the measured total
    strategies = [
        s for s in (sys.argv[2] if len(sys.argv) > 2 else "union,join").split(",")
        if s
    ]
    # third arg: "hotkey" collapses the grid to ONE key — the union
    # strategy's documented worst case (one window group on one task)
    n_keys = 1 if (len(sys.argv) > 3 and sys.argv[3] == "hotkey") else K_KEYS
    spark = get_spark(app_name="stress_asof")
    try:
        # uncounted warm-up (positional, not size-membership — the
        # stress_ivf ADVICE r10 rule)
        stress_asof(spark, 50_000, strategies[0], warmup=True, n_keys=n_keys)
        for n in sizes:
            for strategy in strategies:
                stress_asof(spark, n, strategy, n_keys=n_keys)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
