"""Scale-safe EXACT percentiles: distributed order-statistic selection.

Spark's exact ``percentile`` aggregate keeps a value→count map per group
that is merged onto a single final task — for an unbounded global group
that buffer grows with the number of distinct values and OOMs at scale
(VERDICT_r5 "what's wrong #1"; same failure class as a driver collect).
``approx_percentile`` is the sketch answer, but quantile *gates* (and
integer-cents exactness recipes) need the exact order statistics.

This module computes exact percentiles with NO single-task value buffer,
by direct rank selection over a range-partitioned sort:

1. range-repartition the values (the one shuffle) and sort within
   partitions; per-partition row counts via a map-side-combined
   ``groupBy(partition_id)`` — #partitions rows to the driver (bounded
   collect, same shape as packing's prefix sum);
2. the driver turns counts into per-partition starting ranks (range
   partitioning is order-preserving), maps each requested percentile to
   its 1-indexed interpolation ranks ``lo = floor(1 + p·(n-1))`` /
   ``hi = ceil(...)``, and broadcasts the tiny {partition: local ranks}
   map;
3. a shuffle-free ``mapInPandas`` pass keeps a running local index per
   partition and emits ONLY the ≤ 2·|ps| rows at requested ranks —
   memory per task is one Arrow batch, never the group.

Interpolation ``x_lo + frac · (x_hi − x_lo)`` matches Spark's
``Percentile`` and DuckDB's ``quantile_cont`` exactly (SQL-standard
continuous interpolation) — on integer-valued domains with quarter
fractions every engine lands on the identical double (the robust-outliers
exactness recipe). Equality with ``F.percentile`` is unit-pinned on
integer-cents domains; partition-count invariance is asserted.

The determinism trap this module inherits from packing.py: the
range-partitioned frame MUST be persisted and materialized by the counts
action before pass 3 reads it — an unmaterialized cache would recompute
(and potentially resample range boundaries) per consumer.
"""

from __future__ import annotations

import math

import pandas as pd  # module level: required for pandas-UDF-adjacent code

from pyspark.sql import DataFrame, functions as F, types as T


def _rank_picks(
    base: DataFrame, wanted: dict[int, list[int]]
) -> DataFrame:
    """Rows of ``base`` (sorted-within-partition, ``__pid`` attached) at
    the requested 1-indexed LOCAL ranks per partition. Shuffle-free; the
    output is ≤ sum(len(v)) rows."""
    spark = base.sparkSession
    bwanted = spark.sparkContext.broadcast(
        {pid: sorted(rs) for pid, rs in wanted.items()}
    )
    schema = T.StructType(
        [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__local_rank", T.LongType()),
            T.StructField("__x", T.DoubleType()),
        ]
    )

    def pick(batches):
        seen = 0
        targets: list[int] | None = None
        ti = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            if targets is None:
                targets = bwanted.value.get(pid, [])
            lo, hi = seen + 1, seen + len(pdf)
            rows = []
            while ti < len(targets) and targets[ti] <= hi:
                r = targets[ti]
                if r >= lo:
                    rows.append(
                        {
                            "__pid": pid,
                            "__local_rank": r,
                            "__x": float(pdf["__x"].iloc[r - lo]),
                        }
                    )
                ti += 1
            seen = hi
            if rows:
                yield pd.DataFrame(rows)

    return base.select("__pid", "__x").mapInPandas(pick, schema)


def _ranked_base(
    df: DataFrame, value_col: str, n_partitions: int
) -> tuple[DataFrame, dict[int, int], int]:
    """Range-partitioned, partition-sorted, persisted value frame plus the
    per-partition starting-rank offsets and the total non-null count. The
    caller owns the returned frame's unpersist."""
    v = (
        df.select(F.col(value_col).cast("double").alias("__x"))
        .filter(F.col("__x").isNotNull())
    )
    base = (
        v.repartitionByRange(n_partitions, F.col("__x"))
        .sortWithinPartitions("__x")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in base.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offs: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offs[pid] = acc
        acc += int(counts[pid])
    return base, offs, acc


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    n_partitions: int | None = None,
) -> dict[float, float | None]:
    """Exact continuous percentiles of ``value_col`` (nulls ignored),
    computed by distributed rank selection — the production twin of the
    ``F.percentile`` gate form. Returns {p: value} (None on empty input).
    """
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile out of range: {p}")
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    base, starts, n = _ranked_base(df, value_col, n_partitions)
    try:
        if n == 0:
            return {p: None for p in ps}
        # 0-indexed interpolation position — EXACTLY Spark Percentile's
        # expression order (`pos = p·(n−1)`, `frac = pos − floor(pos)`):
        # adding 1 before the floor changes the double (0.9·4999 + 1 and
        # 0.9·4999 round their fractional parts differently) and breaks
        # cell-exactness, so ranks are 1-indexed only AFTER the frac.
        specs: list[tuple[float, int, int, float]] = []
        for p in ps:
            pos = p * (n - 1)
            lo0 = int(math.floor(pos))
            specs.append((p, lo0 + 1, int(math.ceil(pos)) + 1, pos - lo0))
        # Map each needed global rank to (partition, local rank).
        pids = sorted(starts)
        wanted: dict[int, list[int]] = {}

        def locate(rank: int) -> None:
            # partitions are rank-contiguous in pid order
            for i, pid in enumerate(pids):
                nxt = starts[pids[i + 1]] if i + 1 < len(pids) else n
                if starts[pid] < rank <= nxt:
                    wanted.setdefault(pid, []).append(rank - starts[pid])
                    return
            raise AssertionError(f"rank {rank} outside [1, {n}]")

        needed = sorted({r for (_p, lo, hi, _f) in specs for r in (lo, hi)})
        global_to_val: dict[int, float] = {}
        for r in needed:
            locate(r)
        picks = _rank_picks(base, wanted).collect()
        for row in picks:
            global_to_val[starts[row["__pid"]] + row["__local_rank"]] = row[
                "__x"
            ]
        out: dict[float, float | None] = {}
        for p, lo, hi, frac in specs:
            xlo = global_to_val[lo]
            xhi = global_to_val[hi]
            # Spark Percentile's exact expression order:
            # (higher−pos)·x_lo + (pos−lower)·x_hi — NOT the algebraically
            # equal x_lo + frac·(x_hi−x_lo), which rounds differently on
            # non-quarter fractions (measured: 89978.90000000001 vs
            # 89978.9 at p=0.9). On quarter-fraction integer domains both
            # forms are exact, which is why the DuckDB quantile_cont gate
            # oracle also matches.
            out[p] = xlo if lo == hi else (1.0 - frac) * xlo + frac * xhi
        return out
    finally:
        base.unpersist()


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    names: list[str] | None = None,
) -> DataFrame:
    """Per-GROUP exact percentiles without the aggregate buffer: Spark's
    ``percentile(...) GROUP BY g`` builds one value→count OpenHashMap per
    group merged in memory on the final reducer — the per-group analogue
    of the global buffer this module exists to avoid. Here each group is
    instead SORTED (``row_number`` over (group, value) — Spark's sort
    spills through UnsafeExternalSorter, so a giant group costs disk,
    not an OOM) and the two interpolation order statistics per
    percentile are picked by rank and folded in one conditional
    aggregation.

    The rank arithmetic reproduces ``Percentile``'s expression order
    exactly (``pos = p·(n−1)``, ``(1−frac)·x_lo + frac·x_hi``) in Spark
    SQL doubles — the same single IEEE ops — so results are cell-exact
    vs the aggregate form on any input (unit-pinned, including
    non-quarter fractions). NULL values are ignored per SQL semantics;
    groups whose values are all NULL are dropped (matching GROUP BY over
    the non-null projection).

    Returns one row per group: ``(group_col, <name per p>)``; names
    default to ``p<percent>``."""
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile out of range: {p}")
    if names is None:
        names = [f"p{int(round(p * 100))}" for p in ps]
    from pyspark.sql import Window

    g = F.col(group_col)
    v = df.select(g, F.col(value_col).cast("double").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    w = Window.partitionBy(group_col).orderBy("__x")
    ranked = v.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(Window.partitionBy(group_col))
    )
    aggs = []
    for p, name in zip(ps, names):
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")
        lo = F.floor(pos) + F.lit(1)
        hi = F.ceil(pos) + F.lit(1)
        frac = pos - F.floor(pos).cast("double")
        lo_val = F.max(F.when(F.col("__rn") == lo, F.col("__x")))
        hi_val = F.max(F.when(F.col("__rn") == hi, F.col("__x")))
        aggs.append(
            (
                (F.lit(1.0) - F.max(frac)) * lo_val + F.max(frac) * hi_val
            ).alias(name)
        )
    return ranked.groupBy(group_col).agg(*aggs)


def quantile_bins(
    df: DataFrame,
    value_col: str,
    id_cols: list[str],
    ps: list[float] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Quantile discretization (MLlib QuantileDiscretizer semantics) with
    EXACT boundaries from :func:`exact_percentiles` — no single-task
    value buffer anywhere in the plan. Output: ``id_cols`` + ``bin``
    (int, 0..len(ps)) + one double boundary column per percentile
    (``q1..qk``), every row carrying the bounds so a gate hash pins them
    alongside the assignment."""
    if ps is None:
        ps = [0.25, 0.50, 0.75]
    qs = exact_percentiles(df, value_col, ps, n_partitions)
    bounds = [qs[p] for p in ps]
    col = F.col(value_col)
    # NULL values were ignored when computing the boundaries, so they
    # must get a NULL bin — without the leading isNull guard every
    # `NULL <= bound` comparison is NULL and the chain would fall
    # through to the TOP bin (self-review r6).
    bin_expr = F.when(col.isNull(), F.lit(None))
    for i, b in enumerate(bounds):
        bin_expr = bin_expr.when(col <= F.lit(b), F.lit(i))
    bin_expr = bin_expr.otherwise(F.lit(len(bounds))).cast("int")
    return df.select(
        *id_cols,
        bin_expr.alias("bin"),
        *[
            F.lit(b).cast("double").alias(f"q{i + 1}")
            for i, b in enumerate(bounds)
        ],
    )


def two_sample_ks(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance, distributed: ONE
    row ``(n_a, n_b, ks, ks_at)`` where ``ks = sup_x |F_a(x) − F_b(x)|``
    over the pooled support and ``ks_at`` is the SMALLEST value
    attaining it (deterministic tie rule).

    The drift-detection companion to the chi-square monitor
    (quality.hashed_distribution_drift): chi² watches binned/hashed
    frequencies, KS watches the full CDF of an ordered numeric column —
    the standard "did this slice's value distribution shift?" test for
    price/length/score columns between sources, shards, or days.

    Cross-engine exactness on integer domains (the gate recipe): step
    counts are exact int64 cumulative sums; each CDF value is ONE
    int→double division; the difference and |·| are single IEEE ops;
    the sup is a max over exactly-computed doubles — so Spark and a
    DuckDB oracle using window cumulative sums agree bit-for-bit
    (``ks_price_by_status``).

    Scale shape: one value-keyed count aggregation (map-side combined),
    one range-repartitioned sort of the DISTINCT-value frame, a
    bounded per-partition-totals collect (#partitions rows — packing's
    prefix-sum discipline), a shuffle-free ``mapInPandas`` cumulative
    pass, and one max aggregation. NO single-task window: the classic
    ``SUM() OVER (ORDER BY ...)`` formulation plans one reducer for the
    whole table, which is exactly what this avoids.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    counts = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(
                F.when(F.col(group_col) == group_a, 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col(group_col) == group_b, 1).otherwise(0)
            ).alias("cb"),
        )
    )
    base = (
        counts.repartitionByRange(n_partitions, F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["__pid"]: (r["ta"], r["tb"])
        for r in base.groupBy("__pid")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .collect()
    }
    n_a = sum(int(t[0] or 0) for t in totals.values())
    n_b = sum(int(t[1] or 0) for t in totals.values())
    offs: dict[int, tuple[int, int]] = {}
    acc_a = acc_b = 0
    for pid in sorted(totals):
        offs[pid] = (acc_a, acc_b)
        acc_a += int(totals[pid][0] or 0)
        acc_b += int(totals[pid][1] or 0)
    boffs = spark.sparkContext.broadcast(offs)

    out_schema = T.StructType(
        [
            T.StructField("v", base.schema["v"].dataType),
            T.StructField("diff", T.DoubleType()),
        ]
    )

    def cum(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = list(
                    boffs.value.get(int(pdf["__pid"].iloc[0]), (0, 0))
                )
            cna = pdf["ca"].cumsum() + run[0]
            cnb = pdf["cb"].cumsum() + run[1]
            run[0] += int(pdf["ca"].sum())
            run[1] += int(pdf["cb"].sum())
            diff = (cna / n_a - cnb / n_b).abs()
            yield pd.DataFrame({"v": pdf["v"], "diff": diff})

    diffs = base.mapInPandas(cum, out_schema)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"two_sample_ks: empty sample (n_a={n_a}, n_b={n_b})"
        )
    best = diffs.agg(
        F.max("diff").alias("ks"),
        F.min_by(
            F.struct(F.col("v").alias("at")),
            F.struct(
                (-F.col("diff")).alias("d"), F.col("v").alias("v")
            ),
        ).alias("__best"),
    )
    return best.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.col("ks"),
        F.col("__best.at").alias("ks_at"),
    )
