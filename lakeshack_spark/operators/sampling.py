"""Deterministic sampling and dataset splitting for training pipelines.

Everything here is hash-based, never RNG-based: a row's assignment is a
pure function of its key and a split label, so (a) re-running on the same
data gives byte-identical splits, (b) adding files/partitions never
reassigns existing rows, and (c) train/test membership is reproducible
across engines (md5 is portable; Spark's ``rand()`` is not even stable
across partitionings). This is the property a 100 TB corpus refresh needs:
incremental ingest must not leak yesterday's training rows into today's
holdout.

All operators are map-only column transforms — no shuffle, no Python.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: Hash buckets for split assignment; weights resolve to bucket ranges.
#: 1e6 buckets keeps quantization error ≤ 1e-6 of the weight spec.
_BUCKETS = 1_000_000


def hash_bucket(key: Column, label: str, buckets: int = _BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(label || key), via the
    repo's ONE portable 60-bit hash (operators.dedup._h64) so split
    assignment can never drift from the documented hash."""
    from lakeshack_spark.operators.dedup import _h64

    return (
        _h64(F.concat(F.lit(label), F.lit(":"), key.cast("string"))) % buckets
    ).cast("long")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    label: str = "split",
) -> DataFrame:
    """Adds ``split``: deterministic disjoint assignment of every row to
    one of ``weights``' keys, proportional to the weight values.

    ``label`` salts the hash — two splits with different labels are
    independent, while the same label always reproduces the same
    assignment. Assignment is per *key*, so duplicate keys (e.g. multiple
    rows of one document) land in the same split — the leakage-safe
    default for training data.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = hash_bucket(F.col(key_col), label)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(cum * _BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", out)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    label: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Unlike
    ``DataFrame.sample`` this is stable across runs, partitionings, and
    engines, and samples NEST under one label: every ``fraction=0.25``
    row is also a ``fraction=0.5`` row, and re-sampling a sample keeps
    ``min`` of the fractions (same threshold test on the same hash — so
    growing a sample never reshuffles which rows are in it; use distinct
    labels for independent draws)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    bound = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), label) < F.lit(bound))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    label: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value keeps its
    own fraction (unlisted strata keep ``default_fraction``). The hash is
    salted with the stratum so strata sample independently."""
    bucket = hash_bucket(
        F.concat(F.col(strata_col).cast("string"), F.lit("|"), F.col(key_col).cast("string")),
        label,
    )
    bound = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        bound = F.when(
            F.col(strata_col).cast("string") == F.lit(str(value)),
            F.lit(int(frac * _BUCKETS)),
        ).otherwise(bound)
    return df.filter(bucket < bound)


def stratified_take_n(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    label: str = "take_n",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum value, chosen by
    deterministic hash rank (md5 of ``label:stratum|key``, ties broken by
    key). Adds ``sample_rank`` (1-based within the stratum).

    The fraction operators above cannot guarantee a per-stratum COUNT;
    this one does — "exactly 10k held-out docs per language". The hash
    ordering keeps the choice stable across runs/partitionings AND
    nested: a stratum's top-n is always a prefix of its top-2n, so
    growing the eval set never swaps out existing members.

    100 TB shape: expressed as row_number over (stratum, hash) so
    Catalyst plans a WindowGroupLimit pair — each map task keeps only its
    local top-n per stratum BEFORE the exchange (Partial mode), so the
    shuffle carries O(tasks · strata · n) rows instead of the table, and
    the Final limit + window run over that bounded set. Plan-pinned in
    tests/test_plans.py.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    from pyspark.sql import Window

    from lakeshack_spark.operators.dedup import _h64

    h = _h64(
        F.concat(
            F.lit(label),
            F.lit(":"),
            F.col(strata_col).cast("string"),
            F.lit("|"),
            F.col(key_col).cast("string"),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= n
    )


def epoch_shuffle(
    df: DataFrame, key_col: str, epoch: int, with_key: bool = False
) -> DataFrame:
    """Deterministic training-epoch shuffle: the frame globally sorted by
    ``md5(epoch:key)`` (ties by key). Each epoch is an independent,
    reproducible permutation of the corpus — re-running epoch 3 next
    month, on different partition counts or a different engine, yields
    byte-identical order, which Spark's ``rand()``-based shuffles cannot
    promise. Write the result with a partition-preserving sink and the
    training order is pinned.

    100 TB shape: a global sort is RangePartitioning — Spark samples the
    hash domain, range-partitions, and sorts per partition (spillable);
    no single task ever sees more than its range. There is deliberately
    NO global row-number column: a global row_number is a one-partition
    window (the scale killer); consumers that need positions take them
    from the written file/row order.

    ``with_key`` materializes the sort key as ``shuffle_key`` (audit /
    oracle use).
    """
    from lakeshack_spark.operators.dedup import _h64

    h = _h64(
        F.concat(
            F.lit(f"epoch{int(epoch)}"), F.lit(":"), F.col(key_col).cast("string")
        )
    )
    if with_key:
        df = df.withColumn("shuffle_key", h)
        return df.orderBy(F.col("shuffle_key").asc(), F.col(key_col).asc())
    return df.orderBy(h.asc(), F.col(key_col).asc())


def weighted_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    label: str = "wss",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic probability-proportional-to-size sampling by
    systematic (stochastic-universal) selection — the weighted
    counterpart of :func:`deterministic_sample`, e.g. "draw 10k
    documents proportional to token count" for mixture construction.

    The items are laid on a weight line in md5-shuffled order
    (``md5(label:key)``, ties by key — the same portable hash as every
    split here, so the draw is engine- and partitioning-independent),
    and ``n`` pointers are placed at the odd multiples of ``W/(2n)``.
    An item's multiplicity is the number of pointers inside its weight
    interval — EXACT integer arithmetic throughout (the pointer-count
    below ``x`` is ``clamp(ceil((2nx - W)/(2W)), 0, n)``, evaluated
    with positive-operand integer division only), so the sample is
    bit-reproducible and oracle-checkable. Items with ``w > W/n`` can
    be drawn more than once (classic SUS); all others at most once.
    Multiplicities always sum to exactly ``n``.

    100 TB shape: the order is RangePartitioning on the hash (no global
    row_number — the one-partition window killer); the prefix sum is
    the classic two-pass (per-partition totals collected — O(#tasks) —
    then a map-side running sum), the same machinery as
    ``packing.pack_token_windows``. Everything else is map-only.
    Overflow guard: requires ``2·n·W < 2^63`` (raises otherwise).

    Returns ``df``'s columns + ``multiplicity`` for drawn rows only.
    """
    from pyspark.sql import types as T

    from lakeshack_spark.operators.dedup import _h64

    if n <= 0:
        raise ValueError("n must be positive")
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    h = _h64(
        F.concat(F.lit(label), F.lit(":"), F.col(key_col).cast("string"))
    )
    base = (
        df.withColumn("__w", F.col(weight_col).cast("long"))
        .withColumn("__h", h)
        .repartitionByRange(n_partitions, F.col("__h"), F.col(key_col))
        .sortWithinPartitions("__h", key_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # Pass 1: per-partition totals (also materializes the persisted
    # partitioning so pass 2 sees identical partition ids).
    totals = {
        r["__pid"]: int(r["t"] or 0)
        for r in base.groupBy("__pid").agg(F.sum("__w").alias("t")).collect()
    }
    offs: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offs[pid] = acc
        acc += totals[pid]
    total_w = acc
    if total_w <= 0:
        return df.limit(0).withColumn("multiplicity", F.lit(0).cast("long"))
    if 2 * n * total_w >= 2**63:
        raise ValueError(
            f"2*n*W = {2 * n * total_w} overflows int64; reduce n or "
            "rescale the weights"
        )
    boffs = spark.sparkContext.broadcast(offs)
    out_schema = T.StructType(
        base.schema.fields + [T.StructField("__s", T.LongType())]
    )

    def cum(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = boffs.value.get(int(pdf["__pid"].iloc[0]), 0)
            starts = pdf["__w"].cumsum() - pdf["__w"] + run
            run += int(pdf["__w"].sum())
            yield pdf.assign(__s=starts.astype("int64"))

    staged = base.mapInPandas(cum, out_schema)
    below = (
        "LEAST(CAST({n} AS BIGINT), CASE WHEN 2*{n}*({x}) <= {W} THEN 0 "
        "ELSE (2*{n}*({x}) - {W} + 2*{W} - 1) DIV (2*{W}) END)"
    )
    mult = F.expr(
        below.format(n=n, W=total_w, x="__s + __w")
        + " - "
        + below.format(n=n, W=total_w, x="__s")
    ).cast("long")
    return (
        staged.withColumn("multiplicity", mult)
        .filter(F.col("multiplicity") > 0)
        .drop("__w", "__h", "__pid", "__s")
    )
