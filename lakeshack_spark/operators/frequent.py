"""Frequent-item (heavy-hitter) detection at corpus scale: per-partition
Misra–Gries summaries merged and then EXACTLY verified, so the final
answer is provably identical to a full groupBy-HAVING — while never
shuffling the full distinct-key cardinality.

Why not just ``groupBy(col).count()``? At 100 TB a token/URL/ngram
column has billions of distinct values; the exact aggregation shuffles
every one of them to find the handful above threshold. The classic
streaming answer (Misra–Gries / space-saving) summarizes each partition
in ``k`` counters with a per-partition undercount bounded by
``n_p/(k+1)``; summed summaries therefore undercount any item by at most
``n/(k+1)`` and NEVER overcount. Choosing ``k ≥ one_in`` makes every
item with true count ≥ ceil(n/one_in) survive with positive estimated
weight, so the merged summary is a provable candidate superset. A final
exact recount restricted to candidates (broadcast semi-join, map-side
filter) yields the exact heavy-hitter set — shuffle cost
O(k · partitions + candidate postings), not O(distinct items).

The sketch stage is Arrow-batched Python (``mapInPandas``): the
counter-capped dictionary merge is imperative by nature (the same
reasoning as text.repetition_stats — no built-in expresses "keep k
counters, decrement all on overflow"), and it touches each partition
once, map-only. The verify stage is pure JVM built-ins.
"""

from __future__ import annotations

import math

import pandas as pd  # module-level: pandas_udf/mapInPandas hints resolve here

from pyspark.sql import DataFrame, functions as F

#: Schema of the per-partition summary stream. NULL-item rows carry the
#: partition's bookkeeping: is_err=true → accumulated decrement mass (the
#: undercount bound), is_err=false → the partition's row count (so the
#: total n needs no separate scan).
_SUMMARY_SCHEMA = "item string, weight long, is_err boolean"


def mg_add(counts: dict[str, int], series, k: int) -> int:
    """Fold one pandas Series of items into a Misra–Gries counter dict
    bounded to ``k`` live counters, in place; returns the decrement mass
    of this fold (0 if no truncation was needed).

    Batch form of MG's decrement step: after adding the batch's exact
    value counts, if more than ``k`` counters are live, ALL are
    decremented by the smallest ``t`` that brings the live set back to
    ≤ ``k`` — every unit of ``t`` removes ≥ k+1 units of mass, so total
    decrement across a stream of n items is ≤ n/(k+1). Shared by the
    batch partition summaries here and the streaming state operator
    (streaming.frequent)."""
    vc = series.value_counts(dropna=True)
    for item, c in vc.items():
        counts[item] = counts.get(item, 0) + int(c)
    if len(counts) <= k:
        return 0
    # t = (k+1)-th largest count; subtract from all, drop <= 0
    t = sorted(counts.values(), reverse=True)[k]
    for item in [i for i, c in counts.items() if c <= t]:
        del counts[item]
    for item in counts:
        counts[item] -= t
    return t


def _mg_partition_summaries(k: int):
    """Returns a mapInPandas function computing a Misra–Gries summary of
    ≤ ``k`` counters per partition, batch-wise (see :func:`mg_add`)."""

    def mg(batches):
        counts: dict[str, int] = {}
        err = 0
        n_rows = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            n_rows += int(col.notna().sum())
            err += mg_add(counts, col, k)
        out = pd.DataFrame(
            {
                "item": list(counts),
                "weight": list(counts.values()),
                "is_err": False,
            }
        )
        extra = {"item": [None], "weight": [n_rows], "is_err": [False]}
        if err:
            extra = {
                "item": [None, None],
                "weight": [n_rows, err],
                "is_err": [False, True],
            }
        out = pd.concat([out, pd.DataFrame(extra)], ignore_index=True)
        yield out.astype({"weight": "int64", "is_err": "bool"})

    return mg


def heavy_hitters(
    df: DataFrame,
    col: str,
    one_in: int = 64,
    counters: int | None = None,
) -> DataFrame:
    """Exact frequent items: every value of ``col`` occurring in at least
    1-in-``one_in`` rows, with its exact count and share.

    Output: ``(item, n_item, share)`` — ``item`` is the value as string,
    ``n_item`` its exact count, ``share = n_item / n`` (one exact-int
    IEEE division, reproducible across engines).

    ``counters`` (default ``one_in``) is the per-partition MG budget;
    correctness requires ``counters ≥ one_in`` so that the global
    undercount ``n/(counters+1)`` stays below the threshold
    ``ceil(n/one_in)`` — enforced here. Larger budgets shrink the
    candidate set (less verify work) at slightly larger summaries.

    The result equals ``groupBy(col).count().filter(count*one_in >= n)``
    by the MG superset guarantee plus the exact verify pass — the DuckDB
    oracle for the gate IS that longhand form.
    """
    if one_in < 2:
        raise ValueError("one_in must be >= 2")
    k = counters if counters is not None else one_in
    if k < one_in:
        raise ValueError(
            f"counters ({k}) must be >= one_in ({one_in}) for the "
            "candidate-superset guarantee"
        )

    proj = (
        df.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
    )
    # ONE sketch scan produces the counters AND the row count (the
    # partition-count rows) — no separate df.count() pass; the verify
    # join below is the only other scan of the data.
    summaries = proj.mapInPandas(_mg_partition_summaries(k), _SUMMARY_SCHEMA)
    # The merged summary is consumed twice (bookkeeping collect + the
    # candidate filter feeding the verify join); without an EAGER persist
    # the sketch scan would recompute per consumer (the repo's measured
    # recomputation trap). It is tiny — ≤ counters × partitions rows —
    # and the collect below materializes the cache.
    merged = (
        summaries.groupBy("item", "is_err")
        .agg(F.sum("weight").alias("est"))
        .persist()
    )
    # Driver-side bookkeeping: ≤ 2 NULL-item rows (total n, total err).
    meta = {
        bool(r["is_err"]): int(r["est"])
        for r in merged.filter(F.col("item").isNull()).collect()
    }
    n = meta.get(False, 0)
    err = meta.get(True, 0)
    if n == 0:
        merged.unpersist()
        return (
            proj.groupBy("item")
            .agg(F.count("*").alias("n_item"), F.lit(0.0).alias("share"))
            .limit(0)
        )
    # merged stays persisted for the candidate filter the caller's action
    # reads; it is counters × partitions rows, released with the session.
    threshold = math.ceil(n / one_in)
    # An item with true count >= threshold has est >= threshold - err.
    cands = merged.filter(
        F.col("item").isNotNull() & (F.col("est") >= F.lit(threshold - err))
    ).select("item")

    exact = (
        proj.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count("*").alias("n_item"))
        .filter(F.col("n_item") * F.lit(one_in) >= F.lit(n))
    )
    return exact.withColumn(
        "share", F.col("n_item").cast("double") / F.lit(n).cast("double")
    )


def heavy_hitters_exact_longhand(df: DataFrame, col: str, one_in: int) -> DataFrame:
    """The naive full-cardinality form (for tests): groupBy + HAVING.
    NULL values are excluded on both paths (a NULL is not an item)."""
    proj = (
        df.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
    )
    n = proj.count()
    return (
        proj.groupBy("item")
        .agg(F.count("*").alias("n_item"))
        .filter(F.col("n_item") * F.lit(one_in) >= F.lit(n))
        .withColumn(
            "share", F.col("n_item").cast("double") / F.lit(n).cast("double")
        )
    )


def count_min_estimates(
    df: DataFrame,
    item_col: str,
    query_items: list[str],
    width: int = 256,
    depth: int = 4,
    seed: str = "cm",
) -> DataFrame:
    """Count-Min sketch point estimates (Cormode & Muthukrishnan 2005),
    the frequency-ESTIMATION companion to the Misra–Gries heavy-hitter
    detector: ``(item, exact, estimate, never_undercounts)`` for each
    queried item.

    Each occurrence charges ``depth`` cells — row r's cell is
    ``h64(seed:r:item) % width`` — and a point estimate is the MIN over
    the item's ``depth`` cells; collisions only ADD, so
    ``estimate ≥ exact`` ALWAYS (the sketch's deterministic guarantee,
    emitted as the ``never_undercounts`` witness column). ``exact`` is
    the true count (0 for absent items; an absent item's estimate is
    whatever its cells collected — the classic CM overcount).

    Determinism: md5-derived cells, no RNG — so a DuckDB oracle
    recomputes the IDENTICAL sketch and the gate pins the estimates
    bit-for-bit (``count_min_terms``), on top of the inequality
    witness.

    Scale shape: one ``depth``-way explode over the item stream feeding
    ONE map-side-combined aggregation whose result is at most
    ``depth × width`` rows (the sketch is CONSTANT-size in the corpus —
    that is the point); queried items probe it through a broadcast
    join of ``|queries| × depth`` rows. No distinct-cardinality
    shuffle anywhere.
    """
    if not query_items:
        raise ValueError("query_items must be non-empty")
    spark = df.sparkSession
    items = df.select(F.col(item_col).alias("item"))
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    from lakeshack_spark.operators.dedup import _h64

    def bucket(item_col_):
        return _h64(
            F.concat(
                F.lit(seed + ":"),
                F.col("r").cast("string"),
                F.lit(":"),
                item_col_,
            )
        ) % F.lit(width)

    charged = items.select("item", r).select(
        "r", bucket(F.col("item")).alias("bucket")
    )
    sketch = charged.groupBy("r", "bucket").agg(F.count("*").alias("c"))
    q = spark.createDataFrame(
        [(x,) for x in dict.fromkeys(query_items)], "item string"
    )
    probes = q.select("item", r).select("item", "r", bucket(F.col("item")).alias("bucket"))
    # the sketch is the broadcast side: depth × width rows by
    # construction, corpus-size-independent (a right-outer with a
    # broadcast probe side would be ignored by the planner — the build
    # side of a right join must be the left relation)
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .select("item", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .groupBy("item")
        .agg(F.min("c").cast("long").alias("estimate"))
    )
    exact = (
        items.join(F.broadcast(q), "item", "semi")
        .groupBy("item")
        .agg(F.count("*").alias("exact"))
    )
    return (
        q.join(exact, "item", "left")
        .join(est, "item", "left")
        .select(
            "item",
            F.coalesce(F.col("exact"), F.lit(0)).cast("long").alias("exact"),
            F.col("estimate"),
            (F.col("estimate") >= F.coalesce(F.col("exact"), F.lit(0))).alias(
                "never_undercounts"
            ),
        )
    )
