"""Streaming heavy hitters: Misra–Gries counters as managed stream state.

The batch operator (operators.frequent) answers "which items exceed the
threshold in this table"; a pipeline ingesting continuously wants the
same answer *as of now* without rescanning history. This operator keeps
bucket-sharded MG summaries in the state store and re-emits each
bucket's live counters every micro-batch.

Sharding: each item deterministically hashes to one of ``buckets``
groups, so a bucket sees EVERY occurrence of its items — per-bucket MG
bounds are intact (undercount ≤ n_bucket/(counters+1)), state per
bucket is ≤ ``counters`` entries, and parallelism is ``buckets``, not
1 (keying everything to a single MG instance would funnel the whole
stream through one task). Merged across buckets the summaries are a
provable candidate superset for any threshold s > Σ_b n_b/(counters+1),
exactly the batch operator's argument — run the exact verify
(frequent.heavy_hitters, or a recount over the landed data) in the
compaction job when the exact set is needed.

State size: buckets × counters entries, CONSTANT in stream length — the
property that makes this viable on an unbounded stream (per-item keyed
counting state grows with distinct items; this does not).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd  # module level: pandas-function type hints resolve here
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lakeshack_spark.operators.frequent import mg_add

#: Per-bucket state: the live counters plus the accumulated decrement
#: mass (the bucket's exact undercount bound).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType()), True),
        T.StructField("weights", T.ArrayType(T.LongType()), True),
        T.StructField("err", T.LongType(), True),
    ]
)

#: Emitted every micro-batch: one row per live counter in the bucket,
#: plus one item=NULL row carrying the bucket's decrement mass (matching
#: the batch summaries' convention).
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("item", T.StringType(), True),
        T.StructField("weight", T.LongType(), False),
    ]
)


def _make_fn(counters: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        if state.exists:
            items, weights, err = state.get
            counts = dict(zip(list(items), [int(w) for w in weights]))
            err = int(err)
        else:
            counts, err = {}, 0
        for pdf in pdfs:
            err += mg_add(counts, pdf["item"], counters)
        state.update((list(counts.keys()), list(counts.values()), err))
        out = pd.DataFrame(
            {
                "bucket": key[0],
                "item": list(counts.keys()),
                "weight": list(counts.values()),
            }
        )
        if err:
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {"bucket": [key[0]], "item": [None], "weight": [err]}
                    ),
                ],
                ignore_index=True,
            )
        yield out.astype({"bucket": "int32", "weight": "int64"})

    return fn


def streaming_heavy_hitters(
    stream: DataFrame,
    col: str,
    counters: int = 64,
    buckets: int = 32,
) -> DataFrame:
    """Bucket-sharded streaming MG summaries of ``col``. Returns the
    update-mode stream ``(bucket, item, weight)`` — each micro-batch
    re-emits every bucket that saw data, item=NULL rows carrying the
    bucket's undercount bound. Non-streaming callers get the same
    semantics for a one-shot batch (useful for twins/tests)."""
    if counters < 1 or buckets < 1:
        raise ValueError("counters and buckets must be >= 1")
    rows = (
        stream.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.lit("hhb"), F.col("item")), F.lit(buckets)).cast(
                "int"
            ),
        )
    )
    return rows.groupBy("bucket").applyInPandasWithState(
        _make_fn(counters),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def candidate_items(summaries: DataFrame, threshold: int) -> DataFrame:
    """Batch helper over one emitted snapshot: items whose merged
    estimate could reach ``threshold`` — ``est + total_err ≥ threshold``
    (est never overcounts; undercount ≤ total_err). The provable
    candidate superset to feed an exact recount."""
    err_total = (
        summaries.filter(F.col("item").isNull())
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).alias("e"))
    )
    return (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("weight").alias("est"))
        .crossJoin(F.broadcast(err_total))
        .filter(F.col("est") + F.col("e") >= F.lit(threshold))
        .select("item", "est")
    )
