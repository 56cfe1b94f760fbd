"""Sequence packing for LLM pretraining: lay the corpus out as one
global token stream (id order) and cut fixed-size context windows.

Every pretraining pipeline ends with this step — documents are
concatenated and split into model-context-length chunks, so each doc
needs its global token offset and the span of chunks it lands in (for
attention-mask construction and provenance).

The global offset is a prefix sum over the whole corpus. The naive
formulation — ``SUM(n_tokens) OVER (ORDER BY id)`` with no partition key
— collapses to ONE task sorting the entire dataset (Spark plans a
single-partition window), the textbook scale-killer. This module runs
the classic two-pass distributed prefix sum instead:

1. range-repartition by id (the one shuffle), per-partition token totals
   via a map-side-combined ``groupBy(partition_id)`` — #partitions rows
   to the driver, a bounded collect;
2. driver computes per-partition starting offsets (range partitioning is
   order-preserving, so partition i holds strictly smaller ids than
   partition i+1), broadcasts the tiny map, and a ``mapInPandas`` pass
   adds a running cumsum within each partition — Arrow-batched, order
   preserved across batches, no second shuffle.

Output is invariant to the partition count (asserted in tests): offsets
are a pure function of (id order, token counts).
"""

from __future__ import annotations

import pandas as pd  # module level: required for pandas-UDF-adjacent code

from pyspark.sql import DataFrame, functions as F, types as T


def pack_token_windows(
    df: DataFrame,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Adds ``n_tokens``, ``start_offset`` (global token offset of the
    doc in id order), ``chunk_first``/``chunk_last`` (the ``window``-size
    context chunks the doc spans; NULL for zero-token docs). NULL text
    counts zero tokens (``size(split(NULL))`` is -1, guarded)."""
    if window <= 0:
        raise ValueError("window must be positive")
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    n_tok = (
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.col(text_col), " ")))
        .cast("long")
    )
    base = (
        df.withColumn("n_tokens", n_tok)
        .repartitionByRange(n_partitions, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # Pass 1: per-partition totals (partial agg → #partitions rows).
    # This also materializes the persisted partitioning, so pass 2 sees
    # the SAME partition ids (an unmaterialized cache would recompute —
    # and potentially resample range boundaries — per consumer).
    totals = {
        r["__pid"]: r["total"]
        for r in base.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    offs: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offs[pid] = acc
        acc += int(totals[pid] or 0)
    boffs = spark.sparkContext.broadcast(offs)

    out_schema = T.StructType(
        base.schema.fields + [T.StructField("start_offset", T.LongType())]
    )

    def cum(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = boffs.value.get(int(pdf["__pid"].iloc[0]), 0)
            starts = pdf["n_tokens"].cumsum() - pdf["n_tokens"] + run
            run += int(pdf["n_tokens"].sum())
            yield pdf.assign(start_offset=starts.astype("int64"))

    packed = base.mapInPandas(cum, out_schema).drop("__pid")
    # Zero-token docs occupy no chunk: both span ends NULL.
    return (
        packed.withColumn(
            "chunk_first",
            F.when(
                F.col("n_tokens") > 0, F.expr(f"start_offset div {window}")
            ),
        )
        .withColumn(
            "chunk_last",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(start_offset + n_tokens - 1) div {window}"),
            ),
        )
    )
