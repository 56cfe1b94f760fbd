"""Top-k ranking-parallelism stress: ONE query against a large candidate
set — the regime where a single ``Window.partitionBy(query_id)`` collapses
ranking to one reducer task.

The sf embeddings table is tiled to ``--vectors`` candidates (new ids,
same 64-dim vectors; ties broken by neighbor id, so results stay fully
deterministic). The tool then:

1. times ``cosine_topk`` (two-stage) vs the old single-window form on the
   identical scored frame and checks they return identical rows;
2. measures the reduction directly: the stage-1 partial top-k output that
   the final per-query window ranks, vs the full scored-row count the old
   form ranked — and the number of distinct stage-1 ranking keys
   (query_id × input-partition), which is the ranking parallelism (the
   old form has exactly #queries = 1 key).

Usage: python tools/stress_topk.py [--vectors 200000] [--k 10]
       [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import Window, functions as F

    from lakeshack_spark.operators import similarity
    from lakeshack_spark.session import get_spark
    from lakeshack_spark.sources.catalog import load_table

    spark = get_spark(app_name="stress_topk")
    emb = load_table(spark, args.sf, "embeddings").select("vec_id", "embedding")
    base_n = emb.count()
    reps = max(1, -(-args.vectors // base_n))
    vecs = (
        emb.crossJoin(spark.range(reps).select(F.col("id").alias("__rep")))
        .select(
            (F.col("vec_id") + F.col("__rep") * base_n).alias("vec_id"),
            "embedding",
        )
        .filter(F.col("vec_id") < args.vectors)
        .repartition(32)
        .persist()
    )
    n = vecs.count()
    queries = vecs.filter(F.col("vec_id") == 0)

    def timed(df) -> tuple[float, list]:
        t0 = time.time()
        rows = df.collect()
        return time.time() - t0, rows

    # Two-stage (production) path.
    dt_two, rows_two = timed(
        similarity.cosine_topk(vecs, queries, k=args.k).orderBy("query_id", "rank")
    )

    # Old single-window form over the identical scored frame.
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"))
    c = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            similarity.cosine_col(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    dt_one, rows_one = timed(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= args.k)
        .orderBy("query_id", "rank")
    )
    assert [tuple(r) for r in rows_two] == [tuple(r) for r in rows_one], (
        "two-stage result diverged from single-window reference"
    )

    # Reduction accounting: what the final window ranks, and how many
    # ranking keys stage 1 spreads the work over.
    stage1 = (
        scored.withColumn("__part", F.spark_partition_id())
        .withColumn(
            "__prank",
            F.row_number().over(
                Window.partitionBy("query_id", "__part").orderBy(
                    F.col("cosine").desc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .filter(F.col("__prank") <= args.k)
    )
    agg = stage1.agg(
        F.count("*").alias("rows"),
        F.countDistinct("query_id", "__part").alias("keys"),
    ).collect()[0]
    scored_n = n - 1  # self-match filtered
    print(
        f"candidates={n} k={args.k} | two-stage {dt_two:.1f}s vs "
        f"single-window {dt_one:.1f}s (identical top-{args.k})"
    )
    print(
        f"final window ranks {agg['rows']} rows (old form ranked {scored_n}); "
        f"stage-1 ranking keys = {agg['keys']} (old form: 1)"
    )
    assert agg["keys"] > 1, "stage-1 ranking must occupy >1 key/task"
    assert agg["rows"] <= args.k * agg["keys"]
    assert agg["rows"] < scored_n / 10, "stage-1 must reduce the ranked set"
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
