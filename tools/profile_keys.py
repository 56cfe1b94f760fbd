"""Isolated per-phase profiling of individual bench keys on a quiet box.

Times sub-phases of one headline key through the noop sink, bracketed by
bench.py's spin sentinels so a contended window is visible on the spot.

Usage: python tools/profile_keys.py <key> [n_runs]
Keys: ivf, cosine, minhash, asof, q1, q5, ngram
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import spin_sentinel  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    key = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from lakeshack_spark.queries import queries
    from lakeshack_spark.session import get_spark
    from lakeshack_spark.sources.catalog import load_table

    spark = get_spark(app_name=f"profile_{key}")
    qs = queries()
    # warm-up: codegen across common shapes + python workers
    from bench import prewarm_python_workers

    prewarm_python_workers(spark)
    noop(qs["topk_orders"](spark, SF))

    def timed(label, fn):
        s0 = spin_sentinel()
        walls = []
        for _ in range(n_runs):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        s1 = spin_sentinel()
        print(f"{label}: {walls} sentinels=({s0},{s1})", flush=True)

    if key == "ivf":
        from lakeshack_spark.operators import similarity

        emb = load_table(spark, SF, "embeddings")
        timed("full_query", lambda: noop(qs["ivf_topk_full_probe"](spark, SF)))
        timed(
            "sample_centroids(collect)",
            lambda: similarity.sample_centroids(emb, 8),
        )
        cents = similarity.sample_centroids(emb, 8)
        timed(
            "ivf_assign(noop)",
            lambda: noop(similarity.ivf_assign(emb, cents)),
        )
        q3 = emb.filter(F.col("vec_id") < 3)
        timed(
            "ivf_topk_given_centroids",
            lambda: noop(similarity.ivf_topk(emb, q3, cents, k=5, nprobe=8)),
        )
    elif key == "cosine":
        from lakeshack_spark.operators import similarity

        emb = load_table(spark, SF, "embeddings")
        q3 = emb.filter(F.col("vec_id") < 3)
        timed("full_query", lambda: noop(qs["cosine_topk_bruteforce"](spark, SF)))
        timed(
            "cosine_topk", lambda: noop(similarity.cosine_topk(emb, q3, k=5))
        )
    elif key == "minhash":
        from lakeshack_spark.operators import dedup

        docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 300)
        timed("full_query", lambda: noop(qs["minhash_dedup_verified"](spark, SF)))
        timed(
            "lsh_pairs_only",
            lambda: noop(
                dedup.minhash_lsh_pairs(
                    docs, num_hashes=64, bands=16, k=1
                )
            ),
        )
        timed(
            "banded_only",
            lambda: noop(
                dedup._banded_with_buckets(docs, "text", "doc_id", 64, 16, 1)
            ),
        )
    elif key == "asof":
        timed("full_query", lambda: noop(qs["asof_join_events_orders"](spark, SF)))
    elif key in qs:
        timed("full_query", lambda: noop(qs[key](spark, SF)))
    spark.stop()


if __name__ == "__main__":
    main()
