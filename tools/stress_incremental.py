"""Incremental near-dedup stress: probing a 100k-doc corpus index with a
small batch must cost O(batch), not O(corpus).

Builds a corpus of unique-vocabulary docs, materializes its MinHash index
once (the amortized cost), then dedups a batch where half the docs are
token-reorderings of corpus docs (k=1 Jaccard exactly 1.0) and half are
fresh. Checks:

- exactly the planted copies are found (recall AND precision 1.0 — the
  16-band miss probability on J=1.0 pairs is literally 0, every band of
  identical signatures collides);
- probe wall time is a small fraction of re-running the full-corpus
  drop set over corpus+batch (the compaction-cadence alternative —
  measured 2.5x at 50k corpus / 2k batch, a gap that widens with corpus
  size since the probe never re-bands the corpus);
- a 2x batch is also probed and timed (at this scale both probes are
  fixed-overhead-dominated — the point is that neither grows with the
  corpus).

Usage: python tools/stress_incremental.py [--corpus 100000] [--batch 2000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def _unique_docs(spark, n, prefix: str, id_offset: int = 0):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"{prefix}{j}_"), F.col("id").cast("string"))
                for j in range(12)
            ],
        ).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=2_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators import dedup
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_incremental")
    n, b = args.corpus, args.batch

    corpus = _unique_docs(spark, n, "u").persist()
    corpus.count()

    t0 = time.time()
    index = dedup.minhash_index(corpus).persist()
    index.count()
    print(f"index build over {n} docs: {time.time() - t0:.1f}s (amortized once)")

    def make_batch(size: int, id_offset: int):
        # half: copies of corpus docs with tokens REVERSED (same token
        # set -> k=1 Jaccard exactly 1.0); half: fresh vocabulary
        half = size // 2
        src = (F.col("id") * 37) % n
        copies = spark.range(half).select(
            (F.col("id") + id_offset).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}_"), src.cast("string"))
                    for j in reversed(range(12))
                ],
            ).alias("text"),
            src.alias("expect_match"),
        )
        fresh = _unique_docs(spark, size - half, "v", id_offset + half).select(
            "doc_id", "text", F.lit(None).cast("long").alias("expect_match")
        )
        return copies.unionByName(fresh).persist()

    def probe(batch):
        t0 = time.time()
        hits = dedup.incremental_near_dups(
            batch.select("doc_id", "text"), corpus, corpus_index=index
        )
        found = {
            (r.id_new, r.id_corpus) for r in hits.collect()
        }
        return time.time() - t0, found

    batch1 = make_batch(b, 10_000_000)
    dt1, found1 = probe(batch1)
    expect1 = {
        (r.doc_id, r.expect_match)
        for r in batch1.filter(F.col("expect_match").isNotNull()).collect()
    }
    assert found1 == expect1, (
        f"planted recall/precision broken: {len(found1)} vs {len(expect1)}"
    )
    print(f"probe batch={b}: {dt1:.1f}s, {len(found1)} dups (exact)")

    batch2 = make_batch(2 * b, 20_000_000)
    dt2, found2 = probe(batch2)
    assert len(found2) == b  # 2b/2 planted copies
    print(f"probe batch={2*b}: {dt2:.1f}s ({dt2 / max(dt1, 1e-9):.1f}x of 1x-batch)")

    # the compaction-cadence alternative: full drop set over corpus+batch
    t0 = time.time()
    drops = dedup.minhash_drop_set(
        corpus.unionByName(batch1.select("doc_id", "text")),
        num_hashes=64,
        bands=16,
        k=1,
    )
    n_drop = drops.count()
    dt_full = time.time() - t0
    drops.unpersist()
    assert n_drop == b // 2, f"full drop set disagrees: {n_drop} vs {b // 2}"
    print(
        f"full-corpus drop set over {n + b} docs: {dt_full:.1f}s "
        f"(probe was {dt1:.1f}s -> {dt_full / max(dt1, 1e-9):.1f}x)"
    )


if __name__ == "__main__":
    main()
