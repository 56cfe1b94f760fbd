"""Near-dedup scale stress: a corpus dominated by ONE giant duplicate
cluster — the regime where pairwise LSH verification collapses.

With ``--docs 100000 --cluster 20000``, the cluster alone implies
~2·10⁸ candidate pairs for ``minhash_verified_pairs`` (every pair of the
20k near-identical docs collides in every band); ``minhash_drop_set``
verifies one candidate per doc instead. The tool times drop_set on the
full corpus and the pairwise path on a small slice (extrapolating the
full pairwise cost), and checks the drop set against first-principles
expectations (every non-earliest cluster member dropped; no unique doc
dropped).

Usage: python tools/stress_dedup.py [--docs 100000] [--cluster 20000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cluster", type=int, default=20_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators import dedup
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_dedup")

    n, m = args.docs, args.cluster
    # Cluster docs: the same 12 words, deterministically shuffled per doc
    # (same token SET → k=1 Jaccard 1.0). Unique docs: disjoint vocab.
    template = [f"tok{i}" for i in range(12)]
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < m,
            # rotate the template by id % 12 — same set, different order
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        F.array(*[F.lit(t) for t in template]),
                        ((F.col("id") + j) % 12 + 1).cast("int"),
                    )
                    for j in range(12)
                ],
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
                    for j in range(12)
                ],
            )
        )
        .alias("text"),
    )
    docs = docs.persist()
    docs.count()

    t0 = time.time()
    drops = dedup.minhash_drop_set(
        docs, num_hashes=32, bands=8, k=1, threshold=0.9
    ).persist()
    n_drop = drops.count()
    dt_drop = time.time() - t0
    print(
        f"drop_set: {n_drop} dropped of {n} docs "
        f"(cluster {m}) in {dt_drop:.1f}s"
    )
    assert n_drop == m - 1, f"expected {m - 1} drops, got {n_drop}"
    assert drops.filter(F.col("doc_id") >= m).count() == 0, "unique doc dropped"
    assert drops.filter(F.col("doc_id") == 0).count() == 0, "earliest dropped"

    # Simhash fingerprinting over the full corpus (map-only; the
    # single-pass 63-counter aggregate — the old per-bit form ran 63
    # interpreted traversals per row and was ~12× slower at this size).
    t0 = time.time()
    checksum = (
        dedup.simhash(docs)
        .agg(F.sum(F.crc32(F.col("simhash").cast("string"))))
        .collect()[0][0]
    )
    print(f"simhash over {n} docs in {time.time() - t0:.1f}s (checksum {checksum})")

    # Adversarial pass-2 regime: LOOK-ALIKE docs sharing 8 of the
    # cluster's 12 tokens (k=1 Jaccard 8/16 = 0.5 — always FAILS the 0.9
    # verify) still band-collide with the cluster ~40% of the time
    # (P = 1-(1-0.5^4)^8). Each colliding look-alike's pass-2 candidate
    # set used to include EVERY cluster member (look_alikes × cluster
    # pairs — the quadratic blowup sneaking back in); the shingle-class
    # collapse reduces the whole cluster to ONE candidate, so this must
    # stay within seconds of the clean run.
    n_look = max(m // 10, 100)
    look = spark.range(n_look).select(
        (F.lit(n + 1_000_000) + F.col("id")).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.lit(t) for t in template[:8]],
            *[
                F.concat(F.lit(f"la{j}_"), F.col("id").cast("string"))
                for j in range(4)
            ],
        ).alias("text"),
    )
    with_look = docs.unionByName(look).persist()
    with_look.count()
    t0 = time.time()
    drops_l = dedup.minhash_drop_set(
        with_look, num_hashes=32, bands=8, k=1, threshold=0.9
    )
    n_drop_l = drops_l.count()
    dt_look = time.time() - t0
    drops_l.unpersist()
    with_look.unpersist()
    print(
        f"drop_set with {n_look} cluster look-alikes (collide, never "
        f"verify): {n_drop_l} dropped in {dt_look:.1f}s"
    )
    assert n_drop_l == m - 1, f"look-alikes must not drop: {n_drop_l}"
    assert dt_look < dt_drop * 4 + 60, (
        f"pass-2 blowup: {dt_look:.1f}s vs clean {dt_drop:.1f}s"
    )

    # Pairwise reference on a slice: cost grows ~quadratically with the
    # cluster, so time a SLICE_M-sized cluster and extrapolate.
    slice_m = 2_000
    sl = docs.filter((F.col("doc_id") < slice_m) | (F.col("doc_id") >= m))
    t0 = time.time()
    n_pairs = dedup.minhash_verified_pairs(
        sl, num_hashes=32, bands=8, k=1, threshold=0.9
    ).count()
    dt_pairs = time.time() - t0
    scale = (m / slice_m) ** 2
    print(
        f"pairwise on {slice_m}-doc cluster: {n_pairs} pairs in {dt_pairs:.1f}s "
        f"-> extrapolated full-cluster cost ~{dt_pairs * scale / 60:.0f} min "
        f"({int(n_pairs * scale):,} pairs)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
