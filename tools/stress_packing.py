"""Packing / epoch-shuffle scale stress: 10M-row prefix sums and global
shuffles with closed-form exact ground truth.

`pack_token_windows`'s global token offset is a two-pass distributed
prefix sum (per-partition totals → broadcast cumulative bases — no
one-partition window anywhere); `epoch_shuffle` is a deterministic
global sort (RangePartitioning — sampled ranges, per-partition sorts,
no global row_number). Both are shapes whose naive forms (a global
`row_number()` window) serialize on ONE reducer at scale — this tool
asserts the distributed forms stay EXACT one-to-two decades above the
bench corpus.

Ground truth is closed-form: doc i carries (i % 7) + 1 tokens, so its
global offset in id order is 28·(i//7) + r(r+1)/2 with r = i % 7 —
asserted for EVERY row as one aggregate (zero driver-side data).
The epoch shuffle is asserted to be a reproducible permutation: two
runs of the same epoch hash-agree in order, a different epoch
disagrees, and the key set is intact.

Usage: python tools/stress_packing.py [--rows 1000000,10000000]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="1000000,10000000")
    ap.add_argument("--window", type=int, default=2048)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators.packing import pack_token_windows
    from lakeshack_spark.operators.sampling import epoch_shuffle
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_packing")
    sizes = [int(s) for s in args.rows.split(",")]

    def corpus(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", F.array_repeat(F.lit("w"), (F.col("id") % 7 + 1).cast("int"))
            ).alias("text"),
        )

    # warm-up (uncounted)
    pack_token_windows(corpus(1000), window=64).count()

    results = []
    for n in sizes:
        docs = corpus(n).persist()
        docs.count()

        t0 = time.time()
        packed = pack_token_windows(docs, window=args.window)
        # closed-form offset: 28*(i//7) + r(r+1)/2, r = i%7
        expect = (
            F.lit(28) * (F.col("doc_id") / 7).cast("long")
            + (F.col("doc_id") % 7) * (F.col("doc_id") % 7 + 1) / 2
        ).cast("long")
        bad = packed.filter(
            (F.col("start_offset") != expect)
            | (F.col("n_tokens") != F.col("doc_id") % 7 + 1)
        ).count()
        n_rows = packed.count()
        pack_sec = time.time() - t0
        assert bad == 0, f"{bad} wrong offsets at n={n}"
        assert n_rows == n

        # Full global sort materialized through a noop write (orderBy +
        # limit alone would plan TakeOrderedAndProject and skip the
        # RangePartitioning sort this stress exists to exercise).
        t0 = time.time()
        epoch_shuffle(docs.select("doc_id"), "doc_id", epoch=3).write.format(
            "noop"
        ).mode("overwrite").save()
        shuffle_sec = time.time() - t0
        # Identity asserts on the deterministic prefix (limit after sort
        # is order-defined): same epoch twice ⇒ identical head, another
        # epoch ⇒ different head; key count intact.
        def head(epoch: int) -> tuple:
            return tuple(
                r["doc_id"]
                for r in epoch_shuffle(
                    docs.select("doc_id"), "doc_id", epoch=epoch
                ).limit(1000).collect()
            )

        h3a, h3b, h4 = head(3), head(3), head(4)
        assert h3a == h3b, f"epoch 3 not reproducible at n={n}"
        assert h3a != h4, f"epochs 3/4 identical at n={n}"
        n_keys = epoch_shuffle(docs.select("doc_id"), "doc_id", 3).count()
        assert n_keys == n

        total_tokens = 28 * (n // 7) + sum(
            t + 1 for t in range(n % 7)
        )
        print(
            f"n={n}: pack {pack_sec:.1f}s ({total_tokens} tokens, every "
            f"offset closed-form exact); epoch shuffle {shuffle_sec:.1f}s "
            f"(reproducible, epoch-distinct, permutation intact)"
        )
        results.append({"n": n, "pack": pack_sec, "shuffle": shuffle_sec})
        docs.unpersist()
    for prev, cur in zip(results, results[1:]):
        ratio = math.log(cur["n"] / prev["n"])
        exps = {
            s: round(math.log(cur[s] / prev[s]) / ratio, 2)
            for s in ("pack", "shuffle")
        }
        print(f"scaling exponents {prev['n']}→{cur['n']} (1.0=linear): {exps}")
    spark.stop()


if __name__ == "__main__":
    main()
