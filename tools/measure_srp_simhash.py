"""Interleaved expr-vs-arrow A/B for the two interpreted-HOF folds r13
declined to Arrow-ize (VERDICT_r13 item 6: re-check on a wide-vector /
long-doc stress shape; adopt only on a beyond-band win).

- SRP signature: n deterministic vectors of ``dim`` float dims
  (xxhash-derived, exact float32 values), srp_signature(n_bits=64)
  through the noop sink — expr runs 64 interpreted folds of ``dim``
  elements per row, arrow one vectorized bit-exact pass per batch.
- simhash fingerprint: n docs of ``tokens`` distinct hash-derived
  words, simhash() through the noop sink — both paths md5 every token;
  the fold differs.

Legs alternate per round in ONE process (box drift cancels), sentinel
edges sampled between runs, parity spot-checked row-for-row at the end.

Usage: python tools/measure_srp_simhash.py [which] [n] [width] [rounds]
  which: srp | simhash        (default srp)
  n:     rows                 (default 200_000 srp / 30_000 simhash)
  width: dims / tokens-per-doc (default 256 / 400)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import spin_sentinel  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "srp"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else (
        200_000 if which == "srp" else 30_000
    )
    width = int(sys.argv[3]) if len(sys.argv) > 3 else (
        256 if which == "srp" else 400
    )
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from lakeshack_spark.operators import dedup, similarity
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name=f"measure_{which}_wide")

    if which == "srp":
        # deterministic float32 coords in [-1, 1): exact dyadic values
        cols = [
            (
                (F.pmod(F.xxhash64("id", F.lit(j)), F.lit(65536)) - 32768)
                / 32768.0
            ).cast("float")
            for j in range(width)
        ]
        data = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), F.array(*cols).alias("embedding"))
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )

        def run(impl: str) -> float:
            t0 = time.time()
            similarity.srp_signature(
                data, n_bits=64, dim=width, impl=impl
            ).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        def parity():
            small = data.filter(F.col("vec_id") < 2000)
            e = {
                r.vec_id: list(r.srp_bits)
                for r in similarity.srp_signature(
                    small, n_bits=64, dim=width, impl="expr"
                ).select("vec_id", "srp_bits").collect()
            }
            a = {
                r.vec_id: list(r.srp_bits)
                for r in similarity.srp_signature(
                    small, n_bits=64, dim=width, impl="arrow"
                ).select("vec_id", "srp_bits").collect()
            }
            return len(e), e == a
    else:
        toks = [
            F.concat(
                F.lit("w"),
                F.conv(F.hex(F.xxhash64("id", F.lit(j))), 16, 36),
            )
            for j in range(width)
        ]
        data = (
            spark.range(n)
            .select(F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text"))
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )

        def run(impl: str) -> float:
            t0 = time.time()
            dedup.simhash(data, impl=impl).select(
                "doc_id", "simhash"
            ).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        def parity():
            small = data.filter(F.col("doc_id") < 2000)
            e = {
                r.doc_id: r.simhash
                for r in dedup.simhash(small, impl="expr").select(
                    "doc_id", "simhash"
                ).collect()
            }
            a = {
                r.doc_id: r.simhash
                for r in dedup.simhash(small, impl="arrow").select(
                    "doc_id", "simhash"
                ).collect()
            }
            return len(e), e == a

    print(json.dumps({"which": which, "n": data.count(), "width": width}), flush=True)
    for impl in ("expr", "arrow"):  # warm-up both, uncounted
        run(impl)
    for i in range(rounds):
        s0 = round(spin_sentinel(), 1)
        e = run("expr")
        s1 = round(spin_sentinel(), 1)
        a = run("arrow")
        s2 = round(spin_sentinel(), 1)
        print(
            json.dumps(
                {
                    "round": i,
                    "expr_sec": e,
                    "arrow_sec": a,
                    "sentinel_ms": [s0, s1, s2],
                }
            ),
            flush=True,
        )
    rows, eq = parity()
    print(json.dumps({"parity_rows": rows, "parity_equal": eq}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
