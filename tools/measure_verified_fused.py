"""Interleaved same-process A/B of minhash_verified_pairs' lazy vs fused
routes at scale (OPTIMIZATION_r14, VERDICT_r13 item 3: "A/B at >=1M
docs").

Corpus: n deterministic docs of 15 hash-derived tokens each (disjoint
vocabulary across docs up to hash collisions), with every 50th doc an
exact duplicate of its predecessor — enough verified pairs to exercise
the full path, but no quadratic cluster (verified_pairs' output must
stay bounded; dup-dense regimes belong to minhash_drop_set and
tools/stress_dedup.py). The input is localCheckpoint'ed once so both
legs read identical materialized rows, then the legs alternate
lazy->fused per round in ONE process so box drift cancels (CLAUDE.md
measurement rule), each timed through the noop sink and bracketed by
bench.py's spin-sentinel edge samples.

Usage: python tools/measure_verified_fused.py [n_docs] [rounds] [tokens_per_doc]
       (defaults 1_000_000, 3, 15)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import spin_sentinel  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    from pyspark.sql import functions as F

    from lakeshack_spark.operators import dedup
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="measure_verified_fused")
    # every 50th doc copies its predecessor's token base -> exact dup
    base = F.col("id") - F.when(F.col("id") % 50 == 1, F.lit(1)).otherwise(
        F.lit(0)
    )
    toks = [
        F.concat(
            F.lit("t"),
            F.conv(
                F.hex(F.xxhash64(base, F.lit(j))), 16, 36
            ),
        )
        for j in range(n_tokens)
    ]
    docs = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    print(json.dumps({"n_docs": docs.count(), "rounds": rounds, "n_tokens": n_tokens}), flush=True)

    def run(fused: bool) -> float:
        t0 = time.time()
        out = dedup.minhash_verified_pairs(docs, fused=fused)
        out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # warm-up both code paths (codegen + python workers), uncounted
    w = docs.limit(5000).localCheckpoint(eager=True)
    for f in (False, True):
        dedup.minhash_verified_pairs(w, fused=f).write.format("noop").mode(
            "overwrite"
        ).save()

    for i in range(rounds):
        edge0 = round(spin_sentinel(), 1)
        lazy = run(False)
        mid = round(spin_sentinel(), 1)
        fused = run(True)
        edge1 = round(spin_sentinel(), 1)
        print(
            json.dumps(
                {
                    "round": i,
                    "lazy_sec": lazy,
                    "fused_sec": fused,
                    "sentinel_ms": [edge0, mid, edge1],
                }
            ),
            flush=True,
        )
    # one exactness spot-check at a size where collect is safe
    small = docs.filter(F.col("doc_id") < 20_000)
    l = sorted(
        map(tuple, dedup.minhash_verified_pairs(small, fused=False).collect())
    )
    f = sorted(
        map(tuple, dedup.minhash_verified_pairs(small, fused=True).collect())
    )
    print(
        json.dumps({"parity_rows": len(l), "parity_equal": l == f}),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
