"""Retrieval scale stress: persisted bucket-partitioned inverted index
at 100k → 1M documents with exact planted ground truth.

Mirrors the other decade-up evidence points (dedup 1M docs, ANN 1M
vectors, CC 1M nodes) for the retrieval family's 100 TB claim: the
corpus is exploded and aggregated ONCE at build time
(`postings_index_write`); a term query then reads only its terms'
bucket directories via plan-time partition pruning plus a pushed
`term IN` Parquet predicate (`postings_index_search`).

The corpus is deterministic (modulo vocabulary, no RNG): every
``step``-th document carries two rare needle terms; an AND query for
them has an exactly known hit set, asserted EQUAL at every size, and
also asserted equal to the unindexed `boolean_search` scan of the raw
corpus (same semantics, no index).

Expected shape: build scales with corpus (one explode + one shuffle);
probe scales with the QUERIED BUCKETS' bytes (2 of 64 directories
here), not with query-irrelevant index bytes — its exponent must sit
well under build's.

Usage: python tools/stress_retrieval.py [--docs 100000,1000000]
       [--buckets 64] [--vocab 50000]
"""

from __future__ import annotations

import argparse
import math
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="100000,1000000")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--step", type=int, default=1000,
                    help="every step-th doc carries the needle terms")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators import retrieval
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_retrieval")
    sizes = [int(s) for s in args.docs.split(",")]
    V, nb, step = args.vocab, args.buckets, args.step
    needles = ["needlealpha", "needlebeta"]
    results: list[dict] = []

    # warm-up (uncounted): JIT/codegen + Python-worker spin-up
    warm = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("wa"), F.lit("wb")).alias("text"),
    )
    retrieval.boolean_search(warm, ["wa"]).count()

    for n in sizes:
        body = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    ((F.col("id") * 7 + F.lit(j * 13)) % V).cast("string"),
                )
                for j in range(10)
            ],
        )
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % step == 0,
                F.concat_ws(" ", body, F.lit(" ".join(needles))),
            )
            .otherwise(body)
            .alias("text"),
        ).persist()
        docs.count()
        expect = set(range(0, n, step))

        d = tempfile.mkdtemp(prefix=f"stress_retr_{n}_")
        t0 = time.time()
        retrieval.postings_index_write(docs, d, n_buckets=nb)
        build_sec = time.time() - t0

        t0 = time.time()
        probed = retrieval.postings_index_search(
            spark, d, needles, mode="and", n_buckets=nb
        ).collect()
        probe_sec = time.time() - t0
        got = {r["doc_id"] for r in probed}
        assert got == expect, (
            f"probe hits {len(got)} != planted {len(expect)} at n={n}"
        )
        assert all(r["n_terms_matched"] == 2 for r in probed)

        t0 = time.time()
        brute = {
            r["doc_id"]
            for r in retrieval.boolean_search(
                docs, needles, mode="and"
            ).collect()
        }
        brute_sec = time.time() - t0
        assert brute == expect, f"brute scan disagrees at n={n}"

        print(
            f"n={n}: build {build_sec:.1f}s  probe({len(needles)} terms, "
            f"2/{nb} buckets) {probe_sec:.1f}s  brute scan {brute_sec:.1f}s"
            f"  hits {len(got)} exact"
        )
        results.append(
            {"n": n, "build": build_sec, "probe": probe_sec,
             "brute": brute_sec}
        )
        docs.unpersist()
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    for prev, cur in zip(results, results[1:]):
        ratio = math.log(cur["n"] / prev["n"])
        exps = {
            stage: round(math.log(cur[stage] / prev[stage]) / ratio, 2)
            for stage in ("build", "probe", "brute")
        }
        print(f"scaling exponents {prev['n']}→{cur['n']} (1.0=linear): {exps}")
    spark.stop()


if __name__ == "__main__":
    main()
