"""Cross-doc repeated-passage stress: exact planted coverage one decade
above the bench corpus, with a deliberately HOT shared passage.

The bench's repeated_passages key runs the sf0.1 documents table
(~tens of k docs, quotes planted per-host so each gram is shared by
exactly 2 docs). This tool stresses the opposite regime at 10× the
size: every ``--quote-every``-th doc carries the SAME 30-token quote,
so each in-quote gram's posting holds N/quote_every documents — a
single boilerplate/licence-header passage shared by tens of thousands
of docs, the realistic hot case for the gram-hash shuffle and the
flagged-hash semi join.

Ground truth is exact and free by construction: host bodies use
per-doc-disjoint vocabulary (no accidental cross-doc k-gram), so a
quote doc's covered interval is precisely the quote's token range —
``dup_tokens == quote_len`` and ``n_tokens == body+quote`` for every
quote doc, ``dup_tokens == 0`` for every other doc. All asserted, at
every size; the wall-time scaling exponent between sizes is printed
(the op is ONE O(total tokens) explode + one gram-hash groupBy — it
must scale ~linearly, never quadratically in the hot posting).

Usage: python tools/stress_text.py [--docs 30000,300000]
       [--body 50] [--quote 30] [--quote-every 10]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="30000,300000")
    ap.add_argument("--body", type=int, default=50)
    ap.add_argument("--quote", type=int, default=30)
    ap.add_argument("--quote-every", type=int, default=10)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators.text import repeated_passage_stats
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_text")
    sizes = [int(s) for s in args.docs.split(",")]
    B, Q, step, k = args.body, args.quote, args.quote_every, args.k
    quote = " ".join(f"qt{j}" for j in range(Q))

    # warm-up (uncounted)
    warm = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w{j}_"), F.col("id")) for j in range(12)]
        ).alias("text"),
    )
    repeated_passage_stats(warm, k=k).count()

    results = []
    for n in sizes:
        body = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"d{j}_"), F.col("id").cast("string"))
                for j in range(B)
            ],
        )
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % step == 0,
                F.concat_ws(" ", body, F.lit(quote)),
            )
            .otherwise(body)
            .alias("text"),
        ).persist()
        docs.count()
        n_quote = (n + step - 1) // step

        t0 = time.time()
        stats = repeated_passage_stats(docs, k=k).persist()
        stats.count()
        wall = time.time() - t0

        # quote docs: covered interval == exactly the quote's Q tokens
        ok_quote = stats.filter(
            (F.col("doc_id") % step == 0)
            & (F.col("n_tokens") == B + Q)
            & (F.col("dup_tokens") == Q)
        ).count()
        clean = stats.filter(
            (F.col("doc_id") % step != 0) & (F.col("dup_tokens") == 0)
        ).count()
        n_rows = stats.count()
        assert n_rows == n, f"{n_rows} stat rows for {n} docs"
        assert ok_quote == n_quote, (
            f"{ok_quote}/{n_quote} quote docs exactly covered at n={n}"
        )
        assert clean == n - n_quote, (
            f"{clean}/{n - n_quote} clean docs at n={n}"
        )
        print(
            f"n={n}: ~{n * (B + Q // step)} tokens, hot passage shared by "
            f"{n_quote} docs, {wall:.1f}s; all {n_quote} quote docs "
            f"dup_tokens=={Q} exactly, all {n - n_quote} others 0"
        )
        results.append({"n": n, "wall": wall})
        stats.unpersist()
        docs.unpersist()
    for prev, cur in zip(results, results[1:]):
        exp = math.log(cur["wall"] / prev["wall"]) / math.log(
            cur["n"] / prev["n"]
        )
        print(
            f"scaling exponent {prev['n']}→{cur['n']} (1.0=linear): {exp:.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
