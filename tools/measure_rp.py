"""A/B: repeated_passage_stats baseline (gram lineage evaluated twice:
flagged-aggregate build + semi-join probe) vs a persisted-grams variant
(one gram pass materialized, both consumers read the cache).

Bench shape: sf docs + planted 30-token quotes, noop sink, interleaved
in ONE process so box drift cancels. Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/measure_rp.py [rounds]
"""

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeshack_spark.session import get_spark, spread_small_input  # noqa: E402
from lakeshack_spark.operators.text import (  # noqa: E402
    repeated_passage_stats,
    words_col,
    gram_array,
)


def rp_persisted(df, k=8, min_docs=2):
    """Variant: identical lineage, but the (doc_id, pos, gh) gram frame
    is persisted+counted once and feeds both the flagged aggregate and
    the semi-join probe."""
    from lakeshack_spark.operators.dedup import _h64

    df = spread_small_input(df)
    base = df.select(F.col("doc_id"), words_col("text").alias("__w"))
    grams = (
        base.select("doc_id", gram_array(F.col("__w"), k).alias("__g"))
        .select("doc_id", F.posexplode("__g").alias("pos", "__gram"))
        .select("doc_id", "pos", _h64(F.col("__gram")).alias("gh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    grams.count()  # eager: stop per-consumer recomputation (CLAUDE.md)
    flagged = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("gh")
    )
    hits = grams.join(flagged, "gh", "left_semi")
    acc0 = F.struct(
        F.lit(-k).cast("int").alias("prev"), F.lit(0).cast("long").alias("cov")
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_grams"),
        F.aggregate(
            F.array_sort(F.collect_list("pos")),
            acc0,
            lambda acc, p: F.struct(
                p.alias("prev"),
                (acc["cov"] + F.least(F.lit(k), p - acc["prev"]).cast("long")).alias(
                    "cov"
                ),
            ),
            lambda acc: acc["cov"],
        ).alias("dup_tokens"),
    )
    out = (
        df.select(
            F.col("doc_id"),
            F.size(words_col("text")).alias("n_tokens"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0).cast("long")).alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
        )
        .withColumn("dup_frac", F.col("dup_tokens") / F.col("n_tokens"))
    )
    return out, grams


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark("measure_rp")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    quote_offset = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    quotes = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(quote_offset)).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 5, 30)).alias("text"),
    )
    quoted = docs.select("doc_id", "text").unionByName(quotes)

    if os.environ.get("RP_DUMP_PLAN"):
        from tools.dump_plans import formatted_plan

        with open(os.environ["RP_DUMP_PLAN"], "w") as fh:
            fh.write(formatted_plan(repeated_passage_stats(quoted, k=8, min_docs=2)))

    base_t, pers_t = [], []
    for r in range(rounds):
        spark.sparkContext.setJobDescription(f"rp-base r{r}")
        t0 = time.time()
        repeated_passage_stats(quoted, k=8, min_docs=2).write.format("noop").mode(
            "overwrite"
        ).save()
        base_t.append(time.time() - t0)

        spark.sparkContext.setJobDescription(f"rp-persist r{r}")
        t0 = time.time()
        out, handle = rp_persisted(quoted, k=8, min_docs=2)
        out.write.format("noop").mode("overwrite").save()
        pers_t.append(time.time() - t0)
        handle.unpersist(blocking=True)

    def stats(xs):
        s = sorted(xs)
        return f"min={s[0]:.2f} med={s[len(s) // 2]:.2f} all={[round(x, 2) for x in xs]}"

    print("baseline :", stats(base_t))
    print("persisted:", stats(pers_t))

    # parity spot check (cell-exact) on a small slice
    a = repeated_passage_stats(quoted, k=8, min_docs=2)
    b, handle = rp_persisted(quoted, k=8, min_docs=2)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    handle.unpersist()
    print("parity exceptAll diff rows:", diff)


if __name__ == "__main__":
    main()
