"""Capture .explain('formatted') for the dedup-family internal lineages
the r14 optimization touches (plan-only, nothing executed) — the
registered entries wrapping them either collect() internally
(minhash_drop_set_docs) or hide the interesting subtree behind the
result projection, so dump_plans.py can't show the shapes that matter.

Writes, under --out (default plans/r14) with --suffix:
  minhash_drop_set_pass1<sfx>.txt   pass-1 candidate rows + shingle frame
  drop_set_pass2_audience<sfx>.txt  fb / fb_buckets / tier-1 estimate frames
  minhash_dedup_verified<sfx>.txt   the lazy verified-pairs plan (300 docs)
  minhash_verified_fused<sfx>.txt   the fused verified-pairs plan (if the
                                    code version has it; skipped otherwise)

Usage: python tools/dump_dedup_plans.py [--sf DIR] [--out plans/r14]
                                        [--suffix _before]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dump_plans import formatted_plan  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators import dedup
    from lakeshack_spark.session import get_spark
    from lakeshack_spark.sources.catalog import load_table

    spark = get_spark(app_name="dump_dedup_plans")
    os.makedirs(args.out, exist_ok=True)
    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")

    def write(name: str, text: str) -> None:
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")

    # ---- pass-1 lineage (the shapes minhash_drop_set derives from its
    # one persisted per-doc frame; captured unpersisted — at runtime the
    # subtrees below the posexplode/projection read the cache) ----------
    perdoc = dedup._banded_rows_arrow(
        docs, "text", "doc_id", 32, 8, 1,
        with_buckets=False, with_sig_key=True, perdoc_shingles=True,
    )
    banded = perdoc.select(
        F.col("doc_id"),
        F.col("__sigkey"),
        F.col("__classkey"),
        F.posexplode("__buckets").alias("band", "bucket"),
    )
    sh = perdoc.select("doc_id", "__sh")
    _, cand_rows = dedup.minhash_first_candidates(
        banded, "doc_id", with_rows=True
    )
    write(
        "minhash_drop_set_pass1",
        "== drop_set pass-1 candidate rows (band,bucket window over the\n"
        "   posexplode of the per-doc frame; reads the perdoc cache at\n"
        "   runtime) ==\n\n"
        + formatted_plan(cand_rows)
        + "\n\n== the shingle frame (projection of the same pass) ==\n\n"
        + formatted_plan(sh),
    )

    # ---- pass-2 audience + tier-1 estimate frames ----------------------
    failed_docs = sh.select(F.col("doc_id").alias("id_b")).limit(10)
    try:
        fb, fb_buckets, reps = dedup._pass2_audience(
            banded, sh, failed_docs, "doc_id", cand_rows
        )
    except TypeError:  # pre-r14 signature (no cand_rows argument)
        fb, fb_buckets, reps = dedup._pass2_audience(
            banded, sh, failed_docs, "doc_id"
        )
    failed_ids = failed_docs.select(
        F.col("id_b").alias("doc_id"), F.lit(1).alias("__f")
    )
    tier1 = (
        banded.join(fb_buckets, ["band", "bucket"], "left_semi")
        .join(failed_ids, "doc_id", "left")
        .groupBy("band", "bucket")
        .agg(
            F.sum("__f").alias("__nf"),
            F.count_distinct(
                "__classkey" if "__classkey" in banded.columns else "__sigkey"
            ).alias("__bcls"),
        )
        .agg(F.sum(F.col("__nf") * F.col("__bcls")))
    )
    write(
        "drop_set_pass2_audience",
        "== fb (failed docs' pass-2 rows) ==\n\n"
        + formatted_plan(fb)
        + "\n\n== fb_buckets ==\n\n"
        + formatted_plan(fb_buckets)
        + "\n\n== reps (class collapse) ==\n\n"
        + formatted_plan(reps)
        + "\n\n== tier-1 estimate aggregate ==\n\n"
        + formatted_plan(tier1),
    )

    # ---- verified pairs: the headline 300-doc lazy plan ----------------
    docs300 = (
        load_table(spark, args.sf, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    write(
        "minhash_dedup_verified",
        "== minhash_verified_pairs, lazy route (300-doc headline shape) ==\n\n"
        + formatted_plan(
            dedup.minhash_verified_pairs(
                docs300, num_hashes=64, bands=16, k=1, threshold=0.9
            )
        ),
    )

    # ---- verified pairs, fused route (r14+ only) ------------------------
    if "fused" in dedup.minhash_verified_pairs.__code__.co_varnames:
        write(
            "minhash_verified_fused",
            "== minhash_verified_pairs, fused route (forced; the per-doc\n"
            "   frame is localCheckpoint'ed at runtime) ==\n\n"
            + formatted_plan(
                dedup.minhash_verified_pairs(
                    docs300,
                    num_hashes=64,
                    bands=16,
                    k=1,
                    threshold=0.9,
                    fused=True,
                )
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
