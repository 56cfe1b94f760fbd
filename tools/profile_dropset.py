"""Per-stage profile of minhash_drop_set's internal job boundaries
(OPTIMIZATION_r14, VERDICT_r13 item 2: "attack the drop-set pass-1/pass-2
LSH discovery itself" — measure WHERE its 5-6 s goes before touching it).

Two bench shapes, exactly as bench.py builds them:

- ``giant``: sf0.1 documents + a planted 2000-replica duplicate cluster,
  default params (32 hashes / 8 bands / k=1) — the drop_set_giant_cluster
  key's corpus (k=1 mega-buckets, failure-heavy, pass-2 exercised);
- ``pipeline``: the clean_corpus survivor set (quality trio + PII mask +
  exact dedup, persisted), minhash_cfg 32/8/k=2 — the drop-set stage of
  the pipeline_clean_corpus key (low-failure shape).

Each trial appends the operator's ``stage_stats`` job-boundary walls
(banding_materialize / pass1_verify / route:<impl> / pass2_result),
bracketed by bench.py's spin-sentinel EDGE samples (never spinning during
a measured window — CLAUDE.md).

Usage: python tools/profile_dropset.py [n_trials] [shape]
  shape: giant | pipeline | both (default both)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import spin_sentinel  # noqa: E402


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    shape = sys.argv[2] if len(sys.argv) > 2 else "both"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from lakeshack_spark.operators.dedup import minhash_drop_set
    from lakeshack_spark.operators.pipeline import CleanConfig, clean_corpus
    from lakeshack_spark.session import get_spark
    from lakeshack_spark.sources.catalog import load_table

    spark = get_spark(app_name="profile_dropset")
    docs = load_table(spark, sf_dir, "documents")

    corpora: list[tuple[str, object, dict]] = []
    if shape in ("giant", "both"):
        giant = (
            docs.orderBy("doc_id")
            .limit(1)
            .crossJoin(spark.range(2000).select(F.col("id").alias("__rep")))
            .select(
                (F.lit(10_000_000) + F.col("__rep")).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"],
            )
        )
        planted = docs.unionByName(giant.select(*docs.columns)).select(
            "doc_id", "text"
        )
        corpora.append(("giant", planted, {}))
    if shape in ("pipeline", "both"):
        # survivors persisted+counted so drop_set reads cache, exactly
        # like clean_corpus's profiled path
        cfg = CleanConfig(near_dedup=False)
        survivors = clean_corpus(docs, cfg)
        survivors.count()
        corpora.append(
            (
                "pipeline",
                survivors.select("doc_id", "text"),
                dict(num_hashes=32, bands=8, k=2),
            )
        )

    # one warm-up drop_set so codegen/python workers don't ride trial 1
    w = minhash_drop_set(corpora[0][1], "text", "doc_id", **corpora[0][2])
    w.unpersist()

    for name, corpus, kw in corpora:
        for i in range(n_trials):
            edge0 = [spin_sentinel(), spin_sentinel()]
            stages: list = []
            t0 = time.time()
            drops = minhash_drop_set(
                corpus, "text", "doc_id", stage_stats=stages, **kw
            )
            total = round(time.time() - t0, 3)
            drops.unpersist()
            edge1 = [spin_sentinel(), spin_sentinel()]
            print(
                json.dumps(
                    {
                        "shape": name,
                        "trial": i,
                        "total": total,
                        "stages": stages,
                        "sentinel_ms": [round(s, 1) for s in edge0 + edge1],
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
