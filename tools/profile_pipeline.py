"""Bounded profile of the pipeline bench key's spike pattern
(VERDICT_r11 item 3): which STAGE inflates when pipeline_clean_corpus
spikes ~1.6-2x on sentinel-quiet sections?

Runs N trials (default 10) of the exact bench shape — clean_corpus on
the sf0.1 documents table + noop write — with the stage_stats hook
splitting each trial into its three job boundaries:

- survivors_materialize: scan + quality trio + PII mask + exact dedup
  (the page-cache-sensitive stage: it re-reads the parquet bytes every
  trial, everything later reads Spark block-manager cache);
- drop_set: the multi-pass MinHash LSH discovery (reads cache);
- anti_join_materialize: left-anti join + result pin (reads cache);
- noop_write: the bench's final write (reads the result cache).

Each trial is bracketed by bench.py's spin_sentinel edge samples so an
externally-contended trial is visible next to its stage walls (sampling
only at the edges — CLAUDE.md: never spin DURING a measured window).
Prints one JSON line per trial and a closing summary line with per-stage
min/max/spread; a spiking trial names its inflating stage directly.

Usage: python tools/profile_pipeline.py [n_trials] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import spin_sentinel  # noqa: E402


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from lakeshack_spark.operators.pipeline import clean_corpus
    from lakeshack_spark.session import get_spark
    from lakeshack_spark.sources.catalog import load_table

    spark = get_spark(app_name="profile_pipeline")
    docs = load_table(spark, sf_dir, "documents")
    trials: list[dict] = []
    try:
        for i in range(n_trials):
            edges_before = [spin_sentinel(), spin_sentinel()]
            stages: list = []
            t0 = time.time()
            out = clean_corpus(docs, stage_stats=stages)
            t1 = time.time()
            out.write.format("noop").mode("overwrite").save()
            noop = round(time.time() - t1, 3)
            out.unpersist()
            total = round(time.time() - t0, 3)
            edges_after = [spin_sentinel(), spin_sentinel()]
            rec = {
                "trial": i,
                "total": total,
                **{name: wall for name, wall in stages},
                "noop_write": noop,
                "sentinel_edges_ms": edges_before + edges_after,
            }
            trials.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        spark.stop()
    stage_names = [
        "survivors_materialize", "drop_set", "anti_join_materialize",
        "noop_write", "total",
    ]
    summary = {}
    for s in stage_names:
        vals = [t[s] for t in trials if s in t]
        if vals:
            summary[s] = {
                "min": min(vals),
                "max": max(vals),
                "spread": round(max(vals) / max(min(vals), 1e-9), 2),
            }
    print(json.dumps({"summary": summary, "n_trials": len(trials)}))


if __name__ == "__main__":
    main()
