"""IVF ANN recall/cost curve: the approximate tier's actual tradeoff,
measured — `ivf_topk` at nprobe = n_centroids is pinned exactly equal to
brute force by the driver gate; this tool characterizes the APPROXIMATE
configurations (nprobe < C) that the 100 TB story depends on.

A synthetic clustered corpus (C Gaussian clusters, seeded numpy — a
stress-tool synthesis, not a query path, so the no-RNG rule does not
apply) is probed at nprobe = 1..C. Expected shape: recall@k climbs
toward 1.0 with nprobe while scored-candidate volume grows ~nprobe/C of
the corpus; recall 1.0 exactly at nprobe = C.

Usage: python tools/stress_ivf.py [--vectors 50000] [--clusters 64]
       [--dim 32] [--queries 20] [--k 10]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=50_000)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--noise", type=float, default=1.0,
                    help="cluster spread relative to unit-normal centers; "
                    "~1.0 overlaps clusters so true neighbors straddle cells")
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakeshack_spark.operators import similarity
    from lakeshack_spark.session import get_spark

    n, C, dim, qn, k = args.vectors, args.clusters, args.dim, args.queries, args.k
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(C, dim))
    assign = rng.integers(0, C, size=n)
    points = centers[assign] + args.noise * rng.normal(size=(n, dim))
    qpts = centers[rng.integers(0, C, size=qn)] + args.noise * rng.normal(size=(qn, dim))

    d = tempfile.mkdtemp(prefix="stress_ivf_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in points],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        f"{d}/vecs.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # query ids start past the corpus ids (max(vec_id)+1 = n): a
                # fixed offset would collide at larger --vectors and the
                # self-match filter would hide real neighbors (CLAUDE.md)
                "vec_id": pa.array(np.arange(n, n + qn), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in qpts],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        f"{d}/queries.parquet",
    )

    spark = get_spark(app_name="stress_ivf")
    vecs = spark.read.parquet(f"{d}/vecs.parquet").repartition(32).persist()
    vecs.count()
    queries = spark.read.parquet(f"{d}/queries.parquet")
    centroids = spark.createDataFrame(
        [(int(i), [float(x) for x in centers[i]]) for i in range(C)],
        "centroid_id long, centroid array<double>",
    )

    t0 = time.time()
    truth = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(vecs, queries, k=k).collect()
    }
    truth_sets = {}
    for (qid, _rank), nid in truth.items():
        truth_sets.setdefault(qid, set()).add(nid)
    print(f"brute-force top-{k} ({n} vecs x {qn} queries): {time.time()-t0:.1f}s")

    sweep = sorted({p for p in (2**i for i in range(C.bit_length())) if p < C} | {C})
    for nprobe in sweep:
        t0 = time.time()
        got = similarity.ivf_topk(
            vecs, queries, centroids, k=k, nprobe=nprobe
        ).collect()
        dt = time.time() - t0
        hits = sum(
            1 for r in got if r["neighbor_id"] in truth_sets.get(r["query_id"], ())
        )
        recall = hits / (qn * k)
        print(
            f"nprobe={nprobe:3d}: recall@{k} = {recall:.3f} "
            f"(~{nprobe}/{C} of corpus scored) in {dt:.1f}s"
        )
        if nprobe == C:
            assert recall == 1.0, f"nprobe=C must equal brute force, got {recall}"
    spark.stop()


if __name__ == "__main__":
    main()
