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

Scale-sweep mode (VERDICT r9 #3 — the 1M-vector evidence point):

    python tools/stress_ivf.py --scale-sweep 50000,200000,1000000

runs the build-once/probe-many index path at each corpus size with
PLANTED duplicate queries (exact ×2.0 float32 scalings of corpus
vectors: bit-identical direction, cosine exactly 1.0, same argmax
cell), records per-stage walls — brute-force baseline, cell
assignment, index build (assignment + cell-partitioned write), index
probe — asserts planted recall@k == 1.0 at every size, and prints the
per-stage scaling exponent between consecutive sizes
(ln(t2/t1)/ln(n2/n1); 1.0 = linear in corpus size, ≈0 = probe cost
decoupled from corpus size, which is the 100 TB claim for the
partition-pruned probe).
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
    ap.add_argument("--scale-sweep", default=None,
                    help="comma-separated corpus sizes: run the persisted-"
                    "index build/assign/probe scaling sweep instead of the "
                    "recall curve (e.g. 50000,200000,1000000)")
    ap.add_argument("--nprobe", type=int, default=8,
                    help="probe width for the scale sweep")
    args = ap.parse_args()

    if args.scale_sweep:
        scale_sweep(args)
        return

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


def scale_sweep(args) -> None:
    """Build/assign/probe walls across corpus sizes (see module doc)."""
    import math
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakeshack_spark.operators import similarity
    from lakeshack_spark.session import get_spark

    sizes = [int(s) for s in args.scale_sweep.split(",")]
    C, dim, qn, k, nprobe = (
        args.clusters, args.dim, args.queries, args.k, args.nprobe
    )
    spark = get_spark(app_name="stress_ivf_sweep")
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(C, dim))
    centroids = spark.createDataFrame(
        [(int(i), [float(x) for x in centers[i]]) for i in range(C)],
        "centroid_id long, centroid array<double>",
    )
    results: list[dict] = []
    # one uncounted warm-up size: the first Spark jobs of a session pay
    # JIT/codegen + Python-worker spin-up, which otherwise lands
    # entirely on the smallest timed size and corrupts the exponents
    # (measured: assign "sped up" 2.5→0.7 s across a 20× size growth)
    for loop_idx, n in enumerate([5_000] + sizes):
        is_warmup = loop_idx == 0  # ADVICE r10: flag by position, not by
        # size membership — a user sweeping n=5000 would otherwise record
        # the JIT-inflated warm-up walls AND run that size twice
        assign_ids = rng.integers(0, C, size=n)
        points = (
            centers[assign_ids] + args.noise * rng.normal(size=(n, dim))
        ).astype(np.float32)
        # Planted duplicate queries: ×2.0 is an exact float32 scaling
        # (exponent bump, mantissa intact) — bit-identical direction,
        # cosine exactly 1.0 against the source, same cosine-argmax
        # cell, so nprobe ≥ 1 probes the source's cell and recall@k of
        # the plants is deterministically 1.0 when the path is correct.
        src = np.arange(0, n, max(1, n // qn))[:qn]
        qpts = points[src] * np.float32(2.0)
        d = tempfile.mkdtemp(prefix=f"stress_ivf_sweep_{n}_")
        pq.write_table(
            pa.table({
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [row for row in points], pa.list_(pa.float32())
                ),
            }),
            f"{d}/vecs.parquet",
        )
        pq.write_table(
            pa.table({
                "vec_id": pa.array(np.arange(n, n + len(src)), pa.int64()),
                "embedding": pa.array(
                    [row for row in qpts], pa.list_(pa.float32())
                ),
            }),
            f"{d}/queries.parquet",
        )
        vecs = (
            spark.read.parquet(f"{d}/vecs.parquet").repartition(32).persist()
        )
        vecs.count()
        queries = spark.read.parquet(f"{d}/queries.parquet")

        t0 = time.time()
        brute = similarity.cosine_topk(vecs, queries, k=k).collect()
        brute_sec = time.time() - t0

        t0 = time.time()
        n_assigned = similarity.ivf_assign(vecs, centroids).count()
        assign_sec = time.time() - t0
        assert n_assigned == n

        idx_path = f"{d}/ivf_index"
        t0 = time.time()
        similarity.ivf_index_write(vecs, centroids, idx_path)
        build_sec = time.time() - t0

        t0 = time.time()
        probed = similarity.ivf_index_probe(
            spark, idx_path, queries, centroids, k=k, nprobe=nprobe
        ).collect()
        probe_sec = time.time() - t0

        # planted recall@k: every query must see its source vector
        by_q: dict[int, set] = {}
        for r in probed:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recall = sum(
            1 for i, s in enumerate(src) if int(s) in by_q.get(n + i, set())
        ) / len(src)
        brute_by_q: dict[int, set] = {}
        for r in brute:
            brute_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        brute_recall = sum(
            1
            for i, s in enumerate(src)
            if int(s) in brute_by_q.get(n + i, set())
        ) / len(src)
        assert recall == 1.0, f"planted probe recall@{k} {recall} at n={n}"
        assert brute_recall == 1.0, (
            f"planted brute recall@{k} {brute_recall} at n={n}"
        )
        vecs.unpersist()
        shutil.rmtree(d, ignore_errors=True)
        if is_warmup:
            continue  # warm-up pass: asserted, not recorded
        print(
            f"n={n}: brute {brute_sec:.1f}s  assign {assign_sec:.1f}s  "
            f"build {build_sec:.1f}s  probe(nprobe={nprobe}/{C}) "
            f"{probe_sec:.1f}s  planted recall@{k} 1.0"
        )
        results.append({
            "n": n, "brute": brute_sec, "assign": assign_sec,
            "build": build_sec, "probe": probe_sec,
        })
    for prev, cur in zip(results, results[1:]):
        ratio = math.log(cur["n"] / prev["n"])
        exps = {
            stage: round(math.log(cur[stage] / prev[stage]) / ratio, 2)
            for stage in ("brute", "assign", "build", "probe")
        }
        print(
            f"scaling exponents {prev['n']}→{cur['n']} "
            f"(1.0=linear): {exps}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
