"""PQ-ADC recall/throughput probe — the PQ analogue of tools/stress_ivf.py.

Two regimes:

1. A synthetic CLUSTERED corpus (Gaussian clusters, seeded numpy — a
   stress-tool synthesis, not a query path, so the no-RNG rule does not
   apply): the structure PQ codebooks exist to exploit. Measures exact
   squared-L2 top-k vs ADC over seed codebooks (pq_codebooks) and
   Lloyd-trained codebooks (pq_train) at n_codes 16/64.
2. The sf embeddings (uniform random, worst case for quantization):
   recorded honestly — random high-dim data has no structure to quantize,
   so seed-codebook recall is near-chance; this is the regime where the
   int8/JL tiers (which preserve ALL coordinates) are the right
   compressors and PQ's 64x is overkill.

Run: python tools/stress_pq.py [--vectors 50000] [--clusters 64] [--dim 64]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def exact_l2_topk(sim, F, emb, queries, k):
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                -(
                    sim.dot_d(F.col("__cv"), F.col("__cv"))
                    - F.lit(2.0) * sim.dot_d(F.col("__qv"), F.col("__cv"))
                    + sim.dot_d(F.col("__qv"), F.col("__qv"))
                )
            ).alias("cosine"),
        )
    )
    return sim._topk_per_query(scored, k).select("query_id", "neighbor_id")


def run_regime(spark, sim, F, emb, queries, k, label, clusters=None, qclusters=None):
    # clusters/qclusters: optional {id: cluster} maps — when given, also
    # report the fraction of shortlist pairs landing in the query's true
    # cluster (PQ's job in a collapsed-cluster corpus is ROUTING: members
    # of one cluster quantize to the same codes, so within-cluster order
    # is tie-broken by id and recall@shortlist ~= shortlist/cluster_size
    # by construction; the cluster-hit rate is the signal that matters).
    t0 = time.time()
    exact_rows = exact_l2_topk(sim, F, emb, queries, k).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    t_exact = time.time() - t0
    n = emb.count()
    print(f"[{label}] n={n} exact L2 top-{k}: {t_exact:.2f}s")
    shortlist = 100  # ADC is a shortlist tier: exact re-rank reads only
    # shortlist vectors per query, so recall@shortlist is the metric that
    # matches the deployment (Jegou et al.'s recall@R) — recall@k would
    # ask the quantizer to ORDER near-equidistant within-cluster points,
    # which no coarse code can (and the exact tier re-ranks anyway).
    for trained in (False, True):
        for n_codes in (16, 64):
            if trained:
                books = sim.pq_train(emb, m=4, n_codes=n_codes, sample_n=4096, iters=10)
            else:
                books = sim.pq_codebooks(emb, m=4, n_codes=n_codes)
            if trained and n_codes == 64:
                # one timing point for the expression-path encoder, to
                # record the Arrow speedup honestly
                t0 = time.time()
                sim.pq_encode(emb, books).select(
                    "vec_id", "code_0", "code_1", "code_2", "code_3"
                ).count()
                print(f"[{label}] expression-path encode n_codes=64: {time.time()-t0:.2f}s")
            t0 = time.time()
            enc = sim.pq_encode_arrow(emb, books).select(
                "vec_id", "code_0", "code_1", "code_2", "code_3"
            ).persist()
            enc.count()  # eager: encode once, scan many (stored-codes model)
            t_enc = time.time() - t0
            t0 = time.time()
            adc = {
                (r.query_id, r.neighbor_id)
                for r in sim.pq_adc_topk(enc, queries, books, k=shortlist).collect()
            }
            t_adc = time.time() - t0
            recall = len(exact & adc) / len(exact)
            kind = "trained" if trained else "seed"
            extra = ""
            if clusters is not None:
                hits = sum(
                    1 for (q, nb) in adc if clusters.get(nb) == qclusters.get(q)
                )
                extra = f", cluster-hit = {hits / len(adc):.3f}"
            print(
                f"[{label}] PQ {kind} n_codes={n_codes}: encode {t_enc:.2f}s, "
                f"ADC scan {t_adc:.2f}s, recall@{k} in shortlist-{shortlist}"
                f" = {recall:.3f}{extra}"
            )
            enc.unpersist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=50_000)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--adc-build-queries", type=int, default=10_000)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from lakeshack_spark.operators import similarity as sim
    from lakeshack_spark.session import get_spark
    from pyspark.sql import functions as F

    n, C, dim, qn, k = args.vectors, args.clusters, args.dim, args.queries, args.k
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(C, dim))
    assign = rng.integers(0, C, size=n)
    points = centers[assign] + args.noise * rng.normal(size=(n, dim))
    d = tempfile.mkdtemp(prefix="stress_pq_")

    def write(path, ids, mat):
        pqt.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [row.astype(np.float32) for row in mat],
                        pa.list_(pa.float32()),
                    ),
                }
            ),
            path,
        )

    qassign = rng.integers(0, C, size=qn)
    qpts = centers[qassign] + args.noise * rng.normal(size=(qn, dim))
    write(f"{d}/vecs.parquet", np.arange(n), points)
    # query ids start past max(vec_id)+1 (CLAUDE.md fixed-offset collision)
    write(f"{d}/queries.parquet", np.arange(n, n + qn), qpts)
    clusters = {int(i): int(c) for i, c in enumerate(assign)}
    qclusters = {int(n + i): int(c) for i, c in enumerate(qassign)}

    spark = get_spark(app_name="stress_pq", shuffle_partitions=32)
    emb = spark.read.parquet(f"{d}/vecs.parquet")
    queries = spark.read.parquet(f"{d}/queries.parquet")
    run_regime(spark, sim, F, emb, queries, k, "clustered",
               clusters=clusters, qclusters=qclusters)

    # Full IVF-PQ (coarse cells + residual codes), the FAISS IVFADC shape:
    # Lloyd-refined coarse centroids, residual-trained books, nprobe sweep.
    cents = sim.sample_centroids(emb, C)
    for _ in range(3):
        # materialize each refinement into a local relation: centroid
        # consumers (_centroid_entries in encode/search/train) each
        # collect(), and an unmaterialized 3-iteration Lloyd lineage
        # would replay per consumer (measured: dominated the first cut
        # of this sweep)
        refined = sim.kmeans_update(emb, cents).select(
            "centroid_id", "centroid"
        )
        cents = spark.createDataFrame(refined.collect(), refined.schema)
    res = sim.ivf_residuals(emb, cents)
    books = sim.pq_train(res, m=4, n_codes=64, sample_n=4096, iters=10,
                         vec_col="__res")
    t0 = time.time()
    enc = sim.ivfpq_encode(emb, cents, books, assign_impl="arrow").select(
        "vec_id", "cell", "code_0", "code_1", "code_2", "code_3"
    ).persist()
    enc.count()
    print(
        f"[ivfpq] encode (cell + residual codes): {time.time()-t0:.2f}s"
        " (assign_impl='arrow': the BLAS assignment twin - the exact"
        " JVM argmax alone measured ~34s at this size, near-tie parity"
        " unit-pinned)"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in exact_l2_topk(sim, F, emb, queries, k).collect()
    }
    for nprobe in (1, 4, 16):
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.ivfpq_search(
                enc, queries, cents, books, k=100, nprobe=nprobe
            ).collect()
        }
        recall = len(exact & got) / len(exact)
        print(
            f"[ivfpq] nprobe={nprobe}/{C} (~{nprobe/C:.1%} of corpus scanned):"
            f" search {time.time()-t0:.2f}s,"
            f" recall@{k} in shortlist-100 = {recall:.3f}"
        )
    # ADC table construction at large query counts (VERDICT_r7 item 3):
    # the driver path folds O(|Q|·m·n_codes·ds) doubles on one core; the
    # distributed builder (mapInPandas, same fold) keeps driver cost
    # O(1). Time both at 1k and --adc-build-queries — driver-path wall
    # time scales ~linearly with |Q|, distributed stays near-flat.
    nb = args.adc_build_queries
    bpts = rng.normal(size=(nb, dim))
    write(f"{d}/buildq.parquet", np.arange(10**7, 10**7 + nb), bpts)
    bq = spark.read.parquet(f"{d}/buildq.parquet")
    ds = dim // len(books)
    for nq in (1000, nb):
        sub = spark.read.parquet(f"{d}/buildq.parquet").filter(
            F.col("vec_id") < 10**7 + nq
        )
        t0 = time.time()
        rows = sub.select("vec_id", "embedding").collect()
        for r in rows:
            sim._adc_tables([float(x) for x in r.embedding], books, ds)
        t_driver = time.time() - t0
        t0 = time.time()
        cnt = sim._distributed_adc_tables(
            sub, books, ds, "vec_id", "embedding"
        ).count()
        t_dist = time.time() - t0
        assert cnt == nq
        print(
            f"[adc-build] |Q|={nq}: driver build {t_driver:.2f}s, "
            f"distributed build {t_dist:.2f}s"
        )
    t0 = time.time()
    got = sim.ivfpq_search(
        enc, bq, cents, books, k=5, nprobe=2, driver_tables_max_queries=0
    ).count()
    print(
        f"[adc-build] ivfpq_search distributed-tables |Q|={nb}: "
        f"{time.time()-t0:.2f}s, {got} result rows"
    )
    enc.unpersist()

    sf_emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    sf_q = spark.createDataFrame(
        sf_emb.orderBy(F.col("vec_id").desc()).limit(args.queries).collect(),
        sf_emb.schema,
    ).select("vec_id", "embedding")
    run_regime(spark, sim, F, sf_emb.select("vec_id", "embedding"), sf_q, k, "sf0.1-random")
    spark.stop()


if __name__ == "__main__":
    main()
