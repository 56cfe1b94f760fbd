"""Iterative-operator stress: BPE training and PageRank at sf0.1 scale.

Both operators' scale claims are about PER-ROUND shape, not one-shot
wall time:

- ``bpe.bpe_train``: after the one corpus-wide histogram shuffle, every
  merge round touches only the VOCAB (pair aggregate + 1-row argmax
  collect + map-only merge fold). Round latency must therefore be flat
  in the round index (lineage is truncated by eager persists +
  periodic localCheckpoint) and independent of corpus row count once
  the histogram exists.
- ``graph.pagerank``: each round is ONE edges⋈ranks join against the
  checkpointed outdeg-carrying edge set (only the rank frame
  exchanges). Round latency must be flat; ranks are int64-exact, so
  total mass is also asserted conserved within the truncation bound
  (each in-edge truncates < 1 unit per round).

This tool runs both on real sf0.1 tables, asserts the invariants, and
prints per-round timings so a drifting-lineage regression (round time
growing with the index — exactly what localCheckpoint exists to stop)
shows up as numbers, not vibes.

Usage: python tools/stress_iterative.py [sf_dir] [n_merges] [n_iter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeshack_spark.operators import bpe
from lakeshack_spark.operators.graph import pagerank
from lakeshack_spark.session import get_spark


def stress_bpe(spark, sf_dir: str, n_merges: int) -> None:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.monotonic()
    vocab = bpe.initial_symbols(bpe.word_histogram(docs, "text")).persist()
    n_vocab = vocab.count()
    t_hist = time.monotonic() - t0
    print(f"bpe: vocab {n_vocab} words, histogram {t_hist:.2f}s")

    times = []
    merges = []
    cur = vocab
    for it in range(n_merges):
        t0 = time.monotonic()
        top = (
            bpe.pair_counts(cur)
            .orderBy(F.desc("n"), F.asc("pair_left"), F.asc("pair_right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r = top[0]["pair_left"], top[0]["pair_right"]
        merges.append((l, r, int(top[0]["n"])))
        nxt = bpe.apply_merge(cur, l, r)
        if (it + 1) % 8 == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        cur.unpersist()
        cur = nxt
        times.append(time.monotonic() - t0)
    head = ", ".join(f"{a}+{b}:{n}" for a, b, n in merges[:8])
    print(f"bpe: {len(merges)} merges, first: {head}")
    print("bpe: round times " + " ".join(f"{t:.2f}" for t in times))
    first3, last3 = sum(times[:3]) / 3, sum(times[-3:]) / 3
    print(f"bpe: first3 {first3:.2f}s last3 {last3:.2f}s (flatness check)")
    # merged symbols must keep total character mass: every word's syms
    # concatenate back to the word
    bad = (
        cur.withColumn("rejoined", F.concat_ws("", F.col("syms")))
        .filter(F.col("rejoined") != F.col("w"))
        .count()
    )
    assert bad == 0, f"{bad} words lost characters in merging"
    cur.unpersist()


def stress_pagerank(spark, sf_dir: str, n_iter: int) -> None:
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("id_a"),
            (F.col("l_suppkey") * 2 + 1).alias("id_b"),
        )
        .distinct()
    )
    n_edges = pairs.count()
    t0 = time.monotonic()
    ranks = pagerank(pairs, n_iter=n_iter)
    rows = ranks.agg(
        F.count("*").alias("n"), F.sum("rank").alias("mass")
    ).collect()[0]
    total = time.monotonic() - t0
    n, mass = rows["n"], int(rows["mass"])
    scale, d = 10**9, 85
    # closed form without truncation: mass converges toward n*scale;
    # after k rounds mass = n*scale - (truncation losses, < |E|·2 units
    # per round, damped). Assert within that envelope.
    exact = n * scale
    loss = exact - mass
    bound = 2 * n_edges * 2 * n_iter  # both directions, per round
    print(
        f"pagerank: {n} nodes, {2 * n_edges} directed edges, {n_iter} rounds "
        f"in {total:.2f}s; mass {mass} (loss {loss} ≤ bound {bound})"
    )
    assert 0 <= loss <= bound, (loss, bound)


def stress_kcore(spark, sf_dir: str) -> None:
    """k-core invariants at sf0.1: (1) converged output really is a
    fixpoint — re-peeling it with extra fixed rounds changes nothing;
    (2) every surviving degree ≥ k (the defining property); (3) the
    peel strictly removed something (k chosen above the min degree so
    the run exercises the loop, not a no-op)."""
    from lakeshack_spark.operators.graph import k_core

    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
        .persist()
    )
    n_edges = pairs.count()
    deg = (
        pairs.select(F.col("u").alias("n"))
        .unionAll(pairs.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    row = deg.agg(
        F.count("*").alias("v"),
        F.min("d").alias("dmin"),
        F.expr("sum(d) div count(*)").alias("davg"),
    ).collect()[0]
    # just above the minimum: guarantees at least one peel without the
    # quasi-regular graph cascading to empty
    k = int(row["dmin"]) + 1
    t0 = time.monotonic()
    core = k_core(pairs, k=k, id_a="u", id_b="v").persist()
    n_core = core.count()
    t_conv = time.monotonic() - t0
    below = core.filter(F.col("degree") < k).count()
    assert below == 0, f"{below} survivors below k={k}"
    assert 0 < n_core < int(row["v"]), (n_core, row["v"])
    # fixpoint: two more peel rounds on the core change nothing
    core_edges = pairs.join(
        core.select(F.col("node").alias("u")), "u", "semi"
    ).join(core.select(F.col("node").alias("v")), "v", "semi")
    again = k_core(core_edges, k=k, id_a="u", id_b="v", rounds=2)
    diff = core.select("node", "degree").exceptAll(again).count()
    diff += again.exceptAll(core.select("node", "degree")).count()
    assert diff == 0, f"fixpoint violated: {diff} differing rows"
    print(
        f"kcore: |V| {row['v']} |E| {n_edges} dmin {row['dmin']} davg "
        f"{row['davg']} k {k} -> core {n_core} nodes in {t_conv:.2f}s; "
        f"fixpoint re-peel stable"
    )
    core.unpersist()
    pairs.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark(app_name="stress_iterative")
    try:
        stress_bpe(spark, sf_dir, n_merges)
        stress_pagerank(spark, sf_dir, n_iter)
        stress_kcore(spark, sf_dir)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
