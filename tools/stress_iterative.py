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


# ---------------------------------------------------------------------------
# Planted-truth decade-up stress for the peeling operators (VERDICT r10
# #4): CC has 1M-node evidence, but k-core/k-truss previously topped out
# at bench scale. Disjoint identical blocks with CLOSED-FORM peel
# behavior — per-round removal counts, final membership, and final
# degrees/supports are all exact by construction, so every assertion is
# ground truth, not a smoke check. Blocks are generated DISTRIBUTED
# (spark.range × broadcast template), never as driver-side edge lists.
# ---------------------------------------------------------------------------

#: k-core block: clique K_c (ids 0..c-1) + a pendant tendril path of t
#: nodes hung off clique vertex 0 (ids c..c+t-1). Under k=2 the tendril
#: peels EXACTLY one node per round from the free end (interior path
#: nodes hold degree 2 until exposed), so round r removes exactly one
#: node per block — the family's worst case (peel depth linear in
#: tendril length, the k-core analog of CC's diameter-path worst case).
KCORE_CLIQUE = 8
KCORE_TENDRIL = 8
KCORE_STRIDE = KCORE_CLIQUE + KCORE_TENDRIL


def kcore_block_edges() -> list[tuple[int, int]]:
    """Block-local (u, v) edge template: C(c,2) + t edges."""
    c, t = KCORE_CLIQUE, KCORE_TENDRIL
    edges = [(i, j) for i in range(c) for j in range(i + 1, c)]
    prev = 0  # tendril hangs off clique vertex 0
    for x in range(c, c + t):
        edges.append((prev, x))
        prev = x
    return edges


#: k-truss block: cycle power C_n^{w+1} (every vertex joined to its w+1
#: nearest on each side — min edge support w, so it survives support ≥ w
#: exactly) + a path-power-w tendril hung off cycle vertex 0. The
#: tendril's longest-distance edges have support w-1 < w, peel, and the
#: loss cascades through the shorter distance classes until the whole
#: tendril is gone — a multi-round edge-peel with closed-form final
#: state: exactly the cycle edges, each distance-d edge with support
#: 2(w+1)-d-1. Expected per-round removals and round count are derived
#: by ktruss_block_truth's pure-Python peel of ONE block (blocks are
#: disjoint and identical, so global counts are B × block counts).
KTRUSS_W = 4
KTRUSS_CYCLE = 60
KTRUSS_TENDRIL = 24
KTRUSS_STRIDE = 128


def ktruss_block_edges() -> list[tuple[int, int]]:
    w, n, t = KTRUSS_W, KTRUSS_CYCLE, KTRUSS_TENDRIL
    edges = set()
    for i in range(n):  # cycle power, width w+1
        for d in range(1, w + 2):
            a, b = i, (i + d) % n
            edges.add((min(a, b), max(a, b)))
    seq = [0] + list(range(n, n + t))  # tendril path power, width w
    for i in range(len(seq)):
        for d in range(1, w + 1):
            if i + d < len(seq):
                a, b = seq[i], seq[i + d]
                edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def ktruss_block_truth() -> tuple[dict, list[int]]:
    """Pure-Python support peel of ONE block: (final {(u,v): support},
    per-round sub-threshold edge counts ending in 0). Independent of
    the Spark code path — this is the oracle the 1M-edge run is held
    to."""
    E = set(ktruss_block_edges())
    k = KTRUSS_W + 2  # support >= w
    removed_per_round = []
    while True:
        adj: dict[int, set] = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in E}
        bad = {e for e, s in sup.items() if s < k - 2}
        removed_per_round.append(len(bad))
        if not bad:
            return sup, removed_per_round
        E -= bad


def _planted_blocks(spark, template: list[tuple[int, int]], n_blocks: int,
                    stride: int):
    """Distributed disjoint-block edge generation: spark.range(B) ×
    broadcast(template), ids offset by block*stride."""
    from pyspark.sql import functions as FF

    tmpl = spark.createDataFrame(template, "lu long, lv long")
    return (
        spark.range(n_blocks)
        .repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(FF.broadcast(tmpl))
        .select(
            (F.col("id") * stride + F.col("lu")).alias("u"),
            (F.col("id") * stride + F.col("lv")).alias("v"),
        )
    )


#: PageRank block: complete bipartite K_{a,b} — heterogeneous degrees
#: (side-A nodes have degree b, side-B degree a), so the per-edge
#: ``(d·rank) div (100·outdeg)`` term is exercised with two distinct
#: outdegs, and by symmetry every node of a side carries EXACTLY the
#: side's scalar recurrence value: rA' = t + b·((85·rB) div (100·a)),
#: rB' = t + a·((85·rA) div (100·b)) — int64-exact, replayed in pure
#: Python as the oracle. A uniform-degree construction could not
#: distinguish outdeg mix-ups; this one can.
PR_SIDE_A = 5
PR_SIDE_B = 20
PR_STRIDE = 32


def pagerank_block_edges() -> list[tuple[int, int]]:
    a, b = PR_SIDE_A, PR_SIDE_B
    return [(i, a + j) for i in range(a) for j in range(b)]


def pagerank_block_truth(n_iter: int, damping_pct: int = 85,
                         scale: int = 10**9) -> tuple[int, int]:
    """(rank of every side-A node, rank of every side-B node) after
    n_iter exact integer power iterations — the pure-Python oracle."""
    a, b = PR_SIDE_A, PR_SIDE_B
    tele = (100 - damping_pct) * scale // 100
    ra = rb = scale
    for _ in range(n_iter):
        ra, rb = (
            tele + b * ((damping_pct * rb) // (100 * a)),
            tele + a * ((damping_pct * ra) // (100 * b)),
        )
    return ra, rb


def stress_pagerank_planted(spark, target_edges: int,
                            n_iter: int = 8) -> None:
    template = pagerank_block_edges()
    a, b = PR_SIDE_A, PR_SIDE_B
    n_blocks = max(1, target_edges // len(template))
    edges = _planted_blocks(spark, template, n_blocks, PR_STRIDE).persist()
    n_edges = edges.count()

    ra, rb = pagerank_block_truth(n_iter)
    stats: list[dict] = []
    t0 = time.monotonic()
    ranks = pagerank(
        edges, n_iter=n_iter, id_a="u", id_b="v", round_stats=stats
    ).persist()
    n_nodes = ranks.count()
    total = time.monotonic() - t0

    assert n_nodes == n_blocks * (a + b), (n_nodes, n_blocks)
    bad = ranks.filter(
        F.when(F.col("node") % PR_STRIDE < a, F.col("rank") != ra).otherwise(
            F.col("rank") != rb
        )
    ).count()
    assert bad == 0, f"{bad} nodes off the scalar closed form ({ra}, {rb})"
    assert len(stats) == n_iter
    walls = " ".join(f"{s['sec']:.2f}" for s in stats)
    print(
        f"pagerank_planted: |E| {n_edges} ({n_blocks} K_{{{a},{b}}} "
        f"blocks) {n_iter} rounds -> {n_nodes} nodes, every rank "
        f"int64-exact vs the scalar recurrence ({ra}, {rb}) in "
        f"{total:.2f}s; round walls {walls}"
    )
    ranks.unpersist()
    edges.unpersist()


def triangle_block_truth() -> dict:
    """Pure-Python exact census of ONE k-truss stress block (reused —
    cycle power + tendril gives heterogeneous degrees): n_nodes,
    n_edges, n_wedges (Σ C(d,2)), n_triangles. Blocks are disjoint and
    identical, so global counts are B × these."""
    E = set(ktruss_block_edges())
    adj: dict[int, set] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = sum(len(adj[a] & adj[b]) for a, b in E) // 3
    n_wedges = sum(d * (d - 1) // 2 for d in map(len, adj.values()))
    return {
        "n_nodes": len(adj),
        "n_edges": len(E),
        "n_wedges": n_wedges,
        "n_triangles": n_tri,
    }


def stress_triangle_planted(spark, target_edges: int) -> None:
    """Exact triangle census at scale: the degree-ordered wedge-closure
    join (triangle_stats) over disjoint k-truss-template blocks, every
    count asserted against the pure-Python block census × B, and the
    clustering coefficient against the identical one-division float
    expression (exact: ints < 2^53, one correctly-rounded division)."""
    from lakeshack_spark.operators.graph import triangle_stats

    template = ktruss_block_edges()
    truth = triangle_block_truth()
    n_blocks = max(1, target_edges // len(template))
    edges = _planted_blocks(
        spark, template, n_blocks, KTRUSS_STRIDE
    ).persist()
    edges.count()

    t0 = time.monotonic()
    row = triangle_stats(edges, u="u", v="v").collect()[0]
    total = time.monotonic() - t0

    want = {k: v * n_blocks for k, v in truth.items()}
    got = {k: row[k] for k in want}
    assert got == want, (got, want)
    expect_cc = 3.0 * want["n_triangles"] / want["n_wedges"]
    assert row["global_clustering"] == expect_cc, (
        row["global_clustering"], expect_cc
    )
    print(
        f"triangle_planted: |E| {want['n_edges']} ({n_blocks} blocks) -> "
        f"census exact ({want['n_triangles']} triangles, "
        f"{want['n_wedges']} wedges, clustering "
        f"{row['global_clustering']:.6f}) in {total:.2f}s"
    )
    edges.unpersist()


def stress_kcore_planted(spark, target_edges: int) -> None:
    from lakeshack_spark.operators.graph import k_core

    template = kcore_block_edges()
    c, t = KCORE_CLIQUE, KCORE_TENDRIL
    n_blocks = max(1, target_edges // len(template))
    edges = _planted_blocks(spark, template, n_blocks, KCORE_STRIDE).persist()
    n_edges = edges.count()

    stats: list[dict] = []
    t0 = time.monotonic()
    core = k_core(edges, k=2, id_a="u", id_b="v", round_stats=stats).persist()
    n_core = core.count()
    total = time.monotonic() - t0

    # closed form: exactly one tendril node per block peels per round
    below = [s["below"] for s in stats]
    assert below == [n_blocks] * t + [0], f"per-round peel counts {below}"
    # survivors: every clique node, nothing else, every degree c-1
    assert n_core == n_blocks * c, (n_core, n_blocks * c)
    bad = core.filter(
        (F.col("degree") != c - 1) | (F.col("node") % KCORE_STRIDE >= c)
    ).count()
    assert bad == 0, f"{bad} survivors off the closed form"
    blocks_seen = core.select(
        (F.col("node") / KCORE_STRIDE).cast("long")
    ).distinct().count()
    assert blocks_seen == n_blocks, (blocks_seen, n_blocks)
    walls = " ".join(f"{s['sec']:.2f}" for s in stats)
    print(
        f"kcore_planted: |E| {n_edges} ({n_blocks} blocks) k=2 -> "
        f"{len(stats)} rounds (peel depth {t}, one node/block/round, "
        f"exact) core {n_core} nodes all degree {c - 1} in {total:.2f}s; "
        f"round walls {walls}"
    )
    core.unpersist()
    edges.unpersist()


def stress_ktruss_planted(spark, target_edges: int) -> None:
    from lakeshack_spark.operators.graph import k_truss

    template = ktruss_block_edges()
    expect_sup, removed = ktruss_block_truth()
    k = KTRUSS_W + 2
    n_blocks = max(1, target_edges // len(template))
    edges = _planted_blocks(
        spark, template, n_blocks, KTRUSS_STRIDE
    ).persist()
    n_edges = edges.count()

    stats: list[dict] = []
    t0 = time.monotonic()
    truss = k_truss(
        edges, k=k, u="u", v="v", round_stats=stats
    ).persist()
    n_truss = truss.count()
    total = time.monotonic() - t0

    # closed form from the pure-Python block oracle, scaled by B
    below = [s["below"] for s in stats]
    assert below == [r * n_blocks for r in removed], (below, removed)
    assert n_truss == n_blocks * len(expect_sup), (
        n_truss, n_blocks, len(expect_sup)
    )
    # every output edge folded to block-local coordinates must be an
    # expected (u, v, support) triple, and each triple must appear in
    # every block exactly once
    local = truss.groupBy(
        (F.col("u") % KTRUSS_STRIDE).alias("lu"),
        (F.col("v") % KTRUSS_STRIDE).alias("lv"),
        "support",
    ).agg(F.count("*").alias("n"))
    got = {
        (r["lu"], r["lv"]): (r["support"], r["n"]) for r in local.collect()
    }
    want = {e: (s, n_blocks) for e, s in expect_sup.items()}
    assert got == want, "per-edge supports off the closed form"
    walls = " ".join(f"{s['sec']:.2f}" for s in stats)
    print(
        f"ktruss_planted: |E| {n_edges} ({n_blocks} blocks) k={k} -> "
        f"{len(stats)} rounds (removals/round {removed}, exact) truss "
        f"{n_truss} edges, every support closed-form, in {total:.2f}s; "
        f"round walls {walls}"
    )
    truss.unpersist()
    edges.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # planted peel stress sizes (decade-up sweep); override with
    # SPARK_GRAFT_PEEL_EDGES="100000,1000000"
    peel_sizes = [
        int(s)
        for s in os.environ.get(
            "SPARK_GRAFT_PEEL_EDGES", "100000,1000000"
        ).split(",")
        if s
    ]
    spark = get_spark(app_name="stress_iterative")
    try:
        stress_bpe(spark, sf_dir, n_merges)
        stress_pagerank(spark, sf_dir, n_iter)
        stress_kcore(spark, sf_dir)
        for sz in peel_sizes:
            stress_kcore_planted(spark, sz)
            stress_ktruss_planted(spark, sz)
            stress_pagerank_planted(spark, sz)
            stress_triangle_planted(spark, sz)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
