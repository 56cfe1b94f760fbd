"""Connected-components scale stress: planted path-block graphs with
EXACT ground truth, one decade apart.

The bench's cluster_labels key runs CC over a ~5k-node near-dup graph;
this tool is the decade-up evidence (mirroring dedup's 1M-doc and the
ANN tier's 1M-vector points). The graph is N nodes in consecutive
path blocks of size B: edge (i, i+1) whenever i+1 is in the same
block. Every block is a path of diameter B — the WORST case for label
propagation (a random graph's diameter is tiny) and exactly the shape
pointer jumping exists for: rounds must come out O(log B), NOT O(B),
and per-round wall must be flat (each round is one |E| join + one |V|
aggregate + one |V| jump join off a checkpointed frame — no lineage
growth).

Ground truth is exact and free: component label of node i is
(i // B) * B (the block's min id). The tool asserts EVERY label at
every size, prints rounds + per-round walls (the round_stats
instrumentation the bench also emits), and the wall-time scaling
exponent between sizes.

Usage: python tools/stress_cc.py [--nodes 100000,1000000] [--block 1024]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", default="100000,1000000")
    ap.add_argument("--block", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakeshack_spark.operators.graph import connected_components
    from lakeshack_spark.session import get_spark

    spark = get_spark(app_name="stress_cc")
    B = args.block
    sizes = [int(s) for s in args.nodes.split(",")]
    results: list[dict] = []
    # warm-up (uncounted): first jobs of a session pay JIT/codegen
    warm = spark.range(1000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    connected_components(warm).count()

    for n in sizes:
        n_blocks = math.ceil(n / B)
        edges = (
            spark.range(n - 1)
            .filter((F.col("id") + 1) % B != 0)  # don't cross blocks
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
            .repartition(32)
            .persist()
        )
        n_edges = edges.count()
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))

        stats: list[dict] = []
        t0 = time.time()
        labels = connected_components(
            edges, nodes=nodes, node_col="doc_id", round_stats=stats
        )
        mismatches = labels.filter(
            F.col("cluster_id") != (F.col("node") - F.col("node") % B)
        ).count()
        n_labeled = labels.count()
        wall = time.time() - t0
        assert mismatches == 0, f"{mismatches} wrong labels at n={n}"
        assert n_labeled == n, f"{n_labeled} labels for {n} nodes"
        rounds = len(stats)
        # pointer jumping on diameter-B paths: O(log B) rounds, never O(B)
        assert rounds <= 2 * math.ceil(math.log2(B)) + 2, (
            f"{rounds} rounds for diameter {B} — pointer jumping broken?"
        )
        per_round = " ".join(f"{s['sec']:.2f}" for s in stats)
        print(
            f"n={n}: {n_edges} edges, {n_blocks} path components of "
            f"diameter {B}, {rounds} rounds, {wall:.1f}s total, all "
            f"labels exact; per-round walls: {per_round}"
        )
        results.append({"n": n, "wall": wall, "rounds": rounds})
        edges.unpersist()
    for prev, cur in zip(results, results[1:]):
        exp = math.log(cur["wall"] / prev["wall"]) / math.log(
            cur["n"] / prev["n"]
        )
        print(
            f"scaling exponent {prev['n']}→{cur['n']} (1.0=linear): "
            f"{exp:.2f} (rounds {prev['rounds']}→{cur['rounds']})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
