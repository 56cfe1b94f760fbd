"""Measure connected_components' per-round pointer-jump double evaluation
at scale (OPTIMIZATION_r13 "Not yet optimized" item: the jump self-joins
``propagated``, so the propagate aggregation subtree appears twice in one
job — only matters if the aggregate dominates the round's fixed overhead,
which needs >=10M edges to see, not sf0.1).

Usage: python tools/measure_cc.py [n_edges_millions] [ab_rounds]

Builds a deterministic pseudo-random graph (xxhash64-derived endpoints,
no RNG), then interleaves in ONE process (so box drift cancels):
  A = connected_components as shipped (since r13: propagated eagerly
      checkpointed before the jump — one evaluation per round)
  B = the pre-r13 lazy form (propagated consumed twice by the jump
      self-join, re-evaluated per consumer)
and prints per-round and total walls for each, plus whether the two
label frames agree (exceptAll both ways).

r13 decision record (this tool's output): materialized won all four
interleaved comparisons — 10M edges / 5M nodes 127.2 vs 147.9 and 91.1
vs 102.4 s (−11..−14%), 0.5M edges 16.1 vs 23.9 s (−32%) — and tied
exactly on the 5k-node bench graph (min 2.78 vs 2.78 s over 4 rounds,
pairs from simhash_near_pairs at sf0.1), parity exceptAll 0/0 at every
scale. connected_components ships the materialized shape since r13;
``cc_lazy`` below preserves the pre-r13 form for re-measurement.
"""
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
import lakeshack_spark as lss  # noqa: E402
from lakeshack_spark.operators.graph import (  # noqa: E402
    _symmetrized_edges,
    connected_components,
)


def cc_lazy(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_rounds: int = 30,
    round_stats: list | None = None,
) -> DataFrame:
    """The pre-r13 connected_components round shape: ``propagated`` left
    LAZY, so the pointer jump's self-join evaluates the propagate
    aggregation (containing the |E|join|V| edge join) once per consumer
    inside one job. Kept verbatim for A/B re-measurement."""
    edges = _symmetrized_edges(pairs, id_a, id_b)
    endpoints = edges.select(F.col("src").alias("node"))
    if nodes is not None:
        nc = node_col or nodes.columns[0]
        universe = (
            nodes.select(F.col(nc).cast("long").alias("node"))
            .union(endpoints)
            .distinct()
        )
    else:
        universe = endpoints.distinct()
    labels = universe.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    for rnd in range(max_rounds):
        _t0 = time.time()
        neighbor_msgs = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"),
            "label",
            F.lit(None).cast("long").alias("old"),
        )
        propagated = (
            labels.select("node", "label", F.col("label").alias("old"))
            .union(neighbor_msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
            # NOT checkpointed — the pre-r13 shape under comparison
        )
        lookup = propagated.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        jumped = (
            propagated.join(lookup, propagated.label == lookup.l_node, "left")
            .select(
                "node",
                F.coalesce(F.col("l_label"), F.col("label")).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.filter(F.col("label") != F.col("old")).limit(1).count()
        )
        if round_stats is not None:
            round_stats.append(
                {"round": rnd, "sec": round(time.time() - _t0, 3)}
            )
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError("did not converge")


def cc_aqe_off(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_rounds: int = 30,
    round_stats: list | None = None,
) -> DataFrame:
    """The shipped r13 shape with the per-round ``propagated``
    checkpoint taken under SCOPED AQE-off (the _symmetrized_edges
    precedent): the checkpointed LogicalRDD then keeps
    HashPartitioning(node) instead of Unknown, so the pointer jump's
    lookup side joins without re-shuffling |V|. Kept as a measurement
    twin for VERDICT_r13 item 4 (re-measure at >=50M edges; the 10M
    measurement was a wash)."""
    edges = _symmetrized_edges(pairs, id_a, id_b)
    endpoints = edges.select(F.col("src").alias("node"))
    if nodes is not None:
        nc = node_col or nodes.columns[0]
        universe = (
            nodes.select(F.col(nc).cast("long").alias("node"))
            .union(endpoints)
            .distinct()
        )
    else:
        universe = endpoints.distinct()
    labels = universe.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    spark = pairs.sparkSession
    for rnd in range(max_rounds):
        _t0 = time.time()
        neighbor_msgs = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"),
            "label",
            F.lit(None).cast("long").alias("old"),
        )
        prop_lazy = (
            labels.select("node", "label", F.col("label").alias("old"))
            .union(neighbor_msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            propagated = prop_lazy.localCheckpoint(eager=True)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)
        lookup = propagated.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        jumped = (
            propagated.join(lookup, propagated.label == lookup.l_node, "left")
            .select(
                "node",
                F.coalesce(F.col("l_label"), F.col("label")).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.filter(F.col("label") != F.col("old")).limit(1).count()
        )
        if round_stats is not None:
            round_stats.append(
                {"round": rnd, "sec": round(time.time() - _t0, 3)}
            )
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError("did not converge")


def cc_aqe_on(pairs, **kw):
    """The r13 shipped shape, kept verbatim for A/B: the per-round
    propagate checkpoint taken under the session's AQE (its LogicalRDD
    then reports Unknown partitioning and the jump re-shuffles the |V|
    lookup side every round — the form connected_components shipped
    between r13 and the r14 AQE-off scoping)."""
    return _cc_checkpoint_form(pairs, scoped_aqe_off=False, **kw)


def _cc_checkpoint_form(
    pairs: DataFrame,
    scoped_aqe_off: bool,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_rounds: int = 30,
    round_stats: list | None = None,
) -> DataFrame:
    edges = _symmetrized_edges(pairs, id_a, id_b)
    endpoints = edges.select(F.col("src").alias("node"))
    universe = endpoints.distinct()
    labels = universe.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    spark = pairs.sparkSession
    for rnd in range(max_rounds):
        _t0 = time.time()
        neighbor_msgs = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"),
            "label",
            F.lit(None).cast("long").alias("old"),
        )
        prop_lazy = (
            labels.select("node", "label", F.col("label").alias("old"))
            .union(neighbor_msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        if scoped_aqe_off:
            prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                propagated = prop_lazy.localCheckpoint(eager=True)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", prev)
        else:
            propagated = prop_lazy.localCheckpoint(eager=True)
        lookup = propagated.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        jumped = (
            propagated.join(lookup, propagated.label == lookup.l_node, "left")
            .select(
                "node",
                F.coalesce(F.col("l_label"), F.col("label")).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.filter(F.col("label") != F.col("old")).limit(1).count()
        )
        if round_stats is not None:
            round_stats.append(
                {"round": rnd, "sec": round(time.time() - _t0, 3)}
            )
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError("did not converge")


VARIANTS = {
    "shipped": connected_components,
    "lazy": cc_lazy,
    "aqe_off": cc_aqe_off,
    "aqe_on": cc_aqe_on,
}


def main() -> None:
    n_edges = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_000_000
    ab_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variant_names = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["shipped", "lazy"]
    )
    n_nodes = n_edges // 2
    spark = lss.get_spark(app_name="measure_cc")
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic graph: giant sparse component (avg degree ~4 after
    # symmetrization) plus a long path (ids 0..9999 chained) so pointer
    # jumping needs several rounds, not just 2-3.
    rnd = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("id_a"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("id_b"),
        )
    )
    path = spark.range(9_999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    pairs = rnd.union(path).localCheckpoint(eager=True)
    print(f"edges: {pairs.count():,} over ~{n_nodes:,} nodes", flush=True)

    results = {}
    first_name = variant_names[0]
    for ab in range(ab_rounds):
        for name, fn in [(n, VARIANTS[n]) for n in variant_names]:
            spark.sparkContext.setJobDescription(f"cc_{name}_ab{ab}")
            stats: list = []
            t0 = time.time()
            out = fn(pairs, round_stats=stats)
            cnt = out.count()
            wall = time.time() - t0
            results.setdefault(name, []).append(wall)
            per = ", ".join(f"{s['sec']:.2f}" for s in stats)
            print(
                f"ab{ab} {name:12s} total {wall:7.2f}s  rounds [{per}]  "
                f"labels {cnt:,}",
                flush=True,
            )
            if ab == 0 and name == first_name:
                results["first_out"] = out
            elif ab == 0 and "first_out" in results:
                a = results["first_out"]
                d1 = a.exceptAll(out).count()
                d2 = out.exceptAll(a).count()
                print(
                    f"parity exceptAll vs {first_name}: {d1} / {d2}",
                    flush=True,
                )
                assert d1 == 0 and d2 == 0, "label mismatch"
    results.pop("first_out", None)

    for name in variant_names:
        rs = results[name]
        print(
            f"{name:12s} min {min(rs):.2f}  median "
            f"{sorted(rs)[len(rs) // 2]:.2f}  runs {[round(r, 2) for r in rs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
