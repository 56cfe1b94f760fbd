"""Distributed exact order statistics (operators.order_stats): equality
with Spark's exact ``percentile`` aggregate on integer-cents domains,
partition-count invariance, edge cases, and the plan property that
motivates the module — no single-task value buffer (no ``Percentile``
aggregate, no global-sort Window) anywhere in the selection plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakeshack_spark.operators import order_stats


def _cents_df(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, cents long"
    )


PS = [0.25, 0.50, 0.75, 0.9, 0.99]


class TestExactPercentiles:
    def test_matches_percentile_aggregate_cell_exact(self, spark):
        # Integer domain → interpolation is exact IEEE arithmetic on both
        # paths; equality must be EXACT, not approximate.
        vals = [((i * 7919) % 100_003) for i in range(5_000)]
        df = _cents_df(spark, vals)
        got = order_stats.exact_percentiles(df, "cents", PS, n_partitions=8)
        exact = df.agg(
            F.expr(f"percentile(cents, array({','.join(map(str, PS))}))")
        ).collect()[0][0]
        for p, e in zip(PS, exact):
            assert got[p] == e, (p, got[p], e)

    def test_partition_count_invariance(self, spark):
        vals = [((i * 31) % 997) for i in range(2_000)]
        df = _cents_df(spark, vals)
        a = order_stats.exact_percentiles(df, "cents", PS, n_partitions=3)
        b = order_stats.exact_percentiles(df, "cents", PS, n_partitions=17)
        assert a == b

    def test_nulls_ignored_and_empty(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, 10), (3, None), (4, 20)], "id long, cents long"
        )
        got = order_stats.exact_percentiles(df, "cents", [0.5], n_partitions=4)
        assert got[0.5] == 15.0  # median of {10, 20}
        empty = df.filter(F.col("cents").isNull())
        assert order_stats.exact_percentiles(empty, "cents", [0.5]) == {
            0.5: None
        }

    def test_extremes_and_single_row(self, spark):
        df = _cents_df(spark, [42])
        got = order_stats.exact_percentiles(df, "cents", [0.0, 0.5, 1.0])
        assert got == {0.0: 42.0, 0.5: 42.0, 1.0: 42.0}
        df2 = _cents_df(spark, list(range(1, 101)))
        got2 = order_stats.exact_percentiles(df2, "cents", [0.0, 1.0])
        assert got2 == {0.0: 1.0, 1.0: 100.0}

    def test_out_of_range_p_raises(self, spark):
        df = _cents_df(spark, [1, 2, 3])
        with pytest.raises(ValueError):
            order_stats.exact_percentiles(df, "cents", [1.5])


class TestGroupedExactPercentiles:
    def test_matches_grouped_percentile_aggregate_cell_exact(self, spark):
        # non-quarter fractions included: equality must be EXACT on the
        # integer domain because the operator reproduces Percentile's
        # expression order, not merely its value
        rows = [
            (f"g{i % 7}", ((i * 7919) % 100_003)) for i in range(4_000)
        ]
        df = spark.createDataFrame(rows, "g string, cents long")
        got = {
            r["g"]: (r["a"], r["b"], r["c"])
            for r in order_stats.grouped_exact_percentiles(
                df, "g", "cents", [0.5, 0.9, 0.37], names=["a", "b", "c"]
            ).collect()
        }
        want = {
            r["g"]: tuple(r["q"])
            for r in df.groupBy("g")
            .agg(F.expr("percentile(cents, array(0.5, 0.9, 0.37))").alias("q"))
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == want[k], (k, got[k], want[k])

    def test_nulls_and_all_null_groups(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", None), ("a", 20), ("b", None)],
            "g string, cents long",
        )
        out = order_stats.grouped_exact_percentiles(df, "g", "cents", [0.5])
        rows = {r["g"]: r["p50"] for r in out.collect()}
        assert rows == {"a": 15.0}  # b dropped: no non-null values

    def test_no_percentile_aggregate_in_plan(self, spark):
        """The motivating property: the plan sorts (spillable) instead of
        building Percentile's per-group value->count map."""
        df = spark.createDataFrame([("a", 1)], "g string, cents long")
        out = order_stats.grouped_exact_percentiles(df, "g", "cents", [0.5])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "percentile" not in plan.lower()
        assert "Sort" in plan


class TestQuantileBins:
    def test_bins_match_percentile_based_form(self, spark):
        vals = [((i * 131) % 10_007) for i in range(3_000)]
        df = _cents_df(spark, vals)
        out = order_stats.quantile_bins(df, "cents", ["id"], n_partitions=8)
        rows = {r["id"]: r for r in out.collect()}
        q1, q2, q3 = df.agg(
            F.expr("percentile(cents, array(0.25, 0.5, 0.75))")
        ).collect()[0][0]
        assert rows[0]["q1"] == q1 and rows[0]["q2"] == q2
        assert rows[0]["q3"] == q3
        for i, v in enumerate(vals):
            expect = 0 if v <= q1 else 1 if v <= q2 else 2 if v <= q3 else 3
            assert rows[i]["bin"] == expect, (i, v)

    def test_null_values_get_null_bin_not_top_bin(self, spark):
        """Self-review r6: NULLs are ignored for the boundaries, so they
        must not silently land in the top bin via NULL-comparison
        fall-through."""
        df = spark.createDataFrame(
            [(0, 10), (1, None), (2, 90)], "id long, cents long"
        )
        out = order_stats.quantile_bins(df, "cents", ["id"], n_partitions=2)
        rows = {r["id"]: r["bin"] for r in out.collect()}
        assert rows[1] is None and rows[0] == 0 and rows[2] == 3

    def test_custom_ps_bin_count(self, spark):
        df = _cents_df(spark, list(range(100)))
        out = order_stats.quantile_bins(
            df, "cents", ["id"], ps=[0.5], n_partitions=4
        )
        assert set(r["bin"] for r in out.collect()) == {0, 1}
        assert out.columns == ["id", "bin", "q1"]


class TestPlanShape:
    def test_no_single_task_value_buffer(self, spark):
        """The motivating property: the selection plan contains NO exact
        Percentile aggregate (single-reducer value→count map) and NO
        partition-less Window sort (single-task global sort); the one
        shuffle is a RangePartitioning exchange, and the rank pick runs
        per-partition behind Arrow."""
        df = _cents_df(spark, list(range(1_000)))
        base, offs, n = order_stats._ranked_base(df, "cents", 8)
        try:
            assert n == 1_000
            wanted = {pid: [1] for pid in offs}
            plan = order_stats._rank_picks(base, wanted)._jdf.queryExecution(
            ).executedPlan().toString()
            assert "percentile" not in plan.lower()
            assert "Window" not in plan
            base_plan = base._jdf.queryExecution().executedPlan().toString()
            assert "rangepartitioning" in base_plan.lower()
        finally:
            base.unpersist()

    def test_gate_query_plan_is_percentile_free(self, spark):
        """quantile_bins builds boundaries OUTSIDE the result plan (driver
        literals from bounded rank collects), so the returned frame's plan
        has no aggregate at all — just the projection."""
        df = _cents_df(spark, list(range(500)))
        out = order_stats.quantile_bins(df, "cents", ["id"], n_partitions=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "percentile" not in plan.lower()
        assert "Window" not in plan


def test_two_sample_ks_matches_python_and_partition_invariant(spark):
    """KS distance ≡ a pure-Python ECDF sup over the pooled support,
    identical across partition counts; empty samples raise."""
    from lakeshack_spark.operators.order_stats import two_sample_ks

    a = [3, 7, 7, 10, 15, 22, 22, 22, 40]
    b = [1, 7, 9, 15, 15, 33]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")

    support = sorted(set(a) | set(b))
    best, best_at = -1.0, None
    for x in support:
        d = abs(
            sum(1 for v in a if v <= x) / len(a)
            - sum(1 for v in b if v <= x) / len(b)
        )
        if d > best:
            best, best_at = d, x
    outs = []
    for n_parts in (1, 3, 16):
        (r,) = two_sample_ks(
            df, "v", "g", "a", "b", n_partitions=n_parts
        ).collect()
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.ks == best and r.ks_at == best_at, (n_parts, r)
        outs.append((r.ks, r.ks_at))
    assert len(set(outs)) == 1

    import pytest as _pt

    with _pt.raises(ValueError, match="empty sample"):
        two_sample_ks(df, "v", "g", "a", "zzz").collect()
