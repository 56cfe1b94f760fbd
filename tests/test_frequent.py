"""Misra–Gries heavy hitters: the sketch+verify pipeline must be EXACTLY
equal to the naive full-cardinality groupBy-HAVING, including under
forced counter truncation across many partitions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakeshack_spark.operators import frequent


def _rows(spark):
    """Deterministic skewed stream: 3 heavy items + a long tail of
    singletons, shuffled across partitions by the id hash."""
    rows = []
    i = 0
    for item, cnt in (("alpha", 300), ("beta", 120), ("gamma", 60)):
        for _ in range(cnt):
            rows.append((i, item))
            i += 1
    for j in range(400):  # tail: 400 distinct singletons
        rows.append((i, f"tail{j}"))
        i += 1
    return spark.createDataFrame(rows, "id long, item string").repartition(8, "id")


def test_heavy_hitters_equals_longhand_under_truncation(spark):
    df = _rows(spark)
    # one_in=8 → threshold ceil(880/8)=110 → alpha, beta qualify; gamma (60) not.
    got = {
        r.item: (r.n_item, r.share)
        for r in frequent.heavy_hitters(df, "item", one_in=8, counters=8).collect()
    }
    want = {
        r.item: (r.n_item, r.share)
        for r in frequent.heavy_hitters_exact_longhand(df, "item", 8).collect()
    }
    assert got == want
    assert set(got) == {"alpha", "beta"}
    assert got["alpha"] == (300, 300 / 880)


def test_heavy_hitters_larger_budget_same_answer(spark):
    df = _rows(spark)
    a = frequent.heavy_hitters(df, "item", one_in=16, counters=64).collect()
    b = frequent.heavy_hitters_exact_longhand(df, "item", 16).collect()
    assert sorted((r.item, r.n_item) for r in a) == sorted(
        (r.item, r.n_item) for r in b
    )


def test_heavy_hitters_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (4, "y")], "id long, item string"
    )
    got = {r.item: r.n_item for r in frequent.heavy_hitters(df, "item", one_in=2).collect()}
    # n=3 non-null rows; threshold ceil(3/2)=2 → only x
    assert got == {"x": 2}


def test_heavy_hitters_empty_and_validation(spark):
    empty = spark.createDataFrame([], "id long, item string")
    out = frequent.heavy_hitters(empty, "item", one_in=4)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["item", "n_item", "share"]
    df = spark.createDataFrame([(1, "x")], "id long, item string")
    with pytest.raises(ValueError):
        frequent.heavy_hitters(df, "item", one_in=1)
    with pytest.raises(ValueError):
        frequent.heavy_hitters(df, "item", one_in=8, counters=4)


def test_heavy_hitters_non_string_column(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(90)], "id long, v int"
    ).repartition(4, "id")
    got = {r.item for r in frequent.heavy_hitters(df, "v", one_in=4).collect()}
    assert got == {"0", "1", "2"}


def test_count_min_never_undercounts_and_matches_python(spark):
    """CM estimates ≡ a pure-Python sketch with the same md5 cells;
    estimate >= exact for every item (incl. absent); duplicate query
    items dedup; empty queries raise."""
    import hashlib

    import pytest as _pt

    from lakeshack_spark.operators.frequent import count_min_estimates

    items = (["alpha"] * 20 + ["beta"] * 7 + ["gamma"] * 3 + ["delta"])
    df = spark.createDataFrame([(x,) for x in items], "item string")
    W, D = 16, 3  # tiny width: force collisions so overcount is real

    def cell(r, item):
        return (
            int(
                hashlib.md5(f"cm:{r}:{item}".encode()).hexdigest()[:15], 16
            )
            % W
        )

    sketch = {}
    for it in items:
        for r in range(D):
            key = (r, cell(r, it))
            sketch[key] = sketch.get(key, 0) + 1

    queries = ["alpha", "beta", "gamma", "delta", "absent", "alpha"]

    def py_est(item):
        return min(sketch.get((r, cell(r, item)), 0) for r in range(D))

    got = {
        r.item: (r.exact, r.estimate, r.never_undercounts)
        for r in count_min_estimates(
            df, "item", queries, width=W, depth=D, seed="cm"
        ).collect()
    }
    true = {"alpha": 20, "beta": 7, "gamma": 3, "delta": 1, "absent": 0}
    assert set(got) == set(true)  # dedup'd
    for item, exact in true.items():
        est = py_est(item)
        assert got[item] == (exact, est, True), (item, got[item], est)
        assert est >= exact
    with _pt.raises(ValueError, match="non-empty"):
        count_min_estimates(df, "item", [])
