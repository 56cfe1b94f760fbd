"""Property-based check of the incremental-view-maintenance algebra:
for RANDOM base tables and RANDOM CDC batches (updates that may move
groups, deletes, inserts, deletes of absent keys), the maintained view
must equal an INDEPENDENT pure-Python model's from-scratch aggregation
of the post-change table — not merge_upsert's, so the two
implementations cannot share a bug.

Spark-backed, so the example budget is small (each example is a couple
of jobs); the generator still covers the interesting lattice: empty
bases, empty batches, all-delete batches, group collisions, negative
values.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from lakeshack_spark.operators.diff import incremental_agg_maintain
from lakeshack_spark.session import get_spark

GROUPS = ["a", "b", "c"]

base_strategy = st.dictionaries(
    st.integers(0, 15),
    st.tuples(st.sampled_from(GROUPS), st.integers(-50, 50)),
    max_size=10,
)
# keys deliberately overlap base's range AND extend past it (inserts)
changes_strategy = st.dictionaries(
    st.integers(0, 20),
    st.tuples(
        st.sampled_from(GROUPS), st.integers(-50, 50), st.booleans()
    ),
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(base=base_strategy, changes=changes_strategy)
def test_ivm_equals_python_model(base, changes):
    spark = get_spark(app_name="test_ivm_property", shuffle_partitions=4)

    # independent model: apply the CDC batch to a dict, then aggregate
    table = dict(base)
    for k, (g, v, is_delete) in changes.items():
        if is_delete:
            table.pop(k, None)  # absent-key delete is a no-op
        else:
            table[k] = (g, v)
    want: dict[str, tuple[int, int]] = {}
    for g, v in table.values():
        n, s = want.get(g, (0, 0))
        want[g] = (n + 1, s + v)

    base_df = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in base.items()] or [(None, None, None)],
        "k long, g string, v long",
    )
    if not base:
        base_df = base_df.filter(F.col("k").isNotNull())
    view = base_df.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("v").alias("sum_v")
    )
    changes_df = spark.createDataFrame(
        [(k, g, v, d) for k, (g, v, d) in changes.items()]
        or [(None, None, None, None)],
        "k long, g string, v long, is_delete boolean",
    )
    if not changes:
        changes_df = changes_df.filter(F.col("k").isNotNull())
    got = {
        r.g: (r.n, r.sum_v)
        for r in incremental_agg_maintain(
            view,
            base_df,
            changes_df,
            key_cols=["k"],
            group_cols=["g"],
            sum_cols={"sum_v": "v"},
            delete_col="is_delete",
        ).collect()
    }
    assert got == want, (base, changes, got, want)
