"""Property-based pruning safety (SURVEY §5 plan): for random file
contents and random predicates, zone-map pruning must NEVER drop a file
that contains a qualifying row (false positives are fine — the scan
filters exactly; false negatives are data loss)."""

from __future__ import annotations

import operator

from hypothesis import given, settings, strategies as st

from lakeshack_spark.metastore import PRUNE_OPS, interval_keeps

_PY_OPS = {
    ">=": operator.ge,
    ">": operator.gt,
    "=": operator.eq,
    "==": operator.eq,
    "<": operator.lt,
    "<=": operator.le,
}

values_strategy = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.text(alphabet="abcdef", min_size=0, max_size=4),
)


@settings(max_examples=500)
@given(
    rows=st.lists(st.integers(-1000, 1000), min_size=1, max_size=50),
    op=st.sampled_from(PRUNE_OPS),
    value=st.integers(-1100, 1100),
)
def test_no_false_negatives_int(rows, op, value):
    lo, hi = min(rows), max(rows)
    any_match = any(_PY_OPS[op](r, value) for r in rows)
    if any_match:
        assert interval_keeps(op, lo, hi, value)


@settings(max_examples=500)
@given(
    rows=st.lists(st.text(alphabet="abc", min_size=0, max_size=3), min_size=1, max_size=30),
    op=st.sampled_from(PRUNE_OPS),
    value=st.text(alphabet="abc", min_size=0, max_size=3),
)
def test_no_false_negatives_str(rows, op, value):
    lo, hi = min(rows), max(rows)
    any_match = any(_PY_OPS[op](r, value) for r in rows)
    if any_match:
        assert interval_keeps(op, lo, hi, value)


@settings(max_examples=300)
@given(
    rows=st.lists(st.integers(-1000, 1000), min_size=1, max_size=50),
    op=st.sampled_from(PRUNE_OPS),
    value=st.integers(-1100, 1100),
)
def test_pruned_file_truly_has_no_matches(rows, op, value):
    """The converse (tightness): when the interval test prunes a file,
    no row in it can satisfy the predicate — min/max intervals are exact
    for these operators, so pruning is not just safe but precise."""
    lo, hi = min(rows), max(rows)
    if not interval_keeps(op, lo, hi, value):
        assert not any(_PY_OPS[op](r, value) for r in rows)


def test_null_stats_always_keep():
    for op in PRUNE_OPS:
        assert interval_keeps(op, None, None, 42)
        assert interval_keeps(op, None, 7, 42)
