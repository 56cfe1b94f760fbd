"""Table reconciliation: keyed diff of two table versions.

The data-engineering "what changed" primitive — validating a CDC feed,
auditing a backfill, comparing a migration's before/after — expressed as
ONE full outer join on the key plus a row-fingerprint comparison:

- rows only in the new table  -> status 'added'
- rows only in the old table  -> status 'removed'
- same key, different content -> status 'changed'
- identical rows are dropped (the diff is the output, not the table).

Scale shape: each side reduces to (key, md5 fingerprint) map-side — the
full row never crosses the shuffle, only key + 32 hex chars — then one
key-keyed full outer join. Works at any width; column subsets let the
caller ignore volatile columns (load timestamps etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def row_fingerprint(cols: list[str]) -> F.Column:
    """md5 over the canonical string form of ``cols`` IN THE GIVEN
    ORDER, with NULLs made visible: each non-NULL value renders as
    ``len:value`` and NULL as a bare marker, so ('a', NULL) can never
    collide with ('', 'a') and a NULL never equals an empty string
    (concat_ws silently DROPS NULLs — the classic fingerprint bug).
    The expression is unbound — select it on the frame that owns the
    columns."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("~N~")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat_ws("|", *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff: one row per key that was added, removed, or changed
    between ``old`` and ``new`` (keys must be unique per side —
    duplicate keys make 'changed' ill-defined; pre-aggregate first).

    Returns key columns + ``status`` ('added' | 'removed' | 'changed')
    + ``old_fp`` / ``new_fp`` (NULL on the missing side). Deterministic.
    The key join is NULL-SAFE (``eqNullSafe``): a NULL-keyed row on both
    sides compares as the same key — a plain equality join would report
    it as a spurious added+removed pair.
    """
    if compare_cols is None:
        old_cols = set(old.columns)
        compare_cols = [
            c for c in new.columns if c in old_cols and c not in key_cols
        ]
    o = old.select(
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        row_fingerprint(compare_cols).alias("old_fp"),
    )
    n = new.select(
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        row_fingerprint(compare_cols).alias("new_fp"),
    )
    cond = None
    for c in key_cols:
        e = F.col(f"__ok_{c}").eqNullSafe(F.col(f"__nk_{c}"))
        cond = e if cond is None else cond & e
    j = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).alias(c)
                for c in key_cols
            ],
            "status",
            "old_fp",
            "new_fp",
        )
    )
