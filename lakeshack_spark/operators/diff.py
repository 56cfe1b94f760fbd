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


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    delete_col: str | None = None,
    insert: bool = True,
) -> DataFrame:
    """Delta-style MERGE (the CDC apply: WHEN MATCHED UPDATE / WHEN
    MATCHED AND flag DELETE / WHEN NOT MATCHED INSERT) as ONE relational
    expression over a null-safe full-outer key join. Returns a frame
    with exactly the target's schema:

    - matched, source ``delete_col`` true  -> row dropped
    - matched otherwise                    -> target row with
      ``update_cols`` taken from the source (default: every shared
      non-key column)
    - unmatched target                     -> unchanged
    - unmatched source                     -> inserted when ``insert``
      (delete-flagged unmatched rows are ignored, the idempotent-replay
      convention for CDC feeds)

    Source keys must be unique — multiple matches per target key make
    MERGE ill-defined (Delta raises at runtime; pre-aggregate the batch
    to latest-per-key first). The key join is NULL-SAFE, matching
    :func:`table_diff`'s convention.

    Scale shape: each side shuffles ONCE on the key; every output value
    is a map-side when/otherwise after the join — no window, no second
    pass, no driver round trip. A small CDC batch against a huge target
    broadcasts under AQE like any dimension. The reference engine has no
    write-path mutation surface; this is the lakehouse-standard
    MERGE INTO semantics (Delta/Iceberg), the apply-side twin of
    :func:`table_diff`.
    """
    if update_cols is None:
        tset = set(target.columns)
        update_cols = [
            c for c in source.columns if c in tset and c not in key_cols
        ]
    src_set = set(source.columns)
    if insert:
        missing = [c for c in target.columns if c not in src_set]
        if missing:
            raise ValueError(
                f"insert=True requires the source to carry every target "
                f"column; missing: {missing}"
            )
    t = target.select(
        F.lit(True).alias("__t_present"),
        *[F.col(c).alias(f"__t_{c}") for c in target.columns],
    )
    s = source.select(
        F.lit(True).alias("__s_present"),
        *[F.col(c).alias(f"__s_{c}") for c in source.columns],
    )
    cond = None
    for c in key_cols:
        e = F.col(f"__t_{c}").eqNullSafe(F.col(f"__s_{c}"))
        cond = e if cond is None else cond & e
    j = t.join(s, cond, "full_outer")
    tp = F.coalesce(F.col("__t_present"), F.lit(False))
    sp = F.coalesce(F.col("__s_present"), F.lit(False))
    if delete_col is not None:
        del_flag = F.coalesce(F.col(f"__s_{delete_col}"), F.lit(False))
    else:
        del_flag = F.lit(False)
    keep = (
        F.when(tp & sp, ~del_flag)
        .when(tp, F.lit(True))
        .otherwise(F.lit(insert) & ~del_flag)
    )
    out = []
    for c in target.columns:
        if c in src_set and c in update_cols:
            # matched update AND insert both read the source value
            val = F.when(sp, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}"))
        elif c in src_set:
            # keys / non-updated columns: target wins when present
            val = F.when(tp, F.col(f"__t_{c}")).otherwise(F.col(f"__s_{c}"))
        else:
            val = F.col(f"__t_{c}")
        out.append(val.alias(c))
    return j.filter(keep).select(*out)


def incremental_agg_maintain(
    view: DataFrame,
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: dict[str, str],
    delete_col: str | None = None,
    count_alias: str = "n",
    old_rows: DataFrame | None = None,
) -> DataFrame:
    """Incremental maintenance of a grouped count/sum view under a CDC
    batch — the materialized-view algebra (Gupta & Mumick's delta
    rules): instead of re-aggregating the 100 TB base table after every
    batch, fold the batch's SIGNED contributions into the existing view.

        view' = view ⊕ ( −agg(old rows of changed keys)
                         ⊕ +agg(inserted/updated rows) )

    ``view`` holds ``group_cols``, ``count_alias`` and one column per
    ``sum_cols`` alias; ``changes`` carries full replacement rows
    (``merge_upsert``'s convention: update/insert rows with every
    column, deletes flagged via ``delete_col``). Old values of changed
    keys come from ``old_rows`` when the CDC feed ships before-images
    (Debezium-style), else from one key-join against ``base`` — the
    only touch of the base table, an indexed/pruned point lookup on a
    real lakehouse, never a re-scan of history. Group-moving updates
    (a row whose update changes its group) are handled naturally: −1
    in the old group, +1 in the new one. Groups whose count reaches 0
    leave the view. Keys must be non-null and unique per batch (the
    MERGE precondition).

    Exactness: counts and integer-domain sums (cents) stay in int64, so
    the maintained view is BIT-IDENTICAL to a from-scratch re-aggregate
    — which is precisely what the cross-engine gate pins
    (``incremental_view_orders``: oracle recomputes the view over the
    merged table; Spark never touches the merged table).

    Scale shape: O(|batch|) for the delta aggregate (map-side combine),
    one O(|batch|) key join for old rows, and ONE |view|⋈|delta groups|
    null-safe full-outer join — the view is group-cardinality-sized,
    orders of magnitude below the base. No shuffle touches base rows
    beyond the changed keys.
    """
    keys = changes.select(*key_cols).distinct()
    if old_rows is None:
        old_rows = base.join(keys, key_cols, "inner")

    def contrib(df: DataFrame, w: int) -> DataFrame:
        return df.select(
            *group_cols,
            *[F.col(c).alias(a) for a, c in sum_cols.items()],
            F.lit(w).alias("__w"),
        )

    if delete_col is not None:
        survivors = changes.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        )
    else:
        survivors = changes
    delta = (
        contrib(old_rows, -1)
        .unionByName(contrib(survivors, 1))
        .groupBy(*group_cols)
        .agg(
            F.sum("__w").alias(f"__d_{count_alias}"),
            *[
                F.sum(F.col(a) * F.col("__w")).alias(f"__d_{a}")
                for a in sum_cols
            ],
        )
    )
    v = view.select(
        *[F.col(c).alias(f"__v_{c}") for c in view.columns],
    )
    cond = None
    for g in group_cols:
        e = F.col(f"__v_{g}").eqNullSafe(F.col(g))
        cond = e if cond is None else cond & e
    j = v.join(delta, cond, "full_outer")
    measures = [count_alias, *sum_cols.keys()]
    out = j.select(
        *[
            F.coalesce(F.col(f"__v_{g}"), F.col(g)).alias(g)
            for g in group_cols
        ],
        *[
            (
                F.coalesce(F.col(f"__v_{m}"), F.lit(0).cast("long"))
                + F.coalesce(F.col(f"__d_{m}"), F.lit(0).cast("long"))
            ).alias(m)
            for m in measures
        ],
    )
    return out.filter(F.col(count_alias) > 0)
