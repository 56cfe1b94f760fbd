"""Z-order (Morton-curve) multi-column clustering for zone-map pruning.

``cluster_write`` gives ONE column the "1 + ε files per value" property
(docs/source/lakeshack.rst:443-445); every other column's min/max spans the
whole domain in every file, so the metastore's optional-column range
clauses (reference ``Metastore.retrieve_filepaths``,
lakeshack/metastore.py:453-467) prune nothing. Z-ordering interleaves the
bits of per-column quantile-rank buckets and range-partitions on the
interleaved value: every indexed column then has file-local min/max ranges
of width ~domain/√n_files (2 columns), so the SAME footer-stats metastore
prunes on ANY of them — no new index structure, just a better layout.

This is the standard lakehouse answer to multi-predicate file skipping
(Delta/Iceberg ``OPTIMIZE ZORDER BY``), re-expressed on the open
DataFrame API:

- Per-column bucket boundaries come from ONE bounded aggregation
  (``approx_percentile`` with 2^bits - 1 cutpoints), folded into the plan
  as ONE literal array per column (a single parsed SQL string — per-scalar
  ``F.lit`` costs a py4j round trip each, see CLAUDE.md).
- The rank lookup is ``size(filter(cutpoints, p -> p <= v))`` — O(2^bits)
  comparisons per row inside whole-stage codegen, map-only. Quantile (not
  min/max-uniform) buckets keep skewed columns balanced.
- Bit interleave is a fixed ``8 × n_cols``-term shift/or expression, also
  one SQL string.
- The only shuffle is the final ``repartitionByRange`` on the z-value —
  identical cost shape to ``cluster_write``'s single-column layout; at
  100 TB the rewrite streams once through the cluster either way.

Layout quality is best-effort by design (pruning false positives are
harmless — the scan re-filters exactly, README.rst:12-19), so the
``approx_percentile`` sketch's merge-order sensitivity only perturbs file
boundaries, never results; no RNG is involved.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: 2^8 buckets per column: file-level pruning needs far fewer distinct
#: buckets than files (thousands at 100 TB), and 8 bits × 4 columns still
#: fits a 32-bit z-value in a long.
DEFAULT_BITS = 8

ZVAL_COL = "__zval"


def _norm_sql(df: DataFrame, col: str) -> str:
    """SQL mapping ``col`` to an order-preserving double. ANSI mode (the
    Spark 4 default) rejects ``cast(date as double)``, so temporal types
    go through their integer epoch forms first (µs epoch ≈ 1.7e15 stays
    well inside double's 2^53 exact range)."""
    dt = {f.name: f.dataType.simpleString() for f in df.schema.fields}.get(col)
    if dt == "date":
        return f"cast(unix_date({col}) as double)"
    if dt == "timestamp":
        return f"cast(unix_micros({col}) as double)"
    if dt == "timestamp_ntz":
        return f"cast(unix_micros(cast({col} as timestamp)) as double)"
    return f"cast({col} as double)"


def _cutpoints(df: DataFrame, columns: Sequence[str], bits: int) -> dict[str, list]:
    """One bounded aggregation → 2^bits - 1 quantile cutpoints per column
    (driver-side size: columns × 255 doubles — trivial)."""
    n = (1 << bits) - 1
    qs = ", ".join(f"{(i + 1) / (n + 1):.17e}" for i in range(n))
    aggs = [
        F.expr(
            f"approx_percentile({_norm_sql(df, c)}, array({qs}), 10000)"
        ).alias(c)
        for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: list(row[c] or []) for c in columns}


def _bucket_expr(norm: str, cuts: list) -> str:
    """SQL for the quantile-rank bucket of the normalized column ``norm``:
    how many cutpoints lie at or below the value. NULL predicate results
    are dropped by ``filter`` → NULLs land in bucket 0, clustering
    together at the curve origin (their footer stat is NULL anyway; NULL
    stats always survive pruning)."""
    arr = "array(" + ",".join(f"{v:.17e}" for v in cuts) + ")"
    return f"size(filter({arr}, p -> p <= {norm}))"


def _interleave_expr(bucket_sql: Sequence[str], bits: int) -> str:
    """Morton interleave: bit ``i`` of column ``j`` lands at position
    ``i * n_cols + j`` (LSB-first, so low-order locality is shared across
    columns). Fixed-size expression: bits × n_cols shift/or terms."""
    ncols = len(bucket_sql)
    terms = []
    for j, b in enumerate(bucket_sql):
        for i in range(bits):
            terms.append(
                f"shiftleft(cast((shiftright({b}, {i}) & 1) as bigint), {i * ncols + j})"
            )
    return " + ".join(terms)


def zorder_value(
    df: DataFrame, columns: Sequence[str], bits: int = DEFAULT_BITS
) -> Column:
    """The z-value Column for ``columns`` (numeric / date / timestamp —
    anything cast-able to double; the cast only orders buckets, exact
    values never leave the data)."""
    if not columns:
        raise ValueError("zorder needs at least one column")
    if bits * len(columns) > 62:
        raise ValueError("bits * n_cols must fit a signed long")
    cuts = _cutpoints(df, columns, bits)
    buckets = [_bucket_expr(_norm_sql(df, c), cuts[c]) for c in columns]
    return F.expr(_interleave_expr(buckets, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    columns: Sequence[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` z-order-clustered Parquet files.

    Same contract as ``writer.cluster_write`` with the cluster key
    replaced by the Morton value: range-partition so each file owns a
    narrow z-range, sort within partitions so row groups subdivide it.
    Every column in ``columns`` should be listed in the shack's
    ``optional_columns`` (or be the cluster column) so its footer stats
    are ingested and pruned on.
    """
    z = df.withColumn(ZVAL_COL, zorder_value(df, columns, bits))
    out = (
        z.repartitionByRange(n_files, ZVAL_COL)
        .sortWithinPartitions(ZVAL_COL)
        .drop(ZVAL_COL)
    )
    out.write.mode(mode).parquet(path)
