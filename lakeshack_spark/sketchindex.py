"""Per-file HyperLogLog sketch index: distinct-count estimates from
file metadata, without scanning data.

The metastore's zone maps (reference lakeshack/metastore.py:414-481)
answer *range* questions from per-file metadata; ``fileindex``'s Bloom
sidecar answers *membership*. This module completes the file-metadata
index tier with the third classic: per-file **mergeable distinct
sketches** (Apache DataSketches HLL via Spark 4's ``hll_sketch_agg`` /
``hll_union_agg``), so "how many distinct users / documents / keys does
this lake (or this slice of files, or this group) hold?" is answered
from a sidecar of ~1.5 KB sketches instead of a full-data
``COUNT(DISTINCT)`` shuffle.

Why this is the 100 TB shape:

- **Build** is one column-pruned scan per new file set; the aggregate
  shuffle carries ``n_files × groups`` sketch rows (KBs each) — bounded
  by file count, not data size. Incremental ``update()`` sketches only
  unseen files, so a daily append costs one partition's scan.
- **Merge-don't-recount**: HLL union is register-wise max — exactly
  associative, commutative, and idempotent — so any subset of files
  (or any group rollup) merges in O(sketch) per file with NO rescan,
  and re-unioning overlapping slices never double-counts. This is the
  property COUNT(DISTINCT) fundamentally lacks and the reason
  warehouse rollup tables store sketches, not counts.
- **Determinism**: the sketch of a fixed file is a fixed byte string
  and union is order-independent, so estimates are reproducible — the
  gate entry pins a within-ε accuracy contract against the exact
  distinct count (bounds-as-booleans, like the sketch query family).

Estimates carry DataSketches' standard error ≈ 1.04/√(2^lg_config_k)
(~1.6 % at the default lg_config_k=12); callers needing exactness run
the exact aggregate — this index is the planning/monitoring path.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from lakeshack_spark.metastore import list_parquet_files

logger = logging.getLogger(__name__)


class DistinctSketchIndex:
    """A per-file (optionally per-group) HLL sketch sidecar for ONE
    column of an immutable-file Parquet dataset.

    Parameters
    ----------
    spark, store_path
        The sidecar's own Parquet directory (conventionally
        ``<lake>/_lakeshack_hll/<column>`` — the metastore's listing
        already skips ``_``-prefixed side dirs).
    column
        The sketched data column (int/long/string/binary — the types
        ``hll_sketch_agg`` accepts). NULLs are not inserted.
    group_col
        Optional second key: sketches are kept per (file, group), so
        group-level distinct rollups merge from metadata too (the
        materialized-rollup pattern for COUNT(DISTINCT)). ``None``
        keeps one sketch per file.
    lg_config_k
        DataSketches lgConfigK (default 12 → ~1.6 % standard error,
        ~1.5 KB per sketch). An existing store's value wins so every
        sketch in one index stays union-compatible.
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        column: str,
        group_col: str | None = None,
        lg_config_k: int = 12,
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.column = column
        self.group_col = group_col
        self.lg_config_k = lg_config_k

    # -------------------------------------------------------------- store

    def _exists(self) -> bool:
        return os.path.isdir(self.store_path) and any(
            f.endswith(".parquet")
            for f in os.listdir(self.store_path)
            if not f.startswith((".", "_"))
        )

    def _store(self) -> DataFrame:
        return self.spark.read.parquet(self.store_path)

    def _store_meta(self) -> tuple[int, set[str]] | None:
        """(lg_config_k, indexed filepaths) of the existing store,
        validated uniform; None for a fresh store."""
        if not self._exists():
            return None
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = (
            pads.dataset(self.store_path, format="parquet")
            .to_table(columns=["filepath", "column", "group_col", "lg_config_k"])
        )
        if t.num_rows == 0:
            return None
        lgs = pc.unique(t.column("lg_config_k")).to_pylist()
        cols = pc.unique(t.column("column")).to_pylist()
        grps = pc.unique(t.column("group_col")).to_pylist()
        if len(lgs) != 1 or cols != [self.column] or grps != [self.group_col or ""]:
            raise ValueError(
                f"hll index at {self.store_path!r} is inconsistent: "
                f"lg_config_k={lgs}, columns={cols}, group_cols={grps}"
            )
        return lgs[0], set(pc.unique(t.column("filepath")).to_pylist())

    # -------------------------------------------------------------- build

    def update(self, parquet_file_or_dir: str | Sequence[str]) -> int:
        """Idempotent incremental build: sketch only files the sidecar
        has not seen, append. Returns the number of new files indexed."""
        roots = (
            [parquet_file_or_dir]
            if isinstance(parquet_file_or_dir, str)
            else list(parquet_file_or_dir)
        )
        files = [f for p in roots for f in list_parquet_files(p, self.spark)]
        meta = self._store_meta()
        lg_k = self.lg_config_k if meta is None else meta[0]
        seen = set() if meta is None else meta[1]
        new_files = sorted(set(files) - seen)
        if not new_files:
            return 0
        keys = [
            F.regexp_replace(F.input_file_name(), "^file://", "").alias(
                "filepath"
            )
        ]
        if self.group_col is not None:
            keys.append(F.col(self.group_col).alias("grp"))
        sketches = (
            self.spark.read.parquet(*new_files)
            .select(*keys, F.col(self.column).alias("__v"))
            .filter(F.col("__v").isNotNull())
            .groupBy("filepath", *(["grp"] if self.group_col else []))
            .agg(
                F.hll_sketch_agg("__v", F.lit(lg_k)).alias("sketch"),
                F.count("*").cast("long").alias("n_rows"),
            )
        )
        if self.group_col is None:
            sketches = sketches.withColumn("grp", F.lit(None).cast("string"))
        out = sketches.select(
            "filepath",
            F.lit(self.column).alias("column"),
            F.lit(self.group_col or "").alias("group_col"),
            F.lit(lg_k).cast("int").alias("lg_config_k"),
            F.col("grp").cast("string").alias("grp"),
            "n_rows",
            "sketch",
        )
        out.write.mode("append").parquet(self.store_path)
        logger.info(
            "hll-sketched %d new files at lg_config_k=%d", len(new_files), lg_k
        )
        return len(new_files)

    # -------------------------------------------------------------- query

    def estimates(self, files: Sequence[str] | None = None) -> DataFrame:
        """Per-group distinct estimates merged across ``files`` (default
        all indexed files): ``(grp, n_files, n_rows, estimate)``. The
        job reads only the sidecar — O(#files) sketch rows, no data
        scan. Without a ``group_col`` the single output row has grp
        NULL."""
        st = self._store()
        if files is not None:
            st = st.filter(F.col("filepath").isin([f for f in files]))
        return (
            st.groupBy("grp")
            .agg(
                F.countDistinct("filepath").cast("long").alias("n_files"),
                F.sum("n_rows").alias("n_rows"),
                F.hll_union_agg("sketch").alias("__merged"),
            )
            .select(
                "grp",
                "n_files",
                "n_rows",
                F.hll_sketch_estimate("__merged").alias("estimate"),
            )
        )

    def estimate(self, files: Sequence[str] | None = None) -> int:
        """Total distinct estimate across groups and ``files`` — one
        union over the sidecar's sketch rows, no data scan."""
        st = self._store()
        if files is not None:
            st = st.filter(F.col("filepath").isin([f for f in files]))
        row = st.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e")
        ).collect()[0]
        return int(row["e"]) if row["e"] is not None else 0
