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


# --------------------------------------------------------------------------
# Quantile sketches (KLL) — the fourth classic of the file-metadata tier
# --------------------------------------------------------------------------

#: kind → (sketch_agg, merge_agg, get_quantile, get_rank, spark cast type)
_KLL_FNS = {
    "bigint": (
        "kll_sketch_agg_bigint",
        "kll_merge_agg_bigint",
        "kll_sketch_get_quantile_bigint",
        "kll_sketch_get_rank_bigint",
        "long",
    ),
    "double": (
        "kll_sketch_agg_double",
        "kll_merge_agg_double",
        "kll_sketch_get_quantile_double",
        "kll_sketch_get_rank_double",
        "double",
    ),
    "float": (
        "kll_sketch_agg_float",
        "kll_merge_agg_float",
        "kll_sketch_get_quantile_float",
        "kll_sketch_get_rank_float",
        "float",
    ),
}


class QuantileSketchIndex:
    """A per-file (optionally per-group) KLL quantile-sketch sidecar for
    ONE numeric column of an immutable-file Parquet dataset — the
    distribution analogue of :class:`DistinctSketchIndex`, completing the
    metadata index tier: zone maps answer *ranges*, Bloom *membership*,
    HLL *cardinality*, KLL *quantiles/ranks*.

    Why this is the 100 TB shape: KLL merge is exactly associative and
    commutative over the per-file sketches (Datasketches' KllSketch
    union), so "what is the p99 of this column across the lake / this
    slice of files / each group" is one O(#files) pass over KB-sized
    sketch rows — never a full-data sort or a single-reducer exact
    percentile buffer (the scale killer `operators/order_stats.py`
    documents). Incremental ``update()`` sketches only unseen files, so
    a daily append costs one partition's scan. Normalized rank error at
    the default k=800 is ≈1% with high confidence (Datasketches KLL
    bound 2.296/k^0.9); callers needing exactness use
    ``order_stats.exact_percentiles`` — this sidecar is the
    planning/monitoring/skew-detection path.

    ``kind`` selects the value domain (``bigint``/``double``/``float``,
    matching Spark's typed KLL function families); integer columns cast
    losslessly to bigint. An existing store's ``k``/``kind`` win so
    every sketch stays union-compatible.
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        column: str,
        group_col: str | None = None,
        k: int = 800,
        kind: str = "bigint",
    ) -> None:
        if kind not in _KLL_FNS:
            raise ValueError(f"kind must be one of {sorted(_KLL_FNS)}; got {kind!r}")
        self.spark = spark
        self.store_path = store_path
        self.column = column
        self.group_col = group_col
        self.k = k
        self.kind = kind

    def _fns(self, kind: str):
        names = _KLL_FNS[kind]
        return tuple(getattr(F, n) for n in names[:4]) + (names[4],)

    def _exists(self) -> bool:
        return os.path.isdir(self.store_path) and any(
            f.endswith(".parquet")
            for f in os.listdir(self.store_path)
            if not f.startswith((".", "_"))
        )

    def _store(self) -> DataFrame:
        return self.spark.read.parquet(self.store_path)

    def _store_meta(self) -> tuple[int, str, set[str]] | None:
        """(k, kind, indexed filepaths), validated uniform; None when
        fresh."""
        if not self._exists():
            return None
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(self.store_path, format="parquet").to_table(
            columns=["filepath", "column", "group_col", "k", "kind"]
        )
        if t.num_rows == 0:
            return None
        ks = pc.unique(t.column("k")).to_pylist()
        kinds = pc.unique(t.column("kind")).to_pylist()
        cols = pc.unique(t.column("column")).to_pylist()
        grps = pc.unique(t.column("group_col")).to_pylist()
        if (
            len(ks) != 1
            or len(kinds) != 1
            or cols != [self.column]
            or grps != [self.group_col or ""]
        ):
            raise ValueError(
                f"kll index at {self.store_path!r} is inconsistent: "
                f"k={ks}, kinds={kinds}, columns={cols}, group_cols={grps}"
            )
        return ks[0], kinds[0], set(pc.unique(t.column("filepath")).to_pylist())

    # -------------------------------------------------------------- build

    def update(self, parquet_file_or_dir: str | Sequence[str]) -> int:
        """Idempotent incremental build: sketch only files the sidecar has
        not seen, append. Returns the number of new files indexed."""
        roots = (
            [parquet_file_or_dir]
            if isinstance(parquet_file_or_dir, str)
            else list(parquet_file_or_dir)
        )
        files = [f for p in roots for f in list_parquet_files(p, self.spark)]
        meta = self._store_meta()
        k, kind = (self.k, self.kind) if meta is None else meta[:2]
        seen = set() if meta is None else meta[2]
        new_files = sorted(set(files) - seen)
        if not new_files:
            return 0
        agg_fn, _merge, _getq, _getr, cast_t = self._fns(kind)
        keys = [
            F.regexp_replace(F.input_file_name(), "^file://", "").alias(
                "filepath"
            )
        ]
        if self.group_col is not None:
            keys.append(F.col(self.group_col).alias("grp"))
        sketches = (
            self.spark.read.parquet(*new_files)
            .select(*keys, F.col(self.column).cast(cast_t).alias("__v"))
            .filter(F.col("__v").isNotNull())
            .groupBy("filepath", *(["grp"] if self.group_col else []))
            .agg(
                agg_fn("__v", F.lit(k)).alias("sketch"),
                F.count("*").cast("long").alias("n_rows"),
            )
        )
        if self.group_col is None:
            sketches = sketches.withColumn("grp", F.lit(None).cast("string"))
        out = sketches.select(
            "filepath",
            F.lit(self.column).alias("column"),
            F.lit(self.group_col or "").alias("group_col"),
            F.lit(k).cast("int").alias("k"),
            F.lit(kind).alias("kind"),
            F.col("grp").cast("string").alias("grp"),
            "n_rows",
            "sketch",
        )
        out.write.mode("append").parquet(self.store_path)
        logger.info("kll-sketched %d new files at k=%d", len(new_files), k)
        return len(new_files)

    # -------------------------------------------------------------- query

    def _merged(self, files: Sequence[str] | None):
        meta = self._store_meta()
        if meta is None:
            raise ValueError(f"kll index at {self.store_path!r} is empty")
        k, kind = meta[:2]
        _agg, merge_fn, getq_fn, getr_fn, _t = self._fns(kind)
        st = self._store()
        if files is not None:
            st = st.filter(F.col("filepath").isin(list(files)))
        merged = st.groupBy("grp").agg(
            F.countDistinct("filepath").cast("long").alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            merge_fn("sketch", F.lit(k)).alias("__merged"),
        )
        return merged, getq_fn, getr_fn

    def quantiles(
        self, ps: Sequence[float], files: Sequence[str] | None = None
    ) -> DataFrame:
        """Per-group quantile estimates merged across ``files`` (default
        all indexed): ``(grp, n_files, n_rows, q_<p>...)`` with one
        ``q_`` column per requested rank, reading ONLY the sidecar.
        Without a ``group_col`` the single row has grp NULL."""
        merged, getq_fn, _getr = self._merged(files)
        cols = [
            getq_fn("__merged", F.lit(float(p))).alias(
                f"q_{str(p).replace('.', '_')}"
            )
            for p in ps
        ]
        return merged.select("grp", "n_files", "n_rows", *cols)

    def ranks(
        self, values: Sequence[float], files: Sequence[str] | None = None
    ) -> DataFrame:
        """Per-group normalized-rank estimates of ``values`` (the inverse
        query: what fraction of rows is ≤ v), same merge discipline."""
        merged, _getq, getr_fn = self._merged(files)
        cols = [
            getr_fn("__merged", F.lit(v)).alias(f"r_{i}")
            for i, v in enumerate(values)
        ]
        return merged.select("grp", "n_files", "n_rows", *cols)


# --------------------------------------------------------------------------
# Theta sketches — distinct-count SET ALGEBRA over file slices
# --------------------------------------------------------------------------


class ThetaSketchIndex:
    """A per-file (optionally per-group) Datasketches THETA sketch
    sidecar for one column — the set-algebra member of the metadata
    index tier. HLL union answers "how many distinct over this slice";
    theta additionally supports INTERSECTION and DIFFERENCE, so
    overlap questions — repeat customers across periods, documents
    present in two crawls, keys shared by two partitions — are answered
    from KB-sized sketches with no data rescan and no distinct-join.

    Why not HLL: inclusion–exclusion over HLL unions compounds error
    catastrophically for small intersections; theta intersection
    operates on the retained-hash samples directly (Dasgupta et al.,
    the KMV/theta framework) with bounded relative error. Build/update
    discipline is identical to :class:`DistinctSketchIndex`
    (incremental, idempotent, uniform lg_k validated on reconnect).

    ``overlap(left, right)`` merges each side's per-file sketches and
    returns union/intersection/difference estimates; sides select by
    file list and/or group value, so "slice A vs slice B" covers both
    physical (files) and logical (group) splits.
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        column: str,
        group_col: str | None = None,
        lg_nom_entries: int = 12,
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.column = column
        self.group_col = group_col
        self.lg_nom_entries = lg_nom_entries

    _exists = DistinctSketchIndex._exists
    _store = DistinctSketchIndex._store

    def _store_meta(self) -> tuple[int, set[str]] | None:
        if not self._exists():
            return None
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(self.store_path, format="parquet").to_table(
            columns=["filepath", "column", "group_col", "lg_nom_entries"]
        )
        if t.num_rows == 0:
            return None
        lgs = pc.unique(t.column("lg_nom_entries")).to_pylist()
        cols = pc.unique(t.column("column")).to_pylist()
        grps = pc.unique(t.column("group_col")).to_pylist()
        if len(lgs) != 1 or cols != [self.column] or grps != [self.group_col or ""]:
            raise ValueError(
                f"theta index at {self.store_path!r} is inconsistent: "
                f"lg_nom_entries={lgs}, columns={cols}, group_cols={grps}"
            )
        return lgs[0], set(pc.unique(t.column("filepath")).to_pylist())

    def update(self, parquet_file_or_dir: str | Sequence[str]) -> int:
        """Idempotent incremental build, one theta sketch per
        (file, group); only unseen files are sketched."""
        roots = (
            [parquet_file_or_dir]
            if isinstance(parquet_file_or_dir, str)
            else list(parquet_file_or_dir)
        )
        files = [f for p in roots for f in list_parquet_files(p, self.spark)]
        meta = self._store_meta()
        lg_k = self.lg_nom_entries if meta is None else meta[0]
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
                F.theta_sketch_agg("__v", F.lit(lg_k)).alias("sketch"),
                F.count("*").cast("long").alias("n_rows"),
            )
        )
        if self.group_col is None:
            sketches = sketches.withColumn("grp", F.lit(None).cast("string"))
        out = sketches.select(
            "filepath",
            F.lit(self.column).alias("column"),
            F.lit(self.group_col or "").alias("group_col"),
            F.lit(lg_k).cast("int").alias("lg_nom_entries"),
            F.col("grp").cast("string").alias("grp"),
            "n_rows",
            "sketch",
        )
        out.write.mode("append").parquet(self.store_path)
        logger.info(
            "theta-sketched %d new files at lg_nom_entries=%d",
            len(new_files),
            lg_k,
        )
        return len(new_files)

    def _side_sketch(
        self,
        files: Sequence[str] | None = None,
        group: str | None = None,
    ):
        """One merged sketch (binary) for a slice selected by file list
        and/or group value — O(#selected sketch rows), sidecar only."""
        meta = self._store_meta()
        if meta is None:
            raise ValueError(f"theta index at {self.store_path!r} is empty")
        lg_k = meta[0]
        st = self._store()
        if files is not None:
            st = st.filter(F.col("filepath").isin(list(files)))
        if group is not None:
            st = st.filter(F.col("grp") == group)
        return st.agg(
            F.theta_union_agg("sketch", F.lit(lg_k)).alias("s")
        )

    def estimate(
        self,
        files: Sequence[str] | None = None,
        group: str | None = None,
    ) -> int:
        row = self._side_sketch(files, group).select(
            F.theta_sketch_estimate("s").alias("e")
        ).collect()[0]
        return int(row["e"]) if row["e"] is not None else 0

    def overlap(
        self,
        left: dict | None = None,
        right: dict | None = None,
    ) -> DataFrame:
        """Set-algebra estimates between two slices (each a dict with
        optional ``files``/``group`` selectors): one row —
        ``(est_left, est_right, est_union, est_intersection,
        est_difference)`` where difference = left \\ right. Reads only
        the sidecar; the two merged sketches cross-join (1×1 rows)."""
        left = left or {}
        right = right or {}
        a = self._side_sketch(**left).select(F.col("s").alias("__a"))
        b = self._side_sketch(**right).select(F.col("s").alias("__b"))
        both = a.crossJoin(b)
        return both.select(
            F.theta_sketch_estimate("__a").alias("est_left"),
            F.theta_sketch_estimate("__b").alias("est_right"),
            F.theta_sketch_estimate(F.theta_union("__a", "__b")).alias(
                "est_union"
            ),
            F.theta_sketch_estimate(
                F.theta_intersection("__a", "__b")
            ).alias("est_intersection"),
            F.theta_sketch_estimate(F.theta_difference("__a", "__b")).alias(
                "est_difference"
            ),
        )
