"""Per-file Bloom index: file skipping for point lookups on columns the
zone maps cannot prune.

The metastore's min/max stats (reference lakeshack/metastore.py:414-481)
prune files for the CLUSTER column and range-friendly optional columns.
A point lookup on a high-cardinality column that is *not* correlated
with the clustering (a comment, a user id, a document hash) defeats
zone maps completely: every file's [min, max] spans the whole domain,
so zero files prune. This module adds the standard warehouse answer —
one Bloom filter per file over the column's values — as a Parquet
sidecar next to the stats store.

Why this is the 100 TB shape:

- **Build** is ONE column-pruned scan of the data (the minimum any
  index costs anywhere), a map-side explode to (file, word, mask)
  triples, and a (file, word)-keyed ``bit_or`` aggregate whose shuffle
  carries at most ``n_files × num_bits/64`` rows — data-size-
  independent. Incremental ``update()`` anti-joins on already-indexed
  filepaths, so a daily partition append re-scans only the new files.
- **Probe** is driver-side over a metadata-sized table (set words only
  — a sparse encoding, so small files cost what they contain, not the
  configured width) with pure-Python md5 position math: ZERO Spark
  jobs to decide which files a query may skip, mirroring the
  metastore's driver fast path.
- **Exactness**: a Bloom filter has false positives but never false
  negatives, so the surviving file list is a provable superset of the
  files containing each value; ``bloom_lookup`` re-applies the exact
  predicate on the surviving files' scan, making the end result
  IDENTICAL to an unindexed full-scan filter (which is exactly what
  the gate oracle asserts). False positives only cost extra I/O.

Hashing is the repo's portable md5 discipline (``dedup._h64`` /
``bloom._hash_pair(hash_fn="md5")``): executor-side inserts and
driver-side probes derive identical bit positions with no RNG and no
engine-specific hash, pinned by a Spark≡Python parity test.
"""

from __future__ import annotations

import hashlib
import logging
import math
import os
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from lakeshack_spark.metastore import list_parquet_files
from lakeshack_spark.operators.bloom import _hash_pair

logger = logging.getLogger(__name__)

#: Sidecar schema: one row per (file, set 64-bit word). num_bits /
#: num_hashes / column ride along on every row so the store is
#: self-describing (probes validate uniformity instead of trusting a
#: side meta file that can drift).
_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("filepath", T.StringType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("num_bits", T.LongType(), False),
        T.StructField("num_hashes", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("bits", T.LongType(), False),
    ]
)


def _py_h64(s: str) -> int:
    """Python twin of ``dedup._h64``: first 15 hex digits of md5 as an
    int — identical positions driver-side and executor-side (parity is
    unit-pinned in tests/test_fileindex.py)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def py_positions(value: Any, num_bits: int, num_hashes: int) -> list[int]:
    """Driver-side probe positions for ``value`` — the Python twin of
    the executor-side ``bloom._hash_pair(hash_fn='md5')`` double-hash
    schedule. ``value`` is stringified exactly as Spark's
    ``CAST(col AS STRING)`` renders it, which agrees with ``str()`` for
    the supported key types (string / integer)."""
    s = value if isinstance(value, str) else str(value)
    h1 = _py_h64("bfa:" + s) % num_bits
    h2 = (_py_h64("bfb:" + s) % num_bits) | 1
    return [(h1 + i * h2) % num_bits for i in range(num_hashes)]


def _next_pow2(n: int) -> int:
    return 1 << max(6, math.ceil(math.log2(max(1, n))))


class BloomFileIndex:
    """A per-file Bloom sidecar for ONE column of an immutable-file
    Parquet dataset.

    Parameters
    ----------
    spark, store_path
        The sidecar's own Parquet directory (conventionally
        ``<lake>/_lakeshack_bloom/<column>`` — the metastore's listing
        already skips ``_``-prefixed side dirs).
    column
        The indexed data column. Values are hashed through
        ``CAST(col AS STRING)``; intended for string / integer key
        columns (document hashes, user ids, comments). NULLs are never
        inserted and cannot be probed.
    bits_per_row, num_hashes
        Sizing: ``num_bits`` is the next power of two ≥ ``bits_per_row``
        × the largest new file's footer row count (16 bits/row with
        k=6 ≈ 0.4 % false-positive rate), clamped to [64, 2^24]. An
        existing store's width wins — all files in one index share
        ``num_bits`` so a probe hashes each value once.
    """

    MAX_BITS = 1 << 24  # 2 MiB of bits per file at the dense worst case

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        column: str,
        bits_per_row: int = 16,
        num_hashes: int = 6,
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.column = column
        self.bits_per_row = bits_per_row
        self.num_hashes = num_hashes

    # -------------------------------------------------------------- build

    def _exists(self) -> bool:
        return os.path.isdir(self.store_path) and any(
            f.endswith(".parquet")
            for f in os.listdir(self.store_path)
            if not f.startswith((".", "_"))
        )

    def _read_arrow(self):
        import pyarrow.dataset as pads

        return pads.dataset(self.store_path, format="parquet").to_table()

    def _store_params(self) -> tuple[int, int] | None:
        """(num_bits, num_hashes) of the existing store, validated
        uniform; None for a fresh store."""
        if not self._exists():
            return None
        import pyarrow.compute as pc

        t = self._read_arrow()
        if t.num_rows == 0:
            return None
        bits = pc.unique(t.column("num_bits")).to_pylist()
        ks = pc.unique(t.column("num_hashes")).to_pylist()
        cols = pc.unique(t.column("column")).to_pylist()
        if len(bits) != 1 or len(ks) != 1 or cols != [self.column]:
            raise ValueError(
                f"bloom index at {self.store_path!r} is inconsistent: "
                f"num_bits={bits}, num_hashes={ks}, columns={cols} "
                f"(expected single width over column {self.column!r})"
            )
        return bits[0], ks[0]

    def _indexed_files(self) -> set[str]:
        if not self._exists():
            return set()
        import pyarrow.compute as pc

        return set(
            pc.unique(self._read_arrow().column("filepath")).to_pylist()
        )

    def update(self, parquet_file_or_dir: str | Sequence[str]) -> int:
        """Idempotent incremental build: discover files, index only the
        ones the sidecar has not seen, append. Returns new files indexed.

        The scan is column-pruned to the indexed column + the virtual
        ``input_file_name``; the aggregate shuffle is bounded by
        ``n_new_files × num_bits/64`` rows regardless of data size.
        """
        roots = (
            [parquet_file_or_dir]
            if isinstance(parquet_file_or_dir, str)
            else list(parquet_file_or_dir)
        )
        files = [f for p in roots for f in list_parquet_files(p, self.spark)]
        new_files = sorted(set(files) - self._indexed_files())
        if not new_files:
            return 0
        params = self._store_params()
        if params is not None:
            num_bits, num_hashes = params
        else:
            num_hashes = self.num_hashes
            import pyarrow.parquet as pq

            max_rows = max(
                pq.ParquetFile(f).metadata.num_rows for f in new_files
            )
            num_bits = min(
                self.MAX_BITS, _next_pow2(self.bits_per_row * max_rows)
            )

        h1, h2 = _hash_pair(F.col("__k"), num_bits, hash_fn="md5")
        positions = F.array(
            *[(h1 + F.lit(i) * h2) % num_bits for i in range(num_hashes)]
        )
        sparse = (
            self.spark.read.parquet(*new_files)
            .select(
                # input_file_name returns a file:// URI locally; the
                # sidecar stores the same plain paths list_parquet_files
                # discovers, so probes and listings join exactly.
                F.regexp_replace(F.input_file_name(), "^file://", "").alias(
                    "filepath"
                ),
                F.col(self.column).cast("string").alias("__k"),
            )
            .filter(F.col("__k").isNotNull())
            .select("filepath", F.explode(positions).alias("p"))
            .select(
                "filepath",
                F.expr("CAST(p DIV 64 AS INT) AS w"),
                F.expr("shiftleft(1L, CAST(p % 64 AS INT)) AS m"),
            )
            .groupBy("filepath", "w")
            .agg(F.bit_or("m").alias("bits"))
            .select(
                "filepath",
                F.lit(self.column).alias("column"),
                F.lit(num_bits).cast("long").alias("num_bits"),
                F.lit(num_hashes).cast("int").alias("num_hashes"),
                "w",
                "bits",
            )
        )
        sparse.write.mode("append").parquet(self.store_path)
        logger.info(
            "bloom-indexed %d new files at %d bits, k=%d",
            len(new_files),
            num_bits,
            num_hashes,
        )
        return len(new_files)

    # -------------------------------------------------------------- probe

    def prune(self, values: Sequence[Any] | Any) -> dict[str, list[Any]]:
        """``{filepath: [values possibly present]}`` over the indexed
        files — driver-side, zero Spark jobs, no false negatives.

        A file appears iff every probed bit of at least one value is
        set; values a file cannot contain are dropped from its list, so
        a downstream per-file scan can even specialize its IN-list
        (the same contract the metastore's ``prune`` returns)."""
        if not isinstance(values, (list, tuple)):
            values = [values]
        values = list(dict.fromkeys(values))
        if not values or not self._exists():
            return {}
        params = self._store_params()
        if params is None:
            return {}
        num_bits, num_hashes = params
        t = self._read_arrow()
        words: dict[str, dict[int, int]] = {}
        for fp, w, bits in zip(
            t.column("filepath").to_pylist(),
            t.column("w").to_pylist(),
            t.column("bits").to_pylist(),
        ):
            words.setdefault(fp, {})[w] = bits
        probes = [
            (v, py_positions(v, num_bits, num_hashes)) for v in values
        ]
        out: dict[str, list[Any]] = {}
        for fp, wmap in words.items():
            hits = [
                v
                for v, ps in probes
                if all(wmap.get(p >> 6, 0) & (1 << (p & 63)) for p in ps)
            ]
            if hits:
                out[fp] = hits
        return out

    def prune_files(self, values: Sequence[Any] | Any) -> list[str]:
        """Just the surviving file list, sorted."""
        return sorted(self.prune(values))

    def lookup(
        self,
        values: Sequence[Any] | Any,
        columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """Exact point lookup through the index: scan ONLY the surviving
        files, then re-apply the exact IN predicate (removing Bloom
        false positives), so the result is identical to filtering the
        full dataset — the index's only effect is skipped I/O.
        """
        if not isinstance(values, (list, tuple)):
            values = [values]
        survivors = self.prune_files(values)
        all_files = sorted(self._indexed_files())
        if not all_files:
            raise ValueError(f"bloom index at {self.store_path!r} is empty")
        # Empty survivor set: the value is PROVABLY absent (no false
        # negatives); produce an empty frame with the data schema from a
        # metadata-only read.
        src = survivors if survivors else [all_files[0]]
        df = self.spark.read.parquet(*src)
        pred = F.col(self.column).isin(list(values))
        if not survivors:
            pred = F.lit(False)
        df = df.filter(pred)
        if columns is not None:
            df = df.select(*columns)
        return df
