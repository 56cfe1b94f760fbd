"""Custom PySpark DataSource: a deterministic synthetic document corpus
with FILTER PUSHDOWN into partition planning.

Why a custom source in this repo: the engine's test strategy depends on
reproducible corpora at arbitrary scale, and the Python DataSource API
(pyspark.sql.datasource, Spark 4) is the idiomatic way to expose a
generator AS A TABLE — `spark.read.format("synth_docs")` — instead of
materializing parquet first. It also demonstrates the full source
contract the reference's scan layer has no counterpart for: schema
declaration, option parsing, partition planning (each partition
generates its id-slice independently on an executor — embarrassingly
parallel, no driver bottleneck, no files), and `pushFilters`: range/
equality predicates on ``doc_id`` tighten the generated id interval at
PLAN time, so a filtered read plans FEWER partitions and never
generates a row outside the bound — the generator-source equivalent of
zone-map file pruning (supported comparisons are consumed; everything
else is returned for Spark to evaluate, the API's required
fall-through).

Rows are md5-derived from (seed, doc_id): same seed → bit-identical
corpus on every read, any partitioning, either engine. Text draws from
a small fixed vocabulary, so the corpus composes with the repo's text
operators (tokenization, dedup, retrieval) in tests.

NOTE: a reader that implements ``pushFilters`` requires
``spark.sql.python.filterPushdown.enabled=true`` (runtime conf) —
Spark REFUSES the read otherwise (DATA_SOURCE_PUSHDOWN_DISABLED)
rather than silently skipping pushdown.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType

_VOCAB = (
    "scan filter join merge window batch vector hash row column order "
    "customer line small slow data query index stream shuffle spark"
).split()


def _h(seed: str, *parts: object) -> int:
    key = ":".join([seed, *map(str, parts)])
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:15], 16)


def _doc_text(seed: str, doc_id: int) -> str:
    n_words = 5 + _h(seed, doc_id, "len") % 20
    return " ".join(
        _VOCAB[_h(seed, doc_id, i) % len(_VOCAB)] for i in range(n_words)
    )


class _IdSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    """Plans one partition per ``rows_per_partition`` ids of the
    SURVIVING [lo, hi) interval after pushdown."""

    def __init__(self, options):
        self.seed = options.get("seed", "synth")
        self.lo = 0
        self.hi = int(options.get("n_rows", 1000))
        self.rows_per_partition = int(options.get("rows_per_partition", 250))

    def pushFilters(self, filters: List["Filter"]) -> Iterator["Filter"]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        out = []
        start = self.lo
        while start < self.hi:
            end = min(start + self.rows_per_partition, self.hi)
            out.append(_IdSlice(start, end))
            start = end
        # zero-row reads still need one (empty) partition
        return out or [_IdSlice(0, 0)]

    def read(self, partition: _IdSlice):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(self.seed, doc_id)
            yield (
                doc_id,
                text,
                f"synth-{_h(self.seed, doc_id, 'src') % 5}",
                len(text),
            )


class SynthDocsDataSource(DataSource):
    """``spark.dataSource.register(SynthDocsDataSource)`` then
    ``spark.read.format("synth_docs").option("n_rows", N).load()``.

    Options: ``n_rows`` (default 1000), ``rows_per_partition`` (default
    250 — sized so local tests get a few partitions; at scale set it so
    a partition is seconds of generation), ``seed``.
    """

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str:
        return "doc_id long, text string, source string, n_chars int"

    def reader(self, schema: "StructType") -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema: "StructType"):
        return SynthDocsStreamReader(self.options)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the synthetic corpus: each micro-batch emits the
    next ``rows_per_batch`` doc ids, bounded by ``n_rows`` — offsets are
    just ``{"doc_id": next_id}``, so the stream is REPLAYABLE by
    construction (Spark re-reads an uncommitted offset range and gets
    bit-identical rows; ``readBetweenOffsets`` is the inherited
    offset-range replay). At the cap the reader returns an empty slice
    with an unchanged offset, so ``processAllAvailable()`` terminates —
    a finite, deterministic stream for tests and backfills."""

    def __init__(self, options):
        self.seed = options.get("seed", "synth")
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def read(self, start: dict):
        lo = int(start["doc_id"])
        hi = min(lo + self.rows_per_batch, self.n_rows)
        # a LIST ITERATOR, not a generator and not a bare list: the
        # simple-reader harness both calls next() on the return value
        # (so it must be an iterator) and pickles it to ship/replay the
        # prefetched slice (so it must be picklable — generators are
        # not; list iterators are). Bounded by rows_per_batch, so
        # materializing is the design.
        rows = []
        for doc_id in range(lo, hi):
            text = _doc_text(self.seed, doc_id)
            rows.append(
                (
                    doc_id,
                    text,
                    f"synth-{_h(self.seed, doc_id, 'src') % 5}",
                    len(text),
                )
            )
        return iter(rows), {"doc_id": hi}

