"""Custom Python DataSource (sources.synth): registration, determinism,
and filter pushdown into partition planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.sources.synth import (
    SynthDocsDataSource,
    SynthDocsReader,
    _doc_text,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SynthDocsDataSource)
    # runtime conf: without it Spark REFUSES a reader that implements
    # pushFilters (DATA_SOURCE_PUSHDOWN_DISABLED) rather than silently
    # skipping pushdown
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def test_synth_source_reads_deterministic_rows(registered):
    df = (
        registered.read.format("synth_docs")
        .option("n_rows", "120")
        .option("rows_per_partition", "50")
        .load()
    )
    assert df.columns == ["doc_id", "text", "source", "n_chars"]
    rows = sorted((r.doc_id, r.text, r.source, r.n_chars) for r in df.collect())
    assert len(rows) == 120
    assert [r[0] for r in rows] == list(range(120))
    # generator-side determinism: the executor rows equal a driver-side
    # regeneration, and n_chars is consistent with the text
    for doc_id, text, source, n_chars in rows[:10]:
        assert text == _doc_text("synth", doc_id)
        assert n_chars == len(text)
        assert source.startswith("synth-")
    # second read: bit-identical corpus
    again = sorted(
        (r.doc_id, r.text, r.source, r.n_chars)
        for r in registered.read.format("synth_docs")
        .option("n_rows", "120")
        .option("rows_per_partition", "7")  # different partitioning
        .load()
        .collect()
    )
    assert again == rows


def test_synth_source_filter_results_match_post_filter(registered):
    df = (
        registered.read.format("synth_docs")
        .option("n_rows", "200")
        .option("rows_per_partition", "40")
        .load()
    )
    got = sorted(
        r.doc_id
        for r in df.filter(
            (F.col("doc_id") >= 150) & (F.col("doc_id") < 160)
        ).collect()
    )
    assert got == list(range(150, 160))
    # a non-pushable predicate composes (returned to Spark to evaluate)
    n = df.filter(
        (F.col("doc_id") < 50) & F.col("text").contains("scan")
    ).count()
    want = sum(1 for i in range(50) if "scan" in _doc_text("synth", i))
    assert n == want and 0 < n < 50


def test_synth_reader_pushdown_prunes_partitions():
    """Unit-level pin of the plan-time pruning: range filters on doc_id
    tighten the generated interval, shrink partitions(), and are
    CONSUMED; other filters fall through."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringContains,
    )

    r = SynthDocsReader(
        {"n_rows": "1000", "rows_per_partition": "100", "seed": "synth"}
    )
    assert len(r.partitions()) == 10
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 300),
                LessThan(("doc_id",), 500),
                StringContains(("text",), "scan"),
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], StringContains)
    parts = r.partitions()
    assert len(parts) == 2  # [300,400), [400,500)
    assert (parts[0].start, parts[-1].end) == (300, 500)
    # equality collapses to one single-row partition
    r2 = SynthDocsReader({"n_rows": "1000", "rows_per_partition": "100"})
    assert list(r2.pushFilters([EqualTo(("doc_id",), 42)])) == []
    (p,) = r2.partitions()
    assert (p.start, p.end) == (42, 43)
    # contradictory bounds -> one empty partition, zero rows generated
    r3 = SynthDocsReader({"n_rows": "1000"})
    list(r3.pushFilters([GreaterThanOrEqual(("doc_id",), 900)]))
    list(r3.pushFilters([LessThan(("doc_id",), 100)]))
    (p,) = r3.partitions()
    assert p.start >= p.end


def test_synth_source_composes_with_text_operators(registered):
    """The source output drives the repo's own operators end to end."""
    from lakeshack_spark.operators import text

    docs = (
        registered.read.format("synth_docs").option("n_rows", "80").load()
    )
    out = text.hashed_linear_score(docs, n_buckets=32, weight_span=4)
    assert out.count() == 80
