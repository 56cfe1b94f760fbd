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


# ------------------------------------------------------------ sink side


def test_lakeshack_sink_writes_and_indexes(registered, tmp_path):
    """The sink writes one parquet file per non-empty partition, commit
    moves them out of staging and indexes them in the co-located stats
    store — after which the full Lakeshack pruned-query path works on
    the lake the sink built."""
    import os

    from lakeshack_spark.engine import Lakeshack
    from lakeshack_spark.sources.sink import LakeshackSinkDataSource

    registered.dataSource.register(LakeshackSinkDataSource)
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    orders = registered.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        orders.repartitionByRange(4, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.format("lakeshack_sink")
        .option("path", lake)
        .option("cluster_column", "o_custkey")
        .option("optional_columns", "o_orderdate")  # temporal stat parity
        .mode("append")
        .save()
    )
    files = [f for f in os.listdir(lake) if f.endswith(".parquet")]
    assert len(files) == 4
    assert not [d for d in os.listdir(lake) if d.startswith("_staging")]
    shack = Lakeshack(registered, lake, "o_custkey", ["o_orderdate"])
    # the sink's commit already indexed (Spark-free, pyarrow footer
    # stats): rows exist without any explicit update_metastore call...
    assert shack.metastore.stats_df().count() == 4
    # ...and the Spark ingest READS the sink-written store (schema
    # parity incl. the timestamp stat columns) and finds nothing new
    # (filepath-dedup interop)
    assert shack.update_metastore() == 0
    got = shack.query([7, 42]).count()
    want = orders.filter(F.col("o_custkey").isin([7, 42])).count()
    assert got == want > 0
    # second append: only the new files are indexed on top (idempotent)
    orders.limit(10).coalesce(1).write.format("lakeshack_sink").option(
        "path", lake
    ).option("cluster_column", "o_custkey").option(
        "optional_columns", "o_orderdate"
    ).mode("append").save()
    assert shack.metastore.stats_df().count() == 5


def test_lakeshack_sink_rejects_overwrite(registered, tmp_path):
    from lakeshack_spark.sources.sink import LakeshackSinkDataSource

    registered.dataSource.register(LakeshackSinkDataSource)
    df = registered.range(5).select(F.col("id").alias("k"))
    with pytest.raises(Exception, match="append-only"):
        df.write.format("lakeshack_sink").option(
            "path", str(tmp_path / "x")
        ).mode("overwrite").save()


def test_synth_stream_to_lakeshack_sink_end_to_end(registered, tmp_path):
    """The full custom-source quadrant in one pipe: streaming synthetic
    corpus (SimpleDataSourceStreamReader, offset = next doc_id) →
    streaming lakeshack sink (per-batch staging/move/index commits).
    The drained stream must leave a lake whose rows equal the BATCH
    read of the same source, with every committed file indexed."""
    import os

    from lakeshack_spark.engine import Lakeshack
    from lakeshack_spark.sources.sink import LakeshackSinkDataSource

    registered.dataSource.register(LakeshackSinkDataSource)
    lake = str(tmp_path / "stream_lake")
    os.makedirs(lake)
    stream = (
        registered.readStream.format("synth_docs")
        .option("n_rows", "90")
        .option("rows_per_batch", "40")
        .load()
    )
    q = (
        stream.writeStream.format("lakeshack_sink")
        .option("path", lake)
        .option("cluster_column", "doc_id")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    lake_df = registered.read.parquet(f"{lake}/part-*.parquet")
    batch_df = (
        registered.read.format("synth_docs").option("n_rows", "90").load()
    )
    got = sorted(tuple(r) for r in lake_df.collect())
    want = sorted(tuple(r) for r in batch_df.collect())
    assert got == want and len(got) == 90
    # every committed file is indexed; the pruned query path works
    shack = Lakeshack(registered, lake, "doc_id")
    n_files = len(
        [f for f in os.listdir(lake) if f.endswith(".parquet")]
    )
    assert shack.metastore.stats_df().count() == n_files >= 3
    assert shack.query([5, 77]).count() == 2
