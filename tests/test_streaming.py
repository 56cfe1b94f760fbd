"""Structured Streaming: windowed aggs match their batch twins; the ingest
stream lands clustered files and indexes them in the metastore."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.engine import Lakeshack
from lakeshack_spark.sources.catalog import load_table, normalize_events
from lakeshack_spark.streaming import (
    dedup_within_watermark,
    session_window_stats,
    stream_ingest_clustered,
    tumbling_window_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_landing")
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def _events_stream(spark, events_stream_dir):
    batch = load_table(spark, SF, "events")
    # Read with the RAW on-disk schema (ts may be a nanos long or a µs
    # timestamp depending on testdata generation), then run the same
    # map-only normalization the batch loader applies.
    raw_schema = spark.read.parquet(f"{SF}/events.parquet").schema
    stream = normalize_events(
        spark.readStream.schema(raw_schema).parquet(events_stream_dir)
    )
    return batch, stream


def _run_stream_to_memory(spark, df, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_window_stream_matches_batch(spark, events_stream_dir):
    """Complete mode (no watermark): stream result ≡ batch result."""
    batch, stream = _events_stream(spark, events_stream_dir)
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in tumbling_window_stats(batch).collect()
    }
    got_df = _run_stream_to_memory(
        spark,
        tumbling_window_stats(stream, watermark=None),
        "tumbling_mem",
        "complete",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in got_df.collect()
    }
    assert got == want


def test_tumbling_append_withholds_open_windows(spark, events_stream_dir):
    """Append mode + watermark: windows not yet past the watermark when the
    stream ends are withheld (finalized-only emission) — the documented
    late-data policy replacing the reference's immutable-partition advice
    (docs/source/lakeshack.rst:120-161)."""
    batch, stream = _events_stream(spark, events_stream_dir)
    n_batch = tumbling_window_stats(batch).count()
    got_df = _run_stream_to_memory(
        spark,
        tumbling_window_stats(stream, watermark="2 hours"),
        "tumbling_append_mem",
        "append",
    )
    n_stream = got_df.count()
    assert n_stream < n_batch  # open windows withheld
    assert n_stream >= n_batch - 10  # but only the tail


def test_session_window_stream_matches_batch(spark, events_stream_dir):
    batch, stream = _events_stream(spark, events_stream_dir)
    want = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in session_window_stats(batch).collect()
    }
    got_df = _run_stream_to_memory(
        spark,
        session_window_stats(stream, watermark=None),
        "session_mem",
        "complete",
    )
    got = {
        (r["session_start"], r["user_id"]): r["n_events"] for r in got_df.collect()
    }
    assert got == want


def test_dedup_within_watermark_stream(spark, events_stream_dir):
    batch, stream = _events_stream(spark, events_stream_dir)
    # keys = (user_id, event_type): stream-dedup count must equal batch
    # distinct count (all rows are within one watermark horizon per key
    # ordering in this small fixture, so state never evicts early).
    want = batch.select("user_id", "event_type").distinct().count()
    got_df = _run_stream_to_memory(
        spark,
        dedup_within_watermark(stream, ["user_id", "event_type"], watermark="100 days"),
        "dedup_mem",
        "append",
    )
    assert got_df.count() == want


def test_interval_join_stream_matches_batch(spark, events_stream_dir):
    """Stream-stream interval join ≡ batch interval join, row for row.
    Both sides are unbounded streams; watermarks make the inner join
    plannable and bound its state. availableNow drains the file source,
    so every in-watermark pair must be emitted — the pair set and gaps
    must equal the batch twin exactly."""
    from lakeshack_spark.streaming.joins import interval_join

    batch, stream = _events_stream(spark, events_stream_dir)

    def split(ev):
        c = ev.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts_utc"
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts_utc"
        )
        return c, p

    def pairs(df):
        return {
            (r["user_id"], r["event_id"], r["event_id_r"]) for r in df.collect()
        }

    bc, bp = split(batch)
    want = pairs(interval_join(bc, bp, "user_id", "30 minutes", watermark=None))
    sc, sp = split(stream)
    got_df = _run_stream_to_memory(
        spark,
        interval_join(sc, sp, "user_id", "30 minutes", watermark="10 hours"),
        "ij_mem",
    )
    got = pairs(got_df)
    assert got == want and len(want) > 0


def test_stateful_running_user_stats(spark, events_stream_dir):
    """applyInPandasWithState (streaming) converges to the same final
    per-user stats as the batch pass; with multiple micro-batches the
    update-mode output's LAST row per user is the running total."""
    from lakeshack_spark.streaming import running_user_stats

    batch, stream = _events_stream(spark, events_stream_dir)
    prep = lambda df: df.select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "value"
    )
    want = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts_us"])
        for r in running_user_stats(prep(batch)).collect()
    }
    q = (
        running_user_stats(prep(stream))
        .writeStream.format("memory")
        .queryName("stateful_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts_us"])
        for r in spark.table("stateful_mem").collect()
    }
    assert got == want


def test_stream_ingest_clustered(spark, tmp_path_factory):
    landing = tmp_path_factory.mktemp("landing")
    data_dir = str(tmp_path_factory.mktemp("lake"))
    store = str(tmp_path_factory.mktemp("stats"))

    orders = load_table(spark, SF, "orders")
    orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "batch1"))
    orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(landing / "batch2"))

    shack = Lakeshack(
        spark,
        data_dir,
        cluster_column="o_custkey",
        optional_columns=["o_orderdate"],
        store_path=store,
        schema=orders.schema,
    )
    q = stream_ingest_clustered(
        spark,
        f"{landing}/*",
        shack,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt")),
        available_now=True,
    )
    q.awaitTermination(180)

    assert shack.metastore.stats_df().count() > 0
    total = shack.query(
        list(range(0, 1500))
    ).count()
    assert total == orders.count()
    # a point lookup touches a strict subset of the landed files
    all_files = shack.metastore.stats_df().count()
    touched = len(shack.candidate_files([5]))
    assert touched <= all_files


def test_stream_ingest_multibatch_with_compaction(spark, tmp_path_factory):
    """Continuous-mode realism: maxFilesPerTrigger=1 over 3 landing files
    → 3 micro-batches, each landing its own clustered batch dir; the
    compact_every=3 cadence then folds them into one globally
    range-clustered file set, so a point lookup plans a 1-file scan —
    closing the small-files loop the ingest docstring warns about."""
    landing = tmp_path_factory.mktemp("landing_multi")
    data_dir = str(tmp_path_factory.mktemp("lake_multi"))
    store = str(tmp_path_factory.mktemp("stats_multi"))

    orders = load_table(spark, SF, "orders")
    for i in range(3):
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / f"slice{i}"))

    shack = Lakeshack(
        spark,
        data_dir,
        cluster_column="o_custkey",
        optional_columns=["o_orderdate"],
        store_path=store,
        schema=orders.schema,
    )
    q = stream_ingest_clustered(
        spark,
        f"{landing}/*",
        shack,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_multi")),
        max_files_per_trigger=1,
        available_now=True,
        compact_every=3,
        compact_n_files=4,
    )
    q.awaitTermination(240)

    assert shack.query(list(range(0, 1500))).count() == orders.count()
    # post-compaction: 4 globally-clustered files, point lookup touches 1
    assert shack.metastore.stats_df().count() == 4
    assert len(shack.candidate_files([5])) == 1


def test_stream_ingest_lists_only_batch_files(spark, tmp_path_factory, monkeypatch):
    """Per-batch index updates must be O(batch), not O(dataset): each
    micro-batch passes its own batch dir to update_metastore, so the file
    listing touches ONLY that batch's files — a bare update_metastore()
    would re-list and anti-join every accumulated file per batch (at
    millions of files, a listing-bound stall). Asserted by monkeypatching
    the listing function (the r4 zero-FS-calls telemetry technique)."""
    import lakeshack_spark.metastore as ms

    landing = tmp_path_factory.mktemp("landing_scope")
    data_dir = str(tmp_path_factory.mktemp("lake_scope"))
    orders = load_table(spark, SF, "orders")
    for i in range(3):
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / f"slice{i}"))
    shack = Lakeshack(
        spark, data_dir, "o_custkey",
        store_path=str(tmp_path_factory.mktemp("stats_scope")),
        schema=orders.schema,
    )
    calls: list[tuple[str, list[str]]] = []
    real_list = ms.list_parquet_files

    def recording_list(path, *a, **kw):
        files = real_list(path, *a, **kw)
        calls.append((str(path), files))
        return files

    monkeypatch.setattr(ms, "list_parquet_files", recording_list)
    q = stream_ingest_clustered(
        spark,
        f"{landing}/*",
        shack,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_scope")),
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(240)
    monkeypatch.undo()

    assert shack.query(list(range(1500))).count() == orders.count()
    # the listing helper also serves the stats store's own directory —
    # only listings under the DATA path are ingest-scoped
    data_calls = [(p, f) for p, f in calls if p.startswith(data_dir)]
    assert len(data_calls) >= 3  # one targeted listing per micro-batch
    for path, files in data_calls:
        assert "/batch-" in path, f"listing walked the whole dataset: {path}"
        assert files and all(f.startswith(path) for f in files), (path, files)
    # and the 3 batch listings each saw a DIFFERENT batch dir
    assert len({p for p, _ in data_calls}) >= 3


def test_stream_ingest_batch_retry_is_idempotent(spark, tmp_path_factory):
    """Replaying a micro-batch (crash-recovery semantics of foreachBatch)
    must not duplicate rows: each batch overwrites its own batch dir."""
    from lakeshack_spark.streaming.ingest import stream_ingest_clustered

    landing = tmp_path_factory.mktemp("landing_retry")
    data_dir = str(tmp_path_factory.mktemp("lake_retry"))
    orders = load_table(spark, SF, "orders")
    orders.coalesce(1).write.parquet(str(landing / "d"))
    shack = Lakeshack(
        spark, data_dir, "o_custkey",
        store_path=str(tmp_path_factory.mktemp("stats_retry")),
        schema=orders.schema,
    )
    ck1 = str(tmp_path_factory.mktemp("ck1"))
    q = stream_ingest_clustered(spark, f"{landing}/*", shack, checkpoint_dir=ck1)
    q.awaitTermination(120)
    n1 = shack.query(list(range(1500))).count()
    # simulate a replay of batch 0: fresh checkpoint, same landing data
    ck2 = str(tmp_path_factory.mktemp("ck2"))
    q = stream_ingest_clustered(spark, f"{landing}/*", shack, checkpoint_dir=ck2)
    q.awaitTermination(120)
    n2 = shack.query(list(range(1500))).count()
    assert n1 == n2 == orders.count()


def test_hygiene_prefix_is_streaming_compatible(spark, tmp_path_factory):
    """The corpus-cleaning prefix (lang-ID -> quality -> repetition ->
    PII mask -> filter) is pure map-only column logic, so the SAME code
    runs unmodified over a stream — only the dedup stages are batch-side
    (they need global state). Stream result == batch result, row for row."""
    import shutil

    from lakeshack_spark.operators import text

    d = tmp_path_factory.mktemp("docs_landing")
    shutil.copy(f"{SF}/documents.parquet", d / "documents.parquet")
    batch = load_table(spark, SF, "documents")

    def prefix(df):
        out = text.mask_pii(
            text.repetition_stats(text.quality_score(text.lang_id(df)))
        )
        return out.filter(
            (F.col("n_words") >= 3) & (F.col("max_word_frac") <= 0.9)
        ).select("doc_id", "lang_pred", "quality", "text_masked")

    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    got = _run_stream_to_memory(spark, prefix(stream), "hygiene_stream")
    want = sorted(tuple(r) for r in prefix(batch).collect())
    assert sorted(tuple(r) for r in got.collect()) == want
    assert len(want) > 0


def test_normalize_events_both_physical_flavors_agree(spark, tmp_path_factory):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) (r1-r3) and
    TIMESTAMP(MICROS) (r4). Both flavors of the same instants must
    normalize to identical (ts nanos-long, ts_utc) columns — the nanos
    branch no longer has real testdata, so it is pinned on a synthesized
    file here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("events_flavors")
    us_vals = [1_700_000_000_000_000 + i * 1_234_567 for i in range(50)]
    ids = list(range(50))
    pq.write_table(
        pa.table({"event_id": pa.array(ids, pa.int64()),
                  "ts": pa.array(us_vals, pa.timestamp("us"))}),
        str(d / "micros.parquet"),
    )
    pq.write_table(
        pa.table({"event_id": pa.array(ids, pa.int64()),
                  "ts": pa.array([v * 1000 for v in us_vals], pa.timestamp("ns"))}),
        str(d / "nanos.parquet"),
    )
    micros = normalize_events(spark.read.parquet(str(d / "micros.parquet")))
    nanos = normalize_events(spark.read.parquet(str(d / "nanos.parquet")))
    # nanos flavor must have come through the nanosAsLong long branch
    assert dict(nanos.drop("ts_utc").dtypes)["ts"] == "bigint"
    m = {r.event_id: (r.ts, r.ts_utc) for r in micros.collect()}
    n = {r.event_id: (r.ts, r.ts_utc) for r in nanos.collect()}
    assert m == n
    assert m[0][0] == us_vals[0] * 1000


def test_normalize_events_pins_session_timezone(spark, tmp_path_factory):
    """normalize_events must be correct even when the caller's session
    timezone is not UTC (ADVICE r4: the NTZ→timestamp cast interprets
    walls in the session zone, and readStream users wire normalize_events
    directly, skipping load_table's configure_session). It pins the
    session config itself, so the instants come out identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("events_tzpin")
    us_vals = [1_700_000_000_000_000 + i * 7_654_321 for i in range(20)]
    pq.write_table(
        pa.table({"event_id": pa.array(list(range(20)), pa.int64()),
                  "ts": pa.array(us_vals, pa.timestamp("us"))}),
        str(d / "e.parquet"),
    )
    want = {
        r.event_id: (r.ts, r.ts_utc)
        for r in normalize_events(spark.read.parquet(str(d))).collect()
    }
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        skewed = normalize_events(spark.read.parquet(str(d)))
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = {r.event_id: (r.ts, r.ts_utc) for r in skewed.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == want
    assert got[0][0] == us_vals[0] * 1000


def test_near_dedup_within_watermark_stream_matches_batch(spark, tmp_path_factory):
    """Streaming near-dedup (simhash-keyed stateful dedup) keeps exactly
    one doc per distinct fingerprint, row-for-row equal to the batch twin:
    near-identical docs (reordered token sets) collapse, distinct docs
    survive."""
    from lakeshack_spark.streaming import near_dedup_within_watermark

    rows = []
    base = 1_700_000_000_000_000
    for i in range(40):
        if i % 4 == 0:
            text = "alpha beta gamma delta"          # cluster A (identical set)
        elif i % 4 == 1:
            text = "delta gamma beta alpha"          # cluster A reordered
        else:
            text = f"unique{i} tokens here now {i}"  # distinct
        rows.append((i, text, base + i * 1_000_000))
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("near_dedup_stream")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        str(d / "docs.parquet"),
    )
    batch = normalize_events(spark.read.parquet(str(d)))
    batch_rows = near_dedup_within_watermark(batch).collect()
    want = sorted(r["simhash"] for r in batch_rows)
    # cluster A (20 docs, one fingerprint) + 20 distinct docs
    assert len(want) == 21
    # the batch twin keeps the EVENT-TIME-EARLIEST row per fingerprint
    # deterministically: cluster A's survivor must be doc 0
    cluster_ids = {r[0] for r in rows if r[1].startswith(("alpha", "delta"))}
    survivors_a = [r["doc_id"] for r in batch_rows if r["doc_id"] in cluster_ids]
    assert survivors_a == [0]
    stream = normalize_events(
        spark.readStream.schema(spark.read.parquet(str(d)).schema).parquet(str(d))
    )
    got_df = _run_stream_to_memory(
        spark,
        near_dedup_within_watermark(stream, watermark="10 days"),
        "near_dedup_mem",
        "append",
    )
    got = sorted(r["simhash"] for r in got_df.collect())
    assert got == want


def test_stream_ingest_deduped_matches_batch_drop_set(spark, tmp_path_factory):
    """Streaming near-dedup-at-ingest ≡ batch drop set: three id-ordered
    micro-batches through stream_ingest_deduped leave exactly the docs
    the batch minhash_drop_set keeps over the whole corpus (keep-earliest
    drops a doc matching ANY earlier doc — including one itself dropped —
    which is why the state indexes every SEEN doc, not just survivors)."""
    import os
    import time

    from lakeshack_spark.operators.dedup import minhash_drop_set
    from lakeshack_spark.streaming import stream_ingest_deduped

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    landing = tmp_path_factory.mktemp("dedup_landing")
    corpus_dir = str(tmp_path_factory.mktemp("dedup_corpus"))
    state_dir = str(tmp_path_factory.mktemp("dedup_state"))

    for i, (lo, hi) in enumerate([(0, 40), (40, 80), (80, 120)]):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(str(landing / f"slice{i}"))
        # file-source processes oldest-mtime first: pin slice order = id order
        t = time.time() - 300 + i * 10
        for root, _, files in os.walk(str(landing / f"slice{i}")):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    params = dict(num_hashes=64, bands=16, k=1, threshold=0.9)
    q = stream_ingest_deduped(
        spark,
        f"{landing}/*",
        corpus_dir,
        state_dir,
        schema=docs.schema,
        checkpoint_dir=str(tmp_path_factory.mktemp("dedup_ckpt")),
        max_files_per_trigger=1,
        available_now=True,
        **params,
    )
    q.awaitTermination(300)

    got = {
        r.doc_id
        for r in spark.read.parquet(f"{corpus_dir}/batch-*").select("doc_id").collect()
    }
    drops = minhash_drop_set(docs.select("doc_id", "text"), **params)
    expect = {r.doc_id for r in docs.join(drops, "doc_id", "left_anti").collect()}
    drops.unpersist()
    assert got == expect and len(got) < 120, (len(got), len(expect))
    # every seen doc (survivor or not) is indexed for future batches
    n_index_docs = (
        spark.read.parquet(f"{state_dir}/index/batch-*")
        .select("doc_id").distinct().count()
    )
    assert n_index_docs == 120


def test_stream_ingest_deduped_state_compaction(spark, tmp_path_factory):
    """compact_state_every=N consolidates the per-batch state dirs
    (VERDICT_r5 item 4): after 4 batches with N=2, index/ and seen/ each
    hold exactly TWO subdirs (compact-00003 + nothing pending) instead of
    four — the per-batch listing population stops growing — while
    survivors and indexed-doc content are IDENTICAL to the uncompacted
    run over the same slices."""
    import os
    import time

    from lakeshack_spark.operators.dedup import minhash_drop_set
    from lakeshack_spark.streaming import stream_ingest_deduped
    from lakeshack_spark.streaming.ingest import _state_subdirs

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    landing = tmp_path_factory.mktemp("cmp_landing")
    corpus_dir = str(tmp_path_factory.mktemp("cmp_corpus"))
    state_dir = str(tmp_path_factory.mktemp("cmp_state"))

    slices = [(0, 30), (30, 60), (60, 90), (90, 120)]
    for i, (lo, hi) in enumerate(slices):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(str(landing / f"slice{i}"))
        t = time.time() - 300 + i * 10
        for root, _, files in os.walk(str(landing / f"slice{i}")):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    params = dict(num_hashes=64, bands=16, k=1, threshold=0.9)
    q = stream_ingest_deduped(
        spark,
        f"{landing}/*",
        corpus_dir,
        state_dir,
        schema=docs.schema,
        checkpoint_dir=str(tmp_path_factory.mktemp("cmp_ckpt")),
        max_files_per_trigger=1,
        available_now=True,
        compact_state_every=2,
        **params,
    )
    q.awaitTermination(300)

    # listing population bounded: batches 0..3 ran, compactions after
    # batch 1 and batch 3 → exactly one compact-00003 dir per store
    for store in ("index", "seen"):
        subs = [
            s.rsplit("/", 1)[-1]
            for s in _state_subdirs(spark, f"{state_dir}/{store}")
        ]
        assert subs == ["compact-00003"], (store, subs)

    # survivors unchanged vs the batch drop set over the whole corpus
    got = {
        r.doc_id
        for r in spark.read.parquet(f"{corpus_dir}/batch-*")
        .select("doc_id")
        .collect()
    }
    drops = minhash_drop_set(docs.select("doc_id", "text"), **params)
    expect = {r.doc_id for r in docs.join(drops, "doc_id", "left_anti").collect()}
    drops.unpersist()
    assert got == expect, got.symmetric_difference(expect)

    # consolidated state is content-complete: every seen doc still indexed
    n_index_docs = (
        spark.read.parquet(f"{state_dir}/index/compact-*")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_index_docs == 120
    n_seen = spark.read.parquet(f"{state_dir}/seen/compact-*").count()
    assert n_seen == 120


def test_state_compaction_replay_never_loses_consolidated_content(
    spark, tmp_path_factory
):
    """The crash-replay window the first cut got wrong (self-review r6):
    after a compaction that deleted some inputs, a replayed batch
    re-compacts with the previous target still present — the previous
    target must be READ AS AN INPUT (its content's source dirs are gone)
    and the new target must be a fresh -rK name, never an overwrite of
    the old one."""
    from lakeshack_spark.streaming.ingest import (
        _compact_state_store,
        _state_subdirs,
    )

    root = str(tmp_path_factory.mktemp("cmp_crash") / "index")
    spark.range(0, 1).write.parquet(f"{root}/batch-00000")
    spark.range(1, 2).write.parquet(f"{root}/batch-00001")
    _compact_state_store(spark, root, 1)
    assert [d.rsplit("/", 1)[-1] for d in _state_subdirs(spark, root)] == [
        "compact-00001"
    ]
    # replay after a crash mid-delete: the batch rewrites its own dir,
    # the earlier batch's only copy now lives inside compact-00001
    spark.range(1, 2).write.parquet(f"{root}/batch-00001")
    _compact_state_store(spark, root, 1)
    subs = [d.rsplit("/", 1)[-1] for d in _state_subdirs(spark, root)]
    assert subs == ["compact-00001-r1"], subs
    got = {
        r["id"]
        for r in spark.read.parquet(f"{root}/compact-*").collect()
    }
    assert got == {0, 1}, got  # batch-00000's content survived the replay


def test_streaming_heavy_hitters_no_truncation_matches_exact(
    spark, tmp_path_factory
):
    """With a counter budget above the distinct-item count, the streaming
    MG state IS exact counting: the final snapshot equals batch
    groupBy counts, accumulated across micro-batches."""
    from lakeshack_spark.streaming.frequent import streaming_heavy_hitters

    d = tmp_path_factory.mktemp("hh_landing")
    rows1 = [("alpha",)] * 30 + [("beta",)] * 10 + [("gamma",)] * 2
    rows2 = [("alpha",)] * 20 + [("gamma",)] * 3 + [("delta",)] * 1
    spark.createDataFrame(rows1, "item string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "b1"))
    spark.createDataFrame(rows2, "item string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "b2"))
    stream = spark.readStream.schema("item string").option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{d}/*")
    q = (
        streaming_heavy_hitters(stream, "item", counters=64, buckets=4)
        .writeStream.format("memory")
        .queryName("hh_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode re-emits per batch; weights only grow without
    # truncation, so the max per item is the final state.
    got = {
        r["item"]: r["max_w"]
        for r in spark.table("hh_mem")
        .filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.max("weight").alias("max_w"))
        .collect()
    }
    assert got == {"alpha": 50, "beta": 10, "gamma": 5, "delta": 1}
    # no truncation → no err rows
    assert spark.table("hh_mem").filter(F.col("item").isNull()).count() == 0


def test_streaming_heavy_hitters_truncation_superset(spark, tmp_path_factory):
    """Tiny counter budget forces decrements: the heavy item survives
    with est in [true - err_bucket, true], and candidate_items keeps it."""
    from lakeshack_spark.streaming.frequent import (
        candidate_items,
        streaming_heavy_hitters,
    )

    d = tmp_path_factory.mktemp("hh_trunc")
    rows = [("heavy",)] * 200 + [(f"tail{i}",) for i in range(300)]
    spark.createDataFrame(rows, "item string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "b1"))
    stream = spark.readStream.schema("item string").parquet(f"{d}/*")
    q = (
        streaming_heavy_hitters(stream, "item", counters=4, buckets=1)
        .writeStream.format("memory")
        .queryName("hh_trunc_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    snap = spark.table("hh_trunc_mem")
    est = {r["item"]: r["weight"] for r in snap.collect()}
    err = est.get(None, 0)
    assert "heavy" in est
    assert est["heavy"] <= 200
    assert est["heavy"] >= 200 - err
    cands = {r["item"] for r in candidate_items(snap, threshold=150).collect()}
    assert "heavy" in cands


def test_stream_maintain_agg_view_matches_recompute(spark, tmp_path_factory):
    """Streaming IVM ≡ batch recompute: an initial-load batch plus two
    CDC batches (update-in-group, group-moving update, delete, insert)
    maintained through versioned view snapshots must equal a from-
    scratch aggregation of the final table — and a REPLAYED last batch
    (same batch_id re-run, the crash-recovery path) must change nothing
    (exactly-once via read-below-own-id)."""
    import os
    import time

    from lakeshack_spark.streaming import ivm

    schema = (
        "k long, g string, v long, is_delete boolean, had_prior boolean, "
        "old_g string, old_v long"
    )
    b0 = [  # initial load: all inserts
        (1, "a", 10, False, False, None, None),
        (2, "a", 20, False, False, None, None),
        (3, "b", 30, False, False, None, None),
    ]
    b1 = [
        (1, "a", 15, False, True, "a", 10),   # update in group
        (3, "a", 30, False, True, "b", 30),   # moves b -> a
        (4, "c", 40, False, False, None, None),  # insert, new group
    ]
    b2 = [
        (2, "a", 20, True, True, "a", 20),    # delete
        (4, "c", 44, False, True, "c", 40),   # update
    ]
    landing = tmp_path_factory.mktemp("ivm_landing")
    view_dir = str(tmp_path_factory.mktemp("ivm_view"))
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / f"slice{i}"))
        t = time.time() - 300 + i * 10
        for root, _, files in os.walk(str(landing / f"slice{i}")):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/*")
    )
    q = ivm.stream_maintain_agg_view(
        spark,
        stream,
        view_dir,
        group_cols=["g"],
        sum_cols={"sum_v": "v"},
        key_cols=["k"],
        checkpoint_dir=str(tmp_path_factory.mktemp("ivm_ckpt")),
    )
    q.awaitTermination(300)

    got = {
        r.g: (r.n, r.sum_v)
        for r in ivm.read_agg_view(spark, view_dir).collect()
    }
    # final table: k1=(a,15), k3=(a,30), k4=(c,44); k2 deleted
    assert got == {"a": (2, 45), "c": (1, 44)}
    # retention: only the newest snapshot and its replay predecessor stay
    versions = ivm._view_versions(spark, view_dir)
    assert len(versions) == 2 and versions[-1][0] == 2

    # crash-replay of the LAST batch: re-running batch_id=2 against the
    # surviving snapshots must be a no-op (reads v-1, rewrites v-2)
    batch2 = spark.createDataFrame(b2, schema)
    from lakeshack_spark.operators.diff import incremental_agg_maintain  # noqa: F401

    # reuse the module's commit path by re-invoking foreachBatch logic:
    # read-below-own-id makes this idempotent
    versions_before = ivm._view_versions(spark, view_dir)
    view_prev = spark.read.parquet(
        [p for b, p in versions_before if b < 2][-1]
    )
    replay = incremental_agg_maintain(
        view_prev,
        base=None,
        changes=batch2,
        key_cols=["k"],
        group_cols=["g"],
        sum_cols={"sum_v": "v"},
        delete_col="is_delete",
        old_rows=batch2.filter(F.col("had_prior")).select(
            "k", F.col("old_g").alias("g"), F.col("old_v").alias("v")
        ),
    )
    replayed = {r.g: (r.n, r.sum_v) for r in replay.collect()}
    assert replayed == got


def test_streaming_hourly_rollup_matches_batch_layer(spark, tmp_path_factory):
    """Composition pin: a continuous-aggregate hourly layer MAINTAINED BY
    the streaming IVM (insert-only CDC) equals the batch
    timeseries.bucket_rollup of the same events — so the rollup cascade
    (rollup_cascade_events gate) can be kept fresh by the stream instead
    of recomputed. Scaled-integer sums make the equality exact."""
    import os
    import time

    from lakeshack_spark.operators.timeseries import bucket_rollup
    from lakeshack_spark.streaming import ivm

    batch = load_table(spark, SF, "events")
    changes = batch.select(
        F.col("event_id").alias("k"),
        F.expr("ts div 3600000000000").alias("bucket"),
        "event_type",
        F.expr("CAST(ROUND(value * 1e8) AS BIGINT)").alias("scaled"),
        F.lit(False).alias("is_delete"),
        F.lit(False).alias("had_prior"),
        F.lit(None).cast("long").alias("old_bucket"),
        F.lit(None).cast("string").alias("old_event_type"),
        F.lit(None).cast("long").alias("old_scaled"),
    )
    landing = tmp_path_factory.mktemp("rollup_landing")
    for i, pred in enumerate(["k % 2 = 0", "k % 2 = 1"]):
        changes.filter(F.expr(pred)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / f"slice{i}"))
        t = time.time() - 300 + i * 10
        for root, _, files in os.walk(str(landing / f"slice{i}")):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/*")
    )
    view_dir = str(tmp_path_factory.mktemp("rollup_view"))
    q = ivm.stream_maintain_agg_view(
        spark,
        stream,
        view_dir,
        group_cols=["bucket", "event_type"],
        sum_cols={"sum_scaled": "scaled"},
        key_cols=["k"],
        checkpoint_dir=str(tmp_path_factory.mktemp("rollup_ckpt")),
    )
    q.awaitTermination(300)

    got = {
        (r.bucket, r.event_type): (r.n, r.sum_scaled)
        for r in ivm.read_agg_view(spark, view_dir).collect()
    }
    want = {
        (r.bucket, r.event_type): (r.n, r.sum_scaled)
        for r in bucket_rollup(
            batch, 3_600_000_000_000, time_col="ts",
            group_cols=("event_type",), value_col="value", scale=8,
        ).collect()
    }
    assert got == want
