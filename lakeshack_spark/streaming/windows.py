"""Streaming windowed operators over an event stream.

The reference has no streaming surface — its docs discuss late-arriving
data and recommend immutable load-date partitions instead
(docs/source/lakeshack.rst:120-161). Structured Streaming replaces that
policy: watermarks bound state, windows aggregate, late rows beyond the
watermark are dropped deterministically.

All three operators take *either* a streaming or a batch DataFrame (the
DataFrame API is identical — that is the point of Structured Streaming);
tests run them both ways and the batch twins in queries.py give them
DuckDB oracles.

Scale notes: windowed aggregation state lives in the state store keyed by
(window, group); watermarks expire state so long-running jobs hold only
the open windows. Shuffle is on the group key — same skew story as batch
groupBy (AQE does not apply to streaming, so pre-salt a known-hot key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lakeshack_spark.functions.deterministic import dsum


def tumbling_window_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    time_col: str = "ts_utc",
    group_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per (tumbling window, group) event counts + deterministic value sum.

    With a watermark, rows later than ``watermark`` behind the max seen
    event time are dropped and window state is finalized/evicted.
    """
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.window(F.col(time_col), window_duration), F.col(group_col))
        .agg(F.count("*").alias("n"), dsum(value_col, 8).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    time_col: str = "ts_utc",
    user_col: str = "user_id",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per (user, session) stats with gap-based session windows
    (``F.session_window``) — the streaming twin of
    operators.relational.sessionize."""
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.session_window(F.col(time_col), gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    time_col: str = "ts_utc",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark horizon (state is evicted after it passes). Batch twin:
    dropDuplicates(keys)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def near_dedup_within_watermark(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts_utc",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming NEAR-dedup: drop documents whose 64-bit simhash
    fingerprint repeats within the watermark horizon — the streaming twin
    of the batch near-dedup family, for ingest-time boilerplate/mirror
    suppression.

    Scope is deliberately conservative: the dedup key is fingerprint
    EQUALITY (hamming 0 — identical or near-identical token sets), not a
    hamming-radius match. Radius search needs a candidate join
    (simhash_near_pairs' pigeonhole segments), and keying the stateful
    dedup on individual segments instead would OVER-drop: two docs
    sharing one 16-bit segment are usually unrelated. Map-only signal +
    built-in stateful dedup, so state is one row per distinct fingerprint
    inside the horizon and is evicted as the watermark passes; full-recall
    near-dedup (Jaccard-verified, cluster-wide) remains the batch
    ``minhash_drop_set`` compaction pass over landed data.

    Batch twin (pinned stream ≡ batch in tests by fingerprint set): one
    row per distinct fingerprint, the EVENT-TIME-EARLIEST row kept
    deterministically (``min_by`` over (time, remaining columns) — a
    map-side partial combine, one candidate per fingerprint per partition
    through the shuffle). The streaming path necessarily keeps the
    first-SEEN row instead (arrival order): under out-of-order arrival
    the surviving row may differ, the fingerprint set never does.
    """
    from lakeshack_spark.operators.dedup import simhash

    with_fp = simhash(docs, text_col)
    if with_fp.isStreaming:
        return with_fp.withWatermark(
            time_col, watermark
        ).dropDuplicatesWithinWatermark(["simhash"])
    cols = with_fp.columns
    order_cols = [time_col] + [c for c in cols if c not in (time_col, "simhash")]
    return (
        with_fp.groupBy("simhash")
        .agg(
            F.min_by(
                F.struct(*cols), F.struct(*[F.col(c) for c in order_cols])
            ).alias("__row")
        )
        .select("__row.*")
        .select(*cols)
    )
