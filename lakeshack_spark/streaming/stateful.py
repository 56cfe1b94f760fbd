"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats`` maintains per-user state across micro-batches —
cumulative event count, cumulative (decimal-exact) value sum, and the last
seen event time — emitting one updated row per user per batch. This is the
operator class Spark's built-in windows can't express: arbitrary
user-defined state evolution (counters, session machines, CUSUM/anomaly
scores) with GroupState lifecycle management.

State is keyed by user and lives in the state store (RocksDB on a real
cluster); a timeout evicts idle users so state size tracks *active* users,
not all-time users — the knob that keeps this viable on an unbounded
stream. The same function body also runs in batch mode via
``applyInPandas`` (no state), which is how tests cross-check it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, value_cents BIGINT, last_ts_us BIGINT"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("last_ts_us", T.LongType(), False),
    ]
)


def _fold_batch(
    pdf: pd.DataFrame, n0: int, cents0: int, last0: int
) -> Tuple[int, int, int]:
    """Fold a micro-batch into (count, value-in-cents, max-ts) state.
    Value accumulates in integer cents — associative and exact, the same
    determinism discipline as functions.deterministic."""
    n = n0 + len(pdf)
    cents = cents0 + int(round(pdf["value"].astype(float).mul(100).round().sum()))
    last = max(last0, int(pdf["ts_us"].max())) if len(pdf) else last0
    return n, cents, last


def _stateful_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, cents, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n, cents, last = _fold_batch(pdf, n, cents, last)
    state.update((n, cents, last))
    # Evict users idle for an hour of processing time.
    state.setTimeoutDuration(3_600_000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_ts_us": [last],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats. Input needs columns (user_id, ts_us, value);
    streaming input uses state across batches, batch input computes the
    same result in one pass."""
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _stateful_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n, cents, last = _fold_batch(pdf, 0, 0, 0)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "last_ts_us": [last],
            }
        )

    return events.groupBy("user_id").applyInPandas(batch_fn, OUTPUT_SCHEMA)
