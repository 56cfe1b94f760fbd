"""Streaming incremental view maintenance: a CDC change stream keeps a
grouped count/sum view current without ever re-aggregating the base.

This is the streaming face of ``operators.diff.incremental_agg_maintain``
(Gupta & Mumick delta rules): each micro-batch of change rows folds its
SIGNED contributions into the persisted view. Per trigger the work is
O(|batch| + |view groups|) — at 100 TB the base table is never touched,
because the batch contract ships Debezium-style BEFORE-IMAGES (the
``old_``-prefixed columns) instead of asking the engine to look old
values up.

Batch contract (one row per changed key; keys unique per batch, the
MERGE precondition):

- new values in the view's group/sum columns,
- ``had_prior`` boolean — true for updates/deletes of keys that existed
  (their old contribution must leave the view), false for inserts,
- ``old_<col>`` for every group/sum column — the before-image, read only
  where ``had_prior`` (group-moving updates subtract from the OLD group
  and add to the new one),
- ``is_delete`` boolean — true rows contribute no new values.

Exactly-once across crash/replay WITHOUT a transactional sink: the view
is written as versioned snapshot dirs ``{view_dir}/v-<batch_id>``, and a
batch reads the newest version STRICTLY BELOW its own batch id. A
replayed batch therefore re-reads the same predecessor it read the
first time and overwrite-rewrites its own version — applying its delta
exactly once no matter how many times it runs. Retention keeps the
predecessor of the newest version for exactly that replay window;
Structured Streaming replays only the latest uncommitted batch, so
anything older is garbage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from lakeshack_spark.operators.diff import incremental_agg_maintain
from lakeshack_spark.streaming.ingest import _state_subdirs


def _view_versions(spark: SparkSession, view_dir: str) -> list[tuple[int, str]]:
    """(batch_id, path) of every ``v-*`` snapshot under ``view_dir``."""
    out = []
    for d in _state_subdirs(spark, view_dir):
        name = d.rstrip("/").rsplit("/", 1)[-1]
        if name.startswith("v-"):
            try:
                out.append((int(name[2:]), d))
            except ValueError:
                continue
    return sorted(out)


def read_agg_view(spark: SparkSession, view_dir: str) -> DataFrame | None:
    """The newest persisted view snapshot, or None before the first
    commit. This is the serving read — one small parquet dir, never a
    scan of the base."""
    versions = _view_versions(spark, view_dir)
    if not versions:
        return None
    return spark.read.parquet(versions[-1][1])


def stream_maintain_agg_view(
    spark: SparkSession,
    changes_stream: DataFrame,
    view_dir: str,
    group_cols: list[str],
    sum_cols: dict[str, str],
    key_cols: list[str],
    delete_col: str = "is_delete",
    had_prior_col: str = "had_prior",
    old_prefix: str = "old_",
    count_alias: str = "n",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the maintenance stream: ``changes_stream`` (schema per the
    module contract) → foreachBatch folding each micro-batch's delta
    into ``{view_dir}/v-<batch_id>``.

    ``sum_cols`` maps view column alias → batch source column (same as
    the batch operator). The view carries ``group_cols``,
    ``count_alias`` and the sum aliases; groups whose count reaches 0
    leave the view. Stream ≡ batch is pinned in tests: the final
    snapshot equals a from-scratch re-aggregate of the fully merged
    table.
    """
    view_dir = view_dir.rstrip("/")
    value_cols = list(group_cols) + [c for _, c in sum_cols.items()]

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = [
            (b, p) for b, p in _view_versions(spark, view_dir) if b < batch_id
        ]
        if versions:
            view = spark.read.parquet(versions[-1][1])
        else:
            view = batch_df.select(
                *group_cols,
                F.lit(0).cast("long").alias(count_alias),
                *[F.lit(0).cast("long").alias(a) for a in sum_cols],
            ).limit(0)
        old_rows = batch_df.filter(F.col(had_prior_col)).select(
            *key_cols,
            *[F.col(old_prefix + c).alias(c) for c in value_cols],
        )
        new_view = incremental_agg_maintain(
            view,
            base=None,  # unused: before-images supplied
            changes=batch_df,
            key_cols=key_cols,
            group_cols=group_cols,
            sum_cols=sum_cols,
            delete_col=delete_col,
            count_alias=count_alias,
            old_rows=old_rows,
        )
        new_view.write.mode("overwrite").parquet(
            f"{view_dir}/v-{batch_id:05d}"
        )
        # retention: keep this snapshot and its predecessor (the replay
        # window); drop everything older AFTER the new version is fully
        # written — every crash point leaves a readable chain
        jvm = spark.sparkContext._jvm
        fs = jvm.org.apache.hadoop.fs.Path(view_dir).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        for b, p in versions[:-1]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)

    writer = changes_stream.writeStream.foreachBatch(commit_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
