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


def stream_merge_versioned(
    changes_stream: DataFrame,
    table_dir: str,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    delete_col: str | None = None,
    insert: bool = True,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC apply INTO a :class:`~lakeshack_spark.versioning.
    VersionedTable` — the Delta-streaming-sink shape: every micro-batch
    becomes one MERGE commit (matched update / flagged delete /
    not-matched insert), so the table's version log IS the stream's
    batch history and any version remains time-travel readable.

    Exactly-once without a transactional sink: each commit records its
    ``batch_id`` in the manifest ``meta``; a crash-replayed batch finds
    its id already committed and SKIPS — the same read-your-own-marker
    discipline as ``stream_maintain_agg_view``'s versioned snapshots,
    here attached to the table's own atomic O_EXCL commit point. The
    table must be ``create``d before the stream starts (the initial
    snapshot is a batch decision, not a stream side effect).

    Each batch is pre-reduced to latest-per-key? NO — deliberately not:
    merge_upsert requires unique keys per batch and raising on
    duplicates is the correct CDC contract (a feed with multiple
    updates per key per batch must state its own ordering; silently
    picking one would corrupt the table). Scale: per batch one key-semi
    planning pass + rewrite of only the files containing batch keys.
    """
    from lakeshack_spark.versioning import VersionedTable

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        vt = VersionedTable(batch_df.sparkSession, table_dir)
        if not vt.versions():
            raise ValueError(
                f"versioned table {table_dir!r} must be created before "
                "streaming merges (no initial snapshot to merge into)"
            )
        if any(
            m.get("meta", {}).get("batch_id") == batch_id for m in vt.log()
        ):
            return  # crash-replayed batch: already committed, skip
        vt.merge(
            batch_df,
            key_cols,
            update_cols=update_cols,
            delete_col=delete_col,
            insert=insert,
            meta={"batch_id": batch_id},
        )

    writer = changes_stream.writeStream.foreachBatch(commit_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
