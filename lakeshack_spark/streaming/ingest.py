"""Streaming ingest: landing directory → clustered Parquet + metastore.

Replaces the reference's batch-only ingest story (external Spark job writes
clustered files, then ``Metastore.update`` scans footers,
lakeshack/metastore.py:206-276) with one Structured Streaming pipeline:

    file source (landing dir) → foreachBatch:
        cluster_write(batch)  →  metastore.update(new files)

``foreachBatch`` is the right tool because each micro-batch must run two
*batch* actions transactionally-ish (write data files, then index exactly
those files); the metastore update is idempotent (anti-join on filepath),
so a retried batch re-indexes nothing and a crash between the two steps
heals on the next update.

Scale notes: the file source tracks processed files in the checkpoint
(no re-reads); `maxFilesPerTrigger` bounds batch size; clustering cost is
one range-shuffle per micro-batch — size triggers so batches are ≥ a few
file-sizes of data, or the output files get small and the zone map loses
selectivity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, types as T
from pyspark.sql.streaming import StreamingQuery

from lakeshack_spark.engine import Lakeshack
from lakeshack_spark.writer import cluster_write


def stream_ingest_clustered(
    spark: SparkSession,
    landing_dir: str,
    shack: Lakeshack,
    schema: T.StructType | None = None,
    checkpoint_dir: str | None = None,
    files_per_cluster_file: int = 4,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_n_files: int = 8,
) -> StreamingQuery:
    """Start the ingest stream into ``shack``'s dataset + metastore.

    ``available_now=True`` processes the current landing-dir contents and
    stops (batch-like catch-up, used in tests); ``False`` runs continuously.

    ``compact_every=N`` closes the small-files loop: after every N
    micro-batches the whole dataset is rewritten as ``compact_n_files``
    globally range-clustered files (maintenance.compact), restoring
    1-file point lookups that per-batch clustering cannot provide (each
    batch's cluster-key range overlaps every other batch's).
    """
    schema = schema or shack.schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        n_files = max(
            1, batch_df.rdd.getNumPartitions() // max(files_per_cluster_file, 1)
        )
        # Each micro-batch owns a batch-<id> directory written with
        # overwrite: a retried batch (foreachBatch replays after failure)
        # replaces its own output instead of appending duplicates —
        # idempotent commits end-to-end, since the metastore update
        # anti-joins on filepath. (Deliberately not `batch=<id>`: an
        # equals-sign dir would be Hive-partition-inferred on reads.)
        batch_dir = f"{shack.data_path.rstrip('/')}/batch-{batch_id:05d}"
        cluster_write(
            batch_df,
            batch_dir,
            shack.cluster_column,
            n_files=n_files,
            mode="overwrite",
        )
        # Index only THIS batch's directory: a bare update_metastore()
        # would re-list and anti-join the ENTIRE dataset every micro-batch
        # — O(accumulated files) per batch, a listing-bound stall once
        # millions of files pile up. The per-batch dir is unique, so the
        # targeted update is O(batch) and stays idempotent on replay (the
        # anti-join still guards re-inserts). Full-dataset reconciliation
        # remains the compaction branch's job.
        shack.update_metastore(batch_dir)
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            from lakeshack_spark.maintenance import compact

            compact(shack, n_files=compact_n_files)

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{shack.data_path.rstrip('/')}/_ingest_checkpoint",
        )
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
