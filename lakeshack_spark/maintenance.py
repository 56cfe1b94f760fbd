"""Dataset maintenance: small-file compaction and re-clustering.

Append-style ingest (batch drops or the streaming pipeline) clusters each
batch *internally*, but cluster-key ranges overlap across batches — so a
point lookup touches one file per batch instead of one file overall, and
accumulated small files bloat task counts. ``compact`` rewrites the dataset
as one globally range-clustered file set and rebuilds the zone map,
restoring the "1 + ε row groups per value" property the reference's docs
promise of fresh clustering (docs/source/lakeshack.rst:184-270).

Local-FS swap is staged-write + rename (not atomic under concurrent
readers); at production scale the same rewrite runs under a table format's
commit protocol (Delta/Iceberg snapshot swap) — the data movement, which is
all the cost, is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid

from lakeshack_spark.engine import Lakeshack
from lakeshack_spark.metastore import list_parquet_files
from lakeshack_spark.operators.zorder import zorder_write
from lakeshack_spark.writer import cluster_write


def compact(
    shack: Lakeshack,
    n_files: int,
    sort_columns: tuple[str, ...] = (),
) -> int:
    """Rewrite ``shack``'s dataset as ``n_files`` globally range-clustered
    files and rebuild the metastore. Returns the number of files removed.
    """
    return _rewrite(
        shack,
        lambda df, staging: cluster_write(
            df, staging, shack.cluster_column, n_files,
            sort_columns=sort_columns, mode="overwrite",
        ),
    )


def zorder_compact(
    shack: Lakeshack,
    n_files: int,
    zorder_columns: tuple[str, ...],
) -> int:
    """Like :func:`compact`, but lays files out on the Morton curve over
    ``zorder_columns`` (multi-column zone-map pruning — see
    ``operators.zorder``). Columns beyond the cluster column must be in
    the shack's ``optional_columns`` for their stats to be pruned on;
    enforced here so a silent no-prune layout can't ship."""
    untracked = [
        c for c in zorder_columns if c not in shack.metastore.tracked_columns
    ]
    if untracked:
        raise ValueError(
            f"z-order columns {untracked} are not stats-tracked; list them "
            "in optional_columns so the metastore can prune on them"
        )
    return _rewrite(
        shack,
        lambda df, staging: zorder_write(
            df, staging, zorder_columns, n_files, mode="overwrite"
        ),
    )


def _rewrite(shack: Lakeshack, write_staged) -> int:
    """Shared rewrite-and-swap: stage a new layout, rename it in, rebuild
    stats. Returns the number of files removed."""
    if "://" in shack.data_path and not shack.data_path.startswith("file://"):
        raise NotImplementedError(
            "compact() swaps files with local renames; on object storage "
            "run the rewrite under a table-format commit (Delta/Iceberg)"
        )
    old_files = list_parquet_files(shack.data_path, shack.spark)
    if not old_files:
        return 0
    df = shack.spark.read.schema(shack.schema).parquet(*old_files)
    staging = os.path.join(shack.data_path, "_compaction_staging")
    write_staged(df, staging)
    staged = list_parquet_files(staging)
    tag = uuid.uuid4().hex[:8]
    for i, path in enumerate(staged):
        os.replace(
            path,
            os.path.join(shack.data_path, f"compact-{tag}-{i:05d}.parquet"),
        )
    shutil.rmtree(staging, ignore_errors=True)
    for path in old_files:
        os.remove(path)
    # Rebuild stats from scratch: the old rows describe deleted files.
    shack.metastore.backend.drop()
    shack.update_metastore()
    return len(old_files)
