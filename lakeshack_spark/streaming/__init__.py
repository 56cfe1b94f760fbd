from lakeshack_spark.streaming.frequent import (
    candidate_items,
    streaming_heavy_hitters,
)
from lakeshack_spark.streaming.ingest import (
    stream_ingest_clustered,
    stream_ingest_deduped,
)
from lakeshack_spark.streaming.ivm import (
    read_agg_view,
    stream_maintain_agg_view,
)
from lakeshack_spark.streaming.stateful import running_user_stats
from lakeshack_spark.streaming.windows import (
    dedup_within_watermark,
    near_dedup_within_watermark,
    session_window_stats,
    tumbling_window_stats,
)

__all__ = [
    "stream_ingest_clustered",
    "stream_ingest_deduped",
    "tumbling_window_stats",
    "session_window_stats",
    "dedup_within_watermark",
    "near_dedup_within_watermark",
    "running_user_stats",
    "stream_maintain_agg_view",
    "read_agg_view",
    "streaming_heavy_hitters",
    "candidate_items",
]
