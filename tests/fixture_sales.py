"""Regenerated clustered fixture reproducing the reference test data
(FIXTURES.md §A; behavioral parity with reference tests/utils.py:28-122 —
same seed and RNG draw order so the reference's golden query values carry
over; written fresh, not copied).

10 Parquet files × 100 rows. ``id``: two lowercase hex chars, 1000 draws
globally sorted then sliced 100 per file → non-overlapping per-file ranges
(ideal clustering). ``timestamp``: per file i the min is pinned to
``1626365594 + i*5356800`` and the max to ``min + delta//2`` as the first
and last rows, with 98 uniform interior draws (left unsorted, as in the
reference). ``x``: int ∈ [1, 500). 20 rows per row group → 5 row groups
per file, gzip, Parquet v2.6.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_FILES = 10
ROWS_PER_FILE = 100
SEED = 812
EPOCH_START = 1_626_365_594  # 2021-07-15T12:13:14Z
DELTA_S = 5_356_800  # ~2-month step between per-file windows
DAY_S = 86_400

_HEX = list("0123456789abcdef")


def generate_sales_fixture(out_dir: str, variant: str = "ts") -> list[str]:
    """Write the fixture; ``variant`` ∈ {"ts" (naive µs), "tz"
    (US/Eastern), "dt" (date32)} — the three temporal variants the
    reference exercises (tests/test_metastore.py:29-96)."""
    try:
        import pytz

        tz = pytz.timezone("US/Eastern") if variant == "tz" else None
    except ImportError:
        from zoneinfo import ZoneInfo

        tz = ZoneInfo("US/Eastern") if variant == "tz" else None

    rng = np.random.default_rng(SEED)
    n_total = N_FILES * ROWS_PER_FILE
    # Same draw order as the reference: ids first, then x, then per-file
    # timestamp interiors inside the loop.
    ids = sorted("".join(pair) for pair in rng.choice(_HEX, (n_total, 2)))
    xs = rng.integers(1, 500, n_total)

    ts_type = pa.date32() if variant == "dt" else pa.timestamp(
        "us", tz="US/Eastern" if variant == "tz" else None
    )

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    for i in range(N_FILES):
        lo = EPOCH_START + i * DELTA_S
        hi = lo + DELTA_S // 2
        epochs = [lo]
        epochs.extend(
            int(e) for e in rng.integers(lo + DAY_S, hi - DAY_S, ROWS_PER_FILE - 2)
        )
        epochs.append(hi)
        if variant == "tz":
            # Build the tz-aware column from raw epoch µs: this pyarrow
            # build drops the tzinfo of aware datetimes (wall time stored
            # as UTC — unfaithful round-trip), while int→timestamp casts
            # store the true instant and the tz stays metadata.
            ts_arr = (
                pa.array([e * 1_000_000 for e in epochs], type=pa.int64())
                .cast(pa.timestamp("us"))
                .cast(ts_type)
            )
        else:
            stamps = [datetime.fromtimestamp(e, tz=tz) for e in epochs]
            if variant == "dt":
                stamps = [s.date() for s in stamps]
            ts_arr = pa.array(stamps, type=ts_type)
        sl = slice(i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE)
        table = pa.table(
            {
                "id": pa.array(ids[sl], type=pa.string()),
                "timestamp": ts_arr,
                "x": pa.array(xs[sl].tolist(), type=pa.int32()),
            }
        )
        name = f"part-{i:02}-{ids[sl][0]}_{ids[sl][-1]}.gzip.parquet"
        path = os.path.join(out_dir, name)
        pq.write_table(
            table, path, row_group_size=20, version="2.6", compression="gzip"
        )
        paths.append(path)
    return paths
