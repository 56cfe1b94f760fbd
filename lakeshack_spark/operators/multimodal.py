"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed:
``decode_stub`` raises ``NotImplementedError`` unless handed the
deterministic fake format produced by ``fake_media_col`` (a tagged byte
payload). Everything around the stub — schema, batch iteration, partition
sizing, output contract — is the real production plumbing: swap
``_decode_payload`` for PIL/ffmpeg and nothing else changes.

Scale notes: binary payloads dominate row width, so
``spark.sql.files.maxPartitionBytes`` (not row count) sizes tasks;
``mapInPandas`` streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so a partition of
100 MB images never materializes at once. Feature extraction is map-only:
no shuffle until the (tiny) feature table is aggregated/joined.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

#: Header tag for the deterministic fake media format.
_FAKE_MAGIC = b"LSFAKE1:"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_media_col(seed_col: Column, kind: str) -> Column:
    """Deterministic fake payload: magic header + kind + the seed rendered
    as bytes, repeated. Stands in for real encoded media in tests."""
    body = F.encode(
        F.concat(F.lit(kind), F.lit(":"), seed_col.cast("string")), "utf-8"
    )
    return F.concat(F.lit(_FAKE_MAGIC), body, body)


def _decode_payload(payload: bytes) -> bytes:
    """The stub boundary. Real deployments replace this with the codec
    (PIL.Image.open / soundfile / pyav); the fake format decodes to its
    body bytes."""
    if payload is None or not payload.startswith(_FAKE_MAGIC):
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; only the LSFAKE1 test format is supported"
        )
    return payload[len(_FAKE_MAGIC):]


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + featurize via mapInPandas: per media row emit byte length,
    a hex checksum, and a ``feature_dim`` float vector (deterministic fake
    embedding of the decoded bytes — the slot where a model forward pass
    goes)."""
    import hashlib

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: 0 if p is None else len(p)
                ).astype("int32"),
            }
            checks, feats = [], []
            for payload in pdf["payload"]:
                decoded = _decode_payload(
                    bytes(payload) if payload is not None else None
                )
                digest = hashlib.sha256(decoded).digest()
                checks.append(digest.hex()[:16])
                feats.append(
                    [digest[i % len(digest)] / 255.0 for i in range(feature_dim)]
                )
            out["checksum"] = pd.Series(checks)
            out["feature"] = pd.Series(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: updates metadata and re-tags the payload; the
    pixel transform itself is behind the stub boundary."""
    resized = media.filter(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )
    return resized


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index, payload deferred to the decode stub."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
        "payload",
    )
