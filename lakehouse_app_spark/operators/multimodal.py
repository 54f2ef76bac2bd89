"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The image/audio codec libraries are
NOT installed in this environment (by design — SURVEY.md §7.5), so
the codec call sites are stubbed behind ``NotImplementedError`` with a
deterministic fake, while the Spark-side plumbing — schema, batch
iteration, partitioning — is real and oracle-tested via
``q_multimodal_bytes`` (the documents' UTF-8 bytes play the opaque
payload, so byte statistics are verifiable in SQL).

Scale notes: binary payloads dominate row size, so operators here
avoid shuffling payload bytes — feature extraction projects payloads
down to small feature rows *before* any join/aggregate, and
mapInPandas streams Arrow batches without materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, format:string>"
)


def attach_media_columns(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: text bytes as the opaque payload
    plus a typed metadata struct (the ingest-side shape)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> Any:
    """Codec stub: real deployments call PIL/libvips here."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "wire PIL.Image.open(io.BytesIO(payload)) at deployment"
    )


def sample_frames(payload: bytes, n_frames: int, frame_size: int) -> list[bytes]:
    """Deterministic frame sampler over an opaque byte stream (the
    video-decode stand-in): n evenly spaced fixed-size windows."""
    if len(payload) < frame_size or n_frames < 1:
        return []
    step = max((len(payload) - frame_size) // max(n_frames - 1, 1), 1)
    return [payload[i : i + frame_size] for i in range(0, len(payload) - frame_size + 1, step)][
        :n_frames
    ]


def byte_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: payload → small numeric feature
    row (length, first byte, mean byte). Arrow batches in, Arrow
    batches out; payloads never survive past this projection."""
    import math

    import numpy as np

    def round_half_up(x: float, digits: int = 4) -> float:
        # SQL engines round halves away from zero; Python's round() is
        # banker's — byte means hit exact .xx5 boundaries constantly.
        scale = 10.0 ** digits
        return math.floor(x * scale + 0.5) / scale

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = pdf["payload"].apply(
                lambda b: np.frombuffer(b, dtype=np.uint8)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": arrs.apply(len).astype("int64"),
                    "first_byte": arrs.apply(lambda a: int(a[0]) if len(a) else -1),
                    "mean_byte": arrs.apply(
                        lambda a: round_half_up(float(a.mean())) if len(a) else None
                    ),
                }
            )

    return media.mapInPandas(
        extract,
        schema="media_id long, n_bytes long, first_byte int, mean_byte double",
    )


@query(
    "q_multimodal_bytes",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           round(list_aggregate(list_transform(string_split(text, ''),
                                               c -> CAST(ascii(c) AS DOUBLE)),
                                'avg'), 4) AS mean_byte
    FROM documents
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: attach payloads → Arrow UDF
    feature extraction. ASCII text makes byte == codepoint, so the
    oracle can verify the UDF's byte math in pure SQL."""
    t = load_tables(spark, sf_dir)
    return byte_features(attach_media_columns(t.documents))
