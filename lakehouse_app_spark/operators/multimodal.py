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

import sys
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


_PIL_ABSENT = False  # sticky negative: failed imports aren't cached
# by Python itself, and re-raising ImportError per frame costs a full
# sys.path search each call (~ms × 20k frames dominated q_media_frames)


def _image_codec() -> Any:
    """The PIL.Image module if a codec is present, else None. The
    negative result is cached per-process, but sys.modules is always
    consulted first so a codec installed (or injected) after the
    first failure is still picked up — a dict lookup, not an import."""
    global _PIL_ABSENT
    # consult the SUBMODULE entry: a bare `import PIL` elsewhere
    # loads the package without Image, and keying on "PIL" alone
    # would then return None forever without ever attempting the
    # fallback import (review r6)
    mod = sys.modules.get("PIL.Image")
    if mod is not None:
        return mod
    if _PIL_ABSENT:
        return None
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        _PIL_ABSENT = True
        return None


def decode_image(payload: bytes) -> Any:
    """Codec adapter, import-gated (SURVEY.md §7.5): returns a decoded
    image object when an image codec (PIL) is installed, or ``None``
    in codec-less environments like this one. The frame pipeline
    ([[q_media_frames]] via :func:`frame_dims`) calls it for every
    frame and falls back to byte-window semantics on ``None`` — so
    the integration point is exercised, and dropping PIL into the
    deployment enables real decode with no code change
    (tests/test_multimodal.py proves the decoded branch with a stub
    codec)."""
    Image = _image_codec()
    if Image is None:
        return None
    try:
        import io

        return Image.open(io.BytesIO(payload))
    except Exception:
        return None  # payload isn't a decodable image


def frame_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) of a frame: the codec's answer when one is
    installed and the payload decodes, else the byte-window
    convention (len × 1) the deterministic sampler guarantees."""
    img = decode_image(payload)
    if img is not None:
        return int(img.size[0]), int(img.size[1])
    return len(payload), 1


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
                    "first_byte": arrs.apply(lambda a: int(a[0]) if len(a) else 0),
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
    from lakehouse_app_spark.operators.dedup import spread

    t = load_tables(spark, sf_dir)
    return byte_features(attach_media_columns(spread(t.documents)))


@query(
    "q_media_frames",
    oracle="""
    WITH m AS (
      SELECT doc_id, text, n_chars FROM documents WHERE n_chars >= 35
    ), f AS (
      SELECT doc_id AS media_id, CAST(j AS INT) AS frame_idx,
             CAST(j * greatest((n_chars - 32) // 3, 1) AS BIGINT) AS off
      FROM m, UNNEST(generate_series(0, 3)) AS t(j)
    )
    SELECT f.media_id, f.frame_idx,
           CAST(ord(substring(m.text, off + 1, 1)) AS INT) AS first_byte,
           CAST(list_aggregate(
                  list_transform(range(1, 33),
                                 i -> ord(substring(m.text, off + i, 1))),
                  'sum') AS BIGINT) AS checksum,
           32 AS frame_w,
           1 AS frame_h
    FROM f JOIN m ON m.doc_id = f.media_id
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out: each opaque media payload explodes to 4
    evenly spaced fixed-size frames inside ONE `mapInPandas` pass —
    the video keyframe-extraction shape (1 row in, N small rows out,
    payload bytes never shuffled past the spread exchange). The
    deterministic sampler (`sample_frames`) stands in for the codec;
    per-frame first-byte + checksum make the fan-out byte-exactly
    verifiable in SQL. At 100 TB the per-frame features are ~1/1000th
    the payload bytes, so everything downstream of this operator
    shuffles features, not media."""
    import numpy as np

    from lakehouse_app_spark.operators.dedup import spread

    t = load_tables(spark, sf_dir)
    # the sampler is Python-side work: spread the single-row-group
    # input across cores so the pandas workers run in parallel
    media = attach_media_columns(
        spread(t.documents.where(F.col("n_chars") >= 35))
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "first_byte": [],
                "checksum": [],
                "frame_w": [],
                "frame_h": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for j, fr in enumerate(sample_frames(bytes(payload), 4, 32)):
                    a = np.frombuffer(fr, dtype=np.uint8)
                    w, h = frame_dims(fr)  # codec when installed, else len×1
                    out["media_id"].append(mid)
                    out["frame_idx"].append(j)
                    out["first_byte"].append(int(a[0]))
                    out["checksum"].append(int(a.sum()))
                    out["frame_w"].append(w)
                    out["frame_h"].append(h)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        frames,
        schema=(
            "media_id long, frame_idx int, first_byte int, checksum long, "
            "frame_w int, frame_h int"
        ),
    )
