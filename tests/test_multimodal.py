"""Multimodal plumbing unit tests (codec-free environment: the Spark
side — schema, Arrow batching, frame sampling — is real; the codec is
stubbed per SURVEY.md)."""

import pytest

from lakehouse_app_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_columns,
    byte_features,
    decode_image,
    sample_frames,
)
from lakehouse_app_spark.sources.tables import load_tables


def test_media_schema_shape(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    media = attach_media_columns(t.documents)
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,payload:binary,media_type:string,"
        "meta:struct<width:int,height:int,format:string>>"
    )
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["format"] == "raw"


def test_byte_features_roundtrip(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    feats = byte_features(attach_media_columns(t.documents.limit(20))).collect()
    docs = {r["doc_id"]: r["text"] for r in t.documents.limit(20).collect()}
    assert len(feats) == 20
    for r in feats:
        text = docs[r["media_id"]]
        assert r["n_bytes"] == len(text.encode())
        assert r["first_byte"] == ord(text[0])


def test_decode_is_stubbed():
    # superseded: decode_image is now an import-gated adapter that
    # returns None without a codec (see test_decode_image_gates_on_codec)
    assert decode_image(b"\x89PNG...") is None


def test_frame_sampling_deterministic():
    payload = bytes(range(256)) * 4
    frames = sample_frames(payload, n_frames=5, frame_size=16)
    assert len(frames) == 5
    assert all(len(f) == 16 for f in frames)
    assert frames == sample_frames(payload, n_frames=5, frame_size=16)
    assert sample_frames(b"tiny", n_frames=3, frame_size=100) == []


def test_decode_image_gates_on_codec(monkeypatch):
    """decode_image is an import-gated adapter: with a codec module
    installed it decodes and frame_dims reports real dimensions; in
    this codec-less environment it returns None and frame_dims falls
    back to the byte-window convention."""
    import sys
    import types

    from lakehouse_app_spark.operators import multimodal as mm

    # this environment has no PIL: the fallback branch is live
    assert mm.decode_image(b"\x89PNG....") is None
    assert mm.frame_dims(b"12345678") == (8, 1)

    # stub codec proves the decoded branch end-to-end
    class _FakeImg:
        size = (640, 480)

    fake_image_mod = types.SimpleNamespace(open=lambda buf: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    # a real `from PIL import Image` registers BOTH entries; the
    # codec lookup keys on the submodule (a bare `import PIL` never
    # loads Image, so the package entry alone proves nothing)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    assert mm.frame_dims(b"anything") == (640, 480)


def test_arrow_norm_batches_handles_sliced_list_array():
    """ADVICE r5: a RecordBatch that is a non-zero-offset slice of a
    larger ListArray has offsets indexing into the FULL child array;
    the reshape must window the flat values first or norms misalign."""
    import numpy as np
    import pyarrow as pa

    from lakehouse_app_spark.operators.vectors import arrow_norm_batches

    emb = pa.array(
        [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float64())
    )
    ids = pa.array([1, 2, 3], pa.int64())
    batch = pa.RecordBatch.from_arrays([ids, emb], ["vec_id", "embedding"])
    sliced = batch.slice(1, 2)
    # precondition: the slice really is a non-zero-offset view — if a
    # pyarrow change ever makes slice() copy, this test must fail
    # loudly rather than silently stop covering the offset path
    assert sliced.column("embedding").offset == 1
    (out,) = list(arrow_norm_batches([sliced]))
    assert out.column("vec_id").to_pylist() == [2, 3]
    assert out.column("l2_norm").to_pylist() == [
        round((9 + 16) ** 0.5, 6),
        round((25 + 36) ** 0.5, 6),
    ]
    assert out.column("v_max").to_pylist() == [4.0, 6.0]
