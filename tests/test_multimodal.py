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


def test_wav_decode_exact_known_payload(spark):
    """q_media_decode's pure-expression WAV parser against hand-built
    RIFF/PCM payloads with known sample values, covering the
    two's-complement negative branch and the per-file sample rate:
    text ' A~' → samples [(32−64)·256, (65−64)·256, (126−64)·256] =
    [−8192, 256, 15872] → peak 15872 (not −8192: abs), amp_sum 7936."""
    import struct

    from pyspark.sql import functions as F

    from lakehouse_app_spark.operators.multimodal import _le_uint

    def wav(rate, samples):
        data = struct.pack(f"<{len(samples)}h", *samples)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    payloads = [
        (1, bytearray(wav(12000, [-8192, 256, 15872]))),
        (2, bytearray(wav(8000, [-32768, 32767]))),  # int16 extremes
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    # reuse the query's expression pieces via a minimal re-derivation:
    # run the REAL query function over a fake sf_dir is heavier, so
    # assert the header reads and the full decode on this frame by
    # calling the same _le_uint builders the query uses
    rate = F.expr(_le_uint(25, 4)).alias("rate")
    nsamp = F.expr(f"({_le_uint(41, 4)}) DIV 2").alias("n")
    magic = F.expr(
        "CAST(substring(payload, 1, 4) AS STRING) = 'RIFF' AND "
        "CAST(substring(payload, 9, 8) AS STRING) = 'WAVEfmt ' AND "
        "CAST(substring(payload, 37, 4) AS STRING) = 'data'"
    ).alias("ok")
    samples = F.expr(
        "transform(transform(sequence(0, CAST(("
        + _le_uint(41, 4)
        + ") DIV 2 AS INT) - 1), i -> "
        "CAST(ascii(substring(decode(substring(payload, 45 + 2*i, 1), "
        "'ISO-8859-1'), 1, 1)) AS BIGINT) + 256 * "
        "CAST(ascii(substring(decode(substring(payload, 46 + 2*i, 1), "
        "'ISO-8859-1'), 1, 1)) AS BIGINT)), v -> v - 65536 * (v DIV 32768))"
    ).alias("samples")
    rows = {
        r["media_id"]: r
        for r in df.select("media_id", rate, nsamp, magic, samples).collect()
    }
    assert rows[1]["rate"] == 12000 and rows[1]["n"] == 3 and rows[1]["ok"]
    assert rows[1]["samples"] == [-8192, 256, 15872]
    assert rows[2]["rate"] == 8000 and rows[2]["samples"] == [-32768, 32767]


def test_q_media_decode_matches_text_derivation(spark, sf_dir):
    """End-to-end: the decoded features equal the text-side
    derivation for every document (the oracle's contract, in-process
    at the smoke sf)."""
    from lakehouse_app_spark import QUERIES

    got = {
        r["media_id"]: r
        for r in QUERIES["q_media_decode"](spark, sf_dir).collect()
    }
    docs = load_tables(spark, sf_dir).documents.where("n_chars >= 1")
    for d in docs.collect():
        samples = [(ord(c) - 64) * 256 for c in d["text"]]
        r = got[d["doc_id"]]
        assert r["sample_rate"] == 8000 + (d["doc_id"] % 4) * 4000
        assert r["n_samples"] == len(samples)
        assert r["peak"] == max(abs(s) for s in samples)
        assert r["amp_sum"] == sum(samples)
        assert r["is_pcm"] is True


def test_bmp_decode_known_image(spark):
    """The BMP path against a hand-built 2×2 24bpp image with padding
    (stride 8 for width 2): known channel bytes, bottom-up storage —
    the logical-order checksum must weight pixel (0,0) first even
    though it is stored in the LAST row."""
    import struct

    from pyspark.sql import functions as F

    from lakehouse_app_spark.operators.multimodal import _le_uint

    w, h, stride = 2, 2, 8
    # logical B values: (0,0)=10 (0,1)=20 / (1,0)=30 (1,1)=40
    def row(bs):
        out = bytearray()
        for b in bs:
            out += bytes((b, (b + 85) % 256, (b + 170) % 256))
        return bytes(out) + b"\x00" * (stride - 3 * w)

    data = row([30, 40]) + row([10, 20])  # bottom-up: logical row 1 first
    payload = (
        b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
        + data
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    got = df.select(
        F.expr(_le_uint(19, 4)).alias("w"),
        F.expr(_le_uint(23, 4)).alias("h"),
        F.expr(
            "aggregate(zip_with("
            "  transform(sequence(0, 3), i -> CAST((" + _le_uint(23, 4)
            + " - 1 - i DIV 2) * 8 + 3 * (i % 2) + 1 AS INT)),"
            "  sequence(1, 4),"
            "  (o, i) -> i * CAST(ascii(substring(decode("
            "    substring(payload, 54 + o, 1), 'ISO-8859-1'), 1, 1))"
            "    AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("ck"),
    ).collect()[0]
    assert got["w"] == 2 and got["h"] == 2
    # logical order weights: 1*10 + 2*20 + 3*30 + 4*40 = 300
    assert got["ck"] == 300


def test_wav_decode_roundtrip_random(spark):
    """Seeded-random roundtrip: 200 arbitrary PCM payloads (random
    lengths 1..600, full int16 range incl. extremes, random rates) →
    the PRODUCTION decode expressions must reproduce the Python
    reference exactly for every file, in one Spark evaluation."""
    import random
    import struct

    from lakehouse_app_spark.operators.multimodal import decode_wav_features

    rng = random.Random(42)
    rows, expect = [], {}
    for mid in range(200):
        n = rng.randint(1, 600)
        samples = [rng.randint(-32768, 32767) for _ in range(n)]
        if mid % 7 == 0:  # force extremes into some files
            samples[0] = -32768
            samples[-1] = 32767
        rate = rng.choice([8000, 11025, 16000, 22050, 44100])
        data = struct.pack(f"<{n}h", *samples)
        payload = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        rows.append((mid, bytearray(payload)))
        expect[mid] = (
            rate, n, max(abs(s) for s in samples), sum(samples), True
        )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (
            r["sample_rate"], r["n_samples"], r["peak"], r["amp_sum"],
            r["is_pcm"],
        )
        for r in decode_wav_features(df).collect()
    }
    assert got == expect


def test_bmp_decode_roundtrip_random(spark):
    """Seeded-random roundtrip for the BMP parser: 150 images with
    arbitrary dims (1..20 × 1..12 — every stride-padding residue) and
    random channel bytes (0 and 255 forced in), decoded by the
    PRODUCTION expressions against the Python reference."""
    import random
    import struct

    from lakehouse_app_spark.operators.multimodal import decode_bmp_features

    rng = random.Random(7)
    rows, expect = [], {}
    for mid in range(150):
        w, h = rng.randint(1, 20), rng.randint(1, 12)
        stride = ((3 * w + 3) // 4) * 4
        logical = [
            [rng.randint(0, 255) for _ in range(3)] for _ in range(w * h)
        ]
        logical[0][0] = 255 if mid % 2 else 0
        data = bytearray()
        for r in range(h - 1, -1, -1):  # bottom-up
            for c in range(w):
                data += bytes(logical[r * w + c])
            data += b"\x00" * (stride - 3 * w)
        payload = (
            b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                          2835, 2835, 0, 0)
            + bytes(data)
        )
        rows.append((mid, bytearray(payload)))
        expect[mid] = (
            w, h,
            sum(px[0] for px in logical),
            sum(px[1] for px in logical),
            sum((i + 1) * px[0] for i, px in enumerate(logical)),
            True,
        )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (
            r["width"], r["height"], r["sum_b"], r["sum_g"],
            r["px_checksum"], r["is_bmp"],
        )
        for r in decode_bmp_features(df).collect()
    }
    assert got == expect


def test_bmp_flag_rejects_top_down_payload(spark):
    """biHeight is SIGNED int32; negative means top-down row order,
    which this layer never emits — a foreign top-down BMP must fail
    the is_bmp flag (r9 ADVICE: the unsigned header read would
    otherwise turn height into ~2^32 and decode a nonsense
    stride*height region). A positive twin of the same payload must
    still pass."""
    import struct

    from lakehouse_app_spark.operators.multimodal import decode_bmp_features

    w, h, stride = 2, 2, 8

    def payload(height_field):
        def row(bs):
            out = bytearray()
            for b in bs:
                out += bytes((b, (b + 85) % 256, (b + 170) % 256))
            return bytes(out) + b"\x00" * (stride - 3 * w)

        data = row([30, 40]) + row([10, 20])
        return (
            b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0,
                          len(data), 2835, 2835, 0, 0)
            + data
        )

    df = spark.createDataFrame(
        [(1, bytearray(payload(h))), (2, bytearray(payload(-h)))],
        "media_id long, payload binary",
    )
    flags = {
        r["media_id"]: r["is_bmp"]
        for r in decode_bmp_features(df).select("media_id", "is_bmp").collect()
    }
    assert flags == {1: True, 2: False}, flags
