"""Multimodal decode dispatch: real decoders behind optional imports,
deterministic stub fallback, true-binary-column pipeline."""

import warnings

import pandas as pd
import pytest

from ostrich_spark import multimodal as mm


def test_make_decoder_dispatch():
    from ostrich_spark.imagecodec import decode_png_meta, decode_wav_meta

    dec, schema = mm.make_decoder("image")
    assert schema == mm.IMAGE_SCHEMA
    assert dec is (mm.decode_image_real if mm.HAS_PIL else decode_png_meta)
    dec, schema = mm.make_decoder("audio")
    assert schema == mm.AUDIO_SCHEMA
    assert dec is (mm.decode_audio_real if mm.HAS_SOUNDFILE else decode_wav_meta)


def test_fallback_warns_once():
    # image/audio now ALWAYS have a real decoder (stdlib codec); only
    # kinds with no real path (video without ffmpeg) fall back to stub
    mm._warned = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dec, schema = mm.make_decoder("video")
        assert dec is mm.decode_stub and schema == mm.DECODED_SCHEMA
        assert any("falling back to decode_stub" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mm.make_decoder("video")
        assert not w  # warned exactly once per process


def test_real_decoder_errors_are_actionable():
    if not mm.HAS_PIL:
        with pytest.raises(ImportError, match="pillow"):
            mm.decode_image_real(b"\x89PNG")
    if not mm.HAS_SOUNDFILE:
        with pytest.raises(ImportError, match="soundfile"):
            mm.decode_audio_real(b"RIFF")


@pytest.mark.skipif(not mm.HAS_PIL, reason="pillow not installed")
def test_real_image_decode_roundtrip(spark):
    """When PIL is present the real decoder must return true dimensions."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    payload = buf.getvalue()
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    dec, schema = mm.make_decoder("image")
    rows = mm.decode_binary_features(df, "payload", dec, schema).collect()
    assert rows[0]["width"] == 17 and rows[0]["height"] == 9


def test_decode_binary_features_stub(spark):
    """The true-binary-column pipeline: Arrow batches of bytes through
    the (stub) decoder; shapes deterministic."""
    rows = [(i, bytes(range(i % 7)) * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in mm.decode_binary_features(df, "payload").collect()}
    for i, payload in rows:
        assert out[i]["byte_len"] == len(payload)
        assert out[i]["n_chunks"] == (len(payload) + mm.CHUNK - 1) // mm.CHUNK
        assert out[i]["fake_width"] == (len(payload) % 640) + 1


def test_decode_features_text_standin_matches_stub(spark):
    df = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    row = mm.decode_features(df).collect()[0]
    want = mm.decode_stub(b"hello world")
    assert row["byte_len"] == want["byte_len"]
    assert row["fake_width"] == want["fake_width"]
    assert row["fake_height"] == want["fake_height"]


def test_resize_features_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abc"), (3, "xyz")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in mm.resize_features(df, width=32, height=16).collect()}
    assert rows[1]["out_w"] == 32 and rows[1]["out_h"] == 16
    assert rows[1]["thumb_sha256"] == rows[2]["thumb_sha256"]  # same payload
    assert rows[1]["thumb_sha256"] != rows[3]["thumb_sha256"]
    # target dims are part of the digest (a 64x64 thumb != a 32x16 thumb)
    alt = mm.resize_features(df, width=64, height=64).collect()[0]["thumb_sha256"]
    assert alt != rows[1]["thumb_sha256"]


def test_sample_frames_spans_and_short_payloads(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "ab"), (3, "")], "doc_id long, text string"
    )
    rows = mm.sample_frames(df, n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 8 chars / 4 frames -> spans of 2 at offsets 0,2,4,6
    f1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [(r["frame_off"], r["frame_len"]) for r in f1] == [(0, 2), (2, 2), (4, 2), (6, 2)]
    # payload shorter than the grid: frames past the end are not emitted
    f2 = sorted(by_doc[2], key=lambda r: r["frame_idx"])
    assert [(r["frame_off"], r["frame_len"]) for r in f2] == [(0, 1), (1, 1)]
    # empty payload still yields frame 0 (len 0)
    f3 = by_doc[3]
    assert len(f3) == 1 and f3[0]["frame_len"] == 0
