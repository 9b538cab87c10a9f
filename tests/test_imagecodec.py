"""Stdlib-only real PNG/WAV codecs (ostrich_spark/imagecodec.py) and
their Spark pipelines: exact pixel round-trips, all five PNG filter
types on the decode side, real decode of true binary payloads through
mapInPandas, and the real resize path."""

import struct
import zlib

import numpy as np
import pytest

from ostrich_spark import imagecodec as ic
from ostrich_spark import multimodal as mm


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (4, 4, 4), (1, 1, 2)])
def test_png_roundtrip_exact(shape):
    px = _rand(shape, seed=sum(shape))
    out = ic.decode_png_pixels(ic.encode_png(px))
    want = px if px.ndim == 3 else px[:, :, None]
    assert out.shape == want.shape
    assert np.array_equal(out, want)


def _encode_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG using a chosen filter type per scanline (the
    committed encoder always emits filter 0; this exercises decode of
    Sub/Up/Average/Paeth too)."""
    h, w, nch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        if ft == 0:
            raw += line.tobytes()
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(nch, np.uint8), line[:-nch]])
            raw += (line - left).tobytes()
        elif ft == 2:  # Up
            raw += (line - prev).tobytes()
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(nch, np.uint8), line[:-nch]])
            avg = ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(
                np.uint8
            )
            raw += (line - avg).tobytes()
        else:  # Paeth
            left = np.concatenate([np.zeros(nch, np.uint8), line[:-nch]])
            upleft = np.concatenate([np.zeros(nch, np.uint8), prev[:-nch]])
            raw += (line - ic._paeth(left, prev, upleft)).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        ic.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(ftypes):
    px = _rand((6, 5, 3), seed=sum(ftypes) + 1)
    out = ic.decode_png_pixels(_encode_with_filters(px, ftypes))
    assert np.array_equal(out, px)


def test_png_rejects_garbage():
    with pytest.raises(ic.CodecError, match="signature"):
        ic.decode_png_pixels(b"not a png at all")


def test_png_meta():
    meta = ic.decode_png_meta(ic.encode_png(_rand((9, 17, 3), 3)))
    assert (meta["width"], meta["height"], meta["mode"], meta["format"]) == (
        17,
        9,
        "RGB",
        "PNG",
    )


def test_resize_nearest_golden():
    # 4x4 checkerboard -> 2x2 picks the top-left of each 2x2 block
    px = np.array(
        [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]],
        dtype=np.uint8,
    )[:, :, None]
    out = ic.resize_nearest(px, 2, 2)
    assert out[:, :, 0].tolist() == [[0, 2], [8, 10]]
    # upscale repeats source pixels
    up = ic.resize_nearest(px[:2, :2], 4, 4)
    assert up[:, :, 0].tolist() == [
        [0, 0, 1, 1],
        [0, 0, 1, 1],
        [4, 4, 5, 5],
        [4, 4, 5, 5],
    ]


def test_resize_png_digest_is_over_real_thumb():
    import hashlib

    px = _rand((8, 8, 3), 5)
    payload = ic.encode_png(px)
    got = ic.resize_png(payload, 4, 4)
    want = hashlib.sha256(ic.encode_png(ic.resize_nearest(px, 4, 4))).hexdigest()
    assert got["thumb_sha256"] == want
    assert (got["out_w"], got["out_h"], got["byte_len"]) == (4, 4, len(payload))


def test_wav_roundtrip_and_meta():
    rng = np.random.default_rng(7)
    samples = rng.integers(-30000, 30000, size=(1000, 2), dtype=np.int16)
    payload = ic.encode_wav(samples, sample_rate=22050, channels=2)
    meta = ic.decode_wav_meta(payload)
    assert meta["n_frames"] == 1000
    assert meta["sample_rate"] == 22050
    assert meta["channels"] == 2
    back, rate = ic.decode_wav_samples(payload)
    assert rate == 22050
    assert np.array_equal(back, samples)


def test_spark_real_image_decode(spark):
    """True binary PNG payloads through the decode pipeline: genuine
    width/height out (the r2 gap: this path had never executed without
    PIL; now the stdlib codec runs it in every environment)."""
    rows = [
        (i, bytes(ic.encode_png(_rand((3 + i, 5 + 2 * i, 3), seed=i))))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    dec, schema = mm.make_decoder("image")
    got = {
        r["doc_id"]: r
        for r in mm.decode_binary_features(df, "payload", dec, schema).collect()
    }
    for i, payload in rows:
        assert got[i]["width"] == 5 + 2 * i
        assert got[i]["height"] == 3 + i
        assert got[i]["byte_len"] == len(payload)
        assert got[i]["format"] == "PNG" or mm.HAS_PIL


def test_spark_real_audio_decode(spark):
    rows = [
        (
            i,
            bytes(
                ic.encode_wav(
                    np.zeros((100 * (i + 1), 1), dtype=np.int16),
                    sample_rate=8000 * (i + 1),
                )
            ),
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    dec, schema = mm.make_decoder("audio")
    got = {
        r["doc_id"]: r
        for r in mm.decode_binary_features(df, "payload", dec, schema).collect()
    }
    for i, _ in rows:
        assert got[i]["n_frames"] == 100 * (i + 1)
        assert got[i]["sample_rate"] == 8000 * (i + 1)
        assert got[i]["channels"] == 1


def test_spark_real_resize(spark):
    import hashlib

    pxs = [_rand((10, 10, 3), seed=100 + i) for i in range(4)]
    rows = [(i, bytes(ic.encode_png(px))) for i, px in enumerate(pxs)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r for r in mm.resize_images(df, width=5, height=3).collect()
    }
    for i, px in enumerate(pxs):
        want = hashlib.sha256(
            ic.encode_png(ic.resize_nearest(px, 5, 3))
        ).hexdigest()
        assert got[i]["thumb_sha256"] == want
        assert (got[i]["out_w"], got[i]["out_h"]) == (5, 3)
