"""Stdlib-only REAL media codecs: PNG and WAV.

The sandbox (and many locked-down cluster images) ship without pillow /
soundfile, so the r2 multimodal pipeline only ever exercised its
deterministic stub. These decoders are *real* — actual pixels out of
actual PNG bytes, actual frame counts out of actual WAV bytes — built on
nothing but the public file-format specs and the Python standard library
(zlib for PNG's DEFLATE stream, the stdlib ``wave`` module for RIFF/WAV):

- PNG (RFC 2083 / W3C spec): signature + chunk walk, IHDR parse, IDAT
  inflate, per-scanline unfiltering (filter types 0-4: None/Sub/Up/
  Average/Paeth) into a numpy (H, W, C) uint8 array. Supports the
  formats this pipeline writes: 8-bit greyscale (color type 0),
  truecolor (2), truecolor+alpha (6).
- WAV: stdlib ``wave`` for params; PCM16 samples via numpy frombuffer.
- Encoders for both (filter-0 PNG rows; PCM16 WAV) so tests can
  round-trip known pixel/sample arrays and a real nearest-neighbor
  resize can re-emit valid PNG bytes.

Scale posture: decode runs inside mapInPandas Arrow batches exactly like
the stub did — one numpy-heavy Python call per item, no driver
involvement, no shuffle. zlib and numpy do the byte work in C.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


class CodecError(ValueError):
    pass


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. 8-bit depth, color types
    0/2/4/6, non-interlaced (the subset the encoder below emits and the
    overwhelming majority of real-world PNGs)."""
    if payload[:8] != PNG_SIG:
        raise CodecError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise CodecError(f"unsupported bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise CodecError(f"unsupported color type {color}")
            if interlace:
                raise CodecError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise CodecError("missing IHDR")
    nch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise CodecError("IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = np.zeros(stride, dtype=np.uint8)
            left = np.zeros(nch, dtype=np.uint8)
            for x0 in range(0, stride, nch):
                up = prev[x0 : x0 + nch]
                seg = line[x0 : x0 + nch]
                if ftype == 1:
                    cur[x0 : x0 + nch] = seg + left
                elif ftype == 3:
                    cur[x0 : x0 + nch] = seg + (
                        (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    upleft = (
                        out[y - 1, x0 - nch : x0] if y > 0 and x0 >= nch else np.zeros(nch, dtype=np.uint8)
                    )
                    if y == 0:
                        upleft = np.zeros(nch, dtype=np.uint8)
                    cur[x0 : x0 + nch] = seg + _paeth(left, up, upleft)
                left = cur[x0 : x0 + nch]
        else:
            raise CodecError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, nch)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_png_meta(payload: bytes) -> dict:
    """IMAGE_SCHEMA-compatible metadata via a full decode (the pixels are
    computed, proving the path; metadata alone would only need IHDR)."""
    px = decode_png_pixels(payload)
    h, w, nch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    return {
        "byte_len": len(payload),
        "width": int(w),
        "height": int(h),
        "mode": _MODE[color],
        "format": "PNG",
    }


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the classic pixel-art/thumbnail
    kernel) — pure numpy fancy indexing, vectorized."""
    h, w = px.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return px[ys][:, xs]


def resize_png(payload: bytes, width: int = 64, height: int = 64) -> dict:
    """REAL image resize: decode PNG -> nearest-neighbor resample ->
    re-encode PNG. Returns the RESIZED_SCHEMA fields plus the thumbnail
    bytes' digest over the actual resized pixels."""
    import hashlib

    thumb = encode_png(resize_nearest(decode_png_pixels(payload), width, height))
    return {
        "out_w": width,
        "out_h": height,
        "byte_len": len(payload),
        "thumb_sha256": hashlib.sha256(thumb).hexdigest(),
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """int16 samples (n,) or (n, channels) -> PCM16 WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav_meta(payload: bytes) -> dict:
    """AUDIO_SCHEMA-compatible metadata from real WAV bytes (stdlib
    ``wave``); frames are read, not just header-counted."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        frames = f.readframes(f.getnframes())
        return {
            "byte_len": len(payload),
            "n_frames": len(frames) // (f.getsampwidth() * f.getnchannels()),
            "sample_rate": int(f.getframerate()),
            "channels": int(f.getnchannels()),
        }


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples int16 (n, channels), sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise CodecError("only PCM16 WAV supported")
        raw = f.readframes(f.getnframes())
        arr = np.frombuffer(raw, dtype="<i2").reshape(-1, f.getnchannels())
        return arr, int(f.getframerate())
