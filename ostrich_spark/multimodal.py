"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark side — schema, partition-sized Arrow batches, mapInPandas
signatures, metadata extraction — is real and tested. The decode step
dispatches on what's importable:

- ``decode_image_real`` uses PIL when installed (optional import; this
  sandbox ships without it, production clusters add `pillow`);
- ``decode_audio_real`` likewise via soundfile;
- ``decode_stub`` is the deterministic fallback so the pipeline shape is
  testable (and oracle-checkable) everywhere;
- ``make_decoder`` picks the real decoder if its library imports, else
  the stub, logging the downgrade once.
"""

from __future__ import annotations

import logging
import warnings
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

CHUNK = 1024

DECODED_SCHEMA = (
    "doc_id long, byte_len long, n_chunks long, fake_width int, fake_height int"
)

# real-decoder feature schema: width/height are genuine, plus mode/format
IMAGE_SCHEMA = (
    "doc_id long, byte_len long, width int, height int, mode string, format string"
)
AUDIO_SCHEMA = "doc_id long, byte_len long, n_frames long, sample_rate int, channels int"

try:  # optional: pillow (public package) — absent in this sandbox
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    HAS_PIL = False

try:  # optional: soundfile (public package)
    import soundfile as _soundfile  # type: ignore

    HAS_SOUNDFILE = True
except ImportError:  # pragma: no cover - environment-dependent
    _soundfile = None
    HAS_SOUNDFILE = False


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder — the everywhere-runnable fallback.
    Field names say 'fake' so nobody mistakes them for real pixels."""
    n = len(payload)
    return {
        "byte_len": n,
        "n_chunks": (n + CHUNK - 1) // CHUNK,
        "fake_width": (n % 640) + 1,
        "fake_height": (n % 480) + 1,
    }


def decode_image_real(payload: bytes) -> dict:
    """Real image decode via PIL (width/height/mode/format). Raises an
    actionable error when pillow isn't installed."""
    if not HAS_PIL:
        raise ImportError(
            "real image decoding requires the public `pillow` package "
            "(pip install pillow on the cluster image); use decode_stub "
            "or make_decoder() for environments without it"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return {
            "byte_len": len(payload),
            "width": int(im.width),
            "height": int(im.height),
            "mode": im.mode,
            "format": im.format or "",
        }


def decode_audio_real(payload: bytes) -> dict:
    """Real audio decode via soundfile (frames/rate/channels)."""
    if not HAS_SOUNDFILE:
        raise ImportError(
            "real audio decoding requires the public `soundfile` package; "
            "use decode_stub or make_decoder() for environments without it"
        )
    import io

    with _soundfile.SoundFile(io.BytesIO(payload)) as f:
        return {
            "byte_len": len(payload),
            "n_frames": int(f.frames),
            "sample_rate": int(f.samplerate),
            "channels": int(f.channels),
        }


_warned = False


def make_decoder(kind: str = "image") -> tuple[Callable[[bytes], dict], str]:
    """(decoder, result_schema) preference order:

    1. the full-format library decoder (PIL / soundfile) when importable;
    2. the stdlib-only REAL codec (ostrich_spark/imagecodec.py): actual
       PNG pixel decode via zlib + scanline unfiltering, actual WAV frame
       decode via the stdlib ``wave`` module — always available, so
       image/audio decode is never a stub anymore (r2 verdict item #4);
    3. ``decode_stub`` only for kinds with no real decoder in this
       environment (e.g. video without ffmpeg) — with one logged warning.
    """
    global _warned
    if kind == "image":
        if HAS_PIL:
            return decode_image_real, IMAGE_SCHEMA
        from .imagecodec import decode_png_meta

        return decode_png_meta, IMAGE_SCHEMA
    if kind == "audio":
        if HAS_SOUNDFILE:
            return decode_audio_real, AUDIO_SCHEMA
        from .imagecodec import decode_wav_meta

        return decode_wav_meta, AUDIO_SCHEMA
    if not _warned:
        msg = (
            f"multimodal: no real {kind} decoder available "
            "— falling back to decode_stub"
        )
        log.warning(msg)
        warnings.warn(msg, stacklevel=2)
        _warned = True
    return decode_stub, DECODED_SCHEMA


def binary_meta(df, text_col: str = "text"):
    """JVM-side metadata over an opaque binary payload (here: the utf-8
    bytes of ``text`` stand in for an image blob)."""
    return df.select(
        "doc_id",
        F.octet_length(F.col(text_col)).alias("byte_len"),
        F.ceil(F.octet_length(F.col(text_col)) / F.lit(CHUNK)).cast("long").alias("n_chunks"),
    )


def decode_features(
    df,
    text_col: str = "text",
    decoder: Callable[[bytes], dict] = decode_stub,
    schema: str = DECODED_SCHEMA,
):
    """mapInPandas decode pipeline: Arrow batches of binary payloads ->
    per-item feature rows via ``decoder`` (stub by default; pass
    ``*make_decoder('image')`` as (decoder, schema) for the real path).
    Batch shape, schema, and partitioning are decoder-independent."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[text_col].astype(str).str.encode("utf-8")
            feats = [decoder(p) for p in payloads]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.select("doc_id", text_col).mapInPandas(fn, schema)


RESIZED_SCHEMA = "doc_id long, out_w int, out_h int, byte_len long, thumb_sha256 string"
FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_off long, frame_len long, frame_sha256 string"
)


def resize_stub(payload: bytes, width: int = 64, height: int = 64) -> dict:
    """Deterministic stand-in for an image resize: real pipelines swap in
    PIL's `Image.resize` here; the Spark-side batch shape, schema, and
    partitioning are identical. The fake 'thumbnail' is a stable digest
    of the payload plus target dims (so tests can assert determinism)."""
    import hashlib as _h

    return {
        "out_w": width,
        "out_h": height,
        "byte_len": len(payload),
        "thumb_sha256": _h.sha256(payload + f"@{width}x{height}".encode()).hexdigest(),
    }


def resize_features(df, text_col: str = "text", width: int = 64, height: int = 64):
    """mapInPandas resize pipeline over the (text-standing-in-for-binary)
    payload column — one Arrow batch in, one feature row per item out."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                resize_stub(str(v).encode("utf-8"), width, height)
                for v in pdf[text_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.select("doc_id", text_col).mapInPandas(fn, RESIZED_SCHEMA)


def resize_images(
    df,
    binary_col: str = "payload",
    width: int = 64,
    height: int = 64,
    id_col: str = "doc_id",
):
    """REAL image resize over a true binary column: PNG pixel decode ->
    nearest-neighbor resample -> PNG re-encode, all stdlib+numpy
    (imagecodec.resize_png). Same Arrow-batch shape as resize_features;
    the digest is over the actual resized thumbnail bytes."""
    from .imagecodec import resize_png

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [resize_png(bytes(p), width, height) for p in pdf[binary_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, binary_col).mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(df, text_col: str = "text", n_frames: int = 4):
    """Frame sampling plumbing: split each payload into ``n_frames``
    equal spans (the video analog: decode N evenly-spaced frames) and
    emit one row per frame with its offset/length/digest. A real decoder
    (ffmpeg) swaps into the span step; the EXPLODING row shape — one
    input item to N output rows inside one Arrow batch — is the part the
    pipeline needs to get right. Spans are CHARACTER-based over the text
    stand-in so the DuckDB oracle reproduces them with substr()."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _h

        for pdf in it:
            rows = []
            for doc_id, v in zip(pdf["doc_id"], pdf[text_col]):
                s = str(v)
                n = len(s)
                span = max(1, -(-n // n_frames))  # ceil division
                for i in range(n_frames):
                    off = i * span
                    if off >= n and i > 0:
                        break  # payload shorter than the frame grid
                    chunk = s[off : off + span]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_off": off,
                            "frame_len": len(chunk),
                            "frame_sha256": _h.sha256(chunk.encode("utf-8")).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", text_col).mapInPandas(fn, FRAMES_SCHEMA)


def decode_binary_features(
    df,
    binary_col: str = "payload",
    decoder: Callable[[bytes], dict] = decode_stub,
    schema: str = DECODED_SCHEMA,
    id_col: str = "doc_id",
):
    """Same pipeline over a TRUE binary column (e.g. from
    ``spark.read.format('binaryFile')`` or an Iceberg binary field)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(bytes(p)) for p in pdf[binary_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, binary_col).mapInPandas(fn, schema)
