"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step itself is STUBBED (image/audio libraries are not in this
environment) behind ``decode_stub``; everything Spark-side — schema,
partition-sized Arrow batches, mapInPandas signatures, metadata
extraction — is real and tested. Swap ``decode_stub`` for a PIL/ffmpeg
call and the pipeline is production-shaped.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

CHUNK = 1024

DECODED_SCHEMA = (
    "doc_id long, byte_len long, n_chunks long, fake_width int, fake_height int"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. Replace with a real image/audio decode
    (PIL.Image.open / soundfile.read) in production; raises clearly if
    someone expects real decoding semantics."""
    n = len(payload)
    return {
        "byte_len": n,
        "n_chunks": (n + CHUNK - 1) // CHUNK,
        "fake_width": (n % 640) + 1,
        "fake_height": (n % 480) + 1,
    }


def real_decode(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "real image/audio decoding requires PIL/ffmpeg, not available in "
        "this environment — use decode_stub for plumbing tests"
    )


def binary_meta(df, text_col: str = "text"):
    """JVM-side metadata over an opaque binary payload (here: the utf-8
    bytes of ``text`` stand in for an image blob)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        F.octet_length(F.col(text_col)).alias("byte_len"),
        F.ceil(F.octet_length(F.col(text_col)) / F.lit(CHUNK)).cast("long").alias("n_chunks"),
    )


def decode_features(df, text_col: str = "text"):
    """mapInPandas decode pipeline: Arrow batches of binary payloads ->
    per-item feature rows via the (stubbed) decoder. The batch shape,
    schema, and partitioning are exactly what a real decoder needs."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[text_col].astype(str).str.encode("utf-8")
            feats = [decode_stub(p) for p in payloads]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.select("doc_id", text_col).mapInPandas(fn, DECODED_SCHEMA)
