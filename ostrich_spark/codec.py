"""Posting-list codec: delta + varint packing with block-max metadata.

Replaces the reference's plain-gob posting serialization
(/root/reference/internal/postings/postings_writer.go:89-125), which has
no delta encoding, no varint, no blocks. The north rule mandates
delta/varint-or-bitpacked compression plus block-max metadata for
block-max WAND pruning.

Layout per posting list (one term):
- doc_ids: sorted uint64, delta-encoded (first value absolute), each delta
  LEB128-varint encoded.
- tfs: uint64 term frequencies, varint encoded (no delta; tfs are small).
- blocks of ``BLOCK_SIZE`` docs; per block we keep (outside the binary, as
  plain array columns so Parquet/Arrow handle them natively):
    block_max_doc — last docID in the block (skip pointer),
    block_max_tf  — max term frequency in the block,
    block_min_len — min field length (norm) in the block, for a valid
                    BM25 upper bound (monotone up in tf, down in len).

Everything here is vectorized numpy — no per-element Python loops on the
encode/decode hot path.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


# varint byte-count thresholds: value < 2^(7k) needs k bytes
_VARINT_BOUNDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def _varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varint-encode a uint64 array, fully vectorized.
    Returns (bytes, per-value byte lengths)."""
    if len(values) == 0:
        return b"", np.empty(0, dtype=np.int64)
    v = values.astype(np.uint64, copy=False)
    nbytes = np.searchsorted(_VARINT_BOUNDS, v, side="right") + 1
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill byte-position k of every value that has >= k+1 bytes
    max_b = int(nbytes.max())
    rem = v.copy()
    for k in range(max_b):
        mask = nbytes > k
        idx = starts[mask] + k
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        rem[mask] >>= np.uint64(7)
    return out.tobytes(), nbytes


def _varint_encode(values: np.ndarray) -> bytes:
    return _varint_encode_with_lengths(values)[0]


def _varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 varints -> uint64 array, vectorized."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = len(ends)
    values = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    max_b = int(lengths.max())
    payload = (b & 0x7F).astype(np.uint64)
    for k in range(max_b):
        mask = lengths > k
        values[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return values


def pack_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta + varint pack a sorted docID array."""
    if len(doc_ids) == 0:
        return b""
    d = np.asarray(doc_ids, dtype=np.uint64)
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    return _varint_encode(deltas)


def unpack_doc_ids(buf: bytes) -> np.ndarray:
    deltas = _varint_decode(buf)
    if len(deltas) == 0:
        return deltas.astype(np.int64)
    return np.cumsum(deltas, dtype=np.uint64).astype(np.int64)


def pack_tfs(tfs: np.ndarray) -> bytes:
    return _varint_encode(np.asarray(tfs, dtype=np.uint64))


def unpack_tfs(buf: bytes) -> np.ndarray:
    return _varint_decode(buf).astype(np.int64)


def pack_blocked(values: np.ndarray, delta: bool) -> tuple[bytes, list[int]]:
    """Pack into independently-decodable blocks of BLOCK_SIZE values.

    With ``delta=True`` each block stores its first value absolute and the
    rest as deltas — so a block can be decoded without its predecessors
    (the enabler for block-max WAND skip-decoding, and for merge-time
    docID patching that touches only block heads).

    Encoding is ONE vectorized varint pass over the whole list; block
    byte offsets fall out of the per-value byte lengths.

    Returns (packed bytes, byte offset of each block start).
    """
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", []
    block_starts = np.arange(0, n, BLOCK_SIZE)
    if delta and n > 1:
        enc = np.empty_like(v)
        enc[0] = v[0]
        np.subtract(v[1:], v[:-1], out=enc[1:])
        enc[block_starts] = v[block_starts]  # absolute block heads
    else:
        enc = v
    buf, nbytes = _varint_encode_with_lengths(enc)
    byte_starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    return buf, byte_starts[block_starts].tolist()


def first_value(buf: bytes) -> int:
    """First value of a ``pack_blocked``/``pack_doc_ids`` buffer WITHOUT
    decoding the list: block 0's head is stored absolute (delta coding
    restarts at every block head), and a uint64 LEB128 varint is at most
    10 bytes — so the first value is the first varint of the first 10
    bytes. This is the codec-layout twin of ``block_max_doc[-1]`` for
    decode-free min/max range tests (e.g. the merge purge fast path);
    keeping it HERE means a head-encoding change (zigzag, packed heads)
    breaks exactly one function instead of silently mis-splitting call
    sites that duplicated the layout assumption."""
    return int(_varint_decode(bytes(buf)[:10])[0])


def unpack_blocked(
    buf: bytes,
    offsets: list[int],
    n_values: int,
    delta: bool,
    block_indices: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode selected blocks (or all when ``block_indices`` is None).

    Returns (values, positions) where positions are the global posting
    ordinals of the decoded values (needed to align docs/tfs/lens when
    only a block subset is decoded).
    """
    nblocks = len(offsets)
    if nblocks == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if block_indices is None:
        # full decode: one vectorized varint pass + segmented delta cumsum
        raw = _varint_decode(buf)
        if delta and len(raw) > 1:
            cum = np.cumsum(raw, dtype=np.uint64)
            starts = np.arange(0, len(raw), BLOCK_SIZE)
            # value = cum[pos] - cum[block_start - 1] (block head is absolute)
            base = np.zeros(len(starts), dtype=np.uint64)
            base[1:] = cum[starts[1:] - 1]
            sizes = np.diff(np.concatenate((starts, [len(raw)])))
            raw = cum - np.repeat(base, sizes)
        return raw.astype(np.int64), np.arange(len(raw), dtype=np.int64)
    block_indices = np.asarray(block_indices, dtype=np.int64)
    bounds = list(offsets) + [len(buf)]
    vals: list[np.ndarray] = []
    poss: list[np.ndarray] = []
    for bi in block_indices:
        raw = _varint_decode(buf[bounds[bi] : bounds[bi + 1]])
        if delta and len(raw) > 1:
            raw = np.cumsum(raw, dtype=np.uint64)
        start = int(bi) * BLOCK_SIZE
        vals.append(raw.astype(np.int64))
        poss.append(np.arange(start, start + len(raw), dtype=np.int64))
    return np.concatenate(vals), np.concatenate(poss)


def pack_blocked_at(values: np.ndarray, value_starts) -> tuple[bytes, list[int]]:
    """Non-delta varint pack with EXPLICIT block boundaries: block i
    holds values[value_starts[i] : value_starts[i+1]]. One vectorized
    encode pass; byte offsets fall out of the per-value lengths.
    Returns (packed bytes, byte offset of each block start)."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", []
    buf, nbytes = _varint_encode_with_lengths(v)
    byte_starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    starts = np.asarray(value_starts, dtype=np.int64)
    return buf, byte_starts[starts].tolist()


def pack_pos_doc_aligned(pos: np.ndarray, tfs: np.ndarray) -> tuple[bytes, list[int]]:
    """Pack a doc-major flat positions array into DOC-ALIGNED blocks:
    position block i holds exactly the occurrences of doc block i
    (docs [i*BLOCK_SIZE, (i+1)*BLOCK_SIZE)), so selecting doc blocks
    selects position blocks 1:1 — the enabler for phrase/near
    block-subset decode (len(pos_offs) == len(doc_offs) by
    construction). Occurrence-aligned fixed-width blocks (the pre-r4
    layout) cut mid-doc, which is why whole-list decode was forced."""
    t = np.asarray(tfs, dtype=np.int64)
    if len(pos) == 0 or len(t) == 0:
        return b"", []
    doc_block_starts = np.arange(0, len(t), BLOCK_SIZE)
    cum = np.concatenate(([0], np.cumsum(t)))
    return pack_blocked_at(pos, cum[doc_block_starts])


def unpack_ranges(
    buf: bytes, offsets: list[int], block_indices
) -> np.ndarray:
    """Decode selected non-delta blocks by byte range (no fixed-width
    value-count assumption — the counts come out of the data), in the
    given block order."""
    if not offsets:
        return np.empty(0, dtype=np.int64)
    bounds = list(offsets) + [len(buf)]
    parts = [
        _varint_decode(buf[bounds[int(b)] : bounds[int(b) + 1]])
        for b in block_indices
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts).astype(np.int64)


def block_metadata(
    doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray
) -> tuple[list[int], list[int], list[int]]:
    """Per-block (max_doc, max_tf, min_len) for block-max WAND.

    ``doc_lens`` is the field length (token count) of each posting's doc,
    aligned with doc_ids.
    """
    n = len(doc_ids)
    if n == 0:
        return [], [], []
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    ln = np.asarray(doc_lens, dtype=np.int64)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    max_doc, max_tf, min_len = [], [], []
    for i in range(nblocks):
        s, e = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, n)
        max_doc.append(int(d[e - 1]))
        max_tf.append(int(t[s:e].max()))
        min_len.append(int(ln[s:e].min()))
    return max_doc, max_tf, min_len
