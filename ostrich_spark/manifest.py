"""Index manifest: the meta.json analog, with checkpoints, lineage, metrics.

Mirrors ostrich's meta.json + managed-file GC
(/root/reference/index/index_meta.go:14-126,
/root/reference/directory/managed_directory.go:97-134) and extends it per
the north rule with per-partition checkpoint fragments (resumable builds),
lineage ids and build metrics.

Layout of an index directory:

    <index>/
      manifest.json            # committed manifest (atomic temp+rename)
      segments/<segment_id>/
        fragment.json          # per-partition checkpoint (written by the
                               # executor task; durable before commit)
        postings.parquet       # (field, term)-sorted posting rows
        norms.parquet          # (doc_id, field, length)
        docmap.parquet         # local doc_id -> source identity + sha256

Segment ordering in the committed manifest is max_doc DESC then
segment_id ASC — ostrich sorts metas by MaxDoc desc at commit
(/root/reference/indexer/segment_updater.go:51-70); the id tiebreak makes
the order total (SegmentOrd defines global doc addressing).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field as dc_field

from .schema import Schema

MANIFEST_NAME = "manifest.json"
FRAGMENT_NAME = "fragment.json"
SEGMENTS_DIR = "segments"


@dataclass
class SegmentMeta:
    segment_id: str
    max_doc: int
    # north-rule extensions: lineage + build metrics
    lineage: dict = dc_field(default_factory=dict)
    metrics: dict = dc_field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "segment_id": self.segment_id,
            "max_doc": self.max_doc,
            "lineage": self.lineage,
            "metrics": self.metrics,
        }

    @staticmethod
    def from_json(d: dict) -> "SegmentMeta":
        return SegmentMeta(d["segment_id"], d["max_doc"], d.get("lineage", {}), d.get("metrics", {}))


@dataclass
class Manifest:
    schema: Schema
    segments: list[SegmentMeta] = dc_field(default_factory=list)
    opstamp: int = 0
    stats: dict = dc_field(default_factory=dict)  # global: total_docs, total_tokens per field

    def sorted_segments(self) -> list[SegmentMeta]:
        return sorted(self.segments, key=lambda s: (-s.max_doc, s.segment_id))

    def doc_offsets(self) -> dict[str, int]:
        """segment_id -> global doc offset (concat ranges in SegmentOrd order,
        like /root/reference/indexer/merger.go:93-104)."""
        off, out = 0, {}
        for seg in self.sorted_segments():
            out[seg.segment_id] = off
            off += seg.max_doc
        return out

    @property
    def total_docs(self) -> int:
        return sum(s.max_doc for s in self.segments)

    def to_json(self) -> dict:
        return {
            "opstamp": self.opstamp,
            "schema": self.schema.to_json(),
            "segments": [s.to_json() for s in self.sorted_segments()],
            "stats": self.stats,
        }

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            Schema.from_json(d["schema"]),
            [SegmentMeta.from_json(s) for s in d["segments"]],
            d.get("opstamp", 0),
            d.get("stats", {}),
        )


def atomic_write_json(path: str, payload: dict) -> None:
    """temp + rename, like ostrich's AtomicWrite (index_meta.go:103-109)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_manifest(index_dir: str, manifest: Manifest) -> None:
    atomic_write_json(os.path.join(index_dir, MANIFEST_NAME), manifest.to_json())


def load_manifest(index_dir: str) -> Manifest:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return Manifest.from_json(json.load(f))


def manifest_exists(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, MANIFEST_NAME))


def segment_dir(index_dir: str, segment_id: str) -> str:
    return os.path.join(index_dir, SEGMENTS_DIR, segment_id)


def load_fragment(index_dir: str, segment_id: str) -> dict | None:
    """Per-partition checkpoint fragment — durable before the commit record
    exists (the resumability contract, SURVEY.md I14)."""
    p = os.path.join(segment_dir(index_dir, segment_id), FRAGMENT_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def garbage_collect(index_dir: str) -> list[str]:
    """Delete segment dirs not referenced by the committed manifest —
    manifest-driven GC (managed_directory.go:97-134)."""
    if not manifest_exists(index_dir):
        return []
    live = {s.segment_id for s in load_manifest(index_dir).segments}
    seg_root = os.path.join(index_dir, SEGMENTS_DIR)
    removed = []
    if os.path.isdir(seg_root):
        for name in os.listdir(seg_root):
            if name not in live:
                shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
                removed.append(name)
    return removed


def now_ms() -> int:
    return int(time.time() * 1000)
