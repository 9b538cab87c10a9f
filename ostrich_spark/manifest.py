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
SNAPSHOTS_DIR = "manifests"
RETENTION_NAME = "retention.json"


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
    # name -> filter-chain spec for NON-builtin analyzers the schema
    # references (self-describing index: readers reconstruct synonym /
    # edge-ngram chains without out-of-band register_analyzer calls)
    analyzers: dict = dc_field(default_factory=dict)

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
            "analyzers": self.analyzers,
        }

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            Schema.from_json(d["schema"]),
            [SegmentMeta.from_json(s) for s in d["segments"]],
            d.get("opstamp", 0),
            d.get("stats", {}),
            d.get("analyzers", {}),
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
    if snapshot_retention(index_dir) > 0:
        _write_snapshot(index_dir, manifest)


def load_manifest(index_dir: str, opstamp: int | None = None) -> Manifest:
    """Committed manifest; with ``opstamp``, the retained SNAPSHOT at
    that commit point (point-in-time read — Lucene IndexCommit / ES PIT
    analog). A snapshot-loaded manifest carries the tombstone version
    that was CURRENT at its commit (``pinned_tombstone_dir``), so query
    paths see a fully consistent (segments, deletes) pair. Requires
    snapshot retention (``set_snapshot_retention``) to have been on when
    the commit happened and the snapshot to still be within retention."""
    if opstamp is None:
        with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
            m = Manifest.from_json(json.load(f))
        _register_manifest_analyzers(m)
        return m
    path = os.path.join(index_dir, SNAPSHOTS_DIR, f"manifest-{opstamp:010d}.json")
    if not os.path.exists(path):
        avail = [op for op, _ in list_snapshots(index_dir)]
        raise FileNotFoundError(
            f"no retained snapshot at opstamp {opstamp} in {index_dir!r} "
            f"(retained: {avail or 'none'} — see set_snapshot_retention)"
        )
    with open(path) as f:
        d = json.load(f)
    m = Manifest.from_json(d)
    # not a serialized Manifest field: only snapshot loads pin deletes
    m.pinned_tombstone_dir = d.get("tombstone_name")
    _register_manifest_analyzers(m)
    return m


def _register_manifest_analyzers(m: Manifest) -> None:
    """A manifest carrying analyzer specs makes the index self-describing:
    synonym / edge-ngram chains auto-register on load, so any reader
    process can parse queries against the field analyzers without
    out-of-band register_analyzer calls. An existing registration wins."""
    if m.analyzers:
        from .analysis import ensure_registered

        ensure_registered(m.analyzers)


# ---------------------------------------------------------------------------
# snapshot retention (point-in-time reads)
# ---------------------------------------------------------------------------


def snapshot_retention(index_dir: str) -> int:
    """How many committed snapshots this index retains (0 = none — the
    default, identical on-disk behavior to an index without snapshots)."""
    p = os.path.join(index_dir, RETENTION_NAME)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f).get("snapshots", 0))


def set_snapshot_retention(index_dir: str, snapshots: int) -> None:
    """Keep the last ``snapshots`` committed manifests (plus the
    tombstone versions and segment dirs they reference) readable via
    ``load_manifest(index_dir, opstamp=...)``. Retention is enforced at
    each commit and at GC; lowering it prunes on the next commit."""
    if snapshots < 0:
        raise ValueError("snapshots must be >= 0")
    os.makedirs(index_dir, exist_ok=True)
    atomic_write_json(
        os.path.join(index_dir, RETENTION_NAME), {"snapshots": snapshots}
    )
    # lowering retention releases the older snapshots immediately (their
    # segments/tombstones become collectable at the next GC)
    snaps = list_snapshots(index_dir)
    for _, path in snaps[: max(0, len(snaps) - snapshots)]:
        os.unlink(path)


def list_snapshots(index_dir: str) -> list[tuple[int, str]]:
    """Retained (opstamp, path) pairs, oldest first."""
    root = os.path.join(index_dir, SNAPSHOTS_DIR)
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append((int(name[len("manifest-"):-len(".json")]), os.path.join(root, name)))
    return out


def _write_snapshot(index_dir: str, manifest: Manifest) -> None:
    # record the tombstone version CURRENT at this commit so a snapshot
    # read pins (segments, deletes) together — deletes committed later
    # must not leak into an earlier point-in-time view
    from .deletes import current_tombstone_name

    payload = manifest.to_json()
    payload["tombstone_name"] = current_tombstone_name(index_dir)
    atomic_write_json(
        os.path.join(
            index_dir, SNAPSHOTS_DIR, f"manifest-{manifest.opstamp:010d}.json"
        ),
        payload,
    )
    keep = snapshot_retention(index_dir)
    snaps = list_snapshots(index_dir)
    for _, path in snaps[: max(0, len(snaps) - keep)]:
        os.unlink(path)


def snapshot_tombstone_names(index_dir: str) -> set[str]:
    """Tombstone version dirs referenced by retained snapshots — the
    delete-side retention set (pruned versions would silently resurrect
    deleted docs in point-in-time reads)."""
    out = set()
    for _, path in list_snapshots(index_dir):
        with open(path) as f:
            name = json.load(f).get("tombstone_name")
        if name:
            out.add(name)
    return out


def add_field(
    index_dir: str,
    name: str,
    analyzer: str = "default",
    positions: bool = False,
    store: bool = False,
    numeric_type: str | None = None,
    keyword: bool = False,
    date: bool = False,
    ip: bool = False,
    source_col: str = "",
) -> Manifest:
    """Append-only schema evolution (Lucene has none per index — new
    fields just appear in new docs; we make it an explicit commit so the
    manifest stays the single source of truth). Commits a new manifest
    whose schema carries the new field at the next FieldID. Existing
    segments hold no data for it: queries on the field match only docs
    appended afterwards, and its stored/doc-value column reads as null
    on older docs (docmap reads merge schemas across segments). The
    term_stats pairing is preserved — stats describe the same postings.

    Future appends must be built with the EVOLVED schema
    (``load_manifest(index_dir).schema``); build append enforces the
    append-only extension rule either way."""
    from .lock import write_lock

    with write_lock(index_dir, owner="add_field"):
        m = load_manifest(index_dir)
        if m.schema.field_by_name(name) is not None:
            raise ValueError(f"field {name!r} already exists in the schema")
        if sum([keyword, date, ip, numeric_type is not None]) > 1:
            raise ValueError(
                "a field is keyword OR numeric OR date OR ip, pick one"
            )
        if keyword:
            m.schema.add_keyword_field(name, source_col=source_col)
        elif date:
            m.schema.add_date_field(name, source_col=source_col)
        elif ip:
            m.schema.add_ip_field(name, source_col=source_col)
        elif numeric_type is not None:
            m.schema.add_numeric_field(name, numeric_type)
        else:
            from .analysis import get_analyzer

            get_analyzer(analyzer)  # fail fast on an unregistered name
            m.schema.add_text_field(name, analyzer, positions=positions,
                                    store=store, source_col=source_col)
        m.opstamp += 1
        save_manifest(index_dir, m)
    from .query.exec import invalidate_cache

    invalidate_cache(index_dir)
    return m


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
    manifest-driven GC (managed_directory.go:97-134). With snapshot
    retention on, segments referenced by any RETAINED snapshot stay
    live too (dropping them would break point-in-time reads); they are
    collected once their snapshots age out of retention."""
    if not manifest_exists(index_dir):
        return []
    live = {s.segment_id for s in load_manifest(index_dir).segments}
    for _, path in list_snapshots(index_dir):
        with open(path) as f:
            live.update(s["segment_id"] for s in json.load(f)["segments"])
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
