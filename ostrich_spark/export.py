"""Consistent index export / clone (snapshot backup-restore).

The reference keeps exactly one committed meta and has no backup story:
copying a live index directory races GC and delete commits (a file-level
copy can capture a manifest plus segments from DIFFERENT commits).
Lucene solves this with SnapshotDeletionPolicy + a file-list backup; we
do the same over the manifest: ``export_index`` materializes a
standalone index directory containing exactly the files one committed
manifest references — CURRENT, or any retained point-in-time snapshot
(``set_snapshot_retention`` / ``load_manifest(opstamp=)``).

Consistency argument: segment dirs and tombstone version dirs are
immutable once committed (build/merge write fresh dirs and swap
pointers; nothing rewrites in place), so a manifest's file list is
stable for as long as the manifest itself is retained. The export
copies that list and writes the clone's ``manifest.json`` LAST — the
same commit discipline as a build, so a crashed export is never
mistaken for an index (``manifest_exists`` is false).

Scale note: this driver-side copy is the single-filesystem form. On a
cluster the same pinned file list (``export_file_list``) feeds a
DistCp-class bulk copy; the manifest-pinning is the part that matters —
it turns "copy a live directory" into "copy an immutable file set".
``hardlink=True`` makes same-filesystem clones O(metadata) (``cp -al``
style): committed parquet is never modified in place, and GC in the
source only unlinks names, so clones keep their data.

The clone starts with snapshot retention 0 and no retained snapshots of
its own (retention policy is an operational property of a LIVE index,
not of a backup).
"""

from __future__ import annotations

import os
import shutil

from .deletes import CURRENT_NAME, current_tombstone_name, _deletes_root
from .manifest import (
    MANIFEST_NAME,
    SEGMENTS_DIR,
    Manifest,
    atomic_write_json,
    load_manifest,
)

TERM_STATS_NAME = "term_stats.parquet"


def export_file_list(
    index_dir: str, opstamp: int | None = None
) -> tuple[Manifest, str | None, list[str]]:
    """(manifest, tombstone_version_name, relative paths) pinned by the
    CURRENT commit (``opstamp=None``) or a retained snapshot.

    The path list is every directory/file a faithful clone needs, relative
    to ``index_dir`` — the input to any bulk copier. ``term_stats.parquet``
    is included only when its recorded opstamp still pairs with this
    manifest (a later commit rewrites stats; a clone without the table
    falls back to summing segment postings, which is exact).
    """
    manifest = load_manifest(index_dir, opstamp=opstamp)
    if opstamp is None:
        tomb = current_tombstone_name(index_dir)
    else:
        tomb = getattr(manifest, "pinned_tombstone_dir", None)
        if tomb is not None and not os.path.isdir(
            os.path.join(_deletes_root(index_dir), tomb)
        ):
            raise FileNotFoundError(
                f"tombstone version {tomb!r} pinned by snapshot {opstamp} is "
                f"gone from {index_dir!r} — it aged out of snapshot retention"
            )
    paths = [os.path.join(SEGMENTS_DIR, s.segment_id) for s in manifest.segments]
    if tomb is not None:
        paths.append(os.path.join("deletes", tomb))
    from .query.exec import _term_stats_valid

    if _term_stats_valid(os.path.join(index_dir, TERM_STATS_NAME), manifest):
        paths.append(TERM_STATS_NAME)
    return manifest, tomb, paths


def export_index(
    index_dir: str,
    out_dir: str,
    opstamp: int | None = None,
    hardlink: bool = False,
) -> Manifest:
    """Clone the index as of one commit into ``out_dir`` (a fresh,
    standalone index whose CURRENT manifest is that commit). Returns the
    exported manifest. ``out_dir`` must not already contain anything."""
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise FileExistsError(f"export target {out_dir!r} is not empty")
    from .lock import write_lock

    # hold the writer lock for the copy: without it a merge/purge landing
    # mid-export could GC a segment between the manifest read and its
    # copy. Reentrant, so exporting from inside a writer context works;
    # a foreign live writer makes the export fail fast instead of
    # producing a torn clone.
    with write_lock(index_dir, owner="export"):
        manifest, tomb, paths = export_file_list(index_dir, opstamp=opstamp)
        _copy_pinned(index_dir, out_dir, manifest, tomb, paths, hardlink)
    return manifest


def _copy_pinned(index_dir, out_dir, manifest, tomb, paths, hardlink):

    def _copy(src: str, dst: str) -> None:
        if hardlink:
            try:
                os.link(src, dst)
                return
            except OSError:  # cross-device / unsupported FS — fall through
                pass
        shutil.copy2(src, dst)

    for rel in paths:
        src, dst = os.path.join(index_dir, rel), os.path.join(out_dir, rel)
        if os.path.isdir(src):
            shutil.copytree(src, dst, copy_function=_copy)
        else:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            _copy(src, dst)
    if tomb is not None:
        # fresh CURRENT pointer: the pinned version IS the clone's live one
        atomic_write_json(
            os.path.join(_deletes_root(out_dir), CURRENT_NAME),
            {"dir": tomb, "opstamp": manifest.opstamp},
        )
    # manifest LAST — the commit point of the clone
    atomic_write_json(os.path.join(out_dir, MANIFEST_NAME), manifest.to_json())
    return manifest
