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


def add_indexes(
    spark,
    dest_dir: str,
    source_dirs: list[str],
    hardlink: bool = True,
) -> Manifest:
    """Absorb other indexes' committed segments into ``dest_dir`` WITHOUT
    re-tokenizing — the Lucene ``IndexWriter.addIndexes(Directory...)``
    analog (EXTENSION; the reference has one index per writer). The
    consolidation shape at corpus scale: per-day/per-domain indexes
    merge into one queryable index as a metadata operation (segment dirs
    hardlinked, one manifest commit, one term-stats rebuild), and the
    normal log-merge policy compacts from there. Complementary to alias
    search (query/multi.py), which leaves the indexes separate.

    Requirements, checked before anything copies:
    - every source schema must be a prefix of ``dest``'s
      (``Schema.extends`` — the add_field evolution contract; source
      docs simply hold no data for dest's extra appended fields);
    - segment ids must be globally unique across dest + sources
      (posting/norms/docmap rows EMBED segment_id — a collision cannot
      be fixed by renaming dirs; rebuild the offender with a fresh
      build_id);
    - manifest-carried analyzer specs must not conflict by name.

    Source tombstones come along (their (segment_id, doc) keys stay
    valid). Source stats (doc/token/field-token counts) merge into
    dest's, so BM25 avgdl reflects the union. The dest manifest is
    written LAST (build's commit discipline: a crash mid-copy leaves
    only orphan dirs for GC). Both dest and each source hold their
    write locks during the operation; a foreign live writer fails it
    fast instead of racing GC.
    """
    from .build import _promote_term_stats, _write_term_stats_staged
    from .deletes import (
        clear_tombstones,
        load_tombstone_map,
        _write_tombstones,
    )
    from .lock import write_lock
    from .manifest import save_manifest
    from .query.exec import invalidate_cache

    if not source_dirs:
        raise ValueError("add_indexes needs at least one source index")
    with write_lock(dest_dir, owner="add_indexes"):
        dest = load_manifest(dest_dir)
        sources = []
        seen_ids = {s.segment_id: dest_dir for s in dest.segments}
        an_specs = dict(dest.analyzers)
        for sd in source_dirs:
            sm = load_manifest(sd)
            if not dest.schema.extends(sm.schema):
                raise ValueError(
                    f"schema of {sd!r} is not a prefix of the destination "
                    "schema (add_indexes requires Schema.extends — same "
                    "fields, ids, analyzers, flags, in order)"
                )
            for seg in sm.segments:
                if seg.segment_id in seen_ids:
                    raise ValueError(
                        f"segment id {seg.segment_id!r} of {sd!r} collides "
                        f"with {seen_ids[seg.segment_id]!r}; posting rows "
                        "embed segment_id, so renaming cannot fix this — "
                        "rebuild one side with a distinct build_id"
                    )
                seen_ids[seg.segment_id] = sd
            for name, spec in sm.analyzers.items():
                if an_specs.get(name, spec) != spec:
                    raise ValueError(
                        f"analyzer {name!r} of {sd!r} conflicts with the "
                        "destination's spec of the same name"
                    )
                an_specs[name] = spec
            sources.append((sd, sm))

        def _copy(src: str, dst: str) -> None:
            if hardlink:
                try:
                    os.link(src, dst)
                    return
                except OSError:
                    pass
            shutil.copy2(src, dst)

        new_segments = list(dest.segments)
        tomb_rows = [
            (sid, int(d))
            for sid, docs in load_tombstone_map(dest_dir).items()
            for d in docs
        ]
        for sd, sm in sources:
            with write_lock(sd, owner="add_indexes-source"):
                for seg in sm.segments:
                    src = os.path.join(sd, SEGMENTS_DIR, seg.segment_id)
                    dst = os.path.join(dest_dir, SEGMENTS_DIR, seg.segment_id)
                    # a crashed earlier attempt leaves a partial copy —
                    # safe to replace: the collision check above proved
                    # no committed manifest references this id, so the
                    # dir is an orphan (retry idempotence)
                    shutil.rmtree(dst, ignore_errors=True)
                    shutil.copytree(src, dst, copy_function=_copy)
                tomb_rows.extend(
                    (sid, int(d))
                    for sid, docs in load_tombstone_map(sd).items()
                    for d in docs
                )
            new_segments.extend(sm.segments)

        opstamp = dest.opstamp + 1
        stats = dict(dest.stats)
        stats["total_docs"] = sum(s.max_doc for s in new_segments)
        stats["total_tokens"] = dest.stats.get("total_tokens", 0) + sum(
            sm.stats.get("total_tokens", 0) for _, sm in sources
        )
        ft = dict(dest.stats.get("field_tokens", {}))
        for _, sm in sources:
            for fid, n in sm.stats.get("field_tokens", {}).items():
                ft[fid] = ft.get(fid, 0) + n
        stats["field_tokens"] = ft
        stats["term_stats_opstamp"] = opstamp
        staging = _write_term_stats_staged(
            spark,
            dest_dir,
            [s.segment_id for s in new_segments],
            opstamp,
            sum((s.metrics or {}).get("n_terms", s.max_doc) for s in new_segments),
        )
        if tomb_rows:
            _write_tombstones(
                spark,
                dest_dir,
                spark.createDataFrame(tomb_rows, "segment_id string, doc long"),
                opstamp,
            )
        else:
            clear_tombstones(dest_dir)
        merged = Manifest(
            dest.schema, new_segments, opstamp=opstamp, stats=stats,
            analyzers=an_specs,
        )
        save_manifest(dest_dir, merged)
        _promote_term_stats(dest_dir, staging)
    invalidate_cache(dest_dir)
    return merged
