"""Point-in-time snapshot reads (Lucene IndexCommit / ES PIT analog).

Contract: with retention on, every commit (build, delete, merge/purge)
leaves a readable snapshot for the last K opstamps; ``load_manifest(idx,
opstamp=S)`` + the normal query paths reproduce EXACTLY the results the
index returned when S was current — segment set AND delete visibility
pinned together. Retention 0 (the default) leaves on-disk behavior
identical to an index without snapshots.
"""

import os
import subprocess
import sys

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.manifest import (
    garbage_collect,
    list_snapshots,
    load_manifest,
    set_snapshot_retention,
    snapshot_retention,
)
from ostrich_spark.merge import purge_deletes
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_key": 0, "text": "spark stream merge"},
    {"doc_key": 1, "text": "spark join window"},
    {"doc_key": 2, "text": "merge policy segment"},
    {"doc_key": 3, "text": "spark stream stream"},
    {"doc_key": 4, "text": "window join batch"},
]


def _build(spark, path, retain=None):
    if retain is not None:
        set_snapshot_retention(path, retain)
    s = Schema()
    s.add_text_field("text", "default")
    build_index(
        spark, spark.createDataFrame(DOCS), s, path,
        num_partitions=2, order_col="doc_key", id_cols=["doc_key"],
    )
    return path


def _hits(spark, idx, query, manifest=None):
    res, _ = search(spark, idx, query, limit=None, manifest=manifest)
    rows = attach_docmap(spark, idx, res, manifest=manifest).select(
        "doc_key", "score"
    ).collect()
    return sorted((r["doc_key"], round(r["score"], 9)) for r in rows)


def test_default_no_snapshot_files(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "plain"))
    assert snapshot_retention(idx) == 0
    assert list_snapshots(idx) == []
    assert not os.path.isdir(os.path.join(idx, "manifests"))
    with pytest.raises(FileNotFoundError, match="no retained snapshot"):
        load_manifest(idx, opstamp=load_manifest(idx).opstamp)


def test_snapshot_pins_segments_and_deletes(spark, tmp_path):
    """Three commits (build, delete 0, delete 3): each retained snapshot
    reproduces the exact result set of its moment — later deletes do NOT
    leak into earlier views."""
    idx = _build(spark, str(tmp_path / "idx"), retain=3)
    s0 = load_manifest(idx).opstamp
    at_s0 = _hits(spark, idx, "text:spark")

    delete_docs(spark, idx, spark.createDataFrame([(0,)], "doc_key long"), ["doc_key"])
    s1 = load_manifest(idx).opstamp
    at_s1 = _hits(spark, idx, "text:spark")

    delete_docs(spark, idx, spark.createDataFrame([(3,)], "doc_key long"), ["doc_key"])
    s2 = load_manifest(idx).opstamp

    assert [op for op, _ in list_snapshots(idx)] == [s0, s1, s2]
    assert {d for d, _ in at_s0} == {0, 1, 3}
    assert _hits(spark, idx, "text:spark", load_manifest(idx, opstamp=s0)) == at_s0
    assert _hits(spark, idx, "text:spark", load_manifest(idx, opstamp=s1)) == at_s1
    assert {d for d, _ in at_s1} == {1, 3}
    assert (
        _hits(spark, idx, "text:spark", load_manifest(idx, opstamp=s2))
        == _hits(spark, idx, "text:spark")
    )


def test_snapshot_survives_purge(spark, tmp_path):
    """After a physical purge (segments rewritten, tombstones GC'd, stats
    recomputed) the pre-purge snapshot still reproduces its exact
    results: old segments retained by GC, pinned tombstone version kept,
    and the rewritten term_stats fails the snapshot's pairing check so
    stats fall back to the snapshot's own postings."""
    idx = _build(spark, str(tmp_path / "idx"), retain=4)
    delete_docs(spark, idx, spark.createDataFrame([(1,)], "doc_key long"), ["doc_key"])
    s_del = load_manifest(idx).opstamp
    before = _hits(spark, idx, "text:spark OR text:window")

    assert purge_deletes(spark, idx)
    after = _hits(spark, idx, "text:spark OR text:window")
    assert after != before  # purge recomputes stats → different scores

    snap = load_manifest(idx, opstamp=s_del)
    assert _hits(spark, idx, "text:spark OR text:window", snap) == before


def test_retention_prunes_and_releases(spark, tmp_path):
    """Retention K keeps exactly the last K commits; dropping retention
    releases snapshots immediately and the next GC removes the segments
    only they referenced."""
    idx = _build(spark, str(tmp_path / "idx"), retain=2)
    ops = [load_manifest(idx).opstamp]
    for key in (0, 1, 2):
        delete_docs(
            spark, idx, spark.createDataFrame([(key,)], "doc_key long"), ["doc_key"]
        )
        ops.append(load_manifest(idx).opstamp)
    retained = [op for op, _ in list_snapshots(idx)]
    assert retained == ops[-2:]
    with pytest.raises(FileNotFoundError, match="no retained snapshot"):
        load_manifest(idx, opstamp=ops[0])

    # purge rewrites segments; the old ones stay for the retained snaps
    purge_deletes(spark, idx)
    seg_root = os.path.join(idx, "segments")
    pre_purge_segments = {
        s.segment_id for s in load_manifest(idx, opstamp=ops[-1]).segments
    }
    assert pre_purge_segments <= set(os.listdir(seg_root))

    set_snapshot_retention(idx, 0)
    assert list_snapshots(idx) == []
    removed = garbage_collect(idx)
    live = {s.segment_id for s in load_manifest(idx).segments}
    # everything the snapshots alone kept alive is gone now (untombstoned
    # segments survived the purge and are still live — those stay)
    assert pre_purge_segments - live == set(removed) and removed
    assert set(os.listdir(seg_root)) == live


def test_cli_snapshots_and_at(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"), retain=3)
    s0 = load_manifest(idx).opstamp
    delete_docs(spark, idx, spark.createDataFrame([(0,)], "doc_key long"), ["doc_key"])

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "snapshots", "-p", idx],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.startswith("retention: 3")
    assert len([l for l in out.stdout.splitlines() if l and not l.startswith("retention")]) == 2

    at = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", idx, "--at", str(s0), "--count", "-l", "10"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert at.returncode == 0, at.stderr[-2000:]
    assert "count: 3" in at.stdout  # doc 0 still visible at s0
    cur = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", idx, "--count", "-l", "10"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert "count: 2" in cur.stdout
    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", idx, "--at", "999999"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "no retained snapshot" in bad.stderr
