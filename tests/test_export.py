"""Consistent index export/clone (snapshot backup-restore).

Contract: the clone is a standalone index whose CURRENT commit is the
exported one — search results identical to the source at that commit,
independent of anything that happens to the source afterwards (later
deletes, purges, GC, even deletion of the source tree).
"""

import os
import shutil
import subprocess
import sys

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.export import export_file_list, export_index
from ostrich_spark.manifest import (
    garbage_collect,
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


def test_export_current_is_standalone(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "src"))
    delete_docs(spark, idx, spark.createDataFrame([(0,)], "doc_key long"), ["doc_key"])
    want = _hits(spark, idx, "text:spark")
    assert {d for d, _ in want} == {1, 3}

    clone = str(tmp_path / "clone")
    m = export_index(idx, clone)
    assert m.opstamp == load_manifest(idx).opstamp
    shutil.rmtree(idx)  # standalone: the source is gone
    assert _hits(spark, clone, "text:spark") == want
    # clone carries the paired term_stats and starts with retention 0
    assert os.path.isdir(os.path.join(clone, "term_stats.parquet"))
    assert snapshot_retention(clone) == 0


def test_export_at_snapshot_pins_deletes(spark, tmp_path):
    """Exports at three commit points each reproduce exactly that
    moment's results; later source mutations never reach the clones."""
    idx = _build(spark, str(tmp_path / "src"), retain=3)
    s0 = load_manifest(idx).opstamp
    at_s0 = _hits(spark, idx, "text:spark")
    delete_docs(spark, idx, spark.createDataFrame([(0,)], "doc_key long"), ["doc_key"])
    s1 = load_manifest(idx).opstamp
    at_s1 = _hits(spark, idx, "text:spark")
    delete_docs(spark, idx, spark.createDataFrame([(3,)], "doc_key long"), ["doc_key"])

    c0 = str(tmp_path / "c0")
    c1 = str(tmp_path / "c1")
    export_index(idx, c0, opstamp=s0)
    export_index(idx, c1, opstamp=s1)
    # pre-delete clone has no deletes dir at all
    assert not os.path.exists(os.path.join(c0, "deletes"))
    assert _hits(spark, c0, "text:spark") == at_s0
    assert _hits(spark, c1, "text:spark") == at_s1
    # mutating the source further does not touch the clones
    delete_docs(spark, idx, spark.createDataFrame([(1,)], "doc_key long"), ["doc_key"])
    assert _hits(spark, c1, "text:spark") == at_s1


def test_export_post_purge_snapshot_drops_mispaired_stats(spark, tmp_path):
    """After a purge rewrites term_stats, a pre-purge snapshot's stats
    pairing is broken — the export must OMIT the stats table and the
    clone's search falls back to segment postings, exactly reproducing
    the pre-purge scores."""
    idx = _build(spark, str(tmp_path / "src"), retain=4)
    delete_docs(spark, idx, spark.createDataFrame([(1,)], "doc_key long"), ["doc_key"])
    s_del = load_manifest(idx).opstamp
    before = _hits(spark, idx, "text:spark OR text:window")
    assert purge_deletes(spark, idx)

    _, _, paths = export_file_list(idx, opstamp=s_del)
    assert "term_stats.parquet" not in paths
    clone = str(tmp_path / "clone")
    export_index(idx, clone, opstamp=s_del)
    assert not os.path.exists(os.path.join(clone, "term_stats.parquet"))
    assert _hits(spark, clone, "text:spark OR text:window") == before
    # the CURRENT (post-purge) export keeps its paired stats
    cur = str(tmp_path / "cur")
    export_index(idx, cur)
    assert os.path.isdir(os.path.join(cur, "term_stats.parquet"))
    assert _hits(spark, cur, "text:spark OR text:window") == _hits(
        spark, idx, "text:spark OR text:window"
    )


def test_export_hardlink_survives_source_gc(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "src"), retain=2)
    want = _hits(spark, idx, "text:merge")
    clone = str(tmp_path / "clone")
    export_index(idx, clone, hardlink=True)
    seg = load_manifest(clone).segments[0].segment_id
    pq = os.path.join(clone, "segments", seg, "postings.parquet")
    assert os.stat(pq).st_nlink > 1  # actually linked, not copied
    # purge + retention drop + GC unlink the source's segment files
    delete_docs(spark, idx, spark.createDataFrame([(2,)], "doc_key long"), ["doc_key"])
    purge_deletes(spark, idx)
    set_snapshot_retention(idx, 0)
    garbage_collect(idx)
    assert _hits(spark, clone, "text:merge") == want


def test_export_refuses_nonempty_and_missing_snapshot(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "src"))
    tgt = tmp_path / "tgt"
    tgt.mkdir()
    (tgt / "junk").write_text("x")
    with pytest.raises(FileExistsError, match="not empty"):
        export_index(idx, str(tgt))
    with pytest.raises(FileNotFoundError, match="no retained snapshot"):
        export_index(idx, str(tmp_path / "t2"), opstamp=12345)


def test_cli_export(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "src"), retain=2)
    delete_docs(spark, idx, spark.createDataFrame([(0,)], "doc_key long"), ["doc_key"])
    clone = str(tmp_path / "clone")
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "export", "-p", idx,
         "--out", clone, "--hardlink"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"docs=5 segments=2 -> {clone}" in out.stdout
    assert _hits(spark, clone, "text:spark") == _hits(spark, idx, "text:spark")
    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "export", "-p", idx,
         "--out", clone],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "not empty" in bad.stderr


def test_export_refused_under_foreign_writer(spark, tmp_path):
    """A live foreign writer means the pinned file set could change mid
    copy — export fails fast instead of producing a torn clone."""
    import json
    import time

    from ostrich_spark.lock import LOCK_NAME, LockHeldError

    idx = _build(spark, str(tmp_path / "src"))
    with open(os.path.join(idx, LOCK_NAME), "w") as f:
        json.dump({"lock_id": "x", "owner": "other", "pid": os.getpid(),
                   "host": "elsewhere", "heartbeat_at": time.time()}, f)
    with pytest.raises(LockHeldError):
        export_index(idx, str(tmp_path / "clone"))
    os.unlink(os.path.join(idx, LOCK_NAME))
    export_index(idx, str(tmp_path / "clone"))  # lock released -> fine
