"""Index integrity checker (EXTENSION — the reference has no fsck)."""

import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.check import check_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.schema import Schema


def _docs(n=18):
    return [{"k": i, "content": f"alpha beta doc{i}"} for i in range(n)]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    return s


@pytest.fixture()
def idx(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(_docs())), _schema(), path,
        num_partitions=3, order_col="k", id_cols=["k"],
    )
    return path


def test_healthy_index_passes(spark, idx):
    assert check_index(spark, idx) == []


def test_healthy_with_tombstones_passes(spark, idx):
    delete_docs(spark, idx, spark.createDataFrame([(1,), (5,)], "k long"), ["k"])
    assert check_index(spark, idx) == []


def test_missing_docmap_detected(spark, idx):
    from ostrich_spark.manifest import load_manifest, segment_dir

    sid = load_manifest(idx).segments[0].segment_id
    target = os.path.join(segment_dir(idx, sid), "docmap.parquet")
    (shutil.rmtree if os.path.isdir(target) else os.remove)(target)
    findings = check_index(spark, idx)
    assert any("docmap.parquet missing" in f and sid in f for f in findings)


def test_missing_segment_dir_detected(spark, idx):
    from ostrich_spark.manifest import load_manifest, segment_dir

    sid = load_manifest(idx).segments[0].segment_id
    shutil.rmtree(segment_dir(idx, sid))
    findings = check_index(spark, idx)
    assert any("segment dir missing" in f and sid in f for f in findings)


def test_wrong_max_doc_detected(spark, idx):
    """A manifest lying about max_doc (e.g. a partial docmap write that
    slipped past the tmp+rename) is caught by the distributed count."""
    from ostrich_spark.manifest import load_manifest, save_manifest

    mf = load_manifest(idx)
    mf.segments[0].max_doc += 2
    save_manifest(idx, mf)
    from ostrich_spark.query.exec import invalidate_cache

    invalidate_cache(idx)
    findings = check_index(spark, idx)
    assert any("ERROR" in f and "docmap" in f for f in findings)


def test_stale_term_stats_is_warning(spark, idx):
    meta = os.path.join(idx, "term_stats.parquet", "_STATS_META.json")
    with open(meta) as f:
        d = json.load(f)
    d["opstamp"] = 999
    with open(meta, "w") as f:
        json.dump(d, f)
    findings = check_index(spark, idx)
    assert findings and all(f.startswith("WARNING") for f in findings)
    assert any("term_stats" in f for f in findings)


def test_cli_check(idx):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "check", "-p", idx],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "check: 0 errors" in out.stdout


def test_fully_deleted_segment_purges_to_nothing(spark, idx):
    """Deleting EVERY doc of a segment then purging must not commit an
    empty segment — the manifest shrinks and fsck stays clean."""
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.merge import purge_deletes
    from ostrich_spark.query.exec import attach_docmap, search

    mf = load_manifest(idx)
    n_seg_before = len(mf.segments)
    # segment with k in range: docmap keys of one whole segment
    victim_sid = mf.segments[0].segment_id
    dm = spark.read.parquet(f"{idx}/segments/{victim_sid}/docmap.parquet")
    victims_set = {r["k"] for r in dm.select("k").collect()}
    victims = spark.createDataFrame([(k,) for k in victims_set], "k long")
    assert delete_docs(spark, idx, victims, ["k"]) == mf.segments[0].max_doc
    created = purge_deletes(spark, idx)
    mf2 = load_manifest(idx)
    assert len(mf2.segments) == n_seg_before - 1
    assert all(s.max_doc > 0 for s in mf2.segments)
    assert created == []  # the empty purge result was not committed
    assert check_index(spark, idx) == []
    res, cnt = search(spark, idx, "content:alpha", limit=None, with_count=True)
    ks = sorted(r["k"] for r in attach_docmap(spark, idx, res).select("k").collect())
    assert ks == sorted(set(range(18)) - victims_set)


def test_snapshot_findings(spark, tmp_path):
    """fsck validates retained snapshots: missing segment dirs and pruned
    pinned tombstone versions are ERRORs; a healthy snapshotted index
    stays clean."""
    from ostrich_spark.manifest import (
        list_snapshots,
        load_manifest,
        set_snapshot_retention,
    )

    path = str(tmp_path / "snapidx")
    set_snapshot_retention(path, 3)
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(_docs())), _schema(), path,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    delete_docs(spark, path, spark.createDataFrame([(1,)], "k long"), ["k"])
    assert check_index(spark, path) == []

    s0 = [op for op, _ in list_snapshots(path)][0]
    # vandalize: remove a snapshot-referenced tombstone version + segment
    snap_path = dict(list_snapshots(path))
    with open(snap_path[load_manifest(path).opstamp]) as f:
        pinned = json.load(f)["tombstone_name"]
    shutil.rmtree(os.path.join(path, "deletes", pinned))
    findings = check_index(spark, path)
    assert any("pinned tombstone version" in x and x.startswith("ERROR") for x in findings)

    # payload/filename opstamp disagreement
    p0 = snap_path[s0]
    with open(p0) as f:
        d = json.load(f)
    d["opstamp"] = 999
    with open(p0, "w") as f:
        json.dump(d, f)
    findings = check_index(spark, path)
    assert any("disagrees with its filename" in x for x in findings)


def test_stale_lock_is_warning(spark, idx):
    import time as _time

    from ostrich_spark.lock import LOCK_NAME

    with open(os.path.join(idx, LOCK_NAME), "w") as f:
        json.dump({"owner": "dead-job", "pid": 1, "host": "x",
                   "heartbeat_at": _time.time() - 9999}, f)
    findings = check_index(spark, idx)
    assert any(x.startswith("WARNING stale write.lock") for x in findings)
    assert not any(x.startswith("ERROR") for x in findings)
