"""Index integrity checker (``ostrich check``) — EXTENSION.

The reference trusts its files (no fsck); an index that lives on a
shared object store and is produced by resumable multi-task builds
deserves one. Verifies, per committed manifest snapshot:

- every committed segment directory exists with postings/norms/docmap;
- docmap row count == the manifest's max_doc (one distributed count
  over ALL segments — never per-segment driver loops);
- norms cover exactly the same doc id range;
- postings structural invariants (parallel offset/metadata arrays,
  block_max_doc within [0, max_doc), doc_freq == block coverage) via
  JVM-side expressions — the packed blobs are NOT decoded;
- tombstones reference committed segments with in-range doc ids;
- term_stats/manifest opstamp pairing (stale stats = WARNING: the
  engine falls back to summing segment postings).

Returns a list of finding strings; empty == healthy. Findings are
prefixed ERROR/WARNING; the CLI exits 1 on any ERROR.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .manifest import load_manifest, segment_dir


def check_index(spark, index_dir: str) -> list[str]:
    from .deletes import read_tombstones
    from .query.exec import (
        _read_segment_files,
        _term_stats_valid,
        read_docmap,
        read_postings,
    )

    def read_norms(spark, index_dir, manifest):
        return _read_segment_files(
            spark, index_dir, manifest, "norms.parquet",
            "segment_id string, doc long, field int, length long",
        )

    findings: list[str] = []
    try:
        manifest = load_manifest(index_dir)
    except Exception as e:  # noqa: BLE001 - report, don't crash
        return [f"ERROR manifest unreadable: {e}"]
    expected = {s.segment_id: s.max_doc for s in manifest.segments}
    if not expected:
        return ["WARNING manifest has no segments"]

    for sid in expected:
        sdir = segment_dir(index_dir, sid)
        if not os.path.isdir(sdir):
            findings.append(f"ERROR segment dir missing: {sid}")
            continue
        for part in ("postings.parquet", "norms.parquet", "docmap.parquet"):
            if not os.path.exists(os.path.join(sdir, part)):
                findings.append(f"ERROR {sid}: {part} missing")
    if findings:
        return findings  # file-level damage: the scans below would fail

    # one distributed pass per table, never a per-segment loop
    dm_counts = {
        r["segment_id"]: (r["n"], r["lo"], r["hi"])
        for r in read_docmap(spark, index_dir, manifest)
        .groupBy("segment_id")
        .agg(F.count("*").alias("n"), F.min("doc").alias("lo"), F.max("doc").alias("hi"))
        .collect()
    }
    for sid, max_doc in expected.items():
        got = dm_counts.get(sid)
        if got is None:
            findings.append(f"ERROR {sid}: docmap empty")
        elif got != (max_doc, 0, max_doc - 1):
            findings.append(
                f"ERROR {sid}: docmap rows/range {got} != dense 0..{max_doc - 1}"
            )

    nm = {
        r["segment_id"]: (r["n_docs"], r["lo"], r["hi"])
        for r in read_norms(spark, index_dir, manifest)
        .groupBy("segment_id")
        .agg(
            F.countDistinct("doc").alias("n_docs"),
            F.min("doc").alias("lo"),
            F.max("doc").alias("hi"),
        )
        .collect()
    }
    for sid, max_doc in expected.items():
        got = nm.get(sid)
        if got is None:
            findings.append(f"ERROR {sid}: norms empty")
        elif got != (max_doc, 0, max_doc - 1):
            findings.append(
                f"ERROR {sid}: norms docs/range {got} != dense 0..{max_doc - 1}"
            )

    post = read_postings(spark, index_dir, manifest)
    bad_struct = (
        post.withColumn(
            "bad",
            (F.size("doc_offs") != F.size("block_max_doc"))
            | (F.size("tf_offs") != F.size("doc_offs"))
            | (F.size("len_offs") != F.size("doc_offs"))
            | (F.size("block_max_tf") != F.size("block_max_doc"))
            | (F.size("block_min_len") != F.size("block_max_doc"))
            | (F.array_min("block_max_doc") < 0),
        )
        .filter("bad")
        .groupBy("segment_id")
        .count()
        .collect()
    )
    for r in bad_struct:
        findings.append(
            f"ERROR {r['segment_id']}: {r['count']} posting rows with "
            "inconsistent block metadata"
        )
    exp_df = spark.createDataFrame(
        list(expected.items()), "segment_id string, max_doc long"
    )
    out_of_range = (
        post.join(F.broadcast(exp_df), "segment_id")
        .filter(F.array_max("block_max_doc") >= F.col("max_doc"))
        .groupBy("segment_id")
        .count()
        .collect()
    )
    for r in out_of_range:
        findings.append(
            f"ERROR {r['segment_id']}: {r['count']} posting rows reference "
            "docs >= max_doc"
        )

    tomb = read_tombstones(spark, index_dir)
    if tomb is not None:
        bad_tomb = (
            tomb.join(F.broadcast(exp_df), "segment_id", "left")
            .filter(
                F.col("max_doc").isNull()
                | (F.col("doc") < 0)
                | (F.col("doc") >= F.col("max_doc"))
            )
            .count()
        )
        if bad_tomb:
            findings.append(
                f"ERROR tombstones: {bad_tomb} rows reference unknown "
                "segments or out-of-range docs"
            )

    stats_path = os.path.join(index_dir, "term_stats.parquet")
    if os.path.exists(stats_path) and not _term_stats_valid(stats_path, manifest):
        findings.append(
            "WARNING term_stats opstamp unpaired with manifest "
            "(engine falls back to summing segment postings)"
        )

    # retained point-in-time snapshots: every referenced segment dir and
    # pinned tombstone version must still exist (GC and tombstone pruning
    # are supposed to keep them live — a miss means a broken as-of read)
    import json as _json

    from .deletes import _deletes_root
    from .manifest import list_snapshots

    for op, spath in list_snapshots(index_dir):
        try:
            with open(spath) as f:
                snap = _json.load(f)
        except (OSError, ValueError) as e:
            findings.append(f"ERROR snapshot {op} unreadable: {e}")
            continue
        if snap.get("opstamp") != op:
            findings.append(
                f"ERROR snapshot {op}: payload opstamp {snap.get('opstamp')} "
                "disagrees with its filename"
            )
        for s in snap.get("segments", []):
            if not os.path.isdir(segment_dir(index_dir, s["segment_id"])):
                findings.append(
                    f"ERROR snapshot {op}: segment {s['segment_id']} is gone "
                    "(point-in-time read at this opstamp would fail)"
                )
        tname = snap.get("tombstone_name")
        if tname and not os.path.isdir(os.path.join(_deletes_root(index_dir), tname)):
            findings.append(
                f"ERROR snapshot {op}: pinned tombstone version {tname} is "
                "gone (as-of read would resurrect deleted docs)"
            )

    from .lock import lock_info

    lk = lock_info(index_dir)
    if lk:
        import time as _time

        age = _time.time() - lk.get("heartbeat_at", 0)
        if age > 600:
            findings.append(
                f"WARNING stale write.lock: holder {lk.get('owner') or '?'} "
                f"pid {lk.get('pid')} last heartbeat {age:.0f}s ago "
                "(next writer will break it)"
            )
    return findings
