"""Document deletes: tombstones now, physical purge at merge.

The reference only sketches deletes (the `Delete` opstamp plumbing is
commented out at /root/reference/index/index_meta.go:55-59); this module
implements them for real with the standard LSM contract:

- ``delete_docs`` resolves user keys to (segment_id, local doc) pairs via
  the docmap and records them as TOMBSTONES — no segment file is touched.
  Visibility is immediate: every query path drops tombstoned docs before
  ranking/counting. Global stats (doc_freq, total_docs) intentionally
  stay UNCHANGED until a merge compacts the segments (Lucene semantics:
  deleted docs still count toward idf until they are purged).
- merge PURGES: deleted docs are dropped and the survivors' docIDs are
  densely remapped; stats and the term_stats table are recomputed for
  the new segment set (see merge.py).

Tombstone storage is a versioned Spark-written parquet dir plus a tiny
``CURRENT`` pointer json swapped atomically — the dir rewrite itself is
a distributed job (one union+distinct per delete batch, the same
read-modify-write Lucene applies to its live-docs bitsets), and a crash
at any point leaves the previous pointer valid.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np

from .lock import locked_writer
from .manifest import atomic_write_json, load_manifest, save_manifest

DELETES_DIR = "deletes"
CURRENT_NAME = "CURRENT"
TOMBSTONE_SCHEMA = "segment_id string, doc long"


def _deletes_root(index_dir: str) -> str:
    return os.path.join(index_dir, DELETES_DIR)


def _current_path(index_dir: str) -> str:
    return os.path.join(_deletes_root(index_dir), CURRENT_NAME)


def current_tombstone_name(index_dir: str) -> str | None:
    """Version-dir NAME in the CURRENT pointer, or None if no deletes
    (what snapshot manifests record for point-in-time pinning)."""
    cur = _current_path(index_dir)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = json.load(f)["dir"]
    return name if os.path.isdir(os.path.join(_deletes_root(index_dir), name)) else None


def current_tombstone_dir(index_dir: str) -> str | None:
    """Path of the live tombstone parquet dir, or None if no deletes."""
    name = current_tombstone_name(index_dir)
    return None if name is None else os.path.join(_deletes_root(index_dir), name)


def _tombstone_dir_for(index_dir: str, manifest) -> str | None:
    """CURRENT tombstones, unless ``manifest`` was loaded from a
    retained snapshot — then the version pinned at that commit (a later
    delete must not leak into a point-in-time view)."""
    pinned = getattr(manifest, "pinned_tombstone_dir", _UNPINNED)
    if pinned is _UNPINNED:
        return current_tombstone_dir(index_dir)
    if pinned is None:
        return None
    path = os.path.join(_deletes_root(index_dir), pinned)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"tombstone version {pinned!r} of this snapshot is gone from "
            f"{index_dir!r} — it aged out of snapshot retention"
        )
    return path


_UNPINNED = object()


def has_tombstones(index_dir: str, manifest=None) -> bool:
    return _tombstone_dir_for(index_dir, manifest) is not None


def read_tombstones(spark, index_dir: str, manifest=None):
    """(segment_id, doc) DataFrame of tombstoned docs, or None. Pass the
    ``manifest`` the query pinned: snapshot-loaded manifests resolve to
    their own tombstone version instead of CURRENT."""
    path = _tombstone_dir_for(index_dir, manifest)
    if path is None:
        return None
    return spark.read.schema(TOMBSTONE_SCHEMA).parquet(path)


def load_tombstone_map(index_dir: str) -> dict[str, np.ndarray]:
    """Driver-side load: {segment_id: sorted int64 array of deleted local
    docIDs}. Sized by the DELETE set, not the corpus — this is what merge
    broadcasts to remap survivors."""
    path = current_tombstone_dir(index_dir)
    if path is None:
        return {}
    import pyarrow.dataset as ds

    tbl = ds.dataset(path, format="parquet").to_table()
    out: dict[str, list] = {}
    for sid, doc in zip(
        tbl.column("segment_id").to_pylist(), tbl.column("doc").to_pylist()
    ):
        out.setdefault(sid, []).append(doc)
    return {sid: np.unique(np.asarray(v, dtype=np.int64)) for sid, v in out.items()}


def _write_tombstones(spark, index_dir: str, tomb_df, opstamp: int) -> None:
    """Write a new tombstone version dir and swap the CURRENT pointer."""
    root = _deletes_root(index_dir)
    os.makedirs(root, exist_ok=True)
    name = f"ts-{opstamp:08d}"
    out = os.path.join(root, name)
    shutil.rmtree(out, ignore_errors=True)
    (
        tomb_df.repartition(1)  # tombstone sets are small relative to the corpus;
        # bump for pathological delete volumes
        .sortWithinPartitions("segment_id", "doc")
        .write.mode("overwrite")
        .parquet(out)
    )
    atomic_write_json(_current_path(index_dir), {"dir": name, "opstamp": opstamp})
    # prune superseded versions — EXCEPT those a retained snapshot still
    # pins (point-in-time reads of that commit resolve deletes through
    # them; they fall away when their snapshot ages out)
    from .manifest import snapshot_tombstone_names

    keep = snapshot_tombstone_names(index_dir) | {name}
    for stale in glob.glob(os.path.join(root, "ts-*")):
        if os.path.basename(stale) not in keep:
            shutil.rmtree(stale, ignore_errors=True)


def clear_tombstones(index_dir: str) -> None:
    """No live deletes: drop the CURRENT pointer (and unpinned version
    dirs). Versions pinned by retained snapshots survive — a
    point-in-time read of a pre-purge commit still resolves its
    deletes through them."""
    from .manifest import snapshot_tombstone_names

    pinned = snapshot_tombstone_names(index_dir)
    root = _deletes_root(index_dir)
    if not pinned:
        shutil.rmtree(root, ignore_errors=True)
        return
    cur = _current_path(index_dir)
    if os.path.exists(cur):
        os.unlink(cur)
    for stale in glob.glob(os.path.join(root, "ts-*")):
        if os.path.basename(stale) not in pinned:
            shutil.rmtree(stale, ignore_errors=True)


def gc_tombstones(spark, index_dir: str, live_segment_ids: set[str], opstamp: int) -> None:
    """Drop tombstone rows for segments no longer in the manifest (their
    deletes were physically purged by a merge)."""
    from pyspark.sql import functions as F

    tomb = read_tombstones(spark, index_dir)
    if tomb is None:
        return
    remaining = tomb.filter(F.col("segment_id").isin(list(live_segment_ids)))
    if remaining.limit(1).count() == 0:
        clear_tombstones(index_dir)
        return
    _write_tombstones(spark, index_dir, remaining, opstamp)


def tombstone_count(index_dir: str, live_segment_ids: set[str] | None = None) -> int:
    """Driver-side count of active tombstones (optionally restricted to
    live segments) — metadata read, no cluster job."""
    path = current_tombstone_dir(index_dir)
    if path is None:
        return 0
    import pyarrow.dataset as ds

    d = ds.dataset(path, format="parquet")
    if live_segment_ids is None:
        return sum(f.count_rows() for f in d.get_fragments())
    expr = ds.field("segment_id").isin(sorted(live_segment_ids))
    return d.count_rows(filter=expr)


@locked_writer("delete")
def delete_docs(spark, index_dir: str, match_df, key_cols: list[str]) -> int:
    """Tombstone every indexed doc whose ``key_cols`` match a row of
    ``match_df`` (joined against the docmap — the identity columns the
    index was built with). Returns the number of NEW tombstones.

    One broadcast-or-shuffle join against the docmap + a distinct over
    the (small) tombstone set; no postings are rewritten. The commit is
    the atomic CURRENT pointer swap, then a manifest opstamp bump so
    cached readers invalidate."""
    from .query.exec import read_docmap

    manifest = load_manifest(index_dir)
    docmap = read_docmap(spark, index_dir, manifest)
    new_tomb = (
        docmap.join(match_df.select(*key_cols).distinct(), on=key_cols)
        .select("segment_id", "doc")
        .distinct()
    )
    return _commit_tombstones(spark, index_dir, manifest, new_tomb)


@locked_writer("delete")
def delete_by_query(
    spark,
    index_dir: str,
    query,
    default_fields: list[str] | None = None,
) -> int:
    """Tombstone every CURRENT match of ``query`` — the Elasticsearch
    ``_delete_by_query`` analog. ``query`` is an NQL string or a
    programmatic query tree; the match set is evaluated exhaustively
    against the live index (existing tombstones already excluded by the
    search path) and its (segment_id, doc) pairs join the tombstone set
    DIRECTLY — no identity-column round trip, so it works regardless of
    the index's id_cols. Same commit protocol as :func:`delete_docs`
    (atomic CURRENT swap, opstamp bump, cached-reader invalidation);
    global stats intentionally stay un-recomputed until a purge, the
    Lucene tombstone semantics every delete path here shares. Returns
    the number of NEW tombstones."""
    from .query.exec import search

    manifest = load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, manifest=manifest,
        default_fields=default_fields,
    )
    return _commit_tombstones(
        spark, index_dir, manifest, res.select("segment_id", "doc").distinct()
    )


def _commit_tombstones(spark, index_dir: str, manifest, new_tomb) -> int:
    """Union ``new_tomb`` (segment_id, doc) with the current tombstone
    set and commit: tombstone parquet under a fresh opstamp dir, atomic
    CURRENT pointer swap, manifest opstamp bump + reader invalidation.
    Returns how many tombstones are NEW (0 = nothing written)."""
    from .query.exec import invalidate_cache

    old = read_tombstones(spark, index_dir)
    if old is not None:
        combined = old.unionByName(new_tomb).distinct()
        n_old = old.count()
    else:
        combined = new_tomb
        n_old = 0
    combined = combined.cache()
    n_total = combined.count()
    if n_total == n_old:
        combined.unpersist()
        return 0
    opstamp = manifest.opstamp + 1
    _write_tombstones(spark, index_dir, combined, opstamp)
    combined.unpersist()
    manifest.opstamp = opstamp
    manifest.stats = dict(manifest.stats)
    manifest.stats["tombstones"] = n_total
    save_manifest(index_dir, manifest)
    invalidate_cache(index_dir)
    return n_total - n_old


@locked_writer("update")
def update_docs(
    spark,
    index_dir: str,
    docs_df,
    id_cols: list[str],
    build_id: str,
    num_partitions: int = 8,
    order_col: str | None = None,
    fail_after_partitions: int | None = None,
):
    """Upsert: tombstone every committed doc whose identity matches a
    row of ``docs_df``, then append the batch as new segments (Lucene
    ``updateDocument`` / Elasticsearch ``_update`` analog — EXTENSION,
    the reference's delete plumbing is commented out at
    /root/reference/index/index_meta.go:55-59). Identities not in the
    index insert cleanly (the delete joins nothing for them).

    Returns ``(n_tombstoned, manifest)``.

    Two commits, each individually atomic: (1) the tombstone pointer
    swap, (2) the append's manifest write. A crash between them leaves
    the victims hidden and the new batch absent — RERUNNING the same
    call is the recovery: the delete re-commits 0 new tombstones
    (idempotent) and the append resumes from its per-partition
    checkpoints under the same ``build_id``. A build_id that was
    already COMMITTED raises, same contract as build_index(mode=
    'append').

    The batch must carry one row per identity: a duplicated key inside
    one upsert has no defined last-writer, so it is rejected up front
    (one aggregation job) instead of silently indexing both rows.
    """
    from .build import build_index

    manifest = load_manifest(index_dir)
    schema = manifest.schema
    dup = (
        docs_df.groupBy(*id_cols).count().filter("count > 1").limit(1).collect()
    )
    if dup:
        key = {c: dup[0][c] for c in id_cols}
        raise ValueError(
            f"update_docs batch contains duplicate identity {key}; "
            "deduplicate the batch before upserting"
        )
    n_tomb = delete_docs(spark, index_dir, docs_df.select(*id_cols), id_cols)
    mf = build_index(
        spark,
        docs_df,
        schema,
        index_dir,
        num_partitions=num_partitions,
        order_col=order_col,
        id_cols=id_cols,
        build_id=build_id,
        mode="append",
        fail_after_partitions=fail_after_partitions,
    )
    return n_tomb, mf


@locked_writer("update")
def update_by_query(
    spark,
    index_dir: str,
    query,
    set_exprs: dict[str, str],
    build_id: str,
    default_fields: list[str] | None = None,
    num_partitions: int = 8,
    order_col: str | None = None,
):
    """Rewrite every CURRENT match of ``query`` through ``set_exprs`` and
    upsert the results — the Elasticsearch ``_update_by_query`` (with
    ``script``) analog. ES updates a doc by reindexing its ``_source``
    after the script ran; here the "source" is reconstructed from the
    docmap (the same requirement as :func:`ostrich_spark.build.reindex`:
    every text field must have been indexed with ``store=True`` — the
    ``_source``-enabled precondition ES has too), ``set_exprs`` maps
    build-input column names to Spark SQL expressions evaluated over the
    reconstructed row (``{"views": "views + 1", "text": "upper(text)"}``
    — the ``ctx._source.x = ...`` script shapes), and :func:`update_docs`
    tombstones the old versions and appends the rewritten batch as new
    segments. ``set_exprs={}`` reindexes matches unchanged (the
    ES script-less ``_update_by_query``: pick up analyzer/pipeline
    changes in place).

    Contracts kept from ES:
      - identity columns may NOT be updated (ES forbids ``ctx._id``
        mutation in ``_update_by_query``) — rejected up front;
      - an unknown target column is an error, not a silent new field;
      - matches are evaluated ONCE against the live index (tombstoned
        docs excluded); docs written between the match scan and the
        upsert commit are not seen — the snapshot-then-write model ES
        documents (its version-conflict counting is moot here: the
        directory write lock serializes writers).

    Doc-value reconstruction details: keyword fields re-enter through
    their already-normalized stored form (lowercase is idempotent), date
    fields through their epoch-micros longs (the build's documented
    round-trip dtype), geo fields re-serialize ``__lat``/``__lon`` into
    the canonical ``"lat,lon"`` input string (Java shortest-round-trip
    double formatting, exact on re-parse).

    Returns ``(n_updated, manifest)`` — n_updated counts matched (and
    therefore rewritten) docs; 0 leaves the index untouched.

    Scale posture: the match set rides the normal pruned search, the
    docmap join is one co-keyed inner join, reconstruction and
    ``set_exprs`` are Catalyst columns, and the append is the standard
    shuffle-free build — no driver materialization of documents.
    """
    from pyspark.sql import functions as F

    from .query.exec import read_docmap, search
    from .schema import geo_lat_col, geo_lon_col

    manifest = load_manifest(index_dir)
    schema = manifest.schema
    docmap = read_docmap(spark, index_dir, manifest)
    cols = set(docmap.schema.names)

    # identity inference — build.reindex's rule: everything that is not
    # engine bookkeeping, a stored field, or a doc-value column
    stored = {
        fe.name for fe in schema.fields if not fe.is_doc_value and fe.store
    }
    docvals: set[str] = set()
    for fe in schema.fields:
        if fe.is_geo:
            docvals |= {geo_lat_col(fe.name), geo_lon_col(fe.name)}
        elif fe.is_doc_value:
            docvals.add(fe.name)
    bookkeeping = {"segment_id", "doc", "content_sha256"}
    id_cols = [
        c
        for c in docmap.schema.names
        if c not in bookkeeping and c not in stored and c not in docvals
    ]
    if not id_cols:
        raise ValueError(
            "update_by_query needs identity columns in the docmap "
            "(index was built without id_cols)"
        )

    # reconstruct every build-input column from what the docmap kept
    recon: dict[str, object] = {c: F.col(c) for c in id_cols}
    for fe in schema.fields:
        ic = fe.input_col
        if ic in recon:
            continue
        if ic in cols:
            recon[ic] = F.col(ic)
        elif fe.is_geo and geo_lat_col(fe.name) in cols:
            lat = F.col(geo_lat_col(fe.name))
            recon[ic] = F.when(
                lat.isNotNull(),
                F.concat_ws(
                    ",", lat.cast("string"),
                    F.col(geo_lon_col(fe.name)).cast("string"),
                ),
            )
        elif fe.is_doc_value and fe.name in cols:
            # multi-field whose source column wasn't kept: the typed
            # doc value IS the (normalized) source
            recon[ic] = F.col(fe.name)
        else:
            raise ValueError(
                f"update_by_query: field {fe.name!r} (input column "
                f"{ic!r}) cannot be reconstructed from the docmap — "
                "text fields must have been indexed with store=True "
                "(the _source requirement of ES _update_by_query)"
            )
    for k in set_exprs:
        if k in id_cols:
            raise ValueError(
                f"update_by_query may not modify identity column {k!r} "
                "(the ES ctx._id rule); use delete + index instead"
            )
        if k not in recon:
            raise ValueError(
                f"update_by_query target {k!r} is not a build-input "
                f"column of this index (have: {sorted(recon)})"
            )

    res, _ = search(
        spark, index_dir, query, limit=None, manifest=manifest,
        default_fields=default_fields,
    )
    keys = res.select("segment_id", "doc").distinct()
    corpus = docmap.join(keys, ["segment_id", "doc"], "inner").select(
        *[v.alias(k) for k, v in recon.items()]
    )
    n_matched = corpus.count()
    if n_matched == 0:
        return 0, manifest
    for k, v in set_exprs.items():
        corpus = corpus.withColumn(k, F.expr(v))
    _, mf = update_docs(
        spark,
        index_dir,
        corpus,
        id_cols,
        build_id,
        num_partitions=num_partitions,
        order_col=order_col or id_cols[0],
    )
    return n_matched, mf
