"""Log-structured segment merging — compaction plane.

Policy (driver-side, pure Python over manifest stats) reproduces
/root/reference/indexer/log_merge_policy.go:34-78 LITERALLY, including its
divergence from Lucene: levels compare raw clipped doc counts against
``curMax - levelLogSize`` — NOT their logarithms (despite the name).
Constants: levelLogSize=0.75, minLayerSize=10_000,
minNumSegmentsToMerge=8, maxDocsBeforeMerge=10_000_000
(log_merge_policy.go:10-14). The reference's sort is unstable Go
sort.Slice; we pin (doc_num desc, segment_id asc) to make planning
deterministic.

Merge execution re-expresses IndexMerger (/root/reference/indexer/merger.go:39-104)
Spark-first:

- new docID space = concatenation of segment doc ranges in SegmentOrd
  order (merger.go:93-104) -> a broadcast offset map, no shuffle.
- SKEW HANDLING (north rule): posting lists may span multiple doc-range
  sharded rows, so a giant term ("the"-like in code corpora) NEVER forces
  a single-task reduce. Terms whose combined doc_freq exceeds
  ``shard_threshold`` take a MAP-ONLY path: each source row is patched
  (docIDs offset — only block heads change, thanks to per-block absolute
  heads) and kept as its own shard, with a monotone row_ord. Small terms
  take the normal groupBy(field, term) merge into one row. This replaces
  explicit salting with a strictly better property: the per-term reduce
  disappears entirely for skewed keys.
- norms/docmap are offset map-side and rewritten.
- manifest swap is atomic; superseded segment dirs are GC'd
  (segment_updater.go:106-150, managed_directory.go:97-134).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterable

import numpy as np
import pandas as pd

from .codec import (
    BLOCK_SIZE,
    block_metadata,
    pack_blocked,
    pack_pos_doc_aligned,
    unpack_blocked,
)
from .lock import locked_writer
from .manifest import (
    FRAGMENT_NAME,
    Manifest,
    SegmentMeta,
    garbage_collect,
    load_manifest,
    save_manifest,
    segment_dir,
)

LEVEL_LOG_SIZE = 0.75
MIN_LAYER_SIZE = 10_000
MIN_NUM_SEGMENTS_TO_MERGE = 8
MAX_DOCS_BEFORE_MERGE = 10_000_000

POSTINGS_RESULT_SCHEMA = (
    "segment_id string, field int, term string, row_ord long, doc_freq long, "
    "total_tf long, docs binary, tfs binary, lens binary, "
    "doc_offs array<long>, tf_offs array<long>, len_offs array<long>, "
    "block_max_doc array<long>, block_max_tf array<long>, block_min_len array<long>, "
    "pos binary, pos_offs array<long>"
)


def _row_pos(row) -> tuple[bytes, list[int]]:
    """Positions blob of a posting row; tolerates pre-positions segments
    (column absent -> spark fills null)."""
    p = row.get("pos")
    if p is None or (isinstance(p, float)):  # NaN from a null column
        return b"", []
    offs = row.get("pos_offs")
    return bytes(p), [int(x) for x in offs] if offs is not None else []


def compute_merge_candidates(
    segments: Iterable[tuple[str, int]],
    min_num_segments: int = MIN_NUM_SEGMENTS_TO_MERGE,
    max_docs_before_merge: int = MAX_DOCS_BEFORE_MERGE,
    min_layer_size: int = MIN_LAYER_SIZE,
    level_log_size: float = LEVEL_LOG_SIZE,
) -> list[list[str]]:
    """segments: (segment_id, doc_num) pairs -> lists of segment_ids to merge.

    Literal port of the reference algorithm's observable behavior."""
    seg_list = list(segments)
    if not seg_list:
        return []
    cands = [(sid, n) for sid, n in seg_list if n < max_docs_before_merge]
    cands.sort(key=lambda t: (-t[1], t[0]))

    cur_max = float("inf")
    levels: dict[float, list[str]] = {}
    order: list[float] = []
    for sid, n in cands:
        size = float(max(n, min_layer_size))  # clipMinSize
        if size < cur_max - level_log_size:
            cur_max = size
        if cur_max not in levels:
            levels[cur_max] = []
            order.append(cur_max)
        levels[cur_max].append(sid)

    return [levels[k] for k in order if len(levels[k]) >= min_num_segments]


def _bytes_or_empty(p) -> bytes:
    return b"" if p is None or isinstance(p, float) else bytes(p)


def _patch_rows_columnar(pdf: pd.DataFrame, new_sid: str) -> pd.DataFrame:
    """Patch EVERY (tombstone-free) posting row of a partition in one
    columnar pass (r2 verdict item #6 — replaces the per-row
    iterrows/_patch_row loop).

    Because each block stores its head absolute and the rest as deltas
    (codec.pack_blocked), adding the segment offset touches ONLY the
    block-head values. Varints are self-delimiting, so ALL rows' docs
    buffers concatenate into one _varint_decode call; head positions are
    computed vectorized from doc_freq, patched in place, and the whole
    partition re-encodes in one _varint_encode pass. Per-row byte spans
    and per-block offsets fall out of the per-value byte lengths. The
    only remaining per-row Python is O(n_rows) buffer slicing."""
    from .codec import _varint_decode, _varint_encode_with_lengths

    n_rows = len(pdf)
    doc_freqs = pdf["doc_freq"].to_numpy(dtype=np.int64)
    seg_offs = pdf["seg_off"].to_numpy(dtype=np.int64)
    bufs = [bytes(b) for b in pdf["docs"]]
    raw = _varint_decode(b"".join(bufs))
    if len(raw) != int(doc_freqs.sum()):
        raise RuntimeError(
            f"postings corruption: decoded {len(raw)} varints, "
            f"doc_freq sum {int(doc_freqs.sum())}"
        )
    row_val_starts = np.concatenate(([0], np.cumsum(doc_freqs)[:-1]))
    nblocks = -(-doc_freqs // BLOCK_SIZE)  # ceil
    block_row = np.repeat(np.arange(n_rows), nblocks)
    block_ord = np.arange(int(nblocks.sum())) - np.repeat(
        np.concatenate(([0], np.cumsum(nblocks)[:-1])), nblocks
    )
    head_idx = row_val_starts[block_row] + block_ord * BLOCK_SIZE
    raw[head_idx] += seg_offs[block_row].astype(np.uint64)

    enc, nbytes = _varint_encode_with_lengths(raw)
    val_starts = np.cumsum(nbytes) - nbytes
    row_byte_starts = val_starts[row_val_starts]
    row_byte_ends = np.concatenate((row_byte_starts[1:], [len(enc)]))
    head_bytes = val_starts[head_idx] - row_byte_starts[block_row]
    doc_offs_per_row = np.split(head_bytes, np.cumsum(nblocks)[:-1])
    first_docs = raw[row_val_starts].astype(np.int64)

    has_pos = "pos" in pdf.columns
    return pd.DataFrame(
        {
            "segment_id": new_sid,
            "field": pdf["field"].to_numpy(dtype=np.int32),
            "term": pdf["term"].to_numpy(),
            # row_ord := the shard's FIRST new docID — unique (doc ranges
            # are disjoint) and monotone with doc order for ANY merge depth
            "row_ord": first_docs,
            "doc_freq": doc_freqs,
            "total_tf": pdf["total_tf"].to_numpy(dtype=np.int64),
            "docs": [
                enc[s:e] for s, e in zip(row_byte_starts, row_byte_ends)
            ],
            "tfs": [bytes(b) for b in pdf["tfs"]],
            "lens": [bytes(b) for b in pdf["lens"]],
            "doc_offs": [o.tolist() for o in doc_offs_per_row],
            "tf_offs": [[int(x) for x in o] for o in pdf["tf_offs"]],
            "len_offs": [[int(x) for x in o] for o in pdf["len_offs"]],
            "block_max_doc": [
                (np.asarray(b, dtype=np.int64) + o).tolist()
                for b, o in zip(pdf["block_max_doc"], seg_offs)
            ],
            "block_max_tf": [[int(x) for x in o] for o in pdf["block_max_tf"]],
            "block_min_len": [[int(x) for x in o] for o in pdf["block_min_len"]],
            # within-doc positions are docID-offset-invariant
            "pos": [_bytes_or_empty(p) for p in pdf["pos"]]
            if has_pos
            else [b"" for _ in range(n_rows)],
            "pos_offs": [
                [] if o is None or isinstance(o, float) else [int(x) for x in o]
                for o in pdf["pos_offs"]
            ]
            if has_pos
            else [[] for _ in range(n_rows)],
        }
    )


def _decode_row_full(row: pd.Series):
    """(docs, tfs, lens, pos) of one posting row, fully decoded."""
    n = int(row["doc_freq"])
    d, _ = unpack_blocked(bytes(row["docs"]), list(row["doc_offs"]), n, delta=True)
    t, _ = unpack_blocked(bytes(row["tfs"]), list(row["tf_offs"]), n, delta=False)
    ln, _ = unpack_blocked(bytes(row["lens"]), list(row["len_offs"]), n, delta=False)
    pb, po = _row_pos(row)
    p, _ = unpack_blocked(pb, po, int(row["total_tf"]), delta=False)
    return d, t, ln, p


def _purge_and_remap(d, t, ln, p, dels: np.ndarray | None, offset: int):
    """Drop tombstoned docs, densify surviving docIDs, apply the segment
    offset. new_doc = old_doc - (#deleted below it) + offset; the
    positions flat array drops the deleted docs' occurrence spans."""
    if dels is not None and len(dels):
        keep = ~np.isin(d, dels)
        if len(p):
            p = p[np.repeat(keep, t)]
        d, t, ln = d[keep], t[keep], ln[keep]
        if not len(d):
            return d, t, ln, p
        d = d - np.searchsorted(dels, d, side="left")
    return d + offset, t, ln, p


def _pack_full_row(sid, field, term, row_ord, d, t, ln, p) -> dict:
    docs_b, doc_offs = pack_blocked(d, delta=True)
    tfs_b, tf_offs = pack_blocked(t, delta=False)
    lens_b, len_offs = pack_blocked(ln, delta=False)
    # repacked rows keep the doc-aligned position layout (see
    # codec.pack_pos_doc_aligned) so a merge never downgrades
    # phrase/near block-subset decode
    pos_b, pos_offs = pack_pos_doc_aligned(p, t)
    bmd, bmt, bml = block_metadata(d, t, ln)
    return {
        "segment_id": sid,
        "field": int(field),
        "term": term,
        "row_ord": int(row_ord),
        "doc_freq": int(len(d)),
        "total_tf": int(t.sum()),
        "docs": docs_b,
        "tfs": tfs_b,
        "lens": lens_b,
        "doc_offs": [int(x) for x in doc_offs],
        "tf_offs": [int(x) for x in tf_offs],
        "len_offs": [int(x) for x in len_offs],
        "block_max_doc": bmd,
        "block_max_tf": bmt,
        "block_min_len": bml,
        "pos": pos_b,
        "pos_offs": [int(x) for x in pos_offs],
    }


def merge_segments(
    spark,
    index_dir: str,
    segment_ids: list[str],
    new_segment_id: str,
    shard_threshold: int = 1_000_000,
    write_partitions: int | None = None,
) -> SegmentMeta:
    """Execute one merge: candidate segments -> one new segment.

    ``shard_threshold``: terms whose TOTAL df across the sources exceeds
    this stay as doc-range shards patched map-only; smaller terms take
    the per-term groupBy merge. Measured on interleaved exclusive pairs
    (BENCH/SCALE_LADDER.md): at both 960k docs (58.1k vs 31.4k docs/sec)
    and 3.84M docs (50.7k vs 34.1k) the 1M threshold beats 100k —
    over-sharding adds per-shard row overhead faster than it removes
    reducer tail latency, so only genuinely skewed heads (df > 1M, which
    NO single reducer should decode) leave the groupBy path."""
    from pyspark.sql import functions as F

    manifest = load_manifest(index_dir)
    by_id = {s.segment_id: s for s in manifest.segments}

    # Fully-committed rerun: the merge result is already in the manifest
    # and the sources are gone (an orchestrator retry after success, or a
    # crash between save_manifest and GC). Swapping again would append the
    # new segment a second time — the manifest would list it twice and
    # every read would double doc_freq/counts. No-op instead.
    committed = {s.segment_id for s in manifest.segments}
    if new_segment_id in committed and not (committed & set(segment_ids)):
        return by_id[new_segment_id]

    # Idempotent resume: if a previous run crashed between the segment
    # rename and the manifest save, the completed new_dir already exists
    # (fragment.json is written before the rename) — skip the rebuild and
    # jump straight to the manifest swap; a blind rerun would otherwise
    # fail on os.rename into the non-empty directory.
    new_dir = segment_dir(index_dir, new_segment_id)
    frag_path = os.path.join(new_dir, FRAGMENT_NAME)
    if os.path.exists(frag_path):
        with open(frag_path) as f:
            prior_frag = json.load(f)
        if prior_frag.get("lineage", {}).get("merged_from") == list(segment_ids):
            return _swap_manifest(
                index_dir, manifest, segment_ids, new_segment_id,
                prior_frag["max_doc"], prior_frag["lineage"], prior_frag["metrics"],
                spark=spark, purge=prior_frag.get("purge"),
            )
        raise RuntimeError(
            f"segment dir {new_dir} exists from a DIFFERENT merge "
            f"({prior_frag.get('lineage', {}).get('merged_from')}); refusing to overwrite"
        )

    # tombstones of the source segments: merge is where deletes become
    # physical — survivors are densified, deleted docs vanish
    from .deletes import load_tombstone_map

    dmap_all = load_tombstone_map(index_dir)
    dmap = {sid: dmap_all[sid] for sid in segment_ids if sid in dmap_all}

    # offsets in SegmentOrd order restricted to the candidates, over the
    # KEPT (post-purge) doc counts
    ordered = [s for s in manifest.sorted_segments() if s.segment_id in set(segment_ids)]
    offsets: dict[str, int] = {}
    off = 0
    for s in ordered:
        offsets[s.segment_id] = off
        off += s.max_doc - len(dmap.get(s.segment_id, ()))
    total_docs = off

    paths = [segment_dir(index_dir, sid) for sid in segment_ids]
    postings = spark.read.parquet(*[f"{p}/postings.parquet" for p in paths])
    norms = spark.read.parquet(*[f"{p}/norms.parquet" for p in paths])
    docmap = spark.read.parquet(*[f"{p}/docmap.parquet" for p in paths])

    # token stats of the docs being purged (for manifest avgdl bookkeeping)
    purge_ctx = None
    if dmap:
        from .deletes import read_tombstones

        tomb_src = read_tombstones(spark, index_dir).filter(
            F.col("segment_id").isin(list(dmap))
        )
        del_rows = (
            norms.join(tomb_src, ["segment_id", "doc"])
            .groupBy("field")
            .agg(F.sum("length").alias("n"))
            .collect()
        )
        purge_ctx = {
            "deleted_docs": int(sum(len(v) for v in dmap.values())),
            "deleted_field_tokens": {str(r["field"]): int(r["n"]) for r in del_rows},
        }
        purge_ctx["deleted_tokens"] = sum(purge_ctx["deleted_field_tokens"].values())

    off_df = spark.createDataFrame(
        [(sid, o) for sid, o in offsets.items()], "segment_id string, seg_off long"
    )

    # --- postings -------------------------------------------------------
    # split big (map-only shard patch) vs small (group merge) terms
    df_stats = (
        postings.groupBy("field", "term")
        .agg(F.sum("doc_freq").alias("df"))
        .filter(F.col("df") > shard_threshold)
        .select("field", "term")
        .collect()
    )
    big_terms = {(r["field"], r["term"]) for r in df_stats}
    new_sid = new_segment_id

    with_off = postings.join(F.broadcast(off_df), "segment_id")

    def patch_partition(it):
        for pdf in it:
            if not len(pdf):
                continue
            # rows whose source segment carries tombstones need the full
            # decode -> purge -> repack rewrite (per row, the exception);
            # every other row is patched COLUMNAR in one varint pass over
            # the whole partition (_patch_rows_columnar)
            if dmap:
                has_del = np.array(
                    [len(dmap.get(s, ())) > 0 for s in pdf["segment_id"]],
                    dtype=bool,
                )
            else:
                has_del = np.zeros(len(pdf), dtype=bool)
            # refine per ROW (r3 verdict trim): a row of a tombstoned
            # segment needs the decode->purge->repack rewrite only when
            # a deleted doc falls INSIDE its docID range. Range test is
            # decode-free: max = last block_max_doc; min = the FIRST
            # varint of the docs buffer (block 0's head is absolute).
            # Clear rows ride the columnar patch with seg_off reduced by
            # the count of deletions BELOW the row (the densify shift is
            # constant across the row when no deletion lands inside it).
            off_adj = np.zeros(len(pdf), dtype=np.int64)
            if has_del.any():
                from .codec import first_value

                for j in np.flatnonzero(has_del):
                    row = pdf.iloc[j]
                    dels = dmap.get(row["segment_id"])
                    bmd = row["block_max_doc"]
                    if bmd is None or not len(bmd):
                        continue
                    mn = first_value(row["docs"])
                    below = int(np.searchsorted(dels, mn, side="left"))
                    inside = (
                        int(np.searchsorted(dels, int(bmd[-1]), side="right"))
                        - below
                    )
                    if inside == 0:
                        has_del[j] = False
                        off_adj[j] = below
            frames = []
            clean = pdf[~has_del]
            if len(clean):
                adj = off_adj[~has_del]
                if adj.any():
                    clean = clean.copy()
                    clean["seg_off"] = (
                        clean["seg_off"].to_numpy(dtype=np.int64) - adj
                    )
                frames.append(_patch_rows_columnar(clean, new_sid))
            out = []
            for _, row in pdf[has_del].iterrows():
                dels = dmap.get(row["segment_id"])
                d, t, ln, p = _decode_row_full(row)
                d, t, ln, p = _purge_and_remap(d, t, ln, p, dels, int(row["seg_off"]))
                if not len(d):
                    continue  # every doc of the shard was deleted
                out.append(
                    _pack_full_row(
                        new_sid, row["field"], row["term"], int(d[0]), d, t, ln, p
                    )
                )
            if out:
                frames.append(pd.DataFrame(out))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["seg_off", "row_ord"])
        docs_parts, tfs_parts, lens_parts, pos_parts = [], [], [], []
        for _, row in pdf.iterrows():
            d, t, ln, p = _decode_row_full(row)
            d, t, ln, p = _purge_and_remap(
                d, t, ln, p, dmap.get(row["segment_id"]), int(row["seg_off"])
            )
            if not len(d):
                continue
            docs_parts.append(d)
            tfs_parts.append(t)
            lens_parts.append(ln)
            pos_parts.append(p)
        if not docs_parts:
            # the whole posting list was deleted
            return pd.DataFrame(
                [], columns=[f.split()[0] for f in POSTINGS_RESULT_SCHEMA.split(", ")]
            ).astype({"field": "int32"}, errors="ignore")
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tfs_parts)
        lens = np.concatenate(lens_parts)
        # positions concatenate in the same (seg, doc) order as docs —
        # doc-major flat layout is preserved because doc ranges are
        # disjoint and already ordered by seg_off
        pos_all = np.concatenate(pos_parts) if pos_parts else np.empty(0, dtype=np.int64)
        docs_b, doc_offs = pack_blocked(docs, delta=True)
        tfs_b, tf_offs = pack_blocked(tfs, delta=False)
        lens_b, len_offs = pack_blocked(lens, delta=False)
        # doc-aligned position layout preserved across merges
        pos_b, pos_offs = pack_pos_doc_aligned(pos_all, tfs)
        bmd, bmt, bml = block_metadata(docs, tfs, lens)
        return pd.DataFrame(
            [
                {
                    "segment_id": new_sid,
                    "field": int(pdf["field"].iloc[0]),
                    "term": pdf["term"].iloc[0],
                    "row_ord": 0,
                    "doc_freq": int(len(docs)),
                    "total_tf": int(tfs.sum()),
                    "docs": docs_b,
                    "tfs": tfs_b,
                    "lens": lens_b,
                    "doc_offs": [int(x) for x in doc_offs],
                    "tf_offs": [int(x) for x in tf_offs],
                    "len_offs": [int(x) for x in len_offs],
                    "block_max_doc": bmd,
                    "block_max_tf": bmt,
                    "block_min_len": bml,
                    "pos": pos_b,
                    "pos_offs": [int(x) for x in pos_offs],
                }
            ]
        )

    if big_terms:
        key = F.concat_ws("\x00", F.col("field").cast("string"), F.col("term"))
        big_pred = key.isin([f"{f}\x00{t}" for f, t in big_terms])
        big_df = with_off.filter(big_pred).mapInPandas(patch_partition, POSTINGS_RESULT_SCHEMA)
        small_df = (
            with_off.filter(~big_pred)
            .groupBy("field", "term")
            .applyInPandas(merge_group, POSTINGS_RESULT_SCHEMA)
        )
        merged_postings = small_df.unionByName(big_df)
    else:
        merged_postings = with_off.groupBy("field", "term").applyInPandas(
            merge_group, POSTINGS_RESULT_SCHEMA
        )

    new_dir = segment_dir(index_dir, new_segment_id)
    tmp_dir = f"{new_dir}.merging"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    # Multi-task segment write: range-partition on (field, term) so the
    # merged postings write scales with segment size instead of funneling
    # a multi-GB segment through one task (a policy-sized merge is
    # 8×10M docs). Files stay (field, term)-sorted, so parquet row-group
    # stats still prune term lookups per file; readers tolerate
    # multi-file segments (row_ord orders shards within a term).
    if write_partitions is None:
        write_partitions = max(1, min(64, total_docs // 250_000 + 1))
    (
        merged_postings.repartitionByRange(write_partitions, "field", "term", "row_ord")
        .sortWithinPartitions("field", "term", "row_ord")
        .write.mode("overwrite")
        .parquet(f"{tmp_dir}/postings.parquet")
    )

    # --- norms / docmap: map-side offset (+ purge remap when tombstoned) -
    def _offset_or_remap(df):
        if not dmap:
            return (
                df.join(F.broadcast(off_df), "segment_id")
                .withColumn("doc", F.col("doc") + F.col("seg_off"))
                .withColumn("segment_id", F.lit(new_segment_id))
                .drop("seg_off")
            )
        # purge path: drop tombstoned docs and densify — needs the sorted
        # delete array per segment (searchsorted remap), shipped in the
        # task closure; sized by the DELETE set, not the corpus
        out_schema = df.schema
        local_dmap = {k: v.copy() for k, v in dmap.items()}
        local_offsets = dict(offsets)
        nsid = new_segment_id

        def remap(it):
            for pdf in it:
                if not len(pdf):
                    continue
                parts = []
                for sid, grp in pdf.groupby("segment_id", sort=False):
                    dels = local_dmap.get(sid)
                    docs = grp["doc"].to_numpy(dtype=np.int64)
                    if dels is not None and len(dels):
                        keep = ~np.isin(docs, dels)
                        grp = grp.iloc[keep]
                        docs = docs[keep]
                        if not len(docs):
                            continue
                        docs = docs - np.searchsorted(dels, docs, side="left")
                    g = grp.copy()
                    g["doc"] = docs + local_offsets[sid]
                    g["segment_id"] = nsid
                    parts.append(g)
                if parts:
                    yield pd.concat(parts, ignore_index=True)

        return df.mapInPandas(remap, out_schema)

    _offset_or_remap(norms).write.mode("overwrite").parquet(f"{tmp_dir}/norms.parquet")
    _offset_or_remap(docmap).write.mode("overwrite").parquet(f"{tmp_dir}/docmap.parquet")

    # merged fragment: aggregate lineage + metrics of the sources
    src_metas = [by_id[sid] for sid in segment_ids]
    metrics = {
        "n_tokens": sum(m.metrics.get("n_tokens", 0) for m in src_metas),
        "field_tokens": {},
        "merged_from": segment_ids,
    }
    for m in src_metas:
        for fid, n in m.metrics.get("field_tokens", {}).items():
            metrics["field_tokens"][fid] = metrics["field_tokens"].get(fid, 0) + n
    if purge_ctx:
        metrics["n_tokens"] -= purge_ctx["deleted_tokens"]
        for fid, n in purge_ctx["deleted_field_tokens"].items():
            metrics["field_tokens"][fid] = metrics["field_tokens"].get(fid, 0) - n
        metrics["purged_docs"] = purge_ctx["deleted_docs"]
    fragment = {
        "segment_id": new_segment_id,
        "build_id": manifest.stats.get("build_id", ""),
        "max_doc": total_docs,
        "metrics": metrics,
        "lineage": {"merged_from": segment_ids, "opstamp": manifest.opstamp + 1},
        "purge": purge_ctx,
    }
    with open(os.path.join(tmp_dir, FRAGMENT_NAME), "w") as f:
        json.dump(fragment, f, indent=1, sort_keys=True)
    os.rename(tmp_dir, new_dir)

    return _swap_manifest(
        index_dir, manifest, segment_ids, new_segment_id, total_docs,
        fragment["lineage"], metrics, spark=spark, purge=purge_ctx,
    )


def _swap_manifest(
    index_dir, manifest, segment_ids, new_segment_id, total_docs, lineage, metrics,
    spark=None, purge=None,
) -> SegmentMeta:
    """endMerge (segment_updater.go:115-136): replace the merged sources
    with the new segment in one atomic manifest save, then GC.

    When the merge PURGED tombstoned docs (``purge`` carries the deleted
    doc/token counts), global stats and the term_stats table are no
    longer merge-invariant: totals shrink and every constituent term's
    doc_freq may have dropped. The purge commit therefore recomputes
    term_stats (staged, promoted only after the manifest save — same
    crash-safe pairing as the build commit) and rewrites the tombstone
    set without the now-purged segments."""
    committed = {s.segment_id for s in manifest.segments}
    if new_segment_id in committed and not (committed & set(segment_ids)):
        # already swapped by a prior run — appending again would list the
        # segment twice and double every count; no-op
        return next(s for s in manifest.segments if s.segment_id == new_segment_id)
    new_meta = SegmentMeta(new_segment_id, total_docs, lineage, metrics)
    remaining = [s for s in manifest.segments if s.segment_id not in set(segment_ids)]
    # a purge that deleted EVERY source doc yields an empty segment —
    # don't commit it (the build drops empty segments the same way,
    # segment_manager.go:60-66); its dir is GC'd with the sources
    new_segments = remaining + ([new_meta] if total_docs > 0 else [])
    new_opstamp = manifest.opstamp + 1
    stats = dict(manifest.stats)
    staging = None
    if purge:
        from .build import _write_term_stats_staged
        from .deletes import tombstone_count

        stats["total_docs"] = sum(s.max_doc for s in new_segments)
        stats["total_tokens"] = stats.get("total_tokens", 0) - purge["deleted_tokens"]
        ft = dict(stats.get("field_tokens", {}))
        for fid, n in purge["deleted_field_tokens"].items():
            ft[fid] = ft.get(fid, 0) - n
        stats["field_tokens"] = ft
        live_ids = {s.segment_id for s in new_segments}
        stats["tombstones"] = tombstone_count(index_dir, live_ids)
        est = sum((s.metrics or {}).get("n_terms", s.max_doc) for s in new_segments)
        staging = _write_term_stats_staged(
            spark, index_dir, [s.segment_id for s in new_segments], new_opstamp, est
        )
        stats["term_stats_opstamp"] = new_opstamp
    new_manifest = Manifest(
        manifest.schema,
        new_segments,
        opstamp=new_opstamp,
        stats=stats,
        analyzers=manifest.analyzers,
    )
    save_manifest(index_dir, new_manifest)
    if purge:
        from .build import _promote_term_stats
        from .deletes import gc_tombstones

        _promote_term_stats(index_dir, staging)
        gc_tombstones(spark, index_dir, {s.segment_id for s in new_segments}, new_opstamp)
    garbage_collect(index_dir)
    # without a purge, term_stats stays valid (global doc_freq is
    # merge-invariant); drop cached readers pointing at deleted files
    from .query.exec import invalidate_cache

    invalidate_cache(index_dir)
    return new_meta


@locked_writer("purge")
def purge_deletes(spark, index_dir: str) -> list[str]:
    """Compact every segment that carries tombstones (a single-source
    'merge' is a purge rewrite: deleted docs dropped, survivors
    densified, stats + term_stats recomputed). Returns new segment ids.

    The LogMergePolicy stays reference-literal (doc-count levels only);
    this is the explicit knob for reclaiming deletes without waiting for
    a size-triggered merge."""
    from .deletes import load_tombstone_map

    dmap = load_tombstone_map(index_dir)
    if not dmap:
        return []
    manifest = load_manifest(index_dir)
    live = {s.segment_id for s in manifest.segments}
    created = []
    for i, sid in enumerate(sorted(dmap)):
        if sid not in live:
            continue
        new_id = f"purge-{manifest.opstamp:04d}-{i:03d}"
        merge_segments(spark, index_dir, [sid], new_id)
        created.append(new_id)
    # a fully-deleted segment purges to NOTHING (the empty result is not
    # committed) — report only segments that actually exist
    live_after = {s.segment_id for s in load_manifest(index_dir).segments}
    return [c for c in created if c in live_after]


@locked_writer("merge")
def consider_merges(spark, index_dir: str, policy_kwargs: dict | None = None) -> list[str]:
    """Loop until fixpoint (considerMergeOptions recursion,
    /root/reference/indexer/segment_updater.go:76-145). Returns the ids of
    segments created."""
    created = []
    gen = 0
    while True:
        manifest = load_manifest(index_dir)
        cands = compute_merge_candidates(
            [(s.segment_id, s.max_doc) for s in manifest.segments], **(policy_kwargs or {})
        )
        if not cands:
            return created
        for group in cands:
            new_id = f"merge-{manifest.opstamp:04d}-{gen:03d}"
            merge_segments(spark, index_dir, group, new_id)
            created.append(new_id)
            gen += 1
