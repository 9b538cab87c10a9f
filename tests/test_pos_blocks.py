"""Doc-aligned position blocks (r3 verdict task #5).

Design under test: position blocks are packed at DOC-block boundaries
(block i of the positions buffer holds exactly the occurrences of doc
block i), so phrase/near evaluation can decode a position-block SUBSET
selected by candidate docs — restoring the block-skip pruning term
queries have — instead of decoding every position of a hot term.

- manifest.stats["pos_layout"] == "doc_aligned" on fresh builds; the
  flag gates subset decode (absent => the old occurrence-aligned full
  decode, still correct).
- pack/unpack roundtrip: subset decode == full-decode slices, incl.
  multi-row (row_ord-sharded) posting lists.
- phrase results BIT-IDENTICAL with pruning on vs off (flag stripped).
- the common term of a selective phrase decodes a strict subset of its
  position blocks (counters on TermPostings).
- merge preserves the layout (repacked rows stay doc-aligned, flag
  survives, results unchanged).
"""

import numpy as np
import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.codec import BLOCK_SIZE
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import TermPostings, attach_docmap, search
from ostrich_spark.schema import Schema

N_DOCS = 600
RARE_DOCS = {7, 300, 511}


def _mk_docs():
    """Every doc contains 'common' several times (multi-block postings:
    600 docs / BLOCK_SIZE=128 -> 5 blocks); RARE_DOCS contain the
    adjacent pair 'needle common' once."""
    rows = []
    for i in range(N_DOCS):
        toks = ["alpha", "common", "beta", "common", "gamma"]
        if i in RARE_DOCS:
            toks += ["needle", "common"]
        toks += ["delta", "common"]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    return rows


@pytest.fixture(scope="module")
def pb_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("posblk") / "idx")
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(_mk_docs())), s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _phrase_hits(spark, idx, q='text:"needle common"'):
    res, _ = search(spark, idx, q, limit=None, scorer="bm25")
    out = attach_docmap(spark, idx, res.select("segment_id", "doc", "score"))
    return sorted(
        (int(r["doc_id"]), round(float(r["score"]), 10))
        for r in out.collect()
    )


def test_manifest_flag_and_results(spark, pb_idx):
    mf = load_manifest(pb_idx)
    assert mf.stats.get("pos_layout") == "doc_aligned"
    hits = _phrase_hits(spark, pb_idx)
    assert [d for d, _ in hits] == sorted(RARE_DOCS)


def test_pruned_equals_full_decode(spark, pb_idx, tmp_path):
    """Strip the layout flag (simulating an old occurrence-aligned
    index reader path) — same phrase, bit-identical scores. The flag
    only changes WHICH blocks are decoded, never values."""
    import json
    import os
    import shutil

    with_flag = _phrase_hits(spark, pb_idx)
    idx2 = str(tmp_path / "idx_noflag")
    shutil.copytree(pb_idx, idx2)
    mpath = os.path.join(idx2, "manifest.json")
    m = json.load(open(mpath))
    m["stats"].pop("pos_layout", None)
    json.dump(m, open(mpath, "w"))
    without = _phrase_hits(spark, idx2)
    assert with_flag == without
    # sloppy phrase and unordered near ride the same decode path
    assert _phrase_hits(spark, pb_idx, 'text:"needle gamma"~3') == \
        _phrase_hits(spark, idx2, 'text:"needle gamma"~3')


def _term_data(pb_idx, terms):
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    mf = load_manifest(pb_idx)
    td_by_seg = {}
    for seg in mf.sorted_segments():
        p = f"{pb_idx}/segments/{seg.segment_id}/postings.parquet"
        t = ds.dataset(p, format="parquet").to_table(
            filter=pc.field("term").isin(terms)
        )
        pdf = t.to_pandas()
        if len(pdf):
            td_by_seg[seg.segment_id] = {
                (int(f), tm): TermPostings(rows)
                for (f, tm), rows in pdf.groupby(["field", "term"])
            }
    return td_by_seg


def test_common_term_decodes_block_subset(spark, pb_idx):
    """Kernel-level: eval_phrase with pos_aligned=True decodes fewer
    position blocks for the COMMON term than exist (the rare term's
    candidates select 3 doc blocks of ~5+), and the match set is the
    planted one."""
    from ostrich_spark.query.exec_core import bind_stats, eval_phrase
    from ostrich_spark.query.parser import parse_query
    from ostrich_spark.query.plan import compile_query, to_wire

    mf = load_manifest(pb_idx)
    logical = parse_query('text:"needle common"', mf.schema, None, "or")
    doc_freqs, total_docs, avgdl = bind_stats(spark, pb_idx, mf, logical)
    wire = to_wire(compile_query(logical, doc_freqs, total_docs, avgdl, "bm25"))
    assert wire["kind"] == "phrase"
    wire["pos_aligned"] = True

    all_docs = []
    decoded = total = 0
    for seg, td in _term_data(pb_idx, ["needle", "common"]).items():
        docs, scores = eval_phrase(wire, td, "bm25")
        all_docs.extend(docs.tolist())
        common_tp = td[(wire["field"], "common")]
        decoded += common_tp.pos_blocks_decoded
        total += common_tp.pos_blocks_total
        # rare term decodes fully
        rare_tp = td[(wire["field"], "needle")]
        assert rare_tp.pos_blocks_decoded == rare_tp.pos_blocks_total
    assert total >= 4, f"common term should span multiple blocks, got {total}"
    assert 0 < decoded < total, (decoded, total)
    # without the flag: full decode (counters equal)
    wire.pop("pos_aligned")
    for seg, td in _term_data(pb_idx, ["needle", "common"]).items():
        eval_phrase(wire, td, "bm25")
        tp = td[(wire["field"], "common")]
        assert tp.pos_blocks_decoded == tp.pos_blocks_total


def test_subset_decode_matches_full(spark, pb_idx):
    """decode_with_positions(block_sel) returns exactly the selected
    doc blocks' rows of the full decode, positions aligned with tfs."""
    for seg, td in _term_data(pb_idx, ["common"]).items():
        for key, tp in td.items():
            fd, ft, fl, fp = tp.decode_with_positions()
            nb = tp.n_blocks
            assert len(tp._rows.iloc[0]["pos_offs"]) == len(
                tp._rows.iloc[0]["doc_offs"]
            )
            for sel in ([0], [nb - 1], [1, 3] if nb > 3 else [0]):
                sel = sorted(set(s for s in sel if s < nb))
                sd, st, sl, sp = tp.decode_with_positions(np.array(sel))
                # expected doc-row slice
                mask = np.zeros(len(fd), dtype=bool)
                for b in sel:
                    mask[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE] = True
                assert np.array_equal(sd, fd[mask])
                assert np.array_equal(st, ft[mask])
                assert np.array_equal(sl, fl[mask])
                pmask = np.repeat(mask, ft)
                assert np.array_equal(sp, fp[pmask])


def test_merge_preserves_alignment(spark, pb_idx, tmp_path):
    import shutil

    from ostrich_spark.merge import merge_segments

    idx2 = str(tmp_path / "idx_m")
    shutil.copytree(pb_idx, idx2)
    before = _phrase_hits(spark, idx2)
    mf = load_manifest(idx2)
    merge_segments(
        spark, idx2, [s.segment_id for s in mf.sorted_segments()], "m1"
    )
    mf2 = load_manifest(idx2)
    assert mf2.stats.get("pos_layout") == "doc_aligned"
    assert len(mf2.segments) == 1
    assert _phrase_hits(spark, idx2) == before
    # merged (repacked) row still subset-decodes == full decode
    for seg, td in _term_data(idx2, ["common"]).items():
        for key, tp in td.items():
            fd, ft, fl, fp = tp.decode_with_positions()
            assert len(fd) == N_DOCS
            sd, st, sl, sp = tp.decode_with_positions(np.array([2]))
            lo, hi = 2 * BLOCK_SIZE, 3 * BLOCK_SIZE
            assert np.array_equal(sd, fd[lo:hi])
            off = int(ft[:lo].sum())
            assert np.array_equal(sp, fp[off:off + int(ft[lo:hi].sum())])


def test_codec_multirow_subset():
    """Synthetic 2-row (row_ord-sharded) posting list: global block
    indices map across rows for docs AND positions."""
    from ostrich_spark.codec import (
        block_metadata,
        pack_blocked,
        pack_pos_doc_aligned,
    )

    rng = np.random.default_rng(7)
    rows = []
    base = 0
    full_docs, full_tfs, full_pos = [], [], []
    for ro in range(2):
        n = 300
        docs = base + np.sort(rng.choice(10_000, size=n, replace=False))
        base = int(docs[-1]) + 1
        tfs = rng.integers(1, 4, size=n)
        lens = rng.integers(5, 50, size=n)
        pos = np.concatenate([
            np.sort(rng.choice(100, size=t, replace=False)) for t in tfs
        ])
        docs_b, doc_offs = pack_blocked(docs, delta=True)
        tfs_b, tf_offs = pack_blocked(tfs, delta=False)
        lens_b, len_offs = pack_blocked(lens, delta=False)
        bmd, bmt, bml = block_metadata(docs, tfs, lens)
        pos_b, pos_offs = pack_pos_doc_aligned(pos, tfs)
        assert len(pos_offs) == len(doc_offs)
        rows.append({
            "segment_id": "s", "field": 0, "term": "t", "row_ord": ro,
            "doc_freq": n, "total_tf": int(tfs.sum()),
            "docs": docs_b, "tfs": tfs_b, "lens": lens_b,
            "doc_offs": doc_offs, "tf_offs": tf_offs, "len_offs": len_offs,
            "block_max_doc": bmd, "block_max_tf": bmt, "block_min_len": bml,
            "pos": pos_b, "pos_offs": pos_offs,
        })
        full_docs.append(docs)
        full_tfs.append(tfs)
        full_pos.append(pos)
    tp = TermPostings(pd.DataFrame(rows))
    fd, ft, fl, fp = tp.decode_with_positions()
    assert np.array_equal(fd, np.concatenate(full_docs))
    assert np.array_equal(fp, np.concatenate(full_pos))
    nb = tp.n_blocks
    assert nb == 6  # 300 docs -> 3 blocks (128,128,44) per row

    # global posting-ordinal [start, end) per global block — block
    # boundaries are LOCAL to each row (row 1 starts at ordinal 300,
    # not 384), which is exactly what the mask must reflect
    ranges = []
    base = 0
    for n in (300, 300):
        for loc in range(3):
            ranges.append(
                (base + loc * BLOCK_SIZE,
                 base + min((loc + 1) * BLOCK_SIZE, n))
            )
        base += n
    for sel in ([0], [2], [3], [5], [1, 4], list(range(nb))):
        sd, st, sl, sp = tp.decode_with_positions(np.array(sel))
        mask = np.zeros(len(fd), dtype=bool)
        for b in sel:
            s, e = ranges[b]
            mask[s:e] = True
        assert np.array_equal(sd, fd[mask])
        assert np.array_equal(st, ft[mask])
        assert np.array_equal(sp, fp[np.repeat(mask, ft)])
    # blocks_for_docs: candidates drawn from block 4 select exactly it
    s4, e4 = ranges[4]
    cand = fd[s4 + 3: s4 + 5]
    assert tp.blocks_for_docs(cand).tolist() == [4]
