"""Block-max WAND: exactness vs the exhaustive path, and actual skipping."""

import numpy as np
import pandas as pd
import pytest

from ostrich_spark.codec import BLOCK_SIZE, block_metadata, pack_blocked
from ostrich_spark.query.exec import (
    TermPostings,
    _union_arrays,
    score_postings,
    topk_arrays,
    wand_union_topk,
)


def _make_term_rows(docs, tfs, lens, seg="s0"):
    docs_b, doc_offs = pack_blocked(np.asarray(docs), delta=True)
    tfs_b, tf_offs = pack_blocked(np.asarray(tfs), delta=False)
    lens_b, len_offs = pack_blocked(np.asarray(lens), delta=False)
    bmd, bmt, bml = block_metadata(np.asarray(docs), np.asarray(tfs), np.asarray(lens))
    return pd.DataFrame(
        [
            {
                "segment_id": seg,
                "row_ord": 0,
                "doc_freq": len(docs),
                "total_tf": int(np.sum(tfs)),
                "docs": docs_b,
                "tfs": tfs_b,
                "lens": lens_b,
                "doc_offs": doc_offs,
                "tf_offs": tf_offs,
                "len_offs": len_offs,
                "block_max_doc": bmd,
                "block_max_tf": bmt,
                "block_min_len": bml,
            }
        ]
    )


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_wand_equals_exhaustive(scorer, seed):
    rng = np.random.default_rng(seed)
    n_docs = 50_000
    term_data = {}
    wires = []
    for i, (df_count, idf) in enumerate([(30_000, 0.8), (25_000, 1.1), (400, 5.0)]):
        docs = np.sort(rng.choice(n_docs, size=df_count, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, size=df_count).astype(np.int64)
        lens = rng.integers(30, 500, size=df_count).astype(np.int64)
        term_data[(0, f"t{i}")] = TermPostings(_make_term_rows(docs, tfs, lens))
        wires.append(
            {"kind": "term", "field": 0, "term": f"t{i}", "doc_freq": df_count, "idf": idf, "avgdl": 200.0}
        )

    k = 10
    stats = {}
    wd, ws = wand_union_topk(wires, term_data, k, scorer, stats=stats)
    wand_top = topk_arrays(wd, ws, k)

    # exhaustive union
    parts = []
    for w in wires:
        tp = term_data[(0, w["term"])]
        d, t, ln = tp.decode()
        parts.append((d, score_postings(t, ln, w["idf"], w["avgdl"], scorer)))
    ed, es = _union_arrays(parts)
    full_top = topk_arrays(ed, es, k)

    assert np.array_equal(wand_top[0], full_top[0]), scorer
    assert np.allclose(wand_top[1], full_top[1], rtol=0, atol=0)  # bit-identical
    # pruning actually happened
    assert stats.get("blocks_kept", 0) < stats.get("blocks_total", 1), stats


def test_wand_single_rare_term_dominates():
    """Classic WAND win: rare high-idf term + giant common term — most of
    the common term's blocks must be skipped."""
    rng = np.random.default_rng(99)
    n_docs = 200_000
    common = np.arange(0, n_docs, 2, dtype=np.int64)  # 100k postings
    rare = np.sort(rng.choice(n_docs, size=50, replace=False)).astype(np.int64)
    term_data = {
        (0, "common"): TermPostings(
            _make_term_rows(common, np.ones(len(common), np.int64), np.full(len(common), 100))
        ),
        (0, "rare"): TermPostings(
            _make_term_rows(rare, np.full(len(rare), 5), np.full(len(rare), 100))
        ),
    }
    wires = [
        {"kind": "term", "field": 0, "term": "common", "doc_freq": len(common), "idf": 0.1, "avgdl": 100.0},
        {"kind": "term", "field": 0, "term": "rare", "doc_freq": len(rare), "idf": 8.0, "avgdl": 100.0},
    ]
    stats = {}
    wd, ws = wand_union_topk(wires, term_data, 10, "bm25", stats=stats)
    top = topk_arrays(wd, ws, 10)
    # every top doc must contain the rare term (idf gap guarantees it)
    assert set(top[0]).issubset(set(rare.tolist()))
    skipped_frac = 1 - stats["blocks_kept"] / stats["blocks_total"]
    assert skipped_frac > 0.9, stats


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize("seed", [4, 5])
def test_and_skip_decode_equals_exhaustive(scorer, seed):
    """eval_and_terms: rare AND common decodes only the common term's
    blocks overlapping the rare term's docs — results bit-identical to
    the full-decode intersection, with real (>80%) block skipping."""
    from ostrich_spark.query.exec import eval_and_terms

    rng = np.random.default_rng(seed)
    n_docs = 200_000
    term_data = {}
    wires = []
    for i, (df_count, idf) in enumerate([(120_000, 0.6), (90_000, 0.9), (300, 6.0)]):
        docs = np.sort(rng.choice(n_docs, size=df_count, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, size=df_count).astype(np.int64)
        lens = rng.integers(30, 400, size=df_count).astype(np.int64)
        term_data[(0, f"t{i}")] = TermPostings(_make_term_rows(docs, tfs, lens))
        wires.append(
            {"kind": "term", "field": 0, "term": f"t{i}", "doc_freq": df_count,
             "idf": idf, "avgdl": 200.0}
        )

    stats = {}
    sd, ss = eval_and_terms(wires, term_data, scorer, stats=stats)

    # exhaustive reference: full decode, smallest-first intersect + sum
    parts = []
    for w in wires:
        d, t, ln = term_data[(0, w["term"])].decode()
        parts.append((d, score_postings(t, ln, w["idf"], w["avgdl"], scorer)))
    order = sorted(range(len(parts)), key=lambda i: (len(parts[i][0]), i))
    docs = parts[order[0]][0]
    for i in order[1:]:
        docs = np.intersect1d(docs, parts[i][0], assume_unique=True)
    total = np.zeros(len(docs), dtype=np.float64)
    for i in order:
        cd, cs = parts[i]
        total += cs[np.searchsorted(cd, docs)]

    assert np.array_equal(sd, docs)
    assert np.array_equal(ss, total)  # bit-identical, same float-add order
    assert len(sd) > 0
    # 300 candidate docs spread over 200k-doc space touch at most ~300
    # blocks of each big term (1563 blocks total per big term)
    assert stats["blocks_kept"] < 0.25 * stats["blocks_total"]


def test_and_skip_decode_absent_term():
    from ostrich_spark.query.exec import eval_and_terms

    term_data = {(0, "a"): TermPostings(_make_term_rows([1, 2], [1, 1], [10, 10]))}
    wires = [
        {"kind": "term", "field": 0, "term": "a", "doc_freq": 2, "idf": 1.0, "avgdl": 10.0},
        {"kind": "term", "field": 0, "term": "missing", "doc_freq": 0, "idf": 1.0, "avgdl": 10.0},
    ]
    d, s = eval_and_terms(wires, term_data, "tfidf")
    assert len(d) == 0 and len(s) == 0


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize("seed", [6, 7, 8])
def test_wand_with_deletes_equals_exhaustive_masked(scorer, seed):
    """WAND with a tombstone set: top-k must equal exhaustive-then-mask —
    the threshold is seeded from SURVIVOR scores only, so survivors that
    enter the top-k because a higher-scoring doc was deleted are never
    pruned. Skipping must still engage."""
    rng = np.random.default_rng(seed)
    n_docs = 50_000
    term_data = {}
    wires = []
    for i, (df_count, idf) in enumerate([(30_000, 0.8), (25_000, 1.1), (400, 5.0)]):
        docs = np.sort(rng.choice(n_docs, size=df_count, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, size=df_count).astype(np.int64)
        lens = rng.integers(30, 500, size=df_count).astype(np.int64)
        term_data[(0, f"t{i}")] = TermPostings(_make_term_rows(docs, tfs, lens))
        wires.append(
            {"kind": "term", "field": 0, "term": f"t{i}", "doc_freq": df_count,
             "idf": idf, "avgdl": 200.0}
        )
    # delete 30% of docs INCLUDING specifically the exhaustive top-k, so
    # the post-delete top-k is made of docs WAND would otherwise prune
    parts = []
    for w in wires:
        d, t, ln = term_data[(0, w["term"])].decode()
        parts.append((d, score_postings(t, ln, w["idf"], w["avgdl"], scorer)))
    ed, es = _union_arrays(parts)
    k = 10
    full_top = topk_arrays(ed, es, k)[0]
    random_dels = rng.choice(n_docs, size=n_docs // 3, replace=False)
    dels = np.unique(np.concatenate([full_top, random_dels])).astype(np.int64)

    stats = {}
    wd, ws = wand_union_topk(wires, term_data, k, scorer, stats=stats, dels=dels)
    got = topk_arrays(wd, ws, k)

    keep = ~np.isin(ed, dels)
    want = topk_arrays(ed[keep], es[keep], k)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])
    assert not set(got[0]) & set(dels.tolist())
    assert stats["blocks_kept"] < stats["blocks_total"]  # still skipping
