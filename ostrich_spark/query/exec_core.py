"""Per-segment vectorized query execution + global top-k merge.

Spark-first re-expression of ostrich's read path
(/root/reference/reader/search.go:21-66): per-segment parallelism becomes
one Spark task per (pruned) postings partition; collectors become a
per-segment top-k inside an Arrow UDF plus a global
``orderBy(...).limit(k)`` (Catalyst's TakeOrderedAndProject IS the
reference's MergeResults heap,
/root/reference/collector/top_score_collector.go:69-80).

Scorer semantics mirrored exactly (for TF-IDF rank identity):
- TermScorer: score = tf * idf (/root/reference/query/term_query.go:79-106)
- Intersection: k-way merge driven smallest-first
  (/root/reference/query/intersection_scorer.go:16-77); here a vectorized
  ``np.intersect1d`` chain in doc_freq-ascending order; child scores are
  summed in that same order (the reference sums over its SizeHint-sorted
  scorer list).
- Union: docs matched by >=1 child, score = sum of matching children's
  scores in child order (/root/reference/query/union_scorer.go:14-94).
- MustShould: iterate must, add should score when present
  (/root/reference/query/must_should_scorer.go:27-58).
- Tie-break: the reference's heap compares (score, docID) with
  smaller-doc-wins on equal scores (top_score_collector.go:23-28) but
  cross-segment ties are arrival-order; we pin the TOTAL order
  (score desc, segment_ord asc, doc asc) in engine and oracle.

Block-max WAND (north rule; the reference's acknowledged TODO at
/root/reference/query/boolean_query.go:129): exact two-phase pruning —
(1) seed a threshold from the fully-scored highest-impact term,
(2) keep only blocks whose upper bound + sum of other terms' max bounds
    can reach the threshold,
(3) decode, for every term, any additional block whose doc range contains
    a surviving candidate (so candidate scores are EXACT),
(4) rank candidates. Skipped docs provably score below the threshold.
"""

from __future__ import annotations

import json
import math
import os
from functools import reduce
from operator import or_

import numpy as np
import pandas as pd

from ..manifest import Manifest, load_manifest
from .parser import parse_query
from .plan import (
    B,
    K1,
    SCORER_TFIDF,
    collect_terms,
    compile_query,
    to_wire,
)

RESULT_SCHEMA = "segment_id string, doc long, score double, is_count boolean"

POSTINGS_SPARK_SCHEMA = (
    "segment_id string, field int, term string, row_ord long, doc_freq long, "
    "total_tf long, docs binary, tfs binary, lens binary, "
    "doc_offs array<long>, tf_offs array<long>, len_offs array<long>, "
    "block_max_doc array<long>, block_max_tf array<long>, block_min_len array<long>, "
    "pos binary, pos_offs array<long>"
)
TERM_STATS_SCHEMA = "field int, term string, doc_freq long"

# lazy DataFrame registry per (session id, index dir): avoids re-running
# schema inference / file listing on every query
_DF_CACHE: dict = {}


def _cached_read(spark, path: str, schema: str | None):
    key = (id(spark), path)
    df = _DF_CACHE.get(key)
    if df is None:
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        df = reader.parquet(path)
        _DF_CACHE[key] = df
    return df


def invalidate_cache(index_dir: str) -> None:
    """Drop cached DataFrames under an index dir — builds/merges change
    the file set behind the glob."""
    for key in [k for k in _DF_CACHE if index_dir in k[1]]:
        del _DF_CACHE[key]


# ---------------------------------------------------------------------------
# executor-side posting access
# ---------------------------------------------------------------------------


class TermPostings:
    """All posting rows of one (field, term) within one segment.

    Posting lists may span multiple doc-range-sharded rows (row_ord asc);
    blocks are independently decodable (codec.pack_blocked), enabling
    block-granular skip-decoding.
    """

    def __init__(self, rows: pd.DataFrame):
        rows = rows.sort_values("row_ord")
        self._rows = rows
        self.doc_freq = int(rows["doc_freq"].sum())
        # concatenated block metadata (globally doc-ascending)
        self.block_max_doc = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in rows["block_max_doc"]]
        ) if len(rows) else np.empty(0, dtype=np.int64)
        self.block_max_tf = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in rows["block_max_tf"]]
        ) if len(rows) else np.empty(0, dtype=np.int64)
        self.block_min_len = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in rows["block_min_len"]]
        ) if len(rows) else np.empty(0, dtype=np.int64)
        self.n_blocks = len(self.block_max_doc)
        # rows -> (row index, local block count)
        self._row_nblocks = [len(r) for r in rows["doc_offs"]]
        # position-block decode accounting (read-path evidence for the
        # phrase/near block-subset pruning; tests and ladders read these)
        self.pos_blocks_total = (
            sum(len(r) for r in rows["pos_offs"])
            if "pos_offs" in rows.columns else 0
        )
        self.pos_blocks_decoded = 0

    def blocks_for_docs(self, docs: np.ndarray) -> np.ndarray:
        """Global indices of blocks whose [lo, hi] docID range contains
        at least one of the SORTED candidate docIDs — the block
        selector for candidate-driven position decode."""
        if self.n_blocks == 0 or len(docs) == 0:
            return np.empty(0, dtype=np.int64)
        lo = self.block_lower_bounds()
        hi = self.block_max_doc
        left = np.searchsorted(docs, lo, side="left")
        right = np.searchsorted(docs, hi, side="right")
        return np.flatnonzero(right > left)

    def block_lower_bounds(self) -> np.ndarray:
        """First possible docID of each block (previous block's max + 1)."""
        lo = np.empty(self.n_blocks, dtype=np.int64)
        if self.n_blocks:
            lo[0] = 0
            lo[1:] = self.block_max_doc[:-1] + 1
        return lo

    def decode(self, block_sel: np.ndarray | None = None):
        """Decode selected global block indices (or all) ->
        (docs, tfs, lens) sorted by doc."""
        from ..codec import unpack_blocked

        if self.n_blocks == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        if block_sel is None:
            sel_mask = np.ones(self.n_blocks, dtype=bool)
        else:
            sel_mask = np.zeros(self.n_blocks, dtype=bool)
            sel_mask[block_sel] = True
        docs_parts, tfs_parts, lens_parts = [], [], []
        base = 0
        for (_, row), nb in zip(self._rows.iterrows(), self._row_nblocks):
            local = np.flatnonzero(sel_mask[base : base + nb])
            base += nb
            if len(local) == 0:
                continue
            d, _ = unpack_blocked(
                bytes(row["docs"]), list(row["doc_offs"]), row["doc_freq"], True, local
            )
            t, _ = unpack_blocked(
                bytes(row["tfs"]), list(row["tf_offs"]), row["doc_freq"], False, local
            )
            ln, _ = unpack_blocked(
                bytes(row["lens"]), list(row["len_offs"]), row["doc_freq"], False, local
            )
            docs_parts.append(d)
            tfs_parts.append(t)
            lens_parts.append(ln)
        if not docs_parts:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        return (
            np.concatenate(docs_parts),
            np.concatenate(tfs_parts),
            np.concatenate(lens_parts),
        )

    def decode_with_positions(self, block_sel: np.ndarray | None = None):
        """Decode docs/tfs/lens AND per-occurrence positions ->
        (docs, tfs, lens, pos) with pos doc-major flat (boundaries =
        cumsum(tfs)).

        ``block_sel`` (global block indices) decodes only those blocks —
        valid ONLY on a doc-aligned position layout
        (manifest.stats["pos_layout"] == "doc_aligned", r4+ builds:
        position block i holds exactly doc block i's occurrences, see
        codec.pack_pos_doc_aligned). Callers gate on the manifest flag;
        a row whose pos_offs count doesn't match its doc block count
        fails loudly here rather than misaligning. With ``block_sel``
        None, the whole list decodes — the always-correct path for
        pre-r4 occurrence-aligned indices."""
        from ..codec import unpack_blocked, unpack_ranges

        if block_sel is not None:
            sel_mask = np.zeros(self.n_blocks, dtype=bool)
            sel_mask[np.asarray(block_sel, dtype=np.int64)] = True
            docs_parts, tfs_parts, lens_parts, pos_parts = [], [], [], []
            base = 0
            for (_, row), nb in zip(self._rows.iterrows(), self._row_nblocks):
                local = np.flatnonzero(sel_mask[base : base + nb])
                base += nb
                if len(local) == 0:
                    continue
                poffs = list(row["pos_offs"])
                if len(poffs) != nb:
                    raise ValueError(
                        "block-subset position decode on an occurrence-"
                        f"aligned row ({len(poffs)} pos blocks vs {nb} "
                        "doc blocks) — the caller must gate on "
                        'manifest.stats["pos_layout"]'
                    )
                n = int(row["doc_freq"])
                d, _ = unpack_blocked(
                    bytes(row["docs"]), list(row["doc_offs"]), n, True, local
                )
                t, _ = unpack_blocked(
                    bytes(row["tfs"]), list(row["tf_offs"]), n, False, local
                )
                ln, _ = unpack_blocked(
                    bytes(row["lens"]), list(row["len_offs"]), n, False, local
                )
                p = unpack_ranges(bytes(row["pos"]), poffs, local)
                if len(p) != int(t.sum()):
                    raise ValueError(
                        "decoded position count misaligned with tfs — "
                        "corrupt doc-aligned layout"
                    )
                self.pos_blocks_decoded += len(local)
                docs_parts.append(d)
                tfs_parts.append(t)
                lens_parts.append(ln)
                pos_parts.append(p)
            if not docs_parts:
                z = np.empty(0, dtype=np.int64)
                return z, z, z, z
            return (
                np.concatenate(docs_parts),
                np.concatenate(tfs_parts),
                np.concatenate(lens_parts),
                np.concatenate(pos_parts),
            )

        docs_parts, tfs_parts, lens_parts, pos_parts = [], [], [], []
        for _, row in self._rows.iterrows():
            n = int(row["doc_freq"])
            d, _ = unpack_blocked(bytes(row["docs"]), list(row["doc_offs"]), n, True)
            t, _ = unpack_blocked(bytes(row["tfs"]), list(row["tf_offs"]), n, False)
            ln, _ = unpack_blocked(bytes(row["lens"]), list(row["len_offs"]), n, False)
            pbuf = row["pos"] if "pos" in row.index else None
            if pbuf is None or isinstance(pbuf, float):
                pbuf, poffs = b"", []
            else:
                pbuf, poffs = bytes(pbuf), list(row["pos_offs"])
            p, _ = unpack_blocked(pbuf, poffs, int(row["total_tf"]), False)
            if len(p) != int(t.sum()):
                raise ValueError(
                    "postings carry no token positions — the field was "
                    "indexed with positions=False; rebuild with "
                    "Schema.add_text_field(..., positions=True) to run "
                    "phrase queries"
                )
            self.pos_blocks_decoded += len(poffs)
            docs_parts.append(d)
            tfs_parts.append(t)
            lens_parts.append(ln)
            pos_parts.append(p)
        if not docs_parts:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        return (
            np.concatenate(docs_parts),
            np.concatenate(tfs_parts),
            np.concatenate(lens_parts),
            np.concatenate(pos_parts),
        )


def score_postings(tfs: np.ndarray, lens: np.ndarray, idf: float, avgdl: float, scorer: str) -> np.ndarray:
    tf = tfs.astype(np.float64)
    if scorer == SCORER_TFIDF:
        return tf * idf
    dl = lens.astype(np.float64)
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def block_upper_bounds(tp: TermPostings, idf: float, avgdl: float, scorer: str) -> np.ndarray:
    """Valid per-block score upper bound: BM25 is monotone increasing in tf
    and decreasing in doc length, so (block_max_tf, block_min_len) bounds it."""
    tf = tp.block_max_tf.astype(np.float64)
    if scorer == SCORER_TFIDF:
        return tf * idf
    dl = tp.block_min_len.astype(np.float64)
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


# ---------------------------------------------------------------------------
# scorer-tree evaluation (vectorized)
# ---------------------------------------------------------------------------


def _union_arrays(parts: list[tuple[np.ndarray, np.ndarray]]):
    """k-way union: concat (docs, scores) in child order, sum per doc.

    np.bincount accumulates in input order -> the float sum order equals
    child order, matching UnionScorer's sumWithCombiner semantics."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64)
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(docs, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(summed, inv, scores)
    return uniq, summed


def eval_and_terms(children: list[dict], term_data: dict, scorer: str, stats: dict | None = None):
    """Skip-decoding intersection for AND-of-terms — EXACT, not a bound.

    The smallest term is decoded fully and defines the candidate docs;
    every other term decodes ONLY the blocks whose [lo, hi] doc range
    contains a candidate (the intersection result can't include a doc the
    smallest term lacks, so skipped blocks are provably irrelevant — no
    thresholds involved). A rare AND common query therefore decodes the
    common term proportionally to the RARE term's doc count, which is the
    access pattern that survives a 100x corpus scale-up. Scores are
    computed from the decoded postings: bit-identical to the exhaustive
    evaluator (regression-tested)."""
    tps = []
    for c in children:
        tp = term_data.get((c["field"], c["term"]))
        if tp is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        tps.append(tp)
    order = sorted(range(len(tps)), key=lambda i: (tps[i].doc_freq, i))

    seed = order[0]
    docs, tfs, lens = tps[seed].decode()
    decoded = {seed: (docs, tfs, lens)}
    cand = docs
    for i in order[1:]:
        if len(cand) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        tp = tps[i]
        lo = tp.block_lower_bounds()
        hi = tp.block_max_doc
        # block needed iff some candidate doc falls inside [lo, hi]
        need = np.searchsorted(cand, lo, side="left") < np.searchsorted(
            cand, hi, side="right"
        )
        sel = np.flatnonzero(need)
        if stats is not None:
            stats["blocks_total"] = stats.get("blocks_total", 0) + tp.n_blocks
            stats["blocks_kept"] = stats.get("blocks_kept", 0) + len(sel)
        d, t, ln = tp.decode(sel)
        decoded[i] = (d, t, ln)
        cand = np.intersect1d(cand, d, assume_unique=True)

    total = np.zeros(len(cand), dtype=np.float64)
    for i in order:  # sum child scores in the sorted order (parity with
        # the exhaustive path's float-add order)
        d, t, ln = decoded[i]
        pos = np.searchsorted(d, cand)
        total += score_postings(t, ln, children[i]["idf"], children[i]["avgdl"], scorer)[pos]
    return cand, total


def eval_phrase(wire: dict, term_data: dict, scorer: str):
    """Vectorized phrase match within one segment.

    Consecutive (slop=0) key trick: occurrence (doc, pos) of constituent
    i becomes the int64 key doc*2^32 + (pos - i); a phrase occurrence
    starting at position p of doc d makes EVERY constituent produce the
    key d*2^32 + p, so the k-way sorted-array intersection of the
    per-term key sets yields the phrase start positions directly — no
    per-doc Python loop. Phrase tf = keys per doc; score = tf (×len-norm
    for BM25) × summed idf.

    Sloppy (slop>0) in-order window DP (see parser.PhraseQuery): over
    encoded keys doc*2^32 + pos, best[j] is the LATEST start of an
    in-order chain of terms[0..i] ending at occurrence j of term i. The
    doc-major encoding makes np.maximum.accumulate a per-doc prefix max
    (a later doc's keys dominate every earlier doc's), so the whole DP
    is searchsorted + accumulate per term — still no per-doc loop. A doc
    matches at end position q iff best(q) is in q's doc and
    q − start <= (k−1) + slop; tf = count of such q per doc. slop=0 via
    this DP equals the keyset path exactly (regression-tested)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    BIG = np.int64(1) << np.int64(32)
    # slot model: slot i accepts any of slots[i]'s terms. A plain phrase
    # has singleton slots; multi_phrase (MultiPhraseQuery — phrase-prefix
    # resolves here) carries alternative sets, whose occurrences union
    # (positions are disjoint: one position holds one term).
    if wire["kind"] == "multi_phrase":
        slots = [list(slot) for slot in wire["slots"]]
    else:
        slots = [[t] for t in wire["terms"]]
    if not slots:
        return empty

    def slot_decode(slot, cand=None):
        """-> (docs, lens, enc sorted) unioned over the slot's present
        terms, or None when none has postings in this segment. With
        ``cand`` (sorted candidate docIDs; doc-aligned layout only),
        each term decodes ONLY the position blocks whose doc range
        touches a candidate — the phrase analog of WAND block skip."""
        ds, ls, es = [], [], []
        for t in slot:
            tp = term_data.get((wire["field"], t))
            if tp is None:
                continue
            if cand is not None:
                docs, tfs, lens, pos = tp.decode_with_positions(
                    tp.blocks_for_docs(cand)
                )
            else:
                docs, tfs, lens, pos = tp.decode_with_positions()
            ds.append(docs)
            ls.append(lens)
            es.append(np.repeat(docs, tfs) * BIG + pos)
        if not es:
            return None
        if len(es) == 1:
            return ds[0], ls[0], es[0]
        docs = np.concatenate(ds)
        docs, idx = np.unique(docs, return_index=True)
        enc = np.concatenate(es)
        enc.sort()
        return docs, np.concatenate(ls)[idx], enc

    # Candidate-driven decode (doc-aligned position layout, r4+): the
    # rarest slot decodes fully and seeds the candidate doc set; every
    # other slot decodes only candidate-touching blocks. Correct because
    # a phrase match needs every slot — any final doc is in the seed's
    # docs, so all its occurrences in every slot live in selected
    # blocks; extra docs sharing those blocks can't fabricate matches
    # (the key/DP math is per-doc exact).
    pos_aligned = bool(wire.get("pos_aligned"))
    slot_tot = []
    for slot in slots:
        present = [
            term_data.get((wire["field"], t))
            for t in slot
            if term_data.get((wire["field"], t)) is not None
        ]
        if not present:
            return empty
        slot_tot.append(sum(tp.doc_freq for tp in present))
    seed = int(np.argmin(slot_tot)) if pos_aligned else -1

    slot_dec: list = [None] * len(slots)
    if pos_aligned:
        dec = slot_decode(slots[seed])
        if dec is None:
            return empty
        slot_dec[seed] = dec
        cand = dec[0]
        if len(cand) == 0:
            return empty
    else:
        cand = None
    for i, slot in enumerate(slots):
        if i == seed:
            continue
        dec = slot_decode(slot, cand)
        if dec is None:
            return empty
        slot_dec[i] = dec
    slop = int(wire.get("slop", 0))
    if slop > 0:
        decoded = []
        first_docs = first_lens = None
        for i, (docs, lens, enc) in enumerate(slot_dec):
            if i == 0:
                first_docs, first_lens = docs, lens
            decoded.append(enc)
            if len(enc) == 0:
                return empty
        best = decoded[0].copy()  # chain of length 1 starts at itself
        for i in range(1, len(decoded)):
            prefmax = np.maximum.accumulate(best)
            enc_i = decoded[i]
            j = np.searchsorted(decoded[i - 1], enc_i, side="left") - 1
            cand = np.where(j >= 0, prefmax[np.clip(j, 0, None)], np.int64(-1))
            same_doc = (cand >= 0) & (cand // BIG == enc_i // BIG)
            best = np.where(same_doc, cand, np.int64(-1))
        enc_last = decoded[-1]
        span_ok = (best >= 0) & (
            enc_last - best <= np.int64(len(decoded) - 1 + slop)
        )
        ends = enc_last[span_ok]
        if len(ends) == 0:
            return empty
        pdocs, ptfs = np.unique(ends // BIG, return_counts=True)
        lens_at = first_lens[np.searchsorted(first_docs, pdocs)]
        return pdocs, score_postings(ptfs, lens_at, wire["idf"], wire["avgdl"], scorer)
    keysets = []
    first_docs = first_lens = None
    for i, (docs, lens, enc) in enumerate(slot_dec):
        if i == 0:
            first_docs, first_lens = docs, lens
        if i > 0:
            enc = enc[(enc % BIG) >= np.int64(i)]
        keysets.append(enc - np.int64(i))
    inter = keysets[0]
    # smallest-first, same rationale as the intersection scorer
    for k in sorted(keysets[1:], key=len):
        if len(inter) == 0:
            return empty
        inter = np.intersect1d(inter, k, assume_unique=True)
    if len(inter) == 0:
        return empty
    pdocs, ptfs = np.unique(inter // BIG, return_counts=True)
    lens_at = first_lens[np.searchsorted(first_docs, pdocs)]
    return pdocs, score_postings(ptfs, lens_at, wire["idf"], wire["avgdl"], scorer)


def _lens_for_docs(doc_parts, len_parts, pdocs):
    """Field length per doc in ``pdocs`` from per-term (docs, lens)
    postings fragments. Lengths are a doc property (identical in every
    term's list), so any fragment carrying the doc serves; the single-
    fragment fast path is a plain sorted lookup."""
    if len(doc_parts) == 1:
        return len_parts[0][np.searchsorted(doc_parts[0], pdocs)]
    docs = np.concatenate(doc_parts)
    lens = np.concatenate(len_parts)
    order = np.argsort(docs, kind="stable")
    docs, lens = docs[order], lens[order]
    return lens[np.searchsorted(docs, pdocs)]


def eval_near(wire: dict, term_data: dict, scorer: str):
    """Vectorized UNORDERED proximity (NearQuery contract): end position
    q (an occurrence of ANY constituent) matches iff every constituent's
    LATEST occurrence <= q in the same doc is within the window
    ``q - (k-1+slop)``. Per term that latest-occurrence lookup is one
    searchsorted over the term's doc-major encoded positions — no
    per-doc loop. tf = distinct matching end positions."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    BIG = np.int64(1) << np.int64(32)
    terms = list(dict.fromkeys(wire["terms"]))  # dedupe, keep order
    tps = [term_data.get((wire["field"], t)) for t in terms]
    if any(tp is None for tp in tps):
        return empty
    # candidate-driven decode (doc-aligned layout): the rarest term
    # decodes fully, the rest only candidate-touching blocks — a near
    # match needs EVERY term, so hits are confined to the seed's docs
    # and the same_doc guards keep extra decoded docs inert
    cand = None
    seed = -1
    seed_dec = None
    if bool(wire.get("pos_aligned")) and tps:
        seed = int(np.argmin([tp.doc_freq for tp in tps]))
        seed_dec = tps[seed].decode_with_positions()
        cand = seed_dec[0]
        if len(cand) == 0:
            return empty
    encs = []
    first_docs = first_lens = None
    for i, tp in enumerate(tps):
        if i == seed:
            docs, tfs, lens, pos = seed_dec
        elif cand is not None:
            docs, tfs, lens, pos = tp.decode_with_positions(
                tp.blocks_for_docs(cand)
            )
        else:
            docs, tfs, lens, pos = tp.decode_with_positions()
        if i == 0:
            first_docs, first_lens = docs, lens
        enc = np.repeat(docs, tfs) * BIG + pos
        if len(enc) == 0:
            return empty
        encs.append(enc)
    ends = np.concatenate(encs)
    ends.sort()  # candidate end positions: every occurrence of any term
    bound = np.int64(len(encs) - 1 + int(wire.get("slop", 0)))
    ok = np.ones(len(ends), dtype=bool)
    span_lo = ends.copy()  # min over terms of the latest occurrence <= q
    for enc in encs:
        j = np.searchsorted(enc, ends, side="right") - 1
        last = enc[np.clip(j, 0, None)]
        same_doc = (j >= 0) & (last // BIG == ends // BIG)
        ok &= same_doc
        np.minimum(span_lo, np.where(same_doc, last, ends), out=span_lo)
    hit = ends[ok & (ends - span_lo <= bound)]
    if len(hit) == 0:
        return empty
    # docs matched by the FIRST term drive the length lookup, but a near
    # match requires every term present, so first_docs covers all hits
    pdocs, ptfs = np.unique(hit // BIG, return_counts=True)
    lens_at = first_lens[np.searchsorted(first_docs, pdocs)]
    return pdocs, score_postings(ptfs, lens_at, wire["idf"], wire["avgdl"], scorer)


def eval_node(wire: dict, term_data: dict, max_doc: int, scorer: str, aux=None):
    """-> (docs sorted asc, scores) for one segment.

    ``aux`` maps rid -> sorted unique doc array for out-of-postings match
    sets (numeric range queries, computed from the docmap and delivered
    through the cogroup side of the scoring shuffle)."""
    kind = wire["kind"]
    if kind == "empty":
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if kind == "range":
        docs = aux.get(wire["rid"]) if aux else None
        if docs is None or not len(docs):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        return docs, np.full(len(docs), float(wire["score"]), dtype=np.float64)
    if kind == "all":
        return (
            np.arange(max_doc, dtype=np.int64),
            np.ones(max_doc, dtype=np.float64),
        )
    if kind == "term":
        tp = term_data.get((wire["field"], wire["term"]))
        if tp is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        docs, tfs, lens = tp.decode()
        return docs, score_postings(tfs, lens, wire["idf"], wire["avgdl"], scorer)
    if kind == "span_first":
        # Lucene SpanFirstQuery: occurrences of ANY of the terms (one =
        # the classic shape; several = spanFirst(spanOr(...)), e.g. a
        # span_multi expansion) restricted to positions < end; tf =
        # in-window occurrence count (sloppy freq of matching spans),
        # scored with the terms' combined idf bound at compile. Distinct
        # terms never share a (doc, position) slot, so the union
        # concatenates without double counting.
        occ_parts, doc_parts, len_parts = [], [], []
        for t in wire["terms"]:
            tp = term_data.get((wire["field"], t))
            if tp is None:
                continue
            docs, tfs, lens, pos = tp.decode_with_positions()
            occ_parts.append(np.repeat(docs, tfs)[pos < np.int64(wire["end"])])
            doc_parts.append(docs)
            len_parts.append(lens)
        if not occ_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        occ_doc = np.concatenate(occ_parts) if len(occ_parts) > 1 else occ_parts[0]
        if not len(occ_doc):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        pdocs, ptfs = np.unique(occ_doc, return_counts=True)
        lens_at = _lens_for_docs(doc_parts, len_parts, pdocs)
        return pdocs, score_postings(
            ptfs, lens_at, wire["idf"], wire["avgdl"], scorer
        )
    if kind == "span_not":
        # Lucene SpanNotQuery: include occurrences (of ANY include term
        # — several = spanNot(spanOr(...), ...)) at p survive iff no
        # exclude-term occurrence q has p - pre <= q <= p + post.
        # doc*BIG+pos encoding turns the per-doc window test into two
        # searchsorted probes against ONE sorted exclude array; clamping
        # the window's low edge at the doc's own position 0 keeps it
        # from leaking into the previous doc's key space (positions are
        # doc-relative and far below BIG, so the high edge never can).
        occ_parts, pos_parts, doc_parts, len_parts = [], [], [], []
        for t in wire["terms"]:
            tp = term_data.get((wire["field"], t))
            if tp is None:
                continue
            docs, tfs, lens, pos = tp.decode_with_positions()
            occ_parts.append(np.repeat(docs, tfs))
            pos_parts.append(pos)
            doc_parts.append(docs)
            len_parts.append(lens)
        if not occ_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        occ_doc = np.concatenate(occ_parts) if len(occ_parts) > 1 else occ_parts[0]
        pos = np.concatenate(pos_parts) if len(pos_parts) > 1 else pos_parts[0]
        BIG = np.int64(1) << np.int64(32)
        excl = []
        for et in wire["excl_terms"]:
            ep = term_data.get((wire["field"], et))
            if ep is not None:
                ed, etf, _, epos = ep.decode_with_positions()
                excl.append(np.repeat(ed, etf) * BIG + epos)
        if excl:
            E = np.sort(np.concatenate(excl))
            lo = occ_doc * BIG + np.maximum(pos - np.int64(wire["pre"]), 0)
            hi = occ_doc * BIG + pos + np.int64(wire["post"])
            hit = np.searchsorted(E, lo) <= np.searchsorted(E, hi, side="right") - 1
            occ_doc = occ_doc[~hit]
        if not len(occ_doc):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        pdocs, ptfs = np.unique(occ_doc, return_counts=True)
        lens_at = _lens_for_docs(doc_parts, len_parts, pdocs)
        return pdocs, score_postings(
            ptfs, lens_at, wire["idf"], wire["avgdl"], scorer
        )
    if kind == "const_score":
        # ES constant_score / Lucene ConstantScoreQuery: the base's
        # match set at a stamped constant — inner scores discarded
        bd, _ = eval_node(wire["base"], term_data, max_doc, scorer, aux)
        return bd, np.full(len(bd), float(wire["score"]), dtype=np.float64)
    if kind == "span_contain":
        # Lucene SpanContaining/SpanWithinQuery over fixed-width exact
        # spans: a big span [s, s+kb-1] contains a little span iff some
        # little start lies in [s, s+kb-kl] (same doc; kb >= kl enforced
        # at lowering). emit="big" reports the containing big spans
        # (span_containing); emit="little" reports the contained little
        # spans (span_within). Same doc*BIG+pos encoding as span_not:
        # two searchsorted probes per emitted span, no per-doc loop.
        BIG = np.int64(1) << np.int64(32)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))

        def span_starts(terms):
            # encoded start positions of the exact adjacent chain, plus
            # the first term's (docs, lens) for the length lookup
            keysets, first = [], None
            for i, t in enumerate(terms):
                tp = term_data.get((wire["field"], t))
                if tp is None:
                    return None, None
                docs, tfs, lens, pos = tp.decode_with_positions()
                if i == 0:
                    first = (docs, lens)
                enc = np.repeat(docs, tfs) * BIG + pos
                if i > 0:
                    # (pos - i) < 0 would leak into the previous doc's
                    # key space — an occurrence that early cannot be
                    # slot i of a chain anyway
                    enc = enc[(enc % BIG) >= np.int64(i)]
                keysets.append(enc - np.int64(i))
            inter = keysets[0]
            for kset in sorted(keysets[1:], key=len):
                if not len(inter):
                    break
                inter = np.intersect1d(inter, kset, assume_unique=True)
            return inter, first

        kb, kl = len(wire["big"]), len(wire["little"])
        sb, big_first = span_starts(wire["big"])
        if sb is None or not len(sb):
            return empty
        sl, little_first = span_starts(wire["little"])
        if sl is None or not len(sl):
            return empty
        gap = np.int64(kb - kl)
        if wire["emit"] == "big":
            lo = sb
            hi = sb + gap  # gap << BIG: stays inside the doc's keys
            hit = (
                np.searchsorted(sl, lo)
                <= np.searchsorted(sl, hi, side="right") - 1
            )
            occ, (fdocs, flens) = sb[hit], big_first
        else:
            lo = np.maximum(sl - gap, (sl // BIG) * BIG)  # clamp: doc pos 0
            hi = sl
            hit = (
                np.searchsorted(sb, lo)
                <= np.searchsorted(sb, hi, side="right") - 1
            )
            occ, (fdocs, flens) = sl[hit], little_first
        if not len(occ):
            return empty
        pdocs, ptfs = np.unique(occ // BIG, return_counts=True)
        lens_at = flens[np.searchsorted(fdocs, pdocs)]
        return pdocs, score_postings(
            ptfs, lens_at, wire["idf"], wire["avgdl"], scorer
        )
    if kind == "span_or":
        # Lucene SpanOrQuery over term clauses: tf = TOTAL occurrences
        # of any clause term (sloppy freq = matching span count), one
        # scorer over the summed tf with the combined idf. Lengths come
        # from whichever posting list carries the doc (identical across
        # terms — it is the doc's field length).
        parts = []
        for t in wire["terms"]:
            tp = term_data.get((wire["field"], t))
            if tp is None:
                continue
            parts.append(tp.decode())
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        all_docs = np.concatenate([p[0] for p in parts])
        uniq, inv = np.unique(all_docs, return_inverse=True)
        tf_u = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tf_u, inv, np.concatenate([p[1] for p in parts]))
        lens_u = np.zeros(len(uniq), dtype=np.float64)
        lens_u[inv] = np.concatenate([p[2] for p in parts])
        return uniq, score_postings(
            tf_u, lens_u, wire["idf"], wire["avgdl"], scorer
        )
    if kind == "combined_term":
        # Lucene CombinedFieldQuery / BM25F pseudo-field: tf = weighted
        # sum of the term's per-field tfs; dl = weighted sum of EVERY
        # listed field's length (norms delivered through the aux
        # cogroup, rid per field); df/idf/avgdl are the pseudo-field
        # stats bound at compile. One saturation curve over the summed
        # tf — the term-centric semantics dismax cannot express.
        term = wire["term"]
        parts = []
        for nf in wire["norm_fields"]:
            tp = term_data.get((nf["field"], term))
            if tp is None:
                continue
            docs, tfs, _ = tp.decode()
            parts.append((docs, tfs.astype(np.float64) * float(nf["weight"])))
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        all_docs = np.concatenate([p[0] for p in parts])
        uniq, inv = np.unique(all_docs, return_inverse=True)
        tf_u = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tf_u, inv, np.concatenate([p[1] for p in parts]))
        dl_u = np.zeros(len(uniq), dtype=np.float64)
        for nf in wire["norm_fields"]:
            nd = aux.get(nf["rid"]) if aux else None
            if nd is None or not len(nd):
                continue  # field with no values in this segment: len 0
            nv = aux.get(("val", nf["rid"]))
            pos = np.searchsorted(nd, uniq)
            pos_c = np.minimum(pos, len(nd) - 1)
            found = nd[pos_c] == uniq
            dl_u[found] += float(nf["weight"]) * nv[pos_c[found]]
        return uniq, score_postings(
            tf_u, dl_u, wire["idf"], wire["avgdl"], scorer
        )
    if kind in ("phrase", "multi_phrase"):
        return eval_phrase(wire, term_data, scorer)
    if kind == "near":
        return eval_near(wire, term_data, scorer)
    if kind == "or":
        parts = [eval_node(c, term_data, max_doc, scorer, aux) for c in wire["children"]]
        return _union_arrays(parts)
    if kind == "dismax":
        # union of children; score = max + tie*(sum - max) (Lucene
        # DisjunctionMaxQuery). Children's doc arrays are sorted unique,
        # so scatter into the union via searchsorted.
        parts = [eval_node(c, term_data, max_doc, scorer, aux) for c in wire["children"]]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        docs = np.unique(np.concatenate([p[0] for p in parts]))
        mx = np.full(len(docs), -np.inf, dtype=np.float64)
        sm = np.zeros(len(docs), dtype=np.float64)
        for cd, cs in parts:
            pos = np.searchsorted(docs, cd)
            np.maximum.at(mx, pos, cs)
            sm[pos] += cs
        tie = float(wire["tie"])
        return docs, mx + tie * (sm - mx)
    if kind == "min_should":
        # union + per-doc child-match count; keep docs matched by >= m
        # children, score = sum of matching children (minimumShouldMatch)
        parts = [eval_node(c, term_data, max_doc, scorer, aux) for c in wire["children"]]
        parts = [p for p in parts if len(p[0])]
        if len(parts) < int(wire["m"]):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        uniq, inv, counts = np.unique(docs, return_inverse=True, return_counts=True)
        summed = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(summed, inv, scores)
        keep = counts >= int(wire["m"])
        return uniq[keep], summed[keep]
    if kind == "terms_set":
        # per-doc minimum_should_match from a doc-value field (Lucene
        # CoveringQuery): min_should counting, but the threshold m is
        # looked up per doc in the aux-delivered (doc, value) arrays.
        # A doc with no stored m requires 1 (CoveringQuery treats
        # missing as a disjunction).
        parts = [eval_node(c, term_data, max_doc, scorer, aux) for c in wire["children"]]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        uniq, inv, counts = np.unique(docs, return_inverse=True, return_counts=True)
        summed = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(summed, inv, scores)
        rid = wire["mfield"]["rid"]
        m = np.ones(len(uniq), dtype=np.float64)
        mdocs = aux.get(rid) if aux else None
        if mdocs is not None and len(mdocs):
            mvals = aux.get(("val", rid))
            pos = np.searchsorted(mdocs, uniq)
            pos_c = np.minimum(pos, len(mdocs) - 1)
            found = mdocs[pos_c] == uniq
            # missing m stays at the floor of 1
            m[found] = np.maximum(mvals[pos_c[found]], 1.0)
        keep = counts >= m
        return uniq[keep], summed[keep]
    if kind == "and":
        if all(c["kind"] == "term" for c in wire["children"]):
            return eval_and_terms(wire["children"], term_data, scorer)
        parts = [eval_node(c, term_data, max_doc, scorer, aux) for c in wire["children"]]
        # smallest-first ordering (intersection_scorer.go:24-27), stable on ties
        order = sorted(range(len(parts)), key=lambda i: (len(parts[i][0]), i))
        docs = parts[order[0]][0]
        for i in order[1:]:
            docs = np.intersect1d(docs, parts[i][0], assume_unique=True)
            if len(docs) == 0:
                break
        total = np.zeros(len(docs), dtype=np.float64)
        for i in order:  # sum child scores in the sorted order
            cd, cs = parts[i]
            pos = np.searchsorted(cd, docs)
            total += cs[pos]
        return docs, total
    if kind == "filter":
        fd, _ = eval_node(wire["filt"], term_data, max_doc, scorer, aux)
        if wire["base"] is None:
            # pure-filter: constant score 0.0 (ConstantScore analog)
            return fd, np.zeros(len(fd), dtype=np.float64)
        bd, bs = eval_node(wire["base"], term_data, max_doc, scorer, aux)
        if len(bd) == 0 or len(fd) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        keep = np.isin(bd, fd, assume_unique=True)
        return bd[keep], bs[keep]
    if kind == "not":
        bd, bs = eval_node(wire["base"], term_data, max_doc, scorer, aux)
        ed, _ = eval_node(wire["exclude"], term_data, max_doc, scorer, aux)
        if len(ed) and len(bd):
            keep = ~np.isin(bd, ed)
            return bd[keep], bs[keep]
        return bd, bs
    if kind == "boosting":
        # ES boosting query: the match set is base's; docs also matching
        # demote keep their membership but score * negative_boost
        bd, bs = eval_node(wire["base"], term_data, max_doc, scorer, aux)
        dd, _ = eval_node(wire["demote"], term_data, max_doc, scorer, aux)
        if len(dd) and len(bd):
            hit = np.isin(bd, dd, assume_unique=True)
            bs = np.where(hit, bs * float(wire["nb"]), bs)
        return bd, bs
    if kind == "must_should":
        md, ms = eval_node(wire["must"], term_data, max_doc, scorer, aux)
        sd, ss = eval_node(wire["should"], term_data, max_doc, scorer, aux)
        if len(sd):
            pos = np.searchsorted(sd, md)
            pos_c = np.clip(pos, 0, len(sd) - 1)
            hit = sd[pos_c] == md
            add = np.where(hit, ss[pos_c], 0.0)
        else:
            add = np.zeros(len(md), dtype=np.float64)
        return md, ms + add
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# block-max WAND (exact) for pure term unions
# ---------------------------------------------------------------------------


SMALL_TERM_MAX = 4096  # posting-count ceiling for "decode fully upfront"


def _ub_at_docs(tp: TermPostings, ub: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Block upper bound applying at each doc (0 past the last block)."""
    idx = np.searchsorted(tp.block_max_doc, docs, side="left")
    out = np.zeros(len(docs), dtype=np.float64)
    inside = idx < len(ub)
    out[inside] = ub[idx[inside]]
    return out


def wand_union_topk(
    term_wires: list[dict],
    term_data: dict,
    k: int,
    scorer: str,
    stats: dict | None = None,
    dels: np.ndarray | None = None,
):
    """Exact top-k for OR-of-terms with block-max skipping.

    Essential-list BMW, vectorized:
    1. "small" terms (doc_freq <= SMALL_TERM_MAX; at least one, falling
       back to the highest-impact term) are decoded fully and scored
       exactly — they seed the threshold theta = k-th best small-union
       score (a valid lower bound on the true k-th score).
    2. each doc's score is bounded by its exact small contributions plus
       the doc-aligned block upper bounds of the large terms; small-list
       docs below theta are dropped.
    3. docs matched ONLY by large terms are bounded by the piecewise
       step-sum of large-term block bounds over doc space; only segments
       where that sum reaches theta survive.
    4. large-term blocks are decoded only where they overlap a surviving
       segment or contain a surviving small-list doc, then exact scores
       are assembled (summing in original child order — float-identical
       to the exhaustive path) and non-candidates are dropped.

    Every skipped doc provably scores < theta <= true k-th best, so the
    result is rank-identical to exhaustive evaluation (WAND is exact).

    ``dels`` (sorted tombstoned local docIDs): deleted docs are masked
    from every decoded posting list BEFORE the threshold is seeded, so
    theta is the k-th best SURVIVOR score — a survivor that belongs in
    the top-k after deletions can never be pruned by a deleted doc's
    score. Block upper bounds may come from deleted docs; that only
    loosens them (still valid bounds), it cannot drop a candidate.
    """
    tps, wires = [], []
    for w in term_wires:
        tp = term_data.get((w["field"], w["term"]))
        if tp is not None and tp.n_blocks:
            tps.append(tp)
            wires.append(w)
    n_terms = len(tps)
    if n_terms == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    has_dels = dels is not None and len(dels)

    def mask_dels(d, *aligned):
        if not has_dels or not len(d):
            return (d, *aligned)
        keep = ~np.isin(d, dels)
        return (d[keep], *(a[keep] for a in aligned))

    def exhaustive():
        parts = []
        for tp, w in zip(tps, wires):
            d, t, ln = tp.decode()
            d, t, ln = mask_dels(d, t, ln)
            parts.append((d, score_postings(t, ln, w["idf"], w["avgdl"], scorer)))
        return _union_arrays(parts)

    total_postings = sum(tp.doc_freq for tp in tps)
    if total_postings <= max(8 * k, 2048):
        return exhaustive()

    ubs = [block_upper_bounds(tp, w["idf"], w["avgdl"], scorer) for tp, w in zip(tps, wires)]
    small = [i for i in range(n_terms) if tps[i].doc_freq <= SMALL_TERM_MAX]
    if not small:
        small = [int(np.argmax([u.max() for u in ubs]))]
    large = [i for i in range(n_terms) if i not in set(small)]
    if not large:
        return exhaustive()

    # 1. decode small terms fully (survivors only); exact small-union scores
    small_decoded: dict[int, tuple] = {}
    small_parts = []
    for i in small:
        d, t, ln = tps[i].decode()
        d, t, ln = mask_dels(d, t, ln)
        s = score_postings(t, ln, wires[i]["idf"], wires[i]["avgdl"], scorer)
        small_decoded[i] = (d, s)
        small_parts.append((d, s))
    sd, ss = _union_arrays(small_parts)
    if len(ss) >= k:
        theta = np.partition(ss, len(ss) - k)[len(ss) - k]
    else:
        theta = -np.inf

    # 2. bound small-list docs: exact small + aligned large block bounds
    bound_small = ss.copy()
    for i in large:
        bound_small += _ub_at_docs(tps[i], ubs[i], sd)
    cand_docs = sd[bound_small >= theta]

    # 3. surviving doc ranges where large terms ALONE could reach theta
    seg_starts = seg_ends = None
    if np.isfinite(theta):
        starts = np.unique(np.concatenate([tps[i].block_lower_bounds() for i in large]))
        total = np.zeros(len(starts), dtype=np.float64)
        for i in large:
            idx = np.searchsorted(tps[i].block_max_doc, starts, side="left")
            inside = idx < len(ubs[i])
            total[inside] += ubs[i][idx[inside]]
        alive = total >= theta
        if alive.any():
            # merge adjacent alive segments into [start, end] ranges
            ends = np.concatenate([starts[1:] - 1, [np.iinfo(np.int64).max]])
            a = np.flatnonzero(alive)
            brk = np.flatnonzero(np.diff(a) > 1)
            run_starts = np.concatenate(([a[0]], a[brk + 1]))
            run_ends = np.concatenate((a[brk], [a[-1]]))
            seg_starts = starts[run_starts]
            seg_ends = ends[run_ends]
    else:
        # no threshold: everything is a candidate range
        seg_starts = np.array([0], dtype=np.int64)
        seg_ends = np.array([np.iinfo(np.int64).max], dtype=np.int64)

    # 4. decode large blocks overlapping candidates; assemble exact scores
    parts_by_idx: dict[int, tuple] = dict(small_decoded)
    for i in large:
        lo = tps[i].block_lower_bounds()
        hi = tps[i].block_max_doc
        need = np.searchsorted(cand_docs, lo, side="left") < np.searchsorted(
            cand_docs, hi, side="right"
        )
        if seg_starts is not None and len(seg_starts):
            # block [lo,hi] overlaps range [s,e]  <=>  s <= hi and e >= lo
            j = np.searchsorted(seg_ends, lo, side="left")
            j_ok = j < len(seg_starts)
            ov = np.zeros(len(lo), dtype=bool)
            ov[j_ok] = seg_starts[j[j_ok]] <= hi[j_ok]
            need |= ov
        sel = np.flatnonzero(need)
        if stats is not None:
            stats["blocks_total"] = stats.get("blocks_total", 0) + tps[i].n_blocks
            stats["blocks_kept"] = stats.get("blocks_kept", 0) + len(sel)
        d, t, ln = tps[i].decode(sel)
        d, t, ln = mask_dels(d, t, ln)
        parts_by_idx[i] = (d, score_postings(t, ln, wires[i]["idf"], wires[i]["avgdl"], scorer))

    # original child order for float-sum parity with the exhaustive path
    docs, scores = _union_arrays([parts_by_idx[i] for i in range(n_terms)])

    # final candidate filter: in cand_docs OR inside a surviving range
    keep = np.zeros(len(docs), dtype=bool)
    if len(cand_docs):
        pos = np.searchsorted(cand_docs, docs)
        pos_c = np.clip(pos, 0, len(cand_docs) - 1)
        keep |= cand_docs[pos_c] == docs
    if seg_starts is not None and len(seg_starts):
        j = np.searchsorted(seg_ends, docs, side="left")
        j_ok = j < len(seg_starts)
        in_rng = np.zeros(len(docs), dtype=bool)
        in_rng[j_ok] = seg_starts[j[j_ok]] <= docs[j_ok]
        keep |= in_rng
    return docs[keep], scores[keep]


def topk_arrays(docs: np.ndarray, scores: np.ndarray, k: int | None):
    """Rank by (score desc, doc asc) and cut to k — the pinned total order
    (top_score_collector.go:23-28 + our cross-segment totalization)."""
    if k is None or len(docs) <= k:
        order = np.lexsort((docs, -scores))
        return docs[order], scores[order]
    # exact: select everything >= the kth score (keeps ties), then lexsort
    kth = np.partition(-scores, k - 1)[k - 1]
    sel = np.flatnonzero(-scores <= kth)
    order = np.lexsort((docs[sel], -scores[sel]))[:k]
    return docs[sel][order], scores[sel][order]


# ---------------------------------------------------------------------------
# Spark orchestration
# ---------------------------------------------------------------------------


def _postings_glob(index_dir: str) -> str:
    return f"{index_dir}/segments/*/postings.parquet"


def _docmap_glob(index_dir: str) -> str:
    return f"{index_dir}/segments/*/docmap.parquet"


def _read_segment_files(spark, index_dir: str, manifest, fname: str, schema: str | None):
    """Manifest-driven segment reads — the committed manifest is the
    source of truth, NOT the filesystem: a segments/* glob would also
    scan stale dirs (crashed builds, superseded segments awaiting GC)
    and return duplicate/phantom documents. Cache key includes the
    opstamp so any commit naturally invalidates."""
    key = (id(spark), index_dir, fname, manifest.opstamp)
    df = _DF_CACHE.get(key)
    if df is None:
        paths = [
            f"{index_dir}/segments/{s.segment_id}/{fname}" for s in manifest.segments
        ]
        if not paths:
            df = spark.createDataFrame([], schema or "segment_id string, doc long")
        else:
            reader = spark.read
            if schema:
                reader = reader.schema(schema)
            else:
                # docmap reads infer their schema: merge across segments
                # so columns added by schema evolution (manifest.add_field
                # with store/doc-value) surface as nulls on older segments
                # instead of vanishing behind one sampled file's schema
                reader = reader.option("mergeSchema", "true")
            df = reader.parquet(*paths)
        _DF_CACHE[key] = df
    return df


def read_postings(spark, index_dir: str, manifest):
    return _read_segment_files(spark, index_dir, manifest, "postings.parquet", POSTINGS_SPARK_SCHEMA)


def read_docmap(spark, index_dir: str, manifest):
    return _read_segment_files(spark, index_dir, manifest, "docmap.parquet", None)


def read_norms(spark, index_dir: str, manifest):
    """Per-segment field-norms table: (segment_id, doc, field, length).
    Combined-fields scoring reads it (filter pushed on ``field``) to
    deliver every doc's field length down the aux cogroup — the Lucene
    norms-read analog."""
    return _read_segment_files(spark, index_dir, manifest, "norms.parquet", None)


def _term_predicate(F, terms) -> "object":
    return reduce(
        or_,
        [(F.col("field") == t.field_id) & (F.col("term") == t.term) for t in terms],
    )


def _term_stats_valid(stats_path: str, manifest) -> bool:
    """term_stats is trusted only when its recorded opstamp matches the
    opstamp the committed manifest says its stats were built at
    (stats.term_stats_opstamp). A crash between save_manifest and the
    stats promote leaves the pair mismatched — fall back to summing
    segment postings rather than scoring with a stale/foreign doc_freq.
    Indexes from before the pairing existed (no meta on either side)
    remain accepted."""
    import json as _json

    expected = manifest.stats.get("term_stats_opstamp")
    meta_path = os.path.join(stats_path, "_STATS_META.json")
    actual = None
    if os.path.isdir(stats_path) and os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                actual = _json.load(f).get("opstamp")
        except (OSError, ValueError):
            return False
    return expected == actual


def bind_stats(spark, index_dir: str, manifest: Manifest, logical):
    """Global stats binding (Weight construction, term_query.go:22-35).

    Prefers the commit-time term_stats.parquet (one tiny file, predicate
    pushdown on term) — the 'precomputed global stats table updated at
    commit/merge' design; falls back to summing doc_freq across the
    segment postings when absent."""
    return bind_stats_for_terms(spark, index_dir, manifest, collect_terms(logical))


def bind_stats_for_terms(spark, index_dir: str, manifest: Manifest, terms):
    """bind_stats over an explicit (deduplicated) term list — the batched
    multi-query path binds stats for ALL queries in one lookup."""
    import os

    from pyspark.sql import functions as F
    doc_freqs: dict[tuple[int, str], int] = {}
    if terms:
        stats_path = os.path.join(index_dir, "term_stats.parquet")
        if os.path.exists(stats_path) and _term_stats_valid(stats_path, manifest):
            # driver-side pyarrow lookup with predicate pushdown — the
            # term-dict read is metadata access, not cluster work (the
            # file is (field, term)-sorted so row-group stats prune)
            import glob as _glob

            import pyarrow.dataset as ds

            # stats may be a Spark-written dir (skip _SUCCESS markers)
            files = (
                sorted(_glob.glob(os.path.join(stats_path, "*.parquet")))
                if os.path.isdir(stats_path)
                else [stats_path]
            )
            dataset = ds.dataset(files, format="parquet")
            expr = None
            for t in terms:
                e = (ds.field("field") == t.field_id) & (ds.field("term") == t.term)
                expr = e if expr is None else (expr | e)
            tbl = dataset.to_table(filter=expr)
            for f, tm, df_ in zip(
                tbl.column("field").to_pylist(),
                tbl.column("term").to_pylist(),
                tbl.column("doc_freq").to_pylist(),
            ):
                doc_freqs[(int(f), tm)] = int(df_)
        else:
            rows = (
                read_postings(spark, index_dir, manifest)
                .filter(_term_predicate(F, terms))
                .groupBy("field", "term")
                .agg(F.sum("doc_freq").alias("df"))
                .collect()
            )
            for r in rows:
                doc_freqs[(r["field"], r["term"])] = int(r["df"])
    total_docs = manifest.stats.get("total_docs", manifest.total_docs)
    field_avgdl = {}
    for fid, toks in manifest.stats.get("field_tokens", {}).items():
        field_avgdl[int(fid)] = float(toks) / float(total_docs) if total_docs else 1.0
    return doc_freqs, total_docs, field_avgdl


def _empty_result_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "segment_id": pd.Series([], dtype=object),
            "doc": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
            "is_count": pd.Series([], dtype=bool),
        }
    )


def _after_mask(
    docs: np.ndarray, scores: np.ndarray, seg_ord: int, after: tuple
) -> np.ndarray:
    """Keep only docs strictly AFTER the cursor in the pinned total
    order (score desc, segment_ord asc, doc asc). Score equality is a
    reliable float compare: both sides are the identical deterministic
    computation, so equal ranks are bit-equal."""
    s, co, cd = after
    if seg_ord < co:
        return scores < s
    if seg_ord == co:
        return (scores < s) | ((scores == s) & (docs > cd))
    return scores <= s


def _score_segment_pdf(
    pdf: pd.DataFrame,
    wire_json: str,
    k: int | None,
    scorer: str,
    with_count: bool,
    use_wand: bool,
    dels: np.ndarray | None = None,
    aux_sets: dict | None = None,
    segment_id: str | None = None,
    after: tuple | None = None,
    seg_ords: dict | None = None,
) -> pd.DataFrame:
    """Core per-segment scoring: pruned posting rows (+ optional sorted
    tombstoned-doc array) -> top-k rows and optionally a count row.

    Tombstoned segments stay on the WAND fast path: the delete set is
    passed into wand_union_topk, which masks deleted docs from every
    decoded list BEFORE seeding the threshold (a theta contaminated by
    deleted docs could prune survivors that belong in the top-k).

    ``after`` (search_after cursor, exclusive) is applied BEFORE the
    local top-k cut, so each segment returns its best k rows after the
    cursor and the global merge stays k·segments-sized at any page
    depth — the deep-paging shape where ``offset`` would re-collect
    offset+limit rows. WAND is disabled by the caller in this mode (it
    prunes exactly the low-scoring docs the cursor pages into). The
    count row (with_count) counts ALL matches, cursor-independent."""
    wire = json.loads(wire_json)
    seg = pdf["segment_id"].iloc[0] if len(pdf) else segment_id
    term_data: dict = {}
    for (f, t), rows in pdf.groupby(["field", "term"]):
        term_data[(int(f), t)] = TermPostings(rows)

    has_dels = dels is not None and len(dels)
    if use_wand and k is not None and is_wire_term_union(wire):
        tw = wire["children"] if wire["kind"] == "or" else [wire]
        docs, scores = wand_union_topk(
            tw, term_data, k, scorer, dels=dels if has_dels else None
        )
    else:
        docs, scores = eval_node(wire, term_data, 0, scorer, aux_sets)
        if has_dels and len(docs):
            keep = ~np.isin(docs, dels)
            docs, scores = docs[keep], scores[keep]

    n_matches = len(docs)
    if after is not None and len(docs):
        keep = _after_mask(docs, scores, int((seg_ords or {}).get(seg, 0)), after)
        docs, scores = docs[keep], scores[keep]

    out_docs, out_scores = topk_arrays(docs, scores, k)
    res = pd.DataFrame(
        {
            "segment_id": seg,
            "doc": out_docs,
            "score": out_scores,
            "is_count": False,
        }
    )
    if with_count:
        res = pd.concat(
            [
                res,
                pd.DataFrame(
                    {
                        "segment_id": [seg],
                        "doc": [-1],
                        "score": [float(n_matches)],
                        "is_count": [True],
                    }
                ),
            ],
            ignore_index=True,
        )
    return res


def assign_range_ids(wire: dict, start: int = 0) -> list[dict]:
    """Pre-order walk of a wire tree: assign ``rid`` to every range node
    (mutates the dicts) and return them. ``start`` offsets the ids so a
    batched search can keep one global rid namespace across queries."""
    found: list[dict] = []

    def walk(w):
        if w is None:
            return
        if w["kind"] == "range":
            w["rid"] = start + len(found)
            found.append(w)
        for key in ("base", "exclude", "filt", "must", "should", "mfield",
                    "demote"):
            if key in w:
                walk(w[key])
        for c in w.get("children", ()):
            walk(c)
        # combined_term's per-field norms deliveries are pseudo range
        # wires (kind "range", op "norms") — rid-assigned like any other
        for nf in w.get("norm_fields", ()):
            walk(nf)

    walk(wire)
    return found


def _shape_pred(fe, relation: str, geometry: tuple):
    """Docmap predicate for one geo_shape relation (see
    schema.FIELD_TYPE_SHAPE): the four bbox columns decide ``within``
    exactly and PRUNE everything else via parquet min/max stats (the
    BKD-filter analog); ``intersects``/point/``disjoint`` then verify
    exactly with an Arrow-vectorized ring test (geo._shape_verify_udf)
    that only ever reads pruned candidates' array columns. Docs without
    a shape never match any relation, disjoint included (NULL bbox
    columns null out every branch and the filter drops them)."""
    from pyspark.sql import functions as F

    from ..geo import _shape_verify_udf
    from ..schema import (
        shape_lats_col, shape_lons_col, shape_maxlat_col,
        shape_maxlon_col, shape_minlat_col, shape_minlon_col,
    )

    mn_lat = F.col(shape_minlat_col(fe.name))
    mx_lat = F.col(shape_maxlat_col(fe.name))
    mn_lon = F.col(shape_minlon_col(fe.name))
    mx_lon = F.col(shape_maxlon_col(fe.name))
    lats = F.col(shape_lats_col(fe.name))
    lons = F.col(shape_lons_col(fe.name))
    if geometry[0] == "point":
        qlat, qlon = float(geometry[1]), float(geometry[2])
        prune = (
            (mn_lat <= qlat) & (mx_lat >= qlat)
            & (mn_lon <= qlon) & (mx_lon >= qlon)
        )
        return prune & _shape_verify_udf("point", qlat, qlon)(lats, lons)
    top, left, bottom, right = (float(v) for v in geometry[1:])
    if relation == "within":
        # ring entirely inside an axis-aligned box <=> its bbox is —
        # exact from the stored columns alone, zero array reads
        return (
            (mn_lat >= bottom) & (mx_lat <= top)
            & (mn_lon >= left) & (mx_lon <= right)
        )
    overlap = (
        (mn_lat <= top) & (mx_lat >= bottom)
        & (mn_lon <= right) & (mx_lon >= left)
    )
    verify = _shape_verify_udf("bbox", top, left, bottom, right)(lats, lons)
    if relation == "intersects":
        return overlap & verify
    # disjoint: shape present AND NOT intersecting. The bbox-disjoint
    # fast path (NOT overlap) decides most docs without touching the
    # ring arrays; only bbox-overlapping candidates run the verify.
    return mn_lat.isNotNull() & (~overlap | ~verify)


def range_match_df(spark, index_dir: str, manifest, range_wire: dict):
    """(segment_id, doc, rid) rows matching one docmap-predicate wire —
    a docmap scan with the predicate pushed to parquet (min/max /
    dictionary row-group stats prune, the Lucene-points analog). The
    match set rides the scoring shuffle via cogroup — never collected to
    the driver. ``op`` selects the predicate: absent/None = numeric
    range; ``"eq"`` = keyword equality (ES term-on-keyword); ``"exists"``
    = value IS NOT NULL (ES exists)."""
    from pyspark.sql import functions as F

    op = range_wire.get("op")
    if op == "ids":
        # identity-column membership (ES ids query): no schema field —
        # the docmap column name is the address. Values cast to the
        # column's ACTUAL dtype (string ids keep '07' != '7'); a value
        # that cannot cast to a numeric column raises loudly instead of
        # silently matching nothing. IN pushes to parquet — identity
        # columns are the row-group-pruned point-lookup columns.
        docmap = read_docmap(spark, index_dir, manifest)
        col_name = range_wire["column"]
        if col_name not in docmap.columns:
            raise ValueError(
                f"ids column {col_name!r} not in docmap "
                f"(have: {', '.join(docmap.columns)})"
            )
        target = docmap.schema[col_name].dataType
        vals = range_wire["values"]
        if target.simpleString() in (
            "tinyint", "smallint", "int", "bigint", "float", "double"
        ):
            for v in vals:
                try:
                    float(v)
                except (TypeError, ValueError):
                    raise ValueError(
                        f"ids value {v!r} cannot cast to the {col_name!r} "
                        f"column's type {target.simpleString()}"
                    ) from None
        lits = [F.lit(v).cast(target) for v in vals]
        return (
            docmap.filter(F.col(col_name).isin(*lits))
            .select(
                "segment_id", "doc",
                F.lit(int(range_wire["rid"])).alias("rid"),
                F.lit(None).cast("double").alias("val"),
            )
        )
    fe = manifest.schema.field_by_id(range_wire["field"])
    if op == "norms":
        # not a predicate: combined_fields norms DELIVERY — every doc's
        # length for ONE field ships (doc, length) to its segment's
        # scorer, the same aux shuffle as range sets / terms_set m
        # values. Field filter pushes to the norms parquet scan.
        return (
            read_norms(spark, index_dir, manifest)
            .filter(F.col("field") == int(range_wire["field"]))
            .select(
                "segment_id", "doc",
                F.lit(int(range_wire["rid"])).alias("rid"),
                F.col("length").cast("double").alias("val"),
            )
        )
    # geo fields live in the docmap as a __lat/__lon float64 pair
    # (schema.geo_lat_col/geo_lon_col), shapes as bbox + ring columns;
    # every other doc-value type is a single column named after the field
    from ..schema import (
        geo_lat_col, geo_lon_col, hist_vals_col, range_hi_col,
        range_lo_col, shape_minlat_col,
    )

    probe_col = (
        geo_lat_col(fe.name) if fe.is_geo
        else shape_minlat_col(fe.name) if fe.is_shape
        else range_lo_col(fe.name) if fe.is_range
        else hist_vals_col(fe.name) if fe.is_histogram
        else fe.name
    )
    col = F.col(probe_col)
    val_col = None  # op "dv" ships a per-doc VALUE down the aux cogroup
    if op == "exists":
        if not fe.is_doc_value:
            raise ValueError(
                f"exists query on non-doc-value field {fe.name!r} "
                f"(type {fe.field_type!r}) — text fields always exist"
            )
        pred = col.isNotNull()
    elif op == "dv":
        # doc-value DELIVERY (terms_set minimum_should_match_field): not
        # a predicate — every doc WITH a value ships (doc, value) to its
        # segment's scorer through the same aux shuffle as range sets
        if not fe.is_numeric:
            raise ValueError(
                f"terms_set minimum_should_match_field {fe.name!r} must "
                f"be a numeric doc-value field (got {fe.field_type!r})"
            )
        pred = col.isNotNull()
        val_col = col.cast("double")
    elif op == "geo_distance":
        if not fe.is_geo:
            raise ValueError(
                f"geo_distance query on non-geo field {fe.name!r} "
                f"(type {fe.field_type!r})"
            )
        from ..geo import haversine_m

        dist = haversine_m(geo_lat_col(fe.name), geo_lon_col(fe.name),
                           range_wire["lat"], range_wire["lon"])
        # NULL lat -> NULL distance -> filter drops it (no point never
        # matches); the trig runs JVM-side in the docmap scan
        pred = dist <= F.lit(float(range_wire["radius_m"]))
    elif op == "geo_bbox":
        if not fe.is_geo:
            raise ValueError(
                f"geo_bbox query on non-geo field {fe.name!r} "
                f"(type {fe.field_type!r})"
            )
        from ..geo import bbox_pred

        pred = bbox_pred(
            geo_lat_col(fe.name), geo_lon_col(fe.name),
            range_wire["top"], range_wire["left"],
            range_wire["bottom"], range_wire["right"],
        )
    elif op == "geo_polygon":
        if not fe.is_geo:
            raise ValueError(
                f"geo_polygon query on non-geo field {fe.name!r} "
                f"(type {fe.field_type!r})"
            )
        from ..geo import polygon_pred

        pred = polygon_pred(
            geo_lat_col(fe.name), geo_lon_col(fe.name),
            range_wire["points"],
        )
    elif op == "geo_shape":
        if not fe.is_shape:
            raise ValueError(
                f"geo_shape query on non-shape field {fe.name!r} "
                f"(type {fe.field_type!r})"
            )
        pred = _shape_pred(
            fe, range_wire["relation"], tuple(range_wire["geometry"])
        )
    elif op == "range_field":
        if not fe.is_range:
            raise ValueError(
                f"range-field query on non-range field {fe.name!r} "
                f"(type {fe.field_type!r}) — plain numerics take "
                f"field:[lo TO hi]"
            )
        # interval arithmetic over the typed bound pair, all bounds
        # INCLUSIVE (the ES relation semantics); open query ends (None)
        # drop their comparison; NULL bounds (no range) never match —
        # NULL comparisons are SQL-NULL and filter() drops them
        d_lo, d_hi = F.col(range_lo_col(fe.name)), F.col(range_hi_col(fe.name))
        q_lo, q_hi = range_wire["lo"], range_wire["hi"]
        rel = range_wire["relation"]
        preds = []
        if rel == "intersects":
            if q_hi is not None:
                preds.append(d_lo <= F.lit(q_hi))
            if q_lo is not None:
                preds.append(d_hi >= F.lit(q_lo))
            if not preds:
                preds.append(d_lo.isNotNull())
        elif rel == "within":
            if q_lo is not None:
                preds.append(d_lo >= F.lit(q_lo))
            if q_hi is not None:
                preds.append(d_hi <= F.lit(q_hi))
            if not preds:
                preds.append(d_lo.isNotNull())
        else:  # contains
            if q_lo is not None:
                preds.append(d_lo <= F.lit(q_lo))
            if q_hi is not None:
                preds.append(d_hi >= F.lit(q_hi))
            if not preds:
                preds.append(d_lo.isNotNull())
        pred = preds[0]
        for p in preds[1:]:
            pred = pred & p
        # a fully-open within/contains still needs the range present
        pred = pred & d_lo.isNotNull()
    elif op == "eq":
        if not fe.is_keyword and not fe.is_ip:
            raise ValueError(
                f"keyword query on non-keyword field {fe.name!r} "
                f"(type {fe.field_type!r}); use a range for numerics"
            )
        # NULL never matches equality (SQL comparison semantics); a
        # lowercase-normalized field lowercases the QUERY value — stored
        # values are already normalized at build (ES normalizer analog).
        # ip fields normalize to the canonical hex the docmap stores
        # (raw literals accepted for programmatic ergonomics; the parser
        # already encodes NQL values — canonical passes through)
        v = range_wire["value"]
        if fe.analyzer == "lowercase":
            v = v.lower()
        if fe.is_ip:
            from ..ip import normalize_ip_value

            v = normalize_ip_value(v, fe.name)
        pred = col == v
    elif op == "in":
        if not fe.is_keyword and not fe.is_ip:
            raise ValueError(
                f"terms query on non-keyword field {fe.name!r} "
                f"(type {fe.field_type!r}); use a range for numerics"
            )
        # ONE scan for the whole value set (vs N scans for OR-of-eq);
        # In pushes to parquet like equality. NULL never matches IN.
        vals = range_wire["values"]
        if fe.analyzer == "lowercase":
            vals = [v.lower() for v in vals]
        if fe.is_ip:
            from ..ip import normalize_ip_value

            vals = [normalize_ip_value(v, fe.name) for v in vals]
        pred = col.isin(vals)
    else:
        str_bounds = any(
            isinstance(range_wire[k], str) for k in ("lo", "hi")
        )
        if str_bounds or fe.is_keyword or fe.is_ip:
            # lexicographic range over a keyword/ip field (Lucene
            # TermRangeQuery analog); parquet string min/max stats prune
            if not fe.is_keyword and not fe.is_ip:
                raise ValueError(
                    f"string range bounds on non-keyword field {fe.name!r} "
                    f"(type {fe.field_type!r})"
                )
            if not str_bounds or any(
                range_wire[k] is not None and not isinstance(range_wire[k], str)
                for k in ("lo", "hi")
            ):
                raise ValueError(
                    f"range query on keyword field {fe.name!r} needs "
                    f"string bounds"
                )
        elif not fe.is_numeric and not fe.is_date:
            # date fields take this numeric path too: their docmap column
            # is int64 epoch micros and the parser resolved ISO bounds to
            # micros already (schema.FIELD_TYPE_DATE — dates are longs,
            # the Lucene/ES representation)
            raise ValueError(
                f"range query on non-numeric field {fe.name!r} (type {fe.field_type!r})"
            )
        lo, hi = range_wire["lo"], range_wire["hi"]
        if fe.is_keyword and fe.analyzer == "lowercase":
            # normalized field: bounds lowercase like query values do
            lo = lo.lower() if lo is not None else None
            hi = hi.lower() if hi is not None else None
        if fe.is_ip:
            # ip bounds normalize to canonical hex (raw literals
            # accepted; parser-encoded / canonical bounds pass through)
            from ..ip import normalize_ip_value

            lo = normalize_ip_value(lo, fe.name) if lo is not None else None
            hi = normalize_ip_value(hi, fe.name) if hi is not None else None
        pred = None
        if lo is not None:
            p = col >= lo if range_wire["incl_lo"] else col > lo
            pred = p
        if hi is not None:
            p = col <= hi if range_wire["incl_hi"] else col < hi
            pred = p if pred is None else (pred & p)
    docmap = read_docmap(spark, index_dir, manifest)
    if probe_col not in docmap.columns:
        # evolved field with no committed data yet: NO segment's docmap
        # carries the column (mergeSchema can't invent it), so no doc has
        # a value — empty match set, same semantics as all-NULL
        return docmap.select(
            "segment_id", "doc", F.lit(int(range_wire["rid"])).alias("rid"),
            F.lit(None).cast("double").alias("val"),
        ).limit(0)
    return (
        docmap
        .filter(pred)
        .select(
            "segment_id", "doc", F.lit(int(range_wire["rid"])).alias("rid"),
            (val_col if val_col is not None else F.lit(None).cast("double")).alias("val"),
        )
    )


def build_aux_df(spark, index_dir: str, manifest, range_wires: list[dict], tombstoned: bool):
    """Union of all range match sets (rid >= 0) and, when present, the
    tombstone set (rid = -1) — ONE cogroup side for the scoring shuffle."""
    from pyspark.sql import functions as F

    from ..deletes import read_tombstones

    parts = [range_match_df(spark, index_dir, manifest, rw) for rw in range_wires]
    if tombstoned:
        parts.append(
            read_tombstones(spark, index_dir, manifest).select(
                "segment_id", "doc", F.lit(-1).alias("rid"),
                F.lit(None).cast("double").alias("val"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def split_aux_pdf(aux_pdf: pd.DataFrame):
    """Cogroup side -> (sorted tombstone doc array or None,
    {rid: sorted unique doc array}). A rid whose rows carry a non-null
    ``val`` (the terms_set m-value delivery, op "dv") additionally
    stores ``("val", rid) -> float64 array`` aligned to the sorted doc
    array — eval_node's terms_set branch reads both."""
    dels = None
    aux_sets: dict = {}
    has_val = aux_pdf is not None and "val" in getattr(aux_pdf, "columns", ())
    if aux_pdf is not None and len(aux_pdf):
        for rid, rows in aux_pdf.groupby("rid"):
            docs_raw = rows["doc"].to_numpy(dtype=np.int64)
            docs, first_idx = np.unique(docs_raw, return_index=True)
            if int(rid) < 0:
                dels = docs
            else:
                aux_sets[int(rid)] = docs
                if has_val and rows["val"].notna().any():
                    vals = rows["val"].to_numpy(dtype=np.float64)
                    aux_sets[("val", int(rid))] = vals[first_idx]
    return dels, aux_sets


def make_segment_scorer(
    wire_json: str, k: int | None, scorer: str, with_count: bool, use_wand: bool,
    after: tuple | None = None, seg_ords: dict | None = None,
):
    """applyInPandas scorer for indexes without tombstones."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_segment_pdf(
            pdf, wire_json, k, scorer, with_count, use_wand,
            after=after, seg_ords=seg_ords,
        )

    return fn


def make_segment_scorer_cogroup(
    wire_json: str, k: int | None, scorer: str, with_count: bool, use_wand: bool,
    after: tuple | None = None, seg_ords: dict | None = None,
):
    """Cogrouped scorer: (postings, tombstones) per segment. The delete
    set rides the SAME shuffle as the postings (cogroup on segment_id) —
    no driver-side collect, no broadcast of the tombstone table."""

    def fn(pdf: pd.DataFrame, tomb: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            # segment has tombstones but no posting rows for these terms
            return _empty_result_pdf()
        dels = np.unique(tomb["doc"].to_numpy(dtype=np.int64)) if len(tomb) else None
        return _score_segment_pdf(
            pdf, wire_json, k, scorer, with_count, use_wand, dels,
            after=after, seg_ords=seg_ords,
        )

    return fn


def make_segment_scorer_aux(
    wire_json: str, k: int | None, scorer: str, with_count: bool, use_wand: bool,
    after: tuple | None = None, seg_ords: dict | None = None,
):
    """Cogrouped scorer: (postings, aux) per segment where aux carries
    range match sets (rid >= 0) and tombstones (rid = -1) down the SAME
    shuffle. Evaluates even when the postings side is empty — a range
    clause can match docs in a segment holding no posting rows for the
    query's terms (cogroup is full-outer on keys)."""

    def fn(pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
        dels, aux_sets = split_aux_pdf(aux_pdf)
        if not len(pdf) and not aux_sets:
            # tombstone-only segment with no matching posting rows
            return _empty_result_pdf()
        seg = (
            pdf["segment_id"].iloc[0]
            if len(pdf)
            else aux_pdf["segment_id"].iloc[0]
        )
        return _score_segment_pdf(
            pdf, wire_json, k, scorer, with_count, use_wand, dels, aux_sets, seg,
            after=after, seg_ords=seg_ords,
        )

    return fn


def _mark_pos_aligned(node) -> None:
    """Stamp phrase/multi_phrase/near wire nodes with pos_aligned=True
    so segment-side evaluation may decode position-block SUBSETS —
    only called when manifest.stats["pos_layout"] == "doc_aligned"
    (r4+ builds; pre-r4 occurrence-aligned indices keep the full-decode
    path). The walk is generic over the wire tree (children lists,
    base/positive/negative sub-nodes)."""
    if isinstance(node, dict):
        if node.get("kind") in ("phrase", "multi_phrase", "near"):
            node["pos_aligned"] = True
        for v in node.values():
            _mark_pos_aligned(v)
    elif isinstance(node, list):
        for v in node:
            _mark_pos_aligned(v)


def is_wire_term_union(wire: dict) -> bool:
    if wire["kind"] == "term":
        return True
    return wire["kind"] == "or" and all(c["kind"] == "term" for c in wire["children"])


def search(
    spark,
    index_dir: str,
    query,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    with_count: bool = False,
    use_wand: bool = True,
    default_fields: list[str] | None = None,
    manifest: Manifest | None = None,
    after: tuple | None = None,
    stats_override: tuple | None = None,
    default_operator: str = "or",
):
    """Run a query; returns (results DataFrame, count or None).

    ``default_operator`` (string queries only) picks how adjacent bare
    primaries combine: "or" (the reference's implicit OR) or "and"
    (the ES query_string default_operator=AND behavior).

    ``stats_override`` = (doc_freqs, total_docs, field_avgdl) replaces
    the index-local stats binding — the multi-index alias path
    (query/multi.py) binds GLOBAL stats across every index of the alias
    so per-index scores are comparable in one merged ranking. Callers
    passing it must have already rewritten multi-term nodes (expansion
    consults the dictionary, which an override cannot represent).

    Results columns: segment_id, segment_ord, doc, score — ordered by the
    pinned total order, offset/limit applied. ``limit=None`` returns every
    match (the ForEach path, used by Count/exhaustive collectors).

    ``manifest`` pins the snapshot: pass the same manifest to
    attach_docmap so results and docmap come from one commit point even
    if a merge/commit lands in between.

    ``after`` = (score, segment_ord, doc) of the last row of the
    previous page (the columns search returns) — cursor pagination
    (Elasticsearch search_after analog). Returns the next ``limit``
    rows strictly after that row in the pinned total order. Unlike
    ``offset`` (which makes every segment return offset+limit rows),
    the cursor filters BEFORE each segment's local top-k, so page 10^4
    costs the same as page 1. Mutually exclusive with ``offset``;
    disables WAND (WAND prunes exactly the low scores being paged
    into). Reuse the same pinned ``manifest`` across pages — a merge
    between pages renumbers segment_ord and invalidates cursors.
    """
    from pyspark.sql import functions as F

    if after is not None:
        if offset:
            raise ValueError("search_after and offset are mutually exclusive")
        after = (float(after[0]), int(after[1]), int(after[2]))
        use_wand = False
    if manifest is None:
        manifest = load_manifest(index_dir)
    schema = manifest.schema
    logical = (
        parse_query(query, schema, default_fields, default_operator)
        if isinstance(query, str)
        else query
    )

    from .expand import has_multiterm, rewrite_multiterm

    if has_multiterm(logical):
        # prefix/fuzzy nodes expand against the term dictionary into
        # plain term unions before stats binding
        logical = rewrite_multiterm(spark, index_dir, manifest, logical)

    if stats_override is not None:
        doc_freqs, total_docs, field_avgdl = stats_override
    else:
        doc_freqs, total_docs, field_avgdl = bind_stats(
            spark, index_dir, manifest, logical
        )
    compiled = compile_query(logical, doc_freqs, total_docs, field_avgdl, scorer)
    wire = to_wire(compiled)
    if manifest.stats.get("pos_layout") == "doc_aligned":
        _mark_pos_aligned(wire)

    ords = [(s.segment_id, i) for i, s in enumerate(manifest.sorted_segments())]

    def with_segment_ord(df):
        # SegmentOrd attachment: literal map for ordinary segment counts
        # (no broadcast-materialization job); broadcast join beyond that
        if len(ords) <= 10_000:
            mapping = F.create_map(*[x for sid, o in ords for x in (F.lit(sid), F.lit(o))])
            return df.withColumn("segment_ord", mapping[F.col("segment_id")].cast("int"))
        ord_df = spark.createDataFrame(ords, "segment_id string, segment_ord int")
        return df.join(F.broadcast(ord_df), "segment_id")

    def apply_after(df):
        if after is None:
            return df
        s, co, cd = after
        return df.filter(
            (F.col("score") < s)
            | (
                (F.col("score") == s)
                & (
                    (F.col("segment_ord") > co)
                    | ((F.col("segment_ord") == co) & (F.col("doc") > cd))
                )
            )
        )

    if wire["kind"] == "empty":
        empty = spark.createDataFrame([], "segment_id string, segment_ord int, doc long, score double")
        return empty, (0 if with_count else None)

    from ..deletes import has_tombstones, read_tombstones, tombstone_count

    tombstoned = has_tombstones(index_dir, manifest)

    if wire["kind"] == "all":
        # AllQuery (all_query.go:11-77): every doc scores 1.0; scan docmap
        base = read_docmap(spark, index_dir, manifest).select("segment_id", "doc")
        # count is index-LOCAL even when stats_override carries the
        # alias-global total (equal to total_docs otherwise)
        all_count = manifest.stats.get("total_docs", manifest.total_docs)
        if tombstoned:
            base = base.join(
                read_tombstones(spark, index_dir, manifest), ["segment_id", "doc"], "left_anti"
            )
            all_count = total_docs - tombstone_count(
                index_dir, {s.segment_id for s in manifest.segments}
            )
        docs = apply_after(with_segment_ord(base).withColumn("score", F.lit(1.0)))
        out = docs.orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
        if offset:
            out = out.offset(offset)
        if limit is not None:
            out = out.limit(limit)
        return out.select("segment_id", "segment_ord", "doc", "score"), (
            all_count if with_count else None
        )

    if wire["kind"] == "range":
        # top-level pure range: docmap scan with the predicate pushed to
        # parquet (the AllQuery path's shape) — no Python scorer at all
        assign_range_ids(wire)
        base = range_match_df(spark, index_dir, manifest, wire).select(
            "segment_id", "doc"
        )
        if tombstoned:
            base = base.join(
                read_tombstones(spark, index_dir, manifest), ["segment_id", "doc"], "left_anti"
            )
        range_count = base.count() if with_count else None
        docs = apply_after(
            with_segment_ord(base).withColumn("score", F.lit(float(wire["score"])))
        )
        out = docs.orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
        if offset:
            out = out.offset(offset)
        if limit is not None:
            out = out.limit(limit)
        return out.select("segment_id", "segment_ord", "doc", "score"), range_count

    terms = collect_terms(logical)
    k = None if limit is None else limit + offset
    range_wires = assign_range_ids(wire)
    if terms:
        pruned = read_postings(spark, index_dir, manifest).filter(
            _term_predicate(F, terms)
        )
    else:
        # range-only composite (e.g. pure-filter over ranges): no terms
        # to prune on; the aux side drives the cogroup
        pruned = spark.createDataFrame([], POSTINGS_SPARK_SCHEMA)
    # WAND prunes non-candidates, so the exhaustive count must disable it
    seg_ords = dict(ords) if after is not None else None
    if range_wires:
        aux = build_aux_df(spark, index_dir, manifest, range_wires, tombstoned)
        fn3 = make_segment_scorer_aux(
            json.dumps(wire), k, scorer, with_count, use_wand and not with_count,
            after=after, seg_ords=seg_ords,
        )
        seg_results = (
            pruned.groupBy("segment_id")
            .cogroup(aux.groupBy("segment_id"))
            .applyInPandas(fn3, RESULT_SCHEMA)
        )
    elif tombstoned:
        fn2 = make_segment_scorer_cogroup(
            json.dumps(wire), k, scorer, with_count, use_wand and not with_count,
            after=after, seg_ords=seg_ords,
        )
        seg_results = (
            pruned.groupBy("segment_id")
            .cogroup(read_tombstones(spark, index_dir, manifest).groupBy("segment_id"))
            .applyInPandas(fn2, RESULT_SCHEMA)
        )
    else:
        fn = make_segment_scorer(
            json.dumps(wire), k, scorer, with_count, use_wand and not with_count,
            after=after, seg_ords=seg_ords,
        )
        seg_results = pruned.groupBy("segment_id").applyInPandas(fn, RESULT_SCHEMA)

    count = None
    if with_count:
        seg_results = seg_results.cache()
        crow = seg_results.filter(F.col("is_count")).agg(F.sum("score")).collect()[0][0]
        count = int(crow or 0)

    hits = with_segment_ord(seg_results.filter(~F.col("is_count"))).orderBy(
        F.desc("score"), F.asc("segment_ord"), F.asc("doc")
    )
    if offset:
        hits = hits.offset(offset)
    if limit is not None:
        hits = hits.limit(limit)
    return hits.select("segment_id", "segment_ord", "doc", "score"), count


# ---------------------------------------------------------------------------
# batched multi-query execution (one Spark job for a whole query set)
# ---------------------------------------------------------------------------

MANY_RESULT_SCHEMA = "query_id string, segment_id string, doc long, score double"


def _score_segment_many_pdf(
    pdf: pd.DataFrame,
    wires_json: str,
    k: int | None,
    use_wand: bool,
    dels: np.ndarray | None = None,
    aux_sets: dict | None = None,
    segment_id: str | None = None,
) -> pd.DataFrame:
    """Evaluate EVERY query of a batch against one segment's pruned
    posting rows. term_data is decoded once and shared across queries —
    a term appearing in five queries is decoded once, not five times
    (and its posting rows ride the shuffle once, because grouping is by
    segment_id alone, not (segment_id, query_id))."""
    wires: dict = json.loads(wires_json)
    seg = pdf["segment_id"].iloc[0] if len(pdf) else segment_id
    term_data: dict = {}
    for (f, t), rows in pdf.groupby(["field", "term"]):
        term_data[(int(f), t)] = TermPostings(rows)
    has_dels = dels is not None and len(dels)
    frames = []
    for qid, entry in wires.items():
        wire, q_scorer = entry["wire"], entry["scorer"]
        if use_wand and k is not None and is_wire_term_union(wire):
            tw = wire["children"] if wire["kind"] == "or" else [wire]
            docs, scores = wand_union_topk(
                tw, term_data, k, q_scorer, dels=dels if has_dels else None
            )
        else:
            docs, scores = eval_node(wire, term_data, 0, q_scorer, aux_sets)
            if has_dels and len(docs):
                keep = ~np.isin(docs, dels)
                docs, scores = docs[keep], scores[keep]
        out_docs, out_scores = topk_arrays(docs, scores, k)
        if len(out_docs):
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": qid,
                        "segment_id": seg,
                        "doc": out_docs,
                        "score": out_scores,
                    }
                )
            )
    if not frames:
        return _empty_many_pdf()
    return pd.concat(frames, ignore_index=True)


def _empty_many_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=object),
            "segment_id": pd.Series([], dtype=object),
            "doc": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )


def search_many(
    spark,
    index_dir: str,
    queries: dict[str, object],
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    use_wand: bool = True,
    default_fields: list[str] | None = None,
    manifest: Manifest | None = None,
    scorers: dict[str, str] | None = None,
):
    """Execute a SET of queries as ONE Spark job (r1/r2 verdict item:
    amortize the fixed per-job scheduling cost that dominates interactive
    latency — the reference runs queries in-process where that cost is
    ~0, /root/reference/reader/search.go:21-66; on Spark it must be
    batched away).

    ``queries`` maps query_id -> NQL string or logical query. Returns one
    DataFrame (query_id, segment_id, segment_ord, doc, score) holding the
    per-query top-``limit`` hits in the pinned total order, row-identical
    per query to ``search()`` (regression-tested). ``scorers`` overrides
    the scorer per query_id (a real multi-tenant batch mixes tfidf and
    bm25 requests; idf constants are baked per-wire so mixing is free).

    Execution shape (scale posture):
    - stats for ALL queries bind in one term_stats lookup;
    - ONE postings scan, pruned to the union of all queries' terms
      (pushdown still applies — the predicate is an OR of (field, term)
      equalities);
    - ONE applyInPandas pass per segment evaluates every query against
      the shared decoded term data (WAND per eligible query);
    - per-query global top-k is a single window rank over the tiny
      (n_segments x n_queries x k)-row intermediate — one extra shuffle
      TOTAL, instead of one job per query.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if manifest is None:
        manifest = load_manifest(index_dir)
    schema = manifest.schema
    logicals = {
        qid: (parse_query(q, schema, default_fields) if isinstance(q, str) else q)
        for qid, q in queries.items()
    }
    from .expand import has_multiterm, rewrite_multiterm

    logicals = {
        qid: (
            rewrite_multiterm(spark, index_dir, manifest, lg)
            if has_multiterm(lg)
            else lg
        )
        for qid, lg in logicals.items()
    }

    # one stats binding for the union of all queries' terms
    all_terms = list({t for lg in logicals.values() for t in collect_terms(lg)})
    doc_freqs, total_docs, field_avgdl = bind_stats_for_terms(
        spark, index_dir, manifest, all_terms
    )

    scorers = scorers or {}
    wires: dict[str, dict] = {}
    all_qids: list[str] = []
    range_wires: list[dict] = []  # one rid namespace across the batch
    pos_aligned = manifest.stats.get("pos_layout") == "doc_aligned"
    for qid, lg in logicals.items():
        q_scorer = scorers.get(qid, scorer)
        wire = to_wire(compile_query(lg, doc_freqs, total_docs, field_avgdl, q_scorer))
        if pos_aligned:
            _mark_pos_aligned(wire)
        if wire["kind"] == "empty":
            continue  # contributes no rows
        if wire["kind"] == "all":
            all_qids.append(qid)
        else:
            range_wires.extend(assign_range_ids(wire, start=len(range_wires)))
            wires[qid] = {"wire": wire, "scorer": q_scorer}

    ords = [(s.segment_id, i) for i, s in enumerate(manifest.sorted_segments())]

    def with_segment_ord(df):
        if len(ords) <= 10_000:
            mapping = F.create_map(*[x for sid, o in ords for x in (F.lit(sid), F.lit(o))])
            return df.withColumn("segment_ord", mapping[F.col("segment_id")].cast("int"))
        ord_df = spark.createDataFrame(ords, "segment_id string, segment_ord int")
        return df.join(F.broadcast(ord_df), "segment_id")

    from ..deletes import has_tombstones, read_tombstones

    tombstoned = has_tombstones(index_dir, manifest)
    k = None if limit is None else limit + offset
    parts = []

    if wires:
        needed = list(
            {t for qid in wires for t in collect_terms(logicals[qid])}
        )
        if needed:
            pruned = read_postings(spark, index_dir, manifest).filter(
                _term_predicate(F, needed)
            )
        else:
            pruned = spark.createDataFrame([], POSTINGS_SPARK_SCHEMA)
        wires_json = json.dumps(wires)
        if range_wires:
            aux = build_aux_df(spark, index_dir, manifest, range_wires, tombstoned)

            def fn3(pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
                dels, aux_sets = split_aux_pdf(aux_pdf)
                if not len(pdf) and not aux_sets:
                    return _empty_many_pdf()
                seg = (
                    pdf["segment_id"].iloc[0]
                    if len(pdf)
                    else aux_pdf["segment_id"].iloc[0]
                )
                return _score_segment_many_pdf(
                    pdf, wires_json, k, use_wand, dels, aux_sets, seg
                )

            seg_results = (
                pruned.groupBy("segment_id")
                .cogroup(aux.groupBy("segment_id"))
                .applyInPandas(fn3, MANY_RESULT_SCHEMA)
            )
        elif tombstoned:

            def fn2(pdf: pd.DataFrame, tomb: pd.DataFrame) -> pd.DataFrame:
                if not len(pdf):
                    return _empty_many_pdf()
                dels = (
                    np.unique(tomb["doc"].to_numpy(dtype=np.int64))
                    if len(tomb)
                    else None
                )
                return _score_segment_many_pdf(pdf, wires_json, k, use_wand, dels)

            seg_results = (
                pruned.groupBy("segment_id")
                .cogroup(read_tombstones(spark, index_dir, manifest).groupBy("segment_id"))
                .applyInPandas(fn2, MANY_RESULT_SCHEMA)
            )
        else:

            def fn(pdf: pd.DataFrame) -> pd.DataFrame:
                return _score_segment_many_pdf(pdf, wires_json, k, use_wand)

            seg_results = pruned.groupBy("segment_id").applyInPandas(
                fn, MANY_RESULT_SCHEMA
            )
        parts.append(seg_results)

    if all_qids:
        base = read_docmap(spark, index_dir, manifest).select("segment_id", "doc")
        if tombstoned:
            base = base.join(
                read_tombstones(spark, index_dir, manifest), ["segment_id", "doc"], "left_anti"
            )
        tagged = base.withColumn(
            "query_id", F.explode(F.array(*[F.lit(q) for q in all_qids]))
        ).select("query_id", "segment_id", "doc", F.lit(1.0).alias("score"))
        parts.append(tagged)

    if not parts:
        return spark.createDataFrame(
            [], "query_id string, segment_id string, segment_ord int, doc long, score double"
        )

    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)

    hits = with_segment_ord(unioned)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("segment_ord"), F.asc("doc")
    )
    hits = hits.withColumn("_rn", F.row_number().over(w))
    if limit is not None or offset:
        lo = offset
        hi = None if limit is None else offset + limit
        cond = F.col("_rn") > lo
        if hi is not None:
            cond = cond & (F.col("_rn") <= hi)
        hits = hits.filter(cond)
    return hits.select(
        "query_id", "segment_id", "segment_ord", "doc", "score"
    ).orderBy("query_id", F.desc("score"), F.asc("segment_ord"), F.asc("doc"))


POSITIONS_RESULT_SCHEMA = "segment_id string, doc long, pos long"


def scroll(
    spark,
    index_dir: str,
    query,
    page_size: int = 100,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Iterate a query's ENTIRE match set page by page — the
    Elasticsearch ``scroll`` API analog (EXTENSION): the export /
    reindex / bulk-fetch access pattern search's top-k collectors don't
    serve. Yields lists of result Rows (each ``<= page_size``, pinned
    total order: score desc, segment_ord asc, doc asc).

    The manifest is loaded ONCE and pinned across pages, so a commit or
    merge landing mid-scroll never skips or duplicates docs — the exact
    consistency ES's scroll context provides, except here the "context"
    is an immutable manifest: nothing server-side to keep alive, time
    out, or clear (the ES scroll-context lifecycle problem does not
    exist). Caveat shared honestly: DELETES apply immediately (the
    tombstone pointer is read live, matching the engine-wide
    delete-visibility contract) — pass a snapshot-loaded manifest
    (``load_manifest(dir, opstamp=...)``, the PIT analog) for full
    segments+deletes isolation.

    Scale posture: each page is a ``search_after`` cursor query — the
    cursor filters BEFORE every segment's local top-k, so page 10^4
    costs the same as page 1 (never the offset trap of deep paging);
    WAND is off on the cursor path by construction. For a
    whole-match-set export as ONE distributed job (no driver paging at
    all) use ``export_hits`` instead — scroll is for callers that want
    the rows driver-side incrementally."""
    if page_size < 1:
        raise ValueError(f"page_size must be >= 1, got {page_size}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    after = None
    while True:
        res, _ = search(
            spark, index_dir, query, limit=page_size, after=after,
            scorer=scorer, manifest=manifest, default_fields=default_fields,
            use_wand=False,
        )
        rows = res.collect()
        if not rows:
            return
        yield rows
        if len(rows) < page_size:
            return
        last = rows[-1]
        after = (last["score"], last["segment_ord"], last["doc"])


def term_positions(spark, index_dir: str, field_id: int, term: str, manifest: Manifest | None = None):
    """Every occurrence position of ``term`` -> (segment_id, doc, pos)
    rows — the highlighting/snippet primitive (requires the field to be
    indexed with positions=True).

    The (field, term) predicate prunes at the parquet scan (same pushdown
    as scoring); decode is one vectorized pass per pruned posting row;
    tombstoned docs are excluded."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    pruned = read_postings(spark, index_dir, manifest).filter(
        (F.col("field") == field_id) & (F.col("term") == term)
    )

    def explode_positions(pdf: pd.DataFrame) -> pd.DataFrame:
        tp = TermPostings(pdf)
        docs, tfs, _, pos = tp.decode_with_positions()
        return pd.DataFrame(
            {
                "segment_id": pdf["segment_id"].iloc[0],
                "doc": np.repeat(docs, tfs),
                "pos": pos,
            }
        )

    rows = pruned.groupBy("segment_id").applyInPandas(
        explode_positions, POSITIONS_RESULT_SCHEMA
    )
    from ..deletes import has_tombstones, read_tombstones

    if has_tombstones(index_dir, manifest):
        rows = rows.join(
            read_tombstones(spark, index_dir, manifest), ["segment_id", "doc"], "left_anti"
        )
    return rows




def attach_docmap(spark, index_dir: str, results_df, manifest: Manifest | None = None):
    """Join original document identity columns onto search results
    (broadcast join — results are tiny).

    Pass the ``manifest`` the search ran against: if a merge/commit lands
    between search() and attach_docmap(), a freshly-loaded manifest no
    longer lists the segments the hits reference and the inner join on
    (segment_id, doc) would silently drop them."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    docmap = read_docmap(spark, index_dir, manifest)
    return docmap.join(
        F.broadcast(results_df), on=["segment_id", "doc"], how="inner"
    )


def _numeric_field_entry(manifest, by: str):
    fe = manifest.schema.field_by_name(by)
    if fe is None or not fe.is_numeric:
        raise ValueError(
            f"{by!r} is not a numeric doc-value field of this index "
            f"(add it with Schema.add_numeric_field)"
        )
    return fe


def _doc_value_field_entry(manifest, by: str):
    fe = manifest.schema.field_by_name(by)
    if fe is None or not fe.is_doc_value:
        raise ValueError(
            f"{by!r} is not a doc-value field of this index (add it with "
            f"Schema.add_numeric_field or Schema.add_keyword_field)"
        )
    if fe.is_geo:
        # a point has no total order; nearest-first is geo.geo_sort
        raise ValueError(
            f"{by!r} is a geo field — sort by distance with "
            f"ostrich_spark.geo.geo_sort, not a doc-value sort"
        )
    if fe.is_shape:
        raise ValueError(
            f"{by!r} is a geo_shape field — shapes have no total order "
            f"or bucket key; query them with GeoShapeQuery"
        )
    if fe.is_range:
        raise ValueError(
            f"{by!r} is a range field — an interval has no scalar sort "
            f"or bucket key; query it with RangeFieldQuery"
        )
    if fe.is_histogram:
        raise ValueError(
            f"{by!r} is a histogram field — aggregate it with "
            f"histogram_field_stats / histogram_field_percentiles"
        )
    return fe


# Duration suffixes for decay scale/offset on DATE fields, resolved to
# microseconds (the date doc-value unit). Matches the ES time-unit set
# minus months/years, which are not fixed-width.
_DURATION_UNITS_US = {
    "us": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
    "d": 86_400_000_000,
    "w": 604_800_000_000,
}


def _parse_duration_us(s, what: str) -> int:
    """``"10d"`` / ``"36h"`` / ``"90s"`` -> microseconds; a bare int is
    taken as micros already."""
    if isinstance(s, (int, float)) and not isinstance(s, bool):
        return int(s)
    txt = str(s).strip().lower()
    for suffix in sorted(_DURATION_UNITS_US, key=len, reverse=True):
        if txt.endswith(suffix):
            num = txt[: -len(suffix)].strip()
            try:
                return int(float(num) * _DURATION_UNITS_US[suffix])
            except ValueError:
                break
    if txt.lstrip("-").isdigit():
        return int(txt)
    raise ValueError(
        f"cannot parse {what} duration {s!r} — use e.g. '10d', '36h', "
        f"'30m', '45s', '500ms' or an integer microsecond count"
    )
