"""Document-level read APIs split from exec.py (mechanical move,
round 4): hit export, doc retrieval by stored key, terms_lookup,
term_vectors, and explain. Public imports are unchanged via the
``exec`` facade."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd

from ..manifest import Manifest, load_manifest
from .parser import parse_query
from .plan import B, K1, SCORER_TFIDF, collect_terms, compile_query, to_wire

from .exec_core import (
    Manifest,
    SCORER_TFIDF,
    TermPostings,
    _term_predicate,
    assign_range_ids,
    bind_stats,
    collect_terms,
    compile_query,
    eval_node,
    load_manifest,
    np,
    parse_query,
    pd,
    range_match_df,
    read_docmap,
    read_postings,
    search,
    to_wire,
)


def export_hits(
    spark,
    index_dir: str,
    query,
    out_dir: str,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
    columns: list[str] | None = None,
):
    """Export EVERY match of a query, with document identity, to a
    parquet directory — the export-all-matches job (ES scroll-to-file /
    point-in-time export analog; EXTENSION). Returns the number of rows
    written.

    Unlike ``attach_docmap`` (which broadcasts a top-k result), the full
    match set is unbounded: the identity join here is a plain co-keyed
    join on (segment_id, doc) and the write is distributed — nothing
    passes through the driver. ``columns`` restricts the exported docmap
    columns (identity + stored fields + doc values); score/segment
    address ride along always.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    if columns:
        missing = [c for c in columns if c not in docmap.schema.names]
        if missing:
            raise ValueError(
                f"export columns not in docmap: {missing} "
                f"(have: {', '.join(docmap.schema.names)})"
            )
        docmap = docmap.select("segment_id", "doc", *dict.fromkeys(columns))
    out = docmap.join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    out.write.mode("error").parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def get_docs(spark, index_dir: str, values, key_col: str, manifest: Manifest | None = None):
    """Point lookup by identity — the Lucene ``IndexReader.document`` /
    Elasticsearch GET analog. Returns the docmap rows (identity columns,
    stored fields, doc values, sha256, segment address) of the docs whose
    ``key_col`` is in ``values``; tombstoned docs are EXCLUDED (a deleted
    doc reads as absent, GET semantics — pass a snapshot-loaded
    ``manifest`` to read it as-of an earlier commit).

    ``values`` is a Python list (cast to the docmap column's ACTUAL
    dtype — a string id column keeps '07' and '7' distinct) or a
    DataFrame carrying ``key_col``. The list form filters with isin(),
    which pushes down to the parquet scan: a point read touches only the
    row groups whose min/max straddle the keys. The DataFrame form
    broadcast-joins (the key set is the small side by definition)."""
    from pyspark.sql import DataFrame, functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    dm = read_docmap(spark, index_dir, manifest)
    if isinstance(values, DataFrame):
        out = dm.join(F.broadcast(values.select(key_col).distinct()), key_col, "inner")
    else:
        if key_col not in dm.schema.names:
            raise ValueError(
                f"key column {key_col!r} not in docmap "
                f"(have: {', '.join(dm.schema.names)})"
            )
        target = dm.schema[key_col].dataType
        lits = [F.lit(v).cast(target) for v in values]
        out = dm.filter(F.col(key_col).isin(*lits))
    from ..deletes import has_tombstones, read_tombstones

    if has_tombstones(index_dir, manifest):
        out = out.join(
            read_tombstones(spark, index_dir, manifest),
            ["segment_id", "doc"],
            "left_anti",
        )
    return out


TERM_VECTORS_SCHEMA = "segment_id string, doc long, term string, tf long"


def terms_lookup(
    spark,
    index_dir: str,
    field: str,
    lookup_key,
    key_col: str,
    lookup_field: str,
    lookup_index: str | None = None,
    manifest: Manifest | None = None,
    max_terms: int = 65_536,
):
    """Build a TermsQuery whose VALUES come from another document —
    the Elasticsearch terms-lookup mechanism (EXTENSION): "match every
    doc whose ``field`` is one of the values stored on doc X", the
    follow/blocklist pattern (user X's followed-tags doc drives the
    feed query) without shipping the list through the client.

    The lookup doc is fetched by identity (``get_docs`` point read —
    parquet row-group pruned, tombstone-aware: a deleted lookup doc
    reads as absent) from ``lookup_index`` (default: the same index).
    ``lookup_field`` is a keyword doc value (one value) or a
    ``store=True`` field, whose stored value splits on newline — the
    engine's multi-value stored round-trip (build joins list inputs
    with ``"\\n"``). Missing doc / NULL value → EmptyQuery (matches
    nothing, the ES behavior). Values above ``max_terms`` raise (the
    ES index.max_terms_count guard — a million-term filter wants a
    JOIN, not a query).

    Returns a query node (TermsQuery or EmptyQuery) ready to compose
    in FILTER context; the caller runs it like any other query."""
    from .parser import EmptyQuery, TermsQuery

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or not (fe.is_keyword or fe.is_ip):
        raise ValueError(
            f"terms_lookup filters a keyword field, {field!r} is "
            f"{'absent' if fe is None else fe.field_type}"
        )
    src_dir = lookup_index or index_dir
    src_manifest = manifest if lookup_index is None else load_manifest(src_dir)
    sfe = src_manifest.schema.field_by_name(lookup_field)
    if sfe is None or not (sfe.is_keyword or (not sfe.is_doc_value and sfe.store)):
        raise ValueError(
            f"lookup field {lookup_field!r} must be a keyword doc value "
            f"or a store=True text field of the lookup index"
        )
    rows = get_docs(
        spark, src_dir, [lookup_key], key_col, manifest=src_manifest
    ).select(lookup_field).collect()
    if not rows or rows[0][lookup_field] is None:
        return EmptyQuery()
    raw = rows[0][lookup_field]
    values = (
        [raw] if sfe.is_keyword
        else [v for v in str(raw).split("\n") if v != ""]
    )
    if not values:
        return EmptyQuery()
    if len(values) > max_terms:
        raise ValueError(
            f"terms_lookup resolved {len(values)} values > max_terms "
            f"{max_terms} — use a join for set filters this large"
        )
    return TermsQuery(fe.id, tuple(values))


def term_vectors(
    spark,
    index_dir: str,
    values,
    key_col: str,
    field: str,
    manifest: Manifest | None = None,
):
    """Per-document term vectors decoded FROM THE INDEX POSTINGS — the
    Elasticsearch ``_termvectors`` / Lucene TermVectors analog
    (EXTENSION). For each requested doc: every indexed term of ``field``
    with its in-doc frequency, exactly as the index stores it (the
    analysis chain included — a stemmed index returns stems). Unlike
    re-analyzing a stored value, this works with ``store=False`` fields
    and can never drift from what queries actually match. Positions for
    one term are available via ``term_positions``.

    ``values``/``key_col`` resolve identities like ``get_docs`` (dtype-
    exact, tombstone-aware, snapshot ``manifest`` honored). This is a
    point API: the target set is GET-sized (the per-segment doc lists
    ship to executors in the task closure).

    Returns (``key_col``, segment_id, doc, term, tf), one row per
    distinct term per requested doc.

    Scale posture: only the target segments' postings of ``field`` are
    scanned (segment pruning + field predicate push to parquet), each
    posting row decodes ONLY the docs column and ONLY the blocks whose
    [lower bound, block_max_doc] window intersects the target docs —
    the sig_terms block-prune pattern; tf blocks decode just for rows
    with a hit.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or fe.is_doc_value:
        raise ValueError(f"{field!r} is not a text field of this index")
    ident = get_docs(spark, index_dir, values, key_col, manifest=manifest)
    targets = ident.select(key_col, "segment_id", "doc").collect()
    by_seg: dict[str, np.ndarray] = {}
    for r in targets:
        by_seg.setdefault(r["segment_id"], []).append(int(r["doc"]))
    by_seg = {s: np.unique(np.asarray(d, dtype=np.int64)) for s, d in by_seg.items()}
    if not by_seg:
        return (
            spark.createDataFrame([], TERM_VECTORS_SCHEMA)
            .join(ident.select(key_col, "segment_id", "doc"), ["segment_id", "doc"])
            .select(key_col, "segment_id", "doc", "term", "tf")
        )
    post = (
        read_postings(spark, index_dir, manifest)
        .filter(F.col("field") == fe.id)
        .filter(F.col("segment_id").isin(list(by_seg)))
        .select(
            "segment_id", "term", "doc_freq", "docs", "doc_offs",
            "tfs", "tf_offs", "block_max_doc",
        )
    )
    def decode(batches):
        from ..codec import unpack_blocked

        for pdf in batches:
            segs, docs_out, terms, tfs_out = [], [], [], []
            for row in pdf.itertuples(index=False):
                tarr = by_seg[row.segment_id]
                bm = np.asarray(row.block_max_doc, dtype=np.int64)
                if not len(bm) or bm[-1] < tarr[0]:
                    continue
                lo = np.empty_like(bm)
                lo[0] = 0  # conservative row lower bound (sharded rows)
                lo[1:] = bm[:-1] + 1
                # blocks whose [lo, max] window contains >= 1 target doc
                n_lo = np.searchsorted(tarr, lo, side="left")
                n_hi = np.searchsorted(tarr, bm, side="right")
                sel = np.flatnonzero(n_hi > n_lo)
                if not len(sel):
                    continue
                dvals, dpos = unpack_blocked(
                    bytes(row.docs), list(row.doc_offs),
                    int(row.doc_freq), True, sel,
                )
                idx = np.searchsorted(tarr, dvals)
                idx[idx == len(tarr)] = 0
                hit = tarr[idx] == dvals
                if not hit.any():
                    continue
                tvals, _ = unpack_blocked(
                    bytes(row.tfs), list(row.tf_offs),
                    int(row.doc_freq), False, sel,
                )
                for d, t in zip(dvals[hit], tvals[hit]):
                    segs.append(row.segment_id)
                    docs_out.append(int(d))
                    terms.append(row.term)
                    tfs_out.append(int(t))
            yield pd.DataFrame(
                {"segment_id": segs, "doc": docs_out, "term": terms,
                 "tf": tfs_out}
            ).astype({"doc": np.int64, "tf": np.int64}, errors="ignore")

    vecs = post.mapInPandas(decode, schema=TERM_VECTORS_SCHEMA)
    return vecs.join(
        F.broadcast(ident.select(key_col, "segment_id", "doc")),
        ["segment_id", "doc"],
        "inner",
    ).select(key_col, "segment_id", "doc", "term", "tf")


def explain(
    spark,
    index_dir: str,
    query,
    segment_id: str,
    doc: int,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
    manifest: Manifest | None = None,
) -> dict:
    """Score breakdown for ONE (segment_id, doc) — the Lucene
    ``IndexSearcher.explain`` analog (EXTENSION: the reference returns
    bare scores). Every node's number comes from the SAME ``eval_node``
    the engine scores with, evaluated driver-side over the one segment's
    pruned posting rows — explanations cannot drift from the engine.

    Returns a nested dict: ``kind``, ``matched``, ``score``, per-term
    ``detail`` (tf, doc_freq, idf, field length), ``children``. Top
    level adds ``tombstoned`` (a deleted doc explains its would-be
    score but reports matched=False, like the search paths hide it).
    """
    from pyspark.sql import functions as F

    from ..deletes import read_tombstones

    if manifest is None:
        manifest = load_manifest(index_dir)
    schema = manifest.schema
    logical = parse_query(query, schema, default_fields) if isinstance(query, str) else query

    from .expand import has_multiterm, rewrite_multiterm

    if has_multiterm(logical):
        logical = rewrite_multiterm(spark, index_dir, manifest, logical)
    doc_freqs, total_docs, field_avgdl = bind_stats(spark, index_dir, manifest, logical)
    compiled = compile_query(logical, doc_freqs, total_docs, field_avgdl, scorer)
    wire = to_wire(compiled)

    max_docs = {s.segment_id: s.max_doc for s in manifest.segments}
    if segment_id not in max_docs:
        raise ValueError(f"unknown segment {segment_id!r}")
    max_doc = max_docs[segment_id]
    doc = int(doc)
    if not (0 <= doc < max_doc):
        raise ValueError(f"doc {doc} out of range [0, {max_doc}) for {segment_id}")

    # one segment's pruned postings, decoded driver-side
    terms = collect_terms(logical)
    term_data: dict = {}
    if terms:
        rows = (
            read_postings(spark, index_dir, manifest)
            .filter(_term_predicate(F, terms) & (F.col("segment_id") == segment_id))
            .toPandas()
        )
        for (f, t), grp in rows.groupby(["field", "term"]):
            term_data[(int(f), t)] = TermPostings(grp)

    range_wires = assign_range_ids(wire)
    aux = {}
    for rw in range_wires:
        rdf = range_match_df(spark, index_dir, manifest, rw).filter(
            F.col("segment_id") == segment_id
        )
        rows_a = rdf.collect()
        docs_raw = np.array([r["doc"] for r in rows_a], dtype=np.int64)
        docs_u, first_idx = np.unique(docs_raw, return_index=True)
        aux[rw["rid"]] = docs_u
        # value-carrying deliveries (terms_set "dv" m-values, combined
        # fields "norms" lengths) keep vals aligned to the sorted docs —
        # same contract as split_aux_pdf on the distributed path
        vals_a = [r["val"] for r in rows_a]
        if any(v is not None for v in vals_a):
            aux[("val", rw["rid"])] = np.array(
                [vals_a[i] for i in first_idx], dtype=np.float64
            )

    from ..deletes import has_tombstones

    tombstoned = False
    if has_tombstones(index_dir, manifest):
        t = read_tombstones(spark, index_dir, manifest)
        if t is not None:
            tombstoned = bool(
                t.filter(
                    (F.col("segment_id") == segment_id) & (F.col("doc") == doc)
                ).count()
            )

    def node_score(w) -> tuple[bool, float]:
        docs, scores = eval_node(w, term_data, max_doc, scorer, aux)
        pos = np.searchsorted(docs, doc)
        if pos < len(docs) and docs[pos] == doc:
            return True, float(scores[pos])
        return False, 0.0

    def walk(w) -> dict:
        matched, score = node_score(w)
        out = {"kind": w["kind"], "matched": matched, "score": score}
        if w["kind"] == "term":
            tp = term_data.get((w["field"], w["term"]))
            detail = {
                "field": w["field"],
                "term": w["term"],
                "doc_freq": w["doc_freq"],
                "idf": w["idf"],
            }
            if tp is not None and matched:
                d, tfs, lens = tp.decode()
                i = int(np.searchsorted(d, doc))
                detail["tf"] = int(tfs[i])
                detail["field_length"] = int(lens[i])
                if scorer != SCORER_TFIDF:  # bm25: length normalization input
                    detail["avgdl"] = w["avgdl"]
            out["detail"] = detail
        elif w["kind"] == "phrase":
            out["detail"] = {
                "field": w["field"], "terms": w["terms"],
                "idf_sum": w["idf"], "slop": w.get("slop", 0),
            }
        elif w["kind"] == "multi_phrase":
            out["detail"] = {
                "field": w["field"], "slots": w["slots"],
                "idf_sum": w["idf"], "slop": w.get("slop", 0),
            }
        elif w["kind"] == "near":
            out["detail"] = {
                "field": w["field"], "terms": w["terms"],
                "idf_sum": w["idf"], "slop": w.get("slop", 0),
                "in_order": False,
            }
        elif w["kind"] == "span_first":
            out["detail"] = {
                "field": w["field"], "terms": w["terms"],
                "doc_freq": w["doc_freq"], "idf": w["idf"], "end": w["end"],
            }
        elif w["kind"] == "span_not":
            out["detail"] = {
                "field": w["field"], "terms": w["terms"],
                "exclude": w["excl_terms"], "doc_freq": w["doc_freq"],
                "idf": w["idf"], "pre": w["pre"], "post": w["post"],
            }
        elif w["kind"] == "span_or":
            out["detail"] = {
                "field": w["field"], "terms": w["terms"],
                "idf_sum": w["idf"],
            }
        elif w["kind"] == "span_contain":
            out["detail"] = {
                "field": w["field"], "big": w["big"],
                "little": w["little"], "emit": w["emit"],
                "idf_sum": w["idf"],
            }
        elif w["kind"] == "combined_term":
            out["detail"] = {
                "term": w["term"],
                "fields": [
                    {"field": nf["field"], "weight": nf["weight"]}
                    for nf in w["norm_fields"]
                ],
                "doc_freq": w["doc_freq"], "idf": w["idf"],
                "avgdl": w["avgdl"],
            }
        elif w["kind"] == "range":
            op = w.get("op")
            if op == "eq":
                out["detail"] = {"op": "eq", "value": w["value"],
                                 "const_score": w["score"]}
            elif op == "in":
                out["detail"] = {"op": "in", "values": w["values"],
                                 "const_score": w["score"]}
            elif op == "ids":
                out["detail"] = {"op": "ids", "column": w["column"],
                                 "values": w["values"],
                                 "const_score": w["score"]}
            elif op == "exists":
                out["detail"] = {"op": "exists", "const_score": w["score"]}
            else:
                out["detail"] = {"lo": w["lo"], "hi": w["hi"],
                                 "const_score": w["score"]}
        elif w["kind"] == "dismax":
            out["detail"] = {"tie_breaker": w["tie"]}
        elif w["kind"] == "min_should":
            out["detail"] = {"m": w["m"]}
        elif w["kind"] == "boosting":
            out["detail"] = {"negative_boost": w["nb"]}
        elif w["kind"] == "const_score":
            out["detail"] = {"const_score": w["score"]}
        kids = []
        for key in ("base", "exclude", "filt", "must", "should", "demote"):
            if key in w and w[key] is not None:
                kid = walk(w[key])
                kid["occur"] = key
                kids.append(kid)
        for c in w.get("children", ()):
            kids.append(walk(c))
        if kids:
            out["children"] = kids
        return out

    if wire["kind"] == "all":
        root = {"kind": "all", "matched": True, "score": 1.0}
    elif wire["kind"] == "empty":
        root = {"kind": "empty", "matched": False, "score": 0.0}
    else:
        root = walk(wire)
    root["segment_id"] = segment_id
    root["doc"] = doc
    root["scorer"] = scorer
    root["tombstoned"] = tombstoned
    if tombstoned:
        root["matched"] = False
    return root


