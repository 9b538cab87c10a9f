"""Percolator — reverse search (Lucene MemoryIndex / Elasticsearch
percolate-query analog; EXTENSION, the reference only searches forward).

Forward search asks "which docs match this query?"; percolation asks
"which REGISTERED QUERIES match this doc?" — the alerting/routing shape:
thousands of stored subscriptions ("tell me when a doc mentions spark
AND join"), a stream of new documents, and every (doc, subscription)
match must surface as the docs arrive.

Spark-first design: this is a JOIN, not a per-doc query loop.
``register_queries`` compiles the stored boolean queries into two tiny
tables — one row per (query, occur, field, term) and one row of match
requirements per query. ``percolate`` analyzes the incoming documents
with the index schema's own per-field analyzers (the same vectorized
Arrow kernels the build uses), explodes to distinct (doc, field, term)
rows, broadcast-joins the query-term table, and decides satisfaction
with ONE map-side partial-aggregated groupBy:

    must_hits == n_must AND should_hits >= req_should AND not_hits == 0

Scale posture: the document side streams through tokenize+explode with
no shuffle until the single (doc, query) aggregation; the query side is
driver-compiled and broadcast while it is genuinely small (the common
alerting shape — thousands of rows). Because every query-side table is
built from a driver list, its row count is known for free, and
``percolate(broadcast_cap=...)`` drops the broadcast hint automatically
once a table crosses the cap (default 250k rows ≈ the 10MB broadcast
budget at ~40B/row) — the same plan then shuffle-joins on
(field_id, term) by Spark's own sizing instead of force-broadcasting
into an executor OOM at 100k+ subscriptions. Works unchanged inside
``foreachBatch`` for Structured Streaming percolation.

Supported query surface: TermQuery, PhraseQuery (exact and sloppy —
verified positionally against the doc's own token stream with the SAME
in-order window DP the forward phrase scorer uses, query/exec.py
eval_phrase), RangeQuery (numeric doc values; STRING bounds =
lexicographic keyword range), KeywordQuery/TermsQuery/ExistsQuery
(keyword doc values — the ES subscription-with-keyword-filter shape,
one broadcast equality/membership/interval join over per-field value
rows; a TermsQuery set is ONE unit), and ARBITRARILY NESTED
BooleanQuery/DisMaxQuery trees of such leaves —
MUST / SHOULD / MUST_NOT / FILTER occurs plus ``min_should`` at every
level, matching the engine's own satisfaction semantics (FILTER
requires like MUST but never makes SHOULD optional; MUST_NOT excludes;
DisMax matches like OR — max vs sum changes scores, never the match
set). Flat queries take a pure-counts aggregation (cheapest possible:
conditional sums that partial-aggregate map-side); nested trees ride
the SAME leaf join tables with per-leaf unit tags and satisfy via one
collect_set aggregation (set bounded by the query's own leaf count)
evaluated against the driver-compiled tree in an Arrow-batched UDF —
still one shuffle total. Multi-term leaves
(prefix/wildcard/regexp/fuzzy) are evaluated against the DOC'S OWN
analyzed token set — the ES MemoryIndex semantics: per-document,
UNCAPPED expansion (equivalent to forward search with
max_expansions=None; forward's deterministic df-ranked cap exists to
bound INDEX-dictionary fan-out, which has no analog against a single
document). Matchers reuse the exact forward-expansion predicates
(anchored fullmatch, shared-prefix + levenshtein/damerau radius),
evaluated once per distinct batch token in mapInPandas.
MultiPhraseQuery (slot alternatives) and PhrasePrefixQuery verify
positionally through the same window DP with per-slot position unions;
the prefix slot expands against the doc's own tokens. The FULL forward
query surface percolates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .analysis import get_analyzer
from .query.parser import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BlendedTermQuery,
    BooleanQuery,
    BoostingQuery,
    CombinedTermQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    SpanOrQuery,
    ExistsQuery,
    FuzzyQuery,
    GeoBoundingBoxQuery,
    GeoDistanceQuery,
    GeoPolygonQuery,
    KeywordQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PhrasePrefixQuery,
    PrefixQuery,
    RangeQuery,
    RegexpQuery,
    TermQuery,
    TermsQuery,
    WildcardQuery,
    parse_query,
)
from .schema import Schema

# row-encoded positions: enc = row_index * BIG + token_position — the
# same doc-major encoding trick the forward phrase scorer uses
# (query/exec.py), applied batch-wide so ONE DP pass verifies a phrase
# against every doc of an Arrow batch
_BIG = np.int64(1) << np.int64(32)


@dataclass(frozen=True)
class PercolatorQueries:
    """Driver-compiled stored-query tables (see module docstring)."""

    # (query_id, occur, field_id, term) — distinct
    term_rows: tuple[tuple[str, str, int, str], ...]
    # (query_id, n_must, req_should)
    req_rows: tuple[tuple[str, int, int], ...]
    field_ids: tuple[int, ...]  # every field any query touches
    # (query_id, occur, field_id, terms, slop) — distinct phrase units
    phrase_rows: tuple[tuple[str, str, int, tuple[str, ...], int], ...] = ()
    # (query_id, occur, field_id, lo, hi, include_lo, include_hi) —
    # distinct numeric range units (bounds as float, open = ±inf;
    # comparisons run in double — exact for doc values up to 2^53)
    range_rows: tuple[tuple[str, str, int, float, float, bool, bool], ...] = ()
    # (query_id, occur, field_id, op, payload) — distinct keyword units:
    # op "eq" (payload = value str), "in" (payload = value tuple, ONE
    # unit for the whole set), "range" (payload = (lo, hi, ilo, ihi)
    # string bounds, None = open) or "exists" (payload None)
    kw_rows: tuple[tuple[str, str, int, str, object], ...] = ()
    # (query_id, tree_json) — NESTED boolean queries (arbitrary depth +
    # DisMax-as-OR): their leaves ride the same join tables with occur
    # tags "u<idx>" and satisfaction is evaluated against the tree (one
    # collect_set aggregation instead of the flat conditional counts).
    # Queries listed here have NO req_rows entry.
    tree_rows: tuple[tuple[str, str], ...] = ()
    # (query_id, occur, field_id, kind, payload) — multi-term units
    # evaluated against the DOC'S OWN analyzed token set (the ES
    # MemoryIndex semantics: expansion is per-document and UNCAPPED,
    # equivalent to forward search with max_expansions=None):
    # kind "prefix" (payload = prefix), "pattern" (payload = anchored
    # regex source — wildcards pre-translated), "fuzzy" (payload =
    # (term, max_dist, prefix_length, transpositions))
    mt_rows: tuple[tuple[str, str, int, str, object], ...] = ()
    # (query_id, occur, field_id, slots, slop, last_prefix) — slot-based
    # phrase units (MultiPhraseQuery alternatives; PhrasePrefixQuery =
    # fixed single-term slots + a last PREFIX slot expanded against the
    # doc's own tokens, uncapped like mt_rows). Verified positionally by
    # the same in-order window DP as phrase_rows, slot encs = sorted
    # union of the alternatives' positions.
    mp_rows: tuple[tuple[str, str, int, tuple, int, str | None], ...] = ()
    # (query_id, occur, field_id, op, payload) — distinct GEO units:
    # op "dist" (payload (lat, lon, radius_m)), "bbox" (payload (top,
    # left, bottom, right)) or "poly" (payload ((lat, lon), ...));
    # incoming docs carry the build's canonical "lat,lon" string, the
    # geofence-alerting percolation shape
    geo_rows: tuple[tuple[str, str, int, str, object], ...] = ()


def _is_flat(q) -> bool:
    """True when q is a leaf or ONE boolean level of leaves — the shape
    the counting fast path handles."""
    if not isinstance(q, BooleanQuery):
        return not isinstance(q, DisMaxQuery)
    return not any(
        isinstance(sub, (BooleanQuery, DisMaxQuery)) for _, sub in q.subqueries
    )


def _eval_tree(node: dict, units: set) -> bool:
    """Satisfaction of a nested tree given the set of hit leaf units —
    mirrors the forward lowering EXACTLY (query/plan.py compile_query):
    MUST and FILTER children all required; MUST_NOT excludes; SHOULD
    needs >= min_should when min_should > 1 (required even beside MUST)
    or >= 1 when the node has no true MUST (FILTERs do NOT make SHOULD
    optional — forward puts the should-union in CFilter's base); a node
    with no positive clause never matches (CEmpty); DisMax matches iff
    any child does (max vs sum changes scores, never the match set)."""
    k = node["k"]
    if k == "u":
        return node["u"] in units
    if k == "dismax":
        return any(_eval_tree(c, units) for c in node["children"])
    must, should = node["must"], node["should"]
    nots, filt = node["not"], node["filter"]
    if not must and not should and not filt:
        return False
    if any(_eval_tree(c, units) for c in nots):
        return False
    if not all(_eval_tree(c, units) for c in must):
        return False
    if not all(_eval_tree(c, units) for c in filt):
        return False
    m = node["m"]
    s = sum(1 for c in should if _eval_tree(c, units))
    if m > 1:
        return s >= m
    if should and not must:
        return s >= 1
    return True


def _leaf_row(query_id: str, occur: str, sub):
    """One leaf clause -> (table kind, row). ``occur`` is an opaque tag
    downstream: a real occur for flat queries, a unit id ("u<idx>") for
    nested trees."""
    if isinstance(sub, TermQuery):
        return ("t", (query_id, occur, sub.field_id, sub.term))
    if isinstance(sub, PhraseQuery):
        return (
            "p",
            (query_id, occur, sub.field_id, tuple(sub.terms), int(sub.slop)),
        )
    if isinstance(sub, RangeQuery):
        if isinstance(sub.lo, str) or isinstance(sub.hi, str):
            # lexicographic keyword range: string bounds, keyword
            # delivery (the numeric table compares in double)
            return (
                "k",
                (query_id, occur, sub.field_id, "range",
                 (sub.lo, sub.hi,
                  bool(sub.include_lo), bool(sub.include_hi))),
            )
        lo = float("-inf") if sub.lo is None else float(sub.lo)
        hi = float("inf") if sub.hi is None else float(sub.hi)
        return (
            "r",
            (query_id, occur, sub.field_id, lo, hi,
             bool(sub.include_lo), bool(sub.include_hi)),
        )
    if isinstance(sub, KeywordQuery):
        return ("k", (query_id, occur, sub.field_id, "eq", sub.value))
    if isinstance(sub, TermsQuery):
        # ONE unit regardless of set size: a doc stores at most one
        # value per field, so the set hits at most once per doc
        return ("k", (query_id, occur, sub.field_id, "in", sub.values))
    if isinstance(sub, ExistsQuery):
        return ("k", (query_id, occur, sub.field_id, "exists", None))
    if isinstance(sub, MultiPhraseQuery):
        return (
            "mp",
            (query_id, occur, sub.field_id,
             tuple(tuple(slot) for slot in sub.slots), int(sub.slop), None),
        )
    if isinstance(sub, PhrasePrefixQuery):
        return (
            "mp",
            (query_id, occur, sub.field_id,
             tuple((t,) for t in sub.terms), int(sub.slop), sub.prefix),
        )
    if isinstance(sub, PrefixQuery):
        return ("m", (query_id, occur, sub.field_id, "prefix", sub.prefix))
    if isinstance(sub, WildcardQuery):
        from .query.expand import wildcard_to_regex

        return (
            "m",
            (query_id, occur, sub.field_id, "pattern",
             wildcard_to_regex(sub.pattern)),
        )
    if isinstance(sub, RegexpQuery):
        return ("m", (query_id, occur, sub.field_id, "pattern", sub.pattern))
    if isinstance(sub, FuzzyQuery):
        return (
            "m",
            (query_id, occur, sub.field_id, "fuzzy",
             (sub.term, int(sub.max_dist), int(sub.prefix_length),
              bool(sub.transpositions))),
        )
    if isinstance(sub, GeoDistanceQuery):
        return ("g", (query_id, occur, sub.field_id, "dist",
                      (float(sub.lat), float(sub.lon), float(sub.radius_m))))
    if isinstance(sub, GeoBoundingBoxQuery):
        return ("g", (query_id, occur, sub.field_id, "bbox",
                      (float(sub.top), float(sub.left),
                       float(sub.bottom), float(sub.right))))
    if isinstance(sub, GeoPolygonQuery):
        return ("g", (query_id, occur, sub.field_id, "poly",
                      tuple(tuple(pt) for pt in sub.points)))
    raise ValueError(
        f"percolator query {query_id!r}: unsupported clause "
        f"{type(sub).__name__} — percolation supports boolean trees "
        f"over terms, (sloppy/multi/prefix) phrases, "
        f"prefix/wildcard/regexp/fuzzy, doc-value filters and geo "
        f"(distance/bbox/polygon) clauses"
    )


def _strip_boosting(q):
    """Matching-equivalence normalization for score-only nodes: a
    BoostingQuery IS its positive side (the negative demotes, never
    excludes) and a BlendedTermQuery IS the OR of its per-field terms
    (df blending changes scores, not membership) — percolation is pure
    membership."""
    if isinstance(q, BoostingQuery):
        return _strip_boosting(q.positive)
    if isinstance(q, ConstantScoreQuery):
        # constant_score membership IS its inner query's (the stamp
        # changes scores, never the set)
        return _strip_boosting(q.query)
    if isinstance(q, BlendedTermQuery):
        kids = [TermQuery(fid, term) for fid, term, _ in q.pairs]
        if len(kids) == 1:
            return kids[0]
        return BooleanQuery([(SHOULD, k) for k in kids])
    if isinstance(q, CombinedTermQuery):
        # combined_fields membership = the term in ANY listed field
        # (weights/pseudo-stats change scores, not the match set)
        kids = [TermQuery(fid, q.term) for fid, _ in q.fields]
        if len(kids) == 1:
            return kids[0]
        return BooleanQuery([(SHOULD, k) for k in kids])
    if isinstance(q, SpanOrQuery):
        # span_or membership = ANY clause term present (the summed-tf
        # scoring changes scores, not the match set)
        kids = [TermQuery(q.field_id, t) for t in dict.fromkeys(q.terms)]
        if len(kids) == 1:
            return kids[0]
        return BooleanQuery([(SHOULD, k) for k in kids])
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            [(occ, _strip_boosting(sub)) for occ, sub in q.subqueries],
            min_should=q.min_should,
        )
    if isinstance(q, DisMaxQuery):
        return DisMaxQuery(
            [_strip_boosting(c) for c in q.children], q.tie_breaker
        )
    return q


def _flatten_terms(query_id: str, q):
    """One flat boolean level of term/phrase leaves ->
    (term rows, phrase rows)."""

    def leaf(occur, sub):
        # FILTER requires exactly like MUST in percolation (no scoring
        # here) — normalize so the SAME unit under both occurs dedups to
        # ONE hit row; two rows would make must_hits overshoot n_must
        # (n_must counts distinct UNITS) and the query could never match
        if occur == FILTER:
            occur = MUST
        return _leaf_row(query_id, occur, sub)

    if isinstance(q, (TermQuery, PhraseQuery, RangeQuery, KeywordQuery,
                      TermsQuery, ExistsQuery, PrefixQuery, WildcardQuery,
                      RegexpQuery, FuzzyQuery, MultiPhraseQuery,
                      PhrasePrefixQuery, GeoDistanceQuery,
                      GeoBoundingBoxQuery, GeoPolygonQuery)):
        kind, row = leaf(MUST, q)
        return tuple(
            [row] if kind == want else []
            for want in ("t", "p", "r", "k", "m", "mp", "g")
        )
    if isinstance(q, BooleanQuery):
        t_rows, p_rows, r_rows, k_rows, m_rows, mp_rows, g_rows = (
            [], [], [], [], [], [], []
        )
        sink = {"t": t_rows, "p": p_rows, "r": r_rows, "k": k_rows,
                "m": m_rows, "mp": mp_rows, "g": g_rows}
        for occur, sub in q.subqueries:
            kind, row = leaf(occur, sub)
            sink[kind].append(row)
        return t_rows, p_rows, r_rows, k_rows, m_rows, mp_rows, g_rows
    raise ValueError(
        f"percolator query {query_id!r}: unsupported query type "
        f"{type(q).__name__}"
    )


_OCCUR_KEY = {MUST: "must", SHOULD: "should", MUST_NOT: "not", FILTER: "filter"}


def _flatten_tree(query_id: str, q):
    """NESTED boolean tree -> leaf rows (occur tag = "u<idx>") + a
    JSON-able tree spec for _eval_tree. Arbitrary depth; DisMaxQuery is
    OR for matching purposes (max vs sum changes scores, not the set)."""
    t_rows, p_rows, r_rows, k_rows, m_rows, mp_rows, g_rows = (
        [], [], [], [], [], [], []
    )
    sink = {"t": t_rows, "p": p_rows, "r": r_rows, "k": k_rows,
            "m": m_rows, "mp": mp_rows, "g": g_rows}
    n_units = [0]

    def walk(node):
        if isinstance(node, BooleanQuery):
            out = {"k": "bool", "must": [], "should": [], "not": [],
                   "filter": [], "m": int(getattr(node, "min_should", 1))}
            for occ, sub in node.subqueries:
                out[_OCCUR_KEY[occ]].append(walk(sub))
            return out
        if isinstance(node, DisMaxQuery):
            return {"k": "dismax", "children": [walk(c) for c in node.children]}
        u = n_units[0]
        n_units[0] += 1
        kind, row = _leaf_row(query_id, f"u{u}", node)
        sink[kind].append(row)
        return {"k": "u", "u": u}

    tree = walk(q)
    return t_rows, p_rows, r_rows, k_rows, m_rows, mp_rows, g_rows, tree


def register_queries(
    queries: dict[str, object],
    schema: Schema,
    default_fields: list[str] | None = None,
) -> PercolatorQueries:
    """Compile stored queries (NQL strings or parsed logical queries,
    keyed by query_id) into percolation tables. Terms are analyzed by
    the schema's field analyzers exactly as forward search analyzes
    them — a registered ``text:Serious`` matches the same docs the
    engine's ``text:Serious`` would."""
    term_rows: list[tuple[str, str, int, str]] = []
    req_rows: list[tuple[str, int, int]] = []
    phrase_rows: list[tuple[str, str, int, tuple[str, ...], int]] = []
    range_rows: list[tuple[str, str, int, float, float, bool, bool]] = []
    kw_rows: list[tuple[str, str, int, str, str | None]] = []
    tree_rows: list[tuple[str, str]] = []
    mt_rows: list[tuple[str, str, int, str, object]] = []
    mp_rows: list[tuple[str, str, int, tuple, int, str | None]] = []
    geo_rows: list[tuple[str, str, int, str, object]] = []
    for qid, q in queries.items():
        logical = (
            parse_query(q, schema, default_fields) if isinstance(q, str) else q
        )
        # a BoostingQuery's negative side demotes SCORES only — for the
        # boolean matching percolation does, the node IS its positive
        logical = _strip_boosting(logical)
        tree = None
        if _is_flat(logical):
            (t_rows, p_rows, r_rows, k_rows, m_rows, mp_rows_q,
             g_rows_q) = _flatten_terms(qid, logical)
        else:
            (t_rows, p_rows, r_rows, k_rows, m_rows, mp_rows_q, g_rows_q,
             tree) = _flatten_tree(qid, logical)
        for _, _, f, *_ in mp_rows_q:
            if schema.fields[f].is_doc_value:
                raise ValueError(
                    f"percolator query {qid!r}: phrase clause on "
                    f"doc-value field {schema.fields[f].name!r}"
                )
        for _, _, f, *_ in m_rows:
            fe2 = schema.fields[f]
            if fe2.is_doc_value:
                raise ValueError(
                    f"percolator query {qid!r}: multi-term clause on "
                    f"doc-value field {fe2.name!r} (text fields only)"
                )
        for _, _, f, *_ in r_rows:
            # date fields ride the numeric interval join: their bounds
            # are epoch micros by the time a RangeQuery exists (parser
            # rounding), and incoming doc values convert to micros at
            # percolate time (build.date_micros_expr)
            if not schema.fields[f].is_numeric and not schema.fields[f].is_date:
                hint = (
                    " (keyword ranges need STRING bounds)"
                    if schema.fields[f].is_keyword else ""
                )
                raise ValueError(
                    f"percolator query {qid!r}: numeric range clause on "
                    f"non-numeric field {schema.fields[f].name!r}{hint}"
                )
        for _, _, f, *_ in g_rows_q:
            if not schema.fields[f].is_geo:
                raise ValueError(
                    f"percolator query {qid!r}: geo clause on non-geo "
                    f"field {schema.fields[f].name!r}"
                )
        for j, (kqid, kocc, f, op, val) in enumerate(k_rows):
            fe = schema.fields[f]
            if op in ("eq", "in", "range") and not fe.is_keyword \
                    and not fe.is_ip:
                raise ValueError(
                    f"percolator query {qid!r}: keyword {op!r} clause on "
                    f"non-keyword field {fe.name!r}"
                )
            if op == "exists" and not fe.is_doc_value:
                raise ValueError(
                    f"percolator query {qid!r}: exists clause on "
                    f"non-doc-value field {fe.name!r}"
                )
            # ip field: subscription values normalize to the canonical
            # hex exactly like forward search (parser-lowered queries
            # already carry it; programmatic raw literals encode here,
            # and a malformed SUBSCRIPTION is loud — only incoming DOC
            # values get the tolerant null treatment)
            if fe.is_ip:
                from .ip import normalize_ip_value

                if op == "eq":
                    k_rows[j] = (kqid, kocc, f, op,
                                 normalize_ip_value(val, fe.name))
                elif op == "in":
                    k_rows[j] = (kqid, kocc, f, op, tuple(
                        normalize_ip_value(v, fe.name) for v in val))
                elif op == "range":
                    lo, hi, ilo, ihi = val
                    k_rows[j] = (
                        kqid, kocc, f, op,
                        (None if lo is None
                         else normalize_ip_value(lo, fe.name),
                         None if hi is None
                         else normalize_ip_value(hi, fe.name), ilo, ihi),
                    )
            # lowercase-normalized keyword field: normalize the stored
            # query values exactly like forward search does
            if fe.analyzer == "lowercase":
                if op == "eq":
                    k_rows[j] = (kqid, kocc, f, op, val.lower())
                elif op == "in":
                    k_rows[j] = (kqid, kocc, f, op,
                                 tuple(v.lower() for v in val))
                elif op == "range":
                    lo, hi, ilo, ihi = val
                    k_rows[j] = (
                        kqid, kocc, f, op,
                        (None if lo is None else lo.lower(),
                         None if hi is None else hi.lower(), ilo, ihi),
                    )
        if tree is not None:
            # nested tree: satisfaction is evaluated against the tree —
            # no req_rows entry. Root must be able to match at all
            # (pure-negative/no-positive roots never match; engine
            # lowering returns CEmpty for them).
            if tree["k"] == "bool" and not (
                tree["must"] or tree["should"] or tree["filter"]
            ):
                raise ValueError(
                    f"percolator query {qid!r} has no positive clause — a "
                    f"pure-negative query matches nothing (engine semantics)"
                )
            import json as _json

            tree_rows.append((qid, _json.dumps(tree)))
            term_rows.extend(dict.fromkeys(t_rows))
            phrase_rows.extend(dict.fromkeys(p_rows))
            range_rows.extend(dict.fromkeys(r_rows))
            kw_rows.extend(dict.fromkeys(k_rows))
            mt_rows.extend(dict.fromkeys(m_rows))
            mp_rows.extend(dict.fromkeys(mp_rows_q))
            geo_rows.extend(dict.fromkeys(g_rows_q))
            continue
        musts = {(f, t) for _, o, f, t in t_rows if o in (MUST, FILTER)} | {
            (f, ts, s) for _, o, f, ts, s in p_rows if o in (MUST, FILTER)
        } | {r[2:] for r in r_rows if r[1] in (MUST, FILTER)} | {
            r[2:] for r in k_rows if r[1] in (MUST, FILTER)
        } | {r[2:] for r in m_rows if r[1] in (MUST, FILTER)} | {
            r[2:] for r in mp_rows_q if r[1] in (MUST, FILTER)
        } | {r[2:] for r in g_rows_q if r[1] in (MUST, FILTER)}
        shoulds = {(f, t) for _, o, f, t in t_rows if o == SHOULD} | {
            (f, ts, s) for _, o, f, ts, s in p_rows if o == SHOULD
        } | {r[2:] for r in r_rows if r[1] == SHOULD} | {
            r[2:] for r in k_rows if r[1] == SHOULD
        } | {r[2:] for r in m_rows if r[1] == SHOULD} | {
            r[2:] for r in mp_rows_q if r[1] == SHOULD
        } | {r[2:] for r in g_rows_q if r[1] == SHOULD}
        n_positive = len(musts) + len(shoulds)
        if n_positive == 0:
            raise ValueError(
                f"percolator query {qid!r} has no positive clause — a "
                f"pure-negative query matches nothing (engine semantics)"
            )
        min_should = logical.min_should if isinstance(logical, BooleanQuery) else 1
        # engine rule: SHOULD is required when there is no TRUE MUST
        # clause (ordinary union: >=1 — FILTERs do NOT make SHOULD
        # optional: forward lowering puts the should-union in CFilter's
        # BASE, plan.py) or when min_should > 1 (explicit at_least,
        # required even beside MUST). Must use the PRE-normalization
        # occurs — leaf() folds FILTER into MUST for unit dedup, so the
        # `musts` unit set can be non-empty on a query with no true MUST.
        has_true_must = (
            any(o == MUST for o, _ in logical.subqueries)
            if isinstance(logical, BooleanQuery)
            else True
        )
        if min_should > 1:
            req_should = min_should
        elif shoulds and not has_true_must:
            req_should = 1
        else:
            req_should = 0
        term_rows.extend(dict.fromkeys(t_rows))  # distinct, order-preserving
        phrase_rows.extend(dict.fromkeys(p_rows))
        range_rows.extend(dict.fromkeys(r_rows))
        kw_rows.extend(dict.fromkeys(k_rows))
        mt_rows.extend(dict.fromkeys(m_rows))
        mp_rows.extend(dict.fromkeys(mp_rows_q))
        geo_rows.extend(dict.fromkeys(g_rows_q))
        req_rows.append((qid, len(musts), req_should))
    field_ids = tuple(
        sorted(
            {f for _, _, f, _ in term_rows}
            | {f for _, _, f, _, _ in phrase_rows}
            | {r[2] for r in range_rows}
            | {r[2] for r in kw_rows}
            | {r[2] for r in mt_rows}
            | {r[2] for r in mp_rows}
            | {r[2] for r in geo_rows}
        )
    )
    return PercolatorQueries(
        tuple(term_rows), tuple(req_rows), field_ids, tuple(phrase_rows),
        tuple(range_rows), tuple(kw_rows), tuple(tree_rows), tuple(mt_rows),
        tuple(mp_rows), tuple(geo_rows),
    )


def _tokens_expr(fe, col: str):
    """array<string> analyzed-token column for one schema field — the
    JVM regex fast path for the default analyzer, the vectorized Arrow
    kernel path (pandas_udf) for any other registered analyzer."""
    from pyspark.sql import functions as F

    if fe.analyzer == "default":
        from .textops import tokens_col

        return tokens_col(col)

    analyzer_name = fe.analyzer
    get_analyzer(analyzer_name)  # fail fast on unknown analyzer

    import pandas as pd  # noqa: F401

    @F.pandas_udf("array<string>")
    def _analyze(s):
        return get_analyzer(analyzer_name).analyze_series(s.fillna(""))

    return _analyze(F.col(col))


def _match_phrases_batch(
    token_lists, phrases: list[tuple[str, str, tuple[str, ...], int]]
) -> list[tuple[int, str, str]]:
    """Verify every phrase against every doc of one Arrow batch in one
    vectorized pass per phrase. ``token_lists``: sequence of per-doc
    token lists; ``phrases``: (query_id, occur, terms, slop). Returns
    (row_index, query_id, occur) for each matched (doc, phrase).

    Positions are encoded batch-wide as row*BIG + pos and the in-order
    window DP is the forward phrase scorer's algorithm verbatim
    (query/exec.py eval_phrase slop path): chain the maximum valid start
    per occurrence slot-by-slot, accept ends whose span <= k-1+slop —
    slop=0 degenerates to the exact consecutive phrase. One np.flatnonzero
    per distinct term per batch; terms shared by phrases decode once."""
    lens = np.fromiter(
        (len(t) for t in token_lists), dtype=np.int64, count=len(token_lists)
    )
    total = int(lens.sum())
    if total == 0:
        return []
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists])
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    enc_all = np.repeat(np.arange(len(lens), dtype=np.int64), lens) * _BIG + (
        np.arange(total, dtype=np.int64) - offs
    )
    needed = {t for _, _, terms, _ in phrases for t in terms}
    by_term = {t: enc_all[flat == t] for t in needed}
    out: list[tuple[int, str, str]] = []
    for qid, occur, terms, slop in phrases:
        encs = [by_term[t] for t in terms]
        if any(len(e) == 0 for e in encs):
            continue
        best = encs[0].copy()
        for i in range(1, len(encs)):
            prefmax = np.maximum.accumulate(best)
            enc_i = encs[i]
            j = np.searchsorted(encs[i - 1], enc_i, side="left") - 1
            cand = np.where(j >= 0, prefmax[np.clip(j, 0, None)], np.int64(-1))
            same_row = (cand >= 0) & (cand // _BIG == enc_i // _BIG)
            best = np.where(same_row, cand, np.int64(-1))
        enc_last = encs[-1]
        ends = enc_last[
            (best >= 0) & (enc_last - best <= np.int64(len(encs) - 1 + slop))
        ]
        for r in np.unique(ends // _BIG):
            out.append((int(r), qid, occur))
    return out


def _match_mp_batch(token_lists, mps):
    """Slot-based phrase verification (MultiPhraseQuery / phrase-prefix):
    the SAME in-order window DP as _match_phrases_batch, with each
    slot's position list = sorted union of its alternatives' positions.
    A ``last_prefix`` appends one more slot whose alternatives are every
    batch token starting with the prefix (doc-local expansion, uncapped
    — the mt_rows contract); its positions are computed once per
    distinct prefix per batch."""
    lens = np.fromiter(
        (len(t) for t in token_lists), dtype=np.int64, count=len(token_lists)
    )
    total = int(lens.sum())
    if total == 0:
        return []
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists])
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    enc_all = np.repeat(np.arange(len(lens), dtype=np.int64), lens) * _BIG + (
        np.arange(total, dtype=np.int64) - offs
    )
    needed = {t for _, _, slots, _, _ in mps for slot in slots for t in slot}
    by_term = {t: enc_all[flat == t] for t in needed}
    prefix_cache: dict[str, np.ndarray] = {}
    out: list[tuple[int, str, str]] = []
    for qid, occur, slots, slop, last_prefix in mps:
        encs = []
        ok = True
        for slot in slots:
            arrs = [by_term[t] for t in slot if len(by_term[t])]
            if not arrs:
                ok = False
                break
            encs.append(
                arrs[0] if len(arrs) == 1 else np.sort(np.concatenate(arrs))
            )
        if ok and last_prefix is not None:
            if last_prefix not in prefix_cache:
                mask = np.fromiter(
                    (str(t).startswith(last_prefix) for t in flat),
                    dtype=bool, count=total,
                )
                prefix_cache[last_prefix] = enc_all[mask]
            pe = prefix_cache[last_prefix]
            if len(pe) == 0:
                ok = False
            else:
                encs.append(pe)
        if not ok or not encs:
            continue
        if len(encs) == 1:
            for r in np.unique(encs[0] // _BIG):
                out.append((int(r), qid, occur))
            continue
        best = encs[0].copy()
        for i in range(1, len(encs)):
            prefmax = np.maximum.accumulate(best)
            enc_i = encs[i]
            j = np.searchsorted(encs[i - 1], enc_i, side="left") - 1
            cand = np.where(j >= 0, prefmax[np.clip(j, 0, None)], np.int64(-1))
            same_row = (cand >= 0) & (cand // _BIG == enc_i // _BIG)
            best = np.where(same_row, cand, np.int64(-1))
        enc_last = encs[-1]
        ends = enc_last[
            (best >= 0) & (enc_last - best <= np.int64(len(encs) - 1 + slop))
        ]
        for r in np.unique(ends // _BIG):
            out.append((int(r), qid, occur))
    return out


def _match_mt_batch(tok_lists, clauses):
    """Evaluate multi-term clauses against each doc's own token set —
    one (row, qid, occur) per matched unit per doc. Pattern/fuzzy
    matchers are evaluated ONCE over the batch's distinct tokens (the
    expensive part is per-token, not per-doc), then membership is a set
    intersection per doc. Semantics mirror forward expansion exactly:
    anchored fullmatch for patterns (expand._pattern_pairs), shared
    prefix + levenshtein/damerau radius for fuzzy (expand._fuzzy_pairs),
    but UNCAPPED — the doc-local candidate set plays the role of ES's
    per-document MemoryIndex."""
    import re as _re

    from .query.expand import damerau_within, levenshtein_within

    all_tokens = {t for toks in tok_lists for t in toks}
    match_sets = []
    for _qid, _occ, kind, payload in clauses:
        if kind == "prefix":
            ms = {t for t in all_tokens if t.startswith(payload)}
        elif kind == "pattern":
            rx = _re.compile(payload)
            ms = {t for t in all_tokens if rx.fullmatch(t)}
        else:  # fuzzy
            term, max_dist, prefix_length, transpositions = payload
            pre = term[: min(prefix_length, len(term))]
            within = damerau_within if transpositions else levenshtein_within
            ms = {
                t for t in all_tokens
                if t.startswith(pre) and within(t, term, max_dist)
            }
        match_sets.append(ms)
    rows = []
    for r, toks in enumerate(tok_lists):
        ts = set(toks)
        for (qid, occur, _, _), ms in zip(clauses, match_sets):
            if ts & ms:
                rows.append((r, qid, occur))
    return rows


def percolate(
    spark,
    docs_df,
    pq: PercolatorQueries,
    schema: Schema,
    id_col: str = "doc_id",
    column_map: dict[str, str] | None = None,
    broadcast_cap: int | None = 250_000,
):
    """Match every incoming document against every registered query.
    Returns a DataFrame of (``id_col``, query_id) pairs — one row per
    satisfied (document, stored query) combination, nothing for
    non-matches. ``column_map`` renames schema field -> docs_df column
    when they differ (default: same name).

    ``broadcast_cap`` is the subscription-scale ceiling: every
    query-side table here (term/range/keyword/geo rows, requirement
    counts) is driver-compiled, so its row count is known FOR FREE, and
    tables at or under the cap join with an explicit broadcast hint
    (the common alerting shape — thousands of subscriptions). A table
    OVER the cap drops the hint and joins by Spark's own sizing
    (shuffle, or AQE's runtime choice) instead of force-broadcasting a
    table that no longer fits executor memory — at 100k+ subscriptions
    the requirement/leaf tables cross the default 10MB broadcast
    budget, and a forced broadcast OOMs where a shuffle join just
    works. ``broadcast_cap=None`` keeps the hint unconditionally.
    The match set is identical either way (pinned by test); only the
    join strategy moves.

    Phrase clauses verify positionally against the doc's own analyzed
    token stream inside a mapInPandas pass (no shuffle — each matched
    (doc, phrase) contributes one row to the same satisfaction
    aggregation term clauses feed). The phrase pass scans every doc's
    tokens once per distinct constituent term per batch; with a very
    large phrase subscription set, pre-route docs by a cheap term
    percolation first."""
    from pyspark.sql import functions as F

    column_map = column_map or {}

    def _qside(df, n_rows: int):
        # driver-compiled table: hint only while it's genuinely small
        if broadcast_cap is None or n_rows <= broadcast_cap:
            return F.broadcast(df)
        return df

    def doc_col(fid: int) -> str:
        fe = schema.fields[fid]
        # column_map is keyed by FIELD name and wins; otherwise a
        # multi-field reads its source column, like the index build
        col = column_map.get(fe.name, fe.input_col)
        if col not in docs_df.columns:
            raise ValueError(
                f"percolate: docs_df has no column {col!r} for schema "
                f"field {fe.name!r} (have: {', '.join(docs_df.columns)})"
            )
        return col

    # resolve every referenced field up front (fail fast, phrase or term)
    for fid in pq.field_ids:
        doc_col(fid)

    contribs = []

    # term clauses on DOC-VALUE fields can never match — keyword/numeric
    # fields carry no analyzed tokens, exactly like forward search where
    # a TermQuery on such a field finds no postings and silently matches
    # nothing (bare NQL terms expand over every field, so subscriptions
    # like a bare "zzz" legitimately carry such clauses). Skipping the
    # field here yields no token rows -> the unit stays unsatisfied ->
    # the same no-match, instead of crashing on the missing analyzer.
    term_fids = sorted(
        fid
        for fid in {r[2] for r in pq.term_rows}
        if not schema.fields[fid].is_doc_value
    )
    if term_fids:
        per_field = []
        for fid in term_fids:
            fe = schema.fields[fid]
            per_field.append(
                docs_df.select(
                    F.col(id_col).alias("_pid"),
                    F.lit(fid).alias("field_id"),
                    F.explode(
                        F.array_distinct(_tokens_expr(fe, doc_col(fid)))
                    ).alias("term"),
                )
            )
        doc_terms = per_field[0]
        for df in per_field[1:]:
            doc_terms = doc_terms.unionByName(df)
        qterms = spark.createDataFrame(
            list(pq.term_rows),
            "query_id string, occur string, field_id int, term string",
        )
        contribs.append(
            doc_terms.join(
                _qside(qterms, len(pq.term_rows)), ["field_id", "term"]
            ).select(
                "_pid", "query_id", "occur"
            )
        )

    phrase_fids = sorted({r[2] for r in pq.phrase_rows})
    id_type = docs_df.schema[id_col].dataType.simpleString()
    for fid in phrase_fids:
        fe = schema.fields[fid]
        field_phrases = [
            (qid, occur, terms, slop)
            for qid, occur, f, terms, slop in pq.phrase_rows
            if f == fid
        ]
        toks_df = docs_df.select(
            F.col(id_col).alias("_pid"), _tokens_expr(fe, doc_col(fid)).alias("_toks")
        )

        def verify(batches, _phrases=field_phrases):
            for pdf in batches:
                rows = _match_phrases_batch(pdf["_toks"].tolist(), _phrases)
                if rows:
                    yield pd.DataFrame(
                        {
                            "_pid": pdf["_pid"].iloc[[r for r, _, _ in rows]].values,
                            "query_id": [q for _, q, _ in rows],
                            "occur": [o for _, _, o in rows],
                        }
                    )

        contribs.append(
            toks_df.mapInPandas(
                verify, f"_pid {id_type}, query_id string, occur string"
            )
        )

    mt_fids = sorted({r[2] for r in pq.mt_rows})
    for fid in mt_fids:
        fe = schema.fields[fid]
        field_mts = [
            (qid, occur, kind, payload)
            for qid, occur, f, kind, payload in pq.mt_rows
            if f == fid
        ]
        mtoks_df = docs_df.select(
            F.col(id_col).alias("_pid"),
            _tokens_expr(fe, doc_col(fid)).alias("_toks"),
        )

        def mt_verify(batches, _clauses=field_mts):
            for pdf in batches:
                rows = _match_mt_batch(pdf["_toks"].tolist(), _clauses)
                if rows:
                    yield pd.DataFrame(
                        {
                            "_pid": pdf["_pid"].iloc[[r for r, _, _ in rows]].values,
                            "query_id": [q for _, q, _ in rows],
                            "occur": [o for _, _, o in rows],
                        }
                    )

        contribs.append(
            mtoks_df.mapInPandas(
                mt_verify, f"_pid {id_type}, query_id string, occur string"
            )
        )

    mp_fids = sorted({r[2] for r in pq.mp_rows})
    for fid in mp_fids:
        fe = schema.fields[fid]
        field_mps = [
            (qid, occur, slots, slop, last_prefix)
            for qid, occur, f, slots, slop, last_prefix in pq.mp_rows
            if f == fid
        ]
        ptoks_df = docs_df.select(
            F.col(id_col).alias("_pid"),
            _tokens_expr(fe, doc_col(fid)).alias("_toks"),
        )

        def mp_verify(batches, _mps=field_mps):
            for pdf in batches:
                rows = _match_mp_batch(pdf["_toks"].tolist(), _mps)
                if rows:
                    yield pd.DataFrame(
                        {
                            "_pid": pdf["_pid"].iloc[[r for r, _, _ in rows]].values,
                            "query_id": [q for _, q, _ in rows],
                            "occur": [o for _, _, o in rows],
                        }
                    )

        contribs.append(
            ptoks_df.mapInPandas(
                mp_verify, f"_pid {id_type}, query_id string, occur string"
            )
        )

    rng_fids = sorted({r[2] for r in pq.range_rows})
    if rng_fids:
        vals = None
        for fid in rng_fids:
            c = F.col(doc_col(fid))
            if schema.fields[fid].is_date:
                # convert the incoming doc's raw column exactly like the
                # build does (epoch micros are exact in double to 2^53 —
                # year ~2255)
                from .build import date_micros_expr

                c = date_micros_expr(
                    c, docs_df.schema[doc_col(fid)].dataType,
                    schema.fields[fid].name,
                )
            v = docs_df.select(
                F.col(id_col).alias("_pid"),
                F.lit(fid).alias("field_id"),
                c.cast("double").alias("_v"),
            ).filter(F.col("_v").isNotNull())
            vals = v if vals is None else vals.unionByName(v)
        rq = spark.createDataFrame(
            list(pq.range_rows),
            "query_id string, occur string, field_id int, lo double, "
            "hi double, ilo boolean, ihi boolean",
        )
        cond = (
            (F.col("_v") > F.col("lo"))
            | (F.col("ilo") & (F.col("_v") == F.col("lo")))
        ) & (
            (F.col("_v") < F.col("hi"))
            | (F.col("ihi") & (F.col("_v") == F.col("hi")))
        )
        contribs.append(
            vals.join(
                _qside(rq, len(pq.range_rows)),
                on=(vals.field_id == rq.field_id) & cond,
            ).select("_pid", "query_id", "occur")
        )

    kw_fids = sorted({r[2] for r in pq.kw_rows})
    if kw_fids:
        # one row per (doc, field) with the doc value as string (keyword
        # columns are strings; exists on numerics only needs non-null) —
        # each keyword unit can hit at most once per doc, so the rows
        # feed the distinct-unit satisfaction counts directly
        kvals = None
        for fid in kw_fids:
            vcol = F.col(doc_col(fid)).cast("string")
            if schema.fields[fid].analyzer == "lowercase":
                # normalized keyword field: incoming docs carry RAW
                # values — normalize like the index build does
                vcol = F.lower(vcol)
            if schema.fields[fid].is_ip:
                # ip field: incoming docs carry raw ip literals —
                # encode to the canonical hex the subscriptions compare
                # against (Arrow-batched, unique-memoized); a garbled
                # stream value encodes to NULL and matches nothing (the
                # geo try_cast convention — tolerant on the doc side,
                # loud on the subscription side)
                from .ip import ip_hex_udf

                vcol = ip_hex_udf()(vcol)
            v = docs_df.select(
                F.col(id_col).alias("_pid"),
                F.lit(fid).alias("field_id"),
                vcol.alias("_v"),
            ).filter(F.col("_v").isNotNull())
            kvals = v if kvals is None else kvals.unionByName(v)
        krows = []
        for qid, occ, f, op, payload in pq.kw_rows:
            val, vset, lo, hi, ilo, ihi = None, None, None, None, None, None
            if op == "eq":
                val = payload
            elif op == "in":
                vset = list(payload)
            elif op == "range":
                lo, hi, ilo, ihi = payload
            krows.append((qid, occ, f, op, val, vset, lo, hi, ilo, ihi))
        kq = spark.createDataFrame(
            krows,
            "query_id string, occur string, field_id int, op string, "
            "value string, vset array<string>, lo string, hi string, "
            "ilo boolean, ihi boolean",
        )
        kcond = (
            (F.col("op") == "exists")
            | ((F.col("op") == "eq") & (F.col("_v") == F.col("value")))
            | ((F.col("op") == "in")
               & F.array_contains(F.col("vset"), F.col("_v")))
            | ((F.col("op") == "range")
               & (F.col("lo").isNull() | (F.col("_v") > F.col("lo"))
                  | (F.col("ilo") & (F.col("_v") == F.col("lo"))))
               & (F.col("hi").isNull() | (F.col("_v") < F.col("hi"))
                  | (F.col("ihi") & (F.col("_v") == F.col("hi")))))
        )
        contribs.append(
            kvals.join(
                _qside(kq, len(krows)),
                on=(kvals.field_id == kq.field_id) & kcond,
            ).select("_pid", "query_id", "occur")
        )

    geo_fids = sorted({r[2] for r in pq.geo_rows})
    if geo_fids:
        # incoming docs carry the build's canonical "lat,lon" string;
        # a missing/unparseable point matches no geo subscription (the
        # null-range convention). The geofence-alerting shape: every
        # (vehicle position, zone subscription) decided in one job.
        gvals = None
        for fid in geo_fids:
            parts = F.split(F.col(doc_col(fid)).cast("string"), ",", 2)
            # try_cast: a garbled point becomes NULL and matches nothing
            # (ANSI mode would throw on plain cast)
            v = docs_df.select(
                F.col(id_col).alias("_pid"),
                F.lit(fid).alias("field_id"),
                F.trim(F.get(parts, 0)).try_cast("double").alias("_lat"),
                F.trim(F.get(parts, 1)).try_cast("double").alias("_lon"),
            ).filter(F.col("_lat").isNotNull() & F.col("_lon").isNotNull())
            gvals = v if gvals is None else gvals.unionByName(v)
        dist_rows = [
            (q, o, f, *payload)
            for q, o, f, op, payload in pq.geo_rows
            if op == "dist"
        ]
        if dist_rows:
            from .geo import haversine_m_cols

            gq = spark.createDataFrame(
                dist_rows,
                "query_id string, occur string, field_id int, "
                "lat0 double, lon0 double, radius_m double",
            )
            dcond = (
                haversine_m_cols(
                    F.col("_lat"), F.col("_lon"),
                    F.col("lat0"), F.col("lon0"),
                )
                <= F.col("radius_m")
            )
            contribs.append(
                gvals.join(
                    _qside(gq, len(dist_rows)),
                    on=(gvals.field_id == gq.field_id) & dcond,
                ).select("_pid", "query_id", "occur")
            )
        bbox_rows = [
            (q, o, f, *payload)
            for q, o, f, op, payload in pq.geo_rows
            if op == "bbox"
        ]
        if bbox_rows:
            bq = spark.createDataFrame(
                bbox_rows,
                "query_id string, occur string, field_id int, "
                "top double, lft double, bottom double, rgt double",
            )
            lon_ok = F.when(
                F.col("lft") <= F.col("rgt"),
                (F.col("_lon") >= F.col("lft"))
                & (F.col("_lon") <= F.col("rgt")),
            ).otherwise(  # antimeridian wrap, the forward bbox rule
                (F.col("_lon") >= F.col("lft"))
                | (F.col("_lon") <= F.col("rgt"))
            )
            bcond = (
                (F.col("_lat") >= F.col("bottom"))
                & (F.col("_lat") <= F.col("top"))
                & lon_ok
            )
            contribs.append(
                gvals.join(
                    _qside(bq, len(bbox_rows)),
                    on=(gvals.field_id == bq.field_id) & bcond,
                ).select("_pid", "query_id", "occur")
            )
        poly_edges = []
        for q, o, f, op, payload in pq.geo_rows:
            if op != "poly":
                continue
            from .geo import _polygon_edges

            for xi, yi, xj, yj in _polygon_edges(payload):
                poly_edges.append((q, o, f, xi, yi, xj, yj, yj - yi))
        if poly_edges:
            # one row per (doc, polygon edge); the division-free
            # crossing test runs columnar (the edge's Δlat sign is a
            # column here, so both comparison directions evaluate under
            # one when()); odd total crossings per (doc, query) = inside
            pe = spark.createDataFrame(
                poly_edges,
                "query_id string, occur string, field_id int, "
                "xi double, yi double, xj double, yj double, c double",
            )
            straddles = (F.col("yi") > F.col("_lat")) != (
                F.col("yj") > F.col("_lat")
            )
            lhs = (F.col("_lon") - F.col("xi")) * F.col("c")
            rhs = (F.col("xj") - F.col("xi")) * (F.col("_lat") - F.col("yi"))
            cross = straddles & F.when(
                F.col("c") > 0, lhs < rhs
            ).otherwise(lhs > rhs)
            crossings = (
                gvals.join(
                    _qside(pe, len(poly_edges)), gvals.field_id == pe.field_id
                )
                .groupBy("_pid", "query_id", "occur")
                .agg(
                    F.sum(F.when(cross, 1).otherwise(0)).alias("_n")
                )
            )
            contribs.append(
                crossings.filter(F.col("_n") % 2 == 1).select(
                    "_pid", "query_id", "occur"
                )
            )

    hits = contribs[0]
    for df in contribs[1:]:
        hits = hits.unionByName(df)

    nested_matched = None
    if pq.tree_rows:
        import json as _json

        trees = {qid: _json.loads(t) for qid, t in pq.tree_rows}
        tree_ids = spark.createDataFrame(
            [(q,) for q in trees], "query_id string"
        )
        nhits = hits.join(_qside(tree_ids, len(trees)), "query_id")
        # flat queries keep the pure-counts fast path below
        hits = hits.join(
            _qside(tree_ids, len(trees)), "query_id", "left_anti"
        )
        # one partial-aggregated collect_set per (doc, nested query):
        # the set is bounded by the query's unit count (driver-compiled,
        # small), then the tree evaluates vectorized per Arrow batch
        nagg = nhits.groupBy("_pid", "query_id").agg(
            F.collect_set("occur").alias("units")
        )

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _tree_sat(qids: pd.Series, units: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _eval_tree(trees[q], {int(u[1:]) for u in us})
                    for q, us in zip(qids, units)
                ]
            )

        nested_matched = (
            nagg.filter(_tree_sat(F.col("query_id"), F.col("units")))
            .select(F.col("_pid").alias(id_col), "query_id")
        )
        if not pq.req_rows:
            return nested_matched

    reqs = spark.createDataFrame(
        list(pq.req_rows), "query_id string, n_must int, req_should int"
    )
    # doc_terms is distinct per (doc, field) by construction
    # (array_distinct before explode), qterms rows are distinct, and the
    # phrase pass emits one row per matched (doc, phrase unit) — so
    # plain conditional counts ARE distinct-unit counts, and unlike
    # count_distinct they partial-aggregate map-side.
    agg = hits.groupBy("_pid", "query_id").agg(
        F.sum(F.when(F.col("occur").isin(MUST, FILTER), 1).otherwise(0)).alias(
            "must_hits"
        ),
        F.sum(F.when(F.col("occur") == SHOULD, 1).otherwise(0)).alias(
            "should_hits"
        ),
        F.sum(F.when(F.col("occur") == MUST_NOT, 1).otherwise(0)).alias(
            "not_hits"
        ),
    )
    matched = (
        agg.join(_qside(reqs, len(pq.req_rows)), "query_id")
        .filter(
            (F.col("must_hits") == F.col("n_must"))
            & (F.col("should_hits") >= F.col("req_should"))
            & (F.col("not_hits") == 0)
        )
        .select(F.col("_pid").alias(id_col), "query_id")
    )
    if nested_matched is not None:
        matched = matched.unionByName(nested_matched)
    return matched
