"""Query planning: logical tree -> stats-bound compiled query ("Weight").

Mirrors ostrich's Weight binding (/root/reference/reader/searcher.go:19-27,
/root/reference/query/term_query.go:11-36): global stats — total doc count
and per-term doc frequency summed over segments — are bound ONCE per
search, before per-segment execution. Physical planning rules mirror
BooleanWeight.booleanScorerWrapper
(/root/reference/query/boolean_query.go:100-190):

- single subquery -> unwrap;
- shoulds: one -> as-is, else union;
- musts -> intersection;
- both -> must/should combination;
- none -> empty.

Scoring formulas:
- TF-IDF (the reference contract, /root/reference/query/tfidf_weight.go:9-18):
  idf = 1 + ln(totalDocNum / (1 + docFreq)); score = tf * idf.
- BM25 (north rule, k1=1.2, b=0.75; not in the reference — README.md:20):
  idf = ln(1 + (N - df + 0.5) / (df + 0.5))
  score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field

from .parser import (
    AllQuery,
    BlendedTermQuery,
    BooleanQuery,
    BoostingQuery,
    CombinedTermQuery,
    ConstantScoreQuery,
    SpanContainingQuery,
    SpanOrQuery,
    SpanWithinQuery,
    DisMaxQuery,
    EmptyQuery,
    ExistsQuery,
    FuzzyQuery,
    IdsQuery,
    GeoBoundingBoxQuery,
    GeoDistanceQuery,
    GeoPolygonQuery,
    GeoShapeQuery,
    RangeFieldQuery,
    MultiPhraseQuery,
    NearQuery,
    PhraseQuery,
    PhrasePrefixQuery,
    KeywordQuery,
    PrefixQuery,
    RangeQuery,
    RegexpQuery,
    SpanFirstQuery,
    SpanMultiQuery,
    SpanNearQuery,
    SpanNotQuery,
    TermQuery,
    TermsQuery,
    TermsSetQuery,
    WildcardQuery,
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
)

K1 = 1.2
B = 0.75

SCORER_TFIDF = "tfidf"
SCORER_BM25 = "bm25"


@dataclass(frozen=True)
class CTerm:
    field_id: int
    term: str
    doc_freq: int
    idf: float
    avgdl: float  # avg field length for this field (BM25)


@dataclass(frozen=True)
class CPhrase:
    """Compiled phrase: consecutive terms in one field. idf follows the
    Lucene PhraseWeight convention (sum of constituent idfs); tf is the
    per-doc phrase occurrence count."""

    field_id: int
    terms: tuple[str, ...]
    idf: float  # sum over constituent terms
    avgdl: float
    slop: int = 0  # in-order window slack; 0 = consecutive


@dataclass(frozen=True)
class CNear:
    """Compiled unordered proximity (NearQuery contract): end position q
    matches iff every constituent occurs in [q-(k-1+slop), q]; tf =
    distinct end positions; idf = sum of constituent idfs."""

    field_id: int
    terms: tuple[str, ...]
    idf: float
    avgdl: float
    slop: int = 0


@dataclass(frozen=True)
class CMultiPhrase:
    """Compiled multi-phrase: slot i matches any of slots[i]. idf = sum
    over every slot's (index-present) alternatives (MultiPhraseQuery
    stats convention); tf = distinct in-order window end positions
    (PhraseQuery window contract)."""

    field_id: int
    slots: tuple[tuple[str, ...], ...]
    idf: float
    avgdl: float
    slop: int = 0


@dataclass(frozen=True)
class CSpanFirst:
    """Compiled span_first: occurrences of ANY of ``terms`` restricted
    to positions < ``end``. A single term is the classic shape (its own
    df/idf — Lucene SpanWeight builds term statistics, only the match
    set narrows); multiple terms are the spanFirst(spanOr(...)) union
    (idf = sum of the present alternatives' idfs, doc_freq = their df
    sum). Absent alternatives were dropped at lowering. tf =
    occurrences inside the window."""

    field_id: int
    terms: tuple[str, ...]
    doc_freq: int
    idf: float
    avgdl: float
    end: int


@dataclass(frozen=True)
class CSpanNot:
    """Compiled span_not: occurrences of ANY include term not within
    [p - pre, p + post] of any exclude-term occurrence. Stats are the
    include side's own (SpanWeight convention, like CSpanFirst — a
    multi-term include sums the present alternatives' idfs); tf =
    surviving occurrences. Exclude terms absent from the dictionary are
    dropped at lowering (they cannot reject anything); all absent
    lowers to CTerm / CSpanOr — one kernel less, same score."""

    field_id: int
    terms: tuple[str, ...]
    exclude: tuple[str, ...]
    doc_freq: int
    idf: float
    avgdl: float
    pre: int
    post: int


@dataclass(frozen=True)
class CCombinedTerm:
    """Compiled combined_fields term (Lucene CombinedFieldQuery / BM25F
    pseudo-field; see parser.CombinedTermQuery for the full contract).
    ``fields`` keeps EVERY listed (field_id, weight) — the combined doc
    length sums weighted norms of all of them, term present or not; the
    per-field norms ride the aux cogroup (rid assigned by exec like any
    range node). df = max over fields clipped to N; avgdl = weighted sum
    of the fields' avgdl."""

    fields: tuple  # ((field_id, weight), ...)
    term: str
    doc_freq: int
    idf: float
    avgdl: float


@dataclass(frozen=True)
class CSpanContain:
    """Compiled span_containing / span_within (``emit`` picks the side
    reported: "big" = containing, "little" = within). Both operands are
    fixed-width exact spans, so the containment test is two searchsorted
    probes per emitted span (the span_not window pattern). idf = sum of
    ALL constituent terms' idfs (Lucene SpanContaining/WithinWeight merge
    both sides' term states)."""

    field_id: int
    big: tuple[str, ...]
    little: tuple[str, ...]
    emit: str  # "big" | "little"
    idf: float
    avgdl: float


@dataclass(frozen=True)
class CSpanOr:
    """Compiled span_or: one scorer over the SUMMED tf of the present
    terms; idf = sum of their idfs (SpanWeight combined stats). Terms
    absent from the dictionary were dropped at lowering; a single
    survivor lowers to CTerm instead (identical score, WAND-eligible)."""

    field_id: int
    terms: tuple[str, ...]
    idf: float
    avgdl: float


@dataclass(frozen=True)
class CRange:
    """Compiled numeric range. Matches at constant score (ConstantScore
    semantics; boost folded in). The match set is computed OUTSIDE the
    postings scorer — from the docmap with parquet min/max pushdown — and
    rides the segment-scoring shuffle as an aux doc set keyed by ``rid``
    (exec assigns rids per search over the wire tree)."""

    field_id: int
    lo: float | int | None
    hi: float | int | None
    include_lo: bool
    include_hi: bool
    const_score: float


@dataclass(frozen=True)
class CKeyword:
    """Compiled keyword equality (ES term-on-keyword analog). Same
    delivery as CRange: the match set is a docmap scan (equality pushed
    to parquet — dictionary/min-max stats prune) riding the scoring
    shuffle as an aux doc set keyed by ``rid``. Constant score."""

    field_id: int
    value: str
    const_score: float


@dataclass(frozen=True)
class CTerms:
    """Compiled keyword set membership (ES terms / Lucene TermInSetQuery
    analog). Same delivery as CRange: ONE docmap scan with an IN
    predicate pushed to parquet (dictionary/min-max stats prune) riding
    the scoring shuffle as an aux doc set keyed by ``rid`` — one scan
    for N values, vs N scans for the equivalent OR-of-KeywordQuery.
    Constant score (a doc stores at most one value, so at most one hit)."""

    field_id: int
    values: tuple[str, ...]
    const_score: float


@dataclass(frozen=True)
class CIds:
    """Compiled ids query (ES ``ids`` analog): identity-column set
    membership. Same delivery as CTerms — ONE docmap scan, IN predicate
    pushed to parquet (identity columns are exactly the row-group-
    pruned point-lookup columns get_docs uses) — but addressed by
    docmap COLUMN NAME, not a schema field: identity columns need no
    mapping, like ES ``_id``. Constant score; dtype-exact (values cast
    to the column's actual type at execution)."""

    column: str
    values: tuple
    const_score: float


@dataclass(frozen=True)
class CExists:
    """Compiled exists (field has a non-NULL doc value). CRange-style
    aux delivery; constant score."""

    field_id: int
    const_score: float


@dataclass(frozen=True)
class CGeoDistance:
    """Compiled geo-distance filter (haversine <= radius on the
    ``__lat``/``__lon`` docmap pair). CRange-style aux delivery — the
    match set is ONE docmap scan with the trig evaluated JVM-side
    (Catalyst sin/cos/asin column expressions, whole-stage codegen; no
    Python in the scan) riding the scoring shuffle. Constant score."""

    field_id: int
    lat: float
    lon: float
    radius_m: float
    const_score: float


@dataclass(frozen=True)
class CGeoBBox:
    """Compiled geo bounding box (inclusive lat/lon comparisons on the
    docmap pair; dateline wrap when left > right). Pure comparisons —
    parquet min/max stats on the float columns prune row groups.
    CRange-style aux delivery; constant score."""

    field_id: int
    top: float
    left: float
    bottom: float
    right: float
    const_score: float


@dataclass(frozen=True)
class CGeoPolygon:
    """Compiled geo polygon (even-odd ray cast on the docmap float
    pair, division-free Catalyst arithmetic — see geo.polygon_pred).
    CRange-style aux delivery; constant score."""

    field_id: int
    points: tuple
    const_score: float


@dataclass(frozen=True)
class CRangeField:
    """Compiled range-field relation (stored-interval docs): interval
    arithmetic over the two typed bound columns, parquet min/max
    prunable. CRange-style aux delivery; constant score."""

    field_id: int
    relation: str
    lo: float | None
    hi: float | None
    const_score: float


@dataclass(frozen=True)
class CGeoShape:
    """Compiled geo_shape relation (stored-ring docs): the four bbox
    docmap columns decide ``within`` exactly and PRUNE the other
    relations (parquet min/max stats — the BKD-filter analog) before
    the Arrow-vectorized ring verify. CRange-style aux delivery;
    constant score."""

    field_id: int
    relation: str
    geometry: tuple
    const_score: float


@dataclass
class CTermsSet:
    """Union requiring >= m children per doc where m is a PER-DOC numeric
    doc value (Lucene CoveringQuery / ES terms_set). The m values ride
    the aux cogroup like a range match set, with a ``val`` column
    carrying the number. NOT WAND-eligible (per-doc threshold)."""

    children: list = dc_field(default_factory=list)
    m_field_id: int = 0


@dataclass
class CMinShould:
    """Union requiring >= m children to match; score = sum of matching
    children (Lucene minimumShouldMatch). NOT WAND-eligible: the count
    constraint invalidates single-term upper bounds."""

    children: list = dc_field(default_factory=list)
    m: int = 1


@dataclass
class CIntersection:
    children: list = dc_field(default_factory=list)


@dataclass
class CUnion:
    children: list = dc_field(default_factory=list)


@dataclass
class CMustShould:
    must: object = None
    should: object = None


@dataclass
class CDisMax:
    """Union scored max(children) + tie * (sum - max) (Lucene
    DisjunctionMaxQuery). NOT WAND-eligible: the per-term upper bounds
    assume sum combination."""

    children: list = dc_field(default_factory=list)
    tie: float = 0.0


@dataclass
class CFilter:
    """base constrained to filt-matches; scores from base alone (FILTER
    extension). ``base is None`` = pure-filter query: the filt match set
    with constant score 0.0 (Lucene's ConstantScore(0) for filter-only
    booleans)."""

    base: object = None
    filt: object = None


@dataclass
class CBoosting:
    """base's match set and scores, with docs also matching ``demote``
    scored base * nb (ES boosting query). NOT WAND-eligible as a union
    shape; nb <= 1 keeps base's term upper bounds valid but the node is
    routed through the exhaustive evaluator like every other composite."""

    base: object = None
    demote: object = None
    nb: float = 0.5


@dataclass
class CConstScore:
    """Wrapped query's MATCH SET at a stamped constant (ES
    constant_score / Lucene ConstantScoreQuery): inner scores are
    discarded, every match reports ``score``."""

    base: object = None
    score: float = 1.0


@dataclass
class CNot:
    """base minus exclude-matches (MUST_NOT extension). Scores come from
    base alone; exclude only filters."""

    base: object = None
    exclude: object = None


@dataclass(frozen=True)
class CAll:
    pass


@dataclass(frozen=True)
class CEmpty:
    pass


def tfidf_idf(total_docs: int, doc_freq: int) -> float:
    """Exactly /root/reference/query/tfidf_weight.go:13."""
    return 1.0 + math.log(float(total_docs) / (1.0 + float(doc_freq)))


def bm25_idf(total_docs: int, doc_freq: int) -> float:
    return math.log(1.0 + (total_docs - doc_freq + 0.5) / (doc_freq + 0.5))


_MULTITERM_REWRITE_MSG = (
    "Prefix/Fuzzy/Wildcard/Regexp/SpanMultiQuery must be expanded against "
    "the term dictionary first (query.expand.rewrite_multiterm) — "
    "exec.search does this automatically"
)


def _span_union_terms(term) -> tuple:
    """Plain term alternatives of a span_first/span_not include operand:
    a str is one alternative, a tuple is itself, an (unrewritten)
    SpanMultiQuery contributes none — its terms exist only post-rewrite."""
    if isinstance(term, str):
        return (term,)
    if isinstance(term, tuple):
        return term
    return ()


def collect_terms(q) -> list[TermQuery]:
    """Terms for stats binding / postings pruning — boost-STRIPPED so the
    batched path's set-dedup coalesces same-term clauses that differ only
    in boost (stats and the prune don't depend on boost)."""
    if isinstance(q, TermQuery):
        return [TermQuery(q.field_id, q.term)] if q.boost != 1.0 else [q]
    if isinstance(q, PhraseQuery):
        # constituents drive both stats binding and the postings prune
        return [TermQuery(q.field_id, t) for t in q.terms]
    if isinstance(q, MultiPhraseQuery):
        return [TermQuery(q.field_id, t) for slot in q.slots for t in slot]
    if isinstance(q, NearQuery):
        return [TermQuery(q.field_id, t) for t in q.terms]
    if isinstance(q, SpanNearQuery):
        return [TermQuery(q.field_id, t) for t in q.terms]
    if isinstance(q, TermsSetQuery):
        return [TermQuery(q.field_id, t) for t in q.terms]
    if isinstance(q, SpanFirstQuery):
        # term may be a tuple of alternatives; a SpanMultiQuery operand
        # contributes nothing pre-rewrite (stats bind post-rewrite)
        return [TermQuery(q.field_id, t) for t in _span_union_terms(q.term)]
    if isinstance(q, SpanNotQuery):
        # exclude postings must survive the prune too — the scorer
        # needs their positions to reject include occurrences
        return [
            TermQuery(q.field_id, t) for t in _span_union_terms(q.term)
        ] + [TermQuery(q.field_id, t) for t in q.exclude if isinstance(t, str)]
    if isinstance(q, BooleanQuery):
        out = []
        for _, sub in q.subqueries:
            out.extend(collect_terms(sub))
        return out
    if isinstance(q, DisMaxQuery):
        out = []
        for sub in q.children:
            out.extend(collect_terms(sub))
        return out
    if isinstance(q, BoostingQuery):
        # the negative side's postings must survive the prune too — the
        # segment scorer needs its match set to apply the demotion
        return collect_terms(q.positive) + collect_terms(q.negative)
    if isinstance(q, BlendedTermQuery):
        return [TermQuery(fid, term) for fid, term, _ in q.pairs]
    if isinstance(q, CombinedTermQuery):
        return [TermQuery(fid, q.term) for fid, _ in q.fields]
    if isinstance(q, SpanOrQuery):
        return [TermQuery(q.field_id, t) for t in q.terms]
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        return [TermQuery(q.field_id, t) for t in q.big + q.little]
    if isinstance(q, ConstantScoreQuery):
        return collect_terms(q.query)
    return []


def compile_query(
    q,
    doc_freqs: dict[tuple[int, str], int],
    total_docs: int,
    field_avgdl: dict[int, float],
    scorer: str = SCORER_TFIDF,
):
    """Lower the logical tree to compiled nodes with bound stats.

    ``doc_freqs`` maps (field_id, term) -> global doc_freq (0 if absent).
    A term absent from the whole index compiles to CEmpty — matching the
    reference's empty postings reader
    (/root/reference/internal/postings/inverted_index_reader.go:27-41).
    """
    if isinstance(q, AllQuery):
        return CAll()
    if isinstance(q, EmptyQuery):
        return CEmpty()
    if isinstance(q, TermQuery):
        df = doc_freqs.get((q.field_id, q.term), 0)
        if df == 0:
            return CEmpty()
        idf = tfidf_idf(total_docs, df) if scorer == SCORER_TFIDF else bm25_idf(total_docs, df)
        # boost folds into idf here (scores are linear in idf for both
        # formulas), so scorers, WAND bounds, and the wire stay untouched
        return CTerm(
            q.field_id, q.term, df, idf * q.boost, field_avgdl.get(q.field_id, 1.0)
        )
    if isinstance(q, PhraseQuery):
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        idf_sum = 0.0
        for t in q.terms:
            df = doc_freqs.get((q.field_id, t), 0)
            if df == 0:
                # a constituent absent from the index -> no doc can match
                return CEmpty()
            idf_sum += idf_fn(total_docs, df)
        return CPhrase(
            q.field_id, q.terms, idf_sum * q.boost,
            field_avgdl.get(q.field_id, 1.0), q.slop,
        )
    if isinstance(q, NearQuery):
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        idf_sum = 0.0
        for t in q.terms:
            df = doc_freqs.get((q.field_id, t), 0)
            if df == 0:
                return CEmpty()
            idf_sum += idf_fn(total_docs, df)
        return CNear(
            q.field_id, q.terms, idf_sum * q.boost,
            field_avgdl.get(q.field_id, 1.0), q.slop,
        )
    if isinstance(q, SpanNearQuery):
        # this engine's sloppy phrase IS the in-order span contract
        # (strictly increasing chain, width <= k-1+slop; see
        # parser.SpanNearQuery), so the ordered span_near lowers to the
        # SAME compiled node — one evaluation kernel, provably one
        # semantics
        return compile_query(
            PhraseQuery(q.field_id, q.terms, slop=q.slop, boost=q.boost),
            doc_freqs, total_docs, field_avgdl, scorer,
        )
    if isinstance(q, MultiPhraseQuery):
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        idf_sum = 0.0
        kept_slots = []
        for slot in q.slots:
            # alternatives absent from the index contribute nothing; a
            # slot with NO present alternative can never be satisfied
            kept = tuple(t for t in slot if doc_freqs.get((q.field_id, t), 0) > 0)
            if not kept:
                return CEmpty()
            kept_slots.append(kept)
            for t in kept:
                idf_sum += idf_fn(total_docs, doc_freqs[(q.field_id, t)])
        return CMultiPhrase(
            q.field_id, tuple(kept_slots), idf_sum * q.boost,
            field_avgdl.get(q.field_id, 1.0), q.slop,
        )
    if isinstance(q, SpanFirstQuery):
        if isinstance(q.term, SpanMultiQuery):
            raise ValueError(_MULTITERM_REWRITE_MSG)
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        inc = _span_union_terms(q.term)
        kept = tuple(t for t in inc if doc_freqs.get((q.field_id, t), 0) > 0)
        if not kept:
            return CEmpty()
        dfs = [doc_freqs[(q.field_id, t)] for t in kept]
        idf_sum = sum(idf_fn(total_docs, d) for d in dfs)
        return CSpanFirst(
            q.field_id, kept, int(sum(dfs)), idf_sum * q.boost,
            field_avgdl.get(q.field_id, 1.0), q.end,
        )
    if isinstance(q, SpanNotQuery):
        if isinstance(q.term, SpanMultiQuery) or any(
            not isinstance(e, str) for e in q.exclude
        ):
            raise ValueError(_MULTITERM_REWRITE_MSG)
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        inc = _span_union_terms(q.term)
        kept_inc = tuple(
            t for t in inc if doc_freqs.get((q.field_id, t), 0) > 0
        )
        if not kept_inc:
            return CEmpty()
        inc_dfs = [doc_freqs[(q.field_id, t)] for t in kept_inc]
        idf = sum(idf_fn(total_docs, d) for d in inc_dfs) * q.boost
        avgdl = field_avgdl.get(q.field_id, 1.0)
        kept = tuple(
            t for t in q.exclude if doc_freqs.get((q.field_id, t), 0) > 0
        )
        if not kept:
            # nothing can reject: the include's own SpanOr form, same
            # stats — the positions decode (and its positions=True
            # requirement) drops away; single include = plain term
            if len(kept_inc) == 1:
                return CTerm(q.field_id, kept_inc[0], inc_dfs[0], idf, avgdl)
            return CSpanOr(q.field_id, kept_inc, idf, avgdl)
        return CSpanNot(
            q.field_id, kept_inc, kept, int(sum(inc_dfs)), idf, avgdl,
            q.pre, q.post,
        )
    if isinstance(q, ConstantScoreQuery):
        base = compile_query(q.query, doc_freqs, total_docs, field_avgdl, scorer)
        if isinstance(base, CEmpty):
            return CEmpty()
        return CConstScore(base, q.boost)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        # every constituent term (both sides) must exist: a missing big
        # term means big never matches; a missing little term means
        # containment is never satisfied — either way, no doc matches
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        idf_sum = 0.0
        for t in q.big + q.little:
            df = doc_freqs.get((q.field_id, t), 0)
            if df == 0:
                return CEmpty()
            idf_sum += idf_fn(total_docs, df)
        if len(q.big) < len(q.little):
            # a shorter span can never contain a longer one
            return CEmpty()
        return CSpanContain(
            q.field_id, q.big, q.little,
            "big" if isinstance(q, SpanContainingQuery) else "little",
            idf_sum * q.boost, field_avgdl.get(q.field_id, 1.0),
        )
    if isinstance(q, CombinedTermQuery):
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        per_field = [doc_freqs.get((fid, q.term), 0) for fid, _ in q.fields]
        if not any(per_field):
            return CEmpty()
        # pseudo-TermStatistics: df = max over fields, clipped to N (the
        # Lucene CombinedFieldQuery convention — union df is never
        # materialized); pseudo avgdl = weighted sum of field avgdl
        df = min(int(total_docs), max(per_field))
        avgdl = sum(w * field_avgdl.get(fid, 1.0) for fid, w in q.fields)
        return CCombinedTerm(
            q.fields, q.term, df, idf_fn(total_docs, df) * q.boost, avgdl
        )
    if isinstance(q, SpanOrQuery):
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        kept = tuple(
            t for t in dict.fromkeys(q.terms)
            if doc_freqs.get((q.field_id, t), 0) > 0
        )
        if not kept:
            return CEmpty()
        avgdl = field_avgdl.get(q.field_id, 1.0)
        if len(kept) == 1:
            # one surviving clause scores exactly like the bare term
            # (tf = its occurrences, idf = its idf) — lower to CTerm so
            # the query stays WAND-eligible
            df = doc_freqs[(q.field_id, kept[0])]
            return CTerm(
                q.field_id, kept[0], df,
                idf_fn(total_docs, df) * q.boost, avgdl,
            )
        idf_sum = sum(
            idf_fn(total_docs, doc_freqs[(q.field_id, t)]) for t in kept
        )
        return CSpanOr(q.field_id, kept, idf_sum * q.boost, avgdl)
    if isinstance(q, RangeQuery):
        return CRange(
            q.field_id, q.lo, q.hi, q.include_lo, q.include_hi, q.boost
        )
    if isinstance(q, KeywordQuery):
        return CKeyword(q.field_id, q.value, q.boost)
    if isinstance(q, TermsQuery):
        return CTerms(q.field_id, q.values, q.boost)
    if isinstance(q, IdsQuery):
        return CIds(q.column, q.values, q.boost)
    if isinstance(q, ExistsQuery):
        return CExists(q.field_id, q.boost)
    if isinstance(q, TermsSetQuery):
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        kids = []
        for t in q.terms:
            df = doc_freqs.get((q.field_id, t), 0)
            if df == 0:
                continue  # an absent term can never count toward m
            kids.append(
                CTerm(
                    q.field_id, t, df,
                    idf_fn(total_docs, df) * q.boost,
                    field_avgdl.get(q.field_id, 1.0),
                )
            )
        if not kids:
            return CEmpty()
        return CTermsSet(kids, q.m_field_id)
    if isinstance(q, GeoDistanceQuery):
        return CGeoDistance(q.field_id, q.lat, q.lon, q.radius_m, q.boost)
    if isinstance(q, GeoBoundingBoxQuery):
        return CGeoBBox(q.field_id, q.top, q.left, q.bottom, q.right, q.boost)
    if isinstance(q, GeoPolygonQuery):
        return CGeoPolygon(q.field_id, q.points, q.boost)
    if isinstance(q, GeoShapeQuery):
        return CGeoShape(q.field_id, q.relation, q.geometry, q.boost)
    if isinstance(q, RangeFieldQuery):
        return CRangeField(q.field_id, q.relation, q.lo, q.hi, q.boost)
    if isinstance(q, (PrefixQuery, FuzzyQuery, WildcardQuery, RegexpQuery,
                      PhrasePrefixQuery, SpanMultiQuery)):
        raise ValueError(_MULTITERM_REWRITE_MSG)
    if isinstance(q, BlendedTermQuery):
        # Lucene BlendedTermQuery: every leaf keeps its OWN postings and
        # tf but scores with idf of the GROUP-MAX df, so the same word
        # is comparable across fields (the cross_fields contract);
        # absent-from-a-field leaves drop, absent-everywhere is empty
        idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
        dfs = [doc_freqs.get((fid, term), 0) for fid, term, _ in q.pairs]
        bdf = max(dfs)
        if bdf == 0:
            return CEmpty()
        blended_idf = idf_fn(total_docs, bdf)
        kids = [
            CTerm(fid, term, df, blended_idf * fb * q.boost,
                  field_avgdl.get(fid, 1.0))
            for (fid, term, fb), df in zip(q.pairs, dfs)
            if df > 0
        ]
        if len(kids) == 1:
            return kids[0]
        return CDisMax(kids, q.tie_breaker)
    if isinstance(q, DisMaxQuery):
        kids = [
            compile_query(sub, doc_freqs, total_docs, field_avgdl, scorer)
            for sub in q.children
        ]
        if any(isinstance(k, CAll) for k in kids):
            raise ValueError("AllQuery inside a DisMaxQuery is not supported")
        kids = [k for k in kids if not isinstance(k, CEmpty)]
        if not kids:
            return CEmpty()
        if len(kids) == 1:
            # max of one child == the child; tie contributes nothing
            return kids[0]
        return CDisMax(kids, q.tie_breaker)
    if isinstance(q, BoostingQuery):
        # AllQuery is rejected on both sides for the same pruned-postings
        # reason as nested booleans; a constant demotion of everything is
        # meaningless anyway (fold it into the score instead).
        if isinstance(q.positive, AllQuery) or isinstance(q.negative, AllQuery):
            raise ValueError("AllQuery inside a BoostingQuery is not supported")
        base = compile_query(q.positive, doc_freqs, total_docs, field_avgdl, scorer)
        if isinstance(base, CEmpty):
            return CEmpty()
        neg = compile_query(q.negative, doc_freqs, total_docs, field_avgdl, scorer)
        if isinstance(neg, CEmpty):
            # nothing to demote: the node is exactly its positive side
            return base
        return CBoosting(base, neg, q.negative_boost)
    if isinstance(q, BooleanQuery):
        # Nested AllQuery is rejected, not silently mis-evaluated: the
        # segment scorer only sees PRUNED posting rows for the query's
        # terms, so a nested 'all' node there cannot know the segment's
        # doc count (and a bare all-OR-term would need segments with no
        # matching term rows at all). Top-level AllQuery takes the docmap
        # scan path in exec.search. The reference's NQL cannot express a
        # nested AllQuery either — it is programmatic-only there.
        if any(isinstance(sub, AllQuery) for _, sub in q.subqueries):
            raise ValueError(
                "AllQuery inside a BooleanQuery is not supported; "
                "use AllQuery alone (docmap scan path)"
            )
        musts = [
            compile_query(sub, doc_freqs, total_docs, field_avgdl, scorer)
            for occ, sub in q.subqueries
            if occ == MUST
        ]
        shoulds = [
            compile_query(sub, doc_freqs, total_docs, field_avgdl, scorer)
            for occ, sub in q.subqueries
            if occ == SHOULD
        ]
        nots = [
            compile_query(sub, doc_freqs, total_docs, field_avgdl, scorer)
            for occ, sub in q.subqueries
            if occ == MUST_NOT
        ]
        filters = [
            compile_query(sub, doc_freqs, total_docs, field_avgdl, scorer)
            for occ, sub in q.subqueries
            if occ == FILTER
        ]
        # drop empties: an empty must kills the intersection; an empty
        # should is just elided from the union (union_scorer.go:15-23);
        # an empty must_not excludes nothing; an empty FILTER kills the
        # conjunction (it constrains like a must).
        if any(isinstance(m, CEmpty) for m in musts):
            return CEmpty()
        if any(isinstance(f, CEmpty) for f in filters):
            return CEmpty()
        shoulds = [s for s in shoulds if not isinstance(s, CEmpty)]
        nots = [n for n in nots if not isinstance(n, CEmpty)]

        min_should = getattr(q, "min_should", 1)
        if min_should > 1:
            # the SHOULD group is REQUIRED (>= m of it must match);
            # empties were dropped above, so an unsatisfiable m kills the
            # query — Lucene's behavior when minimumShouldMatch exceeds
            # the optional clause count
            if len(shoulds) < min_should:
                return CEmpty()

        n_pos = sum(1 for occ, _ in q.subqueries if occ in (MUST, SHOULD))
        if n_pos == 1 and not nots and not filters:
            # single-subquery unwrap (boolean_query.go:100-107)
            return (musts + shoulds)[0] if (musts + shoulds) else CEmpty()

        must_node = None
        if musts:
            must_node = musts[0] if len(musts) == 1 else CIntersection(musts)
        should_node = None
        if shoulds:
            if min_should > 1:
                should_node = CMinShould(shoulds, min_should)
            else:
                should_node = shoulds[0] if len(shoulds) == 1 else CUnion(shoulds)

        if must_node is not None and should_node is not None and min_should > 1:
            # required should-group: docs must satisfy the musts AND
            # >= m shoulds; score = must + matched shoulds (both legs
            # of the intersection sum)
            base = CIntersection([must_node, should_node])
        elif must_node is not None and should_node is not None:
            base = CMustShould(must_node, should_node)
        elif must_node is not None:
            base = must_node
        elif should_node is not None:
            base = should_node
        elif filters:
            # pure-filter query: match set from filters, score 0.0
            base = None
        else:
            # pure-negative query: no positive clause to score/drive the
            # match set (Lucene rejects this shape too)
            return CEmpty()
        if filters:
            filt_node = filters[0] if len(filters) == 1 else CIntersection(filters)
            base = CFilter(base, filt_node)
        if nots:
            return CNot(base, nots[0] if len(nots) == 1 else CUnion(nots))
        return base
    raise TypeError(q)


def node_terms(node) -> list[CTerm]:
    if isinstance(node, CTerm):
        return [node]
    if isinstance(node, (CIntersection, CUnion, CMinShould, CDisMax)):
        out = []
        for c in node.children:
            out.extend(node_terms(c))
        return out
    if isinstance(node, CMustShould):
        return node_terms(node.must) + node_terms(node.should)
    if isinstance(node, CNot):
        return node_terms(node.base) + node_terms(node.exclude)
    if isinstance(node, CBoosting):
        return node_terms(node.base) + node_terms(node.demote)
    if isinstance(node, CFilter):
        return ([] if node.base is None else node_terms(node.base)) + node_terms(
            node.filt
        )
    return []


def is_pure_term_union(node) -> bool:
    """The WAND-eligible shape: a single term or a flat union of terms —
    the reference marks the same shape for its future WAND specialization
    (/root/reference/query/boolean_query.go:159-174)."""
    if isinstance(node, CTerm):
        return True
    return isinstance(node, CUnion) and all(isinstance(c, CTerm) for c in node.children)


def to_wire(node) -> dict:
    """Serialize a compiled node tree for broadcast into the scoring UDF."""
    if isinstance(node, CTerm):
        return {
            "kind": "term",
            "field": node.field_id,
            "term": node.term,
            "doc_freq": node.doc_freq,
            "idf": node.idf,
            "avgdl": node.avgdl,
        }
    if isinstance(node, CPhrase):
        return {
            "kind": "phrase",
            "field": node.field_id,
            "terms": list(node.terms),
            "idf": node.idf,
            "avgdl": node.avgdl,
            "slop": node.slop,
        }
    if isinstance(node, CNear):
        return {
            "kind": "near",
            "field": node.field_id,
            "terms": list(node.terms),
            "idf": node.idf,
            "avgdl": node.avgdl,
            "slop": node.slop,
        }
    if isinstance(node, CMultiPhrase):
        return {
            "kind": "multi_phrase",
            "field": node.field_id,
            "slots": [list(slot) for slot in node.slots],
            "idf": node.idf,
            "avgdl": node.avgdl,
            "slop": node.slop,
        }
    if isinstance(node, CSpanFirst):
        return {
            "kind": "span_first",
            "field": node.field_id,
            "terms": list(node.terms),
            "doc_freq": node.doc_freq,
            "idf": node.idf,
            "avgdl": node.avgdl,
            "end": node.end,
        }
    if isinstance(node, CSpanNot):
        return {
            "kind": "span_not",
            "field": node.field_id,
            "terms": list(node.terms),
            # NOT named "exclude": tree walkers (assign_range_ids,
            # explain) recurse into an "exclude" key as a subtree wire
            "excl_terms": list(node.exclude),
            "doc_freq": node.doc_freq,
            "idf": node.idf,
            "avgdl": node.avgdl,
            "pre": node.pre,
            "post": node.post,
        }
    if isinstance(node, CCombinedTerm):
        return {
            "kind": "combined_term",
            "term": node.term,
            "doc_freq": node.doc_freq,
            "idf": node.idf,
            "avgdl": node.avgdl,
            # one pseudo range-wire per field: op "norms" ships every
            # doc's (doc, field_length) down the aux cogroup — exec
            # assigns each a rid like any range node
            "norm_fields": [
                {"kind": "range", "op": "norms", "field": fid, "weight": w}
                for fid, w in node.fields
            ],
        }
    if isinstance(node, CSpanOr):
        return {
            "kind": "span_or",
            "field": node.field_id,
            "terms": list(node.terms),
            "idf": node.idf,
            "avgdl": node.avgdl,
        }
    if isinstance(node, CSpanContain):
        return {
            "kind": "span_contain",
            "field": node.field_id,
            "big": list(node.big),
            "little": list(node.little),
            "emit": node.emit,
            "idf": node.idf,
            "avgdl": node.avgdl,
        }
    if isinstance(node, CIntersection):
        return {"kind": "and", "children": [to_wire(c) for c in node.children]}
    if isinstance(node, CUnion):
        return {"kind": "or", "children": [to_wire(c) for c in node.children]}
    if isinstance(node, CMinShould):
        return {
            "kind": "min_should",
            "m": node.m,
            "children": [to_wire(c) for c in node.children],
        }
    if isinstance(node, CTermsSet):
        return {
            "kind": "terms_set",
            "children": [to_wire(c) for c in node.children],
            # the per-doc m values ride the aux cogroup as a docmap scan
            # with a val column; rid assigned by exec like any range node
            "mfield": {"kind": "range", "op": "dv", "field": node.m_field_id},
        }
    if isinstance(node, CDisMax):
        return {
            "kind": "dismax",
            "tie": node.tie,
            "children": [to_wire(c) for c in node.children],
        }
    if isinstance(node, CMustShould):
        return {"kind": "must_should", "must": to_wire(node.must), "should": to_wire(node.should)}
    if isinstance(node, CNot):
        return {"kind": "not", "base": to_wire(node.base), "exclude": to_wire(node.exclude)}
    if isinstance(node, CConstScore):
        return {
            "kind": "const_score",
            "base": to_wire(node.base),
            "score": node.score,
        }
    if isinstance(node, CBoosting):
        return {
            "kind": "boosting",
            "base": to_wire(node.base),
            "demote": to_wire(node.demote),
            "nb": node.nb,
        }
    if isinstance(node, CFilter):
        return {
            "kind": "filter",
            "base": None if node.base is None else to_wire(node.base),
            "filt": to_wire(node.filt),
        }
    if isinstance(node, CRange):
        # rid is assigned by exec over the finished wire tree (pre-order)
        return {
            "kind": "range",
            "field": node.field_id,
            "lo": node.lo,
            "hi": node.hi,
            "incl_lo": node.include_lo,
            "incl_hi": node.include_hi,
            "score": node.const_score,
        }
    if isinstance(node, CKeyword):
        # same wire kind as numeric ranges: identical aux-set delivery
        # (rid assignment, cogroup side, eval); `op` selects the docmap
        # predicate
        return {
            "kind": "range",
            "op": "eq",
            "field": node.field_id,
            "value": node.value,
            "score": node.const_score,
        }
    if isinstance(node, CTerms):
        return {
            "kind": "range",
            "op": "in",
            "field": node.field_id,
            "values": list(node.values),
            "score": node.const_score,
        }
    if isinstance(node, CIds):
        return {
            "kind": "range",
            "op": "ids",
            "field": -1,  # no schema field: the column IS the address
            "column": node.column,
            "values": list(node.values),
            "score": node.const_score,
        }
    if isinstance(node, CExists):
        return {
            "kind": "range",
            "op": "exists",
            "field": node.field_id,
            "score": node.const_score,
        }
    if isinstance(node, CGeoDistance):
        # same wire kind as ranges: identical aux-set delivery (rid
        # assignment, cogroup side, eval); op selects the docmap predicate
        return {
            "kind": "range",
            "op": "geo_distance",
            "field": node.field_id,
            "lat": node.lat,
            "lon": node.lon,
            "radius_m": node.radius_m,
            "score": node.const_score,
        }
    if isinstance(node, CGeoBBox):
        return {
            "kind": "range",
            "op": "geo_bbox",
            "field": node.field_id,
            "top": node.top,
            "left": node.left,
            "bottom": node.bottom,
            "right": node.right,
            "score": node.const_score,
        }
    if isinstance(node, CGeoPolygon):
        return {
            "kind": "range",
            "op": "geo_polygon",
            "field": node.field_id,
            "points": [list(p) for p in node.points],
            "score": node.const_score,
        }
    if isinstance(node, CGeoShape):
        return {
            "kind": "range",
            "op": "geo_shape",
            "field": node.field_id,
            "relation": node.relation,
            "geometry": list(node.geometry),
            "score": node.const_score,
        }
    if isinstance(node, CRangeField):
        return {
            "kind": "range",
            "op": "range_field",
            "field": node.field_id,
            "relation": node.relation,
            "lo": node.lo,
            "hi": node.hi,
            "score": node.const_score,
        }
    if isinstance(node, CAll):
        return {"kind": "all"}
    if isinstance(node, CEmpty):
        return {"kind": "empty"}
    raise TypeError(node)
