"""Natural query language parser — grammar-identical to ostrich's.

Mirrors /root/reference/query/parser.go:31-165 exactly:

- tokens: whitespace-split; ``(`` and ``)`` are standalone tokens.
- grammar:  expr = primary (primary | AND primary | OR primary)*
            primary = value | "(" expr ")"
  AND/OR are case-insensitive (parser.go:59); ADJACENT primaries are an
  implicit OR (parser.go:76-83); operators left-associate.
- values: ``field:term`` runs through the FIELD'S analyzer and may yield
  several terms -> OR of term queries (parser.go:100-113); BARE terms are
  NOT analyzed and expand over the default fields (parser.go:114-117) —
  this asymmetry is load-bearing for rank-identity.
- empty query -> AllQuery (parser.go:33-35).
- lowering (parser.go:148-165): And -> intersection of 2, Or -> union of
  2, leaf -> TermQuery or MultiTermsQuery (OR of terms).

No MustNot exists in the reference (boolean_query.go:10-58).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis import get_analyzer
from ..schema import Schema

MUST = "must"
SHOULD = "should"
# EXTENSION: the reference has no MustNot (boolean_query.go:10-58 defines
# only MUST/SHOULD); exposed programmatically only — the NQL grammar stays
# reference-identical (adding a '-'/'NOT' token would change how queries
# containing those literal words parse).
MUST_NOT = "must_not"
# EXTENSION (Lucene Occur.FILTER analog): the clause CONSTRAINS the match
# set like MUST but contributes NOTHING to the score — the standard shape
# for structured predicates (ranges, flags) alongside relevance clauses.
# Programmatic-only, like MUST_NOT: the NQL grammar stays
# reference-identical.
FILTER = "filter"


class QueryParseError(ValueError):
    """Malformed query string (dangling operator, unclosed paren)."""


@dataclass(frozen=True)
class TermQuery:
    field_id: int
    term: str
    # EXTENSION (Lucene boost analog): multiplies the clause's score.
    # Folded into idf at compile time, so scorers / WAND bounds / the
    # wire format are untouched (both TF-IDF and BM25 are linear in idf).
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery:
    """Consecutive-term phrase within one field — an EXTENSION beyond the
    reference grammar (its tokens carry no positions,
    /root/reference/analyzer/analyzer.go:44-46). Requires the field to be
    indexed with positions=True. Scoring follows the Lucene convention:
    idf(phrase) = sum of constituent idfs, tf = phrase occurrence count.

    Multi-valued fields: token streams of the values are concatenated
    with contiguous positions (build concatenation semantics), so a
    phrase CAN match across a value boundary — there is no Lucene-style
    position_increment_gap. Index multi-valued fields whose values must
    not cross-match as separate fields.

    ``slop`` (NQL ``field:"a b"~2``, Lucene proximity syntax) relaxes
    adjacency to an IN-ORDER window: the doc matches where positions
    p1 < p2 < ... < pk of the constituent terms exist with span
    pk − p1 <= (k−1) + slop; tf = number of distinct positions of the
    LAST term at which such a window ends. slop=0 is exactly the
    consecutive phrase (the span bound forces step 1). This is the
    ordered subset of Lucene's sloppy matching — Lucene also counts
    out-of-order matches by edit-distance and weights tf by
    1/(distance+1); we pin the simpler deterministic contract."""

    field_id: int
    terms: tuple[str, ...]
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class NearQuery:
    """UNORDERED proximity — Lucene SpanNearQuery(inOrder=false) analog.
    NQL: ``field:"a b"~2u`` (the ``u`` suffix relaxes the sloppy phrase's
    in-order requirement). A doc matches at end position q (an occurrence
    of ANY constituent) iff EVERY constituent occurs somewhere in
    ``[q - (k-1+slop), q]`` of the same doc; tf = number of such distinct
    end positions, idf = sum of constituent idfs (phrase convention).
    Duplicate terms collapse (set semantics: a term's own occurrence at q
    satisfies its containment) — use the ordered sloppy phrase when
    repetition must be positional."""

    field_id: int
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNearQuery:
    """ORDERED proximity — Lucene SpanNearQuery(inOrder=true) / ES
    ``span_near`` with ``in_order: true``. NQL: ``field:"a b"~2o`` (the
    ``o`` suffix). A doc matches at end position q (an occurrence of the
    LAST clause) iff the clauses occur at strictly increasing positions
    p1 < p2 < ... < pk = q with total gap ``q - p1 - (k-1) <= slop``;
    tf = number of such distinct end positions, idf = sum of constituent
    idfs; duplicate terms need distinct occurrences (strict ordering).

    This engine's sloppy :class:`PhraseQuery` already implements EXACTLY
    this in-order window contract (a documented difference from Lucene's
    PhraseQuery, whose slop is an edit distance that lets adjacent
    constituents transpose at slop >= 2 — ours never reorders), so
    SpanNearQuery lowers to the same compiled phrase node: one kernel,
    provably one semantics, and ``field:"a b"~2o`` is score-identical to
    ``field:"a b"~2``. The alias exists so the ES span API maps cleanly:
    span_near(in_order=true) -> this; in_order=false ->
    :class:`NearQuery` (``~Nu``), which DOES accept reordering. Needs
    positions=True, like phrases; not WAND-eligible (no term union)."""

    field_id: int
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0


def _span_union_operand(what: str, value):
    """Validate a span_first/span_not term operand: a single term, a
    tuple of alternative terms (the ``spanFirst(spanOr(...))`` union
    shape — any alternative's occurrence is an occurrence of the span),
    or a :class:`SpanMultiQuery` (resolved against the index dictionary
    at rewrite time into exactly that tuple form)."""
    if isinstance(value, SpanMultiQuery):
        return value
    if isinstance(value, str):
        if not value:
            raise QueryParseError(f"empty term in {what} query")
        return value
    try:
        terms = tuple(value)
    except TypeError:
        raise QueryParseError(
            f"{what} term must be a term, a tuple of alternative terms, "
            f"or a span_multi query, got {value!r}"
        )
    if not terms or any(not isinstance(t, str) or not t for t in terms):
        raise QueryParseError(
            f"{what} term alternatives need non-empty strings, got {value!r}"
        )
    return tuple(dict.fromkeys(terms))  # dedupe, keep order (Lucene rewrite)


@dataclass(frozen=True)
class SpanFirstQuery:
    """Match docs where ``term`` occurs within the FIRST ``end`` token
    positions of the field — the Lucene SpanFirstQuery analog (ES
    ``span_first``; EXTENSION, programmatic-only like MUST_NOT). The
    classic use: "the word appears in the opening sentence/title region"
    of a single-field document. tf = the number of occurrences with
    position < ``end`` (Lucene's sloppy-freq-of-matching-spans), scored
    like a term (idf of the term itself); occurrences past ``end``
    contribute nothing. ``term`` may also be a tuple of alternative
    terms or a :class:`SpanMultiQuery` — the Lucene
    ``spanFirst(spanOr(...))`` / ``spanFirst(spanMulti(...))`` shapes:
    any alternative's occurrence counts, idf = sum of the present
    alternatives' idfs (SpanOr combined statistics). Needs
    positions=True, like phrases. Not WAND-eligible (membership depends
    on positions, which the term upper bound cannot see)."""

    field_id: int
    term: object  # str | tuple[str, ...] | SpanMultiQuery
    end: int
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(
            self, "term", _span_union_operand("span_first", self.term)
        )
        if (
            isinstance(self.term, SpanMultiQuery)
            and self.term.field_id != self.field_id
        ):
            raise QueryParseError(
                "span_first and its span_multi term must target the same "
                f"field ({self.field_id} vs {self.term.field_id})"
            )
        if not isinstance(self.end, int) or self.end < 1:
            raise QueryParseError(
                f"span_first end must be an int >= 1 (positions 0..end-1 "
                f"match), got {self.end!r}"
            )


@dataclass(frozen=True)
class SpanNotQuery:
    """Match occurrences of ``term`` NOT within ``pre`` tokens after /
    ``post`` tokens before any occurrence of an ``exclude`` term — the
    Lucene SpanNotQuery analog over term spans (ES ``span_not``;
    EXTENSION, programmatic-only like span_first). Multiple exclude
    terms behave as Lucene's ``spanNot(include, spanOr(excludes))`` —
    the idiomatic exclusion shape ("bank" not near "river" or "creek").
    An include occurrence at position p is rejected iff some exclude
    occurrence q satisfies p - pre <= q <= p + post (pre=post=0 =
    same-position overlap only). tf = surviving occurrences (Lucene's
    sloppy freq of matching spans); idf stays the include TERM's own
    full-df idf (SpanWeight builds term statistics, only membership
    narrows) — so an exclude term absent from the corpus leaves scores
    bit-identical to the plain term query. The include ``term`` may
    also be a tuple of alternative terms or a :class:`SpanMultiQuery`
    (``spanNot(spanOr(...), ...)`` — idf = sum of present alternatives'
    idfs), and exclude entries may be SpanMultiQuery (membership-only:
    expansions just extend the exclude union, stats never change).
    Needs positions=True; not WAND-eligible (membership depends on
    positions, invisible to the term upper bound)."""

    field_id: int
    term: object  # str | tuple[str, ...] | SpanMultiQuery
    exclude: tuple  # elements: str | SpanMultiQuery
    pre: int = 0
    post: int = 0
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(
            self, "term", _span_union_operand("span_not", self.term)
        )
        if (
            isinstance(self.term, SpanMultiQuery)
            and self.term.field_id != self.field_id
        ):
            raise QueryParseError(
                "span_not and its span_multi term must target the same "
                f"field ({self.field_id} vs {self.term.field_id})"
            )
        object.__setattr__(self, "exclude", tuple(self.exclude))
        if not self.exclude:
            raise QueryParseError(
                "span_not needs at least one non-empty exclude term"
            )
        for e in self.exclude:
            if isinstance(e, SpanMultiQuery):
                if e.field_id != self.field_id:
                    raise QueryParseError(
                        "span_not and its span_multi exclude must target "
                        f"the same field ({self.field_id} vs {e.field_id})"
                    )
            elif not isinstance(e, str) or not e:
                raise QueryParseError(
                    "span_not needs at least one non-empty exclude term"
                )
        for name, v in (("pre", self.pre), ("post", self.post)):
            if not isinstance(v, int) or v < 0:
                raise QueryParseError(
                    f"span_not {name} must be an int >= 0, got {v!r}"
                )


def _span_operand(name: str, value) -> tuple:
    """Validate a span_containing/span_within operand: a term or an
    EXACT phrase (tuple of adjacent terms). Fixed extents are what make
    the containment test precise — a sloppy operand's span width is not
    determined by its match end, so it is rejected here rather than
    approximated silently."""
    if isinstance(value, SpanMultiQuery):
        raise QueryParseError(
            f"span {name} operand must be an exact term or adjacent "
            "phrase — span_multi is not supported in "
            "span_containing/span_within (use it in span_first/span_not "
            "or standalone)"
        )
    terms = (value,) if isinstance(value, str) else tuple(value)
    if not terms or any(not isinstance(t, str) or not t for t in terms):
        raise QueryParseError(
            f"span {name} operand needs a non-empty term or tuple of "
            f"terms (an exact adjacent phrase), got {value!r}"
        )
    return terms


@dataclass(frozen=True)
class SpanContainingQuery:
    """Spans of ``big`` that contain a ``little`` span — the Lucene
    SpanContainingQuery analog (ES ``span_containing``; EXTENSION,
    programmatic-only like the other span queries). Operands are each a
    term or an EXACT adjacent phrase (tuple of terms), so every span has
    a fixed width and containment is an exact window test: a big span
    [s, s+kb-1] matches iff some little span starts in [s, s+kb-kl]
    (same doc). tf = the number of such big spans (Lucene emits each
    containing big span once, however many littles it holds); idf = the
    sum of ALL constituent terms' idfs — big AND little — the Lucene
    SpanContainingWeight convention (getTermStates merges both sides).
    Needs positions=True; not WAND-eligible."""

    field_id: int
    big: tuple[str, ...]
    little: tuple[str, ...]
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "big", _span_operand("big", self.big))
        object.__setattr__(self, "little", _span_operand("little", self.little))


@dataclass(frozen=True)
class SpanWithinQuery:
    """Spans of ``little`` that lie within a ``big`` span — the Lucene
    SpanWithinQuery analog (ES ``span_within``): the mirror of
    span_containing, emitting the LITTLE side. A little span [s, s+kl-1]
    matches iff some big span starts in [s-(kb-kl), s] (same doc).
    tf = the number of such little spans; idf = the sum of all
    constituent terms' idfs (both sides), like span_containing.
    Needs positions=True; not WAND-eligible."""

    field_id: int
    big: tuple[str, ...]
    little: tuple[str, ...]
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "big", _span_operand("big", self.big))
        object.__setattr__(self, "little", _span_operand("little", self.little))


@dataclass(frozen=True)
class PhrasePrefixQuery:
    """Phrase whose LAST slot is a prefix — EXTENSION (Lucene
    MatchPhrasePrefixQuery / Elasticsearch ``match_phrase_prefix``
    analog; the autocomplete query shape). NQL: ``field:"spark str*"``,
    optionally with slop ``field:"spark str*"~2``.

    The fixed words are analyzed with the field's analyzer (so they stem
    like any phrase constituent); the prefix is *normalized* (lowercased)
    but never analyzed — the PrefixQuery rule — and expands against the
    term dictionary at search time (doc_freq DESC, term ASC, capped).
    The resolved form is MultiPhraseQuery."""

    field_id: int
    terms: tuple[str, ...]  # fixed slots (analyzed); may be empty
    prefix: str
    max_expansions: int | None = None  # None -> expand.DEFAULT_PREFIX_EXPANSIONS
    boost: float = 1.0
    slop: int = 0

    def __post_init__(self):
        if not self.prefix:
            raise QueryParseError("empty prefix in phrase-prefix query")


@dataclass(frozen=True)
class MultiPhraseQuery:
    """Phrase where EVERY slot accepts a set of alternative terms —
    the full Lucene MultiPhraseQuery analog (query-time synonym phrases,
    and the resolved form of PhrasePrefixQuery). Matching: an in-order
    window (PhraseQuery contract) where slot i is satisfied by any of
    slots[i]; tf = number of DISTINCT end positions. idf = sum over the
    alternatives of EVERY slot (Lucene binds stats for all terms), so
    the score is deterministic in the slot sets. A slot whose every
    alternative is absent from the index matches nothing.
    Programmatic-only beyond the phrase-prefix NQL (Lucene has no query
    syntax for it either)."""

    field_id: int
    slots: tuple[tuple[str, ...], ...]
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class PrefixQuery:
    """All terms of a field starting with ``prefix`` — EXTENSION beyond
    the reference grammar (Lucene PrefixQuery analog). NQL: ``field:spar*``
    (also bare ``spar*`` over the default fields). The value is
    *normalized* (lowercased, matching LowerCaseCharFilter) but NOT
    tokenized/stemmed — standard Lucene multi-term semantics, so a prefix
    containing token-separator characters matches nothing. Expanded at
    search time against the (field, term)-sorted dictionary into a union
    of TermQuery (MultiTermsQuery scoring; WAND-eligible); expansion is
    capped deterministically (doc_freq DESC, term ASC)."""

    field_id: int
    prefix: str
    max_expansions: int | None = None  # None -> expand.DEFAULT_PREFIX_EXPANSIONS
    boost: float = 1.0  # propagated to every expanded term

    def __post_init__(self):
        if not self.prefix:
            raise QueryParseError("empty prefix in prefix query")


@dataclass(frozen=True)
class FuzzyQuery:
    """All terms of a field within ``max_dist`` Levenshtein edits of
    ``term`` — EXTENSION (Lucene FuzzyQuery analog). NQL: ``field:spark~1``
    (distances 1 or 2; bare form allowed). Same normalization rule as
    PrefixQuery. ``prefix_length`` (default 1) requires candidates to
    share the leading characters, which turns dictionary expansion into a
    range-pruned bucket read instead of a full scan — the
    Elasticsearch-recommended posture for fuzzy at scale."""

    field_id: int
    term: str
    max_dist: int = 1
    prefix_length: int = 1
    max_expansions: int | None = None  # None -> expand.DEFAULT_FUZZY_EXPANSIONS
    boost: float = 1.0  # propagated to every expanded term
    # True counts an adjacent swap as ONE edit (Damerau — Lucene's
    # default); False keeps plain Levenshtein (JVM/DuckDB builtin
    # parity). Programmatic-only like prefix_length — NQL has no syntax
    # for it (neither does Lucene's).
    transpositions: bool = False

    def __post_init__(self):
        # ES fuzziness: AUTO (NQL ``field:term~auto``) — resolved here
        # so every downstream consumer sees a concrete distance
        if isinstance(self.max_dist, str):
            if self.max_dist.lower() != "auto":
                raise QueryParseError(
                    f"max_dist must be 0, 1, 2 or 'auto', got {self.max_dist!r}"
                )
            object.__setattr__(self, "max_dist", auto_fuzziness(self.term))
        if self.max_dist not in (0, 1, 2):
            raise QueryParseError(
                f"max_dist must be 0, 1, 2 or 'auto', got {self.max_dist!r}"
            )


@dataclass(frozen=True)
class WildcardQuery:
    """All terms of a field matching a glob pattern (``*`` = any run,
    ``?`` = exactly one char) — EXTENSION (Lucene WildcardQuery analog).
    NQL: ``field:te*m`` / ``field:t?rm`` (bare forms expand over the
    default fields). Same normalization rule as PrefixQuery (lowercased,
    never analyzed — no indexed term contains ``*``/``?``, every
    tokenizer treats them as separators). Expansion prunes the sorted
    dictionary to the pattern's literal-prefix bucket when one exists;
    a leading wildcard falls back to one small distributed filter job
    over the dictionary (never a driver-side full scan). Scoring =
    MultiTermsQuery union, capped like PrefixQuery."""

    field_id: int
    pattern: str
    max_expansions: int | None = None  # None -> expand.DEFAULT_PREFIX_EXPANSIONS
    boost: float = 1.0

    def __post_init__(self):
        if not self.pattern.replace("*", "").replace("?", ""):
            raise QueryParseError(
                "wildcard pattern needs at least one literal character "
                "(use AllQuery / an empty query to match everything)"
            )


@dataclass(frozen=True)
class RegexpQuery:
    """All terms of a field fully matching a regular expression —
    EXTENSION (Lucene RegexpQuery analog, including its whole-term
    anchoring). NQL: ``field:/pat/`` (Lucene slash syntax; bare ``/pat/``
    expands over the default fields). The pattern is matched against
    normalized index terms (lowercase) and is NOT lowercased itself.
    Keep to the common regex core (literals, classes, ``.*+?|()``) —
    the driver-side filter uses Python ``re``, the leading-wildcard
    distributed fallback uses JVM regex, and the test oracle uses RE2;
    the gated queries pin patterns valid in all three."""

    field_id: int
    pattern: str
    max_expansions: int | None = None  # None -> expand.DEFAULT_PREFIX_EXPANSIONS
    boost: float = 1.0

    def __post_init__(self):
        if not self.pattern:
            raise QueryParseError("empty regexp query")
        try:
            re.compile(self.pattern)
        except re.error as e:
            raise QueryParseError(f"bad regexp {self.pattern!r}: {e}")


@dataclass(frozen=True)
class SpanMultiQuery:
    """Span wrapper around a multi-term query — the Lucene
    SpanMultiTermQueryWrapper / ES ``span_multi`` analog (EXTENSION,
    programmatic-only like the rest of the span family). Wraps a
    :class:`PrefixQuery`, :class:`FuzzyQuery`, :class:`WildcardQuery`
    or :class:`RegexpQuery` so its dictionary expansion can be used
    where a span term is expected:

    - standalone: rewrites to :class:`SpanOrQuery` over the expanded
      terms (Lucene's SpanOrTermsRewrite) — tf = total occurrences of
      any expansion, idf = sum of the present expansions' idfs;
    - as the ``term`` of :class:`SpanFirstQuery` / include of
      :class:`SpanNotQuery`: the expansion becomes the span's term
      alternatives (``spanFirst(spanOr(...))`` etc.);
    - as a :class:`SpanNotQuery` exclude entry: the expansion extends
      the exclude union (membership-only — exclude carries no stats).

    Expansion happens against the index dictionary at search time
    (``expand.rewrite_multiterm``), capped deterministically by the
    inner query's ``max_expansions`` contract (doc_freq DESC, term ASC
    — same caps and defaults as the bare multi-term queries). An inner
    query matching nothing lowers the wrapping span to EmptyQuery.
    span_containing/span_within operands stay exact (fixed widths make
    containment precise); percolation rejects span queries loudly."""

    inner: object  # PrefixQuery | FuzzyQuery | WildcardQuery | RegexpQuery
    boost: float = 1.0

    def __post_init__(self):
        if not isinstance(
            self.inner, (PrefixQuery, FuzzyQuery, WildcardQuery, RegexpQuery)
        ):
            raise QueryParseError(
                "span_multi wraps a prefix/fuzzy/wildcard/regexp query, "
                f"got {type(self.inner).__name__}"
            )

    @property
    def field_id(self) -> int:
        return self.inner.field_id


@dataclass(frozen=True)
class RangeQuery:
    """Range over a doc-value field — EXTENSION (Lucene
    Points/NumericRangeQuery and TermRangeQuery analogs; the reference
    has only text fields). NQL: ``field:[10 TO 20]`` (inclusive),
    ``field:{10 TO 20}`` (exclusive), ``*`` for an open bound; mixed
    brackets allowed. Numeric fields take numeric bounds; keyword fields
    take STRING bounds compared lexicographically (binary collation —
    the Lucene/ES keyword-range semantics), e.g. ``lang:[de TO fr]``.
    Matches score a constant ``boost`` (Lucene ConstantScore
    semantics) — use a FILTER clause for the usual non-scoring
    predicate shape."""

    field_id: int
    lo: float | int | str | None = None  # None = open bound
    hi: float | int | str | None = None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0

    def __post_init__(self):
        if self.lo is None and self.hi is None:
            raise QueryParseError("range query needs at least one bound")
        kinds = {isinstance(b, str) for b in (self.lo, self.hi) if b is not None}
        if len(kinds) > 1:
            raise QueryParseError(
                "range query bounds must be both numeric or both strings"
            )


@dataclass(frozen=True)
class ConstantScoreQuery:
    """Wrap ANY scoring query so every match scores exactly ``boost`` —
    the ES ``constant_score`` / Lucene ConstantScoreQuery analog
    (EXTENSION, programmatic). Distinct from the FILTER occur (which
    contributes 0.0): constant_score keeps the match set AND stamps a
    chosen constant, the "category boost" shape (e.g. SHOULD-compose a
    constant 2.0 for docs matching a curated query beside organic
    relevance). The inner query's scores are computed then discarded —
    membership only. AllQuery is rejected (it already scores a constant
    1.0 everywhere; wrapping it would only rescale a rank-free list).
    Not WAND-eligible (the wire is not a pure term union)."""

    query: object
    boost: float = 1.0

    def __post_init__(self):
        if isinstance(self.query, AllQuery):
            raise QueryParseError(
                "constant_score over AllQuery is redundant — every doc "
                "already scores the same constant; scale offline instead"
            )
        if isinstance(self.query, ConstantScoreQuery):
            # collapse nested wrappers: the outer constant wins
            object.__setattr__(self, "query", self.query.query)


@dataclass(frozen=True)
class KeywordQuery:
    """Exact match on a keyword doc-value field — EXTENSION (the ES
    ``term`` query on a ``keyword`` field / Lucene TermQuery over a
    StringField). NQL: ``lang:fr`` or ``lang:"machine learning"`` where
    ``lang`` is ``Schema.add_keyword_field``. Never analyzed; NULL never
    matches. Matches score a constant ``boost`` (ConstantScore
    semantics) — use a FILTER clause for the usual non-scoring shape."""

    field_id: int
    value: str
    boost: float = 1.0


@dataclass(frozen=True)
class TermsQuery:
    """Match any of a SET of exact values on a keyword doc-value field —
    EXTENSION (the ES ``terms`` query / Lucene TermInSetQuery). No NQL
    form (like ES, where ``terms`` is DSL-only): construct
    programmatically or via CLI ``search --terms field=v1,v2``. One
    docmap scan with an IN predicate pushed to parquet regardless of the
    set size — the reason this exists instead of OR-ing N KeywordQuery
    clauses (N scans). A document stores at most one value per field, so
    the constant ``boost`` is scored at most once (identical to the OR
    form's sum). NULL never matches."""

    field_id: int
    values: tuple[str, ...]
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "values", tuple(self.values))
        if not self.values:
            raise QueryParseError("terms query needs at least one value")
        if any(not isinstance(v, str) for v in self.values):
            raise QueryParseError("terms query values must be strings")


@dataclass(frozen=True)
class IdsQuery:
    """Match docs whose IDENTITY column equals one of the given values —
    the Elasticsearch ``ids`` query analog (EXTENSION). ES addresses the
    implicit ``_id``; this engine's identity lives in the caller-chosen
    ``id_cols``, so the column is named explicitly (the get_docs /
    delete_docs convention). DSL-only, like ES. Values cast to the
    column's ACTUAL dtype at execution time — '07' stays distinct from
    '7' on a string id column (the cli-delete contract); a value that
    cannot cast to a numeric column raises loudly. Matches score the
    constant ``boost`` (use a FILTER clause for the usual non-scoring
    shape); NULL ids never match. Delivery: ONE docmap scan with the IN
    predicate pushed to parquet, riding the aux cogroup like every
    docmap-predicate query."""

    column: str
    values: tuple = ()
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "values", tuple(self.values))
        if not self.values:
            raise QueryParseError("ids query needs at least one value")


@dataclass(frozen=True)
class TermsSetQuery:
    """Match docs containing at least m of a TERM SET, where m is read
    PER DOCUMENT from a numeric doc-value field — EXTENSION (the ES
    ``terms_set`` query with ``minimum_should_match_field`` / Lucene
    CoveringQuery). The canonical use: a doc stores how many of its own
    tags must match for it to qualify. Score = sum of the matching
    terms' scores (bool-SHOULD semantics, like ES). ``terms`` are
    dictionary terms (analyzed form) on a text field. A doc with a NULL
    / missing m value requires only 1 match (Lucene CoveringQuery
    treats missing as <=1 — a disjunction). m greater than the number
    of matchable terms can never match. DSL-only, like ES."""

    field_id: int
    terms: tuple[str, ...]
    m_field_id: int
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "terms", tuple(self.terms))
        if not self.terms:
            raise QueryParseError("terms_set needs at least one term")


@dataclass(frozen=True)
class ExistsQuery:
    """Field-has-a-value — EXTENSION (the ES ``exists`` query). NQL:
    ``field:*`` on any doc-value (keyword or numeric) field; docs whose
    value is NULL don't match. Constant score like RangeQuery."""

    field_id: int
    boost: float = 1.0


@dataclass(frozen=True)
class GeoDistanceQuery:
    """Docs whose geo_point lies within ``radius_m`` meters of an origin
    — EXTENSION (the ES ``geo_distance`` query / Lucene
    LatLonPoint.newDistanceQuery). Distance is the haversine
    great-circle distance on the IUGG mean-radius sphere
    (R = 6371008.8 m) — the Lucene SloppyMath.haversinMeters model.
    No NQL form (same as ES: geo queries are DSL-only, never
    query_string): construct programmatically or via CLI
    ``geo distance``. Constant score ``boost``; docs without a point
    never match. Composable in boolean trees (typically as a FILTER
    clause next to scored text)."""

    field_id: int
    lat: float
    lon: float
    radius_m: float
    boost: float = 1.0

    def __post_init__(self):
        if not (-90.0 <= self.lat <= 90.0) or not (-180.0 <= self.lon <= 180.0):
            raise QueryParseError(
                "geo_distance origin out of range (lat in [-90,90], lon in [-180,180])"
            )
        if not self.radius_m > 0:
            raise QueryParseError("geo_distance radius must be > 0")


@dataclass(frozen=True)
class GeoBoundingBoxQuery:
    """Docs whose geo_point lies inside a lat/lon box — EXTENSION (the
    ES ``geo_bounding_box`` query / Lucene LatLonPoint.newBoxQuery).
    Bounds are INCLUSIVE. When ``left > right`` the box crosses the
    antimeridian and matches lon >= left OR lon <= right (the ES
    dateline-wrap semantics). No NQL form (DSL-only, like ES).
    Constant score ``boost``; docs without a point never match."""

    field_id: int
    top: float  # north latitude
    left: float  # west longitude
    bottom: float  # south latitude
    right: float  # east longitude
    boost: float = 1.0

    def __post_init__(self):
        if not (-90.0 <= self.bottom <= self.top <= 90.0):
            raise QueryParseError(
                "geo_bounding_box needs -90 <= bottom <= top <= 90"
            )
        if not (-180.0 <= self.left <= 180.0) or not (-180.0 <= self.right <= 180.0):
            raise QueryParseError(
                "geo_bounding_box longitudes must be in [-180, 180]"
            )


@dataclass(frozen=True)
class GeoPolygonQuery:
    """Docs whose geo_point lies INSIDE a polygon — EXTENSION (the ES
    ``geo_polygon`` query / Lucene LatLonPoint.newPolygonQuery's planar
    model): even-odd ray casting in (lon, lat) coordinates, convex or
    CONCAVE rings (the shape a bounding box cannot express).
    ``points`` are (lat, lon) vertices in ring order; the GeoJSON
    closed form is accepted; dateline-crossing polygons are rejected
    (split them — the Lucene guidance). Strict even-odd boundary rule.
    No NQL form (DSL-only, like every geo query). Constant score
    ``boost``; docs without a point never match."""

    field_id: int
    points: tuple  # ((lat, lon), ...)
    boost: float = 1.0

    def __post_init__(self):
        from ..geo import _validate_polygon

        try:
            pts = _validate_polygon(self.points)
        except ValueError as e:
            raise QueryParseError(str(e))
        object.__setattr__(self, "points", tuple(pts))


@dataclass(frozen=True)
class GeoShapeQuery:
    """Docs whose stored RING satisfies ``relation`` against a query
    geometry — EXTENSION (the ES ``geo_shape`` query / Lucene
    LatLonShape analog, polygon-document subset; see
    schema.FIELD_TYPE_SHAPE). ``geometry`` is ``("point", lat, lon)``
    (relation must be ``intersects``: the ring contains the point,
    strict even-odd) or ``("bbox", top, left, bottom, right)`` with
    relation ``intersects`` (strict interior overlap), ``within``
    (ring entirely inside the box — decided exactly by the stored bbox
    columns) or ``disjoint`` (shape present and NOT intersecting).
    Planar; bbox queries do not wrap the dateline (left <= right
    required). DSL-only like every geo query; constant score ``boost``;
    docs without a shape never match any relation, including disjoint
    (the ES behavior: disjoint still requires the field to exist)."""

    field_id: int
    relation: str
    geometry: tuple
    boost: float = 1.0

    def __post_init__(self):
        rel = self.relation
        g = tuple(self.geometry)
        if not g or g[0] not in ("point", "bbox"):
            raise QueryParseError(
                "geo_shape geometry must be ('point', lat, lon) or "
                "('bbox', top, left, bottom, right)"
            )
        if g[0] == "point":
            if rel != "intersects":
                raise QueryParseError(
                    f"geo_shape point geometry supports only "
                    f"relation='intersects', got {rel!r}"
                )
            if len(g) != 3:
                raise QueryParseError("point geometry is ('point', lat, lon)")
            lat, lon = float(g[1]), float(g[2])
            if abs(lat) > 90 or abs(lon) > 180:
                raise QueryParseError(
                    "geo_shape point out of range (lat [-90,90], "
                    "lon [-180,180])"
                )
            g = ("point", lat, lon)
        else:
            if rel not in ("intersects", "within", "disjoint"):
                raise QueryParseError(
                    f"geo_shape bbox relation must be intersects / "
                    f"within / disjoint, got {rel!r}"
                )
            if len(g) != 5:
                raise QueryParseError(
                    "bbox geometry is ('bbox', top, left, bottom, right)"
                )
            top, left, bottom, right = (float(v) for v in g[1:])
            if top < bottom:
                raise QueryParseError("geo_shape bbox needs top >= bottom")
            if left > right:
                raise QueryParseError(
                    "geo_shape bbox does not wrap the dateline "
                    "(left <= right required) — split the query"
                )
            if abs(top) > 90 or abs(bottom) > 90 or abs(left) > 180 \
                    or abs(right) > 180:
                raise QueryParseError("geo_shape bbox out of range")
            g = ("bbox", top, left, bottom, right)
        object.__setattr__(self, "geometry", g)


@dataclass(frozen=True)
class RangeFieldQuery:
    """Docs whose stored INTERVAL [lo, hi] satisfies ``relation``
    against the query interval — EXTENSION (the ES range query on
    range FIELDS / Lucene RangeField analog; see
    schema.RANGE_FIELD_TYPES). Relations (all bounds INCLUSIVE, the ES
    semantics): ``intersects`` (the intervals overlap — the ES
    default), ``within`` (the doc's interval entirely inside the
    query's), ``contains`` (the doc's interval covers the query's).
    ``lo``/``hi`` may be None for an open end (±∞); docs without a
    range never match any relation. Filter context, constant score
    ``boost``; DSL-only besides ``field:*`` exists (the geo stance)."""

    field_id: int
    relation: str
    lo: float | None
    hi: float | None
    boost: float = 1.0

    def __post_init__(self):
        if self.relation not in ("intersects", "within", "contains"):
            raise QueryParseError(
                f"range-field relation must be intersects / within / "
                f"contains, got {self.relation!r}"
            )
        lo = None if self.lo is None else float(self.lo)
        hi = None if self.hi is None else float(self.hi)
        if lo is None and hi is None:
            raise QueryParseError(
                "range-field query needs at least one bound "
                "(use field:* for exists)"
            )
        if lo is not None and hi is not None and lo > hi:
            raise QueryParseError(
                f"range-field query bounds inverted: lo {lo} > hi {hi}"
            )
        object.__setattr__(self, "lo", lo)
        object.__setattr__(self, "hi", hi)


@dataclass(frozen=True)
class AllQuery:
    pass


@dataclass
class BooleanQuery:
    subqueries: list[tuple[str, object]] = field(default_factory=list)
    # EXTENSION (Lucene/ES minimumShouldMatch analog): at least this many
    # SHOULD clauses must match. 1 = ordinary union semantics. When > 1
    # the SHOULD group becomes REQUIRED (>= m of it), also alongside
    # MUST clauses (Lucene semantics); if fewer than m SHOULD clauses
    # can match (absent terms included), the query matches nothing.
    # The ES spec forms are accepted and resolved at construction (the
    # SHOULD-clause count is known): a percentage string "75%" floors to
    # pct-of-optional-clauses; a negative int means optional-count minus
    # that many may be missing. Both clamp to >= 1 (a bool with SHOULD
    # clauses always needs one match — Lucene). Programmatic-only, like
    # MUST_NOT/FILTER.
    min_should: int = 1

    def __post_init__(self):
        m = self.min_should
        if isinstance(m, str):
            s = m.strip()
            if not s.endswith("%"):
                raise QueryParseError(
                    f"min_should string must be a percentage like '75%', got {m!r}"
                )
            try:
                pct = float(s[:-1])
            except ValueError:
                raise QueryParseError(f"bad min_should percentage {m!r}") from None
            if not (-100.0 <= pct <= 100.0):
                raise QueryParseError("min_should percentage outside [-100, 100]")
            n_opt = sum(1 for occ, _ in self.subqueries if occ == SHOULD)
            if pct >= 0:
                resolved = int(pct / 100.0 * n_opt)  # ES: floor
            else:
                # negative percentage: that fraction MAY be missing
                resolved = n_opt - int(-pct / 100.0 * n_opt)
            self.min_should = max(1, resolved)
        elif isinstance(m, int) and m < 0:
            # ES negative integer: optional-count + m may be missing
            n_opt = sum(1 for occ, _ in self.subqueries if occ == SHOULD)
            self.min_should = max(1, n_opt + m)
        elif not isinstance(m, int) or m < 1:
            raise QueryParseError(
                f"min_should must be an int, a negative int, or 'N%', got {m!r}"
            )

    @staticmethod
    def intersection(*qs) -> "BooleanQuery":
        return BooleanQuery([(MUST, q) for q in qs])

    @staticmethod
    def union(*qs) -> "BooleanQuery":
        return BooleanQuery([(SHOULD, q) for q in qs])

    @staticmethod
    def at_least(m: int, *qs) -> "BooleanQuery":
        """Union requiring >= m of the clauses to match — extension,
        see ``min_should``."""
        if m < 1:
            raise QueryParseError("min_should must be >= 1")
        return BooleanQuery([(SHOULD, q) for q in qs], min_should=m)

    @staticmethod
    def excluding(base: "BooleanQuery | object", *nots) -> "BooleanQuery":
        """base AND NOT (n1 OR n2 ...) — extension, see MUST_NOT."""
        if isinstance(base, BooleanQuery):
            subs, m = list(base.subqueries), base.min_should
        else:
            subs, m = [(MUST, base)], 1
        return BooleanQuery(subs + [(MUST_NOT, n) for n in nots], min_should=m)

    @staticmethod
    def filtering(base: "BooleanQuery | object", *filters) -> "BooleanQuery":
        """base AND f1 AND f2 ... where the f's don't score — extension,
        see FILTER."""
        if isinstance(base, BooleanQuery):
            subs, m = list(base.subqueries), base.min_should
        else:
            subs, m = [(MUST, base)], 1
        return BooleanQuery(subs + [(FILTER, f) for f in filters], min_should=m)


@dataclass
class DisMaxQuery:
    """Disjunction-max (Lucene DisjunctionMaxQuery analog — EXTENSION,
    the reference sums all unions): a doc matching any child matches;
    its score is the BEST child score plus ``tie_breaker`` times the
    rest:  max(s_i) + tie * (sum(s_i) - max(s_i)).  tie=0 is pure max
    (the classic multi-field shape: don't reward the same word spread
    thinly across fields), tie=1 degenerates to the ordinary union sum.
    Programmatic-only, like MUST_NOT/FILTER."""

    children: list = field(default_factory=list)
    tie_breaker: float = 0.0

    def __post_init__(self):
        if not (0.0 <= self.tie_breaker <= 1.0):
            raise QueryParseError("tie_breaker must be in [0, 1]")


@dataclass
class BoostingQuery:
    """Demotion query (the Elasticsearch ``boosting`` query / Lucene
    queries-module BoostingQuery analog — EXTENSION): docs match iff
    they match ``positive`` and score as ``positive`` does, but any doc
    ALSO matching ``negative`` has its score multiplied by
    ``negative_boost``. Unlike MUST_NOT the negative clause never
    removes a doc — it only pushes it down the ranking (the classic
    "demote the outdated/translated/duplicate docs" shape ES documents
    for the boosting query). ``negative`` is filter context: it
    contributes match membership only, never score. Programmatic-only,
    like MUST_NOT/FILTER/DisMax."""

    positive: object = None
    negative: object = None
    negative_boost: float = 0.5

    def __post_init__(self):
        if self.positive is None or self.negative is None:
            raise QueryParseError(
                "BoostingQuery needs both a positive and a negative query"
            )
        if self.negative_boost < 0.0:
            raise QueryParseError("negative_boost must be >= 0")


def parse_multi_field(
    text: str, schema, fields: "list[str] | dict[str, float]",
    tie_breaker: float = 0.0,
) -> DisMaxQuery:
    """MultiFieldQueryParser analog: parse ``text`` once per field (each
    field's own analyzer applies) and dismax the per-field queries.
    ``fields`` may be a dict mapping field -> boost (the Elasticsearch
    ``fields: ["title^2", "body"]`` shape): each per-field query's
    scores are multiplied by its boost BEFORE the max/tie combination,
    so a title match outranks an equal body match."""
    boosts = fields if isinstance(fields, dict) else {f: 1.0 for f in fields}
    return DisMaxQuery(
        [
            _apply_boost(parse_query(text, schema, default_fields=[f]), b)
            for f, b in boosts.items()
        ],
        tie_breaker,
    )


@dataclass(frozen=True)
class BlendedTermQuery:
    """Lucene BlendedTermQuery — the heart of ES ``multi_match
    type=cross_fields``: ONE logical term looked up in several fields
    with a BLENDED document frequency. Every per-field leaf scores with
    ``idf(max df across the group)`` (its own postings/tf, its own
    field boost), so the same word is comparable across fields — a
    first_name hit doesn't dwarf a last_name hit just because one
    field's dictionary is smaller. Per-doc combination is dismax:
    ``max + tie * (sum - max)``. ``pairs`` is
    ``((field_id, term, field_boost), ...)``. Programmatic / built by
    parse_cross_fields."""

    pairs: tuple = ()
    tie_breaker: float = 0.0
    boost: float = 1.0

    def __post_init__(self):
        if not self.pairs:
            raise QueryParseError("BlendedTermQuery needs >= 1 (field, term) pair")
        if not (0.0 <= self.tie_breaker <= 1.0):
            raise QueryParseError("tie_breaker must be in [0, 1]")


@dataclass(frozen=True)
class CombinedTermQuery:
    """One term of a ``combined_fields`` query — the Lucene
    CombinedFieldQuery / ES ``combined_fields`` analog (EXTENSION,
    programmatic / via parse_combined_fields): the SIGIR'04 BM25F
    "pseudo-field" simplification. The listed fields merge into one
    virtual field and the term scores ONCE against it:

    - tf(doc)  = sum over fields of weight * tf_field(doc)
    - dl(doc)  = sum over fields of weight * field_length(doc)
      (lengths of EVERY listed field count, term present there or not —
      delivered from the per-segment norms table)
    - df       = max over fields of the term's doc_freq, clipped to N
      (Lucene CombinedFieldQuery's pseudo-TermStatistics convention:
      union df is not materialized anywhere, max is its cheapest
      sound-ish stand-in and what Lucene itself ships)
    - avgdl    = sum over fields of weight * avg_field_length
      (the pseudo CollectionStatistics: weighted sumTotalTermFreq over
      docCount — equal because every doc row carries every field here)

    Unlike cross_fields/BlendedTermQuery (field-centric leaves with a
    blended df, combined per-doc by dismax), combined_fields is
    TERM-centric: one scorer, one saturation curve over the SUMMED tf —
    two mid-tf fields beat one high-tf field, the BM25F property dismax
    cannot express. Weights must be >= 1 (the ES rule: < 1 breaks the
    BM25F length-normalization derivation). Constant extra cost: the
    norms of every listed field ride the scoring shuffle (the Lucene
    norms-read analog), one pushed-filter scan per field."""

    fields: tuple  # ((field_id, weight >= 1.0), ...)
    term: str
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(
            self, "fields", tuple((int(f), float(w)) for f, w in self.fields)
        )
        if not self.fields:
            raise QueryParseError("combined_fields needs >= 1 field")
        if len({f for f, _ in self.fields}) != len(self.fields):
            raise QueryParseError("combined_fields lists a field twice")
        if any(w < 1.0 for _, w in self.fields):
            raise QueryParseError(
                "combined_fields weights must be >= 1 (the ES rule — "
                "sub-1 weights break the BM25F length normalization)"
            )
        if not self.term:
            raise QueryParseError("empty term in combined_fields query")


@dataclass(frozen=True)
class SpanOrQuery:
    """Union of term spans — the Lucene SpanOrQuery analog over term
    clauses (ES ``span_or``; EXTENSION, programmatic-only like
    span_first/span_not). Matches docs containing ANY of the terms;
    tf = TOTAL occurrences of all the terms (Lucene's sloppy freq = the
    number of matching spans), idf = sum of the present terms' idfs
    (SpanWeight builds combined statistics over every clause term).
    One scorer over the summed tf — a different saturation shape than
    BooleanQuery-SHOULD's per-term sum of scores. Already usable as the
    exclude side of span_not (multiple excludes = spanOr there); this is
    the standalone scoring form. tf sums need no positions decode, so
    (unlike the other span queries) positions=False fields work."""

    field_id: int
    terms: tuple[str, ...]
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "terms", tuple(self.terms))
        if not self.terms or any(not t for t in self.terms):
            raise QueryParseError(
                "span_or needs at least one non-empty term"
            )


def parse_combined_fields(
    text: str,
    schema,
    fields: "list[str] | dict[str, float]",
    operator: str = "or",
    boost: float = 1.0,
):
    """ES ``combined_fields``: analyze ``text`` ONCE (the fields must
    share one query analyzer — the ES validation) and turn each token
    into a CombinedTermQuery over all the fields. ``operator="and"``
    requires every token to match (in the merged pseudo-field);
    ``fields`` may map field -> weight (>= 1) like parse_cross_fields."""
    weights = fields if isinstance(fields, dict) else {f: 1.0 for f in fields}
    if not weights:
        raise QueryParseError("combined_fields needs >= 1 field")
    if operator not in ("or", "and"):
        raise QueryParseError("operator must be 'or' or 'and'")
    entries = []
    for name in weights:
        fe = schema.field_by_name(name)
        if fe is None or fe.is_doc_value:
            raise QueryParseError(
                f"combined_fields field {name!r} is not a text field of "
                f"this schema"
            )
        entries.append(fe)
    analyzers = {fe.query_analyzer for fe in entries}
    if len(analyzers) != 1:
        raise QueryParseError(
            f"combined_fields requires fields sharing ONE analyzer, got "
            f"{sorted(analyzers)} (the ES same-analyzer validation)"
        )
    toks = get_analyzer(analyzers.pop()).analyze_one(text)
    if not toks:
        return EmptyQuery()
    pairs = tuple((fe.id, weights[fe.name]) for fe in entries)
    combined = [CombinedTermQuery(pairs, t, boost) for t in toks]
    if len(combined) == 1:
        return combined[0]
    occ = MUST if operator == "and" else SHOULD
    return BooleanQuery([(occ, c) for c in combined])


def parse_cross_fields(
    text: str,
    schema,
    fields: "list[str] | dict[str, float]",
    operator: str = "or",
    tie_breaker: float = 0.0,
):
    """ES ``multi_match type=cross_fields``: TERM-centric multi-field
    match — the query text analyzes ONCE (the fields must share one
    query analyzer, the ES same-analyzer group rule) and each token
    becomes a BlendedTermQuery across all the fields. With
    ``operator="and"`` every token must match in SOME field — the
    "first name in one field, last name in another" contract that
    field-centric best_fields (parse_multi_field) cannot express.
    ``fields`` may map field -> boost like parse_multi_field."""
    boosts = fields if isinstance(fields, dict) else {f: 1.0 for f in fields}
    if not boosts:
        raise QueryParseError("cross_fields needs >= 1 field")
    if operator not in ("or", "and"):
        raise QueryParseError("operator must be 'or' or 'and'")
    entries = []
    for name in boosts:
        fe = schema.field_by_name(name)
        if fe is None or fe.is_doc_value:
            raise QueryParseError(
                f"cross_fields field {name!r} is not a text field of this schema"
            )
        entries.append(fe)
    analyzers = {fe.query_analyzer for fe in entries}
    if len(analyzers) != 1:
        raise QueryParseError(
            f"cross_fields requires fields sharing ONE analyzer, got "
            f"{sorted(analyzers)} — split into per-analyzer groups and "
            f"combine with DisMaxQuery (the ES cross-group behavior)"
        )
    toks = get_analyzer(analyzers.pop()).analyze_one(text)
    if not toks:
        return EmptyQuery()
    blended = [
        BlendedTermQuery(
            tuple((fe.id, t, boosts[fe.name]) for fe in entries), tie_breaker
        )
        for t in toks
    ]
    if len(blended) == 1:
        return blended[0]
    occ = MUST if operator == "and" else SHOULD
    return BooleanQuery([(occ, b) for b in blended])


def parse_match_bool_prefix(
    text: str,
    schema,
    field: str,
    operator: str = "or",
    max_expansions: int | None = None,
    min_should=1,
):
    """ES ``match_bool_prefix``: analyze the query text with the field's
    query analyzer; every token becomes a TermQuery clause except the
    LAST, which becomes a PrefixQuery — the "last word is still being
    typed" autocomplete shape. Unlike match_phrase_prefix the tokens may
    match in ANY position/order (it is a bool, not a phrase); unlike the
    edge-n-gram SAYT field this expands the prefix at QUERY time against
    the live dictionary — no index-time gram storage, at the cost of a
    per-query expansion read (the standard ES trade between the two).

    ``operator="and"`` requires every clause (ES operator parameter);
    ``min_should`` (operator="or" only, the ES minimum_should_match
    pairing rule) takes the ES spec forms — an int, "75%", negative
    counts — resolved by BooleanQuery at construction; ``max_expansions``
    caps the prefix expansion like any multi-term query (None -> the
    documented default cap). A single-token text is the bare
    PrefixQuery; empty analysis is EmptyQuery."""
    if operator not in ("or", "and"):
        raise QueryParseError("operator must be 'or' or 'and'")
    fe = schema.field_by_name(field)
    if fe is None or fe.is_doc_value:
        raise QueryParseError(
            f"match_bool_prefix field {field!r} is not a text field of this schema"
        )
    toks = get_analyzer(fe.query_analyzer).analyze_one(text)
    if not toks:
        return EmptyQuery()
    last = PrefixQuery(fe.id, toks[-1], max_expansions)
    if len(toks) == 1:
        return last
    occ = MUST if operator == "and" else SHOULD
    return BooleanQuery(
        [(occ, TermQuery(fe.id, t)) for t in toks[:-1]] + [(occ, last)],
        min_should=min_should if operator == "or" else 1,
    )


@dataclass(frozen=True)
class EmptyQuery:
    pass


# --- AST (parser_ast.go:5-35) ---


@dataclass
class _Leaf:
    value: str


@dataclass
class _And:
    left: object
    right: object


@dataclass
class _Or:
    left: object
    right: object


def _split_keep_quotes(q: str) -> list[str]:
    """Whitespace split that keeps double-quoted spans (and any attached
    ``field:`` prefix) as one raw token — phrase extension — and keeps
    ``field:[lo TO hi]`` / ``field:{lo TO hi}`` range spans together (a
    bracket opens a span only right after ``:``, so bare tokens
    containing brackets split exactly like the reference). Everything
    else tokenizes exactly like the reference."""
    out: list[str] = []
    cur: list[str] = []
    in_quote = False
    in_range = False
    for ch in q:
        if ch == '"' and not in_range:
            in_quote = not in_quote
            cur.append(ch)
        elif (
            ch in "[{"
            and not in_quote
            and not in_range
            and cur
            and cur[-1] == ":"
        ):
            in_range = True
            cur.append(ch)
        elif ch in "]}" and in_range:
            in_range = False
            cur.append(ch)
        elif ch.isspace() and not in_quote and not in_range:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if in_quote:
        raise QueryParseError("unclosed '\"' in query")
    if in_range:
        raise QueryParseError("unclosed range bracket in query")
    if cur:
        out.append("".join(cur))
    return out


def _tokenize(q: str) -> list[str]:
    # Leading '('/trailing ')' are stripped even on tokens containing a
    # quoted span: _split_keep_quotes guarantees balanced quotes per
    # token, so a paren at position 0 is always BEFORE the first quote
    # and a trailing ')' always AFTER the last — never inside the span.
    # (A paren inside quotes makes the token start/end with '"', which
    # stops the loop.)  '(text:"hash join" OR x)' therefore parses as
    # ( phrase OR term ), not as a literal bare term.
    out: list[str] = []
    for raw in _split_keep_quotes(q):
        while raw.startswith("("):
            out.append("(")
            raw = raw[1:]
        tail: list[str] = []
        while raw.endswith(")"):
            tail.append(")")
            raw = raw[:-1]
        if raw:
            out.append(raw)
        out.extend(tail)
    return out


class _Parser:
    def __init__(self, tokens: list[str], default_op: str = "or"):
        self.tokens = tokens
        self.pos = 0
        self.default_op = default_op

    def peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> str:
        if self.pos >= len(self.tokens):
            raise QueryParseError(
                "unexpected end of query (dangling operator or unclosed '(')"
            )
        t = self.tokens[self.pos]
        self.pos += 1
        return t

    def parse_expr(self):
        node = self.parse_primary()
        while True:
            t = self.peek()
            if t is None or t == ")":
                return node
            if t.upper() == "AND":
                self.next()
                node = _And(node, self.parse_primary())
            elif t.upper() == "OR":
                self.next()
                node = _Or(node, self.parse_primary())
            else:
                # implicit combination of adjacent primaries: OR by
                # default (parser.go:76-83); "and" = the ES
                # query_string default_operator=AND behavior
                if self.default_op == "and":
                    node = _And(node, self.parse_primary())
                else:
                    node = _Or(node, self.parse_primary())

    def parse_primary(self):
        t = self.next()
        if t == "(":
            node = self.parse_expr()
            if self.peek() == ")":
                self.next()
            return node
        return _Leaf(t)


def _phrase_for_field(fe, raw: str, slop: int = 0):
    """Analyze a quoted span with the field's analyzer -> phrase (or the
    degenerate single-term / empty forms). A trailing ``*`` on the span's
    last word makes it a phrase-prefix (match_phrase_prefix shape): fixed
    words analyzed, the last word lowercased-only and dictionary-expanded
    at search time."""
    stripped = raw.rstrip()
    # the * must be ATTACHED to the last word ("a b*"); a detached
    # " *" is an analyzer separator like anywhere else in a phrase
    if stripped.endswith("*") and len(stripped) > 1 and not stripped[-2].isspace():
        words = stripped[:-1].split()
        prefix = words[-1].lower()
        fixed = " ".join(words[:-1])
        terms = get_analyzer(fe.query_analyzer).analyze_one(fixed) if fixed else []
        return PhrasePrefixQuery(fe.id, tuple(terms), prefix, slop=slop)
    terms = get_analyzer(fe.query_analyzer).analyze_one(raw)
    if not terms:
        return EmptyQuery()
    if len(terms) == 1:
        return TermQuery(fe.id, terms[0])
    return PhraseQuery(fe.id, tuple(terms), slop=slop)


def _near_for_field(fe, raw: str, slop: int):
    """Analyze a quoted span -> unordered NearQuery (degenerate forms
    like the phrase path). Phrase-prefix does not compose with ``u``."""
    if raw.rstrip().endswith("*"):
        raise QueryParseError(
            "phrase-prefix and unordered proximity do not compose "
            '("a b*"~Nu) — drop the u or the *'
        )
    terms = get_analyzer(fe.query_analyzer).analyze_one(raw)
    if not terms:
        return EmptyQuery()
    if len(terms) == 1:
        return TermQuery(fe.id, terms[0])
    return NearQuery(fe.id, tuple(terms), slop=slop)


def _span_near_for_field(fe, raw: str, slop: int):
    """Analyze a quoted span -> ORDERED SpanNearQuery (degenerate forms
    like the phrase path). Phrase-prefix does not compose with ``o``."""
    if raw.rstrip().endswith("*"):
        raise QueryParseError(
            "phrase-prefix and ordered span proximity do not compose "
            '("a b*"~No) — drop the o or the *'
        )
    terms = get_analyzer(fe.query_analyzer).analyze_one(raw)
    if not terms:
        return EmptyQuery()
    if len(terms) == 1:
        return TermQuery(fe.id, terms[0])
    return SpanNearQuery(fe.id, tuple(terms), slop=slop)


# proximity syntax: "quoted span"~N (slop). Like '*'/'~'/'^': the quote
# is a tokenizer separator, so no indexed term carries the shape.
_SLOP_SUFFIX = re.compile(r'^"(.*)"~(\d+)$', re.DOTALL)

# unordered proximity: "quoted span"~Nu (the u suffix = inOrder=false)
_NEAR_SUFFIX = re.compile(r'^"(.*)"~(\d+)u$', re.DOTALL)
_ORDERED_SUFFIX = re.compile(r'^"(.*)"~(\d+)o$', re.DOTALL)


_FUZZY_SUFFIX = re.compile(r"^(.+)~([012]|auto)$", re.IGNORECASE)


def auto_fuzziness(term: str) -> int:
    """The Elasticsearch ``fuzziness: AUTO`` ladder (default AUTO:3,6):
    terms of length 0-2 match exactly, 3-5 allow one edit, 6+ allow
    two. Resolved at parse/construction time — the term's length is
    known, so nothing downstream changes."""
    n = len(term)
    return 0 if n < 3 else (1 if n < 6 else 2)

# Lucene range syntax: [ ] inclusive, { } exclusive, mixed allowed,
# * = open bound. The span survives whitespace splitting because
# _split_keep_quotes keeps ``field:[...]`` together.
_RANGE_SYNTAX = re.compile(r"^([\[{])(.*) TO (.*)([\]}])$")


def _parse_bound(s: str, what: str):
    s = s.strip()
    if s == "*":
        return None
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            raise QueryParseError(f"non-numeric {what} bound {s!r} in range query")


def _parse_str_bound(s: str):
    """Keyword-range bound: ``*`` = open; optional quotes allow spaces."""
    s = s.strip()
    if s == "*":
        return None
    if len(s) >= 2 and s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    return s


# Date bound grammar (ES date-math subset, no `now`): an ISO-8601
# prefix — "2024", "2024-01", "2024-01-10", "2024-01-10T12",
# "…T12:30", "…T12:30:05", "…T12:30:05.123456" — or a pure-digit
# epoch-MILLIS value (the ES `epoch_millis` format). Partial values
# denote a UNIT: [start, next_unit_start) in UTC.
_DATE_UNITS = (
    (4, "year"), (7, "month"), (10, "day"),
    (13, "hour"), (16, "minute"), (19, "second"),
)


def _parse_date_span(s: str) -> tuple[int, int] | None:
    """Parse one date bound into its UTC [start_us, end_us) unit span
    (end exclusive). Full-precision values have end = start + 1µs.
    Returns None when the text is not a date."""
    import datetime as _dt

    s = s.strip()
    if len(s) >= 2 and s.startswith('"') and s.endswith('"'):
        s = s[1:-1].strip()
    if s.isdigit() and 5 <= len(s) <= 13:
        # epoch millis (ES epoch_millis). 4-digit values are always
        # YEARS (an epoch-millis instant inside 1970-01-01T00:00:10 is
        # not a thing anyone queries); longer digit runs are millis.
        us = int(s) * 1000
        return us, us + 1000
    unit = None
    for ln, u in _DATE_UNITS:
        if len(s) == ln:
            unit = u
            break
    if unit is None and not (len(s) > 19 and s[:10].count("-") == 2):
        return None
    try:
        if unit == "year":
            start = _dt.datetime(int(s), 1, 1, tzinfo=_dt.timezone.utc)
            end = _dt.datetime(int(s) + 1, 1, 1, tzinfo=_dt.timezone.utc)
        elif unit == "month":
            y, m = int(s[:4]), int(s[5:7])
            start = _dt.datetime(y, m, 1, tzinfo=_dt.timezone.utc)
            y2, m2 = (y + 1, 1) if m == 12 else (y, m + 1)
            end = _dt.datetime(y2, m2, 1, tzinfo=_dt.timezone.utc)
        else:
            start = _dt.datetime.fromisoformat(s)
            if start.tzinfo is None:
                start = start.replace(tzinfo=_dt.timezone.utc)
            widths = {
                "day": _dt.timedelta(days=1),
                "hour": _dt.timedelta(hours=1),
                "minute": _dt.timedelta(minutes=1),
                "second": _dt.timedelta(seconds=1),
            }
            end = start + widths.get(unit, _dt.timedelta(microseconds=1))
    except ValueError:
        return None
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    to_us = lambda d: (d - epoch) // _dt.timedelta(microseconds=1)  # noqa: E731
    return to_us(start), to_us(end)


def _parse_date_bound(fe, s: str, side: str, inclusive: bool) -> int | None:
    """One bound of a date range, resolved to epoch micros with the ES
    rounding rule (Lucene DateMathParser): gte/lt use the unit's START,
    gt/lte its END — so ``ts:[2024-01-10 TO 2024-01-19]`` means the
    whole of both days. The resolved bound is always INCLUSIVE-adjusted
    (gt start-of-next-unit - 1µs ≡ > end-of-unit), so RangeQuery keeps
    its plain numeric semantics downstream."""
    s = s.strip()
    if s == "*":
        return None
    span = _parse_date_span(s)
    if span is None:
        raise QueryParseError(
            f"cannot parse date bound {s!r} for field {fe.name!r} — "
            f"expected an ISO-8601 prefix (2024-01-10, 2024-01-10T12:30, "
            f"…) or epoch millis"
        )
    start, end = span
    if side == "lo":
        return start if inclusive else end - 1
    return end - 1 if inclusive else start


def _ip_leaf(fe, raw: str):
    """NQL on an ip field (the ES `ip` type query surface; ip.py docs
    the encoding): ``ip:1.2.3.4`` exact, ``ip:10.0.0.0/8`` CIDR mask
    (an inclusive [net, broadcast] hex range — a v4 mask never matches
    a v6 value, the ES behavior), ``ip:[a TO b]`` / ``{..}`` explicit
    ranges with ``*`` open bounds. Values encode to canonical hex HERE
    so the execution layer runs the plain keyword string machinery."""
    from ..ip import cidr_bounds, ip_hex

    try:
        m = _RANGE_SYNTAX.match(raw)
        if m:
            lo = _parse_str_bound(m.group(2))
            hi = _parse_str_bound(m.group(3))
            return RangeQuery(
                fe.id,
                ip_hex(lo) if lo is not None else None,
                ip_hex(hi) if hi is not None else None,
                include_lo=m.group(1) == "[",
                include_hi=m.group(4) == "]",
            )
        v = raw[1:-1] if (
            len(raw) >= 2 and raw.startswith('"') and raw.endswith('"')
        ) else raw
        if not v:
            raise QueryParseError(f"ip field {fe.name!r} needs a value")
        if "/" in v:
            lo, hi = cidr_bounds(v)
            return RangeQuery(fe.id, lo, hi,
                              include_lo=True, include_hi=True)
        return KeywordQuery(fe.id, ip_hex(v))
    except ValueError:
        raise QueryParseError(
            f"ip field {fe.name!r}: {raw!r} is not an IPv4/IPv6 "
            f"address, CIDR block, or [lo TO hi] range"
        ) from None


def _date_leaf(fe, raw: str):
    """Value side of ``datefield:...`` — a range span (bounds in ISO-8601
    with ES unit rounding) or a plain value (equality = the value's whole
    unit span: ``ts:2024-01-10`` matches that UTC day)."""
    m = _RANGE_SYNTAX.match(raw)
    if m:
        lo = _parse_date_bound(fe, m.group(2), "lo", m.group(1) == "[")
        hi = _parse_date_bound(fe, m.group(3), "hi", m.group(4) == "]")
        # bounds are pre-rounded to inclusive micros above
        return RangeQuery(fe.id, lo, hi, include_lo=True, include_hi=True)
    span = _parse_date_span(raw)
    if span is None:
        raise QueryParseError(
            f"cannot parse date value {raw!r} for field {fe.name!r}"
        )
    return RangeQuery(fe.id, span[0], span[1] - 1)


def _numeric_leaf(fe, raw: str):
    """Value side of ``numericfield:...`` — a range span or a plain value
    (equality = degenerate range)."""
    m = _RANGE_SYNTAX.match(raw)
    if m:
        return RangeQuery(
            fe.id,
            _parse_bound(m.group(2), "lower"),
            _parse_bound(m.group(3), "upper"),
            include_lo=m.group(1) == "[",
            include_hi=m.group(4) == "]",
        )
    v = _parse_bound(raw, "equality")
    if v is None:
        raise QueryParseError(
            f"cannot parse numeric value {raw!r} for field {fe.name!r}"
        )
    return RangeQuery(fe.id, v, v)

# EXTENSION (Lucene boost syntax): ``clause^2`` / ``clause^0.5``. Safe on
# the same grounds as ``*``/``~``: every tokenizer treats ``^`` as a
# separator, so no indexed term contains it — a bare term the reference
# could MATCH never carries the suffix. Collision surface (documented):
# field-ANALYZED values like ``text:spark^2`` previously analyzed to
# OR(spark, 2); they now mean TermQuery(spark, boost=2). Escape hatch:
# quote it (``text:"spark^2"`` keeps the analyzed behavior).
_BOOST_SUFFIX = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")


def _split_boost(value: str) -> tuple[str, float]:
    """Strip a trailing ``^<number>`` that sits OUTSIDE any quoted span."""
    m = _BOOST_SUFFIX.match(value)
    if m is None:
        return value, 1.0
    # caret is at len(group(1)); a quote after it means the suffix is
    # inside the quoted span ('text:"foo^2"') -> not a boost
    if value.rfind('"') > len(m.group(1)):
        return value, 1.0
    return m.group(1), float(m.group(2))


def _apply_boost(q, boost: float):
    """Scale a parsed clause. Unions (multi-term analysis, default-field
    expansion) distribute the boost over children — equivalent because
    union score = sum of child scores, which is linear in each idf."""
    import dataclasses

    if boost == 1.0:
        return q
    if isinstance(
        q,
        (TermQuery, PhraseQuery, PrefixQuery, FuzzyQuery, WildcardQuery,
         RegexpQuery, RangeQuery, KeywordQuery, TermsQuery, ExistsQuery,
         IdsQuery),
    ):
        return dataclasses.replace(q, boost=q.boost * boost)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            [(occ, _apply_boost(sub, boost)) for occ, sub in q.subqueries],
            min_should=q.min_should,
        )
    if isinstance(q, DisMaxQuery):
        # max and sum are both linear under a positive scale, so
        # distributing over children == scaling the combined score
        return DisMaxQuery(
            [_apply_boost(c, boost) for c in q.children], q.tie_breaker
        )
    return q  # EmptyQuery


def _multiterm_from_raw(raw: str):
    """('prefix', p) / ('fuzzy', (t, d)) / ('wildcard', pat) /
    ('regexp', pat) for multi-term syntax, else None.

    Safe extension: the tokenizers treat ``*``, ``?``, ``~`` and ``/``
    as separators, so no indexed term contains them — a value the
    reference could have matched never reaches these branches."""
    if '"' in raw or not raw:
        return None
    if raw.startswith("/") and raw.endswith("/") and len(raw) >= 3:
        # Lucene slash syntax; pattern passed through un-lowercased
        return ("regexp", raw[1:-1])
    if raw.endswith("*") and len(raw) >= 2 and "*" not in raw[:-1] and "~" not in raw and "?" not in raw:
        return ("prefix", raw[:-1].lower())
    if ("*" in raw or "?" in raw) and "~" not in raw:
        return ("wildcard", raw.lower())
    if "*" not in raw:
        m = _FUZZY_SUFFIX.match(raw)
        if m:
            term = m.group(1).lower()
            suffix = m.group(2).lower()
            dist = auto_fuzziness(term) if suffix == "auto" else int(suffix)
            return ("fuzzy", (term, dist))
    return None


def _multiterm_query(field_id: int, mt):
    kind, payload = mt
    if kind == "prefix":
        return PrefixQuery(field_id, payload)
    if kind == "wildcard":
        return WildcardQuery(field_id, payload)
    if kind == "regexp":
        return RegexpQuery(field_id, payload)
    term, dist = payload
    if dist == 0:
        # ~0 is an exact (normalized, unanalyzed) term — Lucene semantics
        return TermQuery(field_id, term)
    return FuzzyQuery(field_id, term, max_dist=dist)


def _leaf_to_query(value: str, schema: Schema, default_fields: list[str]):
    value, boost = _split_boost(value)
    return _apply_boost(_leaf_to_query_unboosted(value, schema, default_fields), boost)


def _leaf_to_query_unboosted(value: str, schema: Schema, default_fields: list[str]):
    if ":" in value:
        fname, raw = value.split(":", 1)
        fe = schema.field_by_name(fname)
        if fe is not None:
            if fe.is_doc_value and raw == "*":
                # field:* — exists (the ES exists-query shape); valid on
                # any doc-value field. Text fields keep wildcard meaning.
                return ExistsQuery(fe.id)
            if fe.is_keyword:
                m = _RANGE_SYNTAX.match(raw)
                if m:
                    # lexicographic range (Lucene TermRangeQuery analog):
                    # bounds stay strings; quotes allow spaces/brackets
                    return RangeQuery(
                        fe.id,
                        _parse_str_bound(m.group(2)),
                        _parse_str_bound(m.group(3)),
                        include_lo=m.group(1) == "[",
                        include_hi=m.group(4) == "]",
                    )
                if len(raw) >= 2 and raw.startswith('"') and raw.endswith('"'):
                    return KeywordQuery(fe.id, raw[1:-1])
                if not raw:
                    raise QueryParseError(
                        f"keyword field {fe.name!r} needs a value"
                    )
                return KeywordQuery(fe.id, raw)
            if fe.is_ip:
                return _ip_leaf(fe, raw)
            if fe.is_date:
                return _date_leaf(fe, raw)
            if fe.is_numeric:
                return _numeric_leaf(fe, raw)
            if fe.is_geo:
                # same stance as ES: geo queries exist only in the DSL
                # (GeoDistanceQuery / GeoBoundingBoxQuery), never in
                # query_string — only exists (field:*) has NQL form
                raise QueryParseError(
                    f"geo field {fe.name!r} has no query-string syntax "
                    f"besides {fe.name}:* (exists) — use GeoDistanceQuery "
                    f"/ GeoBoundingBoxQuery or the CLI geo subcommand"
                )
            if fe.is_shape:
                raise QueryParseError(
                    f"geo_shape field {fe.name!r} has no query-string "
                    f"syntax besides {fe.name}:* (exists) — use "
                    f"GeoShapeQuery or the CLI geo shape subcommand"
                )
            if fe.is_range:
                raise QueryParseError(
                    f"range field {fe.name!r} has no query-string syntax "
                    f"besides {fe.name}:* (exists) — use RangeFieldQuery "
                    f"or the search --range-rel option"
                )
            if fe.is_histogram:
                raise QueryParseError(
                    f"histogram field {fe.name!r} supports aggregations "
                    f"only (the ES contract) besides {fe.name}:* (exists)"
                )
            if len(raw) >= 2 and raw.startswith('"') and raw.endswith('"'):
                # field:"quoted phrase" — consecutive-terms extension
                return _phrase_for_field(fe, raw[1:-1])
            nm = _NEAR_SUFFIX.match(raw)
            if nm:
                # field:"a b"~2u — UNORDERED proximity
                return _near_for_field(fe, nm.group(1), int(nm.group(2)))
            om = _ORDERED_SUFFIX.match(raw)
            if om:
                # field:"a b"~2o — ORDERED span proximity
                return _span_near_for_field(fe, om.group(1), int(om.group(2)))
            sm = _SLOP_SUFFIX.match(raw)
            if sm:
                # field:"a b"~2 — proximity (sloppy) phrase
                return _phrase_for_field(fe, sm.group(1), slop=int(sm.group(2)))
            mt = _multiterm_from_raw(raw)
            if mt is not None:
                return _multiterm_query(fe.id, mt)
            # field-qualified: analyzed by the field's analyzer
            terms = get_analyzer(fe.query_analyzer).analyze_one(raw)
            if not terms:
                return EmptyQuery()
            if len(terms) == 1:
                return TermQuery(fe.id, terms[0])
            return BooleanQuery.union(*[TermQuery(fe.id, t) for t in terms])
        # unknown field name: fall through, treat whole token as bare term
    bare_span, bare_slop, bare_kind = None, 0, "phrase"
    if len(value) >= 2 and value.startswith('"') and value.endswith('"'):
        bare_span = value[1:-1]
    else:
        nm = _NEAR_SUFFIX.match(value)
        om = None if nm else _ORDERED_SUFFIX.match(value)
        sm = None if nm or om else _SLOP_SUFFIX.match(value)
        if nm:
            bare_span, bare_slop, bare_kind = nm.group(1), int(nm.group(2)), "near"
        elif om:
            bare_span, bare_slop, bare_kind = om.group(1), int(om.group(2)), "ordered"
        elif sm:
            bare_span, bare_slop = sm.group(1), int(sm.group(2))
    if bare_span is not None:
        # bare quoted phrase: expand over default fields (each analyzed by
        # its own field's analyzer — unlike bare TERMS, a phrase has to be
        # analyzed to be split into terms at all)
        qs = []
        for fname in default_fields:
            fe = schema.field_by_name(fname)
            if fe is not None and not fe.is_numeric and not fe.is_date:
                q = (
                    _near_for_field(fe, bare_span, bare_slop)
                    if bare_kind == "near"
                    else _span_near_for_field(fe, bare_span, bare_slop)
                    if bare_kind == "ordered"
                    else _phrase_for_field(fe, bare_span, slop=bare_slop)
                )
                if not isinstance(q, EmptyQuery):
                    qs.append(q)
        if not qs:
            return EmptyQuery()
        return qs[0] if len(qs) == 1 else BooleanQuery.union(*qs)
    mt = _multiterm_from_raw(value)
    if mt is not None:
        # bare prefix/fuzzy: expand over the default fields, like a bare
        # phrase (normalized, never field-analyzed)
        qs = [
            _multiterm_query(fe.id, mt)
            for fname in default_fields
            if (fe := schema.field_by_name(fname)) is not None and not fe.is_numeric and not fe.is_date
        ]
        if not qs:
            return EmptyQuery()
        return qs[0] if len(qs) == 1 else BooleanQuery.union(*qs)
    # bare term: NOT analyzed, expanded over default fields (parser.go:114-117)
    # numeric fields are excluded from bare expansion: they hold no terms
    qs = []
    for fname in default_fields:
        fe = schema.field_by_name(fname)
        if fe is not None and not fe.is_numeric and not fe.is_date:
            qs.append(TermQuery(fe.id, value))
    if not qs:
        return EmptyQuery()
    if len(qs) == 1:
        return qs[0]
    return BooleanQuery.union(*qs)


def _ast_to_query(node, schema: Schema, default_fields: list[str]):
    if isinstance(node, _Leaf):
        return _leaf_to_query(node.value, schema, default_fields)
    if isinstance(node, _And):
        return BooleanQuery.intersection(
            _ast_to_query(node.left, schema, default_fields),
            _ast_to_query(node.right, schema, default_fields),
        )
    if isinstance(node, _Or):
        return BooleanQuery.union(
            _ast_to_query(node.left, schema, default_fields),
            _ast_to_query(node.right, schema, default_fields),
        )
    raise TypeError(node)


def parse_query(
    q: str,
    schema: Schema,
    default_fields: list[str] | None = None,
    default_operator: str = "or",
):
    """Parse an ostrich NQL string into a logical query tree.

    ``default_operator`` controls how ADJACENT primaries with no
    explicit operator combine: "or" (the reference's implicit-OR,
    parser.go:76-83) or "and" (the ES query_string
    ``default_operator=AND`` behavior — every word required). Explicit
    AND/OR in the query text always win."""
    if default_operator not in ("or", "and"):
        raise QueryParseError("default_operator must be 'or' or 'and'")
    if default_fields is None:
        default_fields = schema.field_names
    tokens = _tokenize(q)
    if not tokens:
        return AllQuery()
    return _ast_to_query(
        _Parser(tokens, default_operator).parse_expr(), schema, default_fields
    )


# NQL syntax characters stripped by the lenient fallback: grouping,
# phrases, field separators, boosts, fuzzy/slop, ranges, regex delims
_SYNTAX_CHARS = str.maketrans({c: " " for c in '()[]{}"^~:/\\*?'})


def parse_query_lenient(
    q: str,
    schema: Schema,
    default_fields: list[str] | None = None,
    default_operator: str = "or",
):
    """Never-throw parse for end-user search boxes — the ES
    ``simple_query_string`` contract (its defining property: "does not
    return errors for invalid syntax; instead it ignores any invalid
    parts"). Tries the full NQL grammar first; on ANY QueryParseError
    the query DEGRADES instead of failing: every syntax character is
    stripped and the residue parses as plain words over
    ``default_fields`` (implicit operator, analyzed per field as bare
    terms always are). A query that strips to nothing matches all docs
    (parse_query's empty contract). Use parse_query when errors should
    be loud (APIs, stored percolator subscriptions); use this at the
    user-facing edge."""
    try:
        return parse_query(q, schema, default_fields, default_operator)
    except QueryParseError:
        # drop `field:` prefixes of KNOWN schema fields first, so a
        # degraded `text:"spark join` becomes the words, not the word
        # 'text' plus the words (unknown prefixes stay — they were
        # probably content, like a URL scheme)
        names = [re.escape(fe.name) for fe in schema.fields]
        stripped = q
        if names:
            stripped = re.sub(
                r"(?<![\w.])(?:" + "|".join(names) + r"):", " ", stripped
            )
        stripped = stripped.translate(_SYNTAX_CHARS)
        # drop dangling boolean keywords so "a AND" degrades to "a",
        # not another parse error; lowercase or/and are operators too
        words = [w for w in stripped.split() if w.upper() not in ("AND", "OR")]
        if not words:
            return AllQuery()
        try:
            return parse_query(
                " ".join(words), schema, default_fields, default_operator
            )
        except QueryParseError:
            # sanitized words should always parse; if they somehow do
            # not, match nothing rather than dump the corpus
            return EmptyQuery()
