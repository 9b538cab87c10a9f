"""Multi-term query expansion: prefix and fuzzy queries.

EXTENSION beyond the reference grammar (/root/reference/query/parser.go
has only term/AND/OR): Lucene-style multi-term queries, rewritten at
plan time into a union of concrete TermQuery nodes so they ride the
existing Union/WAND scorers unchanged (scoring = MultiTermsQuery
semantics, i.e. per-doc sum of tf*idf over the matched terms — the same
contract as Q7 field-analyzed multi-term expansion).

Expansion source is the commit-time term dictionary
(``term_stats.parquet``, (field, term)-sorted):

- **prefix** ``text:spar*`` — a *range* read ``term >= p AND term <
  upper(p)``; on the sorted dictionary this prunes to the row groups
  covering the prefix bucket, so the driver-side pyarrow read touches
  dictionary *metadata*, not the corpus — the same access pattern as the
  per-term doc_freq lookup in exec.bind_stats_for_terms. At 10^12-doc
  scale the dictionary is large but the prefix bucket is the only part
  read.
- **fuzzy** ``text:spark~1`` — edit-distance expansion. With
  ``prefix_length >= 1`` (the default, like Elasticsearch's guidance for
  fuzzy at scale) candidates are pruned to the shared-prefix bucket by
  the same range read, then banded Levenshtein filters the bucket.
  ``prefix_length=0`` falls back to a distributed Spark filter over the
  whole dictionary (JVM ``levenshtein`` — one small job, no driver-side
  full-dictionary scan).

Both cap expansion (doc_freq DESC, term ASC — deterministic) like
Lucene's maxClauseCount/maxExpansions, so a degenerate ``a*`` cannot
build a million-clause union.
"""

from __future__ import annotations

import glob
import os

from .parser import (
    BooleanQuery,
    BoostingQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    EmptyQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    NearQuery,
    PhraseQuery,
    PhrasePrefixQuery,
    PrefixQuery,
    RegexpQuery,
    SpanFirstQuery,
    SpanMultiQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    WildcardQuery,
)

# Lucene BooleanQuery.maxClauseCount is 1024; FuzzyQuery maxExpansions 50
DEFAULT_PREFIX_EXPANSIONS = 1024
DEFAULT_FUZZY_EXPANSIONS = 50


def prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string > every string with this prefix: increment the
    last incrementable codepoint and drop the tail. None = unbounded."""
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def levenshtein_within(a: str, b: str, max_dist: int) -> bool:
    """Banded Levenshtein: True iff edit_distance(a, b) <= max_dist.
    O(len * band) — the band keeps the driver-side candidate filter
    linear in the bucket size."""
    if abs(len(a) - len(b)) > max_dist:
        return False
    if a == b:
        return True
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - max_dist)
        hi = min(lb, i + max_dist)
        cur = [max_dist + 1] * (lb + 1)
        if lo == 1:
            cur[0] = i
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo - 1 : hi + 1]) > max_dist:
            return False
        prev = cur
    return prev[lb] <= max_dist


def _stats_files(index_dir: str) -> list[str] | None:
    from .exec import _term_stats_valid
    from ..manifest import load_manifest

    stats_path = os.path.join(index_dir, "term_stats.parquet")
    if not os.path.exists(stats_path):
        return None
    manifest = load_manifest(index_dir)
    if not _term_stats_valid(stats_path, manifest):
        return None
    if os.path.isdir(stats_path):
        return sorted(glob.glob(os.path.join(stats_path, "*.parquet")))
    return [stats_path]


def _range_candidates(
    index_dir: str, field_id: int, lo: str, hi: str | None
) -> list[tuple[str, int]] | None:
    """(term, doc_freq) rows of a dictionary range via pyarrow pushdown;
    None when term_stats is absent/unpaired (caller falls back to a
    Spark aggregation over the postings)."""
    files = _stats_files(index_dir)
    if files is None:
        return None
    import pyarrow.dataset as ds

    expr = (ds.field("field") == field_id) & (ds.field("term") >= lo)
    if hi is not None:
        expr = expr & (ds.field("term") < hi)
    tbl = ds.dataset(files, format="parquet").to_table(
        filter=expr, columns=["term", "doc_freq"]
    )
    return list(
        zip(tbl.column("term").to_pylist(), (int(x) for x in tbl.column("doc_freq").to_pylist()))
    )


def _postings_range_df(spark, index_dir: str, manifest, field_id: int, lo: str, hi):
    """Fallback dictionary view summed from the segment postings."""
    from pyspark.sql import functions as F

    from .exec import read_postings

    df = read_postings(spark, index_dir, manifest).filter(
        (F.col("field") == field_id) & (F.col("term") >= lo)
    )
    if hi is not None:
        df = df.filter(F.col("term") < hi)
    return df.groupBy("term").agg(F.sum("doc_freq").alias("doc_freq"))


def _cap(pairs: list[tuple[str, int]], max_expansions: int | None) -> list[str]:
    """Deterministic expansion cap: doc_freq DESC, term ASC."""
    pairs = sorted(pairs, key=lambda p: (-p[1], p[0]))
    if max_expansions is not None:
        pairs = pairs[:max_expansions]
    return [t for t, _ in pairs]


def _prefix_pairs(
    spark, index_dir: str, manifest, field_id: int, prefix: str
) -> list[tuple[str, int]]:
    """UNCAPPED (term, doc_freq) dictionary candidates for a prefix."""
    hi = prefix_upper_bound(prefix)
    pairs = _range_candidates(index_dir, field_id, prefix, hi)
    if pairs is None:
        rows = _postings_range_df(spark, index_dir, manifest, field_id, prefix, hi).collect()
        pairs = [(r["term"], int(r["doc_freq"])) for r in rows]
    return pairs


def expand_prefix(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    prefix: str,
    max_expansions: int | None = DEFAULT_PREFIX_EXPANSIONS,
) -> list[str]:
    """Terms of ``field_id`` starting with ``prefix`` (capped)."""
    return _cap(
        _prefix_pairs(spark, index_dir, manifest, field_id, prefix), max_expansions
    )


def expand_fuzzy(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    term: str,
    max_dist: int,
    prefix_length: int = 1,
    max_expansions: int | None = DEFAULT_FUZZY_EXPANSIONS,
    transpositions: bool = False,
) -> list[str]:
    """Terms of ``field_id`` within ``max_dist`` edits of ``term`` that
    share its first ``prefix_length`` characters (capped).

    ``transpositions=True`` counts an adjacent-character swap as ONE
    edit (Damerau — Lucene FuzzyQuery's default metric; ours defaults
    off to keep plain-Levenshtein parity with the JVM/DuckDB builtin).
    The distributed ``prefix_length=0`` path stays scalable: the JVM
    pre-filter widens to ``levenshtein <= 2*max_dist`` (a transposition
    costs <=2 plain edits, so Lev <= 2*DL — no candidate within the
    Damerau radius escapes it) and the exact Damerau DP runs driver-side
    over only that collected near-set."""
    return _cap(
        _fuzzy_pairs(
            spark, index_dir, manifest, field_id, term, max_dist,
            prefix_length, transpositions,
        ),
        max_expansions,
    )


def _fuzzy_pairs(
    spark, index_dir: str, manifest, field_id: int, term: str,
    max_dist: int, prefix_length: int, transpositions: bool,
) -> list[tuple[str, int]]:
    """UNCAPPED (term, doc_freq) candidates within the edit radius."""
    prefix_length = min(prefix_length, len(term))
    within = damerau_within if transpositions else levenshtein_within
    if prefix_length > 0:
        p = term[:prefix_length]
        pairs = _range_candidates(index_dir, field_id, p, prefix_upper_bound(p))
        if pairs is None:
            rows = _postings_range_df(
                spark, index_dir, manifest, field_id, p, prefix_upper_bound(p)
            ).collect()
            pairs = [(r["term"], int(r["doc_freq"])) for r in rows]
        return [(t, df) for t, df in pairs if within(t, term, max_dist)]
    # whole-dictionary scan stays distributed: JVM levenshtein with a
    # length-window pre-filter, only the (small) match set collects
    rows = _distributed_near_terms(
        spark, index_dir, manifest, field_id, term, max_dist, transpositions
    )
    return [
        (r["term"], int(r["doc_freq"]))
        for r in rows
        if not transpositions or damerau_within(r["term"], term, max_dist)
    ]


def _distributed_near_terms(
    spark, index_dir: str, manifest, field_id: int, term: str,
    max_dist: int, transpositions: bool,
):
    """Dictionary rows within the edit radius, filtered cluster-side.
    For the Damerau metric the JVM filter is the sound over-approximation
    ``levenshtein <= 2*max_dist`` (Lev <= 2*DL) with the length window at
    the true radius; the caller applies the exact Damerau DP to the
    collected near-set."""
    from pyspark.sql import functions as F

    files = _stats_files(index_dir)
    if files is not None:
        df = spark.read.parquet(*files).filter(F.col("field") == field_id)
    else:
        from .exec import read_postings

        df = (
            read_postings(spark, index_dir, manifest)
            .filter(F.col("field") == field_id)
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"))
        )
    lev_radius = 2 * max_dist if transpositions else max_dist
    return (
        df.filter(
            (F.length("term") >= len(term) - max_dist)
            & (F.length("term") <= len(term) + max_dist)
            & (F.levenshtein(F.col("term"), F.lit(term)) <= lev_radius)
        )
        .select("term", "doc_freq")
        .collect()
    )


def levenshtein_dist(a: str, b: str) -> int:
    """Exact unit-cost Levenshtein distance (matches the JVM/DuckDB
    ``levenshtein`` semantics: insert/delete/substitute, no
    transposition)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def damerau_dist(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein distance (insert/delete/
    substitute/adjacent-transposition, transposed pairs may be edited
    again) — the variant DuckDB's ``damerau_levenshtein`` computes, so
    the oracle gate can mirror it exactly. Lucene's transposition
    automaton implements the *restricted* (OSA) variant; the two differ
    only when a transposition is followed by an edit between the
    transposed pair (e.g. ``ca``→``abc``: 2 here, 3 under OSA) — cases
    that essentially never occur within distance<=2 of real dictionary
    terms. Full DP with the last-occurrence table, O(|a|·|b|)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    inf = la + lb
    # matrix with a sentinel row/col of `inf` (classic Lowrance-Wagner)
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[1][1] = 0
    for i in range(1, la + 1):
        d[i + 1][1] = i
    for j in range(1, lb + 1):
        d[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, la + 1):
        last_col = 0  # last j where b[j-1] == a[i-1]
        for j in range(1, lb + 1):
            i1 = last_row.get(b[j - 1], 0)
            j1 = last_col
            if a[i - 1] == b[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transpose
            )
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


def damerau_within(a: str, b: str, max_dist: int) -> bool:
    """True iff damerau_dist(a, b) <= max_dist. Length pre-check (the
    distance still lower-bounds at the length difference); dictionary
    terms are short so the full DP is the candidate filter."""
    if abs(len(a) - len(b)) > max_dist:
        return False
    return damerau_dist(a, b) <= max_dist


def suggest_terms(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    term: str,
    max_dist: int = 2,
    prefix_length: int = 1,
    transpositions: bool = False,
) -> list[tuple[str, int, int]]:
    """Did-you-mean suggester (Lucene DirectSpellChecker analog —
    EXTENSION, the reference has no suggest API): dictionary terms of
    ``field_id`` within ``max_dist`` edits of ``term``, as
    (term, doc_freq, distance) ranked distance ASC, doc_freq DESC,
    term ASC. The input term itself (distance 0) is included when
    present — callers decide whether an in-dictionary word needs
    correcting.

    ``prefix_length`` > 0 prunes candidates to the shared-prefix
    dictionary range (pyarrow row-group pushdown on the sorted stats
    file — metadata access, not cluster work); 0 scans the whole
    dictionary distributed (JVM levenshtein with a length-window
    pre-filter), collecting only the match set.

    ``transpositions=True`` ranks by the Damerau distance (adjacent swap
    = 1 edit — ``sprak``→``spark`` suggests at distance 1, the behavior
    spell-checkers want for the most common typo class); the distributed
    path widens the JVM pre-filter to ``levenshtein <= 2*max_dist``
    (Lev <= 2*DL) and computes the exact Damerau distance driver-side
    over the collected near-set.
    """
    dist_fn = damerau_dist if transpositions else levenshtein_dist
    within = damerau_within if transpositions else levenshtein_within
    prefix_length = min(prefix_length, len(term))
    if prefix_length > 0:
        p = term[:prefix_length]
        pairs = _range_candidates(index_dir, field_id, p, prefix_upper_bound(p))
        if pairs is None:
            rows = _postings_range_df(
                spark, index_dir, manifest, field_id, p, prefix_upper_bound(p)
            ).collect()
            pairs = [(r["term"], int(r["doc_freq"])) for r in rows]
        out = [
            (t, df, dist_fn(t, term))
            for t, df in pairs
            if within(t, term, max_dist)
        ]
    else:
        rows = _distributed_near_terms(
            spark, index_dir, manifest, field_id, term, max_dist, transpositions
        )
        out = [
            (r["term"], int(r["doc_freq"]), dist_fn(r["term"], term))
            for r in rows
        ]
        out = [x for x in out if x[2] <= max_dist]
    return sorted(out, key=lambda x: (x[2], -x[1], x[0]))


def prefix_edit_dist(term: str, prefix: str, max_dist: int) -> int | None:
    """Edit distance of ``prefix`` to the CLOSEST prefix of ``term``
    (min over L of lev(term[:L], prefix)) when <= ``max_dist``, else
    None — the fuzzy-completion matching relation: the typo lives in
    the query prefix, the completion tail is free. One banded DP over
    prefix x term[:len(prefix)+max_dist]; the answer is the min of the
    last ROW (every possible term-prefix length at once)."""
    t = term[: len(prefix) + max_dist]
    n, m = len(prefix), len(t)
    if n - m > max_dist:
        # term (slice) shorter than prefix by more than the budget
        return None
    big = max_dist + 1
    # row i = edit distance of prefix[:i] to t[:j] for each j
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i if i <= max_dist else big] + [big] * m
        lo = max(1, i - max_dist)
        hi = min(m, i + max_dist)
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (prefix[i - 1] != t[j - 1]),
            )
        if min(cur) > max_dist:
            return None
        prev = cur
    d = min(prev)
    return d if d <= max_dist else None


def complete_terms(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    prefix: str,
    size: int = 10,
    fuzzy: bool = False,
    max_dist: int = 1,
    min_length: int = 3,
    prefix_length: int = 1,
) -> list[tuple[str, int, int]]:
    """Completion suggester (ES ``completion``/search-as-you-type analog
    — EXTENSION, the reference has no suggest API): dictionary terms of
    ``field_id`` COMPLETING ``prefix``, as (term, doc_freq, dist)
    ranked dist ASC, doc_freq DESC, term ASC, cut to ``size``. The
    dictionary has no index-time weights, so popularity (global
    doc_freq) is the ranking signal — the natural analog of the ES
    suggestion ``weight``.

    ``fuzzy=True`` adds the ES fuzzy-completion semantics: a term also
    matches when the prefix is within ``max_dist`` edits of the term's
    OWN prefix (min over term-prefix lengths — the typo lives in the
    query prefix, the completion tail is free), ranked after closer
    matches (the ES 'shares the longest prefix scores higher' rule,
    here as distance-first ranking). Two ES guards, same defaults:
    ``min_length`` — inputs shorter than it complete exactly (a 2-char
    prefix within 1 edit of everything would return half the
    dictionary); ``prefix_length`` — the first chars that must match
    exactly, which is also what keeps the dictionary read a
    metadata-pruned RANGE scan (pyarrow row-group pushdown on the
    sorted stats file) instead of a full-dictionary pass, exactly like
    suggest_terms' banded read. Scale posture: the range read touches
    the shared-prefix bucket only; the Spark fallback (stats absent)
    aggregates the same range from the postings."""
    if not prefix:
        raise ValueError("complete_terms needs a non-empty prefix")
    if fuzzy and (len(prefix) < min_length or max_dist == 0):
        fuzzy = False
    if fuzzy:
        prefix_length = max(1, min(prefix_length, len(prefix)))
        p = prefix[:prefix_length]
        pairs = _range_candidates(index_dir, field_id, p, prefix_upper_bound(p))
        if pairs is None:
            rows = _postings_range_df(
                spark, index_dir, manifest, field_id, p, prefix_upper_bound(p)
            ).collect()
            pairs = [(r["term"], int(r["doc_freq"])) for r in rows]
        out = []
        for t, df in pairs:
            d = prefix_edit_dist(t, prefix, max_dist)
            if d is not None:
                out.append((t, df, d))
    else:
        out = [
            (t, df, 0)
            for t, df in _prefix_pairs(spark, index_dir, manifest, field_id, prefix)
        ]
    out.sort(key=lambda x: (x[2], -x[1], x[0]))
    return out[:size] if size is not None else out


def wildcard_to_regex(pattern: str) -> str:
    """Glob pattern -> regex source: ``*`` = ``.*``, ``?`` = ``.``,
    everything else literal. Alphanumerics pass through unescaped so the
    result is valid in Python, JVM, and RE2 dialects alike."""
    out: list[str] = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch.isalnum():
            out.append(ch)
        else:
            out.append("\\" + ch)
    return "".join(out)


def _regex_literal_prefix(pattern: str) -> str:
    """Longest leading run of the regex that matches only itself —
    conservatively, plain alphanumerics (stop one short before a
    quantifier, which binds the previous atom)."""
    pre: list[str] = []
    for i, ch in enumerate(pattern):
        if not ch.isalnum():
            break
        nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
        if nxt in "*+?{":
            break
        pre.append(ch)
    return "".join(pre)


def _pattern_pairs(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    literal_prefix: str,
    regex: str,
) -> list[tuple[str, int]]:
    """UNCAPPED shared wildcard/regexp candidates: whole-term (anchored)
    regex match over the dictionary. With a literal prefix the candidates
    come from the same range-pruned dictionary read as PrefixQuery and
    the regex filters driver-side; a leading wildcard falls back to ONE
    distributed anchored-regex filter job over the dictionary (JVM
    regex) — only the match set is collected, never the dictionary."""
    import re as _re

    if literal_prefix:
        hi = prefix_upper_bound(literal_prefix)
        pairs = _range_candidates(index_dir, field_id, literal_prefix, hi)
        if pairs is None:
            rows = _postings_range_df(
                spark, index_dir, manifest, field_id, literal_prefix, hi
            ).collect()
            pairs = [(r["term"], int(r["doc_freq"])) for r in rows]
        rx = _re.compile(regex)
        return [(t, df) for t, df in pairs if rx.fullmatch(t)]
    from pyspark.sql import functions as F

    files = _stats_files(index_dir)
    if files is not None:
        df = spark.read.parquet(*files).filter(F.col("field") == field_id)
    else:
        from .exec import read_postings

        df = (
            read_postings(spark, index_dir, manifest)
            .filter(F.col("field") == field_id)
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"))
        )
    rows = (
        df.filter(F.col("term").rlike(f"^(?:{regex})$"))
        .select("term", "doc_freq")
        .collect()
    )
    return [(r["term"], int(r["doc_freq"])) for r in rows]


def _expand_pattern(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    literal_prefix: str,
    regex: str,
    max_expansions: int | None,
) -> list[str]:
    return _cap(
        _pattern_pairs(spark, index_dir, manifest, field_id, literal_prefix, regex),
        max_expansions,
    )


def expand_wildcard(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    pattern: str,
    max_expansions: int | None = DEFAULT_PREFIX_EXPANSIONS,
) -> list[str]:
    """Terms of ``field_id`` matching the glob ``pattern`` (capped)."""
    lit = pattern.split("*", 1)[0].split("?", 1)[0]
    return _expand_pattern(
        spark, index_dir, manifest, field_id, lit,
        wildcard_to_regex(pattern), max_expansions,
    )


def expand_regexp(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    pattern: str,
    max_expansions: int | None = DEFAULT_PREFIX_EXPANSIONS,
) -> list[str]:
    """Terms of ``field_id`` fully matching ``pattern`` (capped)."""
    return _expand_pattern(
        spark, index_dir, manifest, field_id,
        _regex_literal_prefix(pattern), pattern, max_expansions,
    )


def has_multiterm(q) -> bool:
    if isinstance(q, (PrefixQuery, FuzzyQuery, WildcardQuery, RegexpQuery,
                      PhrasePrefixQuery, SpanMultiQuery)):
        return True
    if isinstance(q, SpanFirstQuery):
        return isinstance(q.term, SpanMultiQuery)
    if isinstance(q, SpanNotQuery):
        return isinstance(q.term, SpanMultiQuery) or any(
            isinstance(e, SpanMultiQuery) for e in q.exclude
        )
    if isinstance(q, ConstantScoreQuery):
        return has_multiterm(q.query)
    if isinstance(q, BooleanQuery):
        return any(has_multiterm(sub) for _, sub in q.subqueries)
    if isinstance(q, DisMaxQuery):
        return any(has_multiterm(sub) for sub in q.children)
    if isinstance(q, BoostingQuery):
        return has_multiterm(q.positive) or has_multiterm(q.negative)
    return False


def _union_of(field_id: int, terms: list[str], boost: float = 1.0):
    if not terms:
        return EmptyQuery()
    if len(terms) == 1:
        return TermQuery(field_id, terms[0], boost)
    return BooleanQuery.union(*[TermQuery(field_id, t, boost) for t in terms])


def _resolve_span_multi(q, expand_fn):
    """Resolve SpanMultiQuery nodes inside the span family into plain
    term tuples via ``expand_fn(SpanMultiQuery) -> list[str]`` (the
    single- vs multi-index difference is confined to expand_fn; the
    Lucene SpanOrTermsRewrite shape is shared).

    - standalone SpanMultiQuery -> SpanOrQuery over the expansion
      (compile lowers a single survivor to CTerm); nothing expands ->
      EmptyQuery;
    - span_first / span_not include -> the term-alternatives tuple,
      wrapper and inner boosts folded into the span's boost;
    - span_not exclude entries -> their expansions spliced into the
      exclude union (membership-only); an exclude union that expands to
      NOTHING cannot reject, so the include lowers to its SpanOr form
      (mirroring compile's absent-exclude CTerm lowering)."""
    if isinstance(q, SpanMultiQuery):
        terms = expand_fn(q)
        if not terms:
            return EmptyQuery()
        return SpanOrQuery(
            q.field_id, tuple(terms), q.boost * q.inner.boost
        )
    if isinstance(q, SpanFirstQuery) and isinstance(q.term, SpanMultiQuery):
        mt = q.term
        terms = expand_fn(mt)
        if not terms:
            return EmptyQuery()
        return SpanFirstQuery(
            q.field_id, tuple(terms), q.end,
            q.boost * mt.boost * mt.inner.boost,
        )
    if isinstance(q, SpanNotQuery) and (
        isinstance(q.term, SpanMultiQuery)
        or any(isinstance(e, SpanMultiQuery) for e in q.exclude)
    ):
        term, boost = q.term, q.boost
        if isinstance(term, SpanMultiQuery):
            terms = expand_fn(term)
            if not terms:
                return EmptyQuery()
            boost *= term.boost * term.inner.boost
            term = tuple(terms)
        excl: list[str] = []
        for e in q.exclude:
            if isinstance(e, SpanMultiQuery):
                excl.extend(expand_fn(e))
            else:
                excl.append(e)
        excl = tuple(dict.fromkeys(excl))
        if not excl:
            inc = (term,) if isinstance(term, str) else tuple(term)
            return SpanOrQuery(q.field_id, inc, boost)
        return SpanNotQuery(q.field_id, term, excl, q.pre, q.post, boost)
    return q


def _span_multi_terms(spark, index_dir: str, manifest, mt: SpanMultiQuery):
    """ONE index's capped expansion of a span_multi's inner node —
    identical term set and order to the bare multi-term query's rewrite
    (node_pairs + the deterministic df DESC / term ASC cap)."""
    return _cap(
        sorted(node_pairs(spark, index_dir, manifest, mt.inner)),
        _node_cap(mt.inner),
    )


def rewrite_multiterm(spark, index_dir: str, manifest, q):
    """Replace every Prefix/Fuzzy/Wildcard/RegexpQuery node with its
    expanded term union (MultiTermsQuery shape — WAND-eligible when it
    is the whole query). A node's ``max_expansions=None`` means the
    class default cap (the query-object contract) — uncapped expansion
    is only reachable by calling the ``expand_*`` functions directly.
    Span-family nodes carrying a SpanMultiQuery resolve to their
    SpanOr/term-alternatives forms (see ``_resolve_span_multi``)."""
    if isinstance(q, (SpanMultiQuery, SpanFirstQuery, SpanNotQuery)):
        return _resolve_span_multi(
            q, lambda mt: _span_multi_terms(spark, index_dir, manifest, mt)
        )
    if isinstance(q, PhrasePrefixQuery):
        last = expand_prefix(
            spark, index_dir, manifest, q.field_id, q.prefix,
            q.max_expansions if q.max_expansions is not None else DEFAULT_PREFIX_EXPANSIONS,
        )
        slots = tuple((t,) for t in q.terms) + (tuple(last),)
        return MultiPhraseQuery(q.field_id, slots, q.boost, q.slop)
    if isinstance(q, PrefixQuery):
        terms = expand_prefix(
            spark, index_dir, manifest, q.field_id, q.prefix,
            q.max_expansions if q.max_expansions is not None else DEFAULT_PREFIX_EXPANSIONS,
        )
        return _union_of(q.field_id, terms, q.boost)
    if isinstance(q, FuzzyQuery):
        terms = expand_fuzzy(
            spark,
            index_dir,
            manifest,
            q.field_id,
            q.term,
            q.max_dist,
            q.prefix_length,
            q.max_expansions if q.max_expansions is not None else DEFAULT_FUZZY_EXPANSIONS,
            transpositions=q.transpositions,
        )
        return _union_of(q.field_id, terms, q.boost)
    if isinstance(q, WildcardQuery):
        terms = expand_wildcard(
            spark, index_dir, manifest, q.field_id, q.pattern,
            q.max_expansions if q.max_expansions is not None else DEFAULT_PREFIX_EXPANSIONS,
        )
        return _union_of(q.field_id, terms, q.boost)
    if isinstance(q, RegexpQuery):
        terms = expand_regexp(
            spark, index_dir, manifest, q.field_id, q.pattern,
            q.max_expansions if q.max_expansions is not None else DEFAULT_PREFIX_EXPANSIONS,
        )
        return _union_of(q.field_id, terms, q.boost)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(
            rewrite_multiterm(spark, index_dir, manifest, q.query), q.boost
        )
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            [
                (occ, rewrite_multiterm(spark, index_dir, manifest, sub))
                for occ, sub in q.subqueries
            ],
            min_should=q.min_should,
        )
    if isinstance(q, DisMaxQuery):
        return DisMaxQuery(
            [rewrite_multiterm(spark, index_dir, manifest, sub) for sub in q.children],
            q.tie_breaker,
        )
    if isinstance(q, BoostingQuery):
        return BoostingQuery(
            rewrite_multiterm(spark, index_dir, manifest, q.positive),
            rewrite_multiterm(spark, index_dir, manifest, q.negative),
            q.negative_boost,
        )
    if isinstance(q, (TermQuery, PhraseQuery, MultiPhraseQuery, NearQuery)):
        return q
    return q


def node_pairs(spark, index_dir: str, manifest, q) -> list[tuple[str, int]]:
    """UNCAPPED (term, doc_freq) candidates of ONE multi-term node
    against ONE index's dictionary — the building block the multi-index
    rewrite merges across indexes before applying the cap once."""
    if isinstance(q, PrefixQuery):
        return _prefix_pairs(spark, index_dir, manifest, q.field_id, q.prefix)
    if isinstance(q, FuzzyQuery):
        return _fuzzy_pairs(
            spark, index_dir, manifest, q.field_id, q.term, q.max_dist,
            q.prefix_length, q.transpositions,
        )
    if isinstance(q, WildcardQuery):
        lit = q.pattern.split("*", 1)[0].split("?", 1)[0]
        return _pattern_pairs(
            spark, index_dir, manifest, q.field_id, lit,
            wildcard_to_regex(q.pattern),
        )
    if isinstance(q, RegexpQuery):
        return _pattern_pairs(
            spark, index_dir, manifest, q.field_id,
            _regex_literal_prefix(q.pattern), q.pattern,
        )
    raise TypeError(f"not a multi-term node: {type(q).__name__}")


def _node_cap(q) -> int:
    if q.max_expansions is not None:
        return q.max_expansions
    return (
        DEFAULT_FUZZY_EXPANSIONS
        if isinstance(q, FuzzyQuery)
        else DEFAULT_PREFIX_EXPANSIONS
    )


def rewrite_multiterm_multi(spark, index_dirs, manifests, q):
    """Multi-index multiterm rewrite (Lucene MultiReader semantics): a
    node expands against the UNION dictionary — per-index candidates
    merged with doc_freq summed by term, then the deterministic cap
    (df DESC, term ASC) applied ONCE globally. Expanding per index and
    capping per index would let the same query select different term
    sets on different indexes of the alias, making scores incomparable
    across the union."""
    if isinstance(q, (SpanMultiQuery, SpanFirstQuery, SpanNotQuery)):
        def _alias_terms(mt: SpanMultiQuery) -> list[str]:
            merged: dict[str, int] = {}
            for d, m in zip(index_dirs, manifests):
                for t, df in node_pairs(spark, d, m, mt.inner):
                    merged[t] = merged.get(t, 0) + df
            return _cap(sorted(merged.items()), _node_cap(mt.inner))

        return _resolve_span_multi(q, _alias_terms)
    if isinstance(q, (PrefixQuery, FuzzyQuery, WildcardQuery, RegexpQuery,
                      PhrasePrefixQuery)):
        merged: dict[str, int] = {}
        proxy = (
            PrefixQuery(q.field_id, q.prefix, q.max_expansions)
            if isinstance(q, PhrasePrefixQuery)
            else q
        )
        for d, m in zip(index_dirs, manifests):
            for t, df in node_pairs(spark, d, m, proxy):
                merged[t] = merged.get(t, 0) + df
        terms = _cap(sorted(merged.items()), _node_cap(proxy))
        if isinstance(q, PhrasePrefixQuery):
            return MultiPhraseQuery(
                q.field_id,
                tuple((t,) for t in q.terms) + (tuple(terms),),
                q.boost,
                q.slop,
            )
        return _union_of(q.field_id, terms, q.boost)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            [
                (occ, rewrite_multiterm_multi(spark, index_dirs, manifests, sub))
                for occ, sub in q.subqueries
            ],
            min_should=q.min_should,
        )
    if isinstance(q, DisMaxQuery):
        return DisMaxQuery(
            [
                rewrite_multiterm_multi(spark, index_dirs, manifests, sub)
                for sub in q.children
            ],
            q.tie_breaker,
        )
    return q


def suggest_text(
    spark,
    index_dir: str,
    manifest,
    field_id: int,
    tokens: list[str],
    max_dist: int = 2,
    prefix_length: int = 1,
    transpositions: bool = True,
) -> tuple[list[str], list[tuple[str, str, int]]]:
    """Whole-text spell correction (Elasticsearch phrase-suggester LITE:
    per-word greedy, not candidate-phrase scored — documented contract).

    ``tokens`` are the ALREADY-ANALYZED words of the user's text (use the
    field's analyzer so corrections live in the query's term space). One
    batched stats lookup classifies the words; only OUT-OF-DICTIONARY
    words (df == 0) are corrected, each to its best suggestion
    (distance ASC, doc_freq DESC, term ASC — suggest_terms order); words
    with no suggestion within ``max_dist`` stay as typed.

    Returns (corrected_tokens, corrections) where corrections lists
    (original, replacement, distance) for words actually changed.
    """
    from .exec import bind_stats_for_terms  # local: exec imports expand
    from .parser import TermQuery

    uniq = list(dict.fromkeys(tokens))
    dfs, _, _ = bind_stats_for_terms(
        spark, index_dir, manifest, [TermQuery(field_id, t) for t in uniq]
    )
    fixes: dict[str, tuple[str, int]] = {}
    for t in uniq:
        if dfs.get((field_id, t), 0) > 0:
            continue
        cands = suggest_terms(
            spark, index_dir, manifest, field_id, t,
            max_dist=max_dist, prefix_length=prefix_length,
            transpositions=transpositions,
        )
        cands = [c for c in cands if c[2] > 0]
        if cands:
            fixes[t] = (cands[0][0], cands[0][2])
    corrected = [fixes.get(t, (t, 0))[0] for t in tokens]
    corrections = [
        (t, fixes[t][0], fixes[t][1]) for t in dict.fromkeys(tokens) if t in fixes
    ]
    return corrected, corrections


def terms_enum(
    spark,
    index_dir: str,
    field_name: str,
    prefix: str = "",
    size: int = 10,
    search_after: str | None = None,
    case_insensitive: bool = False,
    manifest=None,
) -> list[tuple[str, int]]:
    """Term-dictionary enumeration — the Elasticsearch ``_terms_enum``
    API analog (EXTENSION; the reference exposes no dictionary API):
    up to ``size`` indexed terms of a TEXT field starting with
    ``prefix``, in term order (the ES sort), each with its global
    doc_freq (richer than ES, which returns bare strings — the count
    is free on our dictionary). ``search_after`` pages strictly after
    a term at page-1 cost (the ES param). ``case_insensitive=True``
    lowercases the prefix before the range read — exact ES semantics
    for lowercasing analyzers (ours all lowercase; a hypothetical
    case-preserving analyzer would need a dictionary scan, rejected
    loudly rather than silently wrong).

    ES caveat shared verbatim: the dictionary is commit-time state, so
    terms whose only docs are TOMBSTONED still enumerate until a purge
    rewrites the segments (the documented ES deleted-docs behavior).

    Scale posture: a pyarrow range read on the (field, term)-sorted
    stats file — row-group pushdown makes this dictionary *metadata*
    access (same path as prefix-query expansion), never a corpus scan;
    the postings fallback (stats file absent) is one small distributed
    aggregation over the pruned term range. Results are
    ``size``-bounded driver lists, the ES response shape.
    """
    from ..manifest import load_manifest

    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field_name)
    if fe is None:
        raise ValueError(
            f"unknown field {field_name!r} "
            f"({[f.name for f in manifest.schema.fields]})"
        )
    from ..schema import FIELD_TYPE_TEXT

    if fe.field_type != FIELD_TYPE_TEXT:
        raise ValueError(
            f"terms_enum wants a text field, {field_name!r} is "
            f"{fe.field_type} (doc-value fields have no term dictionary)"
        )
    if case_insensitive:
        if prefix != prefix.lower():
            prefix = prefix.lower()
    lo, hi = prefix, prefix_upper_bound(prefix) if prefix else None
    if search_after is not None and search_after >= lo:
        # strictly after: smallest string > search_after
        lo = search_after + "\x00"
    files = _stats_files(index_dir)
    if files is None:
        df = _postings_range_df(spark, index_dir, manifest, fe.id, lo, hi)
        # term-order page: the cut happens before collect
        rows = df.orderBy("term").limit(size).collect()
        return [(r["term"], int(r["doc_freq"])) for r in rows]
    # early-stopping batch scan: files (range-partitioned) and rows
    # within them arrive (field, term)-sorted, so the first `size`
    # surviving rows ARE the page — an empty prefix never drags the
    # whole dictionary through the driver
    import pyarrow.dataset as ds

    expr = (ds.field("field") == fe.id) & (ds.field("term") >= lo)
    if hi is not None:
        expr = expr & (ds.field("term") < hi)
    out: list[tuple[str, int]] = []
    # use_threads=False pins sequential file-order scanning: the early
    # exit below is only correct if batches arrive in (field, term) file
    # order across a MULTI-file stats dir (part files are named in
    # repartitionByRange key order, so filename sort == term order);
    # threaded scans may interleave files and break the ordering.
    scanner = ds.dataset(files, format="parquet").scanner(
        filter=expr, columns=["term", "doc_freq"], batch_size=8192,
        use_threads=False,
    )
    for batch in scanner.to_batches():
        terms = batch.column("term").to_pylist()
        dfs = batch.column("doc_freq").to_pylist()
        out.extend(zip(terms, (int(x) for x in dfs)))
        if len(out) >= size:
            break
    return out[:size]
