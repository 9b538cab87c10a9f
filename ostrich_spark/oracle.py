"""Single-process reference-semantics oracle.

Reimplements ostrich's observable search semantics (analysis -> postings
-> TF-IDF scoring -> boolean combinators) in plain Python dicts/floats,
independent of the Spark engine's numpy execution. Used by pytest as the
rank-identity contract (SURVEY.md §5.2):

- TF-IDF formula: /root/reference/query/tfidf_weight.go:9-18
- union score = sum of matching children's scores in child order
  (/root/reference/query/union_scorer.go:14-94)
- intersection: children in SizeHint-ascending order (stable on ties),
  scores summed in that order (/root/reference/query/intersection_scorer.go:16-77)
- must/should: must score + should score when present
  (/root/reference/query/must_should_scorer.go:27-58)

The same evaluator doubles as the brute-force BM25 oracle (the engine's
production scorer, which the reference lacks — README.md:20).

Floating-point parity: both oracle and engine evaluate the identical
expression trees over IEEE float64 in the identical order, so scores are
bit-equal, not merely close.
"""

from __future__ import annotations

from .analysis import get_analyzer
from .query.parser import (
    AllQuery,
    BlendedTermQuery,
    BooleanQuery,
    BoostingQuery,
    CombinedTermQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    EmptyQuery,
    PhraseQuery,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanMultiQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanWithinQuery,
    TermQuery,
    parse_query,
    MUST,
    MUST_NOT,
    SHOULD,
)
from .query.plan import B, K1, SCORER_BM25, SCORER_TFIDF, bm25_idf, tfidf_idf
from .schema import Schema


class OracleIndex:
    """docs: list of dicts field_name -> str (in global docID order)."""

    def __init__(self, schema: Schema, docs: list[dict]):
        self.schema = schema
        self.docs = docs
        self.n_docs = len(docs)
        # (field_id, term) -> {doc: tf}
        self.postings: dict[tuple[int, str], dict[int, int]] = {}
        # (field_id, term) -> {doc: [positions]} (phrase support)
        self.positions: dict[tuple[int, str], dict[int, list[int]]] = {}
        # (doc, field_id) -> token count
        self.doc_len: dict[tuple[int, int], int] = {}
        self.field_tokens: dict[int, int] = {}
        for doc_id, doc in enumerate(docs):
            for fe in schema.fields:
                value = doc.get(fe.name, "")
                values = value if isinstance(value, list) else [value]
                tokens: list[str] = []
                for v in values:  # multi-valued: streams concatenated
                    tokens.extend(get_analyzer(fe.analyzer).analyze_one(v))
                self.doc_len[(doc_id, fe.id)] = len(tokens)
                self.field_tokens[fe.id] = self.field_tokens.get(fe.id, 0) + len(tokens)
                for pos, t in enumerate(tokens):
                    self.postings.setdefault((fe.id, t), {})
                    self.postings[(fe.id, t)][doc_id] = (
                        self.postings[(fe.id, t)].get(doc_id, 0) + 1
                    )
                    self.positions.setdefault((fe.id, t), {}).setdefault(
                        doc_id, []
                    ).append(pos)

    def doc_freq(self, field_id: int, term: str) -> int:
        return len(self.postings.get((field_id, term), {}))

    def avgdl(self, field_id: int) -> float:
        return float(self.field_tokens.get(field_id, 0)) / float(self.n_docs) if self.n_docs else 1.0

    def _expand_multi(self, inner) -> list[str]:
        """Capped dictionary expansion of a multi-term node over THIS
        oracle's postings — independent enumeration of the field's
        terms, but the SAME deterministic cap (expand._cap: df DESC,
        term ASC) and per-type default caps as the engine."""
        import re

        from .query.expand import (
            _cap,
            _node_cap,
            damerau_within,
            levenshtein_within,
            wildcard_to_regex,
        )
        from .query.parser import FuzzyQuery, PrefixQuery, RegexpQuery, WildcardQuery

        cand = sorted({t for (f, t) in self.postings if f == inner.field_id})
        if isinstance(inner, PrefixQuery):
            v = inner.prefix.lower()
            hits = [t for t in cand if t.startswith(v)]
        elif isinstance(inner, FuzzyQuery):
            v = inner.term.lower()
            pre = v[: inner.prefix_length]
            within = damerau_within if inner.transpositions else levenshtein_within
            hits = [
                t for t in cand
                if t.startswith(pre) and within(t, v, inner.max_dist)
            ]
        elif isinstance(inner, WildcardQuery):
            rx = re.compile(wildcard_to_regex(inner.pattern.lower()))
            hits = [t for t in cand if rx.fullmatch(t)]
        elif isinstance(inner, RegexpQuery):
            rx = re.compile(inner.pattern.lower())
            hits = [t for t in cand if rx.fullmatch(t)]
        else:  # pragma: no cover - parser validation forbids this
            raise TypeError(type(inner).__name__)
        pairs = [(t, self.doc_freq(inner.field_id, t)) for t in hits]
        return _cap(pairs, _node_cap(inner))

    def _span_scores(
        self, tf_u: dict[int, int], idf: float, field_id: int, scorer: str
    ) -> dict[int, float]:
        out = {}
        avgdl = self.avgdl(field_id)
        for d, tf in tf_u.items():
            tff = float(tf)
            if scorer == SCORER_TFIDF:
                out[d] = tff * idf
            else:
                dl = float(self.doc_len[(d, field_id)])
                out[d] = idf * (tff * (K1 + 1.0)) / (
                    tff + K1 * (1.0 - B + B * dl / avgdl)
                )
        return out

    # -- evaluation -> {doc: score} ------------------------------------

    def _eval(self, q, scorer: str) -> dict[int, float]:
        if isinstance(q, EmptyQuery):
            return {}
        if isinstance(q, AllQuery):
            return {d: 1.0 for d in range(self.n_docs)}
        if isinstance(q, TermQuery):
            plist = self.postings.get((q.field_id, q.term))
            if not plist:
                return {}
            df = len(plist)
            if scorer == SCORER_TFIDF:
                idf = tfidf_idf(self.n_docs, df)
                return {d: float(tf) * idf for d, tf in plist.items()}
            idf = bm25_idf(self.n_docs, df)
            avgdl = self.avgdl(q.field_id)
            out = {}
            for d, tf in plist.items():
                dl = float(self.doc_len[(d, q.field_id)])
                tff = float(tf)
                out[d] = idf * (tff * (K1 + 1.0)) / (
                    tff + K1 * (1.0 - B + B * dl / avgdl)
                )
            return out
        if isinstance(q, PhraseQuery):
            # Lucene convention (mirrored in plan.CPhrase): idf = sum of
            # constituent idfs IN TERM ORDER, tf = phrase occurrence count
            plists = [self.positions.get((q.field_id, t)) for t in q.terms]
            if any(p is None for p in plists):
                return {}
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            idf_sum = 0.0
            for t in q.terms:
                idf_sum += idf_fn(self.n_docs, self.doc_freq(q.field_id, t))
            cand = set(plists[0].keys())
            for p in plists[1:]:
                cand &= p.keys()
            out = {}
            avgdl = self.avgdl(q.field_id)
            for d in cand:
                starts = [
                    p
                    for p in plists[0][d]
                    if all(p + i in set(plists[i][d]) for i in range(1, len(plists)))
                ]
                if not starts:
                    continue
                tff = float(len(starts))
                if scorer == SCORER_TFIDF:
                    out[d] = tff * idf_sum
                else:
                    dl = float(self.doc_len[(d, q.field_id)])
                    out[d] = idf_sum * (tff * (K1 + 1.0)) / (
                        tff + K1 * (1.0 - B + B * dl / avgdl)
                    )
            return out
        if isinstance(q, ConstantScoreQuery):
            # membership only; inner scores discarded
            return {d: q.boost for d in self._eval(q.query, scorer)}
        if isinstance(q, SpanOrQuery):
            # tf = TOTAL occurrences of any clause term; idf = sum of
            # the PRESENT clauses' idfs (lowering-order parity: dedupe
            # preserving first occurrence, absent terms dropped)
            kept = [
                t for t in dict.fromkeys(q.terms)
                if self.doc_freq(q.field_id, t) > 0
            ]
            if not kept:
                return {}
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            idf = sum(
                idf_fn(self.n_docs, self.doc_freq(q.field_id, t)) for t in kept
            ) * q.boost
            tf_u: dict[int, float] = {}
            for t in kept:  # term order, matching the engine's scatter
                for d, tf in self.postings[(q.field_id, t)].items():
                    tf_u[d] = tf_u.get(d, 0.0) + float(tf)
            out = {}
            avgdl = self.avgdl(q.field_id)
            for d, tff in tf_u.items():
                if scorer == SCORER_TFIDF:
                    out[d] = tff * idf
                else:
                    dl = float(self.doc_len[(d, q.field_id)])
                    out[d] = idf * (tff * (K1 + 1.0)) / (
                        tff + K1 * (1.0 - B + B * dl / avgdl)
                    )
            return out
        if isinstance(q, SpanMultiQuery):
            # standalone span_multi rewrites to SpanOrQuery over the
            # capped dictionary expansion (Lucene SpanOrTermsRewrite) —
            # same order and caps as expand._cap (df DESC, term ASC)
            terms = self._expand_multi(q.inner)
            if not terms:
                return {}
            return self._eval(
                SpanOrQuery(q.field_id, tuple(terms), q.boost * q.inner.boost),
                scorer,
            )
        if isinstance(q, SpanFirstQuery):
            # occurrences of ANY include alternative at positions < end;
            # idf = sum of the PRESENT alternatives' idfs in operand
            # order (a SpanMultiQuery operand expands first, boosts fold
            # multiplicatively — expand._resolve_span_multi parity)
            boost = q.boost
            term = q.term
            if isinstance(term, SpanMultiQuery):
                terms = self._expand_multi(term.inner)
                if not terms:
                    return {}
                boost *= term.boost * term.inner.boost
                term = tuple(terms)
            inc = (term,) if isinstance(term, str) else term
            kept = [t for t in inc if self.doc_freq(q.field_id, t) > 0]
            if not kept:
                return {}
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            idf = sum(
                idf_fn(self.n_docs, self.doc_freq(q.field_id, t)) for t in kept
            ) * boost
            tf_u: dict[int, int] = {}
            for t in kept:
                for d, poss in self.positions[(q.field_id, t)].items():
                    c = sum(1 for p in poss if p < q.end)
                    if c:
                        tf_u[d] = tf_u.get(d, 0) + c
            return self._span_scores(tf_u, idf, q.field_id, scorer)
        if isinstance(q, SpanNotQuery):
            # include occurrences (any alternative) at p survive iff no
            # exclude occurrence q' has p - pre <= q' <= p + post; idf =
            # sum of the present include alternatives' idfs; exclude
            # entries carry no stats (SpanMultiQuery excludes expand
            # into the union, membership-only)
            boost = q.boost
            term = q.term
            if isinstance(term, SpanMultiQuery):
                terms = self._expand_multi(term.inner)
                if not terms:
                    return {}
                boost *= term.boost * term.inner.boost
                term = tuple(terms)
            inc = (term,) if isinstance(term, str) else term
            kept = [t for t in inc if self.doc_freq(q.field_id, t) > 0]
            if not kept:
                return {}
            excl_terms: list[str] = []
            for e in q.exclude:
                if isinstance(e, SpanMultiQuery):
                    excl_terms.extend(self._expand_multi(e.inner))
                else:
                    excl_terms.append(e)
            excl_terms = list(dict.fromkeys(excl_terms))
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            idf = sum(
                idf_fn(self.n_docs, self.doc_freq(q.field_id, t)) for t in kept
            ) * boost
            expos: dict[int, list[int]] = {}
            for t in excl_terms:
                for d, poss in self.positions.get((q.field_id, t), {}).items():
                    expos.setdefault(d, []).extend(poss)
            tf_u: dict[int, int] = {}
            for t in kept:
                for d, poss in self.positions[(q.field_id, t)].items():
                    bad = expos.get(d, ())
                    c = sum(
                        1 for p in poss
                        if not any(p - q.pre <= x <= p + q.post for x in bad)
                    )
                    if c:
                        tf_u[d] = tf_u.get(d, 0) + c
            return self._span_scores(tf_u, idf, q.field_id, scorer)
        if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
            # fixed-width exact spans: big [s, s+kb-1] holds a little
            # span iff a little start lies in [s, s+kb-kl]; containing
            # emits big spans, within emits covered little spans; idf =
            # sum over big+little terms in that order (both sides)
            kb, kl = len(q.big), len(q.little)
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            idf_sum = 0.0
            for t in q.big + q.little:
                df = self.doc_freq(q.field_id, t)
                if df == 0:
                    return {}
                idf_sum += idf_fn(self.n_docs, df)
            if kb < kl:
                return {}
            idf_sum *= q.boost

            def chain_starts(terms, d):
                p0 = self.positions.get((q.field_id, terms[0]), {}).get(d, [])
                return [
                    s for s in p0
                    if all(
                        s + i in set(
                            self.positions.get((q.field_id, terms[i]), {}).get(d, [])
                        )
                        for i in range(1, len(terms))
                    )
                ]

            cand = set(self.postings.get((q.field_id, q.big[0]), {}))
            out = {}
            avgdl = self.avgdl(q.field_id)
            emit_big = isinstance(q, SpanContainingQuery)
            for d in cand:
                bs = chain_starts(q.big, d)
                ls = chain_starts(q.little, d)
                if not bs or not ls:
                    continue
                if emit_big:
                    tf = sum(1 for s in bs if any(s <= x <= s + kb - kl for x in ls))
                else:
                    tf = sum(1 for x in ls if any(s <= x <= s + kb - kl for s in bs))
                if not tf:
                    continue
                tff = float(tf)
                if scorer == SCORER_TFIDF:
                    out[d] = tff * idf_sum
                else:
                    dl = float(self.doc_len[(d, q.field_id)])
                    out[d] = idf_sum * (tff * (K1 + 1.0)) / (
                        tff + K1 * (1.0 - B + B * dl / avgdl)
                    )
            return out
        if isinstance(q, CombinedTermQuery):
            # BM25F pseudo-field: tf = weighted per-field tf sum (fields
            # order), dl = weighted length sum of EVERY listed field,
            # df = max over fields clipped to N, avgdl = weighted sum
            per_field = [
                self.doc_freq(fid, q.term) for fid, _ in q.fields
            ]
            if not any(per_field):
                return {}
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            df = min(self.n_docs, max(per_field))
            idf = idf_fn(self.n_docs, df) * q.boost
            avgdl = sum(w * self.avgdl(fid) for fid, w in q.fields)
            tf_u: dict[int, float] = {}
            for fid, w in q.fields:
                for d, tf in self.postings.get((fid, q.term), {}).items():
                    tf_u[d] = tf_u.get(d, 0.0) + float(w) * float(tf)
            out = {}
            for d, tff in tf_u.items():
                if scorer == SCORER_TFIDF:
                    out[d] = tff * idf
                else:
                    dl = sum(
                        w * float(self.doc_len.get((d, fid), 0))
                        for fid, w in q.fields
                    )
                    out[d] = idf * (tff * (K1 + 1.0)) / (
                        tff + K1 * (1.0 - B + B * dl / avgdl)
                    )
            return out
        if isinstance(q, DisMaxQuery):
            kids = [self._eval(c, scorer) for c in q.children]
            out: dict[int, float] = {}
            for d in set().union(*[set(k) for k in kids]) if kids else set():
                ss = [k[d] for k in kids if d in k]
                out[d] = max(ss) + q.tie_breaker * (sum(ss) - max(ss))
            return out
        if isinstance(q, BoostingQuery):
            # ES boosting: membership = positive's; negative-matching
            # docs keep membership at score * negative_boost
            base = self._eval(q.positive, scorer)
            neg = self._eval(q.negative, scorer)
            return {
                d: (s * q.negative_boost if d in neg else s)
                for d, s in base.items()
            }
        if isinstance(q, BlendedTermQuery):
            # Lucene BlendedTermQuery: per-field leaves score with the
            # GROUP-MAX df's idf (own tf/length/boost), dismax-combined
            idf_fn = tfidf_idf if scorer == SCORER_TFIDF else bm25_idf
            bdf = max(self.doc_freq(f, t) for f, t, _ in q.pairs)
            if bdf == 0:
                return {}
            bidf = idf_fn(self.n_docs, bdf)
            kids = []
            for fid, term, fb in q.pairs:
                plist = self.postings.get((fid, term))
                if not plist:
                    continue
                idf = bidf * fb * q.boost
                if scorer == SCORER_TFIDF:
                    kids.append({d: float(tf) * idf for d, tf in plist.items()})
                else:
                    avgdl = self.avgdl(fid)
                    kids.append({
                        d: idf * (float(tf) * (K1 + 1.0)) / (
                            float(tf) + K1 * (
                                1.0 - B
                                + B * float(self.doc_len[(d, fid)]) / avgdl
                            )
                        )
                        for d, tf in plist.items()
                    })
            out = {}
            for d in set().union(*[set(k) for k in kids]) if kids else set():
                ss = [k[d] for k in kids if d in k]
                out[d] = max(ss) + q.tie_breaker * (sum(ss) - max(ss))
            return out
        if isinstance(q, BooleanQuery):
            musts = [self._eval(s, scorer) for o, s in q.subqueries if o == MUST]
            shoulds_q = [s for o, s in q.subqueries if o == SHOULD]
            shoulds = [self._eval(s, scorer) for s in shoulds_q]
            shoulds = [s for s in shoulds if s] if len(q.subqueries) > 1 else shoulds
            nots = [self._eval(s, scorer) for o, s in q.subqueries if o == MUST_NOT]

            must_res = None
            if musts:
                # smallest-first, stable: matches the engine's ordering
                order = sorted(range(len(musts)), key=lambda i: (len(musts[i]), i))
                common = set(musts[order[0]].keys())
                for i in order[1:]:
                    common &= musts[i].keys()
                must_res = {}
                for d in common:
                    s = 0.0
                    for i in order:
                        s += musts[i][d]
                    must_res[d] = s
            should_res = None
            if shoulds:
                should_res = {}
                for child in shoulds:  # child order
                    for d, s in child.items():
                        should_res[d] = should_res.get(d, 0.0) + s
            if must_res is not None and should_res is not None:
                base = {d: s + should_res.get(d, 0.0) for d, s in must_res.items()}
            elif must_res is not None:
                base = must_res
            elif should_res is not None:
                base = should_res
            else:
                return {}  # pure-negative: no positive clause
            if nots:
                excluded = set()
                for n in nots:
                    excluded |= n.keys()
                base = {d: s for d, s in base.items() if d not in excluded}
            return base
        raise TypeError(q)

    def search(
        self,
        query,
        limit: int | None = 10,
        offset: int = 0,
        scorer: str = SCORER_TFIDF,
        default_fields: list[str] | None = None,
    ) -> list[tuple[int, float]]:
        """-> [(doc_id, score)] by (score desc, doc asc), offset/limit applied."""
        logical = (
            parse_query(query, self.schema, default_fields)
            if isinstance(query, str)
            else query
        )
        res = self._eval(logical, scorer)
        ranked = sorted(res.items(), key=lambda kv: (-kv[1], kv[0]))
        if limit is None:
            return ranked[offset:]
        return ranked[offset : offset + limit]

    def count(self, query, default_fields: list[str] | None = None) -> int:
        logical = (
            parse_query(query, self.schema, default_fields)
            if isinstance(query, str)
            else query
        )
        return len(self._eval(logical, SCORER_TFIDF))
