"""Snippet highlighting over stored fields.

Completes the retrieval story the reference stubs out (StoreWriter,
/root/reference/internal/store/writer.go:21-33): fields indexed with
``store=True`` keep their raw value in the docmap, and ``highlight``
turns a query's top-k hits into human-readable snippets with the
matched terms marked.

Execution shape: the CLUSTER does the ranking (normal ``search`` — k
rows leave the executors); snippet assembly is driver-side Python over
exactly those k stored values — presentation work on O(k) strings, not
a data-plane job. Char offsets come from re-tokenizing the stored text
with the same word-break pattern the analyzer uses, then matching each
token's ANALYZED form against the query's terms, so stemming/stopword
analyzers highlight correctly (e.g. query ``searching`` marks
``searched``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .analysis import get_analyzer
from .manifest import load_manifest
from .query.exec import attach_docmap, search
from .query.parser import parse_query
from .query.plan import collect_terms

# the analyzer splits on `[^\p{L}\p{N}]+`; the complement enumerated with
# char spans. Python's re lacks \p classes — [\w] minus '_' plus unicode
# matches the tokenizer's letter/number classes for practical text.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


@dataclass
class Snippet:
    doc_key: dict  # identity columns of the hit
    score: float
    text: str  # window with matches wrapped in marker strings
    n_matches: int  # matched tokens in the FULL stored value


def _window_snippet(
    raw: str,
    match_terms: set[str],
    analyzer,
    window_tokens: int,
    mark: tuple[str, str],
) -> tuple[str, int]:
    tokens = list(_TOKEN_RE.finditer(raw))
    hit_idx = []
    for i, m in enumerate(tokens):
        analyzed = analyzer.analyze_one(m.group())
        if analyzed and analyzed[0] in match_terms:
            hit_idx.append(i)
    if not hit_idx:
        head = tokens[: 2 * window_tokens + 1]
        end = head[-1].end() if head else 0
        return raw[:end], 0
    center = hit_idx[0]
    lo = max(0, center - window_tokens)
    hi = min(len(tokens) - 1, center + window_tokens)
    start, end = tokens[lo].start(), tokens[hi].end()
    out = []
    cursor = start
    for i in range(lo, hi + 1):
        m = tokens[i]
        out.append(raw[cursor : m.start()])
        if i in set(h for h in hit_idx if lo <= h <= hi):
            out.append(mark[0] + m.group() + mark[1])
        else:
            out.append(m.group())
        cursor = m.end()
    prefix = "… " if lo > 0 else ""
    suffix = " …" if hi < len(tokens) - 1 else ""
    return prefix + "".join(out) + suffix, len(hit_idx)


def _check_stored(manifest, field: str):
    fe = manifest.schema.field_by_name(field)
    if fe is None:
        raise ValueError(f"unknown field {field!r}")
    if not fe.store:
        raise ValueError(
            f"field {field!r} was indexed without store=True — rebuild with "
            f"Schema.add_text_field({field!r}, ..., store=True) to highlight"
        )
    return fe


def _resolved_logical(spark, index_dir, manifest, query, default_fields):
    """Parse, then expand multi-term nodes (prefix/fuzzy/wildcard/regexp)
    against the dictionary BEFORE collecting match terms — otherwise a
    ``content:spar*`` highlight ranks correctly but marks nothing (the
    pattern node carries no terms). search() accepts the already-expanded
    tree unchanged, so expansion happens once."""
    from .query.expand import has_multiterm, rewrite_multiterm

    logical = (
        parse_query(query, manifest.schema, default_fields)
        if isinstance(query, str)
        else query
    )
    if has_multiterm(logical):
        logical = rewrite_multiterm(spark, index_dir, manifest, logical)
    return logical


def highlight_df(
    spark,
    index_dir: str,
    query,
    field: str,
    limit: int | None = None,
    scorer: str = "bm25",
    window_tokens: int = 8,
    mark: tuple[str, str] = ("**", "**"),
    default_fields: list[str] | None = None,
):
    """DISTRIBUTED snippet assembly: returns a DataFrame of
    (identity columns..., score, snippet, n_matches) — one row per hit.

    ``highlight`` (below) is the search-UX path: the driver assembles
    snippets for the top-k stored values it was going to collect anyway.
    An export-ALL-matches job (limit=None) must not funnel every stored
    document body through the driver — here the same analyzer + window
    logic runs as an Arrow-batched UDF over the hits where they already
    live, so snippet assembly scales with executors and the result can go
    straight to a parquet sink. Row-identical snippet/score/n_matches to
    the driver path (regression-tested)."""
    manifest = load_manifest(index_dir)
    fe = _check_stored(manifest, field)
    logical = _resolved_logical(
        spark, index_dir, manifest, query, default_fields
    )
    match_terms = {t.term for t in collect_terms(logical) if t.field_id == fe.id}
    analyzer_name = fe.analyzer

    res, _ = search(
        spark, index_dir, logical, limit=limit, scorer=scorer, manifest=manifest
    )
    attached = attach_docmap(spark, index_dir, res, manifest=manifest)
    stored_fields = {f.name for f in manifest.schema.fields if f.store}
    drop_cols = [
        c
        for c in attached.columns
        if c in (stored_fields | {"content_sha256"}) and c != field
    ]
    slim = attached.drop(*drop_cols)

    out_fields = [f for f in slim.schema.fields if f.name != field]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + ", snippet string, n_matches long"
    keep = [f.name for f in out_fields]
    wt, mk = window_tokens, mark

    # resolve on the driver and close over the OBJECT — a custom
    # analyzer (SynonymFilter chain) is not in the executor's registry
    analyzer_obj = get_analyzer(analyzer_name)

    def fn(it):
        analyzer = analyzer_obj
        for pdf in it:
            snips, ns = [], []
            for raw in pdf[field]:
                s, n = _window_snippet(
                    raw if isinstance(raw, str) else "", match_terms, analyzer, wt, mk
                )
                snips.append(s)
                ns.append(n)
            out = pdf[keep].copy()
            out["snippet"] = snips
            out["n_matches"] = ns
            yield out

    return slim.mapInPandas(fn, out_schema)


def highlight(
    spark,
    index_dir: str,
    query,
    field: str,
    limit: int = 10,
    scorer: str = "bm25",
    window_tokens: int = 8,
    mark: tuple[str, str] = ("**", "**"),
    default_fields: list[str] | None = None,
):
    """Top-``limit`` hits as Snippets over stored field ``field``.

    Requires the field to have been indexed with ``store=True`` (raises
    with an actionable message otherwise). Matched terms are the query's
    analyzed terms (phrase constituents included)."""
    manifest = load_manifest(index_dir)
    fe = _check_stored(manifest, field)
    logical = _resolved_logical(
        spark, index_dir, manifest, query, default_fields
    )
    match_terms = {t.term for t in collect_terms(logical) if t.field_id == fe.id}
    analyzer = get_analyzer(fe.analyzer)

    res, _ = search(
        spark, index_dir, logical, limit=limit, scorer=scorer, manifest=manifest
    )
    rows = attach_docmap(spark, index_dir, res, manifest=manifest).collect()
    rows.sort(key=lambda r: (-r["score"], r["segment_ord"], r["doc"]))
    # doc_key should hold IDENTITY columns only — exclude every stored
    # field's raw value (not just the highlighted one), else each Snippet
    # carries full document bodies for all other store=True fields.
    stored_fields = {f.name for f in manifest.schema.fields if f.store}
    id_like = [
        c
        for c in (rows[0].asDict().keys() if rows else [])
        if c not in ("segment_id", "segment_ord", "doc", "score", "content_sha256")
        and c not in stored_fields
    ]
    out = []
    for r in rows:
        text, n = _window_snippet(
            r[field] or "", match_terms, analyzer, window_tokens, mark
        )
        out.append(
            Snippet(
                doc_key={c: r[c] for c in id_like},
                score=float(r["score"]),
                text=text,
                n_matches=n,
            )
        )
    return out
