"""Multi-index (alias) search — Lucene MultiReader / Elasticsearch
index-alias analog. EXTENSION: the reference searches one index
(/root/reference/reader/search.go:21-66); at 10^12-doc scale a corpus is
operated as MANY indexes (per day / per domain / per ingest wave —
rolling retention drops whole indexes instead of running giant purges),
and queries fan out over an alias of them.

Correctness contract: ``search_multi`` over indexes A, B, ... is
score-identical to ``search`` over ONE index built from the union of
their documents. That requires exactly two things beyond fan-out:

- **Global stats binding.** idf depends on (doc_freq, N) and BM25 also
  on avgdl. Binding per index would score the same (term, tf, field
  length) differently on different indexes of the alias, making the
  merged ranking meaningless. Here doc_freq is summed per term across
  indexes, N is the summed doc count, and avgdl is recomputed from the
  summed token/doc totals — then injected into each per-index search
  via ``stats_override`` (the per-index stats lookups are driver-side
  term-dict reads, so the alias adds no cluster work to binding).
- **Global multi-term expansion.** Prefix/fuzzy/wildcard/regexp nodes
  expand against the UNION dictionary with the deterministic cap
  (df DESC, term ASC) applied once (``rewrite_multiterm_multi``) —
  per-index caps could select different term sets per index.

Execution shape: per-index search DataFrames (each the existing
per-segment applyInPandas scoring — every path: WAND, tombstone
cogroup, range aux, AllQuery) are lazily unioned with an ``index_ord``
column; one global TakeOrderedAndProject applies the pinned total order
(score desc, index_ord, segment_ord, doc) and the limit. One Spark job
for the whole alias; per-index top-k (limit+offset) bounds what crosses
the union.
"""

from __future__ import annotations

from ..manifest import Manifest, load_manifest
from .exec import SCORER_TFIDF, attach_docmap, bind_stats_for_terms, search
from .parser import parse_query
from .plan import collect_terms


def _scoring_signature(schema):
    # store=True only affects retrieval, never scoring — indexes of an
    # alias may differ on it
    return [
        (f.id, f.name, f.field_type, f.analyzer, f.positions)
        for f in schema.fields
    ]


def bind_stats_multi(spark, index_dirs, manifests, logical):
    """Alias-global (doc_freqs, total_docs, field_avgdl): doc_freq summed
    per (field, term), N summed, avgdl from summed token/doc totals —
    the numbers a single merged index would have bound."""
    terms = []
    seen = set()
    for t in collect_terms(logical):
        key = (t.field_id, t.term)
        if key not in seen:
            seen.add(key)
            terms.append(t)
    doc_freqs: dict[tuple[int, str], int] = {}
    total_docs = 0
    field_tokens: dict[int, float] = {}
    for d, m in zip(index_dirs, manifests):
        dfs, _, _ = bind_stats_for_terms(spark, d, m, terms)
        for k, v in dfs.items():
            doc_freqs[k] = doc_freqs.get(k, 0) + v
        total_docs += m.stats.get("total_docs", m.total_docs)
        for fid, toks in m.stats.get("field_tokens", {}).items():
            field_tokens[int(fid)] = field_tokens.get(int(fid), 0.0) + float(toks)
    field_avgdl = {
        fid: (toks / float(total_docs) if total_docs else 1.0)
        for fid, toks in field_tokens.items()
    }
    return doc_freqs, total_docs, field_avgdl


def search_multi(
    spark,
    index_dirs: list[str],
    query,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    with_count: bool = False,
    use_wand: bool = True,
    default_fields: list[str] | None = None,
    manifests: list[Manifest] | None = None,
    alias_filters=None,
    index_boosts=None,
):
    """Search an alias of indexes; returns (results DataFrame, count).

    Results columns: ``index_ord`` (position of the hit's index in
    ``index_dirs``), segment_id, segment_ord, doc, score — ordered by
    score desc, index_ord asc, segment_ord asc, doc asc (the pinned
    single-index total order extended by the alias position), then
    offset/limit. ``with_count`` sums per-index exhaustive counts.
    Map results to documents with :func:`attach_docmap_multi`.

    ``alias_filters`` makes this a FILTERED alias (the ES alias
    ``filter`` option): a per-index filter query — NQL string or
    logical — applied in FILTER context (membership only, scores
    untouched, the ES filter-context contract), as a dict keyed by
    index dir or a list parallel to ``index_dirs`` (``None`` entries =
    unfiltered). Scoring statistics stay the UNFILTERED alias-global
    numbers (ES likewise: an alias filter narrows results, never idf),
    while ``with_count`` counts the filtered sets. Multi-term nodes in
    a filter expand against the alias-union dictionary like the base
    query's.

    ``index_boosts`` is the ES ``indices_boost`` search option: a
    per-index score multiplier (dict keyed by index dir or a list
    parallel to ``index_dirs``; missing/None = 1.0, must be > 0) applied
    AFTER scoring — hits from a preferred index outrank equal-scoring
    hits from others, stats and membership untouched. Multiplication is
    monotone within each index, so the per-index top-k survives the
    boost and the global merge stays exact.

    Cursor pagination (``after``) is index-relative and therefore not
    offered on the alias — page with offset/limit, or page each index
    separately and merge.

    Schemas must agree on everything scoring sees (field ids, names,
    types, analyzers, positions); ``store`` may differ.
    """
    if not index_dirs:
        raise ValueError("index_dirs is empty")
    if manifests is None:
        manifests = [load_manifest(d) for d in index_dirs]
    sig0 = _scoring_signature(manifests[0].schema)
    for d, m in zip(index_dirs[1:], manifests[1:]):
        if _scoring_signature(m.schema) != sig0:
            raise ValueError(
                f"index {d!r} schema differs from {index_dirs[0]!r} — an "
                f"alias needs identical field definitions (store= may vary)"
            )

    schema = manifests[0].schema
    logical = (
        parse_query(query, schema, default_fields)
        if isinstance(query, str)
        else query
    )
    from .expand import has_multiterm, rewrite_multiterm_multi

    if has_multiterm(logical):
        logical = rewrite_multiterm_multi(spark, index_dirs, manifests, logical)

    if alias_filters is None:
        flogical = [None] * len(index_dirs)
    else:
        if isinstance(alias_filters, dict):
            unknown = set(alias_filters) - set(index_dirs)
            if unknown:
                raise ValueError(
                    f"alias_filters keys not in index_dirs: {sorted(unknown)}"
                )
            flist = [alias_filters.get(d) for d in index_dirs]
        else:
            flist = list(alias_filters)
            if len(flist) != len(index_dirs):
                raise ValueError(
                    f"alias_filters list must parallel index_dirs "
                    f"({len(flist)} vs {len(index_dirs)})"
                )
        flogical = []
        for f in flist:
            if f is None:
                flogical.append(None)
                continue
            fl = (
                parse_query(f, schema, default_fields)
                if isinstance(f, str)
                else f
            )
            if has_multiterm(fl):
                fl = rewrite_multiterm_multi(spark, index_dirs, manifests, fl)
            flogical.append(fl)

    if index_boosts is None:
        boosts = [1.0] * len(index_dirs)
    else:
        if isinstance(index_boosts, dict):
            unknown = set(index_boosts) - set(index_dirs)
            if unknown:
                raise ValueError(
                    f"index_boosts keys not in index_dirs: {sorted(unknown)}"
                )
            boosts = [float(index_boosts.get(d, 1.0) or 1.0) for d in index_dirs]
        else:
            boosts = [1.0 if b is None else float(b) for b in index_boosts]
            if len(boosts) != len(index_dirs):
                raise ValueError(
                    f"index_boosts list must parallel index_dirs "
                    f"({len(boosts)} vs {len(index_dirs)})"
                )
        bad = [b for b in boosts if b <= 0]
        if bad:
            raise ValueError(f"index_boosts must be > 0, got {bad}")

    # stats bind over base + every filter's leaves so per-index compiles
    # never see an unbound term (a filter term absent from the override
    # would wrongly compile to the absent-term empty scorer); the VALUES
    # bound are the unfiltered alias-global ones either way
    stats_logical = logical
    extra = [f for f in flogical if f is not None]
    if extra:
        from .parser import BooleanQuery

        stats_logical = BooleanQuery(
            [("should", logical)] + [("should", f) for f in extra]
        )
    stats = bind_stats_multi(spark, index_dirs, manifests, stats_logical)

    from pyspark.sql import functions as F

    # per-index: local top-(limit+offset) under the GLOBAL stats — the
    # global top-k is contained in the union of local top-ks, so the
    # merge never needs more rows than that per index
    k = None if limit is None else limit + offset
    parts = []
    count = 0 if with_count else None
    for ord_, (d, m) in enumerate(zip(index_dirs, manifests)):
        if flogical[ord_] is None:
            q_i = logical
        else:
            from .parser import BooleanQuery

            # one MUST + one FILTER: score = the base query's score,
            # filter contributes membership only (constant 0)
            q_i = BooleanQuery(
                [("must", logical), ("filter", flogical[ord_])]
            )
        res, cnt = search(
            spark, d, q_i, limit=k, offset=0, scorer=scorer,
            with_count=with_count, use_wand=use_wand, manifest=m,
            stats_override=stats,
        )
        if with_count:
            count += cnt
        if boosts[ord_] != 1.0:
            res = res.withColumn(
                "score", F.col("score") * F.lit(boosts[ord_])
            )
        parts.append(res.withColumn("index_ord", F.lit(ord_)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.orderBy(
        F.desc("score"), F.asc("index_ord"), F.asc("segment_ord"), F.asc("doc")
    )
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return (
        out.select("index_ord", "segment_id", "segment_ord", "doc", "score"),
        count,
    )


def attach_docmap_multi(spark, index_dirs, results_df, manifests=None):
    """Join identity columns onto alias results: split by ``index_ord``,
    attach each slice against its own index's docmap, re-union. The
    per-slice join is the existing broadcast ``attach_docmap``."""
    from pyspark.sql import functions as F

    if manifests is None:
        manifests = [load_manifest(d) for d in index_dirs]
    parts = []
    for ord_, (d, m) in enumerate(zip(index_dirs, manifests)):
        sliced = results_df.filter(F.col("index_ord") == ord_).drop("index_ord")
        parts.append(
            attach_docmap(spark, d, sliced, manifest=m).withColumn(
                "index_ord", F.lit(ord_)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def field_caps(index_dirs) -> list[dict]:
    """Field capabilities across one or more indexes — the Elasticsearch
    ``_field_caps`` API analog (EXTENSION). Driver-side manifest reads
    only (the same cost class as stats binding — no cluster job).

    Returns one dict per (field name, type) pair, sorted by (name,
    type):

        {"field", "type", "searchable", "aggregatable", "indices",
         "metadata": {analyzer, positions, store} (text fields),
         "conflict": bool}

    following the ES contract: a field appearing with DIFFERENT types
    across the alias produces one row PER type, each listing the indexes
    carrying that type, with ``conflict=True`` on every row of that name
    (the ES per-type ``indices`` breakdown that only appears on
    conflicting fields — here always listed, since naming which index
    has which type is the point of the API). Text fields are searchable
    but not aggregatable (postings, no doc values); keyword / numeric /
    date fields are both (docmap doc values serve filters AND facets);
    geo fields are searchable (distance/bbox) and aggregatable (grids /
    centroid). A field missing from some index is simply absent from
    that index's list — like ES, absence is not a conflict."""
    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    if not dirs:
        raise ValueError("field_caps needs at least one index dir")
    by_field: dict[tuple, dict] = {}
    names: dict[str, set] = {}
    for d in dirs:
        schema = load_manifest(d).schema
        for fe in schema.fields:
            key = (fe.name, fe.field_type)
            row = by_field.get(key)
            if row is None:
                is_text = not fe.is_doc_value
                row = {
                    "field": fe.name,
                    "type": fe.field_type,
                    "searchable": True,
                    "aggregatable": not is_text,
                    "indices": [],
                    "conflict": False,
                }
                if is_text:
                    row["metadata"] = {
                        "analyzer": fe.analyzer,
                        "positions": fe.positions,
                        "store": fe.store,
                    }
                by_field[key] = row
            row["indices"].append(d)
            names.setdefault(fe.name, set()).add(fe.field_type)
    for (name, _), row in by_field.items():
        if len(names[name]) > 1:
            row["conflict"] = True
    return [by_field[k] for k in sorted(by_field)]
