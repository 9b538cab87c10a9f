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
driver-compiled and broadcast (a subscription table is small by
definition — thousands of rows; if it ever isn't, drop the broadcast()
and the same plan shuffle-joins on (field_id, term)). Works unchanged
inside ``foreachBatch`` for Structured Streaming percolation.

Supported query surface (v1): TermQuery and one flat BooleanQuery level
of term leaves — MUST / SHOULD / MUST_NOT / FILTER occurs plus
``min_should``, matching the engine's own satisfaction semantics
(FILTER requires like MUST; MUST_NOT excludes; SHOULD needs
``min_should`` hits when it is the only positive group or when
``min_should`` > 1). Positional queries (phrases) and dictionary-
expanded queries (prefix/fuzzy/wildcard — their expansion depends on an
index dictionary, which a percolator has no single instance of) are
rejected at registration with a clear error.
"""

from __future__ import annotations

from dataclasses import dataclass

from .analysis import get_analyzer
from .query.parser import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    TermQuery,
    parse_query,
)
from .schema import Schema


@dataclass(frozen=True)
class PercolatorQueries:
    """Driver-compiled stored-query tables (see module docstring)."""

    # (query_id, occur, field_id, term) — distinct
    term_rows: tuple[tuple[str, str, int, str], ...]
    # (query_id, n_must, req_should)
    req_rows: tuple[tuple[str, int, int], ...]
    field_ids: tuple[int, ...]  # every field any query touches


def _flatten_terms(query_id: str, q) -> list[tuple[str, str, int, str]]:
    """One flat boolean level of term leaves -> (qid, occur, fid, term)."""
    if isinstance(q, TermQuery):
        return [(query_id, MUST, q.field_id, q.term)]
    if isinstance(q, BooleanQuery):
        rows = []
        for occur, sub in q.subqueries:
            if not isinstance(sub, TermQuery):
                raise ValueError(
                    f"percolator query {query_id!r}: unsupported clause "
                    f"{type(sub).__name__} — v1 percolation supports flat "
                    f"boolean queries over terms (no phrases/positions, no "
                    f"dictionary-expanded multi-term queries)"
                )
            rows.append((query_id, occur, sub.field_id, sub.term))
        return rows
    raise ValueError(
        f"percolator query {query_id!r}: unsupported query type "
        f"{type(q).__name__}"
    )


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
    for qid, q in queries.items():
        logical = (
            parse_query(q, schema, default_fields) if isinstance(q, str) else q
        )
        rows = _flatten_terms(qid, logical)
        musts = {(f, t) for _, o, f, t in rows if o in (MUST, FILTER)}
        shoulds = {(f, t) for _, o, f, t in rows if o == SHOULD}
        n_positive = len(musts) + len(shoulds)
        if n_positive == 0:
            raise ValueError(
                f"percolator query {qid!r} has no positive clause — a "
                f"pure-negative query matches nothing (engine semantics)"
            )
        min_should = logical.min_should if isinstance(logical, BooleanQuery) else 1
        # engine rule: SHOULD is required when it is the only positive
        # group (ordinary union: >=1) or when min_should > 1 (explicit
        # at_least, required even beside MUST)
        if min_should > 1:
            req_should = min_should
        elif not musts and shoulds:
            req_should = 1
        else:
            req_should = 0
        term_rows.extend(dict.fromkeys(rows))  # distinct, order-preserving
        req_rows.append((qid, len(musts), req_should))
    field_ids = tuple(sorted({f for _, _, f, _ in term_rows}))
    return PercolatorQueries(tuple(term_rows), tuple(req_rows), field_ids)


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


def percolate(
    spark,
    docs_df,
    pq: PercolatorQueries,
    schema: Schema,
    id_col: str = "doc_id",
    column_map: dict[str, str] | None = None,
):
    """Match every incoming document against every registered query.
    Returns a DataFrame of (``id_col``, query_id) pairs — one row per
    satisfied (document, stored query) combination, nothing for
    non-matches. ``column_map`` renames schema field -> docs_df column
    when they differ (default: same name)."""
    from pyspark.sql import functions as F

    column_map = column_map or {}
    per_field = []
    for fid in pq.field_ids:
        fe = schema.fields[fid]
        col = column_map.get(fe.name, fe.name)
        if col not in docs_df.columns:
            raise ValueError(
                f"percolate: docs_df has no column {col!r} for schema "
                f"field {fe.name!r} (have: {', '.join(docs_df.columns)})"
            )
        per_field.append(
            docs_df.select(
                F.col(id_col).alias("_pid"),
                F.lit(fid).alias("field_id"),
                F.explode(F.array_distinct(_tokens_expr(fe, col))).alias("term"),
            )
        )
    doc_terms = per_field[0]
    for df in per_field[1:]:
        doc_terms = doc_terms.unionByName(df)

    qterms = spark.createDataFrame(
        list(pq.term_rows), "query_id string, occur string, field_id int, term string"
    )
    reqs = spark.createDataFrame(
        list(pq.req_rows), "query_id string, n_must int, req_should int"
    )
    hits = doc_terms.join(F.broadcast(qterms), ["field_id", "term"])
    # doc_terms is distinct per (doc, field) by construction
    # (array_distinct before explode) and qterms rows are distinct, so
    # plain conditional counts ARE distinct-term counts — and unlike
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
        agg.join(F.broadcast(reqs), "query_id")
        .filter(
            (F.col("must_hits") == F.col("n_must"))
            & (F.col("should_hits") >= F.col("req_should"))
            & (F.col("not_hits") == 0)
        )
        .select(F.col("_pid").alias(id_col), "query_id")
    )
    return matched
