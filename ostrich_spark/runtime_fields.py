"""Runtime fields (EXTENSION — Elasticsearch runtime mappings): named
expressions computed over the docmap at QUERY time, usable to filter,
sort, facet, and return — without reindexing.

ES evaluates runtime fields with Painless scripts per document at search
time; the Spark-first translation compiles the expression ONCE into
Catalyst columns (``F.expr`` over the docmap scan), so evaluation is
whole-stage-codegen JVM work inside the same scan that reads the stored
columns — no per-doc scripting engine, no second pass. The expression
language is Spark SQL, which the DuckDB oracle reproduces for the gated
entries (both are ANSI-ish SQL dialects; the gate pins expressions to
the shared subset).

What a runtime field may reference: docmap columns — identity columns,
numeric/keyword/date doc values (dates are epoch micros), stored
fields, content_sha256. Postings are not addressable (same as ES, where
runtime fields read doc values and _source, not the inverted index).

Scale posture: everything here stays one docmap scan + the search's
scoring shuffle. Filters on runtime fields CANNOT push down to parquet
(the column doesn't exist in the file — exactly ES's trade-off: runtime
fields swap index-time cost for query-time cost); sort is
TakeOrderedAndProject; facet is one partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .manifest import Manifest, load_manifest

_RESERVED = ("segment_id", "doc", "segment_ord", "score")


def with_runtime_fields(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Attach runtime columns to a docmap(-joined) DataFrame. ``fields``
    maps name -> Spark SQL expression over existing columns. Names must
    not collide with existing columns (shadowing a stored value would
    silently change query semantics) or the engine's bookkeeping."""
    for name, expr in fields.items():
        if name in df.columns or name in _RESERVED:
            raise ValueError(
                f"runtime field {name!r} collides with an existing column"
            )
        df = df.withColumn(name, F.expr(expr))
    return df


def search_runtime(
    spark,
    index_dir: str,
    query,
    fields: dict[str, str],
    predicate: str | None = None,
    sort_by: list[tuple[str, str]] | None = None,
    limit: int | None = 10,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
) -> DataFrame:
    """Search with runtime fields attached: the query's matches joined
    to the docmap, ``fields`` computed, an optional runtime
    ``predicate`` (SQL over stored + runtime columns — the ES
    filter-on-runtime-field shape), and an optional ``sort_by`` list of
    (column, "asc"|"desc") over runtime/stored columns (relevance order
    when omitted). Returns matches with identity, score, and runtime
    columns."""
    from .query.exec import attach_docmap, search

    manifest = manifest or load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    out = with_runtime_fields(
        attach_docmap(spark, index_dir, res, manifest=manifest), fields
    )
    if predicate is not None:
        out = out.filter(F.expr(predicate))
    if sort_by:
        order = [
            F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
            for c, d in sort_by
        ]
        out = out.orderBy(*order)
    else:
        out = out.orderBy(
            F.desc("score"), F.asc("segment_ord"), F.asc("doc")
        )
    if limit is not None:
        out = out.limit(int(limit))
    return out


def facet_runtime(
    spark,
    index_dir: str,
    query,
    expr: str,
    alias: str = "value",
    k: int | None = None,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
) -> DataFrame:
    """Bucket counts of a runtime expression over a query's FULL match
    set (the ES terms-agg-on-a-runtime-field shape): one docmap join +
    one partial-aggregated groupBy on the computed value. NULL values
    drop (ES omits them). ``k`` keeps the top-k buckets by (n_docs desc,
    value asc) — TakeOrderedAndProject."""
    from .query.exec import attach_docmap, search

    manifest = manifest or load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    joined = attach_docmap(spark, index_dir, res, manifest=manifest)
    col = F.expr(expr)
    out = (
        joined.select(col.alias(alias))
        .filter(F.col(alias).isNotNull())
        .groupBy(alias)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    if k is not None:
        out = out.orderBy(F.desc("n_docs"), F.asc(alias)).limit(int(k))
    return out
