"""Nested fields — ES ``nested`` type over system-managed hidden docs.

EXTENSION (Elasticsearch ``nested`` field analog; the reference engine
indexes flat string fields only, /root/reference/schema/schema.go:3-33).
The ES contract this follows:

- A *nested path* is an ``array<struct<...>>`` input column. Each array
  element is indexed as a HIDDEN child document in the same index, so a
  boolean query against several properties of one element only matches
  when a SINGLE element satisfies all of them — the cross-matching
  guarantee object-flattening loses (ES docs' canonical
  ``user.first=Alice AND user.last=White`` trap).
- ``nested_query(path, q)`` returns ROOT docs having >= 1 live element
  at ``path`` matching ``q``; the root's score aggregates its matching
  elements' scores per ``score_mode`` (ES default ``avg``).
- ``inner_hits(path, q)`` returns the matching elements themselves,
  keyed (root id, element position), optionally top-k per root.
- Ordinary searches over a nested index should go through
  ``search_roots`` (adds a non-scoring root filter) — like ES, hidden
  docs are real index docs (they count in total_docs / N and therefore
  in every idf, exactly as Lucene block-join children count in maxDoc).

Implementation: a thin composition over the parent/child join plane
(relations.py ``has_child``) with three system doc-value fields —
``__nrel`` (keyword: ``__root`` or the path name), ``__nparent``
(keyword: the root's key in canonical string form), ``__npos`` (long:
element position). Hidden docs ride the NORMAL build/merge/delete/search
machinery: one ``posexplode`` + unionByName at build (no extra shuffle
beyond the build's own deterministic repartitionByRange), and the
nested-query reduction is has_child's map-side partial-aggregated
groupBy + one key join — no windows, no driver-side match sets, safe at
100 TB. Root and element rows of one document land in the same build
partition (the order column sorts elements directly after their root),
mirroring Lucene's block adjacency, though correctness never relies on
adjacency — the join is by key.

Scale note on stats: N is the reference's GLOBAL doc count
(/root/reference/query/tfidf_weight.go:13 via index metadata), so
elements inflate N and every field's idf — the same wart Lucene
block-join has (children count in maxDoc). The oracle gates mirror this
exactly.
"""

from __future__ import annotations

from .manifest import Manifest, load_manifest
from .schema import (
    FIELD_TYPE_KEYWORD,
    FIELD_TYPE_LONG,
    FieldEntry,
    Schema,
)

NESTED_REL = "__nrel"
NESTED_PARENT = "__nparent"
NESTED_POS = "__npos"
ROOT_REL = "__root"
_SYSTEM_FIELDS = (NESTED_REL, NESTED_PARENT, NESTED_POS)


def flat_col(path: str, sub: str) -> str:
    """Physical column a nested subfield reads at build time."""
    return f"__n__{path}__{sub}"


def nested_schema(schema: Schema, nested: dict[str, Schema]) -> Schema:
    """Combined index schema: root fields, then each path's subfields
    (source_col -> the flattened physical column), then the three system
    doc-value fields. Subfield names are INDEX-GLOBAL (queries address
    them bare — ``author:alice``, not ``comments.author``), so
    collisions with root fields, other paths, or system names are
    rejected up front."""
    if not nested:
        raise ValueError("nested must map >=1 path name to a sub-schema")
    combined = Schema()
    for fe in schema.fields:
        combined.fields.append(
            FieldEntry(
                len(combined.fields), fe.name, fe.field_type, fe.analyzer,
                fe.positions, fe.store, fe.search_analyzer, fe.source_col,
            )
        )
    root_names = set(schema.field_names)
    for path, sub in nested.items():
        if "." in path:
            raise ValueError(f"nested path {path!r} contains '.'")
        for fe in sub.fields:
            if fe.is_geo:
                raise ValueError(
                    f"geo subfield {fe.name!r} in nested path {path!r}: geo "
                    "fields read paired lat/lon input columns and are not "
                    "supported inside nested paths yet"
                )
            if fe.name in _SYSTEM_FIELDS:
                raise ValueError(f"subfield name {fe.name!r} is reserved")
            if fe.name in root_names:
                raise ValueError(
                    f"subfield {fe.name!r} of nested path {path!r} collides "
                    "with another field — subfield names are index-global "
                    "(queries address them bare); rename one side"
                )
            root_names.add(fe.name)
            combined.fields.append(
                FieldEntry(
                    len(combined.fields), fe.name, fe.field_type, fe.analyzer,
                    fe.positions, fe.store, fe.search_analyzer,
                    flat_col(path, fe.name),
                )
            )
    for name, ftype in (
        (NESTED_REL, FIELD_TYPE_KEYWORD),
        (NESTED_PARENT, FIELD_TYPE_KEYWORD),
        (NESTED_POS, FIELD_TYPE_LONG),
    ):
        combined.fields.append(
            FieldEntry(len(combined.fields), name, ftype, "", False, False)
        )
    return combined


def build_nested_index(
    spark,
    corpus_df,
    schema: Schema,
    nested: dict[str, Schema],
    index_dir: str,
    id_col: str,
    num_partitions: int = 8,
    build_id: str = "build0",
    mode: str = "overwrite",
) -> Manifest:
    """Build an index whose docs are the corpus rows (roots) plus one
    hidden doc per array element of each nested path.

    ``corpus_df`` must carry, per path, an ``array<struct<...>>`` column
    named after the path whose struct attributes cover each subfield's
    ``input_col``. ``id_col`` is the root key (unique per root row; any
    orderable type — joined in canonical string form). Empty/NULL arrays
    simply contribute no elements; the root stays fully searchable.

    Returns the committed Manifest of the combined index. Resume /
    append semantics are build_index's own — the flatten is
    deterministic, so a crashed build resumes partition-exact.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StructType

    combined = nested_schema(schema, nested)
    root_inputs = list(dict.fromkeys(fe.input_col for fe in schema.fields))
    for col in (*root_inputs, id_col, *nested):
        if col not in corpus_df.columns:
            raise ValueError(f"corpus is missing column {col!r}")

    flat_types: dict[str, object] = {}
    for path, sub in nested.items():
        dt = corpus_df.schema[path].dataType
        if not (isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType)):
            raise ValueError(
                f"nested path {path!r} must be array<struct<...>>, got {dt.simpleString()}"
            )
        elem = dt.elementType
        for fe in sub.fields:
            if fe.input_col not in elem.names:
                raise ValueError(
                    f"struct of nested path {path!r} has no attribute "
                    f"{fe.input_col!r} (have: {', '.join(elem.names)})"
                )
            flat_types[flat_col(path, fe.name)] = elem[fe.input_col].dataType

    id_str = F.col(id_col).cast("string")
    order_col = "__nord"
    # roots first within a doc ('' < any path name), elements in array
    # order after — Lucene block layout, deterministic for resume
    root_sel = root_inputs if id_col in root_inputs else [*root_inputs, id_col]
    root = corpus_df.select(
        *root_sel,
        *[F.lit(None).cast(t).alias(c) for c, t in flat_types.items()],
        F.lit(ROOT_REL).alias(NESTED_REL),
        F.lit(None).cast("string").alias(NESTED_PARENT),
        F.lit(None).cast("long").alias(NESTED_POS),
        F.concat_ws("\x01", id_str, F.lit(""), F.lit("")).alias(order_col),
    )
    parts = [root]
    for path, sub in nested.items():
        own = {flat_col(path, fe.name): fe.input_col for fe in sub.fields}
        flat_exprs = [
            F.col("__elem").getField(own[c]).cast(flat_types[c]).alias(c)
            if c in own
            else F.lit(None).cast(flat_types[c]).alias(c)
            for c in flat_types
        ]
        ex = corpus_df.select(id_col, F.posexplode(path).alias("__pos", "__elem"))
        parts.append(
            ex.select(
                *[
                    F.lit(None).cast(corpus_df.schema[c].dataType).alias(c)
                    for c in root_inputs
                    if c != id_col
                ],
                id_col,
                *flat_exprs,
                F.lit(path).alias(NESTED_REL),
                id_str.alias(NESTED_PARENT),
                F.col("__pos").cast("long").alias(NESTED_POS),
                F.concat_ws(
                    "\x01", id_str, F.lit(path), F.format_string("%012d", "__pos")
                ).alias(order_col),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)

    from .build import build_index

    return build_index(
        spark, df, combined, index_dir,
        num_partitions=num_partitions, order_col=order_col,
        id_cols=[id_col], build_id=build_id, mode=mode,
    )


def root_filtered(query, schema: Schema, default_fields=None):
    """Caller query AND (non-scoring) ``__nrel == "__root"``."""
    from .query.parser import AllQuery, BooleanQuery, parse_query

    logical = (
        parse_query(query, schema, default_fields) if isinstance(query, str) else query
    )
    root = parse_query(f'{NESTED_REL}:"{ROOT_REL}"', schema)
    if isinstance(logical, AllQuery):
        # AllQuery takes the dedicated docmap-scan path and cannot sit
        # inside a boolean; "every root" IS the bare relation equality
        # (same constant 1.0 score as match_all)
        return root
    return BooleanQuery.filtering(logical, root)


def search_roots(
    spark,
    index_dir: str,
    query,
    limit: int | None = 10,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
    **kwargs,
):
    """search() restricted to ROOT docs — the ordinary-search entry
    point over a nested index (ES hides nested docs from every query
    that doesn't opt into the nested scope). Same return contract as
    query.exec.search: (results_df, metrics)."""
    from .query.exec import search

    if manifest is None:
        manifest = load_manifest(index_dir)
    logical = root_filtered(query, manifest.schema, default_fields)
    return search(
        spark, index_dir, logical, limit=limit, scorer=scorer,
        manifest=manifest, **kwargs,
    )


def nested_query(
    spark,
    index_dir: str,
    path: str,
    query,
    id_col: str,
    score_mode: str = "avg",
    min_children: int = 1,
    max_children: int | None = None,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Roots with >=1 element at ``path`` matching ``query`` (ES
    ``nested`` query). Pure composition: has_child over the system
    relation plane — the element match set reduces map-side to one row
    per root key, then one key join against the root-filtered docmap
    scan. Returns (segment_id, segment_ord, doc, score, n_children) in
    the pinned total order; ``n_children`` = matching element count
    (ES doesn't expose it; kept for parity with has_child and testing).

    ``score_mode`` defaults to ``avg`` (the ES nested default; ``none``
    gives filter-context constant 1.0)."""
    from .relations import has_child

    return has_child(
        spark, index_dir, query,
        relation_field=NESTED_REL, child_relation=path,
        parent_relation=ROOT_REL, parent_field=NESTED_PARENT,
        id_col=id_col, score_mode=score_mode,
        min_children=min_children, max_children=max_children,
        limit=limit, offset=offset, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )


def inner_hits(
    spark,
    index_dir: str,
    path: str,
    query,
    id_col: str,
    per_root: int | None = 3,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
    extra_cols: list[str] | None = None,
):
    """The matching ELEMENTS themselves (ES ``inner_hits``): one row per
    matching element — (root key aliased ``id_col``, ``pos``, ``score``,
    *extra_cols doc-value/stored columns*), top ``per_root`` per root by
    (score desc, pos asc); ``per_root=None`` returns every match.

    The per-root truncation is a single partial-aggregated groupBy using
    sort_array over collected (neg-score, pos, ...) structs — bounded
    per root by the element count, no window shuffle, no driver collect.
    """
    from pyspark.sql import functions as F

    from .query.exec import attach_docmap, search
    from .relations import _relation_logical

    if manifest is None:
        manifest = load_manifest(index_dir)
    logical = _relation_logical(
        query, manifest.schema, NESTED_REL, path, default_fields
    )
    res, _ = search(
        spark, index_dir, logical, limit=None, scorer=scorer, manifest=manifest
    )
    extra = list(extra_cols or [])
    rows = attach_docmap(spark, index_dir, res, manifest=manifest).select(
        F.col(id_col),
        F.col(NESTED_POS).alias("pos"),
        F.col("score").cast("double").alias("score"),
        *extra,
    )
    if per_root is None:
        return rows.orderBy(F.col(id_col), F.desc("score"), F.asc("pos"))
    # sort_array(collect_list(struct)) — collect_list carries NO order
    # guarantee after a shuffle; the struct's leading (-score, pos) keys
    # make sort_array the deterministic rank (see tests/test_nested.py)
    st = F.struct(
        (-F.col("score")).alias("_ns"), F.col("pos").alias("pos"),
        F.col("score").alias("score"),
        *[F.col(c).alias(c) for c in extra],
    )
    top = (
        rows.groupBy(id_col)
        .agg(F.slice(F.sort_array(F.collect_list(st)), 1, per_root).alias("_top"))
        .select(id_col, F.explode("_top").alias("_h"))
        .select(
            id_col,
            F.col("_h.pos").alias("pos"),
            F.col("_h.score").alias("score"),
            *[F.col(f"_h.{c}").alias(c) for c in extra],
        )
    )
    return top.orderBy(F.col(id_col), F.desc("score"), F.asc("pos"))


def nested_facet(
    spark,
    index_dir: str,
    path: str,
    by,
    metrics: dict | None = None,
    element_query=None,
    root_query=None,
    id_col: str | None = None,
    reverse: bool = False,
    manifest: Manifest | None = None,
    scorer: str = "tfidf",
    default_fields=None,
):
    """Bucket aggregation over NESTED ELEMENTS — the Elasticsearch
    ``nested`` aggregation, with ``reverse=True`` adding the
    ``reverse_nested``-to-root count. One row per distinct value tuple
    of the element subfield(s) ``by`` carrying:

    - ``n_docs`` — matching ELEMENT count (the ES nested-agg doc_count:
      nested buckets count hidden element docs, not roots);
    - ``n_roots`` (``reverse=True``) — DISTINCT root docs owning those
      elements (the ES ``reverse_nested`` sub-agg shape: "how many
      products have >=1 review with this rating", not "how many
      reviews");
    - every ``metrics`` entry (the shared facet grammar), column names
      in ELEMENT subfield terms — ``("avg", "stars")`` reads the
      element's ``stars``.

    ``element_query`` narrows which elements bucket (evaluated with the
    nested scope enforced, like ``nested_query``); ``root_query``
    narrows to elements whose ROOT matches (the ES query-context of an
    agg under a root query — needs ``id_col``, the root key the
    elements carry in canonical string form). Either may be None.

    Scale posture: the element match set comes from the normal search
    plane (tombstones excluded) and joins the docmap co-keyed; the root
    context is one key join on the parent string; then ONE
    partial-aggregated groupBy. countDistinct(parent) for n_roots is
    the one expansion Spark runs exactly (values through the shuffle) —
    bounded by elements, same trade facet_stats documents for
    count_distinct."""
    from pyspark.sql import functions as F

    from .query.exec import (
        _metric_aggs,
        attach_docmap,
        read_docmap,
        search,
    )
    from .query.parser import parse_query
    from .relations import _relation_logical

    if manifest is None:
        manifest = load_manifest(index_dir)
    if manifest.schema.field_by_name(NESTED_REL) is None:
        raise ValueError(
            f"{index_dir!r} is not a nested index (no {NESTED_REL} field "
            f"— build with build_nested_index)"
        )
    by = [by] if isinstance(by, str) else list(by)
    metrics = metrics or {}
    docmap = read_docmap(spark, index_dir, manifest)
    # subfield names are INDEX-GLOBAL bare names (nested_schema), so
    # the docmap columns are just "author"/"stars" — validate each key
    # really belongs to THIS path via its build source column
    for b in by:
        fe = manifest.schema.field_by_name(b)
        if (
            fe is None
            or not fe.is_doc_value
            or fe.source_col != flat_col(path, b)
        ):
            subs = sorted(
                f.name for f in manifest.schema.fields
                if f.is_doc_value
                and f.source_col == flat_col(path, f.name)
            )
            raise ValueError(
                f"{b!r} is not a doc-value subfield of nested path "
                f"{path!r} — have {subs}"
            )
    if element_query is None:
        q = parse_query(f'{NESTED_REL}:"{path}"', manifest.schema)
    else:
        q = _relation_logical(
            element_query, manifest.schema, NESTED_REL, path, default_fields
        )
    res, _ = search(
        spark, index_dir, q, limit=None, scorer=scorer, manifest=manifest
    )
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    if root_query is not None:
        if id_col is None:
            raise ValueError("root_query needs id_col (the root key the "
                             "elements reference)")
        roots_res, _ = search(
            spark, index_dir,
            root_filtered(root_query, manifest.schema, default_fields),
            limit=None, scorer=scorer, manifest=manifest,
        )
        root_keys = (
            attach_docmap(spark, index_dir, roots_res, manifest=manifest)
            .select(F.col(id_col).cast("string").alias(NESTED_PARENT))
            .distinct()
        )
        matched = matched.join(root_keys, NESTED_PARENT, "leftsemi")
    aggs = [F.count("*").alias("n_docs")]
    if reverse:
        aggs.append(F.countDistinct(NESTED_PARENT).alias("n_roots"))
    aggs += _metric_aggs(F, metrics)
    return matched.groupBy(*by).agg(*aggs)
