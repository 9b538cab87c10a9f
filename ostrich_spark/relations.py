"""Parent/child join queries — ``has_child`` / ``has_parent``.

EXTENSION (Elasticsearch ``join`` field analog; the reference engine has
no relational surface — its query AST is terms and booleans only,
/root/reference/query/query.go:3-33). The ES contract this follows:

- Parents and children live in ONE index. A keyword doc-value field (the
  *relation field*) names each doc's side, e.g. ``rel`` ∈ {"question",
  "answer"}; child docs carry their parent's key in another doc-value
  field (the *parent field*). Parents are addressed by an identity /
  doc-value column of their own (the *id column*).
- ``has_child(q)`` returns PARENT docs having >= ``min_children`` (and
  <= ``max_children``) live children matching ``q``; the parent's score
  is an aggregate of its matching children's scores per ``score_mode``
  (``none`` = constant 1.0, ES filter-context semantics; or
  ``sum``/``max``/``min``/``avg``).
- ``has_parent(q)`` returns CHILD docs whose parent matches ``q``; each
  child scores its parent's score (``score=True``) or constant 1.0.

Scale posture (the part ES solves with parent/child shard co-routing):
the child match set is evaluated ONCE exhaustively through the normal
search stack (tombstones excluded there), then reduced to one row per
parent key by a map-side partial-aggregated groupBy — the shuffle
carries (key, partial count, partial score) per map partition, never
the raw per-child rows beyond the first exchange. The parent side is a
docmap scan with the relation predicate pushed to parquet. The final
key join is a plain shuffle hash join (both sides can be huge at 100 TB;
AQE broadcasts the aggregated side when it is small). No window
functions, no driver-side collect of match sets.

Key dtype rule: when the parent field and the id column have different
types, the NUMERIC side is cast to STRING (lossless) — never
string->numeric, which would silently merge '07' and '7' (see
cli delete's dtype-exact contract). Keys must therefore match in their
canonical string form, the ES convention (join keys are strings).
"""

from __future__ import annotations

from .manifest import Manifest, load_manifest

SCORE_MODES = ("none", "sum", "max", "min", "avg")


def _attach_segment_ord(spark, manifest: Manifest, df):
    """SegmentOrd for docmap-sourced rows (same strategy as search():
    literal map for ordinary segment counts, broadcast join beyond)."""
    from pyspark.sql import functions as F

    ords = [(s.segment_id, i) for i, s in enumerate(manifest.sorted_segments())]
    if len(ords) <= 10_000:
        mapping = F.create_map(
            *[x for sid, o in ords for x in (F.lit(sid), F.lit(o))]
        )
        return df.withColumn("segment_ord", mapping[F.col("segment_id")].cast("int"))
    ord_df = spark.createDataFrame(ords, "segment_id string, segment_ord int")
    return df.join(F.broadcast(ord_df), "segment_id")


def _live_docmap(spark, index_dir: str, manifest: Manifest):
    """Docmap with tombstoned docs excluded (docs reached through a
    docmap scan rather than search() need the anti-join themselves)."""
    from .deletes import has_tombstones, read_tombstones
    from .query.exec import read_docmap

    dm = read_docmap(spark, index_dir, manifest)
    if has_tombstones(index_dir, manifest):
        dm = dm.join(
            read_tombstones(spark, index_dir, manifest),
            ["segment_id", "doc"],
            "left_anti",
        )
    return dm


def _require_cols(dm, cols: list[str]) -> None:
    for c in cols:
        if c not in dm.schema.names:
            raise ValueError(
                f"column {c!r} not in docmap (have: {', '.join(dm.schema.names)})"
            )


def _join_keys(F, left_col, left_type, right_col, right_type):
    """Equi-join key pair under the numeric->string cast rule."""
    from pyspark.sql.types import StringType

    if left_type == right_type:
        return left_col, right_col
    if isinstance(left_type, StringType):
        return left_col, right_col.cast("string")
    if isinstance(right_type, StringType):
        return left_col.cast("string"), right_col
    # two different numeric/date types: string is the common lossless form
    return left_col.cast("string"), right_col.cast("string")


def _relation_logical(query, schema, relation_field: str, relation: str, default_fields):
    """Caller query AND (non-scoring) relation_field == relation."""
    from .query.parser import BooleanQuery, parse_query

    logical = (
        parse_query(query, schema, default_fields) if isinstance(query, str) else query
    )
    fe = schema.field_by_name(relation_field)
    if fe is None or not fe.is_doc_value or fe.is_geo:
        raise ValueError(
            f"relation field {relation_field!r} must be a doc-value field "
            f"of this index (Schema.add_keyword_field)"
        )
    quoted = relation.replace('"', '\\"')
    filt = parse_query(f'{relation_field}:"{quoted}"', schema)
    return BooleanQuery.filtering(logical, filt)


def has_child(
    spark,
    index_dir: str,
    child_query,
    relation_field: str,
    child_relation: str,
    parent_relation: str,
    parent_field: str,
    id_col: str,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Parents with matching children (ES ``has_child``).

    Runs ``child_query`` (string NQL or a programmatic query object)
    restricted to ``relation_field == child_relation`` via a non-scoring
    FILTER clause, aggregates matching children per ``parent_field``
    value, and returns the PARENT docs (``relation_field ==
    parent_relation``, keyed by ``id_col``) whose live-child match count
    lies in [``min_children``, ``max_children``].

    Returns (segment_id, segment_ord, doc, score, n_children) rows in
    the pinned total order (score desc, segment_ord asc, doc asc),
    offset/limit applied; ``limit=None`` returns every qualifying
    parent. Compose with attach_docmap for identity columns. Children
    with a NULL ``parent_field`` never count (ES: a child without a
    parent routing is unreachable). A parent key referencing no live
    parent doc simply surfaces nothing for that key.
    """
    from pyspark.sql import functions as F

    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    if max_children is not None and max_children < min_children:
        raise ValueError("max_children must be >= min_children")
    if manifest is None:
        manifest = load_manifest(index_dir)
    from .query.exec import read_docmap, search

    logical = _relation_logical(
        child_query, manifest.schema, relation_field, child_relation, default_fields
    )
    res, _ = search(
        spark, index_dir, logical, limit=None, scorer=scorer, manifest=manifest
    )

    dm = read_docmap(spark, index_dir, manifest)
    _require_cols(dm, [relation_field, parent_field, id_col])
    # matching children -> (parent key, score); search() already
    # excluded tombstoned children and enforced the relation filter
    child_rows = (
        dm.select("segment_id", "doc", parent_field)
        .join(res.select("segment_id", "doc", "score"), ["segment_id", "doc"], "inner")
        .filter(F.col(parent_field).isNotNull())
    )
    aggs = [F.count(F.lit(1)).alias("n_children")]
    if score_mode != "none":
        aggs.append(getattr(F, score_mode)("score").alias("score"))
    agg = child_rows.groupBy(F.col(parent_field).alias("_pkey")).agg(*aggs)
    if score_mode == "none":
        agg = agg.withColumn("score", F.lit(1.0))
    cond = F.col("n_children") >= min_children
    if max_children is not None:
        cond = cond & (F.col("n_children") <= max_children)
    agg = agg.filter(cond)

    parents = (
        _live_docmap(spark, index_dir, manifest)
        .filter(F.col(relation_field) == parent_relation)
        .select("segment_id", "doc", id_col)
    )
    pk, ak = _join_keys(
        F,
        parents[id_col],
        parents.schema[id_col].dataType,
        agg["_pkey"],
        agg.schema["_pkey"].dataType,
    )
    out = parents.join(agg, pk == ak, "inner")
    out = _attach_segment_ord(spark, manifest, out).select(
        "segment_id",
        "segment_ord",
        "doc",
        F.col("score").cast("double").alias("score"),
        "n_children",
    )
    out = out.orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def has_parent(
    spark,
    index_dir: str,
    parent_query,
    relation_field: str,
    parent_relation: str,
    child_relation: str,
    parent_field: str,
    id_col: str,
    score: bool = False,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Children of matching parents (ES ``has_parent``).

    Runs ``parent_query`` restricted to ``relation_field ==
    parent_relation``, then returns every live CHILD doc
    (``relation_field == child_relation``) whose ``parent_field`` equals
    a matching parent's ``id_col`` value. ``score=True`` gives each
    child its parent's score (ES ``score: true``); default is constant
    1.0 (filter semantics). A child references at most one parent by
    construction of the key equality; duplicate parent ids are a data
    error (same as ES) and would duplicate child rows.

    Returns (segment_id, segment_ord, doc, score) in the pinned total
    order, offset/limit applied.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    from .query.exec import read_docmap, search

    logical = _relation_logical(
        parent_query, manifest.schema, relation_field, parent_relation, default_fields
    )
    res, _ = search(
        spark, index_dir, logical, limit=None, scorer=scorer, manifest=manifest
    )
    dm = read_docmap(spark, index_dir, manifest)
    _require_cols(dm, [relation_field, parent_field, id_col])
    parent_rows = dm.select("segment_id", "doc", id_col).join(
        res.select("segment_id", "doc", "score"), ["segment_id", "doc"], "inner"
    )
    parent_rows = parent_rows.select(
        F.col(id_col).alias("_pid"), F.col("score").alias("_pscore")
    ).filter(F.col("_pid").isNotNull())

    children = (
        _live_docmap(spark, index_dir, manifest)
        .filter(
            (F.col(relation_field) == child_relation)
            & F.col(parent_field).isNotNull()
        )
        .select("segment_id", "doc", parent_field)
    )
    ck, pk = _join_keys(
        F,
        children[parent_field],
        children.schema[parent_field].dataType,
        parent_rows["_pid"],
        parent_rows.schema["_pid"].dataType,
    )
    score_col = (
        F.col("_pscore").cast("double") if score else F.lit(1.0).cast("double")
    )
    out = children.join(parent_rows, ck == pk, "inner")
    out = _attach_segment_ord(spark, manifest, out).select(
        "segment_id", "segment_ord", "doc", score_col.alias("score")
    )
    out = out.orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def children_facet(
    spark,
    index_dir: str,
    parent_query,
    relation_field: str,
    parent_relation: str,
    child_relation: str,
    parent_field: str,
    id_col: str,
    by=None,
    metrics: dict | None = None,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Bucket aggregation over the CHILDREN of matching parents — the
    Elasticsearch ``children`` aggregation analog (EXTENSION): a
    parent-context query switches to its child docs for counting and
    metrics ("for questions matching X, how do their answers break
    down"). ``n_docs`` counts CHILD docs (the ES children-agg
    doc_count).

    ``parent_query`` runs restricted to ``relation_field ==
    parent_relation`` (non-scoring filter); the matched parents' key
    values (``id_col``, NULLs dropped) select the live children
    (``relation_field == child_relation``, non-NULL ``parent_field``,
    tombstones excluded) via ONE key semi-join under the canonical
    string-key rule. ``by`` (docmap column(s), or None for one global
    row) and ``metrics`` follow the facet_stats grammar over the child
    rows.

    Scale posture: parent keys reduce through distinct() before the
    semi-join (one key-partitioned exchange each side, AQE free to
    broadcast the key set); the facet is one partial-aggregated groupBy.
    Nothing collects."""
    from pyspark.sql import functions as F

    from .query.exec import _metric_aggs, read_docmap, search

    if manifest is None:
        manifest = load_manifest(index_dir)
    logical = _relation_logical(
        parent_query, manifest.schema, relation_field, parent_relation,
        default_fields,
    )
    res, _ = search(
        spark, index_dir, logical, limit=None, scorer=scorer, manifest=manifest
    )
    dm = read_docmap(spark, index_dir, manifest)
    by_cols = [by] if isinstance(by, str) else list(by or [])
    _require_cols(dm, [relation_field, parent_field, id_col, *by_cols])
    parent_keys = (
        dm.select("segment_id", "doc", id_col)
        .join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner")
        .filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("_pkey"))
        .distinct()
    )
    children = _live_docmap(spark, index_dir, manifest).filter(
        (F.col(relation_field) == child_relation)
        & F.col(parent_field).isNotNull()
    )
    ck, pk = _join_keys(
        F,
        children[parent_field],
        children.schema[parent_field].dataType,
        parent_keys["_pkey"],
        parent_keys.schema["_pkey"].dataType,
    )
    kids = children.join(parent_keys, ck == pk, "leftsemi")
    aggs = [F.count(F.lit(1)).alias("n_docs"), *_metric_aggs(F, metrics or {})]
    if by_cols:
        return kids.groupBy(*by_cols).agg(*aggs).orderBy(*by_cols)
    return kids.agg(*aggs)


def parent_facet(
    spark,
    index_dir: str,
    child_query,
    relation_field: str,
    parent_relation: str,
    child_relation: str,
    parent_field: str,
    id_col: str,
    by=None,
    metrics: dict | None = None,
    scorer: str = "tfidf",
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Bucket aggregation over the PARENTS of matching children — the
    Elasticsearch ``parent`` aggregation analog (EXTENSION), the
    reverse of :func:`children_facet`: a child-context query switches
    to the parent docs ("for answers matching X, what do their
    questions look like"). ``n_docs`` counts PARENT docs — inherently
    DISTINCT (the semi-join keeps each live parent once no matter how
    many of its children matched), the ES parent-agg doc_count.

    Same key rules as children_facet: matched children's non-NULL
    ``parent_field`` values (distinct) semi-select the live parents
    (``relation_field == parent_relation``) by ``id_col`` under the
    canonical string-key rule; a dangling key (no live parent doc)
    surfaces nothing. ``by``/``metrics`` follow the facet_stats grammar
    over the parent rows."""
    from pyspark.sql import functions as F

    from .query.exec import _metric_aggs, read_docmap, search

    if manifest is None:
        manifest = load_manifest(index_dir)
    logical = _relation_logical(
        child_query, manifest.schema, relation_field, child_relation,
        default_fields,
    )
    res, _ = search(
        spark, index_dir, logical, limit=None, scorer=scorer, manifest=manifest
    )
    dm = read_docmap(spark, index_dir, manifest)
    by_cols = [by] if isinstance(by, str) else list(by or [])
    _require_cols(dm, [relation_field, parent_field, id_col, *by_cols])
    child_keys = (
        dm.select("segment_id", "doc", parent_field)
        .join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner")
        .filter(F.col(parent_field).isNotNull())
        .select(F.col(parent_field).alias("_ckey"))
        .distinct()
    )
    parents = _live_docmap(spark, index_dir, manifest).filter(
        (F.col(relation_field) == parent_relation)
        & F.col(id_col).isNotNull()
    )
    pk, ck = _join_keys(
        F,
        parents[id_col],
        parents.schema[id_col].dataType,
        child_keys["_ckey"],
        child_keys.schema["_ckey"].dataType,
    )
    pars = parents.join(child_keys, pk == ck, "leftsemi")
    aggs = [F.count(F.lit(1)).alias("n_docs"), *_metric_aggs(F, metrics or {})]
    if by_cols:
        return pars.groupBy(*by_cols).agg(*aggs).orderBy(*by_cols)
    return pars.agg(*aggs)
