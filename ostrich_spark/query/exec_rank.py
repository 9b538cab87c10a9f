"""Ranking / sorting / rescoring search variants split from exec.py
(mechanical move, round 4): sorted + early-terminating search, collapse
and grouping, boosting, random/script/decay/distance-feature/rank-
feature/field-value-factor scoring, pinned results, rescore windows,
and more_like_this. Public imports are unchanged via the ``exec``
facade."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd

from ..manifest import Manifest, load_manifest
from .parser import parse_query
from .plan import B, K1, SCORER_TFIDF, collect_terms, compile_query, to_wire

from .exec_core import (
    _doc_value_field_entry,
    _numeric_field_entry,
    _parse_duration_us,
    Manifest,
    SCORER_TFIDF,
    bind_stats_for_terms,
    load_manifest,
    math,
    os,
    read_docmap,
    search,
)
from .exec_docs import get_docs


class _Rev:
    """Reverse-order comparison wrapper: lets descending sorts and bound
    checks work on ANY orderable doc-value type (strings can't be
    negated the way numerics can)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def _segment_value_ranges(index_dir: str, manifest: Manifest, col: str):
    """Per-segment (min, max) of a docmap column, read driver-side from
    the parquet row-group statistics (a footer metadata read per segment
    file — no cluster job). Returns {segment_id: (min, max)}; a segment
    whose stats are unavailable (all-null column, no stats) maps to
    (None, None) and must be treated conservatively by callers. At 10^6
    segments these ranges belong in the manifest (fragment metrics) —
    the footer read is the no-schema-change form."""
    import glob as _glob

    import pyarrow.parquet as _pq

    out = {}
    for s in manifest.segments:
        root = os.path.join(
            index_dir, "segments", s.segment_id, "docmap.parquet"
        )
        files = (
            sorted(_glob.glob(os.path.join(root, "*.parquet")))
            if os.path.isdir(root)
            else ([root] if os.path.exists(root) else [])
        )
        lo = hi = None
        for f in files:
            md = _pq.ParquetFile(f).metadata
            sch = md.schema.to_arrow_schema()
            try:
                ci = sch.names.index(col)
            except ValueError:
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        out[s.segment_id] = (lo, hi)
    return out


def _sorted_after_pred(
    F, by: str, ascending: bool, tiebreak: list[str], after: tuple,
    after_ord_col: str | None = None,
):
    """Row-level predicate: "this row sorts strictly AFTER the cursor"
    under search_sorted's total order (by dir nulls-last, tiebreaks asc
    nulls-first, segment_ord asc, doc asc). Built innermost-out so each
    level only fires on ties of every outer level; null cursor values
    take the explicit null-tail/null-head branch."""
    v_by, *v_tb, v_ord, v_doc = after
    ord_col = after_ord_col or "segment_ord"
    p = (F.col(ord_col) > int(v_ord)) | (
        (F.col(ord_col) == int(v_ord)) & (F.col("doc") > int(v_doc))
    )
    for c, v in zip(reversed(tiebreak), reversed(v_tb)):
        col = F.col(c)
        if v is None:
            # asc nulls FIRST: every non-null value sorts after a null
            # cursor; null rows fall through to the deeper ordering
            p = col.isNotNull() | (col.isNull() & p)
        else:
            p = (col > F.lit(v)) | ((col == F.lit(v)) & p)
    col = F.col(by)
    if v_by is None:
        # cursor already in the nulls-last tail: only null rows remain
        return col.isNull() & p
    cmp = (col > F.lit(v_by)) if ascending else (col < F.lit(v_by))
    return col.isNull() | cmp | ((col == F.lit(v_by)) & p)


def search_sorted(
    spark,
    index_dir: str,
    query,
    by: str,
    ascending: bool = True,
    limit: int | None = 10,
    offset: int = 0,
    tiebreak: list[str] | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
    early_terminate: bool = False,
    scan_info: dict | None = None,
    after: tuple | None = None,
):
    """Top-k of a query's match set ordered by a doc-value field (numeric
    or keyword string) instead of relevance (Lucene ``Sort`` analog —
    EXTENSION, the reference's collectors are score-ordered only).

    Returns (segment_id, segment_ord, doc, ``by``) rows. Missing values
    sort LAST in either direction (Lucene's missing-value convention).
    ``tiebreak`` names extra docmap columns appended to the ordering
    (e.g. the identity column) — without it, ties break on the pinned
    (segment_ord, doc) order.

    Scale posture: the match evaluation is exhaustive (field-sorted top-k
    cannot be score-pruned — WAND bounds say nothing about doc values);
    the sort key joins from the docmap co-keyed on (segment_id, doc), and
    the global top-k is Catalyst's TakeOrderedAndProject (per-partition
    heap + driver merge of k·partitions rows, never the full match set).

    ``early_terminate=True`` adds SEGMENT pruning (the Lucene index-sort
    early-exit / Elasticsearch shard sort optimization): segments are
    visited in doubling waves ordered by their docmap min/max of ``by``
    (parquet row-group statistics, a driver metadata read), and the scan
    stops once the worst kept row provably beats every unvisited
    segment's best possible value — strictly, so value ties can never be
    mis-ordered. When the index was built with ``order_col=by``, the
    build's repartitionByRange makes segments value-disjoint and a top-k
    touches O(1) segments regardless of corpus size. Results are
    row-identical to the exhaustive path (tested); requires a bound
    (``limit`` not None). ``scan_info`` (optional dict) receives
    ``segments_scanned`` / ``segments_total`` for observability.

    ``after`` (ES ``search_after`` analog — deep pagination at scale):
    an EXCLUSIVE cursor ``(by_value, *tiebreak_values, segment_ord,
    doc)`` taken from the previous page's last row. It compiles to a
    row-level predicate applied BEFORE the top-k cut, so page N shuffles
    only rows sorting past the cursor — constant work per page, where
    ``offset=N`` re-sorts N rows (the reason ES caps ``from`` at 10k).
    Under ``early_terminate`` the cursor additionally SKIPS whole
    segments whose docmap value range lies entirely before it. Mutually
    exclusive with ``offset`` (the ES from+search_after rule). Null
    tiebreak cursor values follow asc-nulls-first; a null ``by`` cursor
    means "resume inside the nulls-last tail".
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    _doc_value_field_entry(manifest, by)
    tiebreak = list(tiebreak or [])
    if after is not None:
        if offset:
            raise ValueError(
                "offset and after are mutually exclusive (search_after "
                "replaces from-style paging)"
            )
        if len(after) != 1 + len(tiebreak) + 2:
            raise ValueError(
                f"after must be (by_value, {len(tiebreak)} tiebreak "
                f"value(s), segment_ord, doc) — got {len(after)} values"
            )
    if early_terminate and limit is not None:
        return _search_sorted_early(
            spark, index_dir, query, by, ascending, limit, offset,
            tiebreak, manifest, scorer, default_fields,
            scan_info, after,
        )
    res, _ = search(
        spark,
        index_dir,
        query,
        limit=None,
        scorer=scorer,
        manifest=manifest,
        default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    joined = docmap.select("segment_id", "doc", by, *tiebreak).join(
        res.select("segment_id", "segment_ord", "doc"),
        ["segment_id", "doc"],
        "inner",
    )
    if after is not None:
        joined = joined.filter(_sorted_after_pred(F, by, ascending, tiebreak, after))
    key = F.asc_nulls_last(by) if ascending else F.desc_nulls_last(by)
    order = [key] + [F.asc(c) for c in tiebreak] + [F.asc("segment_ord"), F.asc("doc")]
    out = joined.orderBy(*order)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out.select("segment_id", "segment_ord", "doc", by)


def _search_sorted_early(
    spark, index_dir, query, by, ascending, limit, offset,
    tiebreak, manifest, scorer, default_fields, scan_info,
    after=None,
):
    """Segment-pruned field-sorted top-k (see search_sorted docstring).

    Mechanics: a sub-manifest per wave re-uses the whole search stack
    (scorer paths, tombstones, multiterm expansion) over just that
    wave's segments; its synthetic opstamp keeps the DataFrame cache
    from aliasing with full-index reads while the copied stats dict
    keeps term_stats binding valid. segment_ord is recomputed against
    the FULL manifest on collection, so the output addressing and
    tie-break order are identical to the exhaustive path."""
    import math

    from pyspark.sql import functions as F

    need = offset + limit
    ranges = _segment_value_ranges(index_dir, manifest, by)

    def _key(v):
        # direction-aware orderable key for any doc-value type (numeric
        # or keyword string) — descending wraps instead of negating
        return v if ascending else _Rev(v)

    def best_bound(sid):
        """(known, key) — unknown bounds (no stats / all-null column)
        sort FIRST: conservatively "could hold anything", visit before
        any stop is possible."""
        lo, hi = ranges.get(sid, (None, None))
        b = lo if ascending else hi
        return (1, _key(b)) if b is not None else (0, 0)

    segs = sorted(manifest.segments, key=lambda s: best_bound(s.segment_id))
    if after is not None and after[0] is not None:
        # cursor prune: a segment whose ENTIRE value range sorts strictly
        # before the cursor value cannot contribute (ties keep — they can
        # still win on tiebreak/ord); unknown bounds keep
        v0 = after[0]

        def _before_cursor(sid):
            lo, hi = ranges.get(sid, (None, None))
            edge = hi if ascending else lo
            if edge is None:
                return False
            return edge < v0 if ascending else edge > v0

        segs = [s for s in segs if not _before_cursor(s.segment_id)]
    full_ord = {
        s.segment_id: i for i, s in enumerate(manifest.sorted_segments())
    }
    tb = [c for c in tiebreak]
    docmap = read_docmap(spark, index_dir, manifest)
    key_cols = [by, *tb]
    for c in key_cols:
        if c not in docmap.schema.names:
            raise ValueError(
                f"sort column {c!r} not in docmap "
                f"(have: {', '.join(docmap.schema.names)})"
            )

    kept = []  # (null_flag, keyval, tb..., segment_ord, doc, segment_id)
    i, wave, scanned = 0, 1, 0
    while i < len(segs):
        batch = segs[i : i + wave]
        i += wave
        wave *= 2
        scanned += len(batch)
        sub = Manifest(
            manifest.schema,
            batch,
            # synthetic opstamp: distinct cache identity per subset, real
            # term_stats pairing preserved via the copied stats dict
            opstamp=(1 << 40) + (hash(tuple(sorted(s.segment_id for s in batch))) & ((1 << 38) - 1)),
            stats=dict(manifest.stats),
            analyzers=manifest.analyzers,
        )
        # snapshot manifests pin a tombstone version (None is meaningful:
        # "no deletes at that commit"); waves must read deletes as-of
        # the same commit, not CURRENT — propagate the attribute itself
        if hasattr(manifest, "pinned_tombstone_dir"):
            sub.pinned_tombstone_dir = manifest.pinned_tombstone_dir
        res, _ = search(
            spark, index_dir, query, limit=None, scorer=scorer,
            manifest=sub, default_fields=default_fields,
        )
        key = F.asc_nulls_last(by) if ascending else F.desc_nulls_last(by)
        # wave-internal cut order must equal the FINAL order, including
        # the full-manifest segment_ord on ties (a sub-manifest's own
        # ords differ) — literal map, mirroring search's attachment
        ord_map = F.create_map(
            *[x for s in batch for x in (F.lit(s.segment_id), F.lit(full_ord[s.segment_id]))]
        )
        order = [key] + [F.asc(c) for c in tb] + [F.asc("_ford"), F.asc("doc")]
        rows = (
            docmap.select("segment_id", "doc", *dict.fromkeys(key_cols))
            .join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner")
            .withColumn("_ford", ord_map[F.col("segment_id")].cast("int"))
        )
        if after is not None:
            rows = rows.filter(
                _sorted_after_pred(F, by, ascending, tb, after, "_ford")
            )
        rows = rows.orderBy(*order).limit(need).collect()
        for r in rows:
            v = r[by]
            kept.append((
                v is None,
                0 if v is None else _key(v),  # null flag dominates
                # tiebreak asc with nulls FIRST (Spark asc null order)
                tuple(
                    (r[c] is not None, 0 if r[c] is None else r[c]) for c in tb
                ),
                full_ord[r["segment_id"]],
                r["doc"],
                r,
            ))
        kept.sort(key=lambda t: t[:5])
        kept = kept[:need]
        if len(kept) == need and i < len(segs):
            kth = kept[-1]
            known, nxt = best_bound(segs[i].segment_id)
            # strict: rows tying the kth value in unvisited segments
            # could still win on (tiebreak, segment_ord, doc)
            if not kth[0] and known and kth[1] < nxt:
                break
    if scan_info is not None:
        scan_info["segments_scanned"] = scanned
        scan_info["segments_total"] = len(segs)
    out_rows = [
        (t[5]["segment_id"], t[3], t[5]["doc"], t[5][by])
        for t in kept[offset : offset + limit]
    ]
    by_type = docmap.schema[by].dataType.simpleString()
    return spark.createDataFrame(
        out_rows,
        f"segment_id string, segment_ord int, doc long, {by} {by_type}",
    )


def search_collapsed(
    spark,
    index_dir: str,
    query,
    collapse_by: str,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
    tiebreak: list[str] | None = None,
):
    """Top-k over the query's match set keeping only the BEST-scoring doc
    per distinct value of a docmap column — field collapsing (Lucene
    CollapsingTopDocsCollector / Elasticsearch ``collapse`` analog;
    EXTENSION, the reference has no grouping). The result is a ranked
    list where every hit is its group's champion: search a code corpus
    collapsed on ``repo`` and each repository appears at most once.

    ``collapse_by`` is any docmap column (identity column, store=True
    field, or numeric doc value). NULL group values collapse together as
    one group (SQL GROUP BY convention — deterministic and
    oracle-checkable; Elasticsearch does the same).

    Returns (segment_id, segment_ord, doc, score, ``collapse_by``) rows
    in the pinned total order (score desc, segment_ord asc, doc asc),
    offset/limit applied AFTER collapsing.

    ``tiebreak`` names docmap columns that break score ties WITHIN a
    group (ascending) before the pinned (segment_ord, doc) order —
    pass the identity column to make champions reproducible across
    index layouts (the ``search_sorted`` convention).

    Scale posture: a group's global champion is found with ONE map-side
    partial-aggregated ``max_by`` keyed on the group column — never a
    window (row_number materializes every match per group through the
    shuffle; max_by carries one row per (partition, group)). Match
    evaluation is exhaustive (the champion of a group may score below
    any per-segment top-k cut, so WAND/top-k pruning cannot apply —
    same contract as Lucene, whose collapsing collector sees every hit).
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark,
        index_dir,
        query,
        limit=None,
        scorer=scorer,
        manifest=manifest,
        default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    tiebreak = list(tiebreak or [])
    for c in [collapse_by, *tiebreak]:
        if c not in docmap.schema.names:
            raise ValueError(
                f"collapse column {c!r} not in docmap "
                f"(have: {', '.join(docmap.schema.names)})"
            )
    matched = docmap.select(
        "segment_id", "doc", *dict.fromkeys([collapse_by, *tiebreak])
    ).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    # champion = min over an all-ascending key: (-score, tiebreak...,
    # segment_ord, doc) — struct comparison is lexicographic, so this
    # ranks exactly (score desc, tiebreak asc, segment_ord asc, doc asc)
    # while keeping min_by's map-side partial aggregation (negation only
    # touches the always-numeric score, so tiebreak columns may be any
    # orderable type)
    order_key = F.struct(
        (-F.col("score")).alias("ns"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreak)],
        F.col("segment_ord").alias("so"),
        F.col("doc").alias("d"),
    )
    row = F.struct(
        F.col("segment_id"), F.col("segment_ord"), F.col("doc"), F.col("score")
    )
    winners = matched.groupBy(collapse_by).agg(
        F.min_by(row, order_key).alias("_w")
    )
    out = winners.select(
        F.col("_w.segment_id").alias("segment_id"),
        F.col("_w.segment_ord").alias("segment_ord"),
        F.col("_w.doc").alias("doc"),
        F.col("_w.score").alias("score"),
        F.col(collapse_by),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_grouped(
    spark,
    index_dir: str,
    query,
    group_by: str,
    per_group: int = 3,
    groups: int | None = 10,
    group_offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
    tiebreak: list[str] | None = None,
    with_totals: bool = False,
):
    """Top-N hits PER GROUP — grouped search (Lucene grouping module /
    Elasticsearch ``collapse`` with ``inner_hits`` analog; EXTENSION,
    the reference has no grouping). Where ``search_collapsed`` keeps one
    champion per group, this returns up to ``per_group`` ranked hits for
    each of the best ``groups`` groups: search a code corpus grouped by
    ``repo`` and get the top 3 files of each of the top 10 repositories.

    Groups are ranked by their champion hit (Lucene's TopGroups
    convention: group order = best-doc order); within a group, hits
    follow (score desc, ``tiebreak`` asc..., segment_ord asc, doc asc).
    NULL group values form one group (SQL GROUP BY convention, same as
    ``search_collapsed``). ``groups=None`` returns every group — fine
    for low-cardinality fields (the group ranking then numbers ALL
    groups through one ordered window; prefer a bound when the group
    column is high-cardinality).

    Returns one row per hit: (``group_by``, group_rank, hit_rank,
    segment_id, segment_ord, doc, score), ordered by
    (group_rank asc, hit_rank asc). group_rank starts at 1 AFTER
    ``group_offset`` is applied; hit_rank is 1..per_group within the
    group. ``with_totals=True`` adds ``group_total`` — the group's FULL
    match count (the ES inner_hits ``total`` — how much the per_group
    cut hides), from one extra partial-aggregated count over the
    unpruned match set.

    Scale posture: match evaluation is exhaustive (a group champion may
    score below any top-k cut, so WAND cannot apply — the Lucene
    grouping collector sees every hit too). The per-group hit lists are
    NOT built with a window over the raw match set (row_number would
    drag every match of every group through the shuffle): a map-side
    pandas pre-prune keeps at most ``per_group`` rows per group per
    Arrow batch — the union of per-batch top-N is a superset of the
    global top-N for any partitioning — so the groupBy that follows
    carries O(per_group x batches) rows per group no matter how many
    docs a hot group matched. Group ranking is Catalyst's
    TakeOrderedAndProject over one row per group.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if per_group < 1:
        raise ValueError(f"per_group must be >= 1, got {per_group}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark,
        index_dir,
        query,
        limit=None,
        scorer=scorer,
        manifest=manifest,
        default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    tiebreak = [c for c in (tiebreak or []) if c != group_by]
    for c in [group_by, *tiebreak]:
        if c not in docmap.schema.names:
            raise ValueError(
                f"group column {c!r} not in docmap "
                f"(have: {', '.join(docmap.schema.names)})"
            )
    matched = docmap.select(
        "segment_id", "doc", *dict.fromkeys([group_by, *tiebreak])
    ).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    if with_totals:
        # each row carries a count contribution; the prune re-weights the
        # survivors so per-batch sums are preserved (see _prune) and the
        # final SUM per group equals the unpruned match count — one pass,
        # no second evaluation of the match set.
        matched = matched.withColumn("_cnt", F.lit(1).cast("long"))

    # map-side pre-prune: per Arrow batch, keep each group's local
    # top-per_group under the final within-group order. Sort semantics
    # must agree with the Spark struct sort below on everything that can
    # cross the prune boundary: score desc (never null), tiebreaks asc
    # with nulls first (Spark's asc null ordering), then the unique
    # (segment_ord, doc) — so ties are totally ordered and pandas/Spark
    # cannot disagree on WHICH rows survive.
    sort_cols = ["score", *tiebreak, "segment_ord", "doc"]
    ascending = [False] + [True] * (len(tiebreak) + 2)
    n_keep = per_group
    gcol = group_by

    want_totals = with_totals

    def _prune(batches):
        for pdf in batches:
            if len(pdf) <= n_keep:
                # every row survives, so _cnt=1 per row is already exact
                yield pdf
                continue
            pdf = pdf.sort_values(
                sort_cols, ascending=ascending, na_position="first"
            )
            grp = pdf.groupby(gcol, dropna=False, sort=False)
            kept = grp.head(n_keep)
            if want_totals:
                # sum(_cnt) over a group's SURVIVING rows must equal the
                # group's row count in this batch: first survivor absorbs
                # the pruned rows' counts, the rest keep 1.
                kept = kept.copy()
                total = grp["score"].transform("size").loc[kept.index]
                ksz = kept.groupby(gcol, dropna=False, sort=False)[
                    "score"
                ].transform("size")
                first = ~kept.duplicated(subset=[gcol])
                kept["_cnt"] = (total - ksz + 1).where(first, 1).astype("int64")
            yield kept

    pruned = matched.mapInPandas(_prune, schema=matched.schema)

    order_key = F.struct(
        (-F.col("score")).alias("ns"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreak)],
        F.col("segment_ord").alias("so"),
        F.col("doc").alias("d"),
    )
    payload = F.struct(
        F.col("segment_id"), F.col("segment_ord"), F.col("doc"), F.col("score")
    )
    aggs = [
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(order_key.alias("k"), payload.alias("p")))
            ),
            1,
            per_group,
        ).alias("hits")
    ]
    if with_totals:
        aggs.append(F.sum("_cnt").alias("group_total"))
    agg = pruned.groupBy(group_by).agg(*aggs)
    ranked = agg.withColumn("gkey", F.col("hits")[0]["k"])
    if groups is not None:
        # TakeOrderedAndProject: one row per group, bounded global sort
        ranked = ranked.orderBy(F.asc("gkey")).limit(group_offset + groups)
    w = Window.orderBy(F.asc("gkey"))
    ranked = ranked.withColumn("_gr", F.row_number().over(w))
    if group_offset:
        ranked = ranked.filter(F.col("_gr") > group_offset)
    ranked = ranked.withColumn("group_rank", F.col("_gr") - F.lit(group_offset))
    extra = ["group_total"] if with_totals else []
    out = ranked.select(
        F.col(group_by),
        "group_rank",
        *extra,
        F.posexplode("hits").alias("_pos", "_h"),
    ).select(
        F.col(group_by),
        F.col("group_rank"),
        (F.col("_pos") + 1).alias("hit_rank"),
        F.col("_h.p.segment_id").alias("segment_id"),
        F.col("_h.p.segment_ord").alias("segment_ord"),
        F.col("_h.p.doc").alias("doc"),
        F.col("_h.p.score").alias("score"),
        *extra,
    )
    return out.orderBy(F.asc("group_rank"), F.asc("hit_rank"))


def search_boosted(
    spark,
    index_dir: str,
    query,
    boost_by: str,
    weight: float = 1.0,
    mode: str = "multiply",
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Relevance combined with a numeric doc-value signal — function
    score (Lucene FunctionScoreQuery / Elasticsearch ``function_score``
    analog; EXTENSION). The classic shape: BM25 text relevance boosted
    by popularity/recency stored as a numeric field at index time.

    ``mode``:
      - ``"multiply"``: final = score * (1 + weight * value)
      - ``"sum"``:      final = score + weight * value

    Docs with a NULL value contribute 0 to the boost (factor 1 /
    addend 0) — they keep their text score, the Lucene missing-value
    convention. Non-linear transforms (log/recency decay) belong at
    index time: store ln(1+stars) as the doc value and boost linearly —
    doc values are written once, queries run many times.

    Returns (segment_id, segment_ord, doc, score, base_score,
    ``boost_by``) in (score desc, segment_ord asc, doc asc) order.

    Scale posture: match evaluation is exhaustive — the boost is
    unbounded by the text score, so WAND's score bound proves nothing
    about the FINAL order (Lucene disables early termination under
    function score for the same reason). The boost value joins from the
    docmap co-keyed on (segment_id, doc) and the global top-k is
    Catalyst's TakeOrderedAndProject over the combined score.
    """
    from pyspark.sql import functions as F

    if mode not in ("multiply", "sum"):
        raise ValueError(f"mode must be 'multiply' or 'sum', got {mode!r}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, boost_by)
    res, _ = search(
        spark,
        index_dir,
        query,
        limit=None,
        scorer=scorer,
        manifest=manifest,
        default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    joined = docmap.select("segment_id", "doc", boost_by).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    v = F.coalesce(F.col(boost_by).cast("double"), F.lit(0.0))
    if mode == "multiply":
        final = F.col("score") * (F.lit(1.0) + F.lit(float(weight)) * v)
    else:
        final = F.col("score") + F.lit(float(weight)) * v
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        final.alias("score"),
        F.col("score").alias("base_score"),
        F.col(boost_by),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_random_score(
    spark,
    index_dir: str,
    query,
    seed,
    key_col: str = "doc_id",
    weight: float = 1.0,
    mode: str = "multiply",
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Deterministic per-document randomness combined with relevance —
    the Elasticsearch ``function_score`` ``random_score`` function
    (EXTENSION). The classic uses: result shuffling that is STABLE for a
    given user (seed = user id, so paging doesn't reshuffle), and
    unbiased corpus sampling of a match set.

    The "random" value is sampling.py's portable hash — U[0,1) from the
    first 32 bits of sha256(seed || key) — NOT an RNG: deterministic,
    partition-invariant, engine-portable (the exact property ES gets by
    hashing seed+field, with an arithmetic an oracle can reproduce).

    ``mode``: ``"multiply"`` → score * (1 + weight*r);
    ``"sum"`` → score + weight*r; ``"replace"`` → weight*r (pure shuffle
    order, relevance discarded — ES random_score with boost_mode
    replace). NULL keys hash over the string 'None' like the sampler.

    Same delivery as search_boosted: exhaustive match set, one co-keyed
    docmap join, TakeOrderedAndProject. Returns (segment_id,
    segment_ord, doc, score, base_score, rand).
    """
    from pyspark.sql import functions as F

    from ..sampling import _unit_hash

    if mode not in ("multiply", "sum", "replace"):
        raise ValueError(f"mode must be multiply/sum/replace, got {mode!r}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    if key_col not in docmap.columns:
        raise ValueError(f"random_score key column {key_col!r} is not in the docmap")
    joined = docmap.select("segment_id", "doc", key_col).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    r = _unit_hash(F.col(key_col), str(seed))
    if mode == "multiply":
        final = F.col("score") * (F.lit(1.0) + F.lit(float(weight)) * r)
    elif mode == "sum":
        final = F.col("score") + F.lit(float(weight)) * r
    else:
        final = F.lit(float(weight)) * r
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        final.alias("score"),
        F.col("score").alias("base_score"),
        r.alias("rand"),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_rank_feature(
    spark,
    index_dir: str,
    query,
    feature: str,
    function: str = "saturation",
    pivot: float | None = None,
    scaling_factor: float | None = None,
    exponent: float | None = None,
    boost: float = 1.0,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Relevance plus a static rank feature — the Elasticsearch
    ``rank_feature`` query (EXTENSION; Lucene FeatureQuery). The feature
    is a positive numeric doc value (popularity, pagerank, url_length);
    the query adds ``boost * S(v)`` to each match's text score, with the
    ES scoring functions:

      - ``saturation``: S = v / (v + pivot)         (pivot REQUIRED here
        — ES's default pivot is a corpus-dependent approximation of the
        geometric mean; an implicit data-dependent constant makes scores
        irreproducible across commits, so we refuse to guess)
      - ``log``:        S = ln(scaling_factor + v)
      - ``sigmoid``:    S = v^exp / (v^exp + pivot^exp)

    Docs with a NULL feature get S = 0 — they keep their text score (in
    ES the rank_feature clause simply doesn't match them; inside a
    SHOULD that adds exactly 0). Negative feature values are invalid at
    query time (ES rejects them at index time; our numeric doc values
    are shared, so the guard lives here) — they raise rather than
    silently producing negative saturation.

    Scale posture = search_boosted: exhaustive match evaluation (the
    feature bonus is unbounded by the text score, so WAND's bound proves
    nothing — Lucene also disables early termination here unless the
    feature is indexed as an impact, which parquet doc values are not),
    one docmap join co-keyed on (segment_id, doc), TakeOrderedAndProject
    for the global top-k.

    Returns (segment_id, segment_ord, doc, score, base_score,
    ``feature``) ordered by (score desc, segment_ord, doc).
    """
    from pyspark.sql import functions as F

    if function == "saturation":
        if pivot is None or pivot <= 0:
            raise ValueError("saturation needs pivot > 0 (no implicit default)")
    elif function == "log":
        if scaling_factor is None or scaling_factor < 1:
            raise ValueError("log needs scaling_factor >= 1 (ES constraint)")
    elif function == "sigmoid":
        if pivot is None or pivot <= 0 or exponent is None or exponent <= 0:
            raise ValueError("sigmoid needs pivot > 0 and exponent > 0")
    else:
        raise ValueError(
            f"function must be saturation/log/sigmoid, got {function!r}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, feature)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    joined = docmap.select("segment_id", "doc", feature).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    v = F.col(feature).cast("double")
    if function == "saturation":
        s = v / (v + F.lit(float(pivot)))
    elif function == "log":
        s = F.log(F.lit(float(scaling_factor)) + v)
    else:
        ve = F.pow(v, F.lit(float(exponent)))
        s = ve / (ve + F.lit(float(pivot) ** float(exponent)))
    bonus = F.when(v.isNull(), F.lit(0.0)).otherwise(F.lit(float(boost)) * s)
    # negative feature values are a data error, not a score: fail the
    # job (ES enforces positivity at index time; our numeric doc values
    # are general-purpose, so the guard lives in the query)
    chk = F.assert_true(
        v.isNull() | (v >= 0), F.lit(f"rank_feature {feature!r} has a value < 0")
    )
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        (F.col("score") + bonus + F.coalesce(chk.cast("double"), F.lit(0.0)))
        .alias("score"),
        F.col("score").alias("base_score"),
        F.col(feature),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out





def search_decayed(
    spark,
    index_dir: str,
    query,
    by: str,
    origin,
    scale,
    *,
    fn: str = "gauss",
    decay: float = 0.5,
    decay_offset=0,
    weight: float = 1.0,
    mode: str = "multiply",
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Distance-decay function score (the Elasticsearch ``function_score``
    decay functions ``gauss`` / ``exp`` / ``linear``; EXTENSION) — the
    recency/proximity boost: relevance shaded by how far a doc-value
    sits from a query-time ``origin``. Unlike :func:`search_boosted`'s
    linear signal, the origin is only known at query time (\"now\", the
    user's location/price point), so it cannot be pre-baked into an
    indexed value.

    ``by`` is a numeric or date doc-value field. For DATE fields
    ``origin`` is an ISO-8601 prefix (same grammar as date range bounds;
    unit starts resolve to the unit's first microsecond) or epoch
    micros, and ``scale`` / ``decay_offset`` are durations (``"10d"``,
    ``"36h"``, micros int). For numeric fields all three are plain
    numbers in the field's units.

    With ``dist = max(0, |value - origin| - decay_offset)`` the function
    value at ``dist`` is (ES formulas, ``decay`` reached exactly at
    ``scale``):

      - ``gauss``:  ``exp(-dist^2 / (2*sigma^2))``, ``sigma^2 = -scale^2 / (2*ln(decay))``
      - ``exp``:    ``exp(ln(decay)/scale * dist)``
      - ``linear``: ``max(0, (s - dist)/s)``, ``s = scale/(1-decay)``

    Docs with a NULL value take function value 1.0 (the ES
    missing-field convention — no decay, text score kept).
    ``mode="multiply"`` (ES boost_mode default): ``final = score *
    (weight * fnval)``; ``mode="sum"``: ``final = score + weight *
    fnval``. Returns (segment_id, segment_ord, doc, score, base_score,
    ``by``) ordered (score desc, segment_ord, doc).

    Scale posture: one docmap co-keyed join onto the match set, decay
    computed as Catalyst column expressions (libm-derived constants
    sigma^2 / lambda / s are folded driver-side), global top-k via
    TakeOrderedAndProject — no UDF, no extra shuffle. Match evaluation
    is exhaustive like search_boosted; note that for multiply mode with
    ``weight <= 1`` the decay factor is <= 1, so a WAND text-score upper
    bound would remain sound — left on the exhaustive path for engine
    uniformity.
    """
    from pyspark.sql import functions as F

    from .parser import _parse_date_span

    if fn not in ("gauss", "exp", "linear"):
        raise ValueError(f"fn must be 'gauss', 'exp' or 'linear', got {fn!r}")
    if mode not in ("multiply", "sum"):
        raise ValueError(f"mode must be 'multiply' or 'sum', got {mode!r}")
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay!r}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(by)
    if fe is None or not (fe.is_numeric or fe.is_date):
        raise ValueError(
            f"{by!r} is not a numeric or date doc-value field of this index"
        )
    if fe.is_date:
        if isinstance(origin, (int, float)) and not isinstance(origin, bool):
            origin_v = float(origin)
        else:
            span = _parse_date_span(str(origin))
            if span is None:
                raise ValueError(
                    f"cannot parse decay origin {origin!r} for date field "
                    f"{by!r} — expected an ISO-8601 prefix or epoch micros"
                )
            origin_v = float(span[0])
        scale_v = float(_parse_duration_us(scale, "scale"))
        offset_v = float(_parse_duration_us(decay_offset, "decay_offset"))
    else:
        origin_v = float(origin)
        scale_v = float(scale)
        offset_v = float(decay_offset)
    if scale_v <= 0:
        raise ValueError(f"scale must be > 0, got {scale!r}")
    if offset_v < 0:
        raise ValueError(f"decay_offset must be >= 0, got {decay_offset!r}")

    import math

    res, _ = search(
        spark,
        index_dir,
        query,
        limit=None,
        scorer=scorer,
        manifest=manifest,
        default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    joined = docmap.select("segment_id", "doc", by).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    dist = F.greatest(
        F.abs(F.col(by).cast("double") - F.lit(origin_v)) - F.lit(offset_v),
        F.lit(0.0),
    )
    if fn == "gauss":
        sigma2 = -(scale_v * scale_v) / (2.0 * math.log(decay))
        fnval = F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    elif fn == "exp":
        lam = math.log(decay) / scale_v
        fnval = F.exp(F.lit(lam) * dist)
    else:
        s = scale_v / (1.0 - decay)
        fnval = F.greatest((F.lit(s) - dist) / F.lit(s), F.lit(0.0))
    # NULL doc value -> function 1.0 (no decay), the ES missing
    # convention; weight multiplies the function RESULT (ES semantics),
    # so it applies to missing docs too
    fnval = F.lit(float(weight)) * F.when(
        F.col(by).isNull(), F.lit(1.0)
    ).otherwise(fnval)
    if mode == "multiply":
        final = F.col("score") * fnval
    else:
        final = F.col("score") + fnval
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        final.alias("score"),
        F.col("score").alias("base_score"),
        F.col(by),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_distance_feature(
    spark,
    index_dir: str,
    query,
    field: str,
    origin,
    pivot,
    boost: float = 1.0,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Relevance plus closeness to a query-time origin — the
    Elasticsearch ``distance_feature`` query (EXTENSION). Each match's
    text score gains ``boost * pivot / (pivot + dist)`` where
    ``dist = |value − origin|``: the bonus is 1·boost AT the origin and
    exactly boost/2 at ``pivot`` away — the ES definition, a reciprocal
    saturation rather than decay's configurable curves (distance_feature
    is the cheap, monotonic "closer is better" shape; use
    search_decayed when the falloff curve itself matters).

    ``field`` is a numeric or DATE doc value; for dates ``origin`` is an
    ISO-8601 prefix or epoch micros and ``pivot`` a duration ("10d",
    "36h", micros int) — the same grammar as search_decayed. Docs with a
    NULL value add exactly 0 (in ES the clause doesn't match them;
    inside a SHOULD that is a zero addend) — they keep their text score.

    Scale posture = search_boosted: exhaustive match evaluation (the
    bonus is unbounded by the text score, so WAND's bound proves
    nothing), one docmap join co-keyed on (segment_id, doc),
    TakeOrderedAndProject for the global top-k. Returns (segment_id,
    segment_ord, doc, score, base_score, ``field``)."""
    from pyspark.sql import functions as F

    # module-scope import, not copied from search_decayed's local one:
    # in the pre-split monolith this name was ONLY bound inside
    # search_decayed, so the date-origin path here raised NameError —
    # a latent bug surfaced by the round-4 module split (tested now)
    from .parser import _parse_date_span

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or not (fe.is_numeric or fe.is_date):
        raise ValueError(
            f"{field!r} is not a numeric or date doc-value field of this index"
        )
    if fe.is_date:
        if isinstance(origin, (int, float)) and not isinstance(origin, bool):
            origin_v = float(origin)
        else:
            span = _parse_date_span(str(origin))
            if span is None:
                raise ValueError(
                    f"cannot parse distance_feature origin {origin!r} for "
                    f"date field {field!r} — expected an ISO-8601 prefix or "
                    f"epoch micros"
                )
            origin_v = float(span[0])
        pivot_v = float(_parse_duration_us(pivot, "pivot"))
    else:
        origin_v = float(origin)
        pivot_v = float(pivot)
    if pivot_v <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot!r}")
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    joined = docmap.select("segment_id", "doc", field).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    v = F.col(field).cast("double")
    dist = F.abs(v - F.lit(origin_v))
    bonus = F.when(v.isNull(), F.lit(0.0)).otherwise(
        F.lit(float(boost)) * F.lit(pivot_v) / (F.lit(pivot_v) + dist)
    )
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        (F.col("score") + bonus).alias("score"),
        F.col("score").alias("base_score"),
        F.col(field),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_script_score(
    spark,
    index_dir: str,
    query,
    expr: str,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Relevance rewritten by an arbitrary expression — the
    Elasticsearch ``script_score`` query (EXTENSION). ``expr`` is a
    Spark-SQL expression string over ``_score`` (the text relevance)
    and any docmap column (identity, stored fields, numeric/keyword/date
    doc values), e.g.::

        "_score * log(2.0 + n_stars) / (1 + datediff(now(), pub_date))"
        "sqrt(_score) + CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END"

    Where ES compiles a per-doc Painless script, the expression compiles
    ONCE into Catalyst columns inside the scored join — whole-stage
    codegen, no scripting engine, no per-row interpreter (the same
    design note as runtime_fields). ES requires script scores to be
    non-negative; a negative result fails the job via a Catalyst assert
    rather than silently reordering.

    Scale posture = search_boosted: exhaustive match set (the expression
    is unconstrained, so no score bound survives it), one co-keyed
    docmap join, TakeOrderedAndProject. Returns (segment_id,
    segment_ord, doc, score, base_score)."""
    from pyspark.sql import functions as F

    try:  # pyspark >= 3.4 canonical location
        from pyspark.errors import AnalysisException, ParseException
    except ImportError:  # pragma: no cover - older pyspark
        from pyspark.sql.utils import AnalysisException, ParseException

    if not expr or not str(expr).strip():
        raise ValueError("script_score needs a non-empty expression")
    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    if "_score" in docmap.columns:
        raise ValueError("docmap already has a _score column — rename it")
    joined = docmap.join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    ).withColumnRenamed("score", "_score")
    try:
        new_score = F.expr(str(expr)).cast("double")
        chk = F.assert_true(
            new_score >= 0, F.lit("script_score produced a negative score")
        )
        out = joined.select(
            "segment_id",
            "segment_ord",
            "doc",
            (new_score + F.coalesce(chk.cast("double"), F.lit(0.0))).alias(
                "score"
            ),
            F.col("_score").alias("base_score"),
        )
        out.schema  # force analysis so a bad expression fails HERE
    except (AnalysisException, ParseException) as e:
        raise ValueError(
            f"script_score expression {expr!r} failed to compile against "
            f"the docmap columns {docmap.columns} + _score: {e}"
        ) from None
    out = out.orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


# field_value_factor modifiers, exactly the Elasticsearch table:
# log-family is COMMON log (base 10), ln-family natural; the +1/+2
# variants shift the argument, not the result. Each entry maps the
# already-factored value v (= factor * doc value) to the function
# score; domain violations (log of <= 0, sqrt of < 0, 1/0) fail the
# job loudly below rather than producing NaN/Infinity ranks.
_FVF_MODIFIERS = (
    "none", "log", "log1p", "log2p", "ln", "ln1p", "ln2p",
    "square", "sqrt", "reciprocal",
)


def search_field_value_factor(
    spark,
    index_dir: str,
    query,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float | None = None,
    boost_mode: str = "multiply",
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Relevance scaled by a numeric doc value — the Elasticsearch
    ``function_score`` / ``field_value_factor`` function (EXTENSION; the
    reference has text scoring only). The function value is
    ``modifier(factor * v)`` with the ES modifier table (``log``-family
    base 10, ``ln``-family natural, ``log1p`` = log10(x+1), ``square``,
    ``sqrt``, ``reciprocal`` = 1/x); ``boost_mode`` combines it with the
    text score: ``multiply`` (the ES default) or ``sum``.

    ES contracts kept exactly:
      - a doc whose field is NULL uses ``missing`` when given, else the
        query FAILS (ES raises "Missing value for field" per-doc; a
        silent 0 would quietly multiply scores away) — via a Catalyst
        assert, not a per-row Python check;
      - a modifier-domain violation (``log``/``ln`` of a non-positive
        argument, ``sqrt`` of a negative, ``reciprocal`` of 0) fails the
        job — ES returns NaN/-Infinity scores it then rejects; we stop
        at the source;
      - a negative function result (possible only via ``none``/``ln``
        variants on sub-1 arguments) is allowed, matching ES — the
        assert guards domain errors, not sign.

    Where ES evaluates the function per doc per shard, here it compiles
    ONCE into Catalyst columns inside the scored docmap join —
    whole-stage codegen over the match set, no per-row scripting.
    Scale posture = search_script_score: exhaustive match evaluation
    (the function is unbounded w.r.t. the text score, so WAND's bound
    proves nothing), one co-keyed docmap join, TakeOrderedAndProject.

    Returns (segment_id, segment_ord, doc, score, base_score,
    ``field``) ordered by (score desc, segment_ord asc, doc asc).
    """
    from pyspark.sql import functions as F

    if modifier not in _FVF_MODIFIERS:
        raise ValueError(
            f"modifier must be one of {_FVF_MODIFIERS}, got {modifier!r}"
        )
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(
            f"boost_mode must be 'multiply' or 'sum', got {boost_mode!r}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, field)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    joined = docmap.select("segment_id", "doc", field).join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    raw = F.col(field).cast("double")
    if missing is not None:
        raw = F.coalesce(raw, F.lit(float(missing)))
    else:
        # when/otherwise, NOT `raw + coalesce(assert_true, 0)`: Add's
        # codegen short-circuits on a NULL left operand, so an assert on
        # the right would never evaluate for exactly the rows it guards.
        raw = F.when(raw.isNotNull(), raw).otherwise(
            F.assert_true(
                F.lit(False),
                F.lit(
                    f"field_value_factor: missing value for field "
                    f"{field!r} and no 'missing' parameter (the ES "
                    "contract)"
                ),
            ).cast("double")
        )
    v = raw * F.lit(float(factor))
    LOG10E = 0.4342944819032518  # log10(e): DuckDB/Spark share ln; log10 = ln * this
    if modifier == "none":
        fn, dom = v, None
    elif modifier == "log":
        fn, dom = F.log(v) * F.lit(LOG10E), v > 0
    elif modifier == "log1p":
        fn, dom = F.log(v + 1.0) * F.lit(LOG10E), v > -1.0
    elif modifier == "log2p":
        fn, dom = F.log(v + 2.0) * F.lit(LOG10E), v > -2.0
    elif modifier == "ln":
        fn, dom = F.log(v), v > 0
    elif modifier == "ln1p":
        fn, dom = F.log(v + 1.0), v > -1.0
    elif modifier == "ln2p":
        fn, dom = F.log(v + 2.0), v > -2.0
    elif modifier == "square":
        fn, dom = v * v, None
    elif modifier == "sqrt":
        fn, dom = F.sqrt(v), v >= 0
    else:  # reciprocal
        fn, dom = F.lit(1.0) / v, v != 0
    if dom is not None:
        # Same short-circuit trap: F.log of a non-positive is NULL in
        # Spark, which would skip an additive assert. The assert must be
        # the branch actually evaluated on violating rows.
        fn = F.when(dom, fn).otherwise(
            F.assert_true(
                F.lit(False),
                F.lit(
                    f"field_value_factor: modifier {modifier!r} domain "
                    f"error on {field!r} (factor={factor}) — ES would "
                    "produce NaN/Infinity scores here"
                ),
            ).cast("double")
        )
    base = F.col("score")
    new_score = base * fn if boost_mode == "multiply" else base + fn
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        new_score.cast("double").alias("score"),
        base.alias("base_score"),
        F.col(field),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


# The score handed to pinned docs: Float.MAX_VALUE / 2, the constant
# Lucene's pinned-query module anchors promotions at — any organic
# relevance is astronomically below it, and successive pins step down
# by 1.0 so the requested order is the score order.
PINNED_SCORE_BASE = 1.7014118346046923e38


def search_pinned(
    spark,
    index_dir: str,
    ids,
    query,
    key_col: str = "doc_id",
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Promote selected documents above every organic match — the
    Elasticsearch ``pinned`` query (EXTENSION; Lucene pinned module).
    ``ids`` lists ``key_col`` identities in the EXACT order they should
    rank; they are returned first (score = PINNED_SCORE_BASE − position,
    the Lucene anchoring) whether or not they match ``query`` — the ES
    contract: pinning is dismax(ids-at-huge-score, organic), so a pinned
    doc outside the organic match set still surfaces. Organic matches
    follow in relevance order with pinned ids removed (no duplicates).
    Tombstoned docs never surface, pinned or not; a pinned id absent
    from the corpus is simply skipped (the ES behavior).

    Scale posture: the pinned side is get_docs — an isin() pushed into
    the parquet scan touching only straddling row groups; the organic
    side is one normal search; the union's global order is
    TakeOrderedAndProject. ``ids`` must be a bounded promotion list (it
    travels in the plan as literals), not a join table — for bulk
    score overrides use search_boosted with an indexed signal.

    Returns (segment_id, segment_ord, doc, score, pinned)."""
    from pyspark.sql import functions as F

    ids = list(ids)
    if not ids:
        raise ValueError("pinned needs >= 1 id (otherwise just search)")
    if len(ids) > 1000:
        raise ValueError(
            f"{len(ids)} pinned ids — pinning is a bounded promotion "
            f"list (<= 1000); bulk overrides belong in an indexed signal"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    pinned_rows = get_docs(spark, index_dir, ids, key_col, manifest=manifest)
    key_t = pinned_rows.schema[key_col].dataType
    # position lookup as a literal when-chain: ids is bounded above
    pos = None
    for i, v in enumerate(ids):
        cond = F.col(key_col) == F.lit(v).cast(key_t)
        pos = F.when(cond, F.lit(i)) if pos is None else pos.when(cond, F.lit(i))
    ords = {s.segment_id: i for i, s in enumerate(manifest.sorted_segments())}
    ord_map = F.create_map(
        *[x for sid, i in ords.items() for x in (F.lit(sid), F.lit(i))]
    )
    pinned_df = pinned_rows.select(
        "segment_id",
        ord_map[F.col("segment_id")].alias("segment_ord"),
        "doc",
        (F.lit(PINNED_SCORE_BASE) - pos.cast("double")).alias("score"),
        F.lit(True).alias("pinned"),
    )
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    organic = (
        docmap.select("segment_id", "doc", key_col)
        .join(
            res.select("segment_id", "segment_ord", "doc", "score"),
            ["segment_id", "doc"],
            "inner",
        )
        .filter(~F.col(key_col).isin(*[F.lit(v).cast(key_t) for v in ids]))
        .select(
            "segment_id", "segment_ord", "doc", "score",
            F.lit(False).alias("pinned"),
        )
    )
    out = pinned_df.unionByName(organic).orderBy(
        F.desc("score"), F.asc("segment_ord"), F.asc("doc")
    )
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def rescore(
    spark,
    index_dir: str,
    query,
    rescore_query,
    window: int = 100,
    weight: float = 1.0,
    limit: int | None = 10,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    default_fields: list[str] | None = None,
):
    """Two-phase ranking (Lucene ``Rescorer`` / Elasticsearch ``rescore``
    analog; EXTENSION): rank the top ``window`` hits of a cheap first-pass
    query, then re-order ONLY that window by
    ``final = first_pass + weight * rescore_score``. The canonical use:
    a WAND-prunable term union finds candidates, an exact phrase (or any
    expensive query) refines the head — the expensive query's cost is
    bounded by the window, not the corpus.

    Docs in the window that do not match ``rescore_query`` keep their
    first-pass score (rescore contribution 0 — Elasticsearch
    ``query_weight=1/rescore_query_weight=weight`` convention).

    Returns (segment_id, segment_ord, doc, score, base_score,
    rescore_score) rows, top ``limit`` of the window by
    (score desc, segment_ord asc, doc asc).

    Scale posture: the first pass keeps WAND + per-segment top-k (it is
    an ordinary ``search``); the second query's match set joins the
    window on (segment_id, doc) and only window-sized rows reach the
    final TakeOrderedAndProject. Both passes ride one manifest pin, so
    a concurrent merge cannot split the view.
    """
    from pyspark.sql import functions as F

    if window < 1:
        raise ValueError("window must be >= 1")
    if manifest is None:
        manifest = load_manifest(index_dir)
    base, _ = search(
        spark, index_dir, query, limit=window, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    resc, _ = search(
        spark, index_dir, rescore_query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    joined = base.select(
        "segment_id", "segment_ord", "doc", F.col("score").alias("base_score")
    ).join(
        resc.select(
            "segment_id", "doc", F.col("score").alias("rescore_score")
        ),
        ["segment_id", "doc"],
        "left",
    )
    r = F.coalesce(F.col("rescore_score"), F.lit(0.0))
    out = joined.select(
        "segment_id",
        "segment_ord",
        "doc",
        (F.col("base_score") + F.lit(float(weight)) * r).alias("score"),
        "base_score",
        r.alias("rescore_score"),
    ).orderBy(F.desc("score"), F.asc("segment_ord"), F.asc("doc"))
    if limit is not None:
        out = out.limit(limit)
    return out


def more_like_this_doc(
    spark,
    index_dir: str,
    field_name: str,
    value,
    key_col: str,
    exclude_self: bool = True,
    manifest: Manifest | None = None,
    **kw,
):
    """More-like-this seeded by a DOCUMENT IDENTITY instead of raw text —
    the ES ``more_like_this`` ``like: [{_id}]`` form. The seed doc's
    stored field value (store=True required) feeds the normal
    ``more_like_this``; with ``exclude_self`` (the ES default) the seed
    doc is dropped from the ranking. Extra kwargs pass through
    (max_query_terms, scorer, limit, ...). Tombstoned/unknown seeds
    raise (a deleted doc cannot seed)."""
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field_name)
    if fe is None or fe.is_doc_value or not fe.store:
        raise ValueError(
            f"{field_name!r} must be a store=True text field to seed "
            "more_like_this by document identity"
        )
    rows = get_docs(spark, index_dir, [value], key_col, manifest=manifest).collect()
    if not rows:
        raise ValueError(
            f"no live document with {key_col}={value!r} (deleted docs "
            "cannot seed more-like-this)"
        )
    seed = rows[0]
    limit = kw.pop("limit", 10)
    fetch = None if limit is None else limit + (1 if exclude_self else 0)
    res, cnt = more_like_this(
        spark, index_dir, field_name, seed[field_name] or "",
        manifest=manifest, limit=fetch, **kw,
    )
    if exclude_self:
        from pyspark.sql import functions as F

        res = res.filter(
            ~(
                (F.col("segment_id") == seed["segment_id"])
                & (F.col("doc") == seed["doc"])
            )
        )
        if limit is not None:
            res = res.limit(limit)
    return res, cnt


def more_like_this(
    spark,
    index_dir: str,
    field_name: str,
    text: str,
    max_query_terms: int = 25,
    min_tf: int = 1,
    min_doc_freq: int = 1,
    limit: int | None = 10,
    offset: int = 0,
    scorer: str = SCORER_TFIDF,
    manifest: Manifest | None = None,
    with_count: bool = False,
):
    """Find documents similar to ``text`` (Lucene MoreLikeThis analog —
    EXTENSION, the reference has no similarity query).

    Interesting-term selection follows Lucene's shape: analyze the text
    with the field's analyzer, keep terms with tf >= ``min_tf`` and
    global doc_freq >= ``min_doc_freq`` (and present in the index), rank
    by tf·idf with the ENGINE's idf (``1 + ln(N/(1+df))``), tie-break
    term ASC (deterministic), take ``max_query_terms``, then run the
    union of those terms through the normal search path (so WAND, the
    batched stats binding, tombstones, and the pinned tie-break order
    all apply). When the text comes from an indexed document, that
    document itself typically ranks first — filter it by identity
    downstream if undesired.

    Returns ``(results_df, count)`` exactly like :func:`search`.

    Scale posture: the driver-side work is one analyzer pass over ONE
    document's text plus the same pyarrow term-dict lookup the stats
    binding does; candidate selection is O(distinct terms) on the
    driver. The cluster only ever sees the final (capped) term union.
    """
    import math

    from collections import Counter

    from ..analysis import get_analyzer
    from .parser import BooleanQuery, TermQuery

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field_name)
    if fe is None or fe.is_doc_value:
        raise ValueError(f"{field_name!r} is not a text field of this index")
    tf = Counter(get_analyzer(fe.analyzer).analyze_one(text))
    cand = [TermQuery(fe.id, t) for t, c in tf.items() if c >= min_tf]
    doc_freqs, n, _ = bind_stats_for_terms(spark, index_dir, manifest, cand)
    scored = []
    for tq in cand:
        df = doc_freqs.get((fe.id, tq.term), 0)
        if df < max(min_doc_freq, 1):
            continue
        idf = 1.0 + math.log(n / (1.0 + df))
        scored.append((tf[tq.term] * idf, tq.term))
    sel = sorted(scored, key=lambda p: (-p[0], p[1]))[:max_query_terms]
    if not sel:
        from .parser import EmptyQuery

        return search(
            spark, index_dir, EmptyQuery(), limit=limit, offset=offset,
            scorer=scorer, manifest=manifest, with_count=with_count,
        )
    q = (
        TermQuery(fe.id, sel[0][1])
        if len(sel) == 1
        else BooleanQuery.union(*[TermQuery(fe.id, t) for _, t in sel])
    )
    return search(
        spark, index_dir, q, limit=limit, offset=offset, scorer=scorer,
        manifest=manifest, with_count=with_count,
    )


