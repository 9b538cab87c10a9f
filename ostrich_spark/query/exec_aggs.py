"""Aggregation plane split from exec.py (mechanical move, round 4):
facets, bucket/metric/pipeline-feeding aggregations, statistical aggs,
significant terms/text, histograms, composite paging, top_hits /
top_metrics, and more-like-this feeders. Public imports are unchanged
via the ``exec`` facade."""

from __future__ import annotations

import json
import math
import os
from functools import reduce
from operator import or_

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
    json,
    load_manifest,
    math,
    np,
    pd,
    read_docmap,
    read_postings,
    search,
    search_many,
)


def facet_counts(
    spark,
    index_dir: str,
    query,
    by: list[str] | str,
    join_df=None,
    join_on: list[str] | str | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Facet counts over a query's FULL match set: one row per distinct
    value of ``by`` with the number of matching docs (``n_docs``).

    ``by`` columns are read from the docmap (identity + store=True
    columns); pass ``join_df``/``join_on`` to facet on columns of the
    source table instead (matches join to it on the identity columns).

    Scale posture: the match set is exhaustive and therefore unbounded —
    it is NOT broadcast (unlike attach_docmap's top-k join); the facet
    groupBy partial-aggregates map-side, so the shuffle carries one row
    per (partition, facet value), and the optional source join is a plain
    key join AQE can re-plan. EXTENSION: the reference has no facets —
    its collectors return docs/counts only (/root/reference/reader/
    search.go:21-66)."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    by = [by] if isinstance(by, str) else list(by)
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
    matched = docmap.join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner")
    if join_df is not None:
        join_on = [join_on] if isinstance(join_on, str) else list(join_on or [])
        matched = matched.select(*join_on).join(join_df, join_on, "inner")
    return matched.groupBy(*by).agg(F.count("*").alias("n_docs"))


_FACET_METRIC_FNS = ("count", "min", "max", "sum", "avg",
                     "count_distinct", "approx_count_distinct",
                     "weighted_avg", "max_by", "min_by",
                     "percentile", "approx_percentile")


def _metric_aggs(F, metrics: dict) -> list:
    """Shared metric-sub-agg grammar (facet_stats / range_agg /
    filters_agg / composite): output column -> (fn, column[, rsd]).
    ``weighted_avg`` takes (fn, value_col, weight_col) — the ES
    weighted_avg agg: sum(v*w)/sum(w over rows where v is present),
    so a NULL value drops its weight from the denominator too.
    ``percentile`` takes (fn, col, p) with 0 <= p <= 1 — EXACT linear
    interpolation (SQL percentile_cont; one sketch-free pass, the
    values ride the shuffle like count_distinct's — same documented
    trade). ``approx_percentile`` (fn, col, p[, accuracy]) is the
    100 TB path: a GK sketch that partial-aggregates map-side like any
    sum (the ES percentiles agg is likewise approximate — t-digest —
    so approximate-by-default matches ES, only the sketch differs;
    returns an ELEMENT of the value set, not an interpolation)."""
    aggs = []
    for out, spec in metrics.items():
        fn, col, *rest = spec
        if fn not in _FACET_METRIC_FNS:
            raise ValueError(
                f"metric {out!r}: fn must be one of {_FACET_METRIC_FNS}, got {fn!r}"
            )
        if fn in ("percentile", "approx_percentile"):
            if not rest:
                raise ValueError(
                    f"metric {out!r}: {fn} needs (fn, col, p[, accuracy])"
                )
            p = float(rest[0])
            if not 0.0 <= p <= 1.0:
                raise ValueError(
                    f"metric {out!r}: percentile p must be in [0, 1], got {p}"
                )
            if fn == "percentile":
                aggs.append(F.percentile(col, F.lit(p)).alias(out))
            else:
                acc = [F.lit(int(rest[1]))] if len(rest) > 1 else []
                aggs.append(F.percentile_approx(col, F.lit(p), *acc).alias(out))
        elif fn == "count_distinct":
            aggs.append(F.countDistinct(col).alias(out))
        elif fn == "approx_count_distinct":
            aggs.append(F.approx_count_distinct(col, *rest).alias(out))
        elif fn in ("max_by", "min_by"):
            # ES top_metrics shape: the value of `col` at the bucket's
            # extreme of the sort column. Ties on the sort column are
            # NONDETERMINISTIC (here and in DuckDB's arg_max alike) —
            # sort by a unique column (an id) when determinism matters.
            if not rest:
                raise ValueError(
                    f"metric {out!r}: {fn} needs (fn, value, sort_col)"
                )
            aggs.append(getattr(F, fn)(F.col(col), F.col(rest[0])).alias(out))
        elif fn == "weighted_avg":
            if not rest:
                raise ValueError(
                    f"metric {out!r}: weighted_avg needs (fn, value, weight)"
                )
            w = rest[0]
            aggs.append(
                (
                    F.sum(F.col(col) * F.col(w))
                    / F.sum(F.when(F.col(col).isNotNull(), F.col(w)))
                ).alias(out)
            )
        else:
            aggs.append(getattr(F, fn)(col).alias(out))
    return aggs


def facet_stats(
    spark,
    index_dir: str,
    query,
    by: list[str] | str,
    metrics: dict,
    join_df=None,
    join_on: list[str] | str | None = None,
    missing=None,
    min_doc_count: int = 1,
    order_by=None,
    size: int | None = None,
    include: str | None = None,
    exclude: str | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Bucket aggregation with metric sub-aggregations over a query's
    FULL match set — the Elasticsearch terms-aggregation-with-sub-aggs
    shape (EXTENSION; the reference's collectors return docs/counts
    only). One row per distinct ``by`` value carrying ``n_docs`` plus
    every requested metric: facet a code-corpus query by ``lang`` and
    get per-language hit counts, average file size, and distinct-repo
    counts in ONE pass.

    ``metrics`` maps output column -> (fn, column[, rsd]) where fn is
    one of count / min / max / sum / avg / count_distinct /
    approx_count_distinct (HLL++, optional third element = relative
    standard deviation). Columns come from the docmap (identity +
    store=True + numeric doc values), or from ``join_df``/``join_on``
    like facet_counts.

    Scale posture: identical to facet_counts — the match set is never
    collected or broadcast; all metrics partial-aggregate map-side in
    the SAME groupBy (one shuffle for the whole report). count_distinct
    is the one exception Spark expands internally (exact distinct needs
    the values through the shuffle) — at 100 TB prefer
    approx_count_distinct, whose HLL sketch partial-aggregates like any
    sum. EXTENSION rationale: at corpus scale "facet + stats per
    bucket" is the standard dashboard query; issuing one job per metric
    re-evaluates the match set N times.

    ES terms-agg ergonomics (all optional, all post-/pre-aggregation
    column ops — the one-shuffle posture is unchanged):

    - ``missing``: substitute key for NULL bucket values (the ES
      ``missing`` param) — a scalar (single ``by`` column) or a dict
      {col: substitute}; without it NULL keys form their own SQL-NULL
      bucket as before.
    - ``min_doc_count``: drop buckets with fewer matched docs (ES
      default 1 ≡ keep everything that has a doc; our default keeps the
      historic behavior — every bucket).
    - ``include`` / ``exclude``: ANCHORED regex filters on the bucket
      key (the ES semantics — the whole term must match), single
      ``by`` column only, applied BEFORE aggregation so excluded keys
      never shuffle.
    - ``order_by``: list of (column, "asc"|"desc") over ``n_docs``,
      metric outputs, or key columns; ``size``: top-N cut after
      ordering. ``size`` without ``order_by`` uses the ES default
      (doc-count desc). The key columns are ALWAYS appended ascending
      as final tiebreaks so the cut is deterministic (ES's shard-level
      tie behavior is not; documented difference). The cut is a
      TakeOrderedAndProject over one-row-per-bucket aggregates —
      bounded by bucket cardinality, never the match set.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    by = [by] if isinstance(by, str) else list(by)
    if min_doc_count < 1:
        raise ValueError("min_doc_count must be >= 1")
    if (include is not None or exclude is not None) and len(by) != 1:
        raise ValueError("include/exclude need exactly one `by` column "
                         "(the ES term-regex semantics)")
    if missing is not None and not isinstance(missing, dict):
        if len(by) != 1:
            raise ValueError("scalar `missing` needs exactly one `by` "
                             "column — pass a {col: substitute} dict")
        missing = {by[0]: missing}
    if missing is not None and (bad := set(missing) - set(by)):
        raise ValueError(f"missing substitutes for non-key columns: {sorted(bad)}")
    if order_by is not None:
        order_by = list(order_by)
        valid = {"n_docs", *metrics, *by}
        for col, direction in order_by:
            if col not in valid:
                raise ValueError(
                    f"order_by column {col!r} not one of {sorted(valid)}"
                )
            if direction not in ("asc", "desc"):
                raise ValueError(f"order_by direction must be asc/desc, "
                                 f"got {direction!r}")
    elif size is not None:
        order_by = [("n_docs", "desc")]  # the ES default ordering
    aggs = [F.count("*").alias("n_docs")] + _metric_aggs(F, metrics)
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
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    if join_df is not None:
        join_on = [join_on] if isinstance(join_on, str) else list(join_on or [])
        # keep docmap-side metric columns (e.g. a numeric doc value
        # averaged per source-table bucket) through the source join —
        # including weighted_avg's weight column (spec[2])
        keep = [
            c
            for spec in metrics.values()
            for c in spec[1:]
            if isinstance(c, str) and c in matched.columns
            and c not in join_on and c not in join_df.columns
        ]
        matched = matched.select(*join_on, *dict.fromkeys(keep)).join(
            join_df, join_on, "inner"
        )
    if missing is not None:
        for col, sub in missing.items():
            matched = matched.withColumn(
                col,
                F.coalesce(F.col(col), F.lit(sub).cast(matched.schema[col].dataType)),
            )
    if include is not None:
        matched = matched.filter(
            F.col(by[0]).cast("string").rlike(f"^(?:{include})$")
        )
    if exclude is not None:
        matched = matched.filter(
            F.col(by[0]).isNull()
            | ~F.col(by[0]).cast("string").rlike(f"^(?:{exclude})$")
        )
    out = matched.groupBy(*by).agg(*aggs)
    if min_doc_count > 1:
        out = out.filter(F.col("n_docs") >= min_doc_count)
    if order_by is not None:
        cols = [
            F.col(c).desc() if d == "desc" else F.col(c).asc()
            for c, d in order_by
        ]
        ordered = {c for c, _ in order_by}
        cols += [F.col(c).asc() for c in by if c not in ordered]
        out = out.orderBy(*cols)
        if size is not None:
            out = out.limit(int(size))
    return out


def sampler_facet(
    spark,
    index_dir: str,
    query,
    by: list[str] | str,
    metrics: dict | None = None,
    shard_size: int = 100,
    diversify: str | None = None,
    max_docs_per_value: int = 1,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Bucket aggregation over only the BEST-scoring sample of a match
    set — the Elasticsearch ``sampler`` / ``diversified_sampler``
    aggregation analogs (EXTENSION). The use case: "what do the most
    RELEVANT hits look like" without the long tail of barely-matching
    docs polluting the buckets, at a bounded cost.

    ``shard_size`` keeps the top docs per SEGMENT (score desc, doc asc —
    the pinned tie-break), the analog of ES's per-shard sample; totals
    therefore depend on segment count exactly as ES's depend on shard
    count (documented, inherent to sampling-before-merge). With
    ``diversify`` (a doc-value column) at most ``max_docs_per_value``
    docs per distinct value enter the sample, best-first — the ES
    diversified_sampler bias killer (e.g. one doc per author). NULL
    diversify values form one group. Selection is "cap per value, then
    top shard_size", which equals ES's best-first-with-skips iteration.

    ``by``/``metrics`` follow the facet_stats grammar over the sampled
    set. Returns (by..., n_docs, *metrics).

    Scale posture: ranking is a row_number window PARTITIONED BY
    SEGMENT — each segment's match set ranks in parallel, no global
    sort; the sample (segments × shard_size rows) then feeds one
    partial-aggregated groupBy. The match set never hits the driver."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    if max_docs_per_value < 1:
        raise ValueError(
            f"max_docs_per_value must be >= 1, got {max_docs_per_value}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    by = [by] if isinstance(by, str) else list(by)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    order = [F.desc("score"), F.asc("doc")]
    if diversify is not None:
        _doc_value_field_entry(manifest, diversify)
        w_div = Window.partitionBy("segment_ord", diversify).orderBy(*order)
        matched = matched.withColumn(
            "__divrank", F.row_number().over(w_div)
        ).filter(F.col("__divrank") <= max_docs_per_value)
    w_seg = Window.partitionBy("segment_ord").orderBy(*order)
    sample = matched.withColumn("__rank", F.row_number().over(w_seg)).filter(
        F.col("__rank") <= shard_size
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")] + _metric_aggs(F, metrics or {})
    return sample.groupBy(*by).agg(*aggs)


def random_sampler_facet(
    spark,
    index_dir: str,
    query,
    by: list[str] | str,
    metrics: dict | None = None,
    probability: float = 0.1,
    seed: int = 0,
    key_col: str = "doc_id",
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``random_sampler`` aggregation analog: run the
    bucket/metric report over a random ``probability`` fraction of the
    match set — the "this dashboard doesn't need exact numbers, make it
    20× cheaper" agg. ES's probability rule is mirrored verbatim:
    0 < p <= 0.5 or exactly 1 (ES rejects the in-between range because
    the sampling machinery stops paying for itself).

    Where ES draws per-shard random docs (results change run to run),
    the draw here is the curation module's DETERMINISTIC unit hash on
    ``key_col`` (salted with ``seed``): the same docs are sampled under
    any partitioning, reruns reproduce bit-identically, and the DuckDB
    oracle recomputes the exact sample. A different ``seed`` gives an
    independent draw (the ES seed param).

    Output per bucket: ``n_docs`` = RAW sampled count, ``n_docs_est`` =
    n_docs / p (the scaled estimate ES reports as doc_count — we keep
    both, the raw count is the honest audit trail). Additive metrics
    (``sum`` / ``count``) are scaled by 1/p in place, the ES behavior;
    location metrics (avg/min/max/percentiles/…) stay unscaled sample
    statistics, also the ES behavior.

    Scale posture: the hash filter is one JVM-side predicate BEFORE the
    aggregation shuffle — (1−p) of the match set never shuffles, which
    is the entire point; then one partial-aggregated groupBy, identical
    to facet_stats."""
    from pyspark.sql import functions as F

    from ..sampling import _unit_hash

    if not (0.0 < probability <= 0.5 or probability == 1.0):
        raise ValueError(
            f"probability must be in (0, 0.5] or exactly 1 (the ES "
            f"random_sampler rule), got {probability}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    by = [by] if isinstance(by, str) else list(by)
    metrics = metrics or {}
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    if key_col not in matched.columns:
        raise ValueError(
            f"key_col {key_col!r} not a docmap column ({matched.columns})"
        )
    salt = f"rsampler-{int(seed)}-"
    sampled = matched.filter(
        _unit_hash(F.col(key_col), salt) < F.lit(float(probability))
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")] + _metric_aggs(F, metrics)
    out = sampled.groupBy(*by).agg(*aggs)
    inv = 1.0 / float(probability)
    out = out.withColumn("n_docs_est", F.col("n_docs") * F.lit(inv))
    for name, spec in metrics.items():
        if spec[0] in ("sum", "count"):
            out = out.withColumn(name, F.col(name) * F.lit(inv))
    order = by + ["n_docs", "n_docs_est"] + [m for m in metrics]
    return out.select(*order)


def ip_prefix_agg(
    spark,
    index_dir: str,
    query,
    field: str,
    prefix_length: int,
    is_ipv6: bool = False,
    min_doc_count: int = 1,
    metrics: dict | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``ip_prefix`` aggregation analog: bucket a
    match set's ip field by NETWORK — "which /24s are hitting this
    endpoint". ``prefix_length`` is the network bits (0–32 for the
    IPv4 view, 0–128 for ``is_ipv6=True``); with ``is_ipv6=False``
    only v4-mapped addresses bucket (a v4 prefix never matches a v6
    address — the module's inherited ES rule), and the key renders as
    dotted-quad ``a.b.c.0/len``; the v6 view keys on the canonical
    hex network (rendering stated). ``min_doc_count`` / ``metrics``
    follow the facet grammar; buckets order by network ascending
    (numeric == lexicographic on the fixed-width hex).

    Scale posture: the network key is pure string/bit arithmetic over
    the stored 32-hex docmap column (substring + one masked digit —
    whole-stage codegen), then ONE partial-aggregated groupBy; no
    decode, no UDF, nothing collects."""
    from pyspark.sql import functions as F

    max_len = 128 if is_ipv6 else 32
    if not (0 <= prefix_length <= max_len):
        raise ValueError(
            f"prefix_length must be in [0, {max_len}] for "
            f"{'v6' if is_ipv6 else 'v4'}, got {prefix_length}"
        )
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or not fe.is_ip:
        raise ValueError(f"{field!r} is not an ip field of this index")
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    ).filter(F.col(field).isNotNull())
    if not is_ipv6:
        # v4-mapped space only: ::ffff:0:0/96 == 20 zero hex + 'ffff'
        matched = matched.filter(
            F.col(field).startswith("0" * 20 + "ffff")
        )
    bits = prefix_length + (0 if is_ipv6 else 96)
    nhex, rem = divmod(bits, 4)
    key = F.substring(F.col(field), 1, nhex)
    if rem:
        step = 1 << (4 - rem)
        digit = F.conv(F.substring(F.col(field), nhex + 1, 1), 16, 10).cast("int")
        masked = (F.floor(digit / step) * step).cast("int")
        key = F.concat(key, F.lower(F.conv(masked.cast("string"), 10, 16)))
    net = F.rpad(key, 32, "0")
    work = matched.withColumn("__net", net)
    aggs = [F.count(F.lit(1)).alias("n_docs")] + _metric_aggs(
        F, metrics or {}
    )
    out = work.groupBy(F.col("__net").alias("net_hex")).agg(*aggs)
    if min_doc_count > 1:
        out = out.filter(F.col("n_docs") >= min_doc_count)
    if is_ipv6:
        disp = F.concat(
            F.col("net_hex"), F.lit(f"/{prefix_length}")
        )
    else:
        octs = [
            F.conv(F.substring("net_hex", 25 + 2 * i, 2), 16, 10)
            for i in range(4)
        ]
        disp = F.concat(
            F.concat_ws(".", *octs), F.lit(f"/{prefix_length}")
        )
    return out.select(
        disp.alias("ip_prefix"),
        "net_hex",
        F.lit(int(prefix_length)).alias("prefix_length"),
        "n_docs",
        *[c for c in (metrics or {})],
    ).orderBy(F.asc("net_hex"))


def range_agg(
    spark,
    index_dir: str,
    query,
    field: str,
    ranges: list[tuple],
    metrics: dict | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Explicit-bounds bucket aggregation over a numeric/date doc value —
    the Elasticsearch ``range`` aggregation analog (EXTENSION; the
    reference's collectors return docs/counts only).

    ``ranges`` is a list of ``(key, lo, hi)``: lo INCLUSIVE, hi
    EXCLUSIVE (the ES convention), either side ``None`` = unbounded.
    Ranges MAY OVERLAP (ES allows it — a doc counts in every range it
    falls in) and every DECLARED range appears in the output, empty ones
    with ``n_docs = 0`` and NULL metrics (ES keyed-response behavior).
    ``metrics`` follows the facet_stats grammar. Date fields take their
    stored epoch-micros bounds — or ISO-8601 / epoch-millis STRINGS
    (the ES ``date_range`` aggregation analog), resolved through the
    query grammar's date parser to the unit's START on BOTH sides
    (``("jan", "2024-01", "2024-02")`` covers exactly January — the ES
    date_range from/to round-down rule; note the difference from range
    QUERIES, whose lte/gt round to the unit's END). String bounds on a
    non-date field are rejected loudly. NULL field values fall in no
    range (ES: missing docs are simply absent).

    Returns (range_key, lo, hi, n_docs, *metrics) in declaration order
    (``range_ord`` ties the output back to the declaration).

    Scale posture: ONE docmap-joined match set; each row expands to only
    the ranges it falls in (an array of when()s, compacted), then one
    partial-aggregated groupBy on the range key — no per-range job, no
    driver-side match set; the declared-range table is a broadcast-sized
    literal joined back for empty buckets.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = _doc_value_field_entry(manifest, field)
    if fe.is_keyword:
        raise ValueError(
            f"range_agg needs a numeric, date or ip field, {field!r} is "
            f"keyword"
        )
    if not ranges:
        raise ValueError("ranges must declare >= 1 (key, lo, hi) bucket")
    keys = [r[0] for r in ranges]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate range keys: {keys}")
    metrics = metrics or {}

    def _bound(v):
        if v is None:
            return v
        if fe.is_ip:
            # ES ip_range analog: bounds are ip literals (or canonical
            # hex — ip.ip_range_spec's mask output); lo inclusive, hi
            # exclusive like every range bucket. CIDR-mask buckets come
            # pre-resolved through ip.ip_range_spec.
            if not isinstance(v, str):
                raise ValueError(
                    f"ip_range bound {v!r} must be an ip string, "
                    f"{field!r} is an ip field"
                )
            from ..ip import normalize_ip_value

            return normalize_ip_value(v, fe.name)
        if not isinstance(v, str):
            return v
        if not fe.is_date:
            raise ValueError(
                f"string bound {v!r} needs a date field, {field!r} is "
                f"{fe.field_type}"
            )
        from .parser import _parse_date_span

        span = _parse_date_span(v)
        if span is None:
            raise ValueError(
                f"cannot parse date bound {v!r} — expected an ISO-8601 "
                "prefix (2024-01, 2024-01-10, …) or epoch millis"
            )
        return span[0]  # ES date_range: from AND to round DOWN

    ranges = [(k, _bound(lo), _bound(hi)) for k, lo, hi in ranges]

    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    return bucket_by_declared_ranges(spark, matched, F.col(field), ranges,
                                     metrics)


def bucket_by_declared_ranges(spark, matched, value, ranges, metrics):
    """Shared declared-range bucketing (range_agg / geo_distance_agg):
    tag each ``matched`` row with every ``(key, lo, hi)`` range its
    ``value`` column expression falls in (lo inclusive, hi exclusive,
    None = unbounded; overlaps double-count, NULL falls nowhere), one
    partial-aggregated groupBy on the tag, declared-range table joined
    back so EMPTY declared buckets surface with n_docs=0 and NULL
    metrics. Output (range_key, lo, hi, n_docs, *metrics) in declaration
    order. ``value`` may be a stored doc-value column or a computed
    expression (the geo_distance agg's haversine) — either way it is
    evaluated once per row inside the tagging select."""
    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("n_docs")] + _metric_aggs(F, metrics)
    tags = []
    for key, lo, hi in ranges:
        c = value.isNotNull()
        if lo is not None:
            c = c & (value >= F.lit(lo))
        if hi is not None:
            c = c & (value < F.lit(hi))
        tags.append(F.when(c, F.lit(key)))
    # every COLUMN a metric references must ride through the tagging
    # projection — value cols, max_by/min_by sort cols, weighted_avg
    # weight cols (numeric rest args like approx rsd are not columns)
    metric_cols = []
    for spec in metrics.values():
        for ref in spec[1:]:
            if isinstance(ref, str) and ref in matched.columns \
                    and ref not in metric_cols:
                metric_cols.append(ref)
    tagged = (
        matched.select(
            F.explode(F.array_compact(F.array(*tags))).alias("range_key"),
            *metric_cols,
        )
    )
    agg = tagged.groupBy("range_key").agg(*aggs)
    if any(isinstance(b, str) for _, lo, hi in ranges for b in (lo, hi)):
        # string bounds (the ip_range shape: canonical hex) surface
        # verbatim — casting them to double would be meaningless
        decl = spark.createDataFrame(
            [(i, k, lo, hi) for i, (k, lo, hi) in enumerate(ranges)],
            "range_ord int, range_key string, lo string, hi string",
        )
    else:
        decl = spark.createDataFrame(
            [(i, k, float(lo) if lo is not None else None,
              float(hi) if hi is not None else None)
             for i, (k, lo, hi) in enumerate(ranges)],
            "range_ord int, range_key string, lo double, hi double",
        )
    out = (
        decl.join(agg, "range_key", "left")
        .withColumn("n_docs", F.coalesce("n_docs", F.lit(0)))
        .orderBy("range_ord")
    )
    return out.select("range_key", "lo", "hi", "n_docs",
                      *[F.col(m) for m in metrics])


def filters_agg(
    spark,
    index_dir: str,
    queries: dict[str, object],
    metrics: dict | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Named-query buckets — the Elasticsearch ``filters`` aggregation
    analog (EXTENSION): one bucket per query in ``queries`` (query_id ->
    NQL string or logical query), counting its matching docs, with
    optional facet-grammar ``metrics`` over docmap columns. A doc
    matching several filters counts in each (ES semantics); every
    declared bucket appears, empty ones with ``n_docs = 0``.

    Returns (filter_key, n_docs, *metrics), one row per declared query.

    Scale posture: ALL buckets evaluate as ONE Spark job through
    search_many (one stats binding, one term-union postings scan, one
    scoring pass) — never a job per filter; metric columns join from the
    docmap co-keyed on (segment_id, doc) and the final groupBy on the
    tiny query_id key partial-aggregates map-side.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    if not queries:
        raise ValueError("queries must declare >= 1 named filter")
    metrics = metrics or {}
    aggs = [F.count("*").alias("n_docs")] + _metric_aggs(F, metrics)
    res = search_many(
        spark, index_dir, queries, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    rows = res.select("query_id", "segment_id", "doc")
    if metrics:
        docmap = read_docmap(spark, index_dir, manifest)
        metric_cols = list(dict.fromkeys(spec[1] for spec in metrics.values()))
        rows = rows.join(
            docmap.select("segment_id", "doc", *metric_cols),
            ["segment_id", "doc"], "inner",
        )
    agg = rows.groupBy(F.col("query_id").alias("filter_key")).agg(*aggs)
    decl = spark.createDataFrame(
        [(i, k) for i, k in enumerate(queries)], "filter_ord int, filter_key string"
    )
    out = (
        decl.join(agg, "filter_key", "left")
        .withColumn("n_docs", F.coalesce("n_docs", F.lit(0)))
        .orderBy("filter_ord")
    )
    return out.select("filter_key", "n_docs", *[F.col(m) for m in metrics])


def rare_terms(
    spark,
    index_dir: str,
    query,
    by,
    max_doc_count: int = 1,
    metrics: dict | None = None,
    join_df=None,
    join_on=None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Long-tail bucket aggregation — the Elasticsearch ``rare_terms``
    analog (EXTENSION): the terms buckets whose doc count is <=
    ``max_doc_count``, count ASC then key ASC (rarest first, the ES
    response order). Same ``by``/``metrics``/``join_df`` grammar as
    facet_stats.

    ES implements this with a CuckooFilter because its coordinator
    cannot hold every bucket; Spark's shuffle CAN — the groupBy is
    exact and distributed, the <= filter cuts before any collect, so
    this is exact where ES is approximate (documented difference).
    """
    from pyspark.sql import functions as F

    if max_doc_count < 1:
        raise ValueError("max_doc_count must be >= 1")
    out = facet_stats(
        spark, index_dir, query, by, metrics or {},
        join_df=join_df, join_on=join_on, manifest=manifest,
        scorer=scorer, default_fields=default_fields,
    )
    by_cols = [by] if isinstance(by, str) else list(by)
    return out.filter(F.col("n_docs") <= max_doc_count).orderBy(
        F.col("n_docs").asc(), *[F.col(c).asc() for c in by_cols]
    )


def missing_agg(
    spark,
    index_dir: str,
    query,
    field: str,
    metrics: dict | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``missing`` aggregation analog (EXTENSION): one
    row counting the matched docs whose ``field`` doc value IS NULL,
    with optional facet-grammar ``metrics`` over other docmap columns —
    the find-the-unmapped-documents bucket. One docmap-joined match set,
    one IS NULL cut pushed at the scan, one map-side-partial agg."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    _doc_value_field_entry(manifest, field)  # field must be a doc value
    metrics = metrics or {}
    aggs = [F.count("*").alias("n_docs")] + _metric_aggs(F, metrics)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    return matched.filter(F.col(field).isNull()).agg(*aggs)


def adjacency_matrix(
    spark,
    index_dir: str,
    queries: dict[str, object],
    separator: str = "&",
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``adjacency_matrix`` aggregation analog
    (EXTENSION): named filters -> one bucket per filter plus one per
    PAIRWISE intersection (``a&b``), empty buckets omitted (ES
    behavior). Pair keys follow declaration order (``key_i&key_j`` with
    i < j), output sorted key ASC like the ES keyed response.

    Scale posture: all filters evaluate as ONE search_many job; the
    pair counts come from a SELF-JOIN co-keyed on (segment_id, doc) —
    per-doc fan-out is bounded by filters-per-doc (<= len(queries),
    which ES caps at 100), never corpus size; both legs partial-agg on
    the tiny bucket key afterward. The declaration-order map rides a
    broadcast literal.
    """
    from pyspark.sql import functions as F

    if not queries:
        raise ValueError("queries must declare >= 1 named filter")
    for k in queries:
        if separator in k:
            raise ValueError(
                f"filter key {k!r} contains the separator {separator!r}"
            )
    res = search_many(
        spark, index_dir, queries, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    ).select("query_id", "segment_id", "doc")
    decl = spark.createDataFrame(
        [(i, k) for i, k in enumerate(queries)], "ord int, query_id string"
    )
    tagged = res.join(F.broadcast(decl), "query_id")
    singles = tagged.groupBy(F.col("query_id").alias("key")).agg(
        F.count("*").alias("n_docs")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.segment_id") == F.col("b.segment_id"))
            & (F.col("a.doc") == F.col("b.doc"))
            & (F.col("a.ord") < F.col("b.ord")),
        )
        .select(
            F.concat_ws(separator, F.col("a.query_id"), F.col("b.query_id")).alias("key")
        )
        .groupBy("key")
        .agg(F.count("*").alias("n_docs"))
    )
    return singles.unionByName(pairs).orderBy("key")


def scripted_metric(
    spark,
    index_dir: str,
    query,
    zero,
    map_fn,
    combine_fn,
    reduce_fn=None,
    columns: list[str] | None = None,
    include_score: bool = False,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Custom map/combine/reduce aggregation over a query's FULL match
    set — the Elasticsearch ``scripted_metric`` aggregation analog
    (EXTENSION; ES scripts are Painless strings, ours are Python
    callables over Arrow-delivered pandas batches — the Spark-idiomatic
    "script"). The use case ES documents: a metric the built-in agg
    grammar cannot express, written once instead of exporting the match
    set.

    The four ES script slots map directly:

    - ``zero`` — ``init_script``: the identity state (must be
      JSON-serializable; checked up front so executors never discover
      it).
    - ``map_fn(pdf) -> state`` — ``map_script``, but batch-vectorized:
      called once per Arrow batch of matched rows (the requested
      ``columns`` plus ``score`` when ``include_score=True``), returns
      that batch's state.
    - ``combine_fn(a, b) -> state`` — ``combine_script``: binary and
      ASSOCIATIVE; folds batch states within each partition
      executor-side, then partition states driver-side. States cross
      the wire as JSON, so ``combine_fn`` must accept the decoded form
      (tuples arrive back as lists).
    - ``reduce_fn(state) -> value`` — ``reduce_script``: optional final
      driver-side transform (defaults to the folded state itself).

    Returns the reduced Python value (ES returns arbitrary JSON here,
    not buckets — same contract).

    Scale posture: the match set itself never moves — each partition
    folds its batches locally and emits ONE JSON state row, so the
    driver sees n_partitions states (the per-shard-state coordinator
    model every ES agg uses). The docmap scan is pruned to exactly
    ``columns``. Partition boundaries are not deterministic, so a
    non-associative/non-commutative ``combine_fn`` gives
    partitioning-dependent answers — same caveat ES documents for
    shard-order-dependent scripts; tests pin partition invariance for
    the associative shapes.
    """
    if manifest is None:
        manifest = load_manifest(index_dir)
    json.dumps(zero)  # fail fast: states must round-trip as JSON
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    cols = list(columns or [])
    for c in cols:
        if c not in docmap.columns:
            raise ValueError(
                f"scripted_metric column {c!r} not in docmap "
                f"(have: {', '.join(docmap.columns)})"
            )
    matched = docmap.select("segment_id", "doc", *cols).join(
        res.select("segment_id", "doc", "score"), ["segment_id", "doc"],
        "inner",
    )
    if not include_score:
        matched = matched.drop("score")

    def _partition_state(batches):
        state, have = None, False
        for pdf in batches:
            if not len(pdf):
                continue
            s = map_fn(pdf)
            state = combine_fn(state, s) if have else s
            have = True
        if have:
            yield pd.DataFrame({"state": [json.dumps(state)]})

    rows = matched.mapInPandas(_partition_state, "state string").collect()
    state = zero
    for r in rows:
        state = combine_fn(state, json.loads(r["state"]))
    return reduce_fn(state) if reduce_fn is not None else state


def cardinality(
    spark,
    index_dir: str,
    query,
    of: str,
    exact: bool = False,
    rsd: float = 0.05,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Distinct count of a docmap column over a query's FULL match set —
    the Elasticsearch ``cardinality`` aggregation analog (EXTENSION).
    "How many distinct repos match this query?" as one number.

    Default is the scale path: ``approx_count_distinct`` (HLL++ sketch,
    relative standard deviation ``rsd``) — the sketch partial-aggregates
    map-side, so the shuffle carries one fixed-size sketch per
    partition regardless of match count, exactly how ES computes it.
    ``exact=True`` switches to ``count_distinct`` (values ride the
    shuffle; fine at gate scale, the expensive-but-truthful option).

    Returns a 1-row DataFrame with column ``n_distinct``.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    agg = (
        F.countDistinct(of) if exact else F.approx_count_distinct(of, rsd)
    ).alias("n_distinct")
    return matched.agg(agg)


SIG_TERMS_SCHEMA = "term string, n_docs long, doc_freq long"


def _make_sig_terms_counter(min_doc: int):
    """Cogrouped counter: (field-pruned postings rows, match rows) of one
    segment -> per-term (n_docs in the match set, segment doc_freq)."""

    def fn(post_pdf: pd.DataFrame, match_pdf: pd.DataFrame) -> pd.DataFrame:
        from ..codec import unpack_blocked

        if not len(post_pdf):
            return pd.DataFrame({"term": [], "n_docs": [], "doc_freq": []}).astype(
                {"term": str, "n_docs": np.int64, "doc_freq": np.int64}
            )
        # every term is emitted even at n=0: its doc_freq contribution to
        # the GLOBAL background count must survive segments where the
        # term only occurs in non-matching docs (or with no matches at
        # all) — fg filtering happens after the cross-segment sum
        marr = (
            np.unique(match_pdf["doc"].to_numpy(dtype=np.int64))
            if len(match_pdf)
            else np.empty(0, dtype=np.int64)
        )
        m_min = int(marr[0]) if len(marr) else 0
        m_max = int(marr[-1]) if len(marr) else -1
        terms, ns, dfs = [], [], []
        for term, rows in post_pdf.groupby("term"):
            n = 0
            for _, row in rows.iterrows():
                bm = np.asarray(row["block_max_doc"], dtype=np.int64)
                if not len(bm) or not len(marr):
                    continue
                lo = np.empty_like(bm)
                lo[0] = 0  # conservative: row's first block lower bound
                lo[1:] = bm[:-1] + 1
                sel = np.flatnonzero((bm >= m_min) & (lo <= m_max))
                if not len(sel):
                    continue
                docs, _ = unpack_blocked(
                    bytes(row["docs"]), list(row["doc_offs"]),
                    int(row["doc_freq"]), True, sel,
                )
                idx = np.searchsorted(marr, docs)
                idx[idx == len(marr)] = 0
                n += int(np.sum(marr[idx] == docs))
            terms.append(term)
            ns.append(n)
            dfs.append(int(rows["doc_freq"].sum()))
        return pd.DataFrame({"term": terms, "n_docs": ns, "doc_freq": dfs})

    return fn


def significant_terms(
    spark,
    index_dir: str,
    query,
    field: str,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
    min_doc_count: int = 1,
    significance: str | None = None,
    size: int | None = None,
):
    """Term-level facet over a query's match set (Elasticsearch
    significant_terms / terms-aggregation analog — EXTENSION, the
    reference's collectors return docs/counts only, /root/reference/
    reader/search.go:21-66). For every term of ``field`` that occurs in
    at least ``min_doc_count`` matching docs, returns

        (term, n_docs, doc_freq)

    where ``n_docs`` is the foreground count (matching docs containing
    the term) and ``doc_freq`` the background count (all docs, summed
    from the committed segments' posting metadata in the same pass —
    like scoring stats, frozen w.r.t. tombstones until purge). Callers
    derive lift/JLH-style significance from the two counts plus
    manifest totals — or ask for it directly with ``significance``:

      - ``"jlh"``: (fg% − bg%) · (fg% / bg%) — the ES default heuristic
        (absolute change × relative change; bg% > 0 always holds since
        the superset contains the subset)
      - ``"chi_square"``: the textbook 2×2 contingency chi-square
        (N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) over term∈/∉ ×
        match∈/∉; ES's variant drops rows where fg% < bg% — ours keeps
        them, chi-square is symmetric, documented difference)
      - ``"percentage"``: subset_freq / superset_freq
      - ``"lift"``: fg% / bg% (plain ratio — not an ES builtin, kept
        because it is the common log-odds ingredient)
      - ``"mutual_information"``: textbook 2×2 MI in bits (Manning IR
        §13.5.1, the definition ES cites), 0·log 0 = 0,
        include_negatives=true semantics
      - ``"gnd"``: google normalized distance (Cilibrasi & Vitányi),
        returned as 1/(1+NGD) so larger = more significant (our
        stated transformation — ES leaves the return shape
        undocumented)

    with two extra columns (``score``, ``bg_percent``) and, when
    ``size`` is given, only the top ``size`` terms (score desc, term asc
    tie-break; TakeOrderedAndProject, never a full sort). The subset
    size is the match count and the superset size the frozen corpus
    maxDoc total — both one-row literals crossed into the per-term
    frame, so scoring adds NO extra pass over data.

    Scale posture: the match set is NOT collected or broadcast — it is
    cogrouped with the field's postings on segment_id, so both ride one
    co-partitioned shuffle. Within a segment the counter decodes only
    the doc column (tfs/lens/pos columns are pruned from the scan) and
    only the blocks whose [lower bound, block_max_doc] window intersects
    the match-doc range; counting is a vectorized searchsorted per term.
    The per-term output is partially aggregated map-side by the final
    groupBy, so the second shuffle carries one row per (segment, term).
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or fe.is_doc_value:
        raise ValueError(f"{field!r} is not a text field of this index")
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    post = (
        read_postings(spark, index_dir, manifest)
        .filter(F.col("field") == fe.id)
        .select("segment_id", "term", "doc_freq", "docs", "doc_offs", "block_max_doc")
    )
    per_seg = (
        post.groupBy("segment_id")
        .cogroup(res.select("segment_id", "doc").groupBy("segment_id"))
        .applyInPandas(_make_sig_terms_counter(1), SIG_TERMS_SCHEMA)
    )
    counts = (
        per_seg.groupBy("term")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("doc_freq").alias("doc_freq"))
        .filter(F.col("n_docs") >= max(1, min_doc_count))
    )
    superset_size = sum(s.max_doc for s in manifest.segments)
    subset = res.agg(F.count(F.lit(1)).alias("__subset"))
    return _apply_significance(counts, subset, superset_size, significance, size)


def _apply_significance(counts, subset_df, superset_size: int, significance, size):
    """Shared significance-heuristic scoring over (term, n_docs, doc_freq)
    counts — the tail of ``significant_terms`` and ``significant_text``.
    ``subset_df`` is a ONE-ROW frame carrying ``__subset`` (the foreground
    doc count), broadcast-crossed so scoring adds no extra data pass."""
    from pyspark.sql import functions as F

    if significance is None:
        if size is not None:
            raise ValueError("size needs a significance heuristic to rank by")
        return counts
    if significance not in (
        "jlh", "chi_square", "percentage", "lift",
        "mutual_information", "gnd",
    ):
        raise ValueError(
            "significance must be jlh/chi_square/percentage/lift/"
            f"mutual_information/gnd, got {significance!r}"
        )
    scored = counts.crossJoin(F.broadcast(subset_df))
    fgp = F.col("n_docs").cast("double") / F.col("__subset")
    bgp = F.col("doc_freq").cast("double") / F.lit(float(superset_size))
    if significance == "jlh":
        score = (fgp - bgp) * (fgp / bgp)
    elif significance == "percentage":
        score = F.col("n_docs").cast("double") / F.col("doc_freq")
    elif significance == "lift":
        score = fgp / bgp
    elif significance == "mutual_information":
        # textbook 2×2 mutual information in bits (Manning et al., IR
        # §13.5.1 — the definition the ES heuristic cites), summing
        # (N_xy/N)·log2(N·N_xy / (N_x·N_y)) over the four cells with
        # 0·log 0 = 0; include_negatives=true semantics (a term rarer
        # in the subset than in the background still scores its MI —
        # association strength is symmetric)
        a = F.col("n_docs").cast("double")
        b = F.col("doc_freq").cast("double") - a
        c = F.col("__subset").cast("double") - a
        n = F.lit(float(superset_size))
        d = n - F.col("__subset") - b
        t1, t0 = a + b, c + d  # term present / absent marginals
        s1, s0 = a + c, b + d  # subset / complement marginals

        def cell(nxy, rm, cm):
            return F.when(
                nxy > 0, (nxy / n) * F.log2(n * nxy / (rm * cm))
            ).otherwise(0.0)

        score = (
            cell(a, t1, s1) + cell(b, t1, s0)
            + cell(c, t0, s1) + cell(d, t0, s0)
        )
    elif significance == "gnd":
        # google normalized distance (Cilibrasi & Vitányi, "The Google
        # Similarity Distance"): NGD = (max(ln fx, ln fy) − ln fxy) /
        # (ln N − min(ln fx, ln fy)) with fx = subset size, fy = term
        # doc_freq, fxy = their intersection — returned as the
        # similarity 1/(1+NGD) so larger = more significant (OUR
        # transformation, stated: ES does not document its return
        # shape; NGD ≥ 0 since fxy ≤ min(fx, fy), so the score is in
        # (0, 1]). Degenerate fx = fy = N (no information) scores 0.
        fxy = F.col("n_docs").cast("double")
        fx = F.col("__subset").cast("double")
        fy = F.col("doc_freq").cast("double")
        n = F.lit(float(superset_size))
        num = F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)
        den = F.log(n) - F.least(F.log(fx), F.log(fy))
        score = F.when(den > 0, 1.0 / (1.0 + num / den)).otherwise(0.0)
    else:  # chi_square: 2x2 contingency over term∈/∉ × match∈/∉
        a = F.col("n_docs").cast("double")
        b = F.col("doc_freq").cast("double") - a
        c = F.col("__subset").cast("double") - a
        d = F.lit(float(superset_size)) - F.col("__subset") - b
        n = F.lit(float(superset_size))
        det = a * d - b * c
        denom = (a + b) * (c + d) * (a + c) * (b + d)
        # a zero marginal (term in EVERY doc, or subset == superset)
        # makes the table degenerate: no association measurable -> 0
        score = F.when(denom > 0, (n * det * det) / denom).otherwise(0.0)
    out = scored.select(
        "term", "n_docs", "doc_freq",
        score.alias("score"),
        (bgp * 100.0).alias("bg_percent"),
    )
    out = out.orderBy(F.desc("score"), F.asc("term"))
    return out.limit(int(size)) if size is not None else out


# duplicate-shingle separator: the analyzers' tokens are letter/digit
# runs, so the unit separator can never occur inside a token
_SIG_TEXT_SEP = "\x1f"


def significant_text(
    spark,
    index_dir: str,
    query,
    field: str,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
    shard_size: int | None = 100,
    filter_duplicate_text: bool = True,
    dup_len: int = 6,
    min_doc_count: int = 1,
    significance: str | None = None,
    size: int | None = None,
):
    """Free-text significant-terms over the STORED text of a match-set
    sample (Elasticsearch ``significant_text`` aggregation analog —
    EXTENSION, the reference's collectors return docs/counts only,
    /root/reference/reader/search.go:21-66). Where ``significant_terms``
    counts foreground hits from the INDEX postings, this re-analyzes the
    stored source text of the best-scoring sampled hits on the fly — the
    ES design point: the foreground can be cleansed of copy-paste
    boilerplate (``filter_duplicate_text``) that index-level counts
    would double-count, at the price of reading only a bounded sample.

    Sampling: ``shard_size`` keeps the top hits per SEGMENT (score desc,
    doc asc — the pinned tie-break; the analog of ES's per-shard sample,
    which in ES is the sampler agg significant_text nests under).
    ``shard_size=None`` analyzes the WHOLE match set — correct but only
    sensible for bounded match sets (the docmap join then skips the
    broadcast hint).

    ``filter_duplicate_text`` drops tokens that are part of a duplicated
    run of at least ``dup_len`` (default 6, the ES constant) consecutive
    tokens: for every distinct ``dup_len``-shingle, the occurrence with
    the smallest (segment_ord, doc, position) key is the NOVEL one; a
    token drops iff SOME covering shingle occurrence is a duplicate —
    exactly "this token sits inside a ``dup_len`` window whose content
    was already seen", the DeduplicatingTokenFilter contract, but
    deterministic and order-free (keep-first by global key) where ES's
    filter depends on shard stream order. The electing doc keeps its
    tokens; a within-doc repeat of a run also drops. Docs shorter than
    ``dup_len`` tokens have no shingles and keep all tokens.

    Returns (term, n_docs, doc_freq) — n_docs counts sampled docs with a
    SURVIVING occurrence, doc_freq is the index-wide background count
    from the postings dictionary (same meaning as ``significant_terms``)
    — or the scored/cut frame when ``significance``/``size`` are given
    (same heuristics and columns as ``significant_terms``).

    Scale posture: the sample is bounded (segments × shard_size docs),
    so every downstream explode/join is over a bounded frame; the one
    corpus-sized operand is the background dictionary groupBy(term) —
    linear, term-partitioned, and inner-joined to the (small) candidate
    set, which AQE is free to broadcast. Nothing collects to the driver.

    Requires ``store=True`` on ``field`` (the ES requirement is
    ``_source`` availability for the same reason: the text is re-read,
    not the postings)."""
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..analysis import get_analyzer

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or fe.is_doc_value:
        raise ValueError(f"{field!r} is not a text field of this index")
    if not fe.store:
        raise ValueError(
            f"significant_text re-analyzes stored source text — rebuild "
            f"with Schema.add_text_field({field!r}, ..., store=True)"
        )
    if shard_size is not None and shard_size < 1:
        raise ValueError(f"shard_size must be >= 1 or None, got {shard_size}")
    if filter_duplicate_text and dup_len < 2:
        raise ValueError(f"dup_len must be >= 2, got {dup_len}")

    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    if shard_size is not None:
        w = Window.partitionBy("segment_id").orderBy(
            F.desc("score"), F.asc("doc")
        )
        sample = (
            res.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(shard_size))
            .drop("__rn")
        )
    else:
        sample = res
    docmap = read_docmap(spark, index_dir, manifest).select(
        "segment_id", "doc", field
    )
    right = F.broadcast(sample) if shard_size is not None else sample
    joined = docmap.join(right, ["segment_id", "doc"], "inner").select(
        "segment_id", "segment_ord", "doc", field
    )

    analyzer_obj = get_analyzer(fe.analyzer)

    @F.pandas_udf("array<string>")
    def _an(s: pd.Series) -> pd.Series:
        return analyzer_obj.analyze_series(s.fillna(""))

    toks_df = joined.withColumn("toks", _an(F.col(field))).drop(field)

    keys = ["segment_id", "segment_ord", "doc"]
    if filter_duplicate_text:
        L = int(dup_len)
        # docs long enough to shingle; 1-based positions match slice()
        long_docs = toks_df.filter(F.size("toks") >= L)
        occ = long_docs.select(
            *keys,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - F.lit(L - 1)),
                    lambda i: F.struct(
                        i.alias("spos"),
                        F.concat_ws(
                            _SIG_TEXT_SEP, F.slice(F.col("toks"), i, L)
                        ).alias("sh"),
                    ),
                )
            ).alias("o"),
        ).select(*keys, F.col("o.spos").alias("spos"), F.col("o.sh").alias("sh"))
        firsts = occ.groupBy("sh").agg(
            F.min(F.struct("segment_ord", "doc", "spos")).alias("__first")
        )
        dups = occ.join(firsts, "sh").filter(
            (F.col("segment_ord") != F.col("__first.segment_ord"))
            | (F.col("doc") != F.col("__first.doc"))
            | (F.col("spos") != F.col("__first.spos"))
        )
        drop_pos = dups.select(
            *keys,
            F.explode(
                F.sequence(F.col("spos"), F.col("spos") + F.lit(L - 1))
            ).alias("pos"),
        ).distinct()
        tok_rows = toks_df.select(
            *keys, F.posexplode("toks").alias("pos0", "term")
        ).withColumn("pos", F.col("pos0") + F.lit(1)).drop("pos0")
        survivors = tok_rows.join(drop_pos, keys + ["pos"], "left_anti")
        pairs = survivors.select("segment_id", "doc", "term").distinct()
    else:
        pairs = (
            toks_df.select("segment_id", "doc", F.explode("toks").alias("term"))
            .distinct()
        )

    fg = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs")).filter(
        F.col("n_docs") >= max(1, int(min_doc_count))
    )
    bg = (
        read_postings(spark, index_dir, manifest)
        .filter(F.col("field") == fe.id)
        .groupBy("term")
        .agg(F.sum("doc_freq").alias("doc_freq"))
    )
    counts = fg.join(bg, "term", "inner")
    superset_size = sum(s.max_doc for s in manifest.segments)
    subset = sample.agg(F.count(F.lit(1)).alias("__subset"))
    return _apply_significance(counts, subset, superset_size, significance, size)


def categorize_text(
    spark,
    index_dir: str,
    query,
    field: str,
    max_tokens: int | None = None,
    metrics: dict | None = None,
    min_doc_count: int = 1,
    size: int | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Log-template clustering of a match set's STORED text — the
    Elasticsearch ``categorize_text`` aggregation analog (EXTENSION).
    The use case: bucket a million semi-structured log lines into the
    handful of message TEMPLATES behind them ("Connection refused to
    host 10.0.0.7 port 443" and "...host 10.9.3.2 port 80" are the same
    category).

    The category key follows the ES categorization tokenizer's core
    rule — only tokens consisting entirely of LETTERS survive (numbers,
    hex ids, timestamps, addresses all drop) — applied to the field's
    own analyzer output, capped at the first ``max_tokens`` surviving
    tokens, space-joined. Where ES then merges near-identical
    categories with a shard-order-dependent similarity pass, this
    implementation keeps the exact-template key: DETERMINISTIC and
    partition-invariant (the same documented trade as
    variable_width_histogram vs ES's streaming clustering). Docs whose
    text yields no letter tokens form no bucket (nothing to
    template on).

    ``metrics`` / ``min_doc_count`` / ``size`` follow the facet_stats
    grammar; ordering is n_docs DESC, category ASC (deterministic),
    ``size`` cut after ordering.

    Scale posture: one Arrow-batched analysis pass over the match set's
    stored text (the significant_text read path), then the
    letter-filter / cap / join as pure Catalyst array expressions and
    ONE partial-aggregated groupBy on the category string; the ``size``
    cut is a TakeOrderedAndProject over one-row-per-category
    aggregates. Nothing collects to the driver.

    Requires ``store=True`` on ``field`` (same reason as
    significant_text: the text is re-read, not the postings)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ..analysis import get_analyzer

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or fe.is_doc_value:
        raise ValueError(f"{field!r} is not a text field of this index")
    if not fe.store:
        raise ValueError(
            f"categorize_text re-analyzes stored source text — rebuild "
            f"with Schema.add_text_field({field!r}, ..., store=True)"
        )
    if max_tokens is not None and max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    keep = [field] + [
        c
        for spec in (metrics or {}).values()
        for c in spec[1:]
        if isinstance(c, str) and c in docmap.columns
    ]
    matched = docmap.select("segment_id", "doc", *dict.fromkeys(keep)).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )

    analyzer_obj = get_analyzer(fe.analyzer)

    @F.pandas_udf("array<string>")
    def _an(s: pd.Series) -> pd.Series:
        return analyzer_obj.analyze_series(s.fillna(""))

    toks = F.filter(_an(F.col(field)), lambda x: x.rlike("^\\p{L}+$"))
    if max_tokens is not None:
        toks = F.slice(toks, 1, int(max_tokens))
    work = matched.withColumn("category", F.array_join(toks, " ")).filter(
        F.col("category") != ""
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")] + _metric_aggs(
        F, metrics or {}
    )
    out = work.groupBy("category").agg(*aggs)
    if min_doc_count > 1:
        out = out.filter(F.col("n_docs") >= min_doc_count)
    out = out.orderBy(F.desc("n_docs"), F.asc("category"))
    return out.limit(int(size)) if size is not None else out


def numeric_histogram(
    spark,
    index_dir: str,
    query,
    by: str,
    bin_width,
    min_doc_count: int = 1,
    extended_bounds: tuple | None = None,
    offset: float = 0.0,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Histogram of a numeric doc-value field over a query's FULL match
    set: one row per occupied bucket -> (``bucket`` = inclusive lower
    bound, ``n_docs``). Nulls are dropped (no-value docs occupy no
    bucket). Same scale posture as facet_counts: the match set is never
    collected; the groupBy partial-aggregates map-side so the shuffle
    carries one row per (partition, bucket).

    ``min_doc_count=0`` fills the gaps (the ES option): every bucket
    from the lowest to the highest OCCUPIED bucket appears, empty ones
    with ``n_docs = 0``; ``extended_bounds=(lo, hi)`` widens that range
    past the data (either side None = data-driven), exactly ES's
    interaction of the two options. The spine is a ``sequence()`` over
    BUCKET INDICES on the one-row min/max aggregate — no driver-side
    range materialization, works for fractional bin widths.

    ``offset`` shifts every bucket boundary (the ES histogram option,
    validated to ``0 <= offset < bin_width`` like ES): bucket =
    floor((v − offset)/width)·width + offset. Bucketing, bound
    widening and the gap spine all compute on the shifted axis
    (bucket indices), the offset rejoining at output — so it composes
    with min_doc_count=0 / extended_bounds with no special cases."""
    from pyspark.sql import functions as F

    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if min_doc_count not in (0, 1):
        raise ValueError("min_doc_count must be 0 or 1 (ES: gaps on/off)")
    if not (0 <= offset < bin_width):
        raise ValueError(
            f"offset must satisfy 0 <= offset < bin_width (the ES "
            f"histogram rule), got {offset!r} with width {bin_width!r}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, by)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", by).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    val = F.col(by) - F.lit(offset) if offset else F.col(by)
    idx = F.floor(val / F.lit(bin_width))
    occupied = (
        matched.filter(F.col(by).isNotNull())
        .groupBy(idx.alias("__bi"))
        .agg(F.count("*").alias("n_docs"))
    )
    bucket_expr = F.col("__bi") * F.lit(bin_width)
    if offset:
        bucket_expr = bucket_expr + F.lit(offset)
    bucket = bucket_expr.alias("bucket")
    if min_doc_count == 1:
        return occupied.select(bucket, "n_docs")
    lo_i = hi_i = None
    if extended_bounds is not None:
        e_lo, e_hi = extended_bounds
        lo_i = None if e_lo is None else math.floor((e_lo - offset) / bin_width)
        hi_i = None if e_hi is None else math.floor((e_hi - offset) / bin_width)
    bounds = occupied.agg(
        F.least(F.min("__bi"), F.lit(lo_i)).alias("__lo"),
        F.greatest(F.max("__bi"), F.lit(hi_i)).alias("__hi"),
    ).select(
        F.coalesce("__lo", F.lit(lo_i)).alias("__lo"),
        F.coalesce("__hi", F.lit(hi_i)).alias("__hi"),
    )
    spine = bounds.filter(F.col("__lo").isNotNull()).select(
        F.explode(F.sequence("__lo", "__hi")).alias("__bi")
    )
    return (
        spine.join(occupied, "__bi", "left")
        .select(bucket, F.coalesce("n_docs", F.lit(0)).alias("n_docs"))
    )


_DATE_HIST_FIXED_US = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


_DATE_HIST_TRUNC = {"week": "week", "month": "month", "quarter": "quarter", "year": "year"}


def _wkmeans_edges(x: np.ndarray, w: np.ndarray, k: int) -> list[int]:
    """OPTIMAL weighted 1-D k-means over sorted points: the exact dynamic
    program (Ckmeans.1d.dp-style), minimizing total weighted SSE over
    contiguous partitions. Returns the END index (inclusive) of each
    cluster, len == min(k, n). O(k·n²) with numpy-vectorized inner
    minimization — fine for the bounded point sets this is fed
    (``max_points``-capped). Ties break toward the SMALLEST split index
    at each stage (np.argmin first-minimum)."""
    n = len(x)
    k = min(int(k), n)
    if k < 1:
        raise ValueError(f"buckets must be >= 1, got {k}")
    W = np.concatenate([[0.0], np.cumsum(w, dtype=np.float64)])
    WX = np.concatenate([[0.0], np.cumsum(w * x, dtype=np.float64)])
    WX2 = np.concatenate([[0.0], np.cumsum(w * x * x, dtype=np.float64)])

    def sse(a, b):
        """Weighted SSE of points a..b inclusive; ``a`` may be an array."""
        ww = W[b + 1] - W[a]
        wx = WX[b + 1] - WX[a]
        wx2 = WX2[b + 1] - WX2[a]
        return np.maximum(wx2 - wx * wx / np.maximum(ww, 1e-300), 0.0)

    idx = np.arange(n)
    D = sse(np.zeros(n, dtype=np.int64), idx)  # 1 cluster over 0..m
    back = np.zeros((k, n), dtype=np.int64)
    for c in range(1, k):
        D_new = np.full(n, np.inf)
        for m in range(c, n):
            j = np.arange(c, m + 1)  # last cluster starts at j
            costs = D[j - 1] + sse(j, m)
            a = int(np.argmin(costs))
            D_new[m] = costs[a]
            back[c, m] = c + a
        D = D_new
    ends, m = [], n - 1
    for c in range(k - 1, 0, -1):
        ends.append(m)
        m = int(back[c, m]) - 1
    ends.append(m)
    return list(reversed(ends))


def variable_width_histogram(
    spark,
    index_dir: str,
    query,
    by: str,
    buckets: int,
    max_points: int = 2000,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Variable-width histogram of a numeric doc-value field over a
    query's FULL match set — the Elasticsearch ``variable_width_histogram``
    aggregation analog (EXTENSION): ``buckets`` buckets whose widths
    adapt to the data distribution. Where ES streams a shard-local
    one-pass clustering (order-dependent, approximate), this computes
    the OPTIMAL weighted 1-D k-means partition (exact dynamic program)
    over a bounded summary of the value distribution, so results are
    deterministic and order-free:

      - when the match set has ≤ ``max_points`` DISTINCT values, the
        summary is exact — (value, count) pairs — and the bucketing is
        the true SSE-optimal clustering of the data;
      - otherwise values pre-bin into ``max_points`` equal-width
        micro-bins between the match min/max (one partial-aggregated
        pass; deterministic, unlike a sampled or approx-quantile
        summary), each represented by its weighted mean, and the DP
        clusters the micro-bins — resolution (max−min)/max_points,
        documented.

    Per-bucket stats are then computed EXACTLY over the raw matched
    rows — one projection tags each row against the ≤ ``buckets−1``
    broadcast-literal edges, one partial-aggregated groupBy reduces —
    so ``v_min``/``v_max``/``key`` (the centroid, ES's bucket key) and
    ``n_docs`` are exact even on the micro-binned path.

    Returns (``bucket`` 0-based long, ``v_min``, ``v_max``, ``key`` =
    avg, ``n_docs``), ordered by bucket. Nulls drop (no-value docs
    occupy no bucket); fewer than ``buckets`` distinct values yield one
    bucket per value.

    Scale posture: the match set is never collected — the driver sees
    only the ≤ ``max_points`` summary rows for the DP (the same
    coordinator-sized reduction every ES agg makes); both passes are
    single partial-aggregated groupBys."""
    from pyspark.sql import functions as F

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if max_points < buckets:
        raise ValueError(
            f"max_points ({max_points}) must be >= buckets ({buckets})"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, by)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = (
        docmap.select("segment_id", "doc", by)
        .join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner")
        .filter(F.col(by).isNotNull())
        .select(F.col(by).cast("double").alias("v"))
    )
    vc = matched.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    pts = vc.orderBy("v").limit(int(max_points) + 1).collect()
    if not pts:
        return spark.createDataFrame(
            [], "bucket long, v_min double, v_max double, key double, n_docs long"
        )
    if len(pts) > max_points:
        # micro-bin: equal-width pre-bins between match min/max
        mm = matched.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
        lo, hi = float(mm["lo"]), float(mm["hi"])
        width = (hi - lo) / int(max_points)
        b = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(int(max_points) - 1),
        )
        pts = (
            matched.groupBy(b.alias("mb"))
            .agg(
                (F.sum("v") / F.count(F.lit(1))).alias("v"),
                F.count(F.lit(1)).alias("c"),
            )
            .orderBy("mb")
            .collect()
        )
        x = np.array([float(r["v"]) for r in pts], dtype=np.float64)
        w = np.array([float(r["c"]) for r in pts], dtype=np.float64)
        ends = _wkmeans_edges(x, w, int(buckets))
        # cut on the micro-bin UPPER BOUNDARY (not the bin's mean) so the
        # raw-row tagging assigns exactly the micro-bins the DP clustered
        edges = [lo + (int(pts[e]["mb"]) + 1) * width for e in ends[:-1]]
        # boundary rows belong to the LOWER micro-bin (floor is
        # lower-inclusive) — with a strictly-greater tag the edge value
        # itself must fall below, so nudge edges between bins: the upper
        # boundary of bin mb is the EXCLUSIVE lower edge of bin mb+1,
        # and no raw value in bin mb exceeds it, so `v > edge` already
        # splits exactly on bin membership except for a raw value EQUAL
        # to the boundary, which floor() puts in the upper bin but
        # `v > edge` would keep low: use v >= edge via a half-open tag
        tag = F.lit(0).cast("long")
        for e in edges:
            tag = tag + (F.col("v") >= F.lit(e)).cast("long")
        return (
            matched.groupBy(tag.alias("bucket"))
            .agg(
                F.min("v").alias("v_min"),
                F.max("v").alias("v_max"),
                F.avg("v").alias("key"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .orderBy("bucket")
        )
    x = np.array([float(r["v"]) for r in pts], dtype=np.float64)
    w = np.array([float(r["c"]) for r in pts], dtype=np.float64)
    ends = _wkmeans_edges(x, w, int(buckets))
    edges = [float(x[e]) for e in ends[:-1]]  # inclusive upper edge per bucket
    tag = F.lit(0).cast("long")
    for e in edges:
        tag = tag + (F.col("v") > F.lit(e)).cast("long")
    return (
        matched.groupBy(tag.alias("bucket"))
        .agg(
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.avg("v").alias("key"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("bucket")
    )


def date_histogram(
    spark,
    index_dir: str,
    query,
    by: str,
    interval: str = "day",
    min_doc_count: int = 1,
    extended_bounds: tuple | None = None,
    offset=0,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Calendar histogram of a date doc-value field over a query's FULL
    match set (the ES ``date_histogram`` aggregation): one row per
    occupied bucket -> (``bucket_ms`` = the bucket's UTC start as epoch
    MILLIS — the ES bucket-key convention — , ``n_docs``). Intervals:
    minute / hour / day (fixed-width UTC, pure integer arithmetic on the
    stored micros — no session-timezone dependence) and week (ISO
    Monday) / month / quarter / year (calendar truncation on the UTC
    DATE via ``date_from_unix_date`` + ``trunc``, both timezone-free).
    Nulls drop; one partial-aggregated groupBy, the facet_counts scale
    posture.

    ``min_doc_count=0`` fills calendar gaps (the ES option): every
    bucket from the first to the last OCCUPIED one appears, empty ones
    with ``n_docs = 0``; ``extended_bounds=(lo_ms, hi_ms)`` (epoch
    millis, either side None) widens the range past the data, the
    bounds snapped to their bucket starts like ES does. The spine is a
    ``sequence()`` on the one-row min/max aggregate — fixed intervals
    step in millis, calendar intervals step as DATE + INTERVAL
    arithmetic (timezone-free, dates carry no zone).

    ``offset`` shifts every bucket boundary by a duration (``"+6h"`` /
    ``"-30m"`` / int micros) — the ES shifted-rounding definition:
    ``key = bucket(v − offset) + offset``, so a ``"6h"`` day histogram
    buckets 06:00→06:00 with keys at 06:00. Applied IDENTICALLY to
    extended bounds and the gap spine (everything computes on the
    shifted axis, the offset added back to the output keys), composing
    with min_doc_count=0 exactly like ES. Whole milliseconds only
    (keys are millis)."""
    from pyspark.sql import functions as F

    if interval not in _DATE_HIST_FIXED_US and interval not in _DATE_HIST_TRUNC:
        raise ValueError(
            f"interval {interval!r} not supported — one of "
            f"{sorted(_DATE_HIST_FIXED_US) + sorted(_DATE_HIST_TRUNC)}"
        )
    if min_doc_count not in (0, 1):
        raise ValueError("min_doc_count must be 0 or 1 (ES: gaps on/off)")
    offset_us = _parse_duration_us(offset, "offset") if offset else 0
    if offset_us % 1000:
        raise ValueError(
            "offset must be a whole number of milliseconds — bucket keys "
            "are epoch millis"
        )
    off_ms = offset_us // 1000
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(by)
    if fe is None or not fe.is_date:
        raise ValueError(
            f"date_histogram needs a date field; {by!r} is "
            f"{'absent' if fe is None else repr(fe.field_type)}"
        )
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", by).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    us = F.col(by)
    if offset_us:
        # the whole computation (bucketing, bound snapping, spine) runs
        # on the SHIFTED axis; off_ms rejoins the keys at output
        us = us - F.lit(offset_us)
    bucket_ms = _date_bucket_ms_expr(us, interval)
    occupied = (
        matched.filter(F.col(by).isNotNull())
        .groupBy(bucket_ms.alias("bucket_ms"))
        .agg(F.count("*").alias("n_docs"))
    )
    if min_doc_count == 1:
        if off_ms:
            occupied = occupied.select(
                (F.col("bucket_ms") + F.lit(off_ms)).alias("bucket_ms"),
                "n_docs",
            )
        return occupied
    lo = hi = None
    if extended_bounds is not None:
        e_lo, e_hi = extended_bounds
        # snap each bound to ITS bucket start via the same expression
        # (on the shifted axis, like the data)
        snap = lambda ms: _date_bucket_ms_expr(
            F.lit(int(ms) * 1000 - offset_us), interval
        )
        lo = None if e_lo is None else snap(e_lo)
        hi = None if e_hi is None else snap(e_hi)
    bounds = occupied.agg(
        F.least(F.min("bucket_ms"), lo if lo is not None else F.lit(None).cast("long")).alias("__lo"),
        F.greatest(F.max("bucket_ms"), hi if hi is not None else F.lit(None).cast("long")).alias("__hi"),
    ).filter(F.col("__lo").isNotNull())
    if interval in _DATE_HIST_FIXED_US:
        step = _DATE_HIST_FIXED_US[interval] // 1000  # millis
        spine = bounds.select(
            F.explode(
                F.sequence("__lo", "__hi", F.lit(step).cast("long"))
            ).alias("bucket_ms")
        )
    else:
        # calendar steps: bucket starts are UTC midnights, so they map
        # exactly to DATEs (timezone-free) and back
        n, unit = {"week": (7, "day"), "month": (1, "month"),
                   "quarter": (3, "month"), "year": (1, "year")}[interval]
        day_ms = 86_400_000
        spine = bounds.select(
            F.explode(
                F.sequence(
                    F.date_from_unix_date((F.col("__lo") / day_ms).cast("int")),
                    F.date_from_unix_date((F.col("__hi") / day_ms).cast("int")),
                    F.expr(f"interval {n} {unit}"),
                )
            ).alias("__d")
        ).select((F.unix_date("__d").cast("long") * day_ms).alias("bucket_ms"))
    return (
        spine.join(occupied, "bucket_ms", "left")
        .select(
            (F.col("bucket_ms") + F.lit(off_ms)).alias("bucket_ms"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
    )


_AUTO_HIST_LADDER = [
    # (interval, approximate width in MICROS for bucket-count estimation;
    # calendar widths use the mean Gregorian month/year — estimation
    # only, the real buckets come from date_histogram's calendar math)
    ("minute", 60_000_000),
    ("hour", 3_600_000_000),
    ("day", 86_400_000_000),
    ("week", 604_800_000_000),
    ("month", 2_629_746_000_000),
    ("quarter", 7_889_238_000_000),
    ("year", 31_556_952_000_000),
]


def auto_date_histogram(
    spark,
    index_dir: str,
    query,
    by: str,
    buckets: int = 10,
    min_doc_count: int = 1,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Date histogram that picks its own interval — the Elasticsearch
    ``auto_date_histogram`` aggregation analog (EXTENSION): the FINEST
    interval of the ladder minute → hour → day → week → month → quarter
    → year that needs at most ``buckets`` buckets to span the matched
    data (ES's ladder also carries intra-unit multiples like 5m/3h —
    ours steps unit to unit, a documented simplification; the contract
    "never more than ``buckets`` buckets, interval auto-widened" holds).
    Returns date_histogram's frame plus an ``interval`` column naming
    the choice (constant across rows — ES reports it in the agg meta).

    Selection reads ONE driver-side row — the match set's min/max value
    (an O(1) result like IVF's centroid read, never the match set) —
    then delegates to date_histogram, whose one-groupBy scale posture is
    unchanged. Fixed intervals count buckets exactly; calendar intervals
    estimate with mean Gregorian widths and the true bucket count can
    come out one under the estimate (never over ``buckets``: estimation
    is conservative — floor/floor spans round UP the bucket count).
    An empty/all-null match set returns the empty frame (interval
    'day' by convention, ES returns its finest)."""
    from pyspark.sql import functions as F

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(by)
    if fe is None or not fe.is_date:
        raise ValueError(
            f"auto_date_histogram needs a date field; {by!r} is "
            f"{'absent' if fe is None else repr(fe.field_type)}"
        )
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", by).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    row = matched.agg(
        F.min(by).alias("lo"), F.max(by).alias("hi")
    ).collect()[0]
    if row["lo"] is None:
        hist = date_histogram(
            spark, index_dir, query, by, "day", min_doc_count,
            manifest=manifest, scorer=scorer, default_fields=default_fields,
        )
        return hist.select("bucket_ms", "n_docs", F.lit("day").alias("interval"))
    lo, hi = int(row["lo"]), int(row["hi"])
    chosen = _AUTO_HIST_LADDER[-1][0]
    for interval, width in _AUTO_HIST_LADDER:
        # bucket count as floor-aligned span: exact for the fixed
        # intervals; calendar intervals estimate with mean widths, where
        # boundary alignment can make the TRUE count one higher — the +1
        # margin keeps "never more than `buckets`" honest (so a calendar
        # choice may land one bucket under budget instead)
        n_est = (hi // width) - (lo // width) + 1
        if interval in _DATE_HIST_TRUNC:
            n_est += 1
        if n_est <= buckets:
            chosen = interval
            break
    hist = date_histogram(
        spark, index_dir, query, by, chosen, min_doc_count,
        manifest=manifest, scorer=scorer, default_fields=default_fields,
    )
    return hist.select("bucket_ms", "n_docs", F.lit(chosen).alias("interval"))


def _date_bucket_ms_expr(us, interval: str):
    """Calendar/fixed bucket start of an epoch-micros column as UTC epoch
    MILLIS (the ES bucket-key convention), timezone-free."""
    from pyspark.sql import functions as F

    if interval in _DATE_HIST_FIXED_US:
        w = _DATE_HIST_FIXED_US[interval]
        # FLOOR over double division: exact for |us| < 2^53 (years
        # ~1685..2255); integer `div` would truncate toward zero and
        # mis-bucket pre-1970 values
        return F.floor(us / F.lit(w)).cast("long") * F.lit(w // 1000)
    day = F.floor(us / F.lit(86_400_000_000)).cast("int")
    b = F.trunc(F.date_from_unix_date(day), _DATE_HIST_TRUNC[interval])
    return F.unix_date(b).cast("long") * F.lit(86_400_000)


def cumulative_cardinality(
    spark,
    index_dir: str,
    query,
    by: str,
    of: str,
    interval: str = "day",
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Cumulative distinct-value count per date-histogram bucket — the
    Elasticsearch ``cumulative_cardinality`` pipeline aggregation analog
    (EXTENSION; the canonical "total distinct users to date" curve).
    For each occupied bucket of a ``date_histogram(by, interval)`` over
    the query's match set, reports how many DISTINCT ``of`` values have
    appeared in buckets up to and including it.

    ES computes this approximately by merging per-bucket HyperLogLog
    sketches; here it is EXACT and still scale-safe via the first-seen
    reduction: a value contributes +1 to the cumulative curve exactly at
    its FIRST bucket, so one value-keyed groupBy (min bucket per value —
    linear, partial-aggregated) followed by a per-bucket count of
    first-appearances turns the cumulative distinct into a running sum
    over the BOUNDED bucket list (single-partition window — the same
    coordinator model as every pipeline agg, over already-reduced rows).

    Returns (``bucket_ms``, ``n_docs``, ``n_new`` = values first seen in
    this bucket, ``cum_card``), ordered by bucket. Only occupied buckets
    appear (min_doc_count=1 semantics); docs with NULL ``of`` count in
    ``n_docs`` but carry no value (ES cardinality skips nulls); NULL
    ``by`` drops entirely (no bucket)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if interval not in _DATE_HIST_FIXED_US and interval not in _DATE_HIST_TRUNC:
        raise ValueError(
            f"interval {interval!r} not supported — one of "
            f"{sorted(_DATE_HIST_FIXED_US) + sorted(_DATE_HIST_TRUNC)}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(by)
    if fe is None or not fe.is_date:
        raise ValueError(
            f"cumulative_cardinality needs a date field; {by!r} is "
            f"{'absent' if fe is None else repr(fe.field_type)}"
        )
    fo = manifest.schema.field_by_name(of)
    if fo is None or not fo.is_doc_value or fo.is_geo:
        raise ValueError(
            f"{of!r} is not a doc-value field of this index — "
            f"cardinality counts docmap values"
        )
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = (
        docmap.select("segment_id", "doc", by, of)
        .join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner")
        .filter(F.col(by).isNotNull())
    )
    bucket_ms = _date_bucket_ms_expr(F.col(by), interval)
    hist = matched.groupBy(bucket_ms.alias("bucket_ms")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    firsts = (
        matched.filter(F.col(of).isNotNull())
        .groupBy(of)
        .agg(F.min(bucket_ms).alias("__fb"))
    )
    adds = firsts.groupBy("__fb").agg(F.count(F.lit(1)).alias("n_new"))
    joined = (
        hist.join(adds, hist["bucket_ms"] == adds["__fb"], "left")
        .drop("__fb")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
    )
    w = Window.orderBy("bucket_ms").rowsBetween(Window.unboundedPreceding, 0)
    return (
        joined.withColumn("cum_card", F.sum("n_new").over(w))
        .orderBy("bucket_ms")
    )


_COMPOSITE_KINDS = ("terms", "date_histogram", "histogram")


def composite_agg(
    spark,
    index_dir: str,
    query,
    sources,
    size: int = 10,
    after=None,
    metrics: dict | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Paginated multi-source bucket aggregation over a query's full
    match set — the Elasticsearch ``composite`` aggregation (EXTENSION):
    the scale path for bucket reports whose cardinality exceeds what one
    response (or one coordinator heap) can hold. Buckets stream in
    composite-key order, ``size`` per page, resumable from the previous
    page's last key via ``after``.

    ``sources`` is an ordered list of specs:

      - ``(name, "terms", column)`` — raw docmap column value
        (identity / store=True / keyword / numeric doc value)
      - ``(name, "date_histogram", date_field, interval)`` — bucket
        start as UTC epoch millis (same intervals as
        :func:`date_histogram`)
      - ``(name, "histogram", numeric_column, width)`` — fixed-width
        numeric bucket start (``floor(v/width)*width``, a double)

    Rows with a NULL in any source are omitted (the ES default —
    ``missing_bucket`` is not implemented). ``after`` is the previous
    page's last composite key, a dict ``{name: value}`` or a tuple in
    source order; strictly-greater keys (lexicographic over the source
    order) form the next page. ``metrics`` adds per-bucket metric
    sub-aggregations with facet_stats' ``{out: (fn, col[, rsd])}``
    grammar. Returns one row per bucket: source columns (aliased by
    name), ``n_docs``, then metrics, ordered by the composite key.

    Scale posture: THE point of composite vs a plain terms agg. The
    ``after`` cursor compiles to a row-level lexicographic predicate
    applied BEFORE the groupBy, so page N+1 shuffles only rows whose
    keys sort past the cursor — with Catalyst pushing the leading-key
    comparison into the parquet scan where the column allows. Each page
    is one partial-aggregated shuffle bounded by the page's key range;
    driver memory is O(size) regardless of total bucket cardinality.
    A full-cardinality report = iterate pages; an unpaginated terms agg
    at 100 TB either OOMs the coordinator or silently truncates.
    """
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    if not sources:
        raise ValueError("composite_agg needs at least one source")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )

    names, key_exprs = [], []
    for spec in sources:
        spec = tuple(spec)
        if len(spec) < 3 or spec[1] not in _COMPOSITE_KINDS:
            raise ValueError(
                f"source spec must be (name, kind, column[, param]) with "
                f"kind in {_COMPOSITE_KINDS}, got {spec!r}"
            )
        name, kind, col = spec[0], spec[1], spec[2]
        if name in names:
            raise ValueError(f"duplicate source name {name!r}")
        if col not in matched.columns:
            raise ValueError(
                f"source column {col!r} is not a docmap column of this "
                f"index (identity, store=True or doc-value fields only)"
            )
        if kind == "terms":
            expr = F.col(col)
        elif kind == "date_histogram":
            fe = manifest.schema.field_by_name(col)
            if fe is None or not fe.is_date:
                raise ValueError(
                    f"date_histogram source needs a date field; {col!r} is "
                    f"{'absent' if fe is None else repr(fe.field_type)}"
                )
            interval = spec[3] if len(spec) > 3 else "day"
            if interval not in _DATE_HIST_FIXED_US and interval not in _DATE_HIST_TRUNC:
                raise ValueError(f"unsupported interval {interval!r}")
            expr = _date_bucket_ms_expr(F.col(col), interval)
        else:
            if len(spec) < 4:
                raise ValueError("histogram source needs a width param")
            w = float(spec[3])
            if w <= 0:
                raise ValueError(f"histogram width must be > 0, got {w!r}")
            expr = (
                F.floor(F.col(col).cast("double") / F.lit(w)).cast("double")
                * F.lit(w)
            )
        names.append(name)
        key_exprs.append(expr)
        matched = matched.filter(expr.isNotNull())

    if after is not None:
        if isinstance(after, dict):
            missing = [n for n in names if n not in after]
            if missing:
                raise ValueError(f"after key missing sources: {missing}")
            vals = [after[n] for n in names]
        else:
            vals = list(after)
            if len(vals) != len(names):
                raise ValueError(
                    f"after needs one value per source ({len(names)}), "
                    f"got {len(vals)}"
                )
        # lexicographic strictly-greater over the source order, applied
        # to ROW-LEVEL key expressions (pre-shuffle page pruning)
        pred = None
        for i in range(len(names)):
            clause = key_exprs[i] > F.lit(vals[i])
            for j in range(i):
                clause = (key_exprs[j] == F.lit(vals[j])) & clause
            pred = clause if pred is None else (pred | clause)
        matched = matched.filter(pred)

    aggs = [F.count("*").alias("n_docs")] + _metric_aggs(F, metrics or {})

    return (
        matched.groupBy(*[e.alias(n) for n, e in zip(names, key_exprs)])
        .agg(*aggs)
        .orderBy(*[F.asc(n) for n in names])
        .limit(size)
    )


def numeric_stats(
    spark,
    index_dir: str,
    query,
    of: str,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Aggregate statistics of a numeric doc-value field over a query's
    FULL match set: one row (``n``, ``min``, ``max``, ``sum``, ``avg``).
    Nulls are excluded (SQL aggregate semantics). One map-side-partial
    aggregation — the match set never leaves the cluster."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, of)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    c = F.col(of)
    return matched.agg(
        F.count(c).alias("n"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
    )


def numeric_extended_stats(
    spark,
    index_dir: str,
    query,
    of: str,
    sigma: float = 2.0,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``extended_stats`` aggregation analog over a
    query's FULL match set: numeric_stats plus ``sum_of_squares``,
    POPULATION ``variance`` / ``std_deviation`` (the ES definitions)
    and the ``avg ± sigma·std`` bounds. Same one-aggregation scale
    posture as numeric_stats — every column partial-aggregates."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, of)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    c = F.col(of)
    base = matched.agg(
        F.count(c).alias("n"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
        F.sum(c * c).alias("sum_of_squares"),
        F.var_pop(c).alias("variance"),
        F.stddev_pop(c).alias("std_deviation"),
    )
    s = float(sigma)
    return base.withColumn(
        "std_upper", F.col("avg") + F.lit(s) * F.col("std_deviation")
    ).withColumn("std_lower", F.col("avg") - F.lit(s) * F.col("std_deviation"))


def percentile_ranks(
    spark,
    index_dir: str,
    query,
    of: str,
    values,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``percentile_ranks`` aggregation analog — the
    inverse of percentiles: for each requested value, the percentage of
    matched (non-null) doc values that are <= it. One row per value ->
    (``value``, ``rank``); an empty/all-null match set ranks NULL.

    EXACT by definition — ``100 · count(v <= x) / count(v)`` — where ES
    reports the TDigest sketch's interpolated CDF (documented
    difference; the sketch exists because ES streams through a
    coordinator, Spark's partial-aggregated counts don't need it). One
    aggregation computes every requested value's count in a single
    pass; no second job per value."""
    from pyspark.sql import functions as F

    vals = [float(x) for x in values]
    if not vals:
        raise ValueError("values must name >= 1 rank point")
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, of)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    c = F.col(of)
    aggs = [F.count(c).alias("__n")] + [
        F.count(F.when(c <= F.lit(x), True)).alias(f"__le{i}")
        for i, x in enumerate(vals)
    ]
    row = matched.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(x).alias("value"),
            F.when(
                F.col("__n") > 0,
                F.lit(100.0) * F.col(f"__le{i}") / F.col("__n"),
            ).alias("rank"),
        )
        for i, x in enumerate(vals)
    ])
    return row.select(F.explode(pairs).alias("r")).select("r.value", "r.rank")


def numeric_percentiles(
    spark,
    index_dir: str,
    query,
    of: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Exact interpolated percentiles of a numeric doc-value field over a
    query's FULL match set: one row per requested percentile ->
    (``p``, ``value``). Uses Spark's exact ``percentile`` aggregate
    (linear interpolation at rank p·(n−1) — the same definition as SQL
    ``quantile_cont``), not the approximate sketch, so results are
    deterministic and oracle-comparable. Nulls are excluded. One
    map-side-partial aggregation; the match set never leaves the
    cluster. Exact percentile holds the field values per group in
    memory — fine here because there is ONE group; for
    billions-of-matches profiles use ``percentile_approx`` instead."""
    from pyspark.sql import functions as F

    ps = [float(p) for p in percentiles]
    if not ps or any(not (0.0 <= p <= 1.0) for p in ps):
        raise ValueError("percentiles must be within [0, 1] and non-empty")
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, of)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    p_arr = F.array(*[F.lit(p) for p in ps])
    agg = matched.agg(F.percentile(F.col(of), p_arr).alias("vals"))
    return agg.select(F.posexplode("vals").alias("idx", "value")).select(
        F.element_at(p_arr, F.col("idx") + 1).alias("p"), "value"
    )


def _histogram_field_matched(spark, index_dir, query, field, manifest,
                             scorer, default_fields):
    from pyspark.sql import functions as F

    from ..schema import hist_counts_col, hist_vals_col

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or not fe.is_histogram:
        raise ValueError(
            f"{field!r} is not a histogram field of this index "
            f"(add it with Schema.add_histogram_field)"
        )
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    v_c, c_c = hist_vals_col(field), hist_counts_col(field)
    return (
        docmap.select(
            "segment_id", "doc",
            F.col(v_c).alias("__hv"), F.col(c_c).alias("__hc"),
        ).join(res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"),
        manifest,
    )


def histogram_field_stats(
    spark,
    index_dir: str,
    query,
    field: str,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Stats over a HISTOGRAM field's pre-aggregated distributions —
    the ES stats-aggs-on-histogram-fields behavior (EXTENSION): every
    value weighted by its count, summed across the match set's docs.
    One row (``count``, ``min``, ``max``, ``sum``, ``avg``) where
    count = Σ counts, sum = Σ value·count, min/max ignore zero-count
    entries (an empty bin holds no observation), avg = sum/count.

    Scale posture: the per-doc reduction (Σ counts, Σ v·c, masked
    min/max) happens INSIDE whole-stage codegen via higher-order array
    functions — no explode, no per-observation rows — then ONE
    partial-aggregated global agg; a million docs × 100 bins never
    materialize 10^8 rows."""
    from pyspark.sql import functions as F

    matched, _ = _histogram_field_matched(
        spark, index_dir, query, field, manifest, scorer, default_fields
    )
    row_n = F.aggregate(
        "__hc", F.lit(0).cast("long"), lambda a, x: a + x
    )
    row_s = F.aggregate(
        F.zip_with("__hv", "__hc", lambda v, c: v * c),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    masked = F.zip_with(
        "__hv", "__hc", lambda v, c: F.when(c > 0, v)
    )
    per = matched.select(
        row_n.alias("__n"), row_s.alias("__s"),
        F.array_min(masked).alias("__mn"), F.array_max(masked).alias("__mx"),
    )
    return per.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("count"),
        F.min("__mn").alias("min"),
        F.max("__mx").alias("max"),
        F.sum("__s").alias("sum"),
        (F.sum("__s") / F.sum("__n")).alias("avg"),
    )


def histogram_field_percentiles(
    spark,
    index_dir: str,
    query,
    field: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Weighted percentiles over a HISTOGRAM field's merged
    distribution — the ES percentiles-on-histogram-fields behavior,
    but EXACT where ES feeds the bins into a T-Digest (documented
    difference, deterministic): q(p) = the smallest stored value whose
    cumulative count reaches ``max(ceil(p·N), 1)`` (the classic
    inverted-CDF / type-1 quantile; N = total count). Returns one row
    per percentile -> (``p``, ``value``).

    Scale posture: the match set reduces to ONE row per DISTINCT
    histogram value (a partial-aggregated groupBy — histogram fields
    have a bounded bin vocabulary by construction, that is the point
    of the type); the cumulative window then runs over that bounded
    distinct-value table, never the per-doc rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ps = [float(p) for p in percentiles]
    if not ps or any(not (0.0 <= p <= 1.0) for p in ps):
        raise ValueError("percentiles must be within [0, 1] and non-empty")
    matched, _ = _histogram_field_matched(
        spark, index_dir, query, field, manifest, scorer, default_fields
    )
    pairs = matched.select(
        F.explode(F.arrays_zip("__hv", "__hc")).alias("z")
    ).select(
        F.col("z.__hv").alias("value"), F.col("z.__hc").alias("c")
    )
    dist = pairs.groupBy("value").agg(F.sum("c").alias("c")).filter(
        F.col("c") > 0
    )
    w_cum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = dist.select(
        "value",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("tot"),
    )
    p_arr = F.array(*[F.lit(p) for p in ps])
    aggs = [
        F.min(
            F.when(
                F.col("cum")
                >= F.greatest(F.ceil(F.lit(p) * F.col("tot")), F.lit(1)),
                F.col("value"),
            )
        ).alias(f"__p{i}")
        for i, p in enumerate(ps)
    ]
    one = cum.agg(*aggs).select(
        F.array(*[F.col(f"__p{i}") for i in range(len(ps))]).alias("vals")
    )
    return one.select(F.posexplode("vals").alias("idx", "value")).select(
        F.element_at(p_arr, F.col("idx") + 1).alias("p"), "value"
    )


def boxplot(
    spark,
    index_dir: str,
    query,
    of: str,
    whisker: float = 1.5,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``boxplot`` aggregation analog over a query's
    FULL match set: one row (``min``, ``max``, ``q1``, ``q2``, ``q3``,
    ``lower``, ``upper``, ``n``). Quartiles are EXACT linear-interpolated
    percentiles (the SQL ``quantile_cont`` definition) where ES
    interpolates a TDigest sketch (documented difference — Spark's
    partial-aggregated exact percentile doesn't need the sketch).

    ``lower``/``upper`` are the whisker positions, the ES definition:
    the smallest actual value >= q1 - whisker·IQR and the largest actual
    value <= q3 + whisker·IQR (whisker defaults to the Tukey 1.5).
    Values outside them are the outliers a box-and-whisker plot draws as
    points. An empty/all-null match set returns n=0 with NULL stats.

    Scale posture: two partial-aggregated passes over the match set —
    quartiles first, then the fence-conditional min/max with the
    one-row quartile frame crossed in as a broadcast literal. No
    driver-side values, no per-bucket job."""
    from pyspark.sql import functions as F

    if whisker < 0:
        raise ValueError("whisker must be >= 0")
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, of)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    c = F.col(of)
    q = matched.agg(
        F.count(c).alias("n"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias(
            "__q"
        ),
    ).select(
        "n", "min", "max",
        F.col("__q")[0].alias("q1"),
        F.col("__q")[1].alias("q2"),
        F.col("__q")[2].alias("q3"),
    )
    w = float(whisker)
    fences = q.select(
        "q1", "q3",
        (F.col("q1") - F.lit(w) * (F.col("q3") - F.col("q1"))).alias("__lo"),
        (F.col("q3") + F.lit(w) * (F.col("q3") - F.col("q1"))).alias("__hi"),
    )
    wk = matched.crossJoin(F.broadcast(fences)).agg(
        F.min(F.when(c >= F.col("__lo"), c)).alias("lower"),
        F.max(F.when(c <= F.col("__hi"), c)).alias("upper"),
    )
    return q.crossJoin(F.broadcast(wk)).select(
        "min", "max", "q1", "q2", "q3", "lower", "upper", "n"
    )


def median_absolute_deviation(
    spark,
    index_dir: str,
    query,
    of: str,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``median_absolute_deviation`` aggregation
    analog over a query's FULL match set: one row (``median``, ``mad``,
    ``n``) where mad = median(|v - median(v)|) — the robust dispersion
    statistic. Both medians are EXACT linear-interpolated percentiles
    (the SQL ``quantile_cont`` definition) where ES approximates via a
    TDigest sketch (documented difference — same stance as ``boxplot``:
    Spark's partial-aggregated exact percentile doesn't need the
    sketch). NULL doc values are excluded; an empty/all-null match set
    returns n=0 with NULL median/mad (the ES null result).

    Scale posture: two partial-aggregated passes over the match set —
    the median first, then the deviation median with the one-row median
    frame crossed in as a broadcast literal. No driver-side values, no
    window."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, of)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    c = F.col(of)
    med = matched.agg(
        F.count(c).alias("n"),
        F.percentile(c, F.lit(0.5)).alias("median"),
    )
    dev = matched.crossJoin(F.broadcast(med)).agg(
        F.percentile(F.abs(c - F.col("median")), F.lit(0.5)).alias("mad"),
    )
    return med.crossJoin(F.broadcast(dev)).select("median", "mad", "n")


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    MAXIT, EPS, FPMIN = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            return h
    raise RuntimeError("incomplete-beta continued fraction did not converge")


def _betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) — the standard
    lgamma-prefactor + continued-fraction evaluation, with the symmetry
    switch at the convergence boundary."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_two_sided_p(t: float, df: float) -> float:
    """Two-sided Student-t p-value: ``I_{df/(df+t^2)}(df/2, 1/2)`` —
    the exact identity, no scipy. Pinned in tests against published
    critical values (t_{0.025, df})."""
    if df <= 0:
        raise ValueError(f"t-test df must be > 0, got {df}")
    return _betainc_reg(df / 2.0, 0.5, df / (df + t * t))


def t_test(
    spark,
    index_dir: str,
    field_a: str,
    query_a,
    field_b: str | None = None,
    query_b=None,
    ttype: str = "heteroscedastic",
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """Student's t-test over numeric doc values of query match sets —
    the Elasticsearch ``t_test`` aggregation (EXTENSION; ES returns the
    two-sided p-value, reproduced here exactly via the incomplete-beta
    identity — no scipy). Three ES modes:

    - ``heteroscedastic`` (ES default, Welch): populations =
      (``query_a``, ``field_a``) vs (``query_b``, ``field_b`` or
      ``field_a``); unequal variances, Welch–Satterthwaite df.
    - ``homoscedastic``: same populations, pooled variance,
      df = n_a + n_b - 2.
    - ``paired``: ONE match set (``query_a``), per-doc differences
      ``field_a - field_b`` (both non-null — the ES paired contract
      that values pair by document); ``query_b`` must be None.

    Returns a one-row DataFrame (``type, n_a, n_b, mean_a, mean_b, t,
    df, p_value``). Scale posture: each side is one partial-aggregated
    (count, avg, var_samp) over its match set — the values never leave
    the cluster; only the O(1) moment rows reach the driver, where the
    t/df/p arithmetic runs in plain floats. Degenerate inputs (a side
    with n < 2, zero variance everywhere) raise rather than emit NaN."""
    import math

    from pyspark.sql import functions as F

    if ttype not in ("heteroscedastic", "homoscedastic", "paired"):
        raise ValueError(
            "t_test type must be heteroscedastic | homoscedastic | paired, "
            f"got {ttype!r}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    _numeric_field_entry(manifest, field_a)
    docmap = read_docmap(spark, index_dir, manifest)

    def _moments(query, field):
        res, _ = search(
            spark, index_dir, query, limit=None, scorer=scorer,
            manifest=manifest, default_fields=default_fields,
        )
        c = F.col(field)
        row = (
            docmap.select("segment_id", "doc", field)
            .join(res.select("segment_id", "doc"), ["segment_id", "doc"])
            .agg(
                F.count(c).alias("n"),
                F.avg(c).alias("mean"),
                F.var_samp(c).alias("var"),
            )
            .collect()[0]
        )
        return int(row["n"]), row["mean"], row["var"]

    if ttype == "paired":
        if query_b is not None:
            raise ValueError(
                "paired t_test pairs two FIELDS of one match set — pass "
                "field_b and leave query_b unset"
            )
        if not field_b:
            raise ValueError("paired t_test needs field_b")
        _numeric_field_entry(manifest, field_b)
        res, _ = search(
            spark, index_dir, query_a, limit=None, scorer=scorer,
            manifest=manifest, default_fields=default_fields,
        )
        a, b = F.col(field_a), F.col(field_b)
        row = (
            docmap.select("segment_id", "doc", field_a, field_b)
            .join(res.select("segment_id", "doc"), ["segment_id", "doc"])
            .filter(a.isNotNull() & b.isNotNull())
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.avg(a).alias("ma"),
                F.avg(b).alias("mb"),
                F.avg(a - b).alias("md"),
                F.var_samp(a - b).alias("vd"),
            )
            .collect()[0]
        )
        n = int(row["n"])
        if n < 2:
            raise ValueError(f"paired t_test needs >= 2 pairs, got {n}")
        if not row["vd"]:
            raise ValueError("paired t_test: zero variance of differences")
        t = row["md"] / math.sqrt(row["vd"] / n)
        df = float(n - 1)
        out = (ttype, n, n, row["ma"], row["mb"], t, df, t_two_sided_p(t, df))
    else:
        if query_b is None:
            raise ValueError(f"{ttype} t_test needs query_b (population B)")
        fb = field_b or field_a
        _numeric_field_entry(manifest, fb)
        na, ma, va = _moments(query_a, field_a)
        nb, mb, vb = _moments(query_b, fb)
        if na < 2 or nb < 2:
            raise ValueError(
                f"t_test needs >= 2 values per side, got {na} and {nb}"
            )
        if ttype == "heteroscedastic":
            sa, sb = va / na, vb / nb
            if sa + sb == 0.0:
                raise ValueError("t_test: zero variance in both samples")
            t = (ma - mb) / math.sqrt(sa + sb)
            df = (sa + sb) ** 2 / (
                sa * sa / (na - 1) + sb * sb / (nb - 1)
            )
        else:
            sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
            if sp2 == 0.0:
                raise ValueError("t_test: zero pooled variance")
            t = (ma - mb) / math.sqrt(sp2 * (1.0 / na + 1.0 / nb))
            df = float(na + nb - 2)
        out = (ttype, na, nb, ma, mb, t, df, t_two_sided_p(t, df))
    return spark.createDataFrame(
        [out],
        "type string, n_a long, n_b long, mean_a double, mean_b double, "
        "t double, df double, p_value double",
    )


def matrix_stats(
    spark,
    index_dir: str,
    query,
    fields: list[str],
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``matrix_stats`` aggregation analog: moment
    statistics of 2+ numeric doc-value fields over a query's FULL match
    set, plus the covariance/correlation matrix between them. Long-form
    output, one row per ordered (field_x <= field_y) pair:

    - diagonal rows (field_x == field_y): ``n``, ``mean``, ``variance``,
      ``skewness``, ``kurtosis`` (covariance = variance, correlation = 1)
    - off-diagonal rows: ``covariance`` and Pearson ``correlation``
      (moment columns NULL — they belong to the diagonals)

    Definitions are pinned so both engines can recompute them exactly:
    docs missing ANY requested field are excluded entirely (the ES
    listwise behavior — every pair sees the same doc set), POPULATION
    variance/covariance (ES uses the sample forms; population keeps us
    consistent with extended_stats' ES-pinned population std — the
    difference is the n/(n-1) factor, documented here), skewness
    m3/m2^1.5 and EXCESS kurtosis m4/m2^2 - 3 from raw power sums.

    Scale posture: ONE partial-aggregated pass computes every power sum
    (n, Σx, Σx², Σx³, Σx⁴ per field, Σxy per pair) map-side; the
    one-row frame explodes driver-free into the long form. No per-field
    or per-pair job."""
    from pyspark.sql import functions as F

    fields = list(fields)
    if len(fields) < 2:
        raise ValueError("matrix_stats wants >= 2 numeric fields")
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate fields: {fields}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    for f in fields:
        _numeric_field_entry(manifest, f)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", *fields).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    # listwise deletion: every pair must see the SAME doc set, else the
    # covariance matrix need not be positive semi-definite
    for f in fields:
        matched = matched.filter(F.col(f).isNotNull())
    cols = {f: F.col(f).cast("double") for f in fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        x = cols[f]
        aggs += [
            F.sum(x).alias(f"__s1_{f}"),
            F.sum(x * x).alias(f"__s2_{f}"),
            F.sum(x * x * x).alias(f"__s3_{f}"),
            F.sum(x * x * x * x).alias(f"__s4_{f}"),
        ]
    pairs = [
        (fields[i], fields[j])
        for i in range(len(fields))
        for j in range(i + 1, len(fields))
    ]
    for a, b in pairs:
        aggs.append(F.sum(cols[a] * cols[b]).alias(f"__sxy_{a}__{b}"))
    row = matched.agg(*aggs)

    n = F.col("__n").cast("double")

    def mean(f):
        return F.col(f"__s1_{f}") / n

    def m2(f):  # population central second moment
        return F.col(f"__s2_{f}") / n - mean(f) * mean(f)

    def m3(f):
        mu = mean(f)
        return (
            F.col(f"__s3_{f}") / n
            - 3 * mu * F.col(f"__s2_{f}") / n
            + 2 * mu * mu * mu
        )

    def m4(f):
        mu = mean(f)
        return (
            F.col(f"__s4_{f}") / n
            - 4 * mu * F.col(f"__s3_{f}") / n
            + 6 * mu * mu * F.col(f"__s2_{f}") / n
            - 3 * mu * mu * mu * mu
        )

    def cov(a, b):
        return F.col(f"__sxy_{a}__{b}") / n - mean(a) * mean(b)

    structs = []
    for f in fields:
        v = m2(f)
        structs.append(F.struct(
            F.lit(f).alias("field_x"), F.lit(f).alias("field_y"),
            F.col("__n").alias("n"), mean(f).alias("mean"),
            v.alias("variance"),
            F.when(v > 0, m3(f) / F.pow(v, 1.5)).alias("skewness"),
            F.when(v > 0, m4(f) / (v * v) - 3.0).alias("kurtosis"),
            v.alias("covariance"),
            F.when(v > 0, F.lit(1.0)).alias("correlation"),
        ))
    for a, b in pairs:
        x, y = sorted((a, b))
        cv, va, vb = cov(a, b), m2(a), m2(b)
        structs.append(F.struct(
            F.lit(x).alias("field_x"), F.lit(y).alias("field_y"),
            F.col("__n").alias("n"),
            F.lit(None).cast("double").alias("mean"),
            F.lit(None).cast("double").alias("variance"),
            F.lit(None).cast("double").alias("skewness"),
            F.lit(None).cast("double").alias("kurtosis"),
            cv.alias("covariance"),
            F.when((va > 0) & (vb > 0), cv / F.sqrt(va * vb)).alias(
                "correlation"
            ),
        ))
    return (
        row.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("field_x", "field_y")
    )


def string_stats(
    spark,
    index_dir: str,
    query,
    of: str,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``string_stats`` aggregation analog over a
    keyword doc-value field of a query's FULL match set: one row
    (``count``, ``min_length``, ``max_length``, ``avg_length``,
    ``entropy``). Entropy is the ES definition — Shannon entropy in
    bits over the CHARACTER distribution of all matched values
    concatenated: -Σ p(c)·log2 p(c). NULL values are excluded; an
    empty match set returns count=0, NULL lengths, entropy 0.

    Scale posture: length stats partial-aggregate in one pass; entropy
    is one explode-to-characters + one partial-aggregated groupBy (at
    most |alphabet| groups survive the map-side combine) + a one-row
    reduction — the values themselves never leave the cluster."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(of)
    if fe is None or not fe.is_keyword:
        raise ValueError(
            f"{of!r} is not a keyword doc-value field of this index"
        )
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.select("segment_id", "doc", of).join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    c = F.col(of)
    lens = matched.agg(
        F.count(c).alias("count"),
        F.min(F.length(c)).alias("min_length"),
        F.max(F.length(c)).alias("max_length"),
        F.avg(F.length(c)).alias("avg_length"),
    )
    chars = (
        matched.filter(c.isNotNull())
        .select(F.explode(F.split(c, "")).alias("ch"))
        .filter(F.col("ch") != "")  # split("", "") yields one empty token
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # -Σ (k/T)·log2(k/T) = log2(T) − (Σ k·log2 k)/T — pure partial sums,
    # no window over the whole frame
    ent = chars.agg(
        F.sum("k").alias("__t"),
        F.sum(F.col("k") * F.log2(F.col("k"))).alias("__klk"),
    ).select(
        F.coalesce(
            F.log2(F.col("__t")) - F.col("__klk") / F.col("__t"), F.lit(0.0)
        ).alias("entropy")
    )
    return lens.crossJoin(F.broadcast(ent)).select(
        "count", "min_length", "max_length", "avg_length", "entropy"
    )


def multi_terms(
    spark,
    index_dir: str,
    query,
    by: list[str],
    metrics: dict | None = None,
    size: int | None = None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``multi_terms`` aggregation analog: buckets
    keyed by TUPLES of 2+ doc-value fields over a query's FULL match
    set, count-descending with key-ascending tie-break (the ES order),
    optional ``size`` top cut. Docs with a NULL in ANY key field fall in
    no bucket (the ES behavior without per-field ``missing``). Metric
    sub-aggs follow the facet_stats grammar.

    Where ES pays a coordinator term-tuple merge with possible
    doc_count_error, the distributed groupBy is EXACT — no error bounds
    needed (documented difference).

    Scale posture: one docmap-joined match set, one partial-aggregated
    groupBy on the composite key; ``size`` cuts via
    TakeOrderedAndProject, never a full sort."""
    from pyspark.sql import functions as F

    by = list(by)
    if len(by) < 2:
        raise ValueError(
            "multi_terms wants >= 2 key fields (one field is facet_stats)"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    for f in by:
        _doc_value_field_entry(manifest, f)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
    )
    for f in by:
        matched = matched.filter(F.col(f).isNotNull())
    aggs = [F.count(F.lit(1)).alias("n_docs")] + _metric_aggs(
        F, metrics or {}
    )
    out = matched.groupBy(*by).agg(*aggs)
    ordered = out.orderBy(F.col("n_docs").desc(), *[F.col(f).asc() for f in by])
    return ordered.limit(int(size)) if size is not None else ordered


def top_hits(
    spark,
    index_dir: str,
    query,
    by: list[str] | str,
    size: int = 3,
    sort: list[tuple] | None = None,
    columns: list[str] | None = None,
    where=None,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``top_hits`` sub-aggregation analog: the top
    ``size`` DOCUMENTS of every bucket — "per language, the 3 best
    hits", the agg that turns a facet report into a browsable one
    (EXTENSION; the reference's collectors return a single global
    ranking only). ``by=[]`` ranks the whole match set as ONE bucket
    (the un-nested ES shape); ``where`` is an optional extra docmap
    predicate (a Column) applied before ranking — geo_line uses it to
    drop docs without a point.

    ``by`` buckets on doc-value column(s) (the enclosing terms-agg key;
    NULL keys form their own bucket, SQL GROUP BY convention).
    ``sort`` is a list of (column, "asc"|"desc") over docmap columns or
    the pseudo-column ``score``; default ``[("score", "desc")]`` — the
    ES ``_score`` default. NULL sort values order LAST under either
    direction (the ES ``missing: _last`` default); the pinned engine
    tie-break (segment_ord asc, doc asc) is ALWAYS appended so results
    are deterministic under any partitioning. ``columns`` picks the
    docmap columns each hit row carries (the ES ``_source`` filter);
    default = every non-internal docmap column.

    Returns one row per emitted hit: (by..., rank, score, sort cols...,
    columns...) with ``rank`` 1-based within its bucket — flat rows,
    not nested arrays, so the result joins/exports like any frame.

    Scale posture: NO raw-row window — a per-bucket row_number would
    drag every row of a hot bucket through one shuffle task, exactly
    the skew top_hits invites ("top 3 per domain" on a crawl corpus).
    Instead the cap_per_group two-phase shape: a map-side Arrow
    pre-prune keeps at most ``size`` rows per bucket per batch (the
    union of per-batch top-k under one total order is a superset of the
    global top-k), then the row_number window ranks ONLY the pruned
    superset — per-bucket window input is O(size × batches), never the
    bucket's match count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    by = [by] if isinstance(by, str) else list(by)
    res, _ = search(
        spark, index_dir, query, limit=None, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    docmap = read_docmap(spark, index_dir, manifest)
    matched = docmap.join(
        res.select("segment_id", "segment_ord", "doc", "score"),
        ["segment_id", "doc"],
        "inner",
    )
    internal = {"segment_id", "segment_ord", "doc"}
    avail = [c for c in matched.columns if c not in internal]
    specs = [(c, str(d)) for c, d in (sort or [("score", "desc")])]
    for col, direction in specs:
        if col not in avail:
            raise ValueError(f"sort column {col!r} not one of {sorted(avail)}")
        if direction not in ("asc", "desc"):
            raise ValueError(
                f"sort direction must be asc/desc, got {direction!r}"
            )
    for col in by:
        if col not in avail or col == "score":
            raise ValueError(f"bucket column {col!r} not a doc-value column")
    if columns is not None:
        for col in columns:
            if col not in avail:
                raise ValueError(
                    f"column {col!r} not one of {sorted(avail)}"
                )
    out_cols = list(
        dict.fromkeys(
            by
            + ["rank", "score"]
            + [c for c, _ in specs]
            + (
                columns
                if columns is not None
                else [c for c in avail if c != "score" and not c.startswith("__")]
            )
        )
    )

    if where is not None:
        matched = matched.filter(where)
    sort_cols = [c for c, _ in specs] + ["segment_ord", "doc"]
    asc_flags = [d == "asc" for _, d in specs] + [True, True]
    gcols, keep = list(by), int(size)

    def _prune(batches):
        for pdf in batches:
            if len(pdf) <= keep:
                yield pdf
                continue
            pdf = pdf.sort_values(
                sort_cols, ascending=asc_flags, na_position="last"
            )
            if gcols:
                yield pdf.groupby(gcols, dropna=False, sort=False).head(keep)
            else:
                yield pdf.head(keep)

    pruned = matched.mapInPandas(_prune, schema=matched.schema)
    order = [
        F.col(c).asc_nulls_last() if d == "asc" else F.col(c).desc_nulls_last()
        for c, d in specs
    ] + [F.asc("segment_ord"), F.asc("doc")]
    w = Window.partitionBy(*(by or [F.lit(0)])).orderBy(*order)
    ranked = pruned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= keep
    )
    return ranked.select(*out_cols)


def top_metrics(
    spark,
    index_dir: str,
    query,
    by: list[str] | str,
    sort: tuple,
    metrics: list[str],
    size: int = 1,
    manifest: Manifest | None = None,
    scorer: str = SCORER_TFIDF,
    default_fields: list[str] | None = None,
):
    """The Elasticsearch ``top_metrics`` aggregation analog: per
    bucket, the ``metrics`` column VALUES carried by the top ``size``
    docs under ONE ``sort`` spec — "per host, the fetch latency of its
    most recent crawl". The lighter sibling of top_hits: a fixed sort
    spec and metric columns only, no document payloads.

    ``sort`` is a single (column, "asc"|"desc") pair (the ES contract —
    exactly one sort); at ``size=1`` this is Spark's ``max_by``/
    ``min_by`` shape, expressed through the same skew-safe two-phase
    plan as top_hits. Returns (by..., rank, sort column, metrics...).
    """
    metrics = list(metrics)
    if not metrics:
        raise ValueError("top_metrics wants >= 1 metric column")
    sort = (sort[0], sort[1])
    return top_hits(
        spark,
        index_dir,
        query,
        by,
        size=size,
        sort=[sort],
        columns=metrics,
        manifest=manifest,
        scorer=scorer,
        default_fields=default_fields,
    ).select(
        *dict.fromkeys(
            ([by] if isinstance(by, str) else list(by))
            + ["rank", sort[0]]
            + metrics
        )
    )


