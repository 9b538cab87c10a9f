"""CLI — mirrors the reference's cobra commands
(/root/reference/cmd/ostrich/cmd/search.go:17-67): open index, parse
query, top-k search, print ``segmentOrd/docID score`` lines + elapsed.

Usage:
    python -m ostrich_spark search QUERY -p INDEX_PATH [-l LIMIT] [-o OFFSET]
        [--scorer tfidf|bm25] [--count]
    python -m ostrich_spark build CORPUS_PARQUET -p INDEX_PATH
        [--field COL]... [--analyzer NAME] [--partitions N] [--order-col COL]
    python -m ostrich_spark merge -p INDEX_PATH
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _spark(cpus: str = "*"):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ostrich-spark-cli")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_search(args) -> int:
    from .query.exec import search

    spark = _spark()
    t0 = time.time()
    paths = args.path if isinstance(args.path, list) else [args.path]
    if len(paths) > 1:
        return _search_alias(spark, paths, args, t0)
    args.path = paths[0]
    mf = None
    if getattr(args, "at", None) is not None:
        if (args.highlight or args.sort_by or args.collapse_by
                or args.group_by or args.boost_by or args.rescore
                or getattr(args, "decay_by", None)
                or getattr(args, "pin", None)
                or getattr(args, "script_score", None)
                or getattr(args, "distance_by", None)):
            print("error: --at composes with plain search only",
                  file=sys.stderr)
            return 2
        from .manifest import load_manifest

        try:
            mf = load_manifest(args.path, opstamp=args.at)
        except FileNotFoundError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    if args.highlight:
        from .highlight import highlight

        snips = highlight(
            spark, args.path, args.query, args.highlight,
            limit=args.limit, scorer=args.scorer,
        )
        elapsed = time.time() - t0
        for s in snips:
            key = " ".join(f"{k}={v}" for k, v in s.doc_key.items())
            print(f"{s.score:.4f} {key}  {s.text}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.sort_by:
        from .query.exec import search_sorted

        info = {}
        res = search_sorted(
            spark,
            args.path,
            args.query,
            by=args.sort_by,
            ascending=args.asc,
            limit=args.limit,
            offset=args.offset,
            scorer=args.scorer,
            early_terminate=args.early_terminate,
            scan_info=info,
        )
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['segment_ord']}/{r['doc']} {r[args.sort_by]}")
        if info:
            print(f"segments scanned: {info['segments_scanned']}/"
                  f"{info['segments_total']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    special = [args.collapse_by, args.group_by, args.boost_by, args.rescore,
               getattr(args, "export_hits", None),
               getattr(args, "decay_by", None),
               getattr(args, "pin", None),
               getattr(args, "script_score", None),
               getattr(args, "distance_by", None)]
    if sum(x is not None for x in special) > 1 or (
        any(x is not None for x in special)
        and (args.sort_by or args.highlight or getattr(args, "after", None)
             or getattr(args, "fields", None))
    ):
        print("error: --collapse-by/--group-by/--boost-by/--decay-by/"
              "--rescore/--export-hits/--pin/--script-score/--distance-by "
              "compose with plain search only, one at a time",
              file=sys.stderr)
        return 2
    if getattr(args, "export_hits", None):
        from .query.exec import export_hits

        n = export_hits(
            spark, args.path, args.query, args.export_hits,
            scorer=args.scorer, manifest=mf,  # --at composes: as-of export
        )
        elapsed = time.time() - t0
        print(f"exported {n} hits to {args.export_hits}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.group_by:
        from .query.exec import search_grouped

        res = search_grouped(
            spark, args.path, args.query, args.group_by,
            per_group=args.per_group, groups=args.limit,
            group_offset=args.offset, scorer=args.scorer,
            with_totals=args.group_totals,
        )
        rows = res.collect()
        elapsed = time.time() - t0
        last_g = None
        for r in rows:
            if r["group_rank"] != last_g:
                total = (f" of {r['group_total']} matches"
                         if args.group_totals else "")
                print(f"{args.group_by}={r[args.group_by]} "
                      f"(group {r['group_rank']}{total})")
                last_g = r["group_rank"]
            print(f"  {r['score']:.4f} {r['segment_ord']}/{r['doc']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.collapse_by:
        from .query.exec import search_collapsed

        res = search_collapsed(
            spark, args.path, args.query, args.collapse_by,
            limit=args.limit, offset=args.offset, scorer=args.scorer,
        )
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['score']:.4f} {r['segment_ord']}/{r['doc']} "
                  f"{args.collapse_by}={r[args.collapse_by]}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.boost_by:
        from .query.exec import search_boosted

        res = search_boosted(
            spark, args.path, args.query, args.boost_by,
            weight=args.boost_weight, mode=args.boost_mode,
            limit=args.limit, offset=args.offset, scorer=args.scorer,
        )
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['score']:.4f} {r['segment_ord']}/{r['doc']} "
                  f"(base {r['base_score']:.4f}, {args.boost_by}={r[args.boost_by]})")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if getattr(args, "decay_by", None):
        if args.origin is None or args.scale is None:
            print("error: --decay-by requires --origin and --scale",
                  file=sys.stderr)
            return 2
        from .query.exec import search_decayed

        try:
            res = search_decayed(
                spark, args.path, args.query, args.decay_by,
                args.origin, args.scale, fn=args.decay_fn,
                decay=args.decay, decay_offset=args.decay_offset,
                limit=args.limit, offset=args.offset, scorer=args.scorer,
            )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['score']:.4f} {r['segment_ord']}/{r['doc']} "
                  f"(base {r['base_score']:.4f}, "
                  f"{args.decay_by}={r[args.decay_by]})")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if getattr(args, "pin", None):
        from .query.exec import search_pinned

        ids = [v for v in args.pin.split(",") if v]
        try:
            res = search_pinned(
                spark, args.path, ids, args.query, key_col=args.pin_col,
                limit=args.limit, offset=args.offset, scorer=args.scorer,
            )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            tag = " [pinned]" if r["pinned"] else ""
            print(f"{r['segment_ord']}/{r['doc']} {r['score']}{tag}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if getattr(args, "script_score", None):
        from .query.exec import search_script_score

        try:
            res = search_script_score(
                spark, args.path, args.query, args.script_score,
                limit=args.limit, offset=args.offset, scorer=args.scorer,
            )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['score']:.4f} {r['segment_ord']}/{r['doc']} "
                  f"(base {r['base_score']:.4f})")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if getattr(args, "distance_by", None):
        if args.origin is None or args.pivot is None:
            print("error: --distance-by requires --origin and --pivot",
                  file=sys.stderr)
            return 2
        from .query.exec import search_distance_feature

        try:
            res = search_distance_feature(
                spark, args.path, args.query, args.distance_by,
                args.origin, args.pivot, boost=args.boost_weight,
                limit=args.limit, offset=args.offset, scorer=args.scorer,
            )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['score']:.4f} {r['segment_ord']}/{r['doc']} "
                  f"(base {r['base_score']:.4f}, "
                  f"{args.distance_by}={r[args.distance_by]})")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.rescore:
        from .query.exec import rescore as _rescore

        res = _rescore(
            spark, args.path, args.query, args.rescore,
            window=args.rescore_window, weight=args.rescore_weight,
            limit=args.limit, scorer=args.scorer,
        )
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['score']:.4f} {r['segment_ord']}/{r['doc']} "
                  f"(base {r['base_score']:.4f} + rescore {r['rescore_score']:.4f})")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    after = None
    if getattr(args, "after", None):
        s, so, d = args.after.split(",")
        after = (float(s), int(so), int(d))
    query = args.query
    if getattr(args, "combined", False) and not getattr(args, "fields", None):
        raise SystemExit("--combined needs --fields F1,F2[^w]")
    if getattr(args, "fields", None):
        # multi-field: dismax per field (MultiFieldQueryParser analog),
        # or term-centric BM25F with --combined (ES combined_fields)
        from .manifest import load_manifest
        from .query.parser import parse_combined_fields, parse_multi_field

        if mf is None:  # --at pins the manifest (and its schema) above
            mf = load_manifest(args.path)
        boosts = {}
        for f in args.fields.split(","):
            if "^" in f:
                name, b = f.rsplit("^", 1)
                boosts[name] = float(b)
            else:
                boosts[f] = 1.0
        if getattr(args, "combined", False):
            if args.tie:
                raise SystemExit("--tie is dismax-only; not valid with --combined")
            query = parse_combined_fields(args.query, mf.schema, boosts)
        else:
            query = parse_multi_field(args.query, mf.schema, boosts, args.tie)
    if getattr(args, "lenient", False) and isinstance(query, str):
        # ES simple_query_string contract for user-facing search boxes:
        # invalid syntax degrades to its words, never errors
        from .manifest import load_manifest
        from .query.parser import parse_query_lenient

        if mf is None:
            mf = load_manifest(args.path)
        query = parse_query_lenient(
            query, mf.schema, default_operator=args.default_operator
        )
    if getattr(args, "terms", None):
        # --terms field=v1,v2 → non-scoring FILTER TermsQuery (the ES
        # terms-filter shape): one docmap scan per flag, any set size
        from .manifest import load_manifest
        from .query.parser import BooleanQuery, TermsQuery, parse_query

        if mf is None:
            mf = load_manifest(args.path)
        filters = []
        for spec in args.terms:
            fname, _, vals = spec.partition("=")
            fe = mf.schema.field_by_name(fname)
            if not vals or fe is None or not (fe.is_keyword or fe.is_ip):
                print(
                    f"error: --terms wants KEYWORDFIELD=v1,v2 "
                    f"(got {spec!r})", file=sys.stderr,
                )
                return 2
            filters.append(TermsQuery(fe.id, tuple(vals.split(","))))
        base = (
            parse_query(query, mf.schema, default_operator=args.default_operator)
            if isinstance(query, str)
            else query
        )
        query = BooleanQuery.filtering(base, *filters)
    if getattr(args, "range_rel", None):
        # --range-rel FIELD=REL:LO,HI → non-scoring FILTER
        # RangeFieldQuery over a stored-interval field (ES range query
        # on range fields); empty LO/HI = open end
        from .manifest import load_manifest
        from .query.parser import (
            BooleanQuery, QueryParseError, RangeFieldQuery, parse_query,
        )

        if mf is None:
            mf = load_manifest(args.path)
        filters = []
        for spec in args.range_rel:
            fname, _, rest = spec.partition("=")
            rel, _, bounds = rest.partition(":")
            lo_s, _, hi_s = bounds.partition(",")
            fe = mf.schema.field_by_name(fname)
            if fe is None or not fe.is_range or not rel:
                print(
                    f"error: --range-rel wants RANGEFIELD=REL:LO,HI "
                    f"(got {spec!r})", file=sys.stderr,
                )
                return 2
            try:
                filters.append(RangeFieldQuery(
                    fe.id, rel,
                    float(lo_s) if lo_s.strip() else None,
                    float(hi_s) if hi_s.strip() else None,
                ))
            except (QueryParseError, ValueError) as e:
                print(f"error: --range-rel {spec!r}: {e}", file=sys.stderr)
                return 2
        base = (
            parse_query(query, mf.schema, default_operator=args.default_operator)
            if isinstance(query, str)
            else query
        )
        query = BooleanQuery.filtering(base, *filters)
    if getattr(args, "ids", None):
        # --ids col=v1,v2 → non-scoring FILTER IdsQuery over an IDENTITY
        # docmap column (the ES ids-query shape; no mapping needed)
        from .manifest import load_manifest
        from .query.parser import BooleanQuery, IdsQuery, parse_query

        if mf is None:
            mf = load_manifest(args.path)
        col, _, vals = args.ids.partition("=")
        if not vals:
            print(f"error: --ids wants COLUMN=v1,v2 (got {args.ids!r})",
                  file=sys.stderr)
            return 2
        base = (
            parse_query(query, mf.schema, default_operator=args.default_operator)
            if isinstance(query, str)
            else query
        )
        query = BooleanQuery.filtering(
            base, IdsQuery(col, tuple(vals.split(",")))
        )
    res, cnt = search(
        spark,
        args.path,
        query,
        limit=args.limit,
        offset=args.offset,
        scorer=args.scorer,
        with_count=args.count,
        after=after,
        manifest=mf,
        default_operator=args.default_operator,
    )
    rows = res.collect()
    elapsed = time.time() - t0
    # output contract of cmd/ostrich/cmd/search.go:55-63
    for r in rows:
        print(f"{r['segment_ord']}/{r['doc']} {r['score']}")
    if args.count:
        print(f"count: {cnt}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def _search_alias(spark, paths, args, t0) -> int:
    """Multi-index alias search: ``index_ord:segment_ord/doc score``
    lines in the global merged ranking (same contract as single-index
    search with the alias position prefixed)."""
    from .manifest import load_manifest
    from .query.multi import search_multi

    for opt in ("highlight", "sort_by", "after", "at",
                "collapse_by", "group_by", "boost_by", "decay_by",
                "rescore", "export_hits"):
        if getattr(args, opt, None):
            print(f"error: --{opt.replace('_', '-')} is single-index only "
                  f"(one -p)", file=sys.stderr)
            return 2
    query = args.query
    if getattr(args, "fields", None):
        from .query.parser import parse_multi_field

        mf = load_manifest(paths[0])
        boosts = {}
        for f in args.fields.split(","):
            if "^" in f:
                name, b = f.rsplit("^", 1)
                boosts[name] = float(b)
            else:
                boosts[f] = 1.0
        query = parse_multi_field(args.query, mf.schema, boosts, args.tie)
    alias_filters = None
    if getattr(args, "alias_filter", None):
        if len(args.alias_filter) != len(paths):
            print(
                f"error: --alias-filter must repeat once per -p "
                f"({len(args.alias_filter)} vs {len(paths)}; pass '' for "
                f"an unfiltered index)",
                file=sys.stderr,
            )
            return 2
        alias_filters = [f or None for f in args.alias_filter]
    index_boosts = getattr(args, "index_boost", None)
    if index_boosts and len(index_boosts) != len(paths):
        print(
            f"error: --index-boost must repeat once per -p "
            f"({len(index_boosts)} vs {len(paths)})",
            file=sys.stderr,
        )
        return 2
    try:
        res, cnt = search_multi(
            spark, paths, query,
            limit=args.limit, offset=args.offset,
            scorer=args.scorer, with_count=args.count,
            alias_filters=alias_filters, index_boosts=index_boosts,
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    rows = res.collect()
    elapsed = time.time() - t0
    for r in rows:
        print(f"{r['index_ord']}:{r['segment_ord']}/{r['doc']} {r['score']}")
    if args.count:
        print(f"count: {cnt}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_facet(args) -> int:
    """Facet counts over a query's full match set: ``value n_docs``
    lines, most-populous first. --by columns come from the docmap
    (identity / store=True fields) or, with --source + --join-on, from
    the original corpus table."""
    from pyspark.sql import functions as F

    from .query.exec import facet_counts

    spark = _spark()
    t0 = time.time()
    join_df = spark.read.parquet(args.source) if args.source else None
    metrics = {}
    for spec in args.metric or []:
        # out=fn:col  (e.g. avg_sz=avg:n_chars, repos=count_distinct:repo)
        try:
            out, rest = spec.split("=", 1)
            fn, col = rest.split(":", 1)
        except ValueError:
            print(f"facet: bad --metric {spec!r} (want out=fn:col)",
                  file=sys.stderr)
            return 2
        metrics[out] = (fn, col)
    if metrics:
        from .query.exec import facet_stats

        fc = facet_stats(
            spark, args.path, args.query, by=args.by, metrics=metrics,
            join_df=join_df, join_on=args.join_on or None, scorer=args.scorer,
        )
    else:
        fc = facet_counts(
            spark,
            args.path,
            args.query,
            by=args.by,
            join_df=join_df,
            join_on=args.join_on or None,
            scorer=args.scorer,
        )
    rows = fc.orderBy(F.desc("n_docs"), *args.by).collect()
    elapsed = time.time() - t0
    for r in rows:
        key = " ".join(str(r[b]) for b in args.by)
        extra = "".join(f"  {m}={r[m]}" for m in metrics)
        print(f"{key} {r['n_docs']}{extra}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_percolate(args) -> int:
    """Reverse search: which stored queries match each incoming doc."""
    from .manifest import load_manifest
    from .percolate import percolate, register_queries

    queries = {}
    for q in args.query:
        if "=" not in q:
            print(f"error: --query needs ID=NQL, got {q!r}", file=sys.stderr)
            return 2
        qid, nql = q.split("=", 1)
        queries[qid] = nql
    spark = _spark()
    schema = load_manifest(args.path).schema
    try:
        pq = register_queries(queries, schema)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    matched = percolate(spark, docs, pq, schema, id_col=args.id_col)
    rows = matched.orderBy(args.id_col, "query_id").limit(args.show).collect()
    n = matched.count()
    elapsed = time.time() - t0
    for r in rows:
        print(f"{r[args.id_col]} -> {r['query_id']}")
    print(f"{n} matches ({len(queries)} stored queries), elapsed: {elapsed:.3f}s")
    return 0


def cmd_suggest(args) -> int:
    """Did-you-mean: ``term doc_freq distance`` lines, distance asc then
    doc_freq desc. The input word is normalized by the field's analyzer
    so suggestions live in the same dictionary space as queries."""
    from .analysis import get_analyzer
    from .manifest import load_manifest
    from .query.expand import suggest_terms

    spark = _spark()
    t0 = time.time()
    mf = load_manifest(args.path)
    fe = mf.schema.field_by_name(args.field)
    if fe is None or fe.is_doc_value:
        print(f"error: {args.field!r} is not a text field", file=sys.stderr)
        return 2
    if args.phrase:
        from .phrase_suggest import phrase_suggest, train_phrase_lm

        try:
            if args.train:
                train_phrase_lm(spark, args.path, args.field, manifest=mf)
            out = phrase_suggest(
                spark, args.path, args.field, args.term,
                size=args.size, max_edits=args.max_dist,
                prefix_length=args.prefix_length,
                confidence=args.confidence, max_errors=args.max_errors,
                smoothing=args.smoothing,
                transpositions=args.transpositions,
                collate=args.collate, manifest=mf,
            )
        except (ValueError, FileNotFoundError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        for p in out:
            print(f"{p.text}\t{p.score:.6f}\t{p.n_errors} fixed")
        print(f"elapsed: {time.time() - t0:.3f}s")
        return 0
    toks = get_analyzer(fe.query_analyzer).analyze_one(args.term)
    if len(args.term.split()) > 1:
        # multi-WORD input (user typed whitespace): whole-text correction
        # (phrase-suggester lite — per-word greedy, only out-of-dictionary
        # words corrected). A single typed word stays in term-suggestion
        # mode even when the analyzer splits it (merge_polcy -> merge,
        # polcy): its first token anchors the dictionary lookup.
        from .query.expand import suggest_text

        corrected, fixes = suggest_text(
            spark, args.path, mf, fe.id, toks,
            max_dist=args.max_dist, prefix_length=args.prefix_length,
            transpositions=args.transpositions,
        )
        elapsed = time.time() - t0
        print(" ".join(corrected))
        for orig, repl, dist in fixes:
            print(f"  {orig} -> {repl} (dist {dist})")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    word = toks[0] if toks else args.term.lower()
    out = suggest_terms(
        spark, args.path, mf, fe.id, word,
        max_dist=args.max_dist, prefix_length=args.prefix_length,
        transpositions=args.transpositions,
    )[: args.top]
    elapsed = time.time() - t0
    for t, df, d in out:
        print(f"{t} {df} {d}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_complete(args) -> int:
    """Completion suggester: ``term doc_freq distance`` lines — the
    dictionary terms completing the typed prefix, popularity
    (doc_freq) ranked; ``--fuzzy`` tolerates typos INSIDE the prefix
    (the ES fuzzy-completion semantics)."""
    from .manifest import load_manifest
    from .query.expand import complete_terms

    spark = _spark()
    t0 = time.time()
    mf = load_manifest(args.path)
    fe = mf.schema.field_by_name(args.field)
    if fe is None or fe.is_doc_value:
        print(f"error: {args.field!r} is not a text field", file=sys.stderr)
        return 2
    out = complete_terms(
        spark, args.path, mf, fe.id, args.prefix.lower(),
        size=args.size, fuzzy=args.fuzzy, max_dist=args.max_dist,
    )
    elapsed = time.time() - t0
    for t, df, d in out:
        print(f"{t} {df} {d}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_terms(args) -> int:
    """Dictionary enumeration (ES _terms_enum analog): ``term doc_freq``
    lines in term order, prefix-pruned, pageable with --after."""
    from .query.expand import terms_enum

    spark = _spark()
    t0 = time.time()
    try:
        out = terms_enum(
            spark, args.path, args.field, prefix=args.prefix,
            size=args.size, search_after=args.after,
            case_insensitive=args.case_insensitive,
        )
    except ValueError as e:
        print(f"terms: {e}", file=sys.stderr)
        return 2
    elapsed = time.time() - t0
    for t, df in out:
        print(f"{t} {df}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_knn(args) -> int:
    """Vector search surface: build a persisted IVF index (optionally
    int8-quantized) and query it partition-pruned (+ rescored), or
    brute-force a parquet embedding table directly."""
    from .similarity import brute_force_topk, ivf_build, ivf_search

    spark = _spark()
    t0 = time.time()

    def qvec():
        if args.vector is not None:
            return [float(x) for x in args.vector.split(",")]
        if args.vec_id is None or args.emb is None:
            print("error: query needs --vector or (--vec-id with --emb)",
                  file=sys.stderr)
            return None
        rows = (
            spark.read.parquet(args.emb)
            .filter(F.col("vec_id") == args.vec_id).limit(1).collect()
        )
        if not rows:
            print(f"error: vec_id {args.vec_id} not in {args.emb}",
                  file=sys.stderr)
            return None
        return [float(x) for x in rows[0]["embedding"]]

    from pyspark.sql import functions as F

    if args.action == "build":
        if not args.emb:
            print("error: build needs --emb PARQUET", file=sys.stderr)
            return 2
        ivf_build(
            spark, spark.read.parquet(args.emb), args.path,
            n_centroids=args.centroids, train_iters=args.train_iters,
            quantize=args.quantize, pq_m=args.pq_m, pq_ksub=args.pq_ksub,
        )
        print(f"built IVF index at {args.path} "
              f"({args.centroids} centroids"
              + (", int8-quantized" if args.quantize else "")
              + (f", PQ m={args.pq_m}/ksub={args.pq_ksub}"
                 if args.pq_m else "")
              + f"), elapsed: {time.time() - t0:.3f}s")
        return 0
    q = qvec()
    if q is None:
        return 2
    if args.action == "brute":
        if not args.emb:
            print("error: brute needs --emb PARQUET", file=sys.stderr)
            return 2
        rows = brute_force_topk(
            spark.read.parquet(args.emb), q, k=args.k
        ).collect()
    else:  # search
        try:
            rows = ivf_search(
                spark, args.path, q, k=args.k, nprobe=args.nprobe,
                rescore_factor=args.rescore, use_pq=args.use_pq,
            ).collect()
        except ValueError as e:
            print(f"knn: {e}", file=sys.stderr)
            return 2
    for r in rows:
        print(f"{r['vec_id']} {r['sim']:.6f}")
    print(f"{len(rows)} hits, elapsed: {time.time() - t0:.3f}s")
    return 0


def cmd_stream(args) -> int:
    """Data-stream management (ES data stream / rollover analog):
    create / status / rollover / search over numbered generation
    indexes with alias-global scoring."""
    import json as _json

    from .datastream import (
        StreamError,
        attach_stream_docmap,
        create_stream,
        rollover,
        search_stream,
        stream_stats,
    )

    try:
        if args.action == "create":
            # --field/--keyword-field/--date-field persist an index
            # TEMPLATE (same NAME=SOURCE syntax as `build`) so `stream
            # append` needs no schema flags — without them the stream is
            # untemplated and only library callers with an explicit
            # Schema can append
            tpl = None
            if (args.field or args.keyword_field or args.date_field
                    or args.ip_field):
                from .schema import Schema

                tpl = Schema()
                for f in args.field or []:
                    name, _, src = f.partition("=")
                    tpl.add_text_field(name, args.analyzer, source_col=src)
                for f in args.keyword_field or []:
                    name, _, src = f.partition("=")
                    tpl.add_keyword_field(name, source_col=src)
                for f in args.date_field or []:
                    name, _, src = f.partition("=")
                    tpl.add_date_field(name, source_col=src)
                for f in args.ip_field or []:
                    name, _, src = f.partition("=")
                    tpl.add_ip_field(name, source_col=src)
            st = create_stream(args.path, name=args.name, schema=tpl)
            print(f"created stream {st['name']!r} "
                  f"(write index {st['generations'][-1]}"
                  + (", templated" if tpl is not None else "") + ")")
            return 0
        if args.action == "status":
            print(_json.dumps(stream_stats(args.path), indent=1))
            return 0
        if args.action == "prune":
            from .datastream import prune_generations

            dropped = prune_generations(args.path, keep_last=args.keep)
            print(f"pruned {len(dropped)} generation(s)"
                  + (f": {', '.join(dropped)}" if dropped else ""))
            return 0
        if args.action == "append":
            # ingest into the write index under the stream TEMPLATE —
            # an untemplated stream errors loudly (datastream.append),
            # matching the library contract; the CLI never guesses a
            # schema for a stream
            if not args.input:
                print("error: append needs --input CORPUS", file=sys.stderr)
                return 2
            from .datastream import append as stream_append
            from .sources import load_corpus

            spark = _spark()
            df = load_corpus(spark, args.input, shape=False)
            m = stream_append(
                spark, df, None, args.path,
                num_partitions=args.partitions,
                order_col=args.order_col,
                id_cols=args.id_col or None,
            )
            st = stream_stats(args.path)
            print(f"appended into {st['write_index']}: now "
                  f"{m.total_docs} docs / {len(m.segments)} segments")
            return 0
        if args.action == "rollover":
            r = rollover(
                args.path, max_docs=args.max_docs,
                max_segments=args.max_segments, force=args.force,
            )
            fired = [k for k, v in r["conditions"].items() if v]
            print(f"rolled: {r['rolled']}"
                  + (f" ({', '.join(fired)})" if fired else "")
                  + f"; write index: {os.path.basename(r['write_index'])}")
            return 0
        # search
        spark = _spark()
        t0 = time.time()
        res, _ = search_stream(
            spark, args.path, args.query, limit=args.limit, scorer=args.scorer
        )
        rows = attach_stream_docmap(spark, args.path, res).collect()
        elapsed = time.time() - t0
        for r in rows:
            keys = {
                k: r[k] for k in r.asDict()
                if k not in ("index_ord", "segment_id", "segment_ord",
                             "doc", "score")
            }
            kv = " ".join(f"{k}={v}" for k, v in keys.items())
            print(f"gen={r['index_ord']} {kv} score={r['score']:.6f}")
        print(f"{len(rows)} hits, elapsed: {elapsed:.3f}s")
        return 0
    except StreamError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


def cmd_sigterms(args) -> int:
    """Term-level facet over a query's match set: ``term n_docs
    doc_freq`` lines, foreground-count desc then term asc, top N.
    ``--text`` switches to the significant_text path (stored-source
    re-analysis of the top ``--shard-size`` hits per segment, duplicate
    6-token runs filtered unless ``--keep-dups``)."""
    from pyspark.sql import functions as F

    from .query.exec import significant_terms, significant_text

    spark = _spark()
    t0 = time.time()
    if args.text:
        st = significant_text(
            spark, args.path, args.query, args.field,
            scorer=args.scorer, min_doc_count=args.min_doc_count,
            shard_size=args.shard_size,
            filter_duplicate_text=not args.keep_dups,
        )
    else:
        st = significant_terms(
            spark, args.path, args.query, args.field,
            scorer=args.scorer, min_doc_count=args.min_doc_count,
        )
    rows = (
        st.orderBy(F.desc("n_docs"), F.asc("term")).limit(args.top).collect()
    )
    elapsed = time.time() - t0
    for r in rows:
        print(f"{r['term']} {r['n_docs']} {r['doc_freq']}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_agg(args) -> int:
    """Numeric doc-value aggregation over a query's FULL match set:
    --stats FIELD prints one n/min/max/sum/avg line; --hist FIELD
    --bin W prints ``bucket n_docs`` lines in bucket order."""
    from .query.exec import (
        auto_date_histogram, boxplot, cardinality, date_histogram,
        median_absolute_deviation, multi_terms, numeric_histogram,
        numeric_stats, range_agg, string_stats, t_test,
        variable_width_histogram, cumulative_cardinality,
    )

    n_modes = sum(
        bool(x)
        for x in (args.stats, args.hist, args.cardinality, args.date_hist,
                  args.range, args.boxplot, args.string_stats,
                  args.auto_date_hist, args.multi_terms, args.mad,
                  args.t_test, args.vw_hist, args.cum_card, args.top_hits,
                  args.categorize, args.freq_itemsets, args.sample_by,
                  args.hist_stats, args.hist_pctl, args.ip_prefix)
    )
    if n_modes != 1:
        print("agg: need exactly one of --stats, --hist, --vw-hist, "
              "--date-hist, --auto-date-hist, --range, --boxplot, "
              "--string-stats, --multi-terms, --mad, --t-test, "
              "--top-hits, --categorize, --freq-itemsets, --sample-by "
              "or --cardinality",
              file=sys.stderr)
        return 2
    spark = _spark()
    t0 = time.time()
    if args.ip_prefix:
        from .query.exec import ip_prefix_agg

        try:
            rows = ip_prefix_agg(
                spark, args.path, args.query, args.ip_prefix,
                args.prefix_len, is_ipv6=args.v6, scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['ip_prefix']} {r['n_docs']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.hist_stats or args.hist_pctl:
        from .query.exec import (
            histogram_field_percentiles, histogram_field_stats,
        )

        try:
            if args.hist_stats:
                r = histogram_field_stats(
                    spark, args.path, args.query, args.hist_stats,
                    scorer=args.scorer,
                ).collect()[0]
                elapsed = time.time() - t0
                print(
                    f"count {r['count']}  min {r['min']}  max {r['max']}  "
                    f"sum {r['sum']}  avg {r['avg']}"
                )
            else:
                ps = tuple(float(x) for x in args.ps.split(","))
                rows = histogram_field_percentiles(
                    spark, args.path, args.query, args.hist_pctl,
                    percentiles=ps, scorer=args.scorer,
                ).collect()
                elapsed = time.time() - t0
                for r in rows:
                    print(f"p{r['p']} {r['value']}")
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.freq_itemsets:
        from .itemsets import frequent_item_sets

        try:
            rows = frequent_item_sets(
                spark, args.path, args.query,
                args.freq_itemsets.split(","),
                min_support=args.min_support,
                size=args.size or 10, scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['support_count']} {r['support']:.4f} {r['items']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.sample_by:
        from .query.exec import random_sampler_facet

        if args.sample_p is None:
            print("agg: --sample-by needs --sample-p", file=sys.stderr)
            return 2
        try:
            rows = random_sampler_facet(
                spark, args.path, args.query, by=args.sample_by,
                probability=args.sample_p, scorer=args.scorer,
            ).orderBy(args.sample_by).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r[args.sample_by]} {r['n_docs']} "
                  f"~{r['n_docs_est']:.1f}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.categorize:
        from .query.exec import categorize_text

        try:
            rows = categorize_text(
                spark, args.path, args.query, args.categorize,
                max_tokens=args.max_tokens, size=args.size,
                scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['n_docs']} {r['category']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.top_hits:
        from .query.exec import top_hits

        sort = None
        if args.sort:
            sort = []
            for spec in args.sort.split(","):
                col, _, d = spec.partition(":")
                sort.append((col.strip(), (d or "desc").strip()))
        try:
            rows = top_hits(
                spark, args.path, args.query, by=args.top_hits,
                size=args.size or 3, sort=sort,
                columns=args.columns.split(",") if args.columns else None,
                scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        rows.sort(key=lambda r: (str(r[args.top_hits]), r["rank"]))
        for r in rows:
            d = r.asDict()
            bucket, rank = d.pop(args.top_hits), d.pop("rank")
            score = d.pop("score")
            rest = "  ".join(f"{k}={v}" for k, v in d.items())
            print(f"{bucket} #{rank} score {score:.6f}  {rest}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.t_test:
        try:
            row = t_test(
                spark, args.path, args.t_test, args.query,
                field_b=args.field_b, query_b=args.vs,
                ttype=args.t_type, scorer=args.scorer,
            ).collect()[0]
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        print(
            f"{row['type']}  n_a {row['n_a']}  n_b {row['n_b']}  "
            f"mean_a {row['mean_a']:.6f}  mean_b {row['mean_b']:.6f}  "
            f"t {row['t']:.6f}  df {row['df']:.6f}  "
            f"p_value {row['p_value']:.6g}"
        )
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.mad:
        try:
            row = median_absolute_deviation(
                spark, args.path, args.query, args.mad, scorer=args.scorer,
            ).collect()[0]
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        print(f"n {row['n']}  median {row['median']}  mad {row['mad']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.boxplot:
        try:
            row = boxplot(
                spark, args.path, args.query, args.boxplot,
                scorer=args.scorer,
            ).collect()[0]
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        print(
            f"n {row['n']}  min {row['min']}  q1 {row['q1']}  "
            f"q2 {row['q2']}  q3 {row['q3']}  max {row['max']}  "
            f"whiskers [{row['lower']}, {row['upper']}]"
        )
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.string_stats:
        try:
            row = string_stats(
                spark, args.path, args.query, args.string_stats,
                scorer=args.scorer,
            ).collect()[0]
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        print(
            f"count {row['count']}  len [{row['min_length']}, "
            f"{row['max_length']}] avg {row['avg_length']}  "
            f"entropy {row['entropy']}"
        )
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.cum_card:
        if not args.of:
            print("agg: --cum-card needs --of FIELD (the values counted)",
                  file=sys.stderr)
            return 2
        try:
            rows = cumulative_cardinality(
                spark, args.path, args.query, args.cum_card, args.of,
                interval=args.interval, scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['bucket_ms']} n {r['n_docs']} new {r['n_new']} "
                  f"cum {r['cum_card']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.vw_hist:
        try:
            rows = variable_width_histogram(
                spark, args.path, args.query, args.vw_hist,
                buckets=args.buckets, scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(
                f"{r['bucket']} [{r['v_min']}, {r['v_max']}] "
                f"key {round(r['key'], 6)} n {r['n_docs']}"
            )
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.auto_date_hist:
        try:
            rows = (
                auto_date_histogram(
                    spark, args.path, args.query, args.auto_date_hist,
                    buckets=args.buckets, scorer=args.scorer,
                )
                .orderBy("bucket_ms")
                .collect()
            )
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        import datetime as _dt

        if rows:
            print(f"interval: {rows[0]['interval']}")
        for r in rows:
            iso = _dt.datetime.fromtimestamp(
                r["bucket_ms"] / 1000, _dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            print(f"{r['bucket_ms']} {iso} {r['n_docs']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.multi_terms:
        fields = [f for f in args.multi_terms.split(",") if f]
        try:
            rows = multi_terms(
                spark, args.path, args.query, fields,
                size=args.size, scorer=args.scorer,
            ).collect()
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            key = "|".join(str(r[f]) for f in fields)
            print(f"{key} {r['n_docs']}")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    if args.range:
        try:
            ranges = []
            def _b(s):
                # numeric if it parses, else kept as a string for the
                # date-field resolver (ISO dates: 2024-01, 2024-01-10;
                # time-bearing bounds carry colons — use epoch millis)
                if not s:
                    return None
                try:
                    return float(s)
                except ValueError:
                    return s

            for part in (args.ranges or "").split(","):
                bits = part.split(":")
                if len(bits) == 2:
                    # KEY:CIDR — an ip_range mask bucket (the ES `mask`
                    # form; ip fields only). IPv6 carries colons — use
                    # the API (ip.ip_range_spec) for v6 buckets.
                    from .ip import ip_range_spec

                    ranges.append(ip_range_spec(bits[0], mask=bits[1]))
                    continue
                key, lo, hi = bits
                ranges.append((key, _b(lo), _b(hi)))
        except ValueError:
            print("agg: --ranges wants KEY:LO:HI[,KEY:LO:HI...] with "
                  "empty LO/HI = open (ip fields also take KEY:CIDR "
                  "mask buckets)", file=sys.stderr)
            return 2
        rows = range_agg(
            spark, args.path, args.query, args.range, ranges,
            scorer=args.scorer,
        ).collect()
        elapsed = time.time() - t0
        for r in rows:
            lo = "*" if r["lo"] is None else r["lo"]
            hi = "*" if r["hi"] is None else r["hi"]
            print(f"{r['range_key']} [{lo} TO {hi}) {r['n_docs']}")
    elif args.cardinality:
        row = cardinality(
            spark, args.path, args.query, args.cardinality,
            exact=args.exact, scorer=args.scorer,
        ).collect()[0]
        elapsed = time.time() - t0
        kind = "exact" if args.exact else "approx"
        print(f"n_distinct {row['n_distinct']} ({kind})")
    elif args.stats:
        row = numeric_stats(
            spark, args.path, args.query, args.stats, scorer=args.scorer
        ).collect()[0]
        elapsed = time.time() - t0
        print(
            f"n {row['n']}  min {row['min']}  max {row['max']}  "
            f"sum {row['sum']}  avg {row['avg']}"
        )
    elif args.date_hist:
        try:
            rows = (
                date_histogram(
                    spark, args.path, args.query, args.date_hist,
                    interval=args.interval, scorer=args.scorer,
                    min_doc_count=0 if args.fill else 1,
                    offset=args.offset or 0,
                )
                .orderBy("bucket_ms")
                .collect()
            )
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        import datetime as _dt

        for r in rows:
            iso = _dt.datetime.fromtimestamp(
                r["bucket_ms"] / 1000, _dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            print(f"{r['bucket_ms']} {iso} {r['n_docs']}")
    else:
        try:
            rows = (
                numeric_histogram(
                    spark, args.path, args.query, args.hist, args.bin,
                    scorer=args.scorer,
                    min_doc_count=0 if args.fill else 1,
                    offset=float(args.offset) if args.offset else 0.0,
                )
                .orderBy("bucket")
                .collect()
            )
        except ValueError as e:
            print(f"agg: {e}", file=sys.stderr)
            return 2
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['bucket']} {r['n_docs']}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_mlt(args) -> int:
    """More-like-this: rank docs similar to the given text (or to the
    text read from --file). Prints the same ``segmentOrd/docID score``
    contract as search."""
    from .query.exec import more_like_this

    text = args.text
    if args.file:
        with open(args.file) as f:
            text = f.read()
    if bool(text) == bool(args.id):
        print("mlt: need exactly one of TEXT/--file or --id", file=sys.stderr)
        return 2
    spark = _spark()
    t0 = time.time()
    if args.id:
        from .query.exec import more_like_this_doc

        try:
            res, _ = more_like_this_doc(
                spark, args.path, args.field, args.id, args.id_col,
                max_query_terms=args.max_terms,
                min_doc_freq=args.min_doc_freq,
                limit=args.limit, scorer=args.scorer,
            )
        except ValueError as e:
            print(f"mlt: {e}", file=sys.stderr)
            return 2
    else:
        res, _ = more_like_this(
            spark,
            args.path,
            args.field,
            text,
            max_query_terms=args.max_terms,
            min_doc_freq=args.min_doc_freq,
            limit=args.limit,
            scorer=args.scorer,
        )
    rows = res.collect()
    elapsed = time.time() - t0
    for r in rows:
        print(f"{r['segment_ord']}/{r['doc']} {r['score']}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_msearch(args) -> int:
    """Batched multi-query search: the whole query set runs as ONE Spark
    job (exec.search_many) — the multi-tenant/batch serving shape where
    the per-job scheduling floor amortizes across the set. Queries come
    from repeated -q flags (id=query) or a JSON file {id: query}."""
    import json

    from .query.exec import search_many

    queries: dict[str, str] = {}
    for spec in args.query or []:
        if "=" not in spec:
            print(f"-q expects id=QUERY, got {spec!r}", file=sys.stderr)
            return 2
        qid, q = spec.split("=", 1)
        queries[qid] = q
    if args.file:
        with open(args.file) as f:
            queries.update(json.load(f))
    if not queries:
        print("no queries given (use -q id=QUERY or --file)", file=sys.stderr)
        return 2
    spark = _spark()
    t0 = time.time()
    rows = search_many(
        spark, args.path, queries, limit=args.limit, scorer=args.scorer
    ).collect()
    elapsed = time.time() - t0
    for r in rows:
        print(f"{r['query_id']} {r['segment_ord']}/{r['doc']} {r['score']}")
    print(f"{len(queries)} queries in one job, elapsed: {elapsed:.3f}s")
    return 0


def cmd_geo(args) -> int:
    """Geo-point surface: ``geo distance`` / ``geo bbox`` print matching
    docs (distance adds meters), ``geo nearest`` the k closest,
    ``geo geohash`` / ``geo geotile`` per-cell doc counts."""
    from pyspark.sql import functions as F

    from . import geo as geomod

    def parse_point(s):
        lat, lon = (float(x) for x in s.split(","))
        return lat, lon

    spark = _spark()
    t0 = time.time()
    try:
        if args.mode == "line":
            if not args.sort_by:
                print("geo line: --sort-by FIELD is required",
                      file=sys.stderr)
                return 2
            rows = geomod.geo_line(
                spark, args.path, args.field, args.sort_by,
                by=args.by, size=args.size,
                order="desc" if args.desc else "asc",
            ).collect()
            key = lambda r: ((r[args.by],) if args.by else ()) + (r["seq"],)
            for r in sorted(rows, key=key):
                pre = f"{r[args.by]} " if args.by else ""
                print(f"{pre}#{r['seq']} {r[args.sort_by]} "
                      f"{r['lat']},{r['lon']}")
            print(f"{len(rows)} points, elapsed: {time.time() - t0:.3f}s")
        elif args.mode == "rings":
            if not args.origin:
                print("--origin LAT,LON is required", file=sys.stderr)
                return 2
            lat, lon = parse_point(args.origin)
            try:
                rings = []
                for part in (args.ranges or "").split(","):
                    key, lo, hi = part.split(":")
                    rings.append(
                        (key, float(lo) if lo else None,
                         float(hi) if hi else None)
                    )
            except ValueError:
                print("geo rings: --ranges wants KEY:LO:HI[,...] meters "
                      "with empty LO/HI = open", file=sys.stderr)
                return 2
            rows = geomod.geo_distance_agg(
                spark, args.path, args.field, lat, lon, rings
            ).collect()
            for r in rows:
                lo = "*" if r["lo"] is None else r["lo"]
                hi = "*" if r["hi"] is None else r["hi"]
                print(f"{r['range_key']} [{lo} TO {hi})m {r['n_docs']}")
            print(f"{len(rows)} rings, elapsed: {time.time() - t0:.3f}s")
        elif args.mode in ("distance", "nearest"):
            if not args.origin:
                print("--origin LAT,LON is required", file=sys.stderr)
                return 2
            lat, lon = parse_point(args.origin)
            if args.mode == "distance":
                if args.radius_m is None:
                    print("--radius-m is required", file=sys.stderr)
                    return 2
                df = geomod.geo_distance_search(
                    spark, args.path, args.field, lat, lon, args.radius_m
                )
            else:
                df = geomod.geo_sort(
                    spark, args.path, args.field, lat, lon, args.k,
                    tiebreak=args.tiebreak,
                )
            rows = df.collect()
            ident = [
                c for c in df.columns
                if c not in ("segment_id", "doc", "distance_m")
                and not c.endswith("__lat") and not c.endswith("__lon")
                and c != "content_sha256"
            ]
            for r in rows:
                extra = " ".join(f"{c}={r[c]}" for c in ident)
                print(f"{r['segment_id']}/{r['doc']} {r['distance_m']:.1f}m {extra}")
            print(f"{len(rows)} docs, elapsed: {time.time() - t0:.3f}s")
        elif args.mode == "bbox":
            if not args.box:
                print("--box TOP,LEFT,BOTTOM,RIGHT is required", file=sys.stderr)
                return 2
            top, left, bottom, right = (float(x) for x in args.box.split(","))
            df = geomod.geo_bounding_box_search(
                spark, args.path, args.field, top, left, bottom, right
            )
            rows = df.collect()
            for r in rows:
                print(f"{r['segment_id']}/{r['doc']}")
            print(f"{len(rows)} docs, elapsed: {time.time() - t0:.3f}s")
        elif args.mode == "shape":
            if bool(args.point) == bool(args.box):
                print("geo shape: need exactly one of --point LAT,LON or "
                      "--box TOP,LEFT,BOTTOM,RIGHT", file=sys.stderr)
                return 2
            if args.point:
                geometry = ("point", *parse_point(args.point))
            else:
                geometry = ("bbox", *(float(x) for x in args.box.split(",")))
            df = geomod.shape_search(
                spark, args.path, args.field, args.relation, geometry
            )
            rows = df.select("segment_id", "doc").collect()
            for r in rows:
                print(f"{r['segment_id']}/{r['doc']}")
            print(f"{len(rows)} docs, elapsed: {time.time() - t0:.3f}s")
        elif args.mode == "polygon":
            if not args.points:
                print("--points LAT,LON LAT,LON ... (>= 3) is required",
                      file=sys.stderr)
                return 2
            pts = [parse_point(s) for s in args.points]
            df = geomod.geo_polygon_search(
                spark, args.path, args.field, pts
            )
            rows = df.collect()
            for r in rows:
                print(f"{r['segment_id']}/{r['doc']}")
            print(f"{len(rows)} docs, elapsed: {time.time() - t0:.3f}s")
        else:
            if args.mode == "geohash":
                df = geomod.geohash_grid(
                    spark, args.path, args.field, args.precision
                ).orderBy(F.col("doc_count").desc(), "geohash")
                key = "geohash"
            else:
                df = geomod.geotile_grid(
                    spark, args.path, args.field, args.zoom
                ).orderBy(F.col("doc_count").desc(), "tile_x", "tile_y")
                key = None
            rows = df.collect()
            for r in rows:
                cell = r["geohash"] if key else f"{args.zoom}/{r['tile_x']}/{r['tile_y']}"
                print(f"{cell} {r['doc_count']}")
            print(f"{len(rows)} cells, elapsed: {time.time() - t0:.3f}s")
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    return 0


def cmd_join(args) -> int:
    """Parent/child join queries (ES join-field has_child/has_parent):
    ``join haschild`` prints parents with >= --min-children matching
    children (score per --score-mode); ``join hasparent`` prints the
    children of matching parents (--score inherits the parent score)."""
    from .relations import has_child, has_parent

    spark = _spark()
    t0 = time.time()
    common = dict(
        relation_field=args.relation_field,
        child_relation=args.child,
        parent_relation=args.parent,
        parent_field=args.parent_field,
        id_col=args.id_col,
        limit=args.limit,
        scorer=args.scorer,
    )
    try:
        if args.direction == "haschild":
            res = has_child(
                spark, args.path, args.query,
                score_mode=args.score_mode,
                min_children=args.min_children,
                max_children=args.max_children,
                **common,
            )
        else:
            res = has_parent(
                spark, args.path, args.query, score=args.score, **common
            )
    except ValueError as e:
        print(f"join: {e}", file=sys.stderr)
        return 2
    rows = res.collect()
    elapsed = time.time() - t0
    for r in rows:
        extra = f" children={r['n_children']}" if "n_children" in r else ""
        print(f"{r['segment_ord']}/{r['doc']} {r['score']}{extra}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_build(args) -> int:
    from .build import build_index
    from .schema import Schema

    spark = _spark()
    schema = Schema()
    for f in args.field or ["content"]:
        # NAME=SOURCE indexes another input column under NAME (ES
        # multi-fields): --field title --keyword-field title.raw=title
        name, _, src = f.partition("=")
        schema.add_text_field(name, args.analyzer, source_col=src)
    for f in args.keyword_field or []:
        name, _, src = f.partition("=")
        schema.add_keyword_field(name, source_col=src)
    for f in args.date_field or []:
        name, _, src = f.partition("=")
        schema.add_date_field(name, source_col=src)
    for f in args.ip_field or []:
        name, _, src = f.partition("=")
        schema.add_ip_field(name, source_col=src)
    from .sources import load_corpus

    df = load_corpus(spark, args.corpus, shape=False)
    order_col = args.order_col or (args.id_col[0] if args.id_col else schema.fields[0].name)
    manifest = build_index(
        spark,
        df,
        schema,
        args.path,
        num_partitions=args.partitions,
        order_col=order_col,
        id_cols=args.id_col or [],
        build_id=args.build_id,
    )
    print(f"built {len(manifest.segments)} segments, {manifest.total_docs} docs, opstamp {manifest.opstamp}")
    return 0


def cmd_merge(args) -> int:
    from .merge import consider_merges

    spark = _spark()
    created = consider_merges(spark, args.path)
    print(f"merged into {len(created)} new segments: {created}")
    return 0


def cmd_explain(args) -> int:
    """Lucene-style indented score breakdown for one doc address
    (SEGMENT_ORD/DOC, the form `search` prints)."""
    from .manifest import load_manifest
    from .query.exec import explain

    spark = _spark()
    t0 = time.time()
    ords = load_manifest(args.path).sorted_segments()
    so, doc = args.addr.split("/")
    so = int(so)
    if not (0 <= so < len(ords)):
        print(f"explain: segment_ord {so} out of range", file=sys.stderr)
        return 2
    ex = explain(
        spark, args.path, args.query, ords[so].segment_id, int(doc),
        scorer=args.scorer,
    )
    elapsed = time.time() - t0

    def show(node, depth=0):
        pad = "  " * depth
        head = f"{pad}{node['score']:.6f}  {node['kind']}"
        if node.get("occur"):
            head += f" [{node['occur']}]"
        d = node.get("detail") or {}
        if node["kind"] == "term":
            head += (
                f" {d.get('term')!r} (tf={d.get('tf', 0)}, df={d['doc_freq']}, "
                f"idf={d['idf']:.6f})"
            )
        elif node["kind"] == "phrase":
            head += f" {d.get('terms')} (idf_sum={d['idf_sum']:.6f})"
        if not node["matched"]:
            head += "  [no match]"
        print(head)
        for c in node.get("children", ()):
            show(c, depth + 1)

    state = "TOMBSTONED" if ex["tombstoned"] else ("match" if ex["matched"] else "no match")
    print(f"{args.addr} ({state}, scorer={ex['scorer']})")
    show(ex)
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_check(args) -> int:
    """Integrity check of a committed index snapshot; exit 1 on ERROR
    findings, 0 when healthy (warnings printed but non-fatal)."""
    from .check import check_index

    spark = _spark()
    t0 = time.time()
    findings = check_index(spark, args.path)
    elapsed = time.time() - t0
    for f in findings:
        print(f)
    errors = sum(1 for f in findings if f.startswith("ERROR"))
    print(f"check: {errors} errors, {len(findings) - errors} warnings")
    print(f"elapsed: {elapsed:.3f}s")
    return 1 if errors else 0


def cmd_update(args) -> int:
    """Upsert a corpus batch: tombstone committed docs with matching
    identity, append the batch as new segments. Schema comes from the
    committed manifest — the batch must carry its text/numeric columns
    plus the id columns. With --query instead of a corpus path, rewrites
    every match through --set FIELD=EXPR expressions in place (the ES
    _update_by_query + script analog; no --set = script-less reindex of
    the matches)."""
    from .deletes import update_docs
    from .sources import load_corpus

    if bool(args.corpus) == bool(args.query):
        print(
            "update: need exactly one of a corpus path or --query",
            file=sys.stderr,
        )
        return 2
    if args.query:
        from .deletes import update_by_query

        set_exprs: dict[str, str] = {}
        for kv in args.set or []:
            k, sep, v = kv.partition("=")
            if not sep or not k:
                print(
                    f"update: --set needs FIELD=EXPR, got {kv!r}",
                    file=sys.stderr,
                )
                return 2
            set_exprs[k] = v
        spark = _spark()
        n, manifest = update_by_query(
            spark,
            args.path,
            args.query,
            set_exprs,
            args.build_id,
            num_partitions=args.partitions,
            order_col=args.order_col,
        )
        print(
            f"updated by query: {n} rewritten, now "
            f"{len(manifest.segments)} segments, {manifest.total_docs} "
            f"docs, opstamp {manifest.opstamp}"
        )
        return 0
    if args.set:
        print("update: --set needs --query", file=sys.stderr)
        return 2
    if not args.id_col:
        print("update: corpus mode needs --id-col", file=sys.stderr)
        return 2

    spark = _spark()
    df = load_corpus(spark, args.corpus, shape=False)
    n_tomb, manifest = update_docs(
        spark,
        args.path,
        df,
        args.id_col,
        args.build_id,
        num_partitions=args.partitions,
        order_col=args.order_col,
    )
    print(
        f"updated: {n_tomb} replaced, now {len(manifest.segments)} segments, "
        f"{manifest.total_docs} docs, opstamp {manifest.opstamp}"
    )
    return 0


def cmd_delete(args) -> int:
    """Tombstone docs whose id column matches the given values (or every
    doc matched by --query). Purge physically with `merge`/`purge`."""
    from .deletes import delete_docs

    if not args.values and not args.query:
        print("delete: need --values or --query", file=sys.stderr)
        return 2
    if args.values and not args.id_col:
        print("delete: --values needs --id-col", file=sys.stderr)
        return 2
    spark = _spark()
    if args.values:
        from pyspark.sql import functions as F

        from .manifest import load_manifest
        from .query.exec import read_docmap

        col = args.id_col
        # Resolve the id column's ACTUAL dtype from the docmap schema and
        # cast the CLI strings to it — never infer from the value text
        # (a string id column with values '07' and '7' must stay distinct;
        # an implicit string->long cast-join would conflate them).
        manifest = load_manifest(args.path)
        docmap_schema = read_docmap(spark, args.path, manifest).schema
        if col not in docmap_schema.names:
            print(
                f"delete: id column {col!r} not in docmap "
                f"(have: {', '.join(docmap_schema.names)})",
                file=sys.stderr,
            )
            return 2
        target_type = docmap_schema[col].dataType
        match = spark.createDataFrame(
            [(v,) for v in args.values], f"{col} string"
        ).select(F.col(col).cast(target_type).alias(col))
        bad = match.filter(F.col(col).isNull()).count()
        if bad:
            print(
                f"delete: {bad} value(s) do not cast to the id column's "
                f"type {target_type.simpleString()}",
                file=sys.stderr,
            )
            return 2
        n = delete_docs(spark, args.path, match, [col])
    else:
        # _delete_by_query: the match set's (segment_id, doc) pairs
        # tombstone directly — no identity-column round trip
        from .deletes import delete_by_query

        n = delete_by_query(spark, args.path, args.query)
    print(f"tombstoned {n} docs")
    return 0


def cmd_purge(args) -> int:
    from .merge import purge_deletes

    spark = _spark()
    created = purge_deletes(spark, args.path)
    print(f"purged into {len(created)} rewritten segments: {created}")
    return 0


def cmd_snapshots(args) -> int:
    """Point-in-time snapshots: list retained commits (opstamp, docs,
    segments, pinned tombstone version); --retain K sets the retention
    policy. Search a snapshot with ``search --at OPSTAMP``. Driver-side
    JSON only — no Spark session."""
    import json as _json

    from .manifest import (
        list_snapshots,
        set_snapshot_retention,
        snapshot_retention,
    )

    if args.retain is not None:
        set_snapshot_retention(args.path, args.retain)
        print(f"retention: {args.retain}")
    else:
        print(f"retention: {snapshot_retention(args.path)}")
    for op, path in list_snapshots(args.path):
        with open(path) as f:
            d = _json.load(f)
        docs = sum(s["max_doc"] for s in d["segments"])
        tomb = d.get("tombstone_name") or "-"
        print(f"{op} docs={docs} segments={len(d['segments'])} tombstones={tomb}")
    return 0


def cmd_get(args) -> int:
    """Point lookup: print the stored document(s) for the given id
    values (ES GET analog); deleted docs read as absent. ``--at`` reads
    as-of a retained snapshot."""
    from .manifest import load_manifest
    from .query.exec import get_docs

    spark = _spark()
    mf = None
    if args.at is not None:
        try:
            mf = load_manifest(args.path, opstamp=args.at)
        except FileNotFoundError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    try:
        rows = get_docs(
            spark, args.path, args.values, args.id_col, manifest=mf
        ).collect()
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    for r in rows:
        d = r.asDict()
        addr = f"{d.pop('segment_id')}/{d.pop('doc')}"
        kv = "  ".join(f"{k}={v!r}" for k, v in d.items())
        print(f"{addr} {kv}")
    print(f"found: {len(rows)}/{len(args.values)}")
    return 2 if not rows else 0


def cmd_termvectors(args) -> int:
    """Term vectors (ES _termvectors analog): every indexed term of
    --field with its tf for each requested doc, decoded from the
    postings themselves."""
    from .query.exec import term_vectors

    spark = _spark()
    t0 = time.time()
    try:
        rows = (
            term_vectors(spark, args.path, args.values, args.id_col, args.field)
            .orderBy(args.id_col, "term")
            .collect()
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    last = None
    for r in rows:
        if r[args.id_col] != last:
            last = r[args.id_col]
            print(f"{args.id_col}={last} ({r['segment_id']}/{r['doc']})")
        print(f"  {r['term']} {r['tf']}")
    print(f"elapsed: {time.time() - t0:.3f}s")
    return 0


def cmd_reindex(args) -> int:
    """Rebuild a new index from -p's stored documents with a different
    analyzer / field options (ES _reindex analog). Text fields must have
    been store=True in the source."""
    from .build import reindex
    from .manifest import load_manifest
    from .schema import Schema

    spark = _spark()
    t0 = time.time()
    src_schema = load_manifest(args.path).schema
    schema = Schema()
    for fe in src_schema.fields:
        if fe.is_keyword:
            # read the field's OWN doc-value column from the extract —
            # robust even when a multi-field's source text wasn't stored
            # (values are identical; normalization is idempotent)
            schema.add_keyword_field(fe.name, lowercase=fe.analyzer == "lowercase")
        elif fe.is_date:
            # the extract column is already epoch micros — the long
            # pass-through input shape
            schema.add_date_field(fe.name)
        elif fe.is_ip:
            # the extract column is already canonical hex — the
            # passthrough shape (ip_hex_series keeps canonical values)
            schema.add_ip_field(fe.name)
        elif fe.is_numeric:
            schema.add_numeric_field(fe.name, fe.field_type)
        else:
            schema.add_text_field(
                fe.name,
                args.analyzer or fe.analyzer,
                positions=args.positions or fe.positions,
                store=fe.store,
                search_analyzer=fe.search_analyzer,
                source_col=fe.source_col,  # text multi-field: re-read the
                # (stored) source column, exactly like the original build
            )
    try:
        m = reindex(spark, args.path, args.out, schema, build_id=args.build_id)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"reindexed {m.total_docs} docs into {args.out} "
          f"({len(m.segments)} segments)")
    print(f"elapsed: {time.time() - t0:.3f}s")
    return 0


def cmd_addindexes(args) -> int:
    """Absorb other indexes' segments into -p (IndexWriter.addIndexes
    analog): hardlinked segment dirs + one manifest commit + one
    term-stats rebuild; no re-tokenization."""
    from .export import add_indexes
    from .lock import LockHeldError

    spark = _spark()
    t0 = time.time()
    try:
        m = add_indexes(
            spark, args.path, args.src, hardlink=not args.copy
        )
    except (ValueError, LockHeldError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(
        f"absorbed {len(args.src)} index(es): now {len(m.segments)} "
        f"segments, {m.total_docs} docs (opstamp {m.opstamp})"
    )
    print(f"elapsed: {time.time() - t0:.3f}s")
    return 0


def cmd_alias(args) -> int:
    """Named alias registry (ES _aliases analog): ``alias add NAME -p
    IDX [--filter NQL] [--boost B] [--write]``, ``alias remove NAME -p
    IDX``, ``alias list [NAME]``, ``alias search NAME QUERY``. add and
    remove apply atomically; search resolves the alias's dirs, filters
    and boosts onto the multi-index path. Registry mutations are
    driver-side JSON only — no Spark session."""
    from .aliases import alias_search, get_aliases, update_aliases
    from .lock import LockHeldError

    try:
        if args.action in ("add", "remove"):
            if not args.name or not args.path:
                print(f"alias {args.action}: need NAME and -p INDEX",
                      file=sys.stderr)
                return 2
            if args.action == "add":
                actions = [{"add": {
                    "alias": args.name, "index": args.path,
                    "filter": args.alias_filter, "boost": args.boost,
                    "is_write_index": args.write,
                }}]
            else:
                actions = [{"remove": {"alias": args.name,
                                       "index": args.path}}]
            reg = update_aliases(args.registry, actions)
            n = len(reg.get(args.name, []))
            print(f"alias {args.name!r}: {n} index(es)")
            return 0
        if args.action == "list":
            reg = get_aliases(args.registry, args.name or None)
            for name in sorted(reg):
                for r in reg[name]:
                    bits = [r["index"]]
                    if r["filter"]:
                        bits.append(f"filter={r['filter']!r}")
                    if r["boost"] is not None:
                        bits.append(f"boost={r['boost']}")
                    if r["is_write_index"]:
                        bits.append("write")
                    print(f"{name} -> {'  '.join(bits)}")
            if not reg:
                print("(no aliases)")
            return 0
        # search
        if not args.name or not args.query:
            print("alias search: need NAME and QUERY", file=sys.stderr)
            return 2
        spark = _spark()
        t0 = time.time()
        res, _ = alias_search(
            spark, args.registry, args.name, args.query,
            limit=args.limit, scorer=args.scorer,
        )
        rows = res.collect()
        elapsed = time.time() - t0
        for r in rows:
            print(f"{r['index_ord']}:{r['segment_id']}/{r['doc']} "
                  f"{r['score']:.6f}")
        print(f"{len(rows)} docs")
        print(f"elapsed: {elapsed:.3f}s")
        return 0
    except (ValueError, LockHeldError) as e:
        print(f"alias: {e}", file=sys.stderr)
        return 2


def cmd_evolve(args) -> int:
    """Append-only schema evolution: add a field to a committed index
    (explicit manifest commit; older docs hold no data for it).
    Driver-side JSON only — no Spark session."""
    from .lock import LockHeldError
    from .manifest import add_field

    try:
        m = add_field(
            args.path, args.name,
            analyzer=args.analyzer,
            positions=args.positions,
            store=args.store,
            numeric_type=args.numeric,
            keyword=args.keyword,
            date=args.date,
            ip=args.ip,
        )
    except (ValueError, KeyError, LockHeldError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    fe = m.schema.field_by_name(args.name)
    print(f"added field {fe.id}: {args.name} ({fe.field_type}) opstamp={m.opstamp}")
    return 0


def cmd_export(args) -> int:
    """Consistent clone of the index as of CURRENT (or --at OPSTAMP):
    copies exactly the manifest-pinned file set, manifest written last.
    Driver-side file ops — no Spark session."""
    from .export import export_index
    from .lock import LockHeldError

    try:
        m = export_index(
            args.path, args.out, opstamp=args.at, hardlink=args.hardlink
        )
    except (FileNotFoundError, FileExistsError, LockHeldError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(
        f"exported opstamp={m.opstamp} docs={m.total_docs} "
        f"segments={len(m.segments)} -> {args.out}"
    )
    return 0


def cmd_analyze(args) -> int:
    """ES ``_analyze`` analog: show how text tokenizes under a named
    analyzer or under an index field's own analyzer chain (loading the
    manifest auto-registers the index's custom analyzer specs). Pure
    driver-side — no Spark session."""
    from .analysis import get_analyzer

    name = args.analyzer
    if args.path:
        from .manifest import load_manifest

        try:
            m = load_manifest(args.path)
        except FileNotFoundError:
            print(f"no index at {args.path} (missing manifest.json)",
                  file=sys.stderr)
            return 2
        if not args.field:
            print("error: --path needs --field", file=sys.stderr)
            return 2
        fe = m.schema.field_by_name(args.field)
        if fe is None:
            print(f"error: no field {args.field!r} in the index schema",
                  file=sys.stderr)
            return 2
        if fe.is_doc_value:
            kind = (
                "keyword" if fe.is_keyword
                else "date" if fe.is_date
                else "geo" if fe.is_geo
                else "ip" if fe.is_ip
                else "numeric"
            )
            print(f"field {fe.name!r} is a {kind} doc-value field — "
                  f"never analyzed", file=sys.stderr)
            return 2
        name = fe.query_analyzer if args.query else fe.analyzer
    elif not name:
        name = "default"
    try:
        tokens = get_analyzer(name).analyze_one(args.text)
    except KeyError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"analyzer: {name}")
    for i, t in enumerate(tokens):
        print(f"{i}\t{t}")
    return 0


def cmd_rankeval(args) -> int:
    """Ranking evaluation (ES _rank_eval analog): --requests JSON file
    of {id: {"query": NQL, "ratings": {key: rating}}}; prints one
    'id score' line per request then 'mean <score>'."""
    import json as _json

    from .rank_eval import rank_eval

    try:
        with open(args.requests) as f:
            spec = _json.load(f)
        requests = {
            rid: (r["query"], {k: int(v) for k, v in r["ratings"].items()})
            for rid, r in spec.items()
        }
    except (OSError, KeyError, ValueError, AttributeError) as e:
        print(f"rankeval: bad --requests file: {e}", file=sys.stderr)
        return 2
    spark = _spark()
    t0 = time.time()
    try:
        out = rank_eval(
            spark, args.path, requests, args.key,
            metric=args.metric, k=args.k, scorer=args.scorer,
            relevant_threshold=args.relevant_threshold,
        )
    except ValueError as e:
        print(f"rankeval: {e}", file=sys.stderr)
        return 2
    elapsed = time.time() - t0
    for rid in sorted(out["details"]):
        d = out["details"][rid]
        print(f"{rid} {d['score']:.6f} (unrated {d['unrated_docs']})")
    print(f"mean {out['metric_score']:.6f}")
    print(f"elapsed: {elapsed:.3f}s")
    return 0


def cmd_fields(args) -> int:
    """Field capabilities (ES _field_caps analog): one line per
    (field, type) across the listed indexes, conflicts flagged.
    Driver-side manifest reads only — no Spark session."""
    from .query.multi import field_caps

    try:
        rows = field_caps(args.path)
    except FileNotFoundError as e:
        print(f"fields: {e}", file=sys.stderr)
        return 2
    for r in rows:
        caps = []
        if r["searchable"]:
            caps.append("searchable")
        if r["aggregatable"]:
            caps.append("aggregatable")
        md = r.get("metadata")
        extra = ""
        if md:
            bits = [md["analyzer"]]
            if md["positions"]:
                bits.append("positions")
            if md["store"]:
                bits.append("store")
            extra = f" [{' '.join(bits)}]"
        conflict = "  CONFLICT" if r["conflict"] else ""
        n = len(r["indices"])
        where = f" ({n}/{len(args.path)} indexes)" if len(args.path) > 1 else ""
        print(f"{r['field']} {r['type']} {','.join(caps)}{extra}{where}{conflict}")
    return 0


def cmd_stats(args) -> int:
    """Index introspection: manifest stats, build phases, per-segment
    lineage/metrics — no Spark session needed (driver-side JSON only)."""
    from .manifest import load_manifest

    try:
        m = load_manifest(args.path)
    except FileNotFoundError:
        print(f"no index at {args.path} (missing manifest.json)", file=sys.stderr)
        return 2
    s = m.stats
    print(f"opstamp {m.opstamp}  build_id {s.get('build_id', '?')}")
    print(f"docs {s.get('total_docs', 0)}  tokens {s.get('total_tokens', 0)}  segments {len(m.segments)}")
    from .deletes import tombstone_count

    n_tomb = tombstone_count(args.path, {seg.segment_id for seg in m.segments})
    if n_tomb:
        print(f"tombstones {n_tomb} (run `purge` to reclaim)")
    from .lock import lock_info

    lk = lock_info(args.path)
    if lk:
        import time as _time

        print(
            f"write lock: {lk.get('owner') or 'writer'} pid {lk.get('pid')} "
            f"on {lk.get('host')} (heartbeat "
            f"{_time.time() - lk.get('heartbeat_at', 0):.0f}s ago)"
        )
    ph = s.get("build_phases", {})
    if ph:
        print(f"last build: map {ph.get('map_sec', '?')}s  commit {ph.get('commit_sec', '?')}s")
    for seg in m.sorted_segments():
        met = seg.metrics or {}
        lin = seg.lineage or {}
        if "merged_from" in lin:
            origin = f"merged from {len(lin['merged_from'])} segments"
        else:
            origin = f"partition {lin.get('partition_id', '?')} attempt {lin.get('attempt', '?')}"
        extra = ""
        if "n_terms" in met:
            extra = f", {met['n_terms']} terms, {met.get('bytes_postings', '?')}B postings"
        print(f"  {seg.segment_id}: {seg.max_doc} docs{extra} — {origin}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ostrich_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("search")
    s.add_argument("query")
    s.add_argument("-p", "--path", required=True, action="append",
                   help="index path; repeat for a multi-index alias "
                        "(global stats, one merged ranking)")
    s.add_argument("--alias-filter", action="append", metavar="NQL",
                   help="filtered alias (ES alias filter): one per -p in "
                        "order, '' = unfiltered; filter context — "
                        "membership only, scores and stats untouched")
    s.add_argument("--index-boost", action="append", type=float,
                   metavar="B", help="per-index score multiplier (ES "
                   "indices_boost): one per -p in order, must be > 0")
    s.add_argument("-l", "--limit", type=int, default=10)
    s.add_argument("-o", "--offset", type=int, default=0)
    s.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    s.add_argument("--count", action="store_true")
    s.add_argument(
        "--default-operator", choices=["or", "and"], default="or",
        help="how adjacent bare query words combine (ES query_string "
        "default_operator): or = any word matches, and = every word "
        "required; explicit AND/OR in the query always win",
    )
    s.add_argument(
        "--highlight",
        metavar="FIELD",
        help="print snippets from this store=True field instead of doc addresses",
    )
    s.add_argument(
        "--sort-by",
        metavar="FIELD",
        help="order matches by this doc-value field (numeric or keyword) "
             "instead of score",
    )
    s.add_argument(
        "--asc", action="store_true",
        help="with --sort-by: ascending (default descending)",
    )
    s.add_argument(
        "--at", type=int, metavar="OPSTAMP",
        help="point-in-time search at a retained snapshot "
             "(see the snapshots subcommand)",
    )
    s.add_argument(
        "--fields",
        metavar="F1,F2",
        help="multi-field dismax: parse the query text against each "
        "field and score max + tie*rest",
    )
    s.add_argument("--tie", type=float, default=0.0,
                   help="with --fields: dismax tie_breaker in [0,1]")
    s.add_argument(
        "--lenient", action="store_true",
        help="never fail on query syntax (ES simple_query_string "
        "contract): invalid NQL degrades to its plain words",
    )
    s.add_argument(
        "--combined", action="store_true",
        help="with --fields: term-centric combined_fields (BM25F "
        "pseudo-field — weighted tf/length sums, max-df) instead of "
        "per-field dismax; weights must be >= 1",
    )
    s.add_argument(
        "--terms",
        metavar="FIELD=V1,V2",
        action="append",
        help="non-scoring terms filter on a keyword field (ES terms "
        "query): match any of the listed values; repeatable",
    )
    s.add_argument(
        "--range-rel",
        metavar="FIELD=REL:LO,HI",
        action="append",
        help="non-scoring interval filter on a range field (ES range "
        "query on range fields): REL is intersects/within/contains, "
        "empty LO/HI = open end; repeatable",
    )
    s.add_argument(
        "--ids",
        metavar="COLUMN=V1,V2",
        help="non-scoring ids filter on an IDENTITY column (ES ids "
        "query): values cast to the column's actual dtype",
    )
    s.add_argument(
        "--after",
        metavar="SCORE,SEG_ORD,DOC",
        help="cursor pagination: return hits strictly after this "
        "(score, segment_ord, doc) row from a previous page",
    )
    s.add_argument(
        "--collapse-by", metavar="COL",
        help="field collapsing: keep only the best-scoring hit per "
        "distinct value of this docmap column (ES collapse analog)",
    )
    s.add_argument(
        "--early-terminate", action="store_true",
        help="with --sort-by: prune segments by docmap min/max stats "
        "(index-sort early exit)",
    )
    s.add_argument(
        "--export-hits", metavar="DIR",
        help="write EVERY match (identity + score) to this parquet dir, "
        "fully distributed — the export-all-matches job",
    )
    s.add_argument(
        "--group-by", metavar="COL",
        help="grouped search: top --per-group hits per distinct value "
        "of this docmap column, best --limit groups (ES collapse with "
        "inner_hits / Lucene grouping analog)",
    )
    s.add_argument("--per-group", type=int, default=3,
                   help="with --group-by: hits kept per group")
    s.add_argument("--group-totals", action="store_true",
                   help="with --group-by: report each group's full "
                        "match count (ES inner_hits total)")
    s.add_argument(
        "--boost-by", metavar="FIELD",
        help="function score: combine relevance with this numeric "
        "doc-value field (ES function_score analog)",
    )
    s.add_argument("--boost-weight", type=float, default=1.0,
                   help="with --boost-by: the signal weight")
    s.add_argument("--boost-mode", choices=["multiply", "sum"],
                   default="multiply",
                   help="with --boost-by: multiply = score*(1+w*v), "
                   "sum = score + w*v")
    s.add_argument(
        "--decay-by", metavar="FIELD",
        help="decay function score: shade relevance by distance of this "
        "numeric/date doc-value field from --origin (ES function_score "
        "gauss/exp/linear decay — recency/proximity boosting)",
    )
    s.add_argument("--origin", metavar="VALUE",
                   help="with --decay-by: the zero-distance point (ISO "
                   "date prefix for date fields, number for numeric)")
    s.add_argument("--scale", metavar="SPAN",
                   help="with --decay-by: distance at which the function "
                   "reaches --decay ('10d'/'36h' for dates, number for "
                   "numeric)")
    s.add_argument("--decay-fn", choices=["gauss", "exp", "linear"],
                   default="gauss", help="with --decay-by: decay shape")
    s.add_argument("--decay", type=float, default=0.5,
                   help="with --decay-by: function value at scale")
    s.add_argument("--decay-offset", metavar="SPAN", default=0,
                   help="with --decay-by: no-decay zone around origin")
    s.add_argument(
        "--rescore", metavar="QUERY",
        help="two-phase ranking: re-order the top --rescore-window "
        "first-pass hits by score + weight * this query's score",
    )
    s.add_argument("--rescore-window", type=int, default=100)
    s.add_argument("--rescore-weight", type=float, default=1.0)
    s.add_argument("--pin", metavar="ID1,ID2",
                   help="promote these ids (in order) above every organic "
                        "match (ES pinned query); --pin-col names the id "
                        "column")
    s.add_argument("--pin-col", default="doc_id")
    s.add_argument("--script-score", metavar="EXPR",
                   help="rewrite relevance with a Spark-SQL expression "
                        "over _score + docmap columns (ES script_score), "
                        "e.g. 'sqrt(_score) + n_stars * 0.1'")
    s.add_argument("--distance-by", metavar="FIELD",
                   help="add boost*pivot/(pivot+|v-origin|) closeness to "
                        "the score (ES distance_feature); needs --origin "
                        "and --pivot; --boost-weight scales it")
    s.add_argument("--pivot", metavar="SPAN",
                   help="--distance-by half-bonus distance (number, or a "
                        "duration like 10d for date fields)")
    s.set_defaults(fn=cmd_search)

    pc = sub.add_parser("percolate")
    pc.add_argument("-p", "--path", required=True,
                    help="index whose committed schema analyzes the docs")
    pc.add_argument("--docs", required=True,
                    help="parquet path of the incoming documents")
    pc.add_argument("--id-col", default="doc_id")
    pc.add_argument("-q", "--query", action="append", required=True,
                    metavar="ID=NQL",
                    help="stored query, repeatable: alerts=text:spark AND text:join")
    pc.add_argument("--show", type=int, default=50,
                    help="print at most this many (doc, query) matches")
    pc.set_defaults(fn=cmd_percolate)

    sg = sub.add_parser("suggest")
    sg.add_argument("term")
    sg.add_argument("-p", "--path", required=True)
    sg.add_argument("--field", required=True)
    sg.add_argument("--max-dist", type=int, default=2)
    sg.add_argument("--prefix-length", type=int, default=1)
    sg.add_argument("--top", type=int, default=5)
    sg.add_argument("--transpositions", action="store_true",
                    help="adjacent swap counts as one edit (Damerau)")
    sg.add_argument("--phrase", action="store_true",
                    help="noisy-channel phrase suggester over the bigram "
                    "LM (ES phrase suggester); needs a trained model "
                    "(--train) and a store=True field")
    sg.add_argument("--train", action="store_true",
                    help="(re)train the phrase LM before suggesting")
    sg.add_argument("--size", type=int, default=5)
    sg.add_argument("--confidence", type=float, default=1.0)
    sg.add_argument("--max-errors", type=float, default=1.0)
    sg.add_argument("--smoothing", default="stupid_backoff",
                    choices=["stupid_backoff", "laplace",
                             "linear_interpolation"])
    sg.add_argument("--collate", action="store_true",
                    help="keep only suggestions with at least one "
                    "matching doc (one batched job for the whole list)")
    sg.set_defaults(fn=cmd_suggest)

    kn = sub.add_parser("knn", help="vector search: persisted IVF build/"
                        "search (int8 --quantize, --rescore) or brute force")
    kn.add_argument("action", choices=["build", "search", "brute"])
    kn.add_argument("-p", "--path", default=None, help="IVF index dir")
    kn.add_argument("--emb", default=None,
                    help="embedding parquet (vec_id, embedding)")
    kn.add_argument("--vector", default=None, help="query vector v1,v2,...")
    kn.add_argument("--vec-id", type=int, default=None,
                    help="query by a vec_id from --emb")
    kn.add_argument("-k", type=int, default=10)
    kn.add_argument("--nprobe", type=int, default=1)
    kn.add_argument("--rescore", type=float, default=None,
                    help="quantized-index oversample factor (exact rescore)")
    kn.add_argument("--centroids", type=int, default=8)
    kn.add_argument("--train-iters", type=int, default=5)
    kn.add_argument("--quantize", action="store_true",
                    help="store int8 codes beside the floats (build)")
    kn.add_argument("--pq-m", type=int, default=None,
                    help="store m-byte PQ codes + codebooks (build; the "
                         "faiss IVF-PQ layout)")
    kn.add_argument("--pq-ksub", type=int, default=256,
                    help="PQ centroids per subspace (<= 256)")
    kn.add_argument("--use-pq", action="store_true",
                    help="search: ADC candidates from the PQ codes "
                         "(needs --rescore)")
    kn.set_defaults(fn=cmd_knn)

    te = sub.add_parser("terms", help="enumerate a text field's term "
                        "dictionary in term order (ES _terms_enum)")
    te.add_argument("field")
    te.add_argument("-p", "--path", required=True)
    te.add_argument("--prefix", default="")
    te.add_argument("--size", type=int, default=10)
    te.add_argument("--after", default=None,
                    help="page strictly after this term")
    te.add_argument("-i", "--case-insensitive", action="store_true",
                    help="lowercase the prefix before the range read")
    te.set_defaults(fn=cmd_terms)

    dm = sub.add_parser("stream")
    dm.add_argument("action",
                    choices=["create", "status", "rollover", "search",
                             "prune", "append"])
    dm.add_argument("--keep", type=int, default=1,
                    help="prune: keep this many newest generations")
    dm.add_argument("--input", default=None,
                    help="append: corpus to ingest (parquet/json/csv dir)")
    dm.add_argument("--partitions", type=int, default=8)
    dm.add_argument("--order-col", default=None)
    dm.add_argument("--id-col", action="append", default=None)
    dm.add_argument("--field", action="append", default=None,
                    help="create: template text field (NAME or NAME=SOURCE)")
    dm.add_argument("--keyword-field", action="append", default=None)
    dm.add_argument("--date-field", action="append", default=None)
    dm.add_argument("--ip-field", action="append", default=None)
    dm.add_argument("--analyzer", default="default")
    dm.add_argument("-p", "--path", required=True)
    dm.add_argument("--name", default=None)
    dm.add_argument("--max-docs", type=int, default=None)
    dm.add_argument("--max-segments", type=int, default=None)
    dm.add_argument("--force", action="store_true")
    dm.add_argument("-q", "--query", default=None, help="NQL (search action)")
    dm.add_argument("--limit", type=int, default=10)
    dm.add_argument("--scorer", default="tfidf", choices=["tfidf", "bm25"])
    dm.set_defaults(fn=cmd_stream)

    co = sub.add_parser("complete")
    co.add_argument("prefix")
    co.add_argument("-p", "--path", required=True)
    co.add_argument("--field", required=True)
    co.add_argument("--size", type=int, default=10)
    co.add_argument("--fuzzy", action="store_true",
                    help="tolerate typos inside the prefix (ES fuzzy completion)")
    co.add_argument("--max-dist", type=int, default=1)
    co.set_defaults(fn=cmd_complete)

    tg = sub.add_parser("sigterms")
    tg.add_argument("query")
    tg.add_argument("-p", "--path", required=True)
    tg.add_argument("--field", required=True, help="text field to facet terms of")
    tg.add_argument("--top", type=int, default=20)
    tg.add_argument("--min-doc-count", type=int, default=1)
    tg.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    tg.add_argument("--text", action="store_true",
                    help="significant_text: re-analyze stored source of a "
                         "top-hit sample instead of postings counts")
    tg.add_argument("--shard-size", type=int, default=100,
                    help="with --text: top hits sampled per segment")
    tg.add_argument("--keep-dups", action="store_true",
                    help="with --text: skip the duplicate-run token filter")
    tg.set_defaults(fn=cmd_sigterms)

    ag = sub.add_parser("agg")
    ag.add_argument("query")
    ag.add_argument("-p", "--path", required=True)
    ag.add_argument("--stats", metavar="FIELD", help="n/min/max/sum/avg of FIELD")
    ag.add_argument("--hist", metavar="FIELD", help="histogram of FIELD")
    ag.add_argument("--bin", type=float, default=1.0, help="--hist bucket width")
    ag.add_argument("--date-hist", metavar="FIELD",
                    help="calendar histogram of a date FIELD (bucket "
                         "keys = UTC epoch millis, the ES convention)")
    ag.add_argument("--interval", default="day",
                    choices=["minute", "hour", "day", "week", "month",
                             "quarter", "year"],
                    help="--date-hist bucket width")
    ag.add_argument("--range", metavar="FIELD",
                    help="ES range agg over FIELD with --ranges buckets")
    ag.add_argument("--ranges", metavar="K:LO:HI,...",
                    help="--range buckets, [lo,hi) each, empty bound = open")
    ag.add_argument("--offset", metavar="DUR|NUM", default=None,
                    help="bucket-boundary shift: --date-hist takes a "
                         "duration (6h / -30m), --hist a number in "
                         "[0, bin) (ES histogram offset)")
    ag.add_argument("--fill", action="store_true",
                    help="with --hist/--date-hist: min_doc_count=0 — "
                         "empty buckets between the first and last "
                         "occupied one appear with n_docs=0")
    ag.add_argument("--boxplot", metavar="FIELD",
                    help="min/q1/q2/q3/max + Tukey whiskers of FIELD "
                         "(exact quartiles, ES boxplot agg)")
    ag.add_argument("--string-stats", metavar="FIELD",
                    help="count/length stats + Shannon character entropy "
                         "of a keyword FIELD (ES string_stats agg)")
    ag.add_argument("--auto-date-hist", metavar="FIELD",
                    help="date histogram that picks its own interval "
                         "(minute..year ladder) needing <= --buckets "
                         "buckets (ES auto_date_histogram)")
    ag.add_argument("--buckets", type=int, default=10,
                    help="--auto-date-hist / --vw-hist bucket budget")
    ag.add_argument("--cum-card", metavar="DATEFIELD",
                    help="cumulative distinct --of values per --interval "
                         "bucket (ES cumulative_cardinality, exact)")
    ag.add_argument("--of", metavar="FIELD",
                    help="--cum-card: the doc-value field counted")
    ag.add_argument("--vw-hist", metavar="FIELD",
                    help="variable-width histogram of FIELD: --buckets "
                         "SSE-optimal clusters (ES variable_width_"
                         "histogram, deterministic DP)")
    ag.add_argument("--multi-terms", metavar="F1,F2",
                    help="buckets keyed by tuples of 2+ doc-value fields, "
                         "count desc (ES multi_terms agg)")
    ag.add_argument("--size", type=int, default=None,
                    help="--multi-terms top-N cut")
    ag.add_argument("--mad", metavar="FIELD",
                    help="median + median absolute deviation of FIELD "
                         "(exact quantile_cont, ES "
                         "median_absolute_deviation agg)")
    ag.add_argument("--cardinality", metavar="COL",
                    help="distinct count of COL over the match set "
                    "(HLL++ approx; --exact for count_distinct)")
    ag.add_argument("--t-test", metavar="FIELD",
                    help="Student's t-test of FIELD: QUERY's match set "
                    "vs --vs QUERY_B (unpaired) or vs --field-b of the "
                    "same match set (--t-type paired); prints t/df and "
                    "the exact two-sided p-value (ES t_test agg)")
    ag.add_argument("--vs", metavar="QUERY_B",
                    help="with --t-test: population B's query")
    ag.add_argument("--field-b", metavar="FIELD",
                    help="with --t-test: side B's field (defaults to the "
                    "--t-test field; required for --t-type paired)")
    ag.add_argument("--t-type", default="heteroscedastic",
                    choices=["heteroscedastic", "homoscedastic", "paired"],
                    help="t-test flavor (default Welch/heteroscedastic)")
    ag.add_argument("--exact", action="store_true",
                    help="with --cardinality: exact count_distinct")
    ag.add_argument("--ip-prefix", metavar="FIELD",
                    help="network buckets of an ip field at "
                         "--prefix-len bits (ES ip_prefix agg; "
                         "--v6 for the 128-bit view)")
    ag.add_argument("--prefix-len", type=int, default=24,
                    help="--ip-prefix network bits")
    ag.add_argument("--v6", action="store_true",
                    help="--ip-prefix: bucket the full v6 space")
    ag.add_argument("--hist-stats", metavar="FIELD",
                    help="count-weighted stats of a histogram field's "
                         "pre-aggregated bins (ES stats on histogram "
                         "fields)")
    ag.add_argument("--hist-pctl", metavar="FIELD",
                    help="exact type-1 weighted percentiles of a "
                         "histogram field (--ps list)")
    ag.add_argument("--ps", default="0.25,0.5,0.75",
                    help="--hist-pctl percentiles in [0,1], "
                         "comma-separated")
    ag.add_argument("--freq-itemsets", metavar="F1,F2",
                    help="frequent field=value combinations of the match "
                         "set at --min-support (exact Apriori; ES "
                         "frequent_item_sets)")
    ag.add_argument("--min-support", type=float, default=0.1,
                    help="--freq-itemsets support fraction of matched docs")
    ag.add_argument("--sample-p", type=float, default=None,
                    help="with --sample-by: random_sampler probability "
                         "((0, 0.5] or 1; deterministic hash draw)")
    ag.add_argument("--sample-by", metavar="BYFIELD",
                    help="per-BYFIELD bucket counts over a --sample-p "
                         "hash sample (ES random_sampler agg)")
    ag.add_argument("--categorize", metavar="FIELD",
                    help="log-template clustering of a stored text "
                         "FIELD: letter-only analyzer tokens joined, "
                         "optionally capped at --max-tokens "
                         "(ES categorize_text, deterministic)")
    ag.add_argument("--max-tokens", type=int, default=None,
                    help="--categorize template token cap")
    ag.add_argument("--top-hits", metavar="BYFIELD",
                    help="per-BYFIELD-bucket top --size docs by --sort "
                         "(default score:desc), flat ranked rows "
                         "(ES top_hits agg)")
    ag.add_argument("--sort", metavar="FIELD:asc|desc",
                    help="--top-hits sort specs, comma-separated; the "
                         "pseudo-column `score` is allowed")
    ag.add_argument("--columns", metavar="C1,C2",
                    help="--top-hits hit columns (default: all "
                         "non-internal docmap columns)")
    ag.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    ag.set_defaults(fn=cmd_agg)

    fc = sub.add_parser("facet")
    fc.add_argument("query")
    fc.add_argument("-p", "--path", required=True)
    fc.add_argument("--by", action="append", required=True, metavar="COL")
    fc.add_argument("--source", help="parquet path of the corpus table to facet on")
    fc.add_argument(
        "--join-on", action="append", metavar="COL",
        help="identity column(s) joining the docmap to --source",
    )
    fc.add_argument(
        "--metric", action="append", metavar="OUT=FN:COL",
        help="metric sub-aggregation per bucket (fn: count/min/max/sum/"
        "avg/count_distinct/approx_count_distinct), e.g. avg_sz=avg:n_chars",
    )
    fc.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    fc.set_defaults(fn=cmd_facet)

    ml = sub.add_parser("mlt")
    ml.add_argument("text", nargs="?", help="source text (or use --file)")
    ml.add_argument("-p", "--path", required=True)
    ml.add_argument("--field", required=True, help="text field to match on")
    ml.add_argument("--file", help="read the source text from this file")
    ml.add_argument("--id", help="seed from a stored document instead of "
                    "text (ES like:[{_id}] form); requires --id-col")
    ml.add_argument("--id-col", default="doc_id")
    ml.add_argument("--max-terms", type=int, default=25)
    ml.add_argument("--min-doc-freq", type=int, default=1)
    ml.add_argument("-l", "--limit", type=int, default=10)
    ml.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    ml.set_defaults(fn=cmd_mlt)

    ms = sub.add_parser("msearch")
    ms.add_argument("-p", "--path", required=True)
    ms.add_argument("-q", "--query", action="append", metavar="ID=QUERY")
    ms.add_argument("--file", help="JSON file of {query_id: query}")
    ms.add_argument("-l", "--limit", type=int, default=10)
    ms.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    ms.set_defaults(fn=cmd_msearch)

    ge = sub.add_parser("geo", help="geo_point queries & grid aggregations "
                        "(ES geo_distance / geo_bounding_box / sort "
                        "_geo_distance / geohash_grid / geotile_grid)")
    ge.add_argument("mode", choices=["distance", "bbox", "polygon",
                                     "nearest", "geohash", "geotile",
                                     "rings", "shape", "line"])
    ge.add_argument("--sort-by", metavar="FIELD",
                    help="line: doc-value column ordering the track "
                         "(ES geo_line sort)")
    ge.add_argument("--by", metavar="FIELD",
                    help="line: one track per value of this doc-value "
                         "column (terms-agg nesting)")
    ge.add_argument("--size", type=int, default=10_000,
                    help="line: max points per track (ES truncation: "
                         "first in sort order)")
    ge.add_argument("--desc", action="store_true",
                    help="line: sort descending")
    ge.add_argument("--relation", default="intersects",
                    choices=["intersects", "within", "disjoint"],
                    help="shape: relation of stored rings to the query "
                         "geometry (--point supports intersects only)")
    ge.add_argument("--point", metavar="LAT,LON",
                    help="shape: point query geometry (ring contains it)")
    ge.add_argument("--points", nargs="*", metavar="LAT,LON",
                    help="polygon: ring vertices (>= 3, concave ok, "
                         "ES geo_polygon; no dateline crossing)")
    ge.add_argument("-p", "--path", required=True)
    ge.add_argument("-f", "--field", required=True, help="geo field name")
    ge.add_argument("--origin", metavar="LAT,LON",
                    help="distance/nearest: origin point")
    ge.add_argument("--radius-m", type=float, help="distance: radius meters")
    ge.add_argument("--box", metavar="TOP,LEFT,BOTTOM,RIGHT",
                    help="bbox: inclusive bounds (left>right wraps dateline)")
    ge.add_argument("-k", type=int, default=10, help="nearest: top-k")
    ge.add_argument("--precision", type=int, default=5,
                    help="geohash: cell precision (1-12)")
    ge.add_argument("--zoom", type=int, default=7,
                    help="geotile: web-mercator zoom (0-29)")
    ge.add_argument("--tiebreak", default=None,
                    help="nearest: identity column breaking exact ties")
    ge.add_argument("--ranges", metavar="K:LO:HI,...",
                    help="rings: distance buckets in METERS, [lo,hi) "
                         "each, empty bound = open (ES geo_distance agg)")
    ge.set_defaults(fn=cmd_geo)

    jn = sub.add_parser("join")
    jn.add_argument("direction", choices=["haschild", "hasparent"])
    jn.add_argument("query", help="child query (haschild) / parent query (hasparent)")
    jn.add_argument("-p", "--path", required=True)
    jn.add_argument("--relation-field", required=True,
                    help="keyword field naming each doc's side, e.g. rel")
    jn.add_argument("--child", required=True, help="relation value of child docs")
    jn.add_argument("--parent", required=True, help="relation value of parent docs")
    jn.add_argument("--parent-field", required=True,
                    help="doc-value field on children holding the parent key")
    jn.add_argument("--id-col", default="doc_id",
                    help="docmap column keying parent docs")
    jn.add_argument("--score-mode", choices=["none", "sum", "max", "min", "avg"],
                    default="none", help="haschild: child-score aggregate")
    jn.add_argument("--min-children", type=int, default=1)
    jn.add_argument("--max-children", type=int, default=None)
    jn.add_argument("--score", action="store_true",
                    help="hasparent: children inherit the parent score")
    jn.add_argument("-l", "--limit", type=int, default=10)
    jn.add_argument("--scorer", choices=["tfidf", "bm25"], default="tfidf")
    jn.set_defaults(fn=cmd_join)

    b = sub.add_parser("build")
    b.add_argument("corpus")
    b.add_argument("-p", "--path", required=True)
    b.add_argument("--field", action="append")
    b.add_argument("--keyword-field", action="append", metavar="COL",
                   help="keyword doc-value field (exact-match/exists "
                        "filters, never analyzed); NAME=SOURCE reads "
                        "another input column (ES multi-fields, e.g. "
                        "title.raw=title)")
    b.add_argument("--date-field", action="append", metavar="COL",
                   help="date doc-value field (ISO range/sort/"
                        "date-histogram; stored as epoch micros UTC); "
                        "NAME=SOURCE reads another input column")
    b.add_argument("--ip-field", action="append", metavar="COL",
                   help="ip doc-value field (equality/CIDR/range/sort; "
                        "IPv4+IPv6, stored as the canonical 16-byte hex "
                        "form); NAME=SOURCE reads another input column")
    b.add_argument("--analyzer", default="default")
    b.add_argument("--partitions", type=int, default=8)
    b.add_argument("--order-col")
    b.add_argument("--id-col", action="append")
    b.add_argument("--build-id", default="cli")
    b.set_defaults(fn=cmd_build)

    ex = sub.add_parser("explain")
    ex.add_argument("query")
    ex.add_argument("-p", "--path", required=True)
    ex.add_argument("--addr", required=True, metavar="SEG_ORD/DOC",
                    help="doc address as printed by `search`")
    ex.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    ex.set_defaults(fn=cmd_explain)

    ck = sub.add_parser("check")
    ck.add_argument("-p", "--path", required=True)
    ck.set_defaults(fn=cmd_check)

    u = sub.add_parser("update")
    u.add_argument("corpus", nargs="?",
                   help="corpus batch to upsert (omit with --query)")
    u.add_argument("-p", "--path", required=True)
    u.add_argument("--id-col", action="append",
                   help="identity columns (corpus mode only; --query "
                   "infers them from the index)")
    u.add_argument("--query", help="NQL query; every match is rewritten "
                   "through --set and reindexed (ES _update_by_query)")
    u.add_argument("--set", action="append", metavar="FIELD=EXPR",
                   help="SQL expression over the reconstructed doc, e.g. "
                   "--set 'views=views + 1' (repeatable; none = "
                   "script-less reindex of the matches)")
    u.add_argument("--partitions", type=int, default=8)
    u.add_argument("--order-col")
    u.add_argument("--build-id", required=True,
                   help="fresh id per batch (rerun the SAME id to resume a crashed update)")
    u.set_defaults(fn=cmd_update)

    m = sub.add_parser("merge")
    m.add_argument("-p", "--path", required=True)
    m.set_defaults(fn=cmd_merge)

    d = sub.add_parser("delete")
    d.add_argument("-p", "--path", required=True)
    d.add_argument("--id-col", help="id column for --values")
    d.add_argument("--values", nargs="*", help="id values to tombstone")
    d.add_argument("--query", help="NQL query; every match is tombstoned "
                   "(ES _delete_by_query)")
    d.set_defaults(fn=cmd_delete)

    pg = sub.add_parser("purge")
    pg.add_argument("-p", "--path", required=True)
    pg.set_defaults(fn=cmd_purge)

    st = sub.add_parser("stats")
    st.add_argument("-p", "--path", required=True)
    st.set_defaults(fn=cmd_stats)

    re_ = sub.add_parser("rankeval", help="ranking evaluation over rated "
                         "requests (ES _rank_eval analog)")
    re_.add_argument("-p", "--path", required=True)
    re_.add_argument("--requests", required=True,
                     help='JSON: {id: {"query": NQL, "ratings": {key: n}}}')
    re_.add_argument("--key", required=True,
                     help="identity column the rating keys address")
    re_.add_argument("--metric", default="ndcg",
                     choices=["precision", "recall", "mrr", "dcg", "ndcg",
                              "err"])
    re_.add_argument("--k", type=int, default=10)
    re_.add_argument("--relevant-threshold", type=int, default=1)
    re_.add_argument("--scorer", choices=["tfidf", "bm25"], default="bm25")
    re_.set_defaults(fn=cmd_rankeval)

    fc = sub.add_parser("fields", help="field capabilities across "
                        "indexes (ES _field_caps analog)")
    fc.add_argument("-p", "--path", required=True, action="append",
                    help="index dir; repeat for an alias view")
    fc.set_defaults(fn=cmd_fields)

    an = sub.add_parser("analyze", help="show how text tokenizes (ES "
                        "_analyze analog); no Spark session")
    an.add_argument("text")
    an.add_argument("--analyzer", help="registered analyzer name "
                    "(default: 'default')")
    an.add_argument("-p", "--path", help="use an index field's analyzer "
                    "(auto-registers the index's custom analyzer specs)")
    an.add_argument("--field", help="with --path: schema field name")
    an.add_argument("--query", action="store_true",
                    help="with --path/--field: use the field's QUERY "
                    "analyzer (differs for search-as-you-type fields)")
    an.set_defaults(fn=cmd_analyze)

    sn = sub.add_parser("snapshots")
    sn.add_argument("-p", "--path", required=True)
    sn.add_argument("--retain", type=int, metavar="K",
                    help="keep the last K commits readable point-in-time "
                         "(0 disables and releases old snapshots)")
    sn.set_defaults(fn=cmd_snapshots)

    g = sub.add_parser("get")
    g.add_argument("-p", "--path", required=True)
    g.add_argument("--id-col", required=True)
    g.add_argument("--values", nargs="+", required=True, metavar="V")
    g.add_argument("--at", type=int, metavar="OPSTAMP",
                   help="read as-of a retained snapshot")
    g.set_defaults(fn=cmd_get)

    tv = sub.add_parser("termvectors")
    tv.add_argument("-p", "--path", required=True)
    tv.add_argument("--field", required=True, help="text field to decode")
    tv.add_argument("--id-col", required=True)
    tv.add_argument("--values", nargs="+", required=True, metavar="V")
    tv.set_defaults(fn=cmd_termvectors)

    ri = sub.add_parser("reindex")
    ri.add_argument("-p", "--path", required=True, help="source index")
    ri.add_argument("--out", required=True, help="destination index dir")
    ri.add_argument("--analyzer", help="replace every text field's analyzer")
    ri.add_argument("--positions", action="store_true",
                    help="enable positions on every text field")
    ri.add_argument("--build-id", default="reindex0")
    ri.set_defaults(fn=cmd_reindex)

    ai = sub.add_parser("addindexes")
    ai.add_argument("-p", "--path", required=True, help="destination index")
    ai.add_argument("--src", action="append", required=True, metavar="DIR",
                    help="source index to absorb (repeatable)")
    ai.add_argument("--copy", action="store_true",
                    help="full copy instead of hardlinks")
    ai.set_defaults(fn=cmd_addindexes)

    al = sub.add_parser("alias", help="named alias registry (ES _aliases "
                        "analog): add/remove entries atomically, list, "
                        "and search through a registered alias")
    al.add_argument("action", choices=["add", "remove", "list", "search"])
    al.add_argument("name", nargs="?", help="alias name (add/remove/"
                    "search; optional for list)")
    al.add_argument("query", nargs="?", help="search: the NQL query")
    al.add_argument("--registry", required=True, metavar="DIR",
                    help="registry directory (holds aliases.json)")
    al.add_argument("-p", "--path", help="add/remove: the index dir")
    al.add_argument("--filter", dest="alias_filter", metavar="NQL",
                    help="add: per-index alias filter (filter context)")
    al.add_argument("--boost", type=float, default=None,
                    help="add: per-index score multiplier (> 0)")
    al.add_argument("--write", action="store_true",
                    help="add: flag this index as the alias write index")
    al.add_argument("-l", "--limit", type=int, default=10)
    al.add_argument("--scorer", choices=["tfidf", "bm25"], default="tfidf")
    al.set_defaults(fn=cmd_alias)

    ev = sub.add_parser("evolve")
    ev.add_argument("-p", "--path", required=True)
    ev.add_argument("--add-field", dest="name", required=True, metavar="NAME")
    ev.add_argument("--analyzer", default="default")
    ev.add_argument("--positions", action="store_true")
    ev.add_argument("--store", action="store_true")
    ev.add_argument("--numeric", metavar="long|double",
                    help="numeric doc-value field instead of text")
    ev.add_argument("--keyword", action="store_true",
                    help="keyword doc-value field (exact-match/exists "
                         "filters) instead of text")
    ev.add_argument("--date", action="store_true",
                    help="date doc-value field (ISO ranges, sort, "
                         "date histogram) instead of text")
    ev.add_argument("--ip", action="store_true",
                    help="ip doc-value field (equality/CIDR/range, "
                         "IPv4+IPv6) instead of text")
    ev.set_defaults(fn=cmd_evolve)

    ex = sub.add_parser("export")
    ex.add_argument("-p", "--path", required=True)
    ex.add_argument("--out", required=True, metavar="DIR",
                    help="target directory (must be empty/absent)")
    ex.add_argument("--at", type=int, metavar="OPSTAMP",
                    help="export a retained snapshot instead of CURRENT")
    ex.add_argument("--hardlink", action="store_true",
                    help="same-filesystem zero-copy clone (cp -al style; "
                         "falls back to copy across devices)")
    ex.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
