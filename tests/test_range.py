"""Numeric doc-value fields + range queries — EXTENSION (Lucene
points/NumericRangeQuery analog; the reference has only text fields,
/root/reference/schema/fieldtype.go:5-7).

Design under test:
- ``Schema.add_numeric_field``: no tokens, no postings, no norms; the
  typed value is a docmap parquet column (min/max row-group stats give
  range scans Lucene-points-style pruning);
- ``RangeQuery`` matches at constant score = boost (ConstantScore);
- NQL ``field:[lo TO hi]`` / ``{..}`` exclusive / ``*`` open / plain
  value = equality;
- match sets ride the scoring shuffle via the aux cogroup side (rid >= 0,
  tombstones rid = -1) — never collected to the driver;
- numeric columns survive merge + purge remaps.
"""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.manifest import load_manifest
from ostrich_spark.merge import merge_segments
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.parser import (
    BooleanQuery,
    QueryParseError,
    RangeQuery,
    TermQuery,
    parse_query,
    FILTER,
    MUST,
    SHOULD,
)
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark", "query", "score"]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    s.add_numeric_field("year")
    s.add_numeric_field("rating", "double")
    return s


def _build(spark, tmp, n=60, parts=4):
    idx = str(tmp / "idx")
    docs = [
        {
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 6)),
            "year": 2000 + i % 20,
            "rating": i * 0.5,
        }
        for i in range(n)
    ]
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(docs)),
        _schema(),
        idx,
        num_partitions=parts,
        order_col="k",
        id_cols=["k"],
    )
    return idx


@pytest.fixture(scope="module")
def range_idx(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory.mktemp("rangeidx"))


def _khits(spark, idx, q, **kw):
    mf = load_manifest(idx)
    df, _ = search(spark, idx, q, limit=None, manifest=mf, **kw)
    dm = attach_docmap(spark, idx, df, manifest=mf)
    return sorted((r["k"], round(r["score"], 9)) for r in dm.select("k", "score").collect())


# --- parser goldens ---


def test_parse_inclusive_exclusive_mixed():
    s = _schema()
    assert parse_query("year:[2005 TO 2008]", s) == RangeQuery(1, 2005, 2008)
    assert parse_query("year:{2005 TO 2008}", s) == RangeQuery(
        1, 2005, 2008, include_lo=False, include_hi=False
    )
    assert parse_query("year:{2005 TO 2008]", s) == RangeQuery(
        1, 2005, 2008, include_lo=False, include_hi=True
    )


def test_parse_open_bounds_and_equality():
    s = _schema()
    assert parse_query("year:[* TO 2008]", s) == RangeQuery(1, None, 2008)
    assert parse_query("rating:[0.5 TO *]", s) == RangeQuery(2, 0.5, None)
    assert parse_query("year:2005", s) == RangeQuery(1, 2005, 2005)


def test_parse_range_boost_and_boolean():
    s = _schema()
    assert parse_query("year:[2005 TO 2008]^2", s) == RangeQuery(
        1, 2005, 2008, boost=2.0
    )
    q = parse_query("content:spark AND year:[2005 TO 2008]", s)
    assert q.subqueries[1] == (MUST, RangeQuery(1, 2005, 2008))


def test_parse_errors():
    s = _schema()
    with pytest.raises(QueryParseError):
        parse_query("year:[a TO b]", s)
    with pytest.raises(QueryParseError):
        parse_query("year:[2005 TO 2008", s)  # unclosed
    with pytest.raises(QueryParseError):
        parse_query("year:[* TO *]", s)  # no bound
    with pytest.raises(QueryParseError):
        parse_query("year:hello", s)  # non-numeric equality


def test_bare_terms_skip_numeric_fields():
    s = _schema()
    q = parse_query("Hello", s)
    # only the text field expands; numeric fields hold no terms
    assert q == TermQuery(0, "Hello")


# --- engine semantics ---


def test_pure_range_constant_score(spark, range_idx):
    hits = _khits(spark, range_idx, "year:[2005 TO 2008]")
    assert [k for k, _ in hits] == sorted(
        i for i in range(60) if 5 <= i % 20 <= 8
    )
    assert all(sc == 1.0 for _, sc in hits)


def test_exclusive_and_open_bounds(spark, range_idx):
    excl = _khits(spark, range_idx, "year:{2005 TO 2008}")
    assert [k for k, _ in excl] == sorted(i for i in range(60) if 6 <= i % 20 <= 7)
    open_hi = _khits(spark, range_idx, "rating:[25.0 TO *]")
    assert [k for k, _ in open_hi] == list(range(50, 60))


def test_equality_shorthand(spark, range_idx):
    eq = _khits(spark, range_idx, "year:2005")
    assert [k for k, _ in eq] == [5, 25, 45]


def test_filter_range_keeps_text_scores(spark, range_idx):
    base = dict(_khits(spark, range_idx, "content:merge"))
    f = _khits(
        spark,
        range_idx,
        BooleanQuery(
            [(MUST, TermQuery(0, "merge")), (FILTER, RangeQuery(1, 2003, 2010))]
        ),
    )
    assert len(f) > 0
    assert all(k in base and base[k] == sc for k, sc in f)
    assert all(3 <= k % 20 <= 10 for k, _ in f)


def test_must_range_adds_constant_boosted(spark, range_idx):
    base = dict(_khits(spark, range_idx, "content:merge"))
    m = _khits(
        spark,
        range_idx,
        BooleanQuery(
            [(MUST, TermQuery(0, "merge")), (MUST, RangeQuery(1, 2003, 2010, boost=3.0))]
        ),
    )
    assert len(m) > 0
    assert all(abs(sc - (base[k] + 3.0)) < 1e-9 for k, sc in m)


def test_or_term_range_union(spark, range_idx):
    o = _khits(
        spark,
        range_idx,
        BooleanQuery(
            [(SHOULD, TermQuery(0, "merge")), (SHOULD, RangeQuery(1, 2015, 2019))]
        ),
    )
    merge_ks = {k for k, _ in _khits(spark, range_idx, "content:merge")}
    range_ks = {k for k, _ in _khits(spark, range_idx, "year:[2015 TO 2019]")}
    assert {k for k, _ in o} == merge_ks | range_ks


def test_nql_string_roundtrip(spark, range_idx):
    a = _khits(spark, range_idx, "content:merge AND year:[2003 TO 2010]")
    b = _khits(
        spark,
        range_idx,
        BooleanQuery(
            [(MUST, TermQuery(0, "merge")), (MUST, RangeQuery(1, 2003, 2010))]
        ),
    )
    assert a == b


def test_range_on_text_field_rejected(spark, range_idx):
    with pytest.raises(Exception, match="non-numeric"):
        df, _ = search(spark, range_idx, RangeQuery(0, 1, 2), limit=None)
        df.collect()


def test_search_many_with_ranges(spark, range_idx):
    qs = {
        "r": "year:[2005 TO 2008]",
        "fr": BooleanQuery(
            [(MUST, TermQuery(0, "merge")), (FILTER, RangeQuery(1, 2003, 2010))]
        ),
        "t": "content:merge",
    }
    mf = load_manifest(range_idx)
    many = search_many(spark, range_idx, qs, limit=None, manifest=mf)
    dm = attach_docmap(spark, range_idx, many, manifest=mf)
    by = {}
    for r in dm.select("query_id", "k", "score").collect():
        by.setdefault(r["query_id"], []).append((r["k"], round(r["score"], 9)))
    for qid, q in qs.items():
        assert sorted(by.get(qid, [])) == _khits(spark, range_idx, q), qid


def test_tombstones_and_merge_preserve_ranges(spark, tmp_path):
    idx = _build(spark, tmp_path)
    q = "year:[2005 TO 2008]"
    before = _khits(spark, idx, q)
    delete_docs(spark, idx, spark.createDataFrame(pd.DataFrame({"k": [5]})), ["k"])
    after_del = _khits(spark, idx, q)
    assert after_del == [x for x in before if x[0] != 5]
    qf = BooleanQuery(
        [(MUST, TermQuery(0, "merge")), (FILTER, RangeQuery(1, 2003, 2010))]
    )
    fdel = _khits(spark, idx, qf)
    assert all(k != 5 for k, _ in fdel)
    mf = load_manifest(idx)
    merge_segments(spark, idx, [s.segment_id for s in mf.segments], "merged-r")
    # constant-score range: identical through the purge
    assert _khits(spark, idx, q) == after_del
    # text scores legitimately shift at purge (stats frozen until purge,
    # Lucene semantics) — the match SET must be identical
    assert [k for k, _ in _khits(spark, idx, qf)] == [k for k, _ in fdel]


def _matched_ks(spark, idx, q):
    return {k for k, _ in _khits(spark, idx, q)}


def test_search_sorted_by_field(spark, range_idx):
    from ostrich_spark.query.exec import attach_docmap as _ad, search_sorted

    mf = load_manifest(range_idx)
    res = search_sorted(
        spark, range_idx, "content:merge", by="rating", ascending=False,
        limit=5, tiebreak=["k"], manifest=mf,
    )
    rows = _ad(spark, range_idx, res.drop("rating"), manifest=mf)
    got = [(r["k"], r["rating"]) for r in rows.select("k", "rating")
           .orderBy("rating", ascending=False).collect()]
    matched = sorted(_matched_ks(spark, range_idx, "content:merge"))
    exp = sorted(((k, k * 0.5) for k in matched), key=lambda t: (-t[1], t[0]))[:5]
    assert got == exp


def test_search_sorted_ascending_and_offset(spark, range_idx):
    from ostrich_spark.query.exec import search_sorted

    full = search_sorted(
        spark, range_idx, "content:merge", by="rating", limit=None
    ).collect()
    vals = [r["rating"] for r in full]
    assert vals == sorted(vals)
    off = search_sorted(
        spark, range_idx, "content:merge", by="rating", limit=3, offset=2
    ).collect()
    assert [r["rating"] for r in off] == vals[2:5]


def test_search_sorted_rejects_text_field(spark, range_idx):
    from ostrich_spark.query.exec import search_sorted

    with pytest.raises(ValueError, match="doc-value"):
        search_sorted(spark, range_idx, "content:merge", by="content")


def test_numeric_histogram(spark, range_idx):
    from collections import Counter

    from ostrich_spark.query.exec import numeric_histogram

    hist = numeric_histogram(spark, range_idx, "content:merge", "year", 5)
    got = {int(r["bucket"]): r["n_docs"] for r in hist.collect()}
    years = [2000 + k % 20 for k in _matched_ks(spark, range_idx, "content:merge")]
    exp = Counter((y // 5) * 5 for y in years)
    assert got == dict(exp)


def test_numeric_stats(spark, range_idx):
    from ostrich_spark.query.exec import numeric_stats

    row = numeric_stats(spark, range_idx, "content:merge", "rating").collect()[0]
    vals = [k * 0.5 for k in _matched_ks(spark, range_idx, "content:merge")]
    assert row["n"] == len(vals)
    assert row["min"] == min(vals) and row["max"] == max(vals)
    assert abs(row["sum"] - sum(vals)) < 1e-9
    assert abs(row["avg"] - sum(vals) / len(vals)) < 1e-9


def test_facet_on_numeric_docvalue(spark, range_idx):
    from collections import Counter

    from ostrich_spark.query.exec import facet_counts

    fc = facet_counts(spark, range_idx, "content:merge", by="year")
    got = {int(r["year"]): r["n_docs"] for r in fc.collect()}
    exp = Counter(
        2000 + k % 20 for k in _matched_ks(spark, range_idx, "content:merge")
    )
    assert got == dict(exp)


def test_count_with_range_filter(spark, range_idx):
    q = BooleanQuery(
        [(MUST, TermQuery(0, "merge")), (FILTER, RangeQuery(1, 2003, 2010))]
    )
    hits, count = search(spark, range_idx, q, limit=None, with_count=True)
    assert count == hits.count()
    _, pure_count = search(
        spark, range_idx, RangeQuery(1, 2005, 2008), limit=2, with_count=True
    )
    assert pure_count == 12


# --- facet_stats (terms agg + metric sub-aggs) and cardinality ---


def test_facet_stats_bruteforce(spark, range_idx):
    from ostrich_spark.query.exec import facet_stats

    ks = _matched_ks(spark, range_idx, "content:merge")
    by_year = {}
    for k in ks:
        by_year.setdefault(2000 + k % 20, []).append(k * 0.5)
    got = {
        int(r["year"]): r
        for r in facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={
                "avg_rating": ("avg", "rating"),
                "max_rating": ("max", "rating"),
                "n_k": ("count_distinct", "k"),
            },
        ).collect()
    }
    assert set(got) == set(by_year)
    for y, ratings in by_year.items():
        r = got[y]
        assert r["n_docs"] == len(ratings)
        assert r["n_k"] == len(ratings)
        assert r["max_rating"] == max(ratings)
        assert abs(r["avg_rating"] - sum(ratings) / len(ratings)) < 1e-9


def test_facet_stats_validation(spark, range_idx):
    from ostrich_spark.query.exec import facet_stats

    with pytest.raises(ValueError, match="metric"):
        facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={"bad": ("median", "rating")},
        )


def test_facet_percentile_metric(spark, range_idx):
    """ES percentiles-agg analog: exact mode is SQL percentile_cont
    linear interpolation (hand-recomputed per bucket); approx mode
    returns an ELEMENT of the bucket's value set near the same rank."""
    from ostrich_spark.query.exec import facet_stats

    def interp(vals, p):
        v = sorted(vals)
        pos = p * (len(v) - 1)
        lo, frac = int(pos // 1), pos % 1
        return v[lo] if frac == 0 else v[lo] + frac * (v[lo + 1] - v[lo])

    ks = _matched_ks(spark, range_idx, "content:merge")
    by_year = {}
    for k in ks:
        by_year.setdefault(2000 + k % 20, []).append(k * 0.5)
    got = {
        int(r["year"]): r
        for r in facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={
                "p50": ("percentile", "rating", 0.5),
                "p90": ("percentile", "rating", 0.9),
                "ap50": ("approx_percentile", "rating", 0.5),
                "ap50_acc": ("approx_percentile", "rating", 0.5, 100),
            },
        ).collect()
    }
    assert set(got) == set(by_year)
    for y, ratings in by_year.items():
        r = got[y]
        assert r["p50"] == pytest.approx(interp(ratings, 0.5), abs=1e-12)
        assert r["p90"] == pytest.approx(interp(ratings, 0.9), abs=1e-12)
        for c in ("ap50", "ap50_acc"):
            assert r[c] in ratings  # element, not interpolation
            # within one element of the exact discrete median rank
            v = sorted(ratings)
            i = v.index(r[c])
            assert abs(i - 0.5 * (len(v) - 1)) <= 1.0


def test_facet_percentile_validation(spark, range_idx):
    from ostrich_spark.query.exec import facet_stats

    with pytest.raises(ValueError, match="needs"):
        facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={"p": ("percentile", "rating")},
        )
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={"p": ("percentile", "rating", 1.5)},
        )


def test_cardinality_exact_and_approx(spark, range_idx):
    from ostrich_spark.query.exec import cardinality

    want = len({2000 + k % 20 for k in _matched_ks(spark, range_idx, "content:merge")})
    exact = cardinality(
        spark, range_idx, "content:merge", "year", exact=True
    ).collect()[0]["n_distinct"]
    assert exact == want
    approx = cardinality(
        spark, range_idx, "content:merge", "year"
    ).collect()[0]["n_distinct"]
    # HLL++ at rsd=0.05: tiny cardinalities resolve exactly via the
    # sparse representation; allow slack anyway
    assert abs(approx - want) <= max(1, int(0.1 * want))


def test_facet_stats_plan_partial_agg(spark, range_idx):
    """Scale contract: every metric partial-aggregates map-side in ONE
    groupBy — no window, no second shuffle per metric; the approx
    cardinality sketch also rides a partial aggregation."""
    from ostrich_spark.query.exec import cardinality, facet_stats

    df = facet_stats(
        spark, range_idx, "content:merge", by="year",
        metrics={"avg_rating": ("avg", "rating"), "mx": ("max", "rating")},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_avg" in plan and "partial_max" in plan
    assert "Window" not in plan
    aprx = cardinality(spark, range_idx, "content:merge", "year")
    plan2 = aprx._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan2


def test_facet_stats_join_df_keeps_docmap_metrics(spark, range_idx):
    """Faceting on a SOURCE-table column must not drop docmap-side
    metric columns (regression: the join_on projection used to strip
    them)."""
    from ostrich_spark.query.exec import facet_stats

    side = spark.createDataFrame(
        [(k, "even" if k % 2 == 0 else "odd") for k in range(60)],
        "k long, par string",
    )
    got = {
        r["par"]: (r["n_docs"], r["avg_rating"])
        for r in facet_stats(
            spark, range_idx, "content:merge", by="par",
            metrics={"avg_rating": ("avg", "rating")},
            join_df=side, join_on=["k"],
        ).collect()
    }
    by_par = {}
    for k in _matched_ks(spark, range_idx, "content:merge"):
        by_par.setdefault("even" if k % 2 == 0 else "odd", []).append(k * 0.5)
    assert set(got) == set(by_par)
    for p, ratings in by_par.items():
        assert got[p][0] == len(ratings)
        assert abs(got[p][1] - sum(ratings) / len(ratings)) < 1e-9


# --- early-terminating field-sorted search (index-sort early exit) ---


def _sorted_ids(spark, idx, q, by, **kw):
    from ostrich_spark.query.exec import search_sorted

    return [
        (r["segment_ord"], r["doc"], r[by])
        for r in search_sorted(spark, idx, q, by=by, **kw).collect()
    ]


def test_sorted_early_identical_to_exhaustive(spark, range_idx):
    for by, asc, lim, off in [
        ("rating", True, 5, 0), ("rating", False, 7, 3),
        ("year", True, 10, 0), ("year", False, 4, 2),
    ]:
        base = _sorted_ids(
            spark, range_idx, "content:merge OR content:index", by,
            ascending=asc, limit=lim, offset=off,
        )
        early = _sorted_ids(
            spark, range_idx, "content:merge OR content:index", by,
            ascending=asc, limit=lim, offset=off, early_terminate=True,
        )
        assert early == base, (by, asc, lim, off)


def test_sorted_early_prunes_aligned_segments(spark, range_idx):
    """rating == 0.5*k and the index is range-built on k, so segments
    are value-disjoint on rating: a small top-k must stop after the
    first wave instead of scanning all 4 segments."""
    from ostrich_spark.query.exec import search_sorted

    info = {}
    rows = search_sorted(
        spark, range_idx, "content:merge OR content:index OR content:policy "
        "OR content:segment OR content:spark", by="rating",
        ascending=True, limit=3, early_terminate=True, scan_info=info,
    ).collect()
    assert len(rows) == 3
    assert info["segments_total"] == 4
    assert info["segments_scanned"] < info["segments_total"]
    assert info["segments_scanned"] == 1


def test_sorted_early_with_tombstones(spark, tmp_path):
    from ostrich_spark.query.exec import search_sorted

    idx = _build(spark, tmp_path, n=40, parts=4)
    delete_docs(spark, idx, spark.createDataFrame([(0,), (1,)], "k long"), ["k"])
    info = {}
    rows = search_sorted(
        spark, idx, "content:merge OR content:policy OR content:segment "
        "OR content:index OR content:spark OR content:query OR content:score",
        by="rating", ascending=True, limit=3,
        early_terminate=True, scan_info=info,
    ).collect()
    # k=0,1 tombstoned: the smallest surviving ratings are k=2,3,4
    assert [r["rating"] for r in rows] == [1.0, 1.5, 2.0]


def test_sorted_early_snapshot_pins_deletes(spark, tmp_path):
    """A snapshot-loaded manifest's pinned tombstone version must ride
    into every wave: the pre-delete snapshot still sees the doc, CURRENT
    does not — in early-terminate mode too."""
    from ostrich_spark.manifest import load_manifest as _lm, set_snapshot_retention
    from ostrich_spark.query.exec import search_sorted

    idx = str(tmp_path / "idx")
    set_snapshot_retention(idx, 4)
    _build2 = _build(spark, tmp_path, n=40, parts=4)
    idx = _build2
    pre = _lm(idx)
    delete_docs(spark, idx, spark.createDataFrame([(0,), (1,)], "k long"), ["k"])
    q = ("content:merge OR content:policy OR content:segment OR content:index "
         "OR content:spark OR content:query OR content:score")
    cur = search_sorted(
        spark, idx, q, by="rating", ascending=True, limit=3,
        early_terminate=True,
    ).collect()
    assert [r["rating"] for r in cur] == [1.0, 1.5, 2.0]
    # need snapshot retention for an as-of read: re-check via load(opstamp)
    try:
        snap = _lm(idx, opstamp=pre.opstamp)
    except FileNotFoundError:
        import pytest as _pytest

        _pytest.skip("snapshot not retained in this layout")
    old = search_sorted(
        spark, idx, q, by="rating", ascending=True, limit=3,
        early_terminate=True, manifest=snap,
    ).collect()
    assert [r["rating"] for r in old] == [0.0, 0.5, 1.0]


# --- range_agg (ES range aggregation) / filters_agg (ES filters agg) ---


def test_range_agg_bruteforce_overlap_and_empty(spark, range_idx):
    """Overlapping [lo,hi) buckets double-count (ES semantics); declared
    empty buckets surface with n_docs=0/NULL metric; output keeps
    declaration order."""
    from ostrich_spark.query.exec import range_agg

    ks = _matched_ks(spark, range_idx, "content:merge")
    ranges = [
        ("lo", None, 2008),
        ("mid", 2005, 2012),
        ("hi", 2012, None),
        ("never", 3000, 4000),
    ]
    rows = range_agg(
        spark, range_idx, "content:merge", "year", ranges,
        metrics={"avg_rating": ("avg", "rating")},
    ).collect()
    assert [r["range_key"] for r in rows] == ["lo", "mid", "hi", "never"]
    want = {
        key: [
            k for k in ks
            if (lo is None or 2000 + k % 20 >= lo)
            and (hi is None or 2000 + k % 20 < hi)
        ]
        for key, lo, hi in ranges
    }
    for r in rows:
        sel = want[r["range_key"]]
        assert r["n_docs"] == len(sel)
        if sel:
            assert abs(r["avg_rating"] - sum(k * 0.5 for k in sel) / len(sel)) < 1e-9
        else:
            assert r["avg_rating"] is None
    # lo and mid overlap on [2005, 2008): the doc-count total exceeds the
    # distinct match count, i.e. docs really count once per range
    assert sum(r["n_docs"] for r in rows) > len(ks)
    assert len(want["lo"]) + len(want["mid"]) > len(
        set(want["lo"]) | set(want["mid"])
    )


def test_range_agg_null_values_fall_in_no_range(spark, tmp_path):
    """NULL doc values are absent from every bucket, including unbounded
    ones (ES: missing docs simply don't appear)."""
    from ostrich_spark.query.exec import range_agg

    idx = str(tmp_path / "nullidx")
    docs = pd.DataFrame(
        {
            "k": [0, 1, 2, 3],
            "content": ["merge spark"] * 4,
            "year": [2000, 2001, 2002, 2003],
            "rating": [1.0, None, 3.0, None],
        }
    )
    build_index(
        spark, spark.createDataFrame(docs), _schema(), idx,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    rows = range_agg(
        spark, idx, "content:merge", "rating",
        [("all", None, None), ("low", None, 2.0)],
    ).collect()
    got = {r["range_key"]: r["n_docs"] for r in rows}
    assert got == {"all": 2, "low": 1}


def test_range_agg_validation(spark, range_idx):
    from ostrich_spark.query.exec import range_agg

    with pytest.raises(ValueError, match="doc-value"):
        range_agg(spark, range_idx, "content:merge", "content", [("a", 0, 1)])
    with pytest.raises(ValueError, match=">= 1"):
        range_agg(spark, range_idx, "content:merge", "year", [])
    with pytest.raises(ValueError, match="duplicate"):
        range_agg(
            spark, range_idx, "content:merge", "year",
            [("a", 0, 1), ("a", 1, 2)],
        )


def test_filters_agg_bruteforce(spark, range_idx):
    """Named-query buckets vs per-query brute force; a doc matching
    several filters counts in each; empty buckets present with
    n_docs=0/NULL metric; declaration order kept."""
    from ostrich_spark.query.exec import filters_agg

    queries = {
        "merge": "content:merge",
        "both": "content:merge AND content:spark",
        "none": "content:zzzzunseen",
    }
    rows = filters_agg(
        spark, range_idx, queries,
        metrics={"max_rating": ("max", "rating")},
    ).collect()
    assert [r["filter_key"] for r in rows] == ["merge", "both", "none"]
    got = {r["filter_key"]: r for r in rows}
    for key, q in queries.items():
        ks = _matched_ks(spark, range_idx, q)
        assert got[key]["n_docs"] == len(ks)
        if ks:
            assert got[key]["max_rating"] == max(k * 0.5 for k in ks)
        else:
            assert got[key]["max_rating"] is None
    assert got["merge"]["n_docs"] > got["both"]["n_docs"] > 0


def test_filters_agg_one_job_partial_agg(spark, range_idx):
    """Scale contract: all buckets ride ONE search_many pass and the
    bucket groupBy partial-aggregates map-side."""
    from ostrich_spark.query.exec import filters_agg

    df = filters_agg(
        spark, range_idx,
        {"a": "content:merge", "b": "content:spark"},
        metrics={"mx": ("max", "rating")},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan and "partial_max" in plan
    assert "Window" not in plan
    with pytest.raises(ValueError, match=">= 1"):
        filters_agg(spark, range_idx, {})


# --- rare_terms / missing_agg / adjacency_matrix / weighted_avg metric ---


def test_rare_terms_bruteforce(spark, range_idx):
    """Buckets with n_docs <= max_doc_count, rarest first (ES order)."""
    from ostrich_spark.query.exec import rare_terms

    counts = {}
    for k in _matched_ks(spark, range_idx, "content:merge"):
        y = 2000 + k % 20
        counts[y] = counts.get(y, 0) + 1
    for cut in sorted(set(counts.values())) + [min(counts.values()) - 1]:
        rows = rare_terms(
            spark, range_idx, "content:merge", "year", max_doc_count=max(cut, 1)
        ).collect()
        want = {y: c for y, c in counts.items() if c <= max(cut, 1)}
        assert {int(r["year"]): r["n_docs"] for r in rows} == want
        got_order = [(r["n_docs"], int(r["year"])) for r in rows]
        assert got_order == sorted(got_order)
    with pytest.raises(ValueError, match=">= 1"):
        rare_terms(spark, range_idx, "content:merge", "year", max_doc_count=0)


def test_missing_agg(spark, tmp_path):
    from ostrich_spark.query.exec import missing_agg

    idx = str(tmp_path / "missidx")
    docs = pd.DataFrame(
        {
            "k": [0, 1, 2, 3, 4],
            "content": ["merge spark"] * 4 + ["spark only"],
            "year": [2000, 2001, 2002, 2003, 2004],
            "rating": [1.0, None, 3.0, None, None],
        }
    )
    build_index(
        spark, spark.createDataFrame(docs), _schema(), idx,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    # doc 4 (null rating) does NOT match content:merge -> 2 missing
    r = missing_agg(
        spark, idx, "content:merge", "rating",
        metrics={"max_year": ("max", "year")},
    ).collect()[0]
    assert r["n_docs"] == 2
    assert r["max_year"] == 2003
    with pytest.raises(ValueError, match="doc-value"):
        missing_agg(spark, idx, "content:merge", "content")


def test_adjacency_matrix_bruteforce(spark, range_idx):
    """Singles + pairwise intersections in declaration order; empty
    buckets (and their pairs) omitted — ES adjacency_matrix."""
    from ostrich_spark.query.exec import adjacency_matrix

    qs = {
        "mg": "content:merge",
        "sp": "content:spark",
        "zz": "content:zzznothere",
    }
    sets = {k: set(_matched_ks(spark, range_idx, q)) for k, q in qs.items()}
    rows = {r["key"]: r["n_docs"] for r in
            adjacency_matrix(spark, range_idx, qs).collect()}
    want = {
        "mg": len(sets["mg"]),
        "sp": len(sets["sp"]),
        "mg&sp": len(sets["mg"] & sets["sp"]),
    }
    assert rows == {k: v for k, v in want.items() if v > 0}
    assert rows["mg&sp"] > 0  # the intersection bucket really exists
    with pytest.raises(ValueError, match="separator"):
        adjacency_matrix(spark, range_idx, {"a&b": "content:merge"})
    with pytest.raises(ValueError, match=">= 1"):
        adjacency_matrix(spark, range_idx, {})


def test_weighted_avg_metric(spark, range_idx):
    """weighted_avg (ES analog) through the shared metric grammar:
    sum(v*w)/sum(w where v present), incl through a join_df facet."""
    from ostrich_spark.query.exec import facet_stats

    ks = _matched_ks(spark, range_idx, "content:merge")
    # weight = k % 5 + 1 from a side table; value = rating (docmap side)
    side = spark.createDataFrame(
        [(k, "even" if k % 2 == 0 else "odd", k % 5 + 1) for k in range(60)],
        "k long, par string, w long",
    )
    got = {
        r["par"]: r["wavg"]
        for r in facet_stats(
            spark, range_idx, "content:merge", by="par",
            metrics={"wavg": ("weighted_avg", "rating", "w")},
            join_df=side, join_on=["k"],
        ).collect()
    }
    want = {}
    for p in ("even", "odd"):
        sel = [k for k in ks if ("even" if k % 2 == 0 else "odd") == p]
        want[p] = sum(k * 0.5 * (k % 5 + 1) for k in sel) / sum(
            k % 5 + 1 for k in sel
        )
    for p in want:
        assert abs(got[p] - want[p]) < 1e-9
    with pytest.raises(ValueError, match="needs"):
        facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={"bad": ("weighted_avg", "rating")},
        )


def test_numeric_histogram_gap_fill(spark, range_idx):
    """min_doc_count=0 fills integer-index gaps for fractional bin
    widths too; extended_bounds widens with floored snapping."""
    from ostrich_spark.query.exec import numeric_histogram

    ks = _matched_ks(spark, range_idx, "content:merge")
    w = 2.5
    occ = {}
    for k in ks:
        b = (k * 0.5 // w) * w
        occ[b] = occ.get(b, 0) + 1
    got = {
        r["bucket"]: r["n_docs"]
        for r in numeric_histogram(
            spark, range_idx, "content:merge", "rating", w, min_doc_count=0
        ).collect()
    }
    lo, hi = min(occ), max(occ)
    want = {lo + i * w: 0 for i in range(int(round((hi - lo) / w)) + 1)}
    want.update(occ)
    assert got == want
    # extended_bounds: 31.2 floors to bucket 30.0
    got_e = {
        r["bucket"]
        for r in numeric_histogram(
            spark, range_idx, "content:merge", "rating", w, min_doc_count=0,
            extended_bounds=(None, 31.2),
        ).collect()
    }
    assert max(got_e) == 30.0 and min(got_e) == lo
    with pytest.raises(ValueError, match="min_doc_count"):
        numeric_histogram(
            spark, range_idx, "content:merge", "rating", w, min_doc_count=3
        )


def test_max_by_min_by_metric(spark, range_idx):
    """ES top_metrics shape: the value of a column at the bucket's
    extreme of a (unique) sort column."""
    from ostrich_spark.query.exec import facet_stats

    ks = _matched_ks(spark, range_idx, "content:merge")
    got = {
        int(r["year"]): (r["top_r"], r["bot_r"])
        for r in facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={"top_r": ("max_by", "rating", "k"),
                     "bot_r": ("min_by", "rating", "k")},
        ).collect()
    }
    by_year = {}
    for k in ks:
        by_year.setdefault(2000 + k % 20, []).append(k)
    for y, kk in by_year.items():
        assert got[y] == (max(kk) * 0.5, min(kk) * 0.5)
    with pytest.raises(ValueError, match="sort_col"):
        facet_stats(
            spark, range_idx, "content:merge", by="year",
            metrics={"bad": ("max_by", "rating")},
        )


def test_extended_stats_and_percentile_ranks(spark, range_idx):
    """ES extended_stats (population variance, sigma bounds) and
    percentile_ranks (exact CDF: 100*count(v<=x)/n) vs brute force."""
    from ostrich_spark.query.exec import numeric_extended_stats, percentile_ranks

    vals = [k * 0.5 for k in _matched_ks(spark, range_idx, "content:merge")]
    e = numeric_extended_stats(spark, range_idx, "content:merge", "rating").collect()[0]
    n, mean = len(vals), sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / n
    assert e["n"] == n
    assert abs(e["sum_of_squares"] - sum(v * v for v in vals)) < 1e-9
    assert abs(e["variance"] - var) < 1e-9
    assert abs(e["std_upper"] - (mean + 2 * var**0.5)) < 1e-9
    pts = [min(vals) - 1, sorted(vals)[n // 2], max(vals) + 1]
    got = {
        r["value"]: r["rank"]
        for r in percentile_ranks(
            spark, range_idx, "content:merge", "rating", pts
        ).collect()
    }
    for x in pts:
        want = 100.0 * sum(1 for v in vals if v <= x) / n
        assert abs(got[x] - want) < 1e-9
    assert got[pts[0]] == 0.0 and got[pts[2]] == 100.0
    # empty match set -> NULL ranks
    r0 = percentile_ranks(
        spark, range_idx, "content:zzznothere", "rating", [1.0]
    ).collect()[0]
    assert r0["rank"] is None
    with pytest.raises(ValueError, match=">= 1"):
        percentile_ranks(spark, range_idx, "content:merge", "rating", [])


def test_numeric_histogram_offset(spark, range_idx):
    """ES histogram offset: bucket = floor((v-offset)/w)*w + offset,
    composing with gap filling; offset outside [0, w) rejected."""
    from collections import Counter

    from ostrich_spark.query.exec import numeric_histogram

    years = [2000 + k % 20 for k in _matched_ks(spark, range_idx, "content:merge")]
    got = {
        r["bucket"]: r["n_docs"]
        for r in numeric_histogram(
            spark, range_idx, "content:merge", "year", 5, offset=2.0
        ).collect()
    }
    exp = Counter(((y - 2) // 5) * 5 + 2 for y in years)
    assert got == {float(b): n for b, n in exp.items()}
    assert all(b % 5 == 2 for b in got)
    # fill + extended bounds on the shifted axis: contiguous 2-phase spine
    rows = (
        numeric_histogram(
            spark, range_idx, "content:merge", "year", 5,
            min_doc_count=0, extended_bounds=(1990.0, None), offset=2.0,
        )
        .orderBy("bucket")
        .collect()
    )
    keys = [r["bucket"] for r in rows]
    # 1990 snaps to floor((1990-2)/5)*5+2 = 1987
    assert keys[0] == 1987.0 and rows[0]["n_docs"] == 0
    assert keys == [keys[0] + 5 * i for i in range(len(keys))]
    assert {r["bucket"]: r["n_docs"] for r in rows if r["n_docs"]} == got
    with pytest.raises(ValueError, match="0 <= offset < bin_width"):
        numeric_histogram(
            spark, range_idx, "content:merge", "year", 5, offset=5.0
        )
    with pytest.raises(ValueError, match="0 <= offset < bin_width"):
        numeric_histogram(
            spark, range_idx, "content:merge", "year", 5, offset=-1.0
        )


def test_facet_terms_ergonomics(spark, tmp_path):
    """ES terms-agg options on facet_stats: missing substitution,
    min_doc_count, include/exclude anchored regexes, metric ordering
    with a deterministic size cut — all checked against pandas."""
    from ostrich_spark.query.exec import facet_stats

    s = Schema()
    s.add_text_field("content", "default")
    s.add_keyword_field("lang")
    s.add_numeric_field("v", "double")
    docs = [
        {"k": i, "content": "spark data",
         "lang": [None, "fr", "de", "zh"][i % 4], "v": float(i)}
        for i in range(12)
    ]
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=2, order_col="k", id_cols=["k"],
    )

    # missing: NULL keys bucket under the substitute
    out = {r["lang"]: (r["n_docs"], r["avg_v"]) for r in facet_stats(
        spark, idx, "content:spark", "lang",
        {"avg_v": ("avg", "v")}, missing="unknown",
    ).collect()}
    assert set(out) == {"unknown", "fr", "de", "zh"}
    assert out["unknown"] == (3, (0 + 4 + 8) / 3)

    # include/exclude are anchored (the ES whole-term semantics)
    inc = {r["lang"] for r in facet_stats(
        spark, idx, "content:spark", "lang", {}, include="f.|de",
    ).collect()}
    assert inc == {"fr", "de"}  # NULL keys never match include
    exc = {r["lang"] for r in facet_stats(
        spark, idx, "content:spark", "lang", {}, missing="unknown",
        exclude="unk.*",
    ).collect()}
    assert exc == {"fr", "de", "zh"}  # substituted key excluded
    exc2 = {r["lang"] for r in facet_stats(
        spark, idx, "content:spark", "lang", {}, exclude="fr",
    ).collect()}
    assert exc2 == {None, "de", "zh"}  # NULL survives exclude

    # order by metric desc + size: top-2 avg_v buckets, key tiebreak
    rows = facet_stats(
        spark, idx, "content:spark", "lang", {"avg_v": ("avg", "v")},
        missing="zz_unknown", order_by=[("avg_v", "desc")], size=2,
    ).collect()
    # avgs: None->4.0, fr->5.0 (1,5,9), de->6.0, zh->7.0
    assert [(r["lang"], r["avg_v"]) for r in rows] == [
        ("zh", 7.0), ("de", 6.0)
    ]
    # size without order_by = ES default count desc (all tied at 3 ->
    # key-asc tiebreak decides deterministically)
    rows = facet_stats(
        spark, idx, "content:spark", "lang", {}, missing="aa", size=2,
    ).collect()
    assert [r["lang"] for r in rows] == ["aa", "de"]

    # min_doc_count drops small buckets
    few = facet_stats(
        spark, idx, "content:doc999", "lang", {}, min_doc_count=2,
    ).collect()
    assert few == []

    # validation
    with pytest.raises(ValueError, match="exactly one"):
        facet_stats(spark, idx, "content:spark", ["lang", "v"], {},
                    missing="x")
    with pytest.raises(ValueError, match="exactly one"):
        facet_stats(spark, idx, "content:spark", ["lang", "v"], {},
                    include="a")
    with pytest.raises(ValueError, match="order_by column"):
        facet_stats(spark, idx, "content:spark", "lang", {},
                    order_by=[("nope", "desc")])
    with pytest.raises(ValueError, match="asc/desc"):
        facet_stats(spark, idx, "content:spark", "lang", {},
                    order_by=[("n_docs", "down")])
    with pytest.raises(ValueError, match="min_doc_count"):
        facet_stats(spark, idx, "content:spark", "lang", {},
                    min_doc_count=0)
    with pytest.raises(ValueError, match="non-key"):
        facet_stats(spark, idx, "content:spark", "lang", {},
                    missing={"v": 0.0})
