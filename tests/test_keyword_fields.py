"""Keyword doc-value fields: exact-match (ES term-on-keyword) and exists
queries.

EXTENSION — the reference has text fields only
(/root/reference/schema/schema.go:11-16); keyword fields are the ES
``keyword`` type / Lucene StringField+SortedDocValues analog: the raw
string is a typed docmap column (never analyzed, no postings), queried
with constant-score equality (``lang:fr``) or existence (``lang:*``)
filters that ride the scoring shuffle exactly like numeric ranges.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, explain, search, search_many
from ostrich_spark.query.parser import (
    BooleanQuery,
    ExistsQuery,
    KeywordQuery,
    QueryParseError,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    (0, "spark joins fast", "fr", "wiki", 10),
    (1, "spark streams", "en", "web", 20),
    (2, "hash join spark", None, "web", 30),
    (3, "window functions", "fr", None, None),
    (4, "spark spark spark", "de", "wiki", 50),
    (5, "grace hash join", "fr", "wiki", 15),
]


def _schema() -> Schema:
    schema = Schema()
    schema.add_text_field("text", "default")
    schema.add_keyword_field("lang")
    schema.add_keyword_field("source")
    schema.add_numeric_field("n_chars")
    return schema


@pytest.fixture(scope="module")
def kw_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    idx = str(tmp_path_factory.mktemp("kw") / "idx")
    build_index(
        spark, df, _schema(), idx, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _ids_scores(spark, idx, q, **kw):
    res, _ = search(spark, idx, q, limit=None, **kw)
    rows = (
        attach_docmap(spark, idx, res)
        .select("doc_id", "score")
        .orderBy("doc_id")
        .collect()
    )
    return [(r["doc_id"], round(r["score"], 6)) for r in rows]


def test_keyword_eq(spark, kw_index):
    # exact match, constant score 1.0; NULL never matches
    assert _ids_scores(spark, kw_index, "lang:fr") == [
        (0, 1.0), (3, 1.0), (5, 1.0),
    ]
    assert _ids_scores(spark, kw_index, "source:web") == [(1, 1.0), (2, 1.0)]
    # value absent from the corpus: empty, not an error
    assert _ids_scores(spark, kw_index, "lang:zz") == []


def test_keyword_never_analyzed(spark, kw_index):
    # 'FR' must NOT lowercase-normalize into 'fr' (ES keyword semantics:
    # what you store is what you match)
    assert _ids_scores(spark, kw_index, "lang:FR") == []


def test_keyword_quoted_value(spark, kw_index):
    # quoted form is the same exact match (for values with spaces/colons)
    assert _ids_scores(spark, kw_index, 'lang:"fr"') == [
        (0, 1.0), (3, 1.0), (5, 1.0),
    ]


def test_exists(spark, kw_index):
    # keyword exists: doc 2 has NULL lang
    assert [i for i, _ in _ids_scores(spark, kw_index, "lang:*")] == [0, 1, 3, 4, 5]
    # numeric exists: doc 3 has NULL n_chars
    assert [i for i, _ in _ids_scores(spark, kw_index, "n_chars:*")] == [0, 1, 2, 4, 5]
    # exists on a text field stays a wildcard (here: rejected as a
    # degenerate match-all pattern or expanded), NOT an exists query
    q = parse_query("lang:*", _schema(), ["text"])
    assert isinstance(q, ExistsQuery)


def test_filter_context_keeps_text_scores(spark, kw_index):
    # the ES-classic shape: scored text query, non-scoring keyword filter
    base = dict(_ids_scores(spark, kw_index, "text:spark"))
    q = BooleanQuery.filtering(TermQuery(0, "spark"), KeywordQuery(1, "fr"))
    got = _ids_scores(spark, kw_index, q)
    assert [i for i, _ in got] == [0]
    assert got[0][1] == base[0]  # filter adds nothing to the score


def test_keyword_boolean_composition(spark, kw_index):
    # MUST keyword adds its constant boost to the text score
    base = dict(_ids_scores(spark, kw_index, "text:spark"))
    got = dict(_ids_scores(spark, kw_index, "text:spark AND lang:fr"))
    assert set(got) == {0}
    assert got[0] == round(base[0] + 1.0, 6)
    # boost scales the constant
    got2 = dict(_ids_scores(spark, kw_index, "text:spark AND lang:fr^2"))
    assert got2[0] == round(base[0] + 2.0, 6)
    # OR of two keyword queries: per-doc sum of matching constants
    got3 = dict(_ids_scores(spark, kw_index, "lang:fr OR source:wiki"))
    assert got3 == {0: 2.0, 3: 1.0, 4: 1.0, 5: 2.0}
    # MUST_NOT excludes by keyword (programmatic occur, like the
    # reference's extension — NQL has no negation syntax)
    q = BooleanQuery.excluding(TermQuery(0, "spark"), KeywordQuery(1, "fr"))
    got4 = _ids_scores(spark, kw_index, q)
    assert [i for i, _ in got4] == [1, 2, 4]


def test_pure_keyword_with_count(spark, kw_index):
    res, cnt = search(spark, kw_index, "lang:fr", limit=2, with_count=True)
    assert cnt == 3
    assert res.count() == 2


def test_parse_goldens():
    schema = _schema()
    q = parse_query("lang:fr", schema, ["text"])
    assert q == KeywordQuery(1, "fr")
    q = parse_query('source:"wiki"', schema, ["text"])
    assert q == KeywordQuery(2, "wiki")
    q = parse_query("source:*", schema, ["text"])
    assert q == ExistsQuery(2)
    q = parse_query("n_chars:*", schema, ["text"])
    assert q == ExistsQuery(3)
    with pytest.raises(QueryParseError):
        parse_query("lang:", schema, ["text"])
    # unknown field name still falls through to a bare term (unchanged)
    q = parse_query("nope:fr", schema, ["text"])
    assert q == TermQuery(0, "nope:fr")


def test_keyword_validation(spark, kw_index):
    # programmatic misuse fails with actionable errors, not wrong answers
    with pytest.raises(ValueError, match="non-keyword"):
        search(spark, kw_index, KeywordQuery(0, "x"), limit=None)[0].collect()
    with pytest.raises(ValueError, match="non-doc-value"):
        search(spark, kw_index, ExistsQuery(0), limit=None)[0].collect()


def test_explain_keyword(spark, kw_index):
    mf = load_manifest(kw_index)
    hit = (
        attach_docmap(
            spark, kw_index, search(spark, kw_index, "lang:fr AND text:spark")[0]
        )
        .filter("doc_id = 0")
        .collect()[0]
    )
    tree = explain(
        spark, kw_index, "lang:fr AND text:spark", hit["segment_id"], hit["doc"]
    )
    assert tree["matched"] is True
    kinds = {c["kind"]: c for c in tree["children"]}
    assert kinds["range"]["detail"] == {
        "op": "eq", "value": "fr", "const_score": 1.0,
    }


def test_batched_identity(spark, kw_index):
    # search_many must agree with the per-query path for keyword shapes
    queries = {
        "a": "lang:fr",
        "b": "text:spark AND lang:fr",
        "c": "lang:fr OR source:wiki",
        "d": "n_chars:*",
    }
    batched = search_many(spark, kw_index, queries, limit=None)
    for qid, q in queries.items():
        want = _ids_scores(spark, kw_index, q)
        got = [
            (r["doc_id"], round(r["score"], 6))
            for r in attach_docmap(
                spark, kw_index, batched.filter(batched.query_id == qid).drop("query_id")
            )
            .select("doc_id", "score")
            .orderBy("doc_id")
            .collect()
        ]
        assert got == want, qid


def test_merge_carries_keyword_columns(spark, kw_index, tmp_path):
    import shutil

    from ostrich_spark.merge import consider_merges

    idx = str(tmp_path / "m")
    shutil.copytree(kw_index, idx)
    before = _ids_scores(spark, idx, "lang:fr OR source:web")
    created = consider_merges(spark, idx, policy_kwargs={"min_num_segments": 2})
    assert created  # the 2 segments merged
    assert load_manifest(idx).schema.field_by_name("lang").is_keyword
    assert _ids_scores(spark, idx, "lang:fr OR source:web") == before


def test_keyword_pushdown_plan(spark, kw_index):
    # the equality must reach the parquet scan of the docmap
    from ostrich_spark.query.exec import range_match_df
    from ostrich_spark.query.plan import compile_query, to_wire

    q = parse_query("lang:fr", _schema(), ["text"])
    wire = to_wire(compile_query(q, {}, 6, {}))
    wire["rid"] = 0
    mf = load_manifest(kw_index)
    plan = range_match_df(spark, kw_index, mf, wire)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan


def _sorted_ids(spark, idx, by, ascending, early, limit=10):
    from ostrich_spark.query.exec import search_sorted

    info = {}
    rows = search_sorted(
        spark, idx, "text:spark OR text:join OR text:window", by=by,
        ascending=ascending, limit=limit, early_terminate=early,
        scan_info=info if early else None, tiebreak=["doc_id"],
    ).collect()
    return [(r["doc"], r[by]) for r in rows], info


def test_keyword_sort(spark, kw_index):
    # string sort over the match set: asc and desc, NULL lang (doc 2)
    # sorts LAST in both directions (Lucene missing-value convention)
    got, _ = _sorted_ids(spark, kw_index, "lang", True, False)
    assert [v for _, v in got] == ["de", "en", "fr", "fr", "fr", None]
    got_d, _ = _sorted_ids(spark, kw_index, "lang", False, False)
    assert [v for _, v in got_d] == ["fr", "fr", "fr", "en", "de", None]


def test_keyword_sort_early_terminate_identity(spark, kw_index):
    # the segment-pruned path must be row-identical to the exhaustive
    # path on string sort keys, both directions, including the top-1 cut
    for ascending in (True, False):
        for limit in (1, 3, 10):
            want, _ = _sorted_ids(spark, kw_index, "lang", ascending, False,
                                  limit=limit)
            got, info = _sorted_ids(spark, kw_index, "lang", ascending, True,
                                    limit=limit)
            assert got == want, (ascending, limit)
            assert info["segments_total"] == 2


def test_sort_rejects_text_field(spark, kw_index):
    from ostrich_spark.query.exec import search_sorted

    with pytest.raises(ValueError, match="doc-value"):
        search_sorted(spark, kw_index, "text:spark", by="text")


def test_keyword_lowercase_normalizer(spark, tmp_path):
    """add_keyword_field(lowercase=True) — the ES keyword `normalizer`:
    values lowercase at index time, query values lowercase before the
    equality, so case mismatches stop being silent misses. Percolation
    normalizes BOTH sides the same way."""
    from ostrich_spark.percolate import percolate, register_queries

    docs = [(0, "spark joins", "News"), (1, "spark streams", "BLOG"),
            (2, "hash join", "news"), (3, "windows", None)]
    df = spark.createDataFrame(docs, "doc_id long, text string, cat string")
    schema = Schema()
    schema.add_text_field("text", "default")
    schema.add_keyword_field("cat", lowercase=True)
    idx = str(tmp_path / "idx")
    build_index(spark, df, schema, idx, num_partitions=2,
                order_col="doc_id", id_cols=["doc_id"])

    # any case on either side matches: stored News/news/BLOG, query FR
    assert [i for i, _ in _ids_scores(spark, idx, "cat:NEWS")] == [0, 2]
    assert [i for i, _ in _ids_scores(spark, idx, "cat:news")] == [0, 2]
    assert [i for i, _ in _ids_scores(spark, idx, "cat:Blog")] == [1]
    # stored docmap value is the NORMALIZED form (ES doc-value behavior)
    mf = load_manifest(idx)
    from ostrich_spark.query.exec import read_docmap

    vals = {r["doc_id"]: r["cat"]
            for r in read_docmap(spark, idx, mf).select("doc_id", "cat").collect()}
    assert vals == {0: "news", 1: "blog", 2: "news", 3: None}

    # percolation: raw-cased incoming docs match a raw-cased subscription
    pq = register_queries({"s": KeywordQuery(1, "NeWs")}, schema)
    got = {r["doc_id"] for r in
           percolate(spark, df, pq, schema, id_col="doc_id").collect()}
    assert got == {0, 2}

    # an UNnormalized keyword field keeps exact-case semantics (pinned
    # so the normalizer can never silently become the default)
    schema2 = Schema()
    schema2.add_text_field("text", "default")
    schema2.add_keyword_field("cat")
    idx2 = str(tmp_path / "idx2")
    build_index(spark, df, schema2, idx2, num_partitions=1,
                order_col="doc_id", id_cols=["doc_id"])
    assert [i for i, _ in _ids_scores(spark, idx2, "cat:news")] == [2]
    assert _ids_scores(spark, idx2, "cat:NEWS") == []


def test_keyword_string_range(spark, kw_index):
    """Lexicographic range over a keyword field (Lucene TermRangeQuery
    analog): NQL bracket syntax, inclusive/exclusive/open bounds, NULL
    never matches, brute-force identity against the raw values."""
    langs = {d[0]: d[2] for d in DOCS}

    def brute(lo, hi, ilo=True, ihi=True):
        out = []
        for did, v in langs.items():
            if v is None:
                continue
            if lo is not None and (v < lo or (not ilo and v == lo)):
                continue
            if hi is not None and (v > hi or (not ihi and v == hi)):
                continue
            out.append((did, 1.0))
        return sorted(out)

    assert _ids_scores(spark, kw_index, "lang:[de TO en]") == brute("de", "en")
    assert _ids_scores(spark, kw_index, "lang:{de TO fr]") == brute(
        "de", "fr", ilo=False
    )
    assert _ids_scores(spark, kw_index, "lang:[en TO *]") == brute("en", None)
    assert _ids_scores(spark, kw_index, "lang:[* TO de}") == brute(
        None, "de", ihi=False
    )
    # composes with scored text clauses; FILTER keeps scores untouched
    scored = dict(_ids_scores(spark, kw_index, "text:spark"))
    got = _ids_scores(
        spark, kw_index,
        BooleanQuery.filtering(
            parse_query("text:spark", _schema()),
            parse_query("lang:[de TO en]", _schema()),
        ),
    )
    want = sorted(
        (did, scored[did]) for did, _ in brute("de", "en") if did in scored
    )
    assert got == want


def test_keyword_range_validation(spark, kw_index):
    # string bounds on a numeric field / numeric bounds on keyword
    from ostrich_spark.query.parser import RangeQuery

    with pytest.raises(ValueError, match="non-keyword field"):
        _ids_scores(spark, kw_index, RangeQuery(3, "a", "f"))  # n_chars
    with pytest.raises(ValueError, match="string bounds"):
        _ids_scores(spark, kw_index, RangeQuery(1, 1, 2))  # lang
    with pytest.raises(QueryParseError, match="both numeric or both"):
        RangeQuery(1, "a", 5)


def test_terms_query(spark, kw_index):
    """ES terms query: any-of set membership, ONE unit/scan, constant
    score at most once per doc (a doc stores one value per field)."""
    from ostrich_spark.query.parser import TermsQuery

    assert _ids_scores(spark, kw_index, TermsQuery(1, ("fr", "de"))) == [
        (0, 1.0), (3, 1.0), (4, 1.0), (5, 1.0),
    ]
    # identical to the OR-of-KeywordQuery form (one scan vs two)
    assert _ids_scores(
        spark, kw_index,
        BooleanQuery.union(KeywordQuery(1, "fr"), KeywordQuery(1, "de")),
    ) == _ids_scores(spark, kw_index, TermsQuery(1, ("fr", "de")))
    # absent values don't error; empty set rejected; non-keyword rejected
    assert _ids_scores(spark, kw_index, TermsQuery(1, ("zz",))) == []
    with pytest.raises(QueryParseError, match="at least one value"):
        TermsQuery(1, ())
    with pytest.raises(ValueError, match="non-keyword"):
        _ids_scores(spark, kw_index, TermsQuery(3, ("a",)))
    # boost scales the constant; MUST_NOT composition
    assert _ids_scores(spark, kw_index, TermsQuery(1, ("de",), boost=2.5)) == [
        (4, 2.5)
    ]
    got = _ids_scores(
        spark, kw_index,
        BooleanQuery.excluding(
            parse_query("text:spark", _schema()), TermsQuery(1, ("fr", "de"))
        ),
    )
    assert [d for d, _ in got] == [1, 2]


def test_terms_and_string_range_batched(spark, kw_index):
    """search_many must return row-identical results to per-query search
    for the new doc-value shapes (shared rid namespace)."""
    from ostrich_spark.query.parser import TermsQuery

    queries = {
        "a": parse_query("lang:[de TO en]", _schema()),
        "b": TermsQuery(1, ("fr", "de")),
        "c": BooleanQuery.filtering(
            parse_query("text:spark", _schema()), TermsQuery(2, ("wiki",))
        ),
    }
    batched = search_many(spark, kw_index, queries, limit=None)
    for qid, q in queries.items():
        single = _ids_scores(spark, kw_index, q)
        got = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in attach_docmap(
                spark, kw_index, batched.filter(batched.query_id == qid)
            ).select("doc_id", "score").collect()
        )
        assert got == single, qid


def test_terms_string_range_percolate(spark, kw_index):
    """Percolation identity with forward search for terms-set and
    string-range subscriptions (incl. one-unit counting for a set)."""
    from ostrich_spark.percolate import percolate, register_queries
    from ostrich_spark.query.parser import TermsQuery

    schema = _schema()
    subs = {
        "terms": TermsQuery(1, ("fr", "de")),
        "range": parse_query("lang:[de TO en]", schema),
        "mix": BooleanQuery.filtering(
            parse_query("text:spark", schema), TermsQuery(2, ("wiki",))
        ),
        "not": BooleanQuery.excluding(
            parse_query("text:join", schema), TermsQuery(1, ("fr",))
        ),
    }
    docs_df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pq = register_queries(subs, schema)
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(spark, docs_df, pq, schema, id_col="doc_id").collect()
    }
    want = set()
    for qid, q in subs.items():
        for did, _ in _ids_scores(spark, kw_index, q):
            want.add((did, qid))
    assert got == want
    # registration rejects terms on non-keyword fields
    with pytest.raises(ValueError, match="keyword 'in' clause"):
        register_queries({"bad": TermsQuery(3, ("a",))}, schema)
    # numeric-bounded range on a keyword field: actionable error
    from ostrich_spark.query.parser import RangeQuery

    with pytest.raises(ValueError, match="STRING bounds"):
        register_queries({"bad": RangeQuery(1, 1, 2)}, schema)


def test_explain_terms_detail(spark, kw_index):
    from ostrich_spark.query.parser import TermsQuery

    q = BooleanQuery.filtering(
        parse_query("text:spark", _schema()), TermsQuery(1, ("fr", "de"))
    )
    res, _ = search(spark, kw_index, q, limit=1)
    hit = res.collect()[0]
    tree = explain(spark, kw_index, q, hit["segment_id"], hit["doc"])
    assert tree["matched"] and round(tree["score"], 6) == round(hit["score"], 6)

    def find_in(node):
        if node.get("detail", {}).get("op") == "in":
            return node
        for c in node.get("children", []):
            r = find_in(c)
            if r:
                return r
        return None

    node = find_in(tree)
    assert node is not None and sorted(node["detail"]["values"]) == ["de", "fr"]
