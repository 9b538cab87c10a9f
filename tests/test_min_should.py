"""minimumShouldMatch (Lucene/ES analog): BooleanQuery.at_least(m, ...)
keeps docs matched by >= m SHOULD clauses; boundary identities m=1 ==
union and m=k == intersection; required-should semantics beside MUST."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.parser import (
    MUST,
    SHOULD,
    BooleanQuery,
    QueryParseError,
    TermQuery,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_key": 0, "text": "spark join window"},
    {"doc_key": 1, "text": "spark join"},
    {"doc_key": 2, "text": "spark"},
    {"doc_key": 3, "text": "join window"},
    {"doc_key": 4, "text": "window"},
    {"doc_key": 5, "text": "nothing here"},
]

T = lambda t: TermQuery(0, t)
TERMS = ["spark", "join", "window"]


@pytest.fixture(scope="module")
def ms_index(spark, tmp_path_factory):
    schema = Schema()
    schema.add_text_field("text", "default")
    idx = str(tmp_path_factory.mktemp("ms") / "idx")
    build_index(
        spark,
        spark.createDataFrame(DOCS),
        schema,
        idx,
        num_partitions=2,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    return idx


def _hits(spark, idx, logical):
    res, _ = search(spark, idx, logical, limit=None)
    rows = attach_docmap(spark, idx, res).select("doc_key", "score").collect()
    return {r["doc_key"]: r["score"] for r in rows}


def test_min_should_counts(spark, ms_index):
    q2 = BooleanQuery.at_least(2, *[T(t) for t in TERMS])
    got = _hits(spark, ms_index, q2)
    # docs with >= 2 of {spark, join, window}: 0 (3), 1 (2), 3 (2)
    assert set(got) == {0, 1, 3}


def test_min_should_1_equals_union(spark, ms_index):
    u = _hits(spark, ms_index, BooleanQuery.union(*[T(t) for t in TERMS]))
    m1 = _hits(spark, ms_index, BooleanQuery.at_least(1, *[T(t) for t in TERMS]))
    assert u == m1


def test_min_should_k_equals_intersection(spark, ms_index):
    a = _hits(spark, ms_index, BooleanQuery.intersection(*[T(t) for t in TERMS]))
    mk = _hits(spark, ms_index, BooleanQuery.at_least(3, *[T(t) for t in TERMS]))
    assert set(a) == set(mk)
    for k in a:
        assert mk[k] == pytest.approx(a[k], rel=1e-12)


def test_min_should_scores_sum_matching_only(spark, ms_index):
    q2 = BooleanQuery.at_least(2, *[T(t) for t in TERMS])
    got = _hits(spark, ms_index, q2)
    # doc 1 matches spark+join; its score must equal the union score of
    # exactly those two clauses on the same index (same dfs)
    two = _hits(spark, ms_index, BooleanQuery.union(T("spark"), T("join")))
    assert got[1] == pytest.approx(two[1], rel=1e-12)


def test_min_should_beside_must_is_required(spark, ms_index):
    # MUST spark AND >= 2 of {join, window, nothing}: doc 0 only
    q = BooleanQuery(
        [(MUST, T("spark")), (SHOULD, T("join")), (SHOULD, T("window")),
         (SHOULD, T("nothing"))],
        min_should=2,
    )
    got = _hits(spark, ms_index, q)
    assert set(got) == {0}
    # score = spark + join + window (doc 0 lacks 'nothing')
    u = _hits(
        spark, ms_index,
        BooleanQuery.union(T("spark"), T("join"), T("window")),
    )
    assert got[0] == pytest.approx(u[0], rel=1e-12)


def test_min_should_unsatisfiable_is_empty(spark, ms_index):
    # absent terms cannot count toward m
    q = BooleanQuery.at_least(2, T("spark"), T("absentterm"))
    assert _hits(spark, ms_index, q) == {}
    # m greater than the clause count
    q = BooleanQuery.at_least(4, *[T(t) for t in TERMS])
    assert _hits(spark, ms_index, q) == {}


def test_min_should_validation():
    with pytest.raises(QueryParseError, match="min_should"):
        BooleanQuery.at_least(0, TermQuery(0, "x"))


def test_min_should_batched_identity(spark, ms_index):
    q2 = BooleanQuery.at_least(2, *[T(t) for t in TERMS])
    batched = search_many(spark, ms_index, {"m2": q2}, limit=None).collect()
    got = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in batched}
    res, _ = search(spark, ms_index, q2, limit=None)
    single = {
        (r["segment_id"], r["doc"], round(r["score"], 9)) for r in res.collect()
    }
    assert got == single and got


def test_min_should_percentage_end_to_end(spark, ms_index):
    """'67%' of 3 SHOULD clauses floors to 2 — identical hits/scores to
    the literal at_least(2, ...) form through the real engine."""
    pct = BooleanQuery([(SHOULD, T(t)) for t in TERMS], min_should="67%")
    assert pct.min_should == 2
    lit = BooleanQuery.at_least(2, *[T(t) for t in TERMS])
    got, want = _hits(spark, ms_index, pct), _hits(spark, ms_index, lit)
    assert set(got) == set(want) == {0, 1, 3}
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_default_operator_and_end_to_end(spark, ms_index):
    """search(default_operator='and') requires every bare word — the ES
    query_string default_operator=AND behavior on a live index."""
    res, _ = search(
        spark, ms_index, "text:spark text:join", limit=None,
        default_operator="and",
    )
    rows = attach_docmap(spark, ms_index, res).collect()
    assert {r["doc_key"] for r in rows} == {0, 1}
    # default stays implicit OR
    res, _ = search(spark, ms_index, "text:spark text:join", limit=None)
    rows = attach_docmap(spark, ms_index, res).collect()
    assert {r["doc_key"] for r in rows} == {0, 1, 2, 3}


def test_match_bool_prefix_end_to_end(spark, ms_index):
    """ES match_bool_prefix: tokens become SHOULD terms, the LAST token
    a prefix — unordered autocomplete. 'window sp' matches docs with
    'window' OR an sp*-term anywhere (no positions, no order)."""
    from ostrich_spark.query.parser import (
        BooleanQuery,
        PrefixQuery,
        parse_match_bool_prefix,
    )
    from ostrich_spark.schema import Schema

    schema = Schema()
    schema.add_text_field("text", "default")
    q = parse_match_bool_prefix("window sp", schema, "text")
    # construction golden: SHOULD term 'window' + SHOULD prefix 'sp'
    assert isinstance(q, BooleanQuery)
    assert [(o, type(c).__name__) for o, c in q.subqueries] == [
        ("should", "TermQuery"), ("should", "PrefixQuery")
    ]
    got = _hits(spark, ms_index, q)
    # window: docs 0,3,4; sp* (spark): 0,1,2 -> union, ORDER-FREE
    assert set(got) == {0, 1, 2, 3, 4}
    # score identity with the manual composition
    manual = _hits(spark, ms_index, BooleanQuery(
        [("should", TermQuery(0, "window")), ("should", PrefixQuery(0, "sp"))]
    ))
    assert got == manual
    # operator=and: every clause required
    got = _hits(
        spark, ms_index,
        parse_match_bool_prefix("window sp", schema, "text", operator="and"),
    )
    assert set(got) == {0}
    # single token input = bare prefix
    q1 = parse_match_bool_prefix("sp", schema, "text")
    assert isinstance(q1, PrefixQuery)
    # min_should spec form
    got = _hits(
        spark, ms_index,
        parse_match_bool_prefix("window join sp", schema, "text", min_should=2),
    )
    # need >= 2 of {window, join, sp*}: docs 0(3),1(2),3(2)
    assert set(got) == {0, 1, 3}


def test_match_bool_prefix_validation(spark):
    from ostrich_spark.query.parser import EmptyQuery, parse_match_bool_prefix
    from ostrich_spark.schema import Schema

    schema = Schema()
    schema.add_text_field("text", "default")
    schema.add_numeric_field("year")
    with pytest.raises(QueryParseError, match="text field"):
        parse_match_bool_prefix("a b", schema, "year")
    assert isinstance(parse_match_bool_prefix("   ", schema, "text"), EmptyQuery)
    with pytest.raises(QueryParseError, match="operator"):
        parse_match_bool_prefix("a b", schema, "text", operator="xor")
