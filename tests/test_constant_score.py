"""ConstantScoreQuery — ES constant_score / Lucene ConstantScoreQuery
analog: the wrapped query's MATCH SET at a stamped constant. Distinct
from the FILTER occur (constant 0.0): this is the "category boost"
shape. Oracle: membership identity + exact constants."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search, search_many
from ostrich_spark.query.parser import (
    SHOULD,
    AllQuery,
    BooleanQuery,
    ConstantScoreQuery,
    QueryParseError,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "spark join stream"},
    {"doc_id": 1, "text": "spark spark index"},
    {"doc_id": 2, "text": "merge policy"},
    {"doc_id": 3, "text": "join plan"},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    return s


@pytest.fixture(scope="module")
def csx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("constscore") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        _schema(),
        idx,
        num_partitions=2,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    return idx


def _hits(spark, idx, q, scorer="tfidf"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("doc_id", "score").collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_membership_and_constant(spark, csx):
    """Same match set as the inner query; every score is exactly the
    boost — tf differences (doc1 tf=2) vanish."""
    inner = parse_query("text:spark OR text:join", _schema())
    got = _hits(spark, csx, ConstantScoreQuery(inner, 2.5))
    want = _hits(spark, csx, inner)
    assert set(got) == set(want) == {0, 1, 3}
    assert all(s == 2.5 for s in got.values())
    # bm25 mode: inner scorer choice is irrelevant, constant either way
    got_b = _hits(spark, csx, ConstantScoreQuery(inner, 2.5), scorer="bm25")
    assert got_b == got


def test_should_composition(spark, csx):
    """SHOULD-composed beside organic relevance: score = constant +
    the scoring clause where both match (the category-boost shape)."""
    const = ConstantScoreQuery(TermQuery(0, "join"), 3.0)
    organic = TermQuery(0, "spark")
    got = _hits(spark, csx, BooleanQuery([(SHOULD, const), (SHOULD, organic)]))
    sp = _hits(spark, csx, organic)
    want = {0: 3.0 + sp[0], 1: sp[1], 3: 3.0}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_empty_inner_nested_collapse_and_all_rejected(spark, csx):
    assert _hits(spark, csx, ConstantScoreQuery(TermQuery(0, "zzz"), 2.0)) == {}
    nested = ConstantScoreQuery(ConstantScoreQuery(TermQuery(0, "join"), 9.9), 1.5)
    got = _hits(spark, csx, nested)
    assert all(s == 1.5 for s in got.values()) and set(got) == {0, 3}
    with pytest.raises(QueryParseError):
        ConstantScoreQuery(AllQuery(), 2.0)


def test_multiterm_inner_expands(spark, csx):
    """A prefix inside constant_score expands against the dictionary
    like anywhere else (the has_multiterm/rewrite recursion), then the
    whole expanded union stamps the constant."""
    from ostrich_spark.query.parser import PrefixQuery

    got = _hits(spark, csx, ConstantScoreQuery(PrefixQuery(0, "sp"), 7.0))
    want = _hits(spark, csx, PrefixQuery(0, "sp"))
    assert set(got) == set(want) == {0, 1}
    assert all(s == 7.0 for s in got.values())


def test_batched_explain_percolate(spark, csx):
    q = ConstantScoreQuery(TermQuery(0, "join"), 4.0)
    batched = search_many(spark, csx, {"c": q}, limit=None)
    single, _ = search(spark, csx, q, limit=None)
    got = {(r["segment_id"], r["doc"], r["score"]) for r in batched.collect()}
    want = {(r["segment_id"], r["doc"], r["score"]) for r in single.collect()}
    assert got == want
    res = single.collect()[0]
    ex = explain(spark, csx, q, res["segment_id"], res["doc"])
    assert ex["kind"] == "const_score" and ex["score"] == 4.0
    assert ex["children"][0]["kind"] == "term"
    # percolation: membership = the inner query's
    from ostrich_spark.percolate import percolate, register_queries

    schema = _schema()
    docs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in DOCS], "doc_key long, text string"
    )
    pq = register_queries({"cs": q}, schema)
    got = {r["doc_key"] for r in percolate(spark, docs, pq, schema,
                                           id_col="doc_key").collect()}
    assert got == {0, 3}
