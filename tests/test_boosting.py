"""BoostingQuery (the Elasticsearch ``boosting`` query / Lucene
queries-module BoostingQuery analog — EXTENSION; the reference's boolean
occurs are MUST/SHOULD only, /root/reference/query/boolean_query.go).

Contract under test: the match set is EXACTLY the positive query's;
docs also matching the negative query keep membership but score
``positive_score * negative_boost``. The negative side is filter
context — it contributes no score of its own, under either scorer."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.percolate import percolate, register_queries
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.parser import (
    AllQuery,
    BooleanQuery,
    BoostingQuery,
    PrefixQuery,
    QueryParseError,
    RangeQuery,
    TermQuery,
    parse_query,
    MUST,
    SHOULD,
)
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark", "query", "score"]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    s.add_numeric_field("year")
    return s


@pytest.fixture(scope="module")
def boost_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("boostidx") / "idx")
    docs = [
        {
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 5)),
            "year": 2000 + i % 10,
        }
        for i in range(50)
    ]
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(docs)),
        _schema(),
        idx,
        num_partitions=3,
        order_col="k",
        id_cols=["k"],
    )
    return idx


def _hits(spark, idx, q, **kw):
    mf = load_manifest(idx)
    df, _ = search(spark, idx, q, limit=None, manifest=mf, **kw)
    dm = attach_docmap(spark, idx, df, manifest=mf)
    return {r["k"]: r["score"] for r in dm.select("k", "score").collect()}


def _logical(idx, text):
    return parse_query(text, load_manifest(idx).schema)


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_boosting_bruteforce(spark, boost_idx, scorer):
    pos = _logical(boost_idx, "content:spark")
    neg = _logical(boost_idx, "content:merge")
    base = _hits(spark, boost_idx, pos, scorer=scorer)
    negs = set(_hits(spark, boost_idx, neg, scorer=scorer))
    got = _hits(spark, boost_idx, BoostingQuery(pos, neg, 0.3), scorer=scorer)
    assert set(got) == set(base)  # membership never shrinks
    assert negs & set(base)  # the demotion actually fires on someone
    for k, s in got.items():
        want = base[k] * (0.3 if k in negs else 1.0)
        assert abs(s - want) < 1e-9


def test_boosting_absent_negative_is_positive(spark, boost_idx):
    pos = _logical(boost_idx, "content:spark")
    neg = _logical(boost_idx, "content:zzznothere")
    assert _hits(spark, boost_idx, BoostingQuery(pos, neg, 0.1)) == _hits(
        spark, boost_idx, pos
    )


def test_boosting_negative_docvalue_range(spark, boost_idx):
    """The negative side may be a doc-value predicate: its match set
    rides the aux cogroup through the wire's ``demote`` key."""
    pos = _logical(boost_idx, "content:spark")
    neg = RangeQuery(1, 2000, 2004)  # year in [2000, 2004]
    base = _hits(spark, boost_idx, pos)
    got = _hits(spark, boost_idx, BoostingQuery(pos, neg, 0.5))
    assert set(got) == set(base)
    demoted = 0
    for k, s in got.items():
        if 2000 <= 2000 + k % 10 <= 2004:
            assert abs(s - base[k] * 0.5) < 1e-9
            demoted += 1
        else:
            assert abs(s - base[k]) < 1e-9
    assert demoted > 0


def test_boosting_inside_boolean_and_multiterm_negative(spark, boost_idx):
    """Composes as a clause of a BooleanQuery; a multi-term negative
    (prefix) dictionary-expands through the same rewrite as forward
    queries."""
    pos = _logical(boost_idx, "content:spark")
    bq = BoostingQuery(pos, PrefixQuery(0, "mer"), 0.25)
    wrapped = BooleanQuery([(MUST, bq), (SHOULD, _logical(boost_idx, "content:query"))])
    base = _hits(spark, boost_idx, pos)
    negs = set(_hits(spark, boost_idx, _logical(boost_idx, "content:merge")))
    should = _hits(spark, boost_idx, _logical(boost_idx, "content:query"))
    got = _hits(spark, boost_idx, wrapped)
    assert set(got) == set(base)
    for k, s in got.items():
        want = base[k] * (0.25 if k in negs else 1.0) + should.get(k, 0.0)
        assert abs(s - want) < 1e-9


def test_boosting_batched_identity(spark, boost_idx):
    pos = _logical(boost_idx, "content:spark")
    neg = _logical(boost_idx, "content:merge")
    bq = BoostingQuery(pos, neg, 0.4)
    mf = load_manifest(boost_idx)
    many = search_many(
        spark, boost_idx, {"b": bq, "p": pos}, limit=None, manifest=mf
    )
    got = {
        r["k"]: r["score"]
        for r in attach_docmap(
            spark, boost_idx, many.filter("query_id = 'b'"), manifest=mf
        ).select("k", "score").collect()
    }
    single = _hits(spark, boost_idx, bq)
    assert got.keys() == single.keys()
    for k in got:
        assert abs(got[k] - single[k]) < 1e-9


def test_boosting_percolation_matches_positive(spark):
    """Percolation is membership-only, so a boosting subscription
    matches exactly the docs its positive side matches."""
    schema = Schema()
    schema.add_text_field("text", "default")
    docs = spark.createDataFrame(
        [(0, "spark merge"), (1, "spark query"), (2, "merge only")],
        "doc_key long, text string",
    )
    bq = BoostingQuery(TermQuery(0, "spark"), TermQuery(0, "merge"), 0.2)
    nested = BooleanQuery([(MUST, bq), (SHOULD, TermQuery(0, "query"))])
    pq = register_queries({"flat": bq, "nested": nested}, schema)
    got = {}
    for r in percolate(spark, docs, pq, schema, id_col="doc_key").collect():
        got.setdefault(r["query_id"], set()).add(r["doc_key"])
    assert got["flat"] == {0, 1}
    assert got["nested"] == {0, 1}


def test_boosting_validation(spark, boost_idx):
    t = TermQuery(0, "spark")
    with pytest.raises(QueryParseError, match="negative_boost"):
        BoostingQuery(t, t, -0.1)
    with pytest.raises(QueryParseError, match="positive and a negative"):
        BoostingQuery(t, None)
    with pytest.raises(ValueError, match="AllQuery"):
        _hits(spark, boost_idx, BoostingQuery(AllQuery(), t, 0.5))
