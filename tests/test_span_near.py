"""SpanNearQuery — Lucene SpanNearQuery(inOrder=true) / ES span_near
analog. In this engine the sloppy phrase ALREADY implements the
in-order span window contract (strictly increasing chain, width <=
k-1+slop — a documented difference from Lucene's edit-distance
PhraseQuery slop, which can transpose at slop >= 2), so SpanNearQuery
is an exact alias lowering to the same compiled phrase node. These
tests pin (a) the alias identity, (b) the in-order contract itself with
hand-computed anchors the sloppy-phrase suite doesn't cover (3-clause
chains, duplicate clauses), and (c) the in_order=true/false ES mapping
(SpanNearQuery vs NearQuery) on a reversed-order document."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search, search_many
from ostrich_spark.query.parser import (
    BooleanQuery,
    NearQuery,
    PhraseQuery,
    QueryParseError,
    SpanNearQuery,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    # positions:      0     1     2     3
    {"doc_id": 0, "text": "hash join query"},            # adjacent, in order
    {"doc_id": 1, "text": "join hash"},                  # REVERSED only
    {"doc_id": 2, "text": "hash merge policy join"},     # in order, gap 2
    {"doc_id": 3, "text": "hash join hash join"},        # two adjacent matches
    {"doc_id": 4, "text": "query merge"},                # neither term pair
    {"doc_id": 5, "text": "hash hash join"},             # duplicate clause fodder
]
N = len(DOCS)


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def sn_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spann") / "idx")
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


# df(hash) = df(join) = 5 over N=6 -> idf = 1 + ln(6/6) = 1.0 each
IDF_SUM = 2.0


def test_ordered_membership_tf_and_scores(spark, sn_index):
    got = _hits(spark, sn_index, SpanNearQuery(0, ("hash", "join"), slop=0))
    # doc0 width 1; doc3 ends at join@1 and join@3 (chain from hash@2);
    # doc5 join@2 with hash@1; doc1 reversed, doc2 gap 2, doc4 absent
    assert set(got) == {0, 3, 5}
    assert got[0] == pytest.approx(1 * IDF_SUM, rel=1e-12)
    assert got[3] == pytest.approx(2 * IDF_SUM, rel=1e-12)
    assert got[5] == pytest.approx(1 * IDF_SUM, rel=1e-12)


def test_alias_identity_with_sloppy_phrase(spark, sn_index):
    """The lowering contract: span_near(in_order=true) IS the sloppy
    phrase, bit-identical scores at every slop, both scorers."""
    for slop in (0, 1, 2, 50):
        for scorer in ("tfidf", "bm25"):
            a = _hits(spark, sn_index,
                      SpanNearQuery(0, ("hash", "join"), slop=slop), scorer)
            b = _hits(spark, sn_index,
                      PhraseQuery(0, ("hash", "join"), slop=slop), scorer)
            assert a == pytest.approx(b), (slop, scorer)
    # and through NQL: ~2o == ~2
    assert _hits(spark, sn_index, 'text:"hash join"~2o') == pytest.approx(
        _hits(spark, sn_index, 'text:"hash join"~2')
    )


def test_in_order_true_vs_false_on_reversal(spark, sn_index):
    """The ES in_order mapping: the ordered span never accepts the
    reversed doc1 at ANY slop; the unordered NearQuery does at slop 0."""
    assert 1 not in _hits(
        spark, sn_index, SpanNearQuery(0, ("hash", "join"), slop=50)
    )
    near = _hits(spark, sn_index, NearQuery(0, ("hash", "join"), slop=0))
    assert 1 in near
    got2 = _hits(spark, sn_index, SpanNearQuery(0, ("hash", "join"), slop=2))
    assert set(got2) == {0, 2, 3, 5}  # slop widens (doc2's gap-2 pair)...
    assert got2[2] == pytest.approx(1 * IDF_SUM, rel=1e-12)


def test_three_clause_chain(spark, sn_index):
    """The window DP must thread hash < merge < join across 4 tokens."""
    q0 = _hits(spark, sn_index,
               SpanNearQuery(0, ("hash", "merge", "join"), slop=0))
    assert q0 == {}  # doc2 width 3 > k-1 = 2
    q1 = _hits(spark, sn_index,
               SpanNearQuery(0, ("hash", "merge", "join"), slop=1))
    idf3 = 2.0 + 1.0 + math.log(6.0 / 3.0)  # df(merge)=2 -> 1+ln(6/3)
    assert set(q1) == {2}
    assert q1[2] == pytest.approx(1 * idf3, rel=1e-12)


def test_duplicate_clause_needs_distinct_occurrences(spark, sn_index):
    got = _hits(spark, sn_index, SpanNearQuery(0, ("hash", "hash"), slop=0))
    # doc5 hash@0,hash@1 adjacent; doc3 hash@0,hash@2 is width 2 > 1
    assert set(got) == {5}
    assert got[5] == pytest.approx(1 * IDF_SUM, rel=1e-12)
    got2 = _hits(spark, sn_index, SpanNearQuery(0, ("hash", "hash"), slop=1))
    assert set(got2) == {3, 5}


def test_nql_parse_and_rejections(spark, sn_index):
    q = parse_query('text:"hash join"~1o', _schema())
    assert q == SpanNearQuery(0, ("hash", "join"), slop=1)
    bare = parse_query('"hash join"~1o', _schema(), default_fields=["text"])
    assert bare == SpanNearQuery(0, ("hash", "join"), slop=1)
    # degenerate single-term span collapses to a term query
    assert parse_query('text:"hash"~2o', _schema()) == TermQuery(0, "hash")
    with pytest.raises(QueryParseError, match="do not compose"):
        parse_query('text:"hash jo*"~1o', _schema())


def test_boolean_batched_and_explain(spark, sn_index):
    q = BooleanQuery.intersection(
        SpanNearQuery(0, ("hash", "join"), slop=2), TermQuery(0, "merge")
    )
    got = _hits(spark, sn_index, q)
    assert set(got) == {2}
    batched = search_many(spark, sn_index, {"sn": q}, limit=None).collect()
    b = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in batched}
    res, _ = search(spark, sn_index, q, limit=None)
    s = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in res.collect()}
    assert b == s and b
    # explain shows the LOWERED node (the alias is gone by plan time)
    res, _ = search(spark, sn_index, SpanNearQuery(0, ("hash", "join"), slop=0),
                    limit=1)
    row = res.collect()[0]
    ex = explain(
        spark, sn_index, SpanNearQuery(0, ("hash", "join"), slop=0),
        row["segment_id"], row["doc"],
    )
    assert ex["kind"] == "phrase" and ex["matched"]
    assert ex["detail"]["slop"] == 0
    assert ex["score"] == pytest.approx(row["score"], rel=1e-12)


def test_absent_term_and_needs_positions(spark, sn_index, tmp_path):
    assert _hits(spark, sn_index, SpanNearQuery(0, ("hash", "zzz"), slop=3)) == {}
    s = Schema()
    s.add_text_field("text", "default", positions=False)
    idx = str(tmp_path / "nopos")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, idx,
        num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    res, _ = search(spark, idx, SpanNearQuery(0, ("hash", "join"), slop=0),
                    limit=None)
    with pytest.raises(Exception, match="positions"):
        res.collect()
