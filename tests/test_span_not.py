"""SpanNotQuery — Lucene SpanNotQuery / ES span_not analog over term
spans: include-term occurrences surviving unless an exclude-term
occurrence sits in [p - pre, p + post]. Multiple excludes behave as
spanNot(include, spanOr(excludes)). tf = surviving occurrences; idf
stays the include term's own full-df idf (SpanWeight convention), so
an ineffective exclusion is score-identical to the plain term query.
Oracle: hand-counted positions over the fixture below."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search, search_many
from ostrich_spark.query.parser import (
    BooleanQuery,
    QueryParseError,
    SpanNotQuery,
    TermQuery,
)
from ostrich_spark.schema import Schema

DOCS = [
    # positions:      0     1     2     3
    {"doc_id": 0, "text": "bank river bank loan"},   # bank@0 (river@1 post), bank@2 (river@1 pre)
    {"doc_id": 1, "text": "bank loan rate deal"},    # bank@0 clean
    {"doc_id": 2, "text": "river bank creek bank"},  # bank@1 (both sides), bank@3 (creek@2 pre)
    {"doc_id": 3, "text": "loan bank bank loan"},    # bank@1, bank@2 both clean
    {"doc_id": 4, "text": "river creek loan"},       # no include term
]
N = len(DOCS)


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def snx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spannot") / "idx")
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


# df(bank) = 4 over N=5 -> the include term's idf, used by EVERY variant
IDF = 1.0 + math.log(5 / (1.0 + 4))


def test_membership_tf_and_scores_hand_counted(spark, snx):
    """pre=post=1, exclude river: survivors hand-counted per doc."""
    got = _hits(spark, snx, SpanNotQuery(0, "bank", ("river",), pre=1, post=1))
    # doc0: bank@0 has river@1 in [0-1,0+1] -> out; bank@2 river@1 in [1,3] -> out
    # doc1: bank@0 clean -> tf 1
    # doc2: bank@1 river@0 -> out; bank@3 river@0 not in [2,4]... river@0 < 2 -> CLEAN
    # doc3: bank@1, bank@2 clean -> tf 2
    assert set(got) == {1, 2, 3}
    assert got[1] == pytest.approx(1 * IDF, rel=1e-9)
    assert got[2] == pytest.approx(1 * IDF, rel=1e-9)
    assert got[3] == pytest.approx(2 * IDF, rel=1e-9)


def test_multiple_excludes_spanor(spark, snx):
    """exclude (river, creek) = spanNot(bank, spanOr(river, creek))."""
    got = _hits(
        spark, snx, SpanNotQuery(0, "bank", ("river", "creek"), pre=1, post=1)
    )
    # doc2's bank@3 now has creek@2 in [2,4] -> out; everything river killed stays out
    assert set(got) == {1, 3}
    assert got[3] == pytest.approx(2 * IDF, rel=1e-9)


def test_pre_post_zero_is_overlap_only(spark, snx):
    """pre=post=0: only same-position overlap rejects — term spans never
    share a position, so every occurrence survives and the score equals
    the plain term query exactly."""
    got = _hits(spark, snx, SpanNotQuery(0, "bank", ("river",)))
    want = _hits(spark, snx, TermQuery(0, "bank"))
    assert got == want


def test_asymmetric_pre_post(spark, snx):
    """pre rejects excludes BEFORE the include; post rejects after."""
    # post=1 only: doc0 bank@0 (river@1 after) out, bank@2 survives;
    # doc2 bank@1 has river@0 BEFORE only -> survives
    got = _hits(spark, snx, SpanNotQuery(0, "bank", ("river",), pre=0, post=1))
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == pytest.approx(1 * IDF, rel=1e-9)
    assert got[2] == pytest.approx(2 * IDF, rel=1e-9)
    # pre=1 only: doc0 bank@2 (river@1 before) out, bank@0 survives;
    # doc2 bank@1 out (river@0 before), bank@3 survives
    got = _hits(spark, snx, SpanNotQuery(0, "bank", ("river",), pre=1, post=0))
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == pytest.approx(1 * IDF, rel=1e-9)
    assert got[2] == pytest.approx(1 * IDF, rel=1e-9)


def test_absent_exclude_lowers_to_plain_term(spark, snx):
    """Exclude terms missing from the corpus drop at lowering; all
    missing = bit-identical to the plain TermQuery, both scorers."""
    for scorer in ("tfidf", "bm25"):
        got = _hits(
            spark, snx,
            SpanNotQuery(0, "bank", ("zzzabsent",), pre=5, post=5),
            scorer=scorer,
        )
        want = _hits(spark, snx, TermQuery(0, "bank"), scorer=scorer)
        assert got == want
    # absent INCLUDE term -> empty
    assert _hits(spark, snx, SpanNotQuery(0, "zzz", ("bank",))) == {}


def test_boolean_composition_and_batched_identity(spark, snx):
    """span_not composes in boolean trees and rides search_many
    row-identically to the single-query path."""
    q = BooleanQuery([
        ("must", SpanNotQuery(0, "bank", ("river",), pre=1, post=1)),
        ("should", TermQuery(0, "loan")),
    ])
    single = _hits(spark, snx, q)
    assert set(single) == {1, 2, 3}
    res = search_many(spark, snx, {"q": q}, limit=None)
    rows = attach_docmap(spark, snx, res.drop("query_id")).select(
        "doc_id", "score"
    ).collect()
    assert {r["doc_id"]: r["score"] for r in rows} == single


def test_explain_and_validation(spark, snx):
    res, _ = search(
        spark, snx, SpanNotQuery(0, "bank", ("river",), pre=1, post=2),
        limit=1,
    )
    row = res.collect()[0]
    tree = explain(
        spark, snx, SpanNotQuery(0, "bank", ("river",), pre=1, post=2),
        row["segment_id"], int(row["doc"]),
    )
    import json

    s = json.dumps(tree)
    assert '"span_not"' in s and '"pre": 1' in s and '"post": 2' in s
    assert '"exclude": ["river"]' in s
    assert tree["score"] == pytest.approx(row["score"], rel=1e-9)
    with pytest.raises(QueryParseError, match="exclude"):
        SpanNotQuery(0, "bank", ())
    with pytest.raises(QueryParseError, match="pre"):
        SpanNotQuery(0, "bank", ("river",), pre=-1)
    with pytest.raises(QueryParseError, match="empty term"):
        SpanNotQuery(0, "", ("river",))


def test_positions_required(spark, tmp_path):
    s = Schema()
    s.add_text_field("text", "default", positions=False)
    idx = str(tmp_path / "nopos")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, idx,
        num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    with pytest.raises(Exception, match="positions"):
        _hits(spark, idx, SpanNotQuery(0, "bank", ("river",), pre=1, post=1))
