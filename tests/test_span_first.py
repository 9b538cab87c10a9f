"""SpanFirstQuery — Lucene SpanFirstQuery / ES span_first analog
(EXTENSION, programmatic-only): term occurrences restricted to
positions < end; tf = in-window count; scored with the term's own idf.
Hand-computed tf/idf anchors over a corpus with known token layouts."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search, search_many
from ostrich_spark.query.parser import (
    BooleanQuery,
    QueryParseError,
    SpanFirstQuery,
    TermQuery,
)
from ostrich_spark.schema import Schema

DOCS = [
    # positions:      0     1     2      3
    {"doc_id": 0, "text": "spark query merge spark"},   # spark at 0 and 3
    {"doc_id": 1, "text": "query merge spark"},          # spark at 2
    {"doc_id": 2, "text": "merge spark"},                # spark at 1
    {"doc_id": 3, "text": "query merge policy window"},  # no spark
    {"doc_id": 4, "text": "spark spark spark other"},    # spark at 0,1,2
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def sf_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spanf") / "idx")
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


def test_span_first_membership_and_tf(spark, sf_index):
    """end=2: only occurrences at positions 0 or 1 match; tf counts
    in-window occurrences only."""
    got = _hits(spark, sf_index, SpanFirstQuery(0, "spark", 2))
    assert set(got) == {0, 2, 4}  # doc1's spark is at pos 2, doc3 none
    # idf of 'spark': df=4 over N=5 docs
    idf = 1.0 + math.log(5.0 / (1.0 + 4.0))
    assert got[0] == pytest.approx(1 * idf, rel=1e-12)  # pos-3 hit excluded
    assert got[2] == pytest.approx(1 * idf, rel=1e-12)
    assert got[4] == pytest.approx(2 * idf, rel=1e-12)  # pos 0 and 1


def test_span_first_window_sweep(spark, sf_index):
    """end=1 keeps only position-0 occurrences; a huge end equals the
    plain term query (score-identical)."""
    got1 = _hits(spark, sf_index, SpanFirstQuery(0, "spark", 1))
    assert set(got1) == {0, 4}
    idf = 1.0 + math.log(5.0 / (1.0 + 4.0))
    assert got1[0] == pytest.approx(idf, rel=1e-12)
    assert got1[4] == pytest.approx(idf, rel=1e-12)
    wide = _hits(spark, sf_index, SpanFirstQuery(0, "spark", 1000))
    term = _hits(spark, sf_index, TermQuery(0, "spark"))
    assert wide == pytest.approx(term)


def test_span_first_in_boolean_and_batched(spark, sf_index):
    """Composes in boolean trees; search_many row-identical to the
    per-query path."""
    q = BooleanQuery.intersection(
        SpanFirstQuery(0, "spark", 2), TermQuery(0, "merge")
    )
    got = _hits(spark, sf_index, q)
    assert set(got) == {0, 2}
    batched = search_many(spark, sf_index, {"sf": q}, limit=None).collect()
    b = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in batched}
    res, _ = search(spark, sf_index, q, limit=None)
    s = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in res.collect()}
    assert b == s and b


def test_span_first_bm25_and_absent_term(spark, sf_index):
    got = _hits(spark, sf_index, SpanFirstQuery(0, "spark", 2), scorer="bm25")
    assert set(got) == {0, 2, 4}
    # absent term -> empty
    assert _hits(spark, sf_index, SpanFirstQuery(0, "zzz", 3)) == {}


def test_span_first_explain_and_validation(spark, sf_index):
    res, _ = search(spark, sf_index, SpanFirstQuery(0, "spark", 2), limit=1)
    row = res.collect()[0]
    ex = explain(
        spark, sf_index, SpanFirstQuery(0, "spark", 2),
        row["segment_id"], row["doc"],
    )
    assert ex["kind"] == "span_first" and ex["matched"]
    assert ex["detail"]["end"] == 2 and ex["detail"]["terms"] == ["spark"]
    assert ex["score"] == pytest.approx(row["score"], rel=1e-12)
    with pytest.raises(QueryParseError, match="end"):
        SpanFirstQuery(0, "spark", 0)
    with pytest.raises(QueryParseError, match="empty term"):
        SpanFirstQuery(0, "", 2)


def test_span_first_needs_positions(spark, tmp_path):
    s = Schema()
    s.add_text_field("text", "default", positions=False)
    idx = str(tmp_path / "nopos")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
        idx,
        num_partitions=1,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    res, _ = search(spark, idx, SpanFirstQuery(0, "spark", 2), limit=None)
    with pytest.raises(Exception, match="positions"):
        res.collect()
