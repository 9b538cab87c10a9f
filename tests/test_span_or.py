"""SpanOrQuery — Lucene SpanOrQuery analog over term clauses (ES
span_or): matches docs containing ANY clause term; tf = TOTAL
occurrences of all the terms (sloppy freq = matching span count),
idf = sum of the present terms' idfs, ONE scorer over the summed tf —
a different saturation than BooleanQuery-SHOULD's per-term score sum.
Oracle: hand recomputation over the fixture."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import QueryParseError, SpanOrQuery, TermQuery
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "fast stream query stream"},
    {"doc_id": 1, "text": "fast fast engine"},
    {"doc_id": 2, "text": "query plan"},
    {"doc_id": 3, "text": "other words"},
]
N = len(DOCS)
K1, B = 1.2, 0.75
LENS = {0: 4, 1: 3, 2: 2, 3: 2}
AVGDL = sum(LENS.values()) / N


def _tf(term, d):
    return DOCS[d]["text"].split().count(term)


def _df(term):
    return sum(1 for d in DOCS if term in d["text"].split())


def _idf(df, scorer):
    if scorer == "tfidf":
        return 1.0 + math.log(N / (1.0 + df))
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def _expected(terms, scorer):
    present = [t for t in terms if _df(t) > 0]
    if not present:
        return {}
    idf = sum(_idf(_df(t), scorer) for t in present)
    out = {}
    for d in range(N):
        tf = sum(_tf(t, d) for t in present)
        if not tf:
            continue
        if scorer == "tfidf":
            out[d] = tf * idf
        else:
            dl = LENS[d]
            out[d] = idf * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / AVGDL)
            )
    return out


@pytest.fixture(scope="module")
def sox(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spanor") / "idx")
    s = Schema()
    s.add_text_field("text", "default")  # no positions needed — tf sums
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
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


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_summed_tf_hand_identity(spark, sox, scorer):
    got = _hits(spark, sox, SpanOrQuery(0, ("fast", "stream")), scorer)
    want = _expected(("fast", "stream"), scorer)
    assert set(got) == set(want) == {0, 1}
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)
    # summed-tf saturation differs from SHOULD's per-term score sum:
    # doc0 (1+2 occurrences) and doc1 (2) rank by total occurrences
    if scorer == "tfidf":
        assert got[0] > got[1]


def test_single_and_absent_terms(spark, sox):
    """One surviving clause == the bare TermQuery (exact scores);
    absent terms drop from the union; all-absent matches nothing."""
    one = _hits(spark, sox, SpanOrQuery(0, ("fast",)))
    bare = _hits(spark, sox, TermQuery(0, "fast"))
    assert one == bare
    dropped = _hits(spark, sox, SpanOrQuery(0, ("fast", "zzznope")))
    assert dropped == bare
    assert _hits(spark, sox, SpanOrQuery(0, ("zzz", "yyy"))) == {}


def test_duplicate_terms_dedupe(spark, sox):
    """A term listed twice contributes once (dict.fromkeys dedupe at
    lowering — Lucene dedupes identical clauses in rewrite)."""
    got = _hits(spark, sox, SpanOrQuery(0, ("fast", "fast", "stream")))
    want = _hits(spark, sox, SpanOrQuery(0, ("fast", "stream")))
    assert got == want


def test_percolation_membership_identity(spark):
    """Percolation normalizes span_or to the OR of its terms (summed-tf
    scoring changes scores, not membership)."""
    from ostrich_spark.percolate import percolate, register_queries
    from ostrich_spark.schema import Schema

    schema = Schema()
    schema.add_text_field("text", "default")
    docs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in DOCS], "doc_key long, text string"
    )
    pq = register_queries({"so": SpanOrQuery(0, ("fast", "plan"))}, schema)
    got = {r["doc_key"] for r in percolate(spark, docs, pq, schema,
                                           id_col="doc_key").collect()}
    assert got == {0, 1, 2}  # fast in 0/1, plan in 2


def test_validation():
    with pytest.raises(QueryParseError):
        SpanOrQuery(0, ())
    with pytest.raises(QueryParseError):
        SpanOrQuery(0, ("ok", ""))
