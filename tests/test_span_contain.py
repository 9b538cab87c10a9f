"""SpanContainingQuery / SpanWithinQuery — Lucene SpanContaining /
SpanWithin analogs (ES span_containing / span_within) over fixed-width
exact-span operands (term or exact adjacent phrase): containing emits
big spans holding >= 1 little span, within emits little spans inside
>= 1 big span. tf = emitted span count; idf = sum of ALL constituent
terms' idfs (both sides — the Lucene weight merges both term states).
Oracle: pure-Python span enumeration over the fixture."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search
from ostrich_spark.query.parser import (
    QueryParseError,
    SpanContainingQuery,
    SpanWithinQuery,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "fast stream join fast stream"},
    {"doc_id": 1, "text": "stream fast stream plan"},
    {"doc_id": 2, "text": "fast join stream"},
    {"doc_id": 3, "text": "stream stream fast"},
    {"doc_id": 4, "text": "fast stream"},
]
N = len(DOCS)
K1, B = 1.2, 0.75
LENS = {d["doc_id"]: len(d["text"].split()) for d in DOCS}
AVGDL = sum(LENS.values()) / N


def _spans(doc_id, terms):
    """Start positions of the exact adjacent chain ``terms`` in a doc."""
    toks = DOCS[doc_id]["text"].split()
    k = len(terms)
    return [
        s for s in range(len(toks) - k + 1)
        if all(toks[s + i] == terms[i] for i in range(k))
    ]


def _df(term):
    return sum(1 for d in DOCS if term in d["text"].split())


def _idf(df, scorer):
    if scorer == "tfidf":
        return 1.0 + math.log(N / (1.0 + df))
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def _expected(big, little, emit, scorer="tfidf"):
    kb, kl = len(big), len(little)
    idf = sum(_idf(_df(t), scorer) for t in big + little)
    out = {}
    for d in range(N):
        bs, ls = _spans(d, big), _spans(d, little)
        if emit == "big":
            tf = sum(1 for s in bs if any(s <= x <= s + kb - kl for x in ls))
        else:
            tf = sum(1 for x in ls if any(s <= x <= s + kb - kl for s in bs))
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
def scx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spancontain") / "idx")
    s = Schema()
    s.add_text_field("text", "default", positions=True)
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


BIG = ("fast", "stream")


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_containing_hand_identity(spark, scx, scorer):
    got = _hits(spark, scx, SpanContainingQuery(0, BIG, "stream"), scorer)
    want = _expected(BIG, ("stream",), "big", scorer)
    assert set(got) == set(want) == {0, 1, 4}
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)
    # doc0 has TWO containing big spans -> tf 2 outranks the tf-1 docs
    if scorer == "tfidf":
        assert got[0] == pytest.approx(2 * got[4], rel=1e-9)


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_within_hand_identity(spark, scx, scorer):
    got = _hits(spark, scx, SpanWithinQuery(0, BIG, "stream"), scorer)
    want = _expected(BIG, ("stream",), "little", scorer)
    assert set(got) == set(want) == {0, 1, 4}
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_within_excludes_uncovered_little(spark, scx):
    """doc1 holds stream@0 (uncovered) and stream@2 (inside [1,2]):
    within counts ONLY the covered occurrence — tf 1, not 2."""
    got = _hits(spark, scx, SpanWithinQuery(0, BIG, "stream"))
    idf = sum(_idf(_df(t), "tfidf") for t in ("fast", "stream", "stream"))
    assert got[1] == pytest.approx(1 * idf, rel=1e-9)


def test_equal_width_operands(spark, scx):
    """kb == kl: containment = identical extent. Distinct terms never
    share a position -> empty; a term trivially contains itself with
    tf = its occurrence count and DOUBLED idf (both sides sum)."""
    assert _hits(spark, scx, SpanContainingQuery(0, "fast", "stream")) == {}
    got = _hits(spark, scx, SpanContainingQuery(0, "stream", "stream"))
    idf2 = 2 * _idf(_df("stream"), "tfidf")
    want = {
        d["doc_id"]: d["text"].split().count("stream") * idf2
        for d in DOCS
        if "stream" in d["text"].split()
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_little_wider_than_big_and_absent_terms(spark, scx):
    """kl > kb can never be contained (CEmpty at lowering); any absent
    constituent term (either side) also lowers to CEmpty."""
    assert _hits(spark, scx, SpanContainingQuery(0, "fast", BIG)) == {}
    assert _hits(spark, scx, SpanContainingQuery(0, BIG, "zzznope")) == {}
    assert _hits(spark, scx, SpanWithinQuery(0, ("zzz", "stream"), "stream")) == {}


def test_batched_row_identity(spark, scx):
    """search_many evaluates the span family in ONE job, row-identical
    per query to the individual path (shared rid namespace, one scan)."""
    from ostrich_spark.query.exec import search_many
    from ostrich_spark.query.parser import SpanOrQuery

    qs = {
        "containing": SpanContainingQuery(0, BIG, "stream"),
        "within": SpanWithinQuery(0, BIG, "stream"),
        "union": SpanOrQuery(0, ("fast", "plan")),
    }
    batched = search_many(spark, scx, qs, limit=None)
    for qid, q in qs.items():
        single, _ = search(spark, scx, q, limit=None)
        want = {
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in single.collect()
        }
        got = {
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in batched.filter(batched.query_id == qid).collect()
        }
        assert got == want, qid


def test_explain_and_validation(spark, scx):
    res, _ = search(spark, scx, SpanContainingQuery(0, BIG, "stream"), limit=1)
    row = res.collect()[0]
    ex = explain(
        spark, scx, SpanContainingQuery(0, BIG, "stream"),
        row["segment_id"], row["doc"],
    )
    assert ex["kind"] == "span_contain" and ex["matched"]
    assert ex["score"] == pytest.approx(row["score"], rel=1e-9)
    assert ex["detail"]["emit"] == "big"
    with pytest.raises(QueryParseError):
        SpanContainingQuery(0, (), "x")
    with pytest.raises(QueryParseError):
        SpanWithinQuery(0, ("ok", ""), "x")
