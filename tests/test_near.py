"""Unordered proximity — NearQuery (SpanNearQuery inOrder=false analog).

Contract (parser.NearQuery): end position q (an occurrence of ANY
constituent) matches iff EVERY constituent occurs in [q-(k-1+slop), q]
of the same doc; tf = distinct end positions; idf = sum of constituent
idfs. Engine checked bit-tight against a brute-force matcher, plus the
subset relation vs the ordered sloppy phrase.
"""

import math

import pytest

from ostrich_spark.analysis import get_analyzer
from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.parser import (
    EmptyQuery,
    NearQuery,
    PhraseQuery,
    QueryParseError,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "text": "spark streaming pipeline with stream joins"},
    {"k": 1, "text": "spark stream processing"},
    {"k": 2, "text": "stream spark strange"},
    {"k": 3, "text": "spark strange stream spark streaming"},
    {"k": 4, "text": "apache spark batch"},
    {"k": 5, "text": "stream of words then much later spark appears here"},
    {"k": 6, "text": "window stream window spark window stream"},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("near") / "idx")
    build_index(
        spark, spark.createDataFrame(DOCS), _schema(), path,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    return path


def _hits(spark, idx, query, scorer="tfidf"):
    res, _ = search(spark, idx, query, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("k", "score").collect()
    return sorted((r["k"], r["score"]) for r in rows)


def _brute(terms, slop, scorer="tfidf", docs=DOCS):
    an = get_analyzer("default")
    toks = {d["k"]: an.analyze_one(d["text"]) for d in docs}
    n = len(docs)
    uniq = list(dict.fromkeys(terms))
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in uniq}
    if any(df[t] == 0 for t in terms):
        return []
    if scorer == "tfidf":
        idf = lambda d: 1.0 + math.log(n / (1.0 + d))  # noqa: E731
    else:
        idf = lambda d: math.log(1.0 + (n - d + 0.5) / (d + 0.5))  # noqa: E731
    idf_sum = sum(idf(df[t]) for t in terms)  # sum over AS-GIVEN terms
    bound = len(uniq) - 1 + slop
    avgdl = sum(len(ts) for ts in toks.values()) / n
    out = {}
    for key, ts in toks.items():
        ends = set()
        for q, tok in enumerate(ts):
            if tok not in uniq:
                continue
            if all(
                any(p <= q and q - p <= bound for p, t2 in enumerate(ts) if t2 == t)
                for t in uniq
            ):
                ends.add(q)
        if ends:
            tf = len(ends)
            if scorer == "tfidf":
                out[key] = tf * idf_sum
            else:
                dl = len(ts)
                out[key] = idf_sum * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
    return sorted(out.items())


def test_parse_shapes():
    s = _schema()
    assert parse_query('text:"spark stream"~2u', s) == NearQuery(
        0, ("spark", "stream"), slop=2
    )
    assert parse_query('"spark stream"~3u', s) == NearQuery(
        0, ("spark", "stream"), slop=3
    )
    # ordered form unchanged
    q = parse_query('text:"spark stream"~2', s)
    assert isinstance(q, PhraseQuery) and q.slop == 2
    # degenerate forms
    assert parse_query('text:"spark"~2u', s) == TermQuery(0, "spark")
    assert isinstance(parse_query('text:"  "~2u', s), EmptyQuery)
    with pytest.raises(QueryParseError, match="do not compose"):
        parse_query('text:"spark str*"~2u', s)


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize("slop", [0, 1, 3, 8])
def test_engine_matches_brute_force(spark, idx, scorer, slop):
    got = _hits(spark, idx, f'text:"stream spark"~{slop}u', scorer)
    want = _brute(("stream", "spark"), slop, scorer=scorer)
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_three_terms(spark, idx):
    got = _hits(spark, idx, 'text:"stream spark window"~3u')
    want = _brute(("stream", "spark", "window"), 3)
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)
    assert got  # doc 6 at least


def test_unordered_superset_of_ordered(spark, idx):
    """Every doc an ordered sloppy phrase matches, NEAR matches at the
    same slop (the ordered window is one of the unordered ones)."""
    for slop in (0, 2, 5):
        ordered = {k for k, _ in _hits(spark, idx, f'text:"spark stream"~{slop}')}
        near = {k for k, _ in _hits(spark, idx, f'text:"spark stream"~{slop}u')}
        assert ordered <= near
    # and it is a STRICT superset somewhere: doc 2 has "stream spark"
    assert 2 in {k for k, _ in _hits(spark, idx, 'text:"spark stream"~0u')}
    assert 2 not in {k for k, _ in _hits(spark, idx, 'text:"spark stream"~0')}


def test_window_excludes_far_apart(spark, idx):
    """Doc 5 has both terms 6 apart: matched at slop>=5 (bound k-1+5=6),
    not below."""
    assert 5 not in {k for k, _ in _hits(spark, idx, 'text:"stream spark"~4u')}
    assert 5 in {k for k, _ in _hits(spark, idx, 'text:"stream spark"~5u')}


def test_absent_term_matches_nothing(spark, idx):
    assert _hits(spark, idx, 'text:"spark zzz"~3u') == []


def test_in_boolean_composition(spark, idx):
    got = _hits(spark, idx, 'text:"stream spark"~1u AND text:strange')
    near = dict(_hits(spark, idx, 'text:"stream spark"~1u'))
    term = dict(_hits(spark, idx, "text:strange"))
    want = sorted(
        (k, near[k] + term[k]) for k in near.keys() & term.keys()
    )
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_batched_identity(spark, idx):
    queries = {"n": 'text:"stream spark"~2u', "t": "text:spark"}
    batched = search_many(spark, idx, queries, limit=None)
    got = {}
    for r in batched.select("query_id", "segment_id", "doc", "score").collect():
        got.setdefault(r["query_id"], []).append(
            (r["segment_id"], r["doc"], round(r["score"], 9))
        )
    for qid, q in queries.items():
        res, _ = search(spark, idx, q, limit=None)
        want = [
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in res.select("segment_id", "doc", "score").collect()
        ]
        assert sorted(got.get(qid, [])) == sorted(want)


def test_explain_shows_near(spark, idx):
    from ostrich_spark.query.exec import explain

    res, _ = search(spark, idx, 'text:"stream spark"~2u', limit=1)
    hit = res.select("segment_id", "doc").collect()[0]
    tree = explain(spark, idx, 'text:"stream spark"~2u', hit["segment_id"], hit["doc"])
    assert tree["kind"] == "near" and tree["matched"]
    assert tree["detail"]["in_order"] is False
