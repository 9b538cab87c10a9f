"""Phrase queries over positions-enabled postings.

Covers: quote-aware parsing, phrase scoring semantics (tf = occurrence
count, idf = sum of constituent idfs), phrase inside boolean combinators,
positions surviving a segment merge bit-identically, and the actionable
error on a positions-less index.
"""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    BooleanQuery,
    EmptyQuery,
    PhraseQuery,
    QueryParseError,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "content": "the quick brown fox jumps over the lazy dog"},
    {"k": 1, "content": "quick brown foxes are not lazy brown fox"},
    {"k": 2, "content": "brown quick fox"},  # wrong order: no phrase
    {"k": 3, "content": "quick brown quick brown fox fox quick brown fox"},
    {"k": 4, "content": "nothing relevant here"},
]


@pytest.fixture(scope="module")
def phrase_schema():
    s = Schema()
    s.add_text_field("content", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, phrase_schema):
    d = str(tmp_path_factory.mktemp("phrase") / "idx")
    df = spark.createDataFrame(pd.DataFrame(DOCS))
    build_index(
        spark, df, phrase_schema, d, num_partitions=2, order_col="k", id_cols=["k"]
    )
    return d


def _hits(spark, idx, q, scorer="tfidf"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    return sorted(
        (r["k"], round(r["score"], 4))
        for r in attach_docmap(spark, idx, res).select("k", "score").collect()
    )


# --- parsing ---------------------------------------------------------------


def test_parse_quoted_phrase(phrase_schema):
    q = parse_query('content:"quick brown fox"', phrase_schema)
    assert q == PhraseQuery(0, ("quick", "brown", "fox"))


def test_parse_single_term_quote_degenerates(phrase_schema):
    assert parse_query('content:"fox"', phrase_schema) == TermQuery(0, "fox")


def test_parse_empty_quote(phrase_schema):
    assert isinstance(parse_query('content:""', phrase_schema), EmptyQuery)


def test_parse_bare_phrase_expands_default_fields(phrase_schema):
    q = parse_query('"quick brown"', phrase_schema)
    assert q == PhraseQuery(0, ("quick", "brown"))


def test_parse_phrase_in_boolean(phrase_schema):
    q = parse_query('content:"quick brown" AND content:dog', phrase_schema)
    assert isinstance(q, BooleanQuery)
    kinds = [type(sub).__name__ for _, sub in q.subqueries]
    assert kinds == ["PhraseQuery", "TermQuery"]


def test_parse_unclosed_quote(phrase_schema):
    with pytest.raises(QueryParseError, match="unclosed"):
        parse_query('content:"quick brown', phrase_schema)


def test_parens_inside_quotes_are_literal(phrase_schema):
    # quotes suppress paren splitting; the default analyzer then strips
    # the parens as non-word chars -> a plain 2-term phrase
    q = parse_query('content:"(quick brown)"', phrase_schema)
    assert q == PhraseQuery(0, ("quick", "brown"))


# --- scoring semantics (hand-computed; N=5, idf = 1 + ln(N/(1+df))) --------


def test_phrase_tf_and_idf_sum(spark, idx):
    # df(quick)=df(brown)=df(fox)=4 -> idf=1.0 each; doc0 tf=1, doc3 tf=2
    assert _hits(spark, idx, 'content:"quick brown fox"') == [(0, 3.0), (3, 6.0)]


def test_phrase_order_sensitive(spark, idx):
    # doc2 has all three terms but in the wrong order
    ks = [k for k, _ in _hits(spark, idx, 'content:"quick brown fox"')]
    assert 2 not in ks


def test_phrase_in_and(spark, idx):
    got = _hits(spark, idx, 'content:"brown fox" AND content:lazy')
    assert [k for k, _ in got] == [0, 1]


def test_phrase_or_term_union(spark, idx):
    got = dict(_hits(spark, idx, 'content:"quick brown fox" OR content:dog'))
    assert got[3] == 6.0
    assert got[0] == pytest.approx(3.0 + (1 + __import__("math").log(5 / 2)), abs=1e-4)


def test_phrase_bm25_runs(spark, idx):
    got = _hits(spark, idx, 'content:"quick brown"', scorer="bm25")
    assert [k for k, _ in got] == [0, 1, 3]
    # doc3 (3 occurrences, shortest relative dl impact) outranks doc0/1
    scores = dict(got)
    assert scores[3] > scores[0]


def test_phrase_with_count(spark, idx):
    _, cnt = search(spark, idx, 'content:"quick brown"', limit=0, with_count=True)
    assert cnt == 3


def test_phrase_absent_constituent_is_empty(spark, idx):
    res, _ = search(spark, idx, 'content:"quick zebra"', limit=None)
    assert res.count() == 0


# --- merge preserves positions --------------------------------------------


def test_merge_preserves_positions(spark, tmp_path, phrase_schema):
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.merge import merge_segments

    d = str(tmp_path / "idx")
    df = spark.createDataFrame(pd.DataFrame(DOCS))
    build_index(
        spark, df, phrase_schema, d, num_partitions=3, order_col="k", id_cols=["k"]
    )
    before = _hits(spark, d, 'content:"quick brown fox"')
    mf = load_manifest(d)
    merge_segments(spark, d, [s.segment_id for s in mf.segments], "merged-pos")
    after = _hits(spark, d, 'content:"quick brown fox"')
    assert after == before
    assert len(load_manifest(d).segments) == 1


# --- positions-less index errors clearly ----------------------------------


def test_phrase_without_positions_raises(spark, tmp_path):
    s = Schema()
    s.add_text_field("content", "default")  # positions=False
    d = str(tmp_path / "nopos")
    df = spark.createDataFrame(pd.DataFrame(DOCS))
    build_index(spark, df, s, d, num_partitions=2, order_col="k", id_cols=["k"])
    with pytest.raises(Exception, match="positions"):
        res, _ = search(spark, d, 'content:"quick brown"', limit=None)
        res.collect()


def test_merge_shard_patch_path_preserves_positions(spark, tmp_path, phrase_schema):
    """shard_threshold=0 forces EVERY term through the map-only shard
    patch path (the big-term skew route) — positions must survive it
    identically to the group-merge route."""
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.merge import merge_segments

    d = str(tmp_path / "idx")
    df = spark.createDataFrame(pd.DataFrame(DOCS))
    build_index(
        spark, df, phrase_schema, d, num_partitions=3, order_col="k", id_cols=["k"]
    )
    before = _hits(spark, d, 'content:"quick brown fox"')
    mf = load_manifest(d)
    merge_segments(
        spark, d, [s.segment_id for s in mf.segments], "merged-shard",
        shard_threshold=0,
    )
    assert _hits(spark, d, 'content:"quick brown fox"') == before
    # sharded rows really exist (multiple rows per term across doc ranges)
    import pyarrow.dataset as ds

    pos_rows = ds.dataset(
        f"{d}/segments/merged-shard/postings.parquet", format="parquet"
    ).to_table(columns=["term", "row_ord"])
    terms = pos_rows.column("term").to_pylist()
    assert len(terms) > len(set(terms))  # at least one term sharded
