"""terms_lookup — ES terms-lookup mechanism (exec.terms_lookup): a
TermsQuery whose values come from another document's stored field.

Design under test:
- multi-value lookup from a store=True field (newline round-trip of a
  list input) filters exactly the docs carrying one of those tags;
- keyword lookup yields the single value; cross-index lookup;
- missing doc / NULL value → EmptyQuery (matches nothing);
- max_terms guard; non-keyword target / bad lookup field rejections;
- composes in FILTER context with score invariance.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search, terms_lookup
from ostrich_spark.query.parser import (
    FILTER, MUST, BooleanQuery, EmptyQuery, TermQuery, TermsQuery,
)
from ostrich_spark.schema import Schema


@pytest.fixture(scope="module")
def tl_idx(spark, tmp_path_factory):
    """Main index: docs with a keyword tag; lookup index: per-user
    followed-tags doc (list input → newline-joined stored value)."""
    tmp = tmp_path_factory.mktemp("tl")
    s = Schema()
    s.add_text_field("content", "default")
    s.add_keyword_field("tag")
    main = str(tmp / "main")
    docs = [
        {"k": i, "content": f"post number {i} spark",
         "tag": ["red", "green", "blue", "cyan"][i % 4] if i % 9 else None}
        for i in range(40)
    ]
    build_index(
        spark, spark.createDataFrame(docs, "k long, content string, tag string"),
        s, main, num_partitions=2, order_col="k", id_cols=["k"],
    )
    s2 = Schema()
    s2.add_text_field("follows", "default", store=True)
    s2.add_keyword_field("fav")
    lk = str(tmp / "lookup")
    udocs = [
        {"u": 1, "follows": ["red", "blue"], "fav": "green"},
        {"u": 2, "follows": [], "fav": None},
        {"u": 3, "follows": None, "fav": "red"},
    ]
    build_index(
        spark,
        spark.createDataFrame(udocs, "u long, follows array<string>, fav string"),
        s2, lk, num_partitions=1, order_col="u", id_cols=["u"],
    )
    return main, lk


def _ks(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    return {r["k"] for r in attach_docmap(spark, idx, res).collect()}


def test_multivalue_lookup_filters(spark, tl_idx):
    main, lk = tl_idx
    q = terms_lookup(
        spark, main, "tag", 1, "u", "follows", lookup_index=lk
    )
    assert isinstance(q, TermsQuery) and set(q.values) == {"red", "blue"}
    got = _ks(spark, main, q)
    assert got == {
        i for i in range(40)
        if i % 9 and ["red", "green", "blue", "cyan"][i % 4] in ("red", "blue")
    }


def test_keyword_lookup_and_filter_compose(spark, tl_idx):
    main, lk = tl_idx
    q = terms_lookup(spark, main, "tag", 1, "u", "fav", lookup_index=lk)
    assert isinstance(q, TermsQuery) and q.values == ("green",)
    base = {}
    res, _ = search(spark, main, "content:spark", limit=None)
    for r in attach_docmap(spark, main, res).collect():
        base[r["k"]] = r["score"]
    composed = BooleanQuery([
        (MUST, TermQuery(0, "spark")), (FILTER, q),
    ])
    res, _ = search(spark, main, composed, limit=None)
    rows = attach_docmap(spark, main, res).collect()
    assert {r["k"] for r in rows} == {
        i for i in range(40)
        if i % 9 and ["red", "green", "blue", "cyan"][i % 4] == "green"
    }
    for r in rows:
        assert r["score"] == base[r["k"]]


def test_missing_doc_and_empty_values(spark, tl_idx):
    main, lk = tl_idx
    # user 2 follows nothing; user 3's follows is NULL; user 99 absent
    for key in (2, 3, 99):
        q = terms_lookup(
            spark, main, "tag", key, "u", "follows", lookup_index=lk
        )
        assert isinstance(q, EmptyQuery)
        assert _ks(spark, main, q) == set()


def test_validation(spark, tl_idx):
    main, lk = tl_idx
    with pytest.raises(ValueError, match="keyword field"):
        terms_lookup(spark, main, "content", 1, "u", "follows", lookup_index=lk)
    with pytest.raises(ValueError, match="lookup field"):
        terms_lookup(spark, main, "tag", 1, "u", "nope", lookup_index=lk)
    with pytest.raises(ValueError, match="max_terms"):
        terms_lookup(
            spark, main, "tag", 1, "u", "follows", lookup_index=lk,
            max_terms=1,
        )
