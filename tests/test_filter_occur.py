"""FILTER occur (Lucene BooleanClause.Occur.FILTER analog) — EXTENSION:
the reference defines only MUST/SHOULD
(/root/reference/query/boolean_query.go:10-58). A FILTER clause
constrains the match set exactly like MUST but contributes nothing to
the score — the standard shape for structured predicates alongside
relevance clauses. Programmatic-only (grammar stays
reference-identical), like MUST_NOT."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import search, search_many
from ostrich_spark.query.parser import (
    BooleanQuery,
    TermQuery,
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
)
from ostrich_spark.query.plan import CEmpty, CFilter, compile_query
from ostrich_spark.schema import Schema


@pytest.fixture(scope="module")
def filt_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("filtidx") / "idx")
    schema = Schema()
    schema.add_text_field("content", "default")
    words = ["merge", "policy", "segment", "index", "spark", "query", "score"]
    docs = [
        {"k": i, "content": " ".join(words[j % len(words)] for j in range(i, i + 6))}
        for i in range(60)
    ]
    df = spark.createDataFrame(pd.DataFrame(docs))
    build_index(spark, df, schema, idx, num_partitions=4, order_col="k", id_cols=["k"])
    return idx


def _hits(spark, idx, q, **kw):
    df, _ = search(spark, idx, q, limit=None, **kw)
    return sorted((r["segment_id"], r["doc"], r["score"]) for r in df.collect())


def test_filter_same_docs_as_must_scores_from_base_only(spark, filt_idx):
    as_must = _hits(
        spark,
        filt_idx,
        BooleanQuery([(MUST, TermQuery(0, "merge")), (MUST, TermQuery(0, "spark"))]),
    )
    as_filter = _hits(
        spark,
        filt_idx,
        BooleanQuery([(MUST, TermQuery(0, "merge")), (FILTER, TermQuery(0, "spark"))]),
    )
    merge_scores = {
        (s, d): sc for s, d, sc in _hits(spark, filt_idx, TermQuery(0, "merge"))
    }
    assert [(s, d) for s, d, _ in as_must] == [(s, d) for s, d, _ in as_filter]
    assert len(as_filter) > 0
    # FILTER: score comes from the scoring clause alone
    assert all(merge_scores[(s, d)] == sc for s, d, sc in as_filter)
    # MUST: both clauses score, so at least one doc differs
    assert any(merge_scores[(s, d)] != sc for s, d, sc in as_must)


def test_pure_filter_constant_zero_score(spark, filt_idx):
    hits = _hits(spark, filt_idx, BooleanQuery([(FILTER, TermQuery(0, "merge"))]))
    base = _hits(spark, filt_idx, TermQuery(0, "merge"))
    assert [(s, d) for s, d, _ in hits] == [(s, d) for s, d, _ in base]
    assert all(sc == 0.0 for _, _, sc in hits)


def test_empty_filter_kills_conjunction(spark, filt_idx):
    hits = _hits(
        spark,
        filt_idx,
        BooleanQuery([(MUST, TermQuery(0, "merge")), (FILTER, TermQuery(0, "zzz"))]),
    )
    assert hits == []


def test_filter_with_should_does_not_unwrap(spark, filt_idx):
    """A single SHOULD + one FILTER must NOT unwrap to the bare should:
    the filter still constrains."""
    hits = _hits(
        spark,
        filt_idx,
        BooleanQuery([(SHOULD, TermQuery(0, "merge")), (FILTER, TermQuery(0, "spark"))]),
    )
    both = _hits(
        spark,
        filt_idx,
        BooleanQuery([(MUST, TermQuery(0, "merge")), (MUST, TermQuery(0, "spark"))]),
    )
    assert [(s, d) for s, d, _ in hits] == [(s, d) for s, d, _ in both]


def test_filter_composes_with_must_not(spark, filt_idx):
    q = BooleanQuery(
        [
            (MUST, TermQuery(0, "merge")),
            (FILTER, TermQuery(0, "spark")),
            (MUST_NOT, TermQuery(0, "policy")),
        ]
    )
    hits = _hits(spark, filt_idx, q)
    filtered = {
        (s, d)
        for s, d, _ in _hits(
            spark,
            filt_idx,
            BooleanQuery(
                [(MUST, TermQuery(0, "merge")), (FILTER, TermQuery(0, "spark"))]
            ),
        )
    }
    excluded = {(s, d) for s, d, _ in _hits(spark, filt_idx, TermQuery(0, "policy"))}
    assert {(s, d) for s, d, _ in hits} == filtered - excluded


def test_filtering_helper():
    q = BooleanQuery.filtering(TermQuery(0, "a"), TermQuery(0, "b"), TermQuery(0, "c"))
    assert q.subqueries == [
        (MUST, TermQuery(0, "a")),
        (FILTER, TermQuery(0, "b")),
        (FILTER, TermQuery(0, "c")),
    ]


def test_compile_shapes():
    stats = {(0, "a"): 5, (0, "b"): 3}
    c = compile_query(
        BooleanQuery([(MUST, TermQuery(0, "a")), (FILTER, TermQuery(0, "b"))]),
        stats,
        100,
        {0: 10.0},
    )
    assert isinstance(c, CFilter) and c.base is not None
    c2 = compile_query(
        BooleanQuery([(FILTER, TermQuery(0, "b"))]), stats, 100, {0: 10.0}
    )
    assert isinstance(c2, CFilter) and c2.base is None
    # pure-negative still rejected even though filters branch exists
    c3 = compile_query(
        BooleanQuery([(MUST_NOT, TermQuery(0, "a"))]), stats, 100, {0: 10.0}
    )
    assert isinstance(c3, CEmpty)


def test_filter_in_batched_path(spark, filt_idx):
    q = BooleanQuery([(MUST, TermQuery(0, "merge")), (FILTER, TermQuery(0, "spark"))])
    many = search_many(spark, filt_idx, {"f": q}, limit=None)
    rows = sorted(
        (r["segment_id"], r["doc"], r["score"]) for r in many.collect()
    )
    assert rows == _hits(spark, filt_idx, q)
