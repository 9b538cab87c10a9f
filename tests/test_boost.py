"""Per-clause boost (``clause^2``) — Lucene boost analog, an EXTENSION
beyond the reference grammar (/root/reference/query/parser.go has no
boost token; ``^`` is a tokenizer separator so no indexed term contains
it). The boost folds into idf at compile time (plan.compile_query), so
these tests pin:

1. parser goldens for every clause kind (term/phrase/prefix/fuzzy/bare);
2. score LINEARITY: score(q^b) == b * score(q), exact doc-set identity,
   under both TF-IDF and BM25;
3. WAND == exhaustive under boosts (bounds scale with idf, stay safe);
4. batched path (search_many) row-identity when the same term appears
   boosted and unboosted in one batch (exercises the boost-stripped
   stats dedup in plan.collect_terms).
"""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import search, search_many
from ostrich_spark.query.plan import SCORER_BM25, SCORER_TFIDF
from ostrich_spark.query.parser import (
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    parse_query,
    SHOULD,
)
from ostrich_spark.schema import Schema


def _schema():
    s = Schema()
    s.add_text_field("title", "default")
    s.add_text_field("body", "default")
    return s


# --- parser goldens ---


def test_boost_field_term():
    assert parse_query("title:Hello^2", _schema()) == TermQuery(0, "hello", 2.0)


def test_boost_fractional():
    assert parse_query("title:Hello^0.25", _schema()) == TermQuery(0, "hello", 0.25)


def test_boost_bare_term_distributes_over_default_fields():
    q = parse_query("Hello^2", _schema())
    assert q.subqueries == [
        (SHOULD, TermQuery(0, "Hello", 2.0)),
        (SHOULD, TermQuery(1, "Hello", 2.0)),
    ]


def test_boost_phrase():
    assert parse_query('title:"big data"^1.5', _schema()) == PhraseQuery(
        0, ("big", "data"), 1.5
    )


def test_boost_prefix_and_fuzzy():
    assert parse_query("title:spar*^2", _schema()) == PrefixQuery(0, "spar", boost=2.0)
    assert parse_query("title:spark~1^3", _schema()) == FuzzyQuery(
        0, "spark", max_dist=1, boost=3.0
    )


def test_caret_inside_quotes_is_not_a_boost():
    # 'foo^2' inside quotes analyzes ("^" separates) -> phrase [foo, 2]
    assert parse_query('title:"foo^2"', _schema()) == PhraseQuery(0, ("foo", "2"), 1.0)


def test_caret_without_number_stays_literal():
    # bare term containing '^' but no numeric suffix: unchanged reference
    # behavior (unanalyzed bare term, can never match an indexed term)
    q = parse_query("a^b", _schema())
    assert q.subqueries[0] == (SHOULD, TermQuery(0, "a^b"))


def test_boost_only_last_suffix():
    # 'a^2^3' -> base 'a^2' (still a dead bare term), boost 3
    q = parse_query("a^2^3", _schema())
    assert q.subqueries[0] == (SHOULD, TermQuery(0, "a^2", 3.0))


def test_boost_in_boolean():
    q = parse_query("title:a^2 AND body:b", _schema())
    assert q.subqueries[0][1] == TermQuery(0, "a", 2.0)
    assert q.subqueries[1][1] == TermQuery(1, "b", 1.0)


# --- end-to-end score semantics ---


@pytest.fixture(scope="module")
def boost_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("boostidx") / "idx")
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
    return sorted(
        (r["segment_id"], r["doc"], r["score"]) for r in df.collect()
    )


@pytest.mark.parametrize("scorer", [SCORER_TFIDF, SCORER_BM25])
def test_score_linearity_single_term(spark, boost_idx, scorer):
    base = _hits(spark, boost_idx, "content:merge", scorer=scorer)
    boosted = _hits(spark, boost_idx, "content:merge^2.5", scorer=scorer)
    assert len(base) > 0 and len(base) == len(boosted)
    for (s1, d1, sc1), (s2, d2, sc2) in zip(base, boosted):
        assert (s1, d1) == (s2, d2)
        assert sc2 == pytest.approx(2.5 * sc1, rel=1e-12)


def test_boost_one_is_identical(spark, boost_idx):
    assert _hits(spark, boost_idx, "content:merge^1") == _hits(
        spark, boost_idx, "content:merge"
    )


def test_boost_changes_or_ranking(spark, boost_idx):
    """In an OR, boosting one side must shift the blend toward it:
    top-1 under heavy boost on X is a doc matching X."""
    df, _ = search(spark, boost_idx, "content:merge^100 OR content:spark", limit=1)
    top = df.collect()[0]
    merge_docs = {(r[0], r[1]) for r in _hits(spark, boost_idx, "content:merge")}
    assert (top["segment_id"], top["doc"]) in merge_docs


@pytest.mark.parametrize("scorer", [SCORER_TFIDF, SCORER_BM25])
def test_wand_identical_to_exhaustive_with_boosts(spark, boost_idx, scorer):
    q = "content:merge^3 OR content:spark OR content:query^0.5"
    a = _hits(spark, boost_idx, q, scorer=scorer, use_wand=True)
    b = _hits(spark, boost_idx, q, scorer=scorer, use_wand=False)
    assert a == b


def test_prefix_boost_linearity(spark, boost_idx):
    base = _hits(spark, boost_idx, "content:s*")
    boosted = _hits(spark, boost_idx, "content:s*^2")
    assert len(base) > 0 and len(base) == len(boosted)
    for (s1, d1, sc1), (s2, d2, sc2) in zip(base, boosted):
        assert (s1, d1) == (s2, d2)
        assert sc2 == pytest.approx(2.0 * sc1, rel=1e-12)


def test_batched_mixed_boosts_row_identical(spark, boost_idx):
    queries = {
        "plain": "content:merge",
        "boosted": "content:merge^2",
        "blend": "content:merge^2 OR content:spark",
    }
    many = search_many(spark, boost_idx, queries, limit=None)
    rows = many.collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append(
            (r["segment_id"], r["doc"], r["score"])
        )
    for qid, q in queries.items():
        assert sorted(by_qid.get(qid, [])) == _hits(spark, boost_idx, q)
