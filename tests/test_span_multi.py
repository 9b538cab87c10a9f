"""SpanMultiQuery — Lucene SpanMultiTermQueryWrapper / ES ``span_multi``
analog (EXTENSION, programmatic-only like the rest of the span family).

Contract under test: a wrapped prefix/fuzzy/wildcard/regexp query's
dictionary expansion behaves as span-term alternatives —

- standalone: rewrites to SpanOrQuery over the expansion (Lucene's
  SpanOrTermsRewrite), bit-identical to the hand-built SpanOrQuery;
- span_first term / span_not include: spanFirst(spanOr(...)) union —
  tf = in-window occurrences of ANY alternative, idf = sum of present
  alternatives' idfs;
- span_not exclude entries: expansion splices into the exclude union
  (membership-only);
- expansion honors the inner query's max_expansions cap (df DESC,
  term ASC), empty expansions lower to EmptyQuery, an exclude that
  expands to nothing lowers the include to its SpanOr form.
"""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, explain, search, search_many
from ostrich_spark.query.multi import search_multi
from ostrich_spark.query.parser import (
    PrefixQuery,
    QueryParseError,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanMultiQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    WildcardQuery,
)
from ostrich_spark.query.plan import compile_query
from ostrich_spark.schema import Schema

DOCS = [
    # positions:      0       1      2      3
    {"doc_id": 0, "text": "merge policy window merged"},
    {"doc_id": 1, "text": "merging fast merge"},
    {"doc_id": 2, "text": "window query other"},
    {"doc_id": 3, "text": "merge merge zebra"},
    {"doc_id": 4, "text": "merges merged"},
]
# dictionary for prefix "merg": merge df=3, merged df=2, merges df=1,
# merging df=1 -> cap order (df DESC, term ASC):
MERG_EXPANSION = ("merge", "merged", "merges", "merging")
N = 5


def _idf(df):
    return 1.0 + math.log(N / (1.0 + df))


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def sm_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spanm") / "idx")
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


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_standalone_rewrites_to_span_or(spark, sm_index, scorer):
    """span_multi(prefix merg*) is bit-identical to the hand-built
    SpanOrQuery over the expansion, on both scorers."""
    got = _hits(
        spark, sm_index, SpanMultiQuery(PrefixQuery(0, "merg")), scorer=scorer
    )
    want = _hits(spark, sm_index, SpanOrQuery(0, MERG_EXPANSION), scorer=scorer)
    assert set(got) == {0, 1, 3, 4}
    assert got == want  # bit-identity: same rewrite order, same sums


def test_standalone_hand_scores(spark, sm_index):
    """tf = total occurrences of any expansion; idf = sum of the present
    expansions' idfs, summed in cap order (df DESC, term ASC)."""
    got = _hits(spark, sm_index, SpanMultiQuery(PrefixQuery(0, "merg")))
    idf_sum = _idf(3) + _idf(2) + _idf(1) + _idf(1)
    # doc0: merge+merged; doc1: merging+merge; doc3: merge x2; doc4: merges+merged
    for d in (0, 1, 3, 4):
        assert got[d] == pytest.approx(2 * idf_sum, rel=1e-12)


def test_expansion_cap_df_desc_term_asc(spark, sm_index):
    """max_expansions=2 keeps merge (df 3) and merged (df 2) only."""
    got = _hits(
        spark, sm_index,
        SpanMultiQuery(PrefixQuery(0, "merg", max_expansions=2)),
    )
    idf_sum = _idf(3) + _idf(2)
    assert set(got) == {0, 1, 3, 4}
    assert got[0] == pytest.approx(2 * idf_sum, rel=1e-12)  # merge+merged
    assert got[1] == pytest.approx(1 * idf_sum, rel=1e-12)  # merge only
    assert got[3] == pytest.approx(2 * idf_sum, rel=1e-12)  # merge x2
    assert got[4] == pytest.approx(1 * idf_sum, rel=1e-12)  # merged only


def test_single_survivor_equals_term_query(spark, sm_index):
    """One expanded term lowers to the plain term (CTerm, WAND-eligible
    path) — score-identical to TermQuery."""
    got = _hits(spark, sm_index, SpanMultiQuery(PrefixQuery(0, "zeb")))
    want = _hits(spark, sm_index, TermQuery(0, "zebra"))
    assert got == want and set(got) == {3}


def test_empty_expansion_is_empty(spark, sm_index):
    assert _hits(spark, sm_index, SpanMultiQuery(PrefixQuery(0, "qqq"))) == {}
    assert (
        _hits(
            spark, sm_index,
            SpanFirstQuery(0, SpanMultiQuery(PrefixQuery(0, "qqq")), 2),
        )
        == {}
    )


def test_span_first_with_span_multi(spark, sm_index):
    """spanFirst(spanMulti(merg*), end=1): position-0 occurrences of any
    expansion; idf = the 4 expansions' idf sum. The explicit
    tuple-of-alternatives form (in cap order) is bit-identical."""
    q = SpanFirstQuery(0, SpanMultiQuery(PrefixQuery(0, "merg")), 1)
    got = _hits(spark, sm_index, q)
    idf_sum = _idf(3) + _idf(2) + _idf(1) + _idf(1)
    assert set(got) == {0, 1, 3, 4}
    for d in (0, 1, 3, 4):  # each doc has exactly one merg* at pos 0
        assert got[d] == pytest.approx(1 * idf_sum, rel=1e-12)
    explicit = _hits(spark, sm_index, SpanFirstQuery(0, MERG_EXPANSION, 1))
    assert got == explicit
    # end=2 picks up doc4's merged@1 and doc3's merge@1
    got2 = _hits(spark, sm_index, q.__class__(0, q.term, 2))
    assert got2[3] == pytest.approx(2 * idf_sum, rel=1e-12)
    assert got2[4] == pytest.approx(2 * idf_sum, rel=1e-12)


def test_span_not_with_span_multi_include_and_exclude(spark, sm_index):
    """Include = merg* expansion, exclude = wind* expansion (window),
    pre=post=1: doc0's merged@3 is within 1 of window@2 and drops; its
    merge@0 survives. doc2 has no include occurrence."""
    q = SpanNotQuery(
        0,
        SpanMultiQuery(PrefixQuery(0, "merg")),
        (SpanMultiQuery(WildcardQuery(0, "wind*")),),
        pre=1,
        post=1,
    )
    got = _hits(spark, sm_index, q)
    idf_sum = _idf(3) + _idf(2) + _idf(1) + _idf(1)
    assert set(got) == {0, 1, 3, 4}
    assert got[0] == pytest.approx(1 * idf_sum, rel=1e-12)  # merged@3 rejected
    assert got[1] == pytest.approx(2 * idf_sum, rel=1e-12)
    assert got[3] == pytest.approx(2 * idf_sum, rel=1e-12)
    assert got[4] == pytest.approx(2 * idf_sum, rel=1e-12)


def test_span_not_exclude_expands_to_nothing(spark, sm_index):
    """An exclude whose expansion is empty cannot reject — the include
    lowers to its SpanOr form, score-identical to SpanOrQuery."""
    q = SpanNotQuery(
        0,
        SpanMultiQuery(PrefixQuery(0, "merg")),
        (SpanMultiQuery(PrefixQuery(0, "qqq")),),
    )
    got = _hits(spark, sm_index, q)
    want = _hits(spark, sm_index, SpanOrQuery(0, MERG_EXPANSION))
    assert got == want
    # single-term include with dead exclude = the plain term
    q1 = SpanNotQuery(
        0, "zebra", (SpanMultiQuery(PrefixQuery(0, "qqq")),)
    )
    assert _hits(spark, sm_index, q1) == _hits(spark, sm_index, TermQuery(0, "zebra"))


def test_boosts_fold_multiplicatively(spark, sm_index):
    base = _hits(spark, sm_index, SpanMultiQuery(PrefixQuery(0, "merg")))
    boosted = _hits(
        spark, sm_index,
        SpanMultiQuery(PrefixQuery(0, "merg", boost=2.0), boost=1.5),
    )
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert boosted[d] == pytest.approx(3.0 * s, rel=1e-12)


def test_batched_and_explain(spark, sm_index):
    q = SpanFirstQuery(0, SpanMultiQuery(PrefixQuery(0, "merg")), 2)
    res, _ = search(spark, sm_index, q, limit=None)
    single = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in res.collect()}
    batched = search_many(spark, sm_index, {"sm": q}, limit=None).collect()
    b = {(r["segment_id"], r["doc"], round(r["score"], 9)) for r in batched}
    assert b == single and b
    row = res.collect()[0]
    ex = explain(spark, sm_index, q, row["segment_id"], row["doc"])
    assert ex["kind"] == "span_first" and ex["matched"]
    assert ex["detail"]["terms"] == list(MERG_EXPANSION)


def test_alias_expands_against_union_dictionary(spark, sm_index, tmp_path_factory):
    """search_multi over a parity split scores span_multi identically to
    the single full index (union-dictionary expansion, summed df)."""
    half_a = [d for d in DOCS if d["doc_id"] % 2 == 0]
    half_b = [d for d in DOCS if d["doc_id"] % 2 == 1]
    paths = {}
    for name, docs in (("a", half_a), ("b", half_b)):
        idx = str(tmp_path_factory.mktemp("spanm_alias") / name)
        build_index(
            spark, spark.createDataFrame(pd.DataFrame(docs)), _schema(),
            idx, num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
        )
        paths[name] = idx
    q = SpanMultiQuery(PrefixQuery(0, "merg"))
    res, _ = search_multi(spark, [paths["a"], paths["b"]], q, limit=None)
    got = sorted(round(r["score"], 9) for r in res.collect())
    want = sorted(round(s, 9) for s in _hits(spark, sm_index, q).values())
    assert got == want and got


def test_validation_and_compile_guard(spark, sm_index):
    with pytest.raises(QueryParseError, match="span_multi wraps"):
        SpanMultiQuery(TermQuery(0, "merge"))
    with pytest.raises(QueryParseError, match="same field"):
        SpanFirstQuery(0, SpanMultiQuery(PrefixQuery(1, "merg")), 2)
    with pytest.raises(QueryParseError, match="same field"):
        SpanNotQuery(0, "merge", (SpanMultiQuery(PrefixQuery(1, "w")),))
    with pytest.raises(QueryParseError, match="exact term"):
        SpanContainingQuery(0, SpanMultiQuery(PrefixQuery(0, "merg")), "merge")
    with pytest.raises(QueryParseError, match="alternatives"):
        SpanFirstQuery(0, ("merge", ""), 2)
    # un-rewritten SpanMultiQuery refuses to compile, loudly
    manifest = load_manifest(sm_index)
    with pytest.raises(ValueError, match="rewrite_multiterm"):
        compile_query(
            SpanFirstQuery(0, SpanMultiQuery(PrefixQuery(0, "merg")), 2),
            {(0, "merge"): 3}, N, {0: 3.0},
        )
    assert manifest is not None


def test_percolator_rejects_span_multi(spark):
    """Subscription-time expansion against a live dictionary has no
    defined semantics — the percolator rejects span_multi loudly (the
    generic unsupported-type error, like the positional span queries)."""
    from ostrich_spark.percolate import register_queries

    with pytest.raises(ValueError, match="unsupported"):
        register_queries(
            {"sm": SpanMultiQuery(PrefixQuery(0, "merg"))}, _schema()
        )
