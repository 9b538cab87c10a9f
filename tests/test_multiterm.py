"""Prefix + fuzzy multi-term queries: parser goldens, banded Levenshtein
vs a reference DP, and engine identity — a multi-term query must be
row-identical to the explicit union of its expanded terms (it IS that
union after rewrite, so this pins the expansion itself)."""

import os

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.expand import (
    expand_fuzzy,
    expand_prefix,
    levenshtein_within,
    prefix_upper_bound,
)
from ostrich_spark.query.parser import (
    BooleanQuery,
    FuzzyQuery,
    PrefixQuery,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_key": 0, "text": "spark spark sparkle stream"},
    {"doc_key": 1, "text": "sparse sparkle joins"},
    {"doc_key": 2, "text": "spark stream stream shuffle"},
    {"doc_key": 3, "text": "spars sharks join the stream"},
    {"doc_key": 4, "text": "plain prose without the magic words"},
]


@pytest.fixture(scope="module")
def mt_index(spark, tmp_path_factory):
    schema = Schema()
    schema.add_text_field("text", "default")
    idx = str(tmp_path_factory.mktemp("mt") / "idx")
    build_index(
        spark,
        spark.createDataFrame(DOCS),
        schema,
        idx,
        num_partitions=2,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    return idx, schema


def _hits(spark, idx, query, **kw):
    res, _ = search(spark, idx, query, **kw)
    rows = attach_docmap(spark, idx, res).select("doc_key", "score").collect()
    return sorted([(r["doc_key"], round(r["score"], 9)) for r in rows], key=lambda t: (-t[1], t[0]))


# --- parser -----------------------------------------------------------------


def test_parse_prefix_field(mt_index):
    _, schema = mt_index
    q = parse_query("text:Spar*", schema)
    assert q == PrefixQuery(0, "spar")  # normalized, not analyzed


def test_parse_fuzzy_field(mt_index):
    _, schema = mt_index
    assert parse_query("text:Spark~1", schema) == FuzzyQuery(0, "spark", max_dist=1)
    assert parse_query("text:spark~2", schema) == FuzzyQuery(0, "spark", max_dist=2)
    # ~0 is an exact normalized term
    assert parse_query("text:Spark~0", schema) == TermQuery(0, "spark")


def test_parse_bare_multiterm_expands_default_fields():
    schema = Schema()
    schema.add_text_field("a", "default")
    schema.add_text_field("b", "default")
    q = parse_query("spar*", schema)
    assert isinstance(q, BooleanQuery)
    assert [sub for _, sub in q.subqueries] == [PrefixQuery(0, "spar"), PrefixQuery(1, "spar")]


def test_parse_multiterm_inside_boolean(mt_index):
    _, schema = mt_index
    q = parse_query("(text:spar* OR text:join~1)", schema)
    assert isinstance(q, BooleanQuery)
    subs = [sub for _, sub in q.subqueries]
    assert PrefixQuery(0, "spar") in subs and FuzzyQuery(0, "join", max_dist=1) in subs


def test_parse_non_multiterm_shapes_unchanged(mt_index):
    """'~' with a non-distance suffix is not fuzzy syntax — it falls
    through to the analyzed path (separator chars -> same terms the
    reference would produce). Mid-token '*' is covered by
    test_wildcard_regex.py (it now parses as a WildcardQuery)."""
    _, schema = mt_index
    assert parse_query("text:a~b", schema) == BooleanQuery.union(
        TermQuery(0, "a"), TermQuery(0, "b")
    )


# --- levenshtein + bounds ---------------------------------------------------


def _lev_full(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_banded_levenshtein_matches_full_dp():
    import itertools

    alphabet = "abc"
    words = ["".join(w) for n in range(0, 4) for w in itertools.product(alphabet, repeat=n)]
    for a in words:
        for b in words:
            for d in (1, 2):
                assert levenshtein_within(a, b, d) == (_lev_full(a, b) <= d), (a, b, d)


def test_prefix_upper_bound():
    assert prefix_upper_bound("spar") == "spas"
    assert prefix_upper_bound("a") == "b"
    assert prefix_upper_bound("z￿") == "z\U00010000"
    assert prefix_upper_bound("\U0010FFFF") is None
    between = "sparzzz"
    assert "spar" <= between < prefix_upper_bound("spar")


# --- expansion against the dictionary --------------------------------------


def test_expand_prefix_terms(spark, mt_index):
    idx, _ = mt_index
    mf = load_manifest(idx)
    terms = expand_prefix(spark, idx, mf, 0, "spar")
    assert set(terms) == {"spark", "sparkle", "sparse", "spars"}
    # cap is deterministic: doc_freq DESC, term ASC ('spark' df=2 first)
    assert expand_prefix(spark, idx, mf, 0, "spar", max_expansions=2) == ["spark", "sparkle"]


def test_expand_fuzzy_terms(spark, mt_index):
    idx, _ = mt_index
    mf = load_manifest(idx)
    assert set(expand_fuzzy(spark, idx, mf, 0, "spark", 1)) == {"spark", "spars"}
    # dist 2: sparse (k->s, +e), sharks (p->h, +s), sparkle (+l, +e)
    assert set(expand_fuzzy(spark, idx, mf, 0, "spark", 2)) == {
        "spark",
        "spars",
        "sparse",
        "sharks",
        "sparkle",
    }
    # prefix_length=0 (distributed levenshtein) agrees with the bucket path
    assert set(expand_fuzzy(spark, idx, mf, 0, "spark", 1, prefix_length=0)) == set(
        expand_fuzzy(spark, idx, mf, 0, "spark", 1)
    )


def test_expand_fallback_without_term_stats(spark, mt_index, tmp_path):
    """With term_stats unpaired (crash window), expansion sums the
    segment postings instead — same answer."""
    import shutil

    idx, schema = mt_index
    idx2 = str(tmp_path / "idx_nostats")
    shutil.copytree(idx, idx2)
    meta = os.path.join(idx2, "term_stats.parquet", "_STATS_META.json")
    os.remove(meta)
    mf = load_manifest(idx2)
    assert set(expand_prefix(spark, idx2, mf, 0, "spar")) == {
        "spark",
        "sparkle",
        "sparse",
        "spars",
    }
    assert set(expand_fuzzy(spark, idx2, mf, 0, "spark", 1)) == {"spark", "spars"}


# --- engine identity --------------------------------------------------------


def test_prefix_search_equals_explicit_union(spark, mt_index):
    idx, _ = mt_index
    got = _hits(spark, idx, "text:spar*", limit=None)
    want = _hits(
        spark,
        idx,
        BooleanQuery.union(
            TermQuery(0, "spark"),
            TermQuery(0, "sparkle"),
            TermQuery(0, "sparse"),
            TermQuery(0, "spars"),
        ),
        limit=None,
    )
    assert got == want and len(got) == 4


def test_fuzzy_search_equals_explicit_union(spark, mt_index):
    idx, _ = mt_index
    got = _hits(spark, idx, "text:spark~1", limit=None)
    want = _hits(
        spark, idx, BooleanQuery.union(TermQuery(0, "spark"), TermQuery(0, "spars")), limit=None
    )
    assert got == want and len(got) == 3


def test_fuzzy_transpositions_engine_identity(spark, mt_index):
    """Damerau fuzzy through the full search path: 'psark' (transposed
    first pair) reaches 'spark' at ONE edit, so the query is
    row-identical to the plain term search; plain Levenshtein at the
    same max_dist matches nothing."""
    idx, _ = mt_index
    q = FuzzyQuery(0, "psark", max_dist=1, prefix_length=0, transpositions=True)
    assert _hits(spark, idx, q, limit=None) == _hits(
        spark, idx, TermQuery(0, "spark"), limit=None
    )
    plain = FuzzyQuery(0, "psark", max_dist=1, prefix_length=0)
    assert _hits(spark, idx, plain, limit=None) == []


def test_prefix_wand_identity(spark, mt_index):
    idx, _ = mt_index
    assert _hits(spark, idx, "text:spar*", limit=3, use_wand=True) == _hits(
        spark, idx, "text:spar*", limit=3, use_wand=False
    )


def test_prefix_no_match_is_empty(spark, mt_index):
    idx, _ = mt_index
    assert _hits(spark, idx, "text:zzz*", limit=None) == []


def test_multiterm_in_boolean_combination(spark, mt_index):
    """MUST stream AND prefix expansion — rewrite recurses into booleans."""
    idx, _ = mt_index
    got = _hits(spark, idx, "text:stream AND text:spar*", limit=None)
    assert [d for d, _ in got] and set(d for d, _ in got) == {0, 2, 3}


def test_facet_counts(spark, mt_index):
    """Facet over a source-table column: per-category counts of the
    exhaustive match set of 'text:stream' (docs 0, 2, 3)."""
    from ostrich_spark.query.exec import facet_counts

    idx, _ = mt_index
    cats = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c")], "doc_key long, cat string"
    )
    rows = facet_counts(
        spark, idx, "text:stream", by=["cat"], join_df=cats, join_on=["doc_key"]
    ).collect()
    assert {(r["cat"], r["n_docs"]) for r in rows} == {("a", 1), ("b", 2)}


def test_facet_counts_multiterm_query(spark, mt_index):
    """Facets compose with multi-term queries (prefix match set)."""
    from ostrich_spark.query.exec import facet_counts

    idx, _ = mt_index
    cats = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c")], "doc_key long, cat string"
    )
    rows = facet_counts(
        spark, idx, "text:spar*", by=["cat"], join_df=cats, join_on=["doc_key"]
    ).collect()
    assert {(r["cat"], r["n_docs"]) for r in rows} == {("a", 2), ("b", 2)}


def test_search_many_multiterm_identity(spark, mt_index):
    idx, _ = mt_index
    many = search_many(spark, idx, {"p": "text:spar*", "f": "text:spark~1"}, limit=None)
    rows = attach_docmap(spark, idx, many.drop("segment_ord")).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_key"], round(r["score"], 9)))
    for qid, nql in (("p", "text:spar*"), ("f", "text:spark~1")):
        assert sorted(by_q[qid], key=lambda t: (-t[1], t[0])) == _hits(spark, idx, nql, limit=None)
