"""Wildcard + regexp multi-term queries (Lucene Wildcard/RegexpQuery
analogs): parser goldens, dictionary expansion on both the
literal-prefix-pruned and the distributed leading-wildcard paths, and
engine identity — the query must be row-identical to the explicit union
of its expanded terms."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.expand import (
    DEFAULT_PREFIX_EXPANSIONS,
    expand_prefix,
    expand_regexp,
    expand_wildcard,
    wildcard_to_regex,
)
from ostrich_spark.query.parser import (
    BooleanQuery,
    PrefixQuery,
    QueryParseError,
    RegexpQuery,
    TermQuery,
    WildcardQuery,
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
def wr_index(spark, tmp_path_factory):
    schema = Schema()
    schema.add_text_field("text", "default")
    idx = str(tmp_path_factory.mktemp("wr") / "idx")
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
    return sorted(
        [(r["doc_key"], round(r["score"], 9)) for r in rows],
        key=lambda t: (-t[1], t[0]),
    )


# --- parser -----------------------------------------------------------------


def test_parse_wildcard_field(wr_index):
    _, schema = wr_index
    # normalized (lowercased), never analyzed
    assert parse_query("text:SP*K", schema) == WildcardQuery(0, "sp*k")
    assert parse_query("text:t?rm", schema) == WildcardQuery(0, "t?rm")
    # trailing single star stays the cheaper PrefixQuery
    assert parse_query("text:spar*", schema) == PrefixQuery(0, "spar")
    # but '?' anywhere makes it a wildcard even with a trailing star
    assert parse_query("text:sp?r*", schema) == WildcardQuery(0, "sp?r*")


def test_parse_regexp_field(wr_index):
    _, schema = wr_index
    # pattern passes through UN-lowercased (matches lowercase terms only
    # if written that way — Lucene RegexpQuery behaves the same)
    assert parse_query("text:/Spa.k/", schema) == RegexpQuery(0, "Spa.k")
    assert parse_query("text:/qu[ae]ry/", schema) == RegexpQuery(0, "qu[ae]ry")


def test_parse_wildcard_boost_and_bare(wr_index):
    _, schema = wr_index
    assert parse_query("text:sp*k^2", schema) == WildcardQuery(0, "sp*k", boost=2.0)
    schema2 = Schema()
    schema2.add_text_field("a", "default")
    schema2.add_text_field("b", "default")
    q = parse_query("sp*k", schema2)
    assert isinstance(q, BooleanQuery)
    assert [sub for _, sub in q.subqueries] == [
        WildcardQuery(0, "sp*k"),
        WildcardQuery(1, "sp*k"),
    ]


def test_parse_degenerate_patterns_rejected(wr_index):
    _, schema = wr_index
    with pytest.raises(QueryParseError, match="literal character"):
        parse_query("text:*", schema)
    with pytest.raises(QueryParseError, match="literal character"):
        parse_query("text:?*", schema)
    with pytest.raises(QueryParseError, match="bad regexp"):
        parse_query("text:/a(/", schema)


def test_wildcard_to_regex():
    assert wildcard_to_regex("sp*k") == "sp.*k"
    assert wildcard_to_regex("t?rm") == "t.rm"
    assert wildcard_to_regex("a.b*") == "a\\.b.*"


# --- expansion --------------------------------------------------------------


def test_expand_wildcard_prefix_pruned(spark, wr_index):
    idx, _ = wr_index
    mf = load_manifest(idx)
    assert expand_wildcard(spark, idx, mf, 0, "sp*k") == ["spark"]
    assert expand_wildcard(spark, idx, mf, 0, "sp?rk") == ["spark"]
    assert set(expand_wildcard(spark, idx, mf, 0, "sp?r*")) == {
        "spark", "sparkle", "sparse", "spars",
    }
    # a single-'*' pattern expands exactly like the equivalent prefix
    assert expand_wildcard(spark, idx, mf, 0, "spar*") == expand_prefix(
        spark, idx, mf, 0, "spar"
    )


def test_expand_wildcard_leading_star_distributed(spark, wr_index):
    """No literal prefix -> one distributed anchored-regex filter job."""
    idx, _ = wr_index
    mf = load_manifest(idx)
    assert expand_wildcard(spark, idx, mf, 0, "*ark") == ["spark"]
    assert set(expand_wildcard(spark, idx, mf, 0, "*le")) == {"sparkle", "shuffle"}


def test_expand_wildcard_cap_deterministic(spark, wr_index):
    """doc_freq DESC, term ASC: stream df=3, spark/sparkle df=2 tie on
    term order."""
    idx, _ = wr_index
    mf = load_manifest(idx)
    assert expand_wildcard(spark, idx, mf, 0, "s*", max_expansions=3) == [
        "stream", "spark", "sparkle",
    ]


def test_expand_regexp(spark, wr_index):
    idx, _ = wr_index
    mf = load_manifest(idx)
    assert set(expand_regexp(spark, idx, mf, 0, "spar[ks]")) == {"spark", "spars"}
    # whole-term anchoring: 'spar' alone must NOT match 'spark'/'spars'
    assert expand_regexp(spark, idx, mf, 0, "spar") == []
    assert set(expand_regexp(spark, idx, mf, 0, "s.*e")) == {
        "sparkle", "sparse", "shuffle",
    }
    # leading alternation -> no literal prefix -> distributed path
    assert set(expand_regexp(spark, idx, mf, 0, "(jo|sh).*")) == {
        "join", "joins", "shuffle", "sharks",
    }


# --- engine identity --------------------------------------------------------


def test_wildcard_engine_equals_explicit_union(spark, wr_index):
    idx, schema = wr_index
    mf = load_manifest(idx)
    terms = expand_wildcard(spark, idx, mf, 0, "sp?r*")
    explicit = BooleanQuery.union(*[TermQuery(0, t) for t in terms])
    assert _hits(spark, idx, "text:sp?r*") == _hits(spark, idx, explicit)
    assert _hits(spark, idx, "text:sp?r*")  # non-empty


def test_regexp_engine_equals_explicit_union(spark, wr_index):
    idx, _ = wr_index
    mf = load_manifest(idx)
    terms = expand_regexp(spark, idx, mf, 0, "(jo|sh).*")
    explicit = BooleanQuery.union(*[TermQuery(0, t) for t in terms])
    assert _hits(spark, idx, "text:/(jo|sh).*/") == _hits(spark, idx, explicit)
    assert _hits(spark, idx, "text:/(jo|sh).*/")


def test_wildcard_in_boolean_and_batched(spark, wr_index):
    idx, _ = wr_index
    combined = _hits(spark, idx, "text:sp*k AND text:stream")
    assert combined  # docs 0 and 2
    assert {d for d, _ in combined} == {0, 2}
    rows = search_many(
        spark, idx, {"w": "text:sp*k", "r": "text:/spar[ks]/"}, limit=10
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    single_w = search(spark, idx, "text:sp*k", limit=10)[0].collect()
    assert len(by_q["w"]) == len(single_w)
    assert by_q["r"]


def test_unexpanded_nodes_rejected_by_compiler(wr_index):
    from ostrich_spark.query.plan import compile_query

    idx, _ = wr_index
    with pytest.raises(ValueError, match="expanded against the term dictionary"):
        compile_query(WildcardQuery(0, "sp*k"), {}, 5, {})


def test_default_cap_applied_on_nql_path(spark, wr_index):
    """NQL-parsed nodes carry max_expansions=None -> the class default
    cap (regression: None used to mean UNCAPPED through rewrite)."""
    from ostrich_spark.query import expand as ex

    idx, _ = wr_index
    mf = load_manifest(idx)
    orig = ex.expand_wildcard
    seen = {}

    def spy(spark_, idx_, mf_, fid, pat, max_expansions=None):
        seen["cap"] = max_expansions
        return orig(spark_, idx_, mf_, fid, pat, max_expansions)

    ex.expand_wildcard = spy
    try:
        ex.rewrite_multiterm(spark, idx, mf, WildcardQuery(0, "sp*k"))
    finally:
        ex.expand_wildcard = orig
    assert seen["cap"] == DEFAULT_PREFIX_EXPANSIONS
