"""Parser AST goldens — filling ostrich's empty TODO test table
(/root/reference/query/parser_test.go:23)."""

import pytest

from ostrich_spark.query.parser import (
    AllQuery,
    BooleanQuery,
    EmptyQuery,
    QueryParseError,
    TermQuery,
    parse_query,
    MUST,
    SHOULD,
)
from ostrich_spark.schema import Schema


def _schema():
    s = Schema()
    s.add_text_field("title", "default")
    s.add_text_field("body", "default")
    return s


def test_empty_is_all_query():
    assert isinstance(parse_query("", _schema()), AllQuery)
    assert isinstance(parse_query("   ", _schema()), AllQuery)


def test_single_field_term():
    q = parse_query("title:Hello", _schema())
    # field-qualified -> analyzed by the field's analyzer (lowercased)
    assert q == TermQuery(0, "hello")


def test_bare_term_not_analyzed():
    # bare terms are NOT analyzed (parser.go:114-117): raw token kept,
    # expanded over default fields as an OR
    q = parse_query("Hello", _schema())
    assert isinstance(q, BooleanQuery)
    assert q.subqueries == [
        (SHOULD, TermQuery(0, "Hello")),
        (SHOULD, TermQuery(1, "Hello")),
    ]


def test_field_vs_bare_analysis_asymmetry():
    s = Schema()
    s.add_text_field("description", "en_stem")
    assert parse_query("description:serious", s) == TermQuery(0, "seriou")
    assert parse_query("serious", s) == TermQuery(0, "serious")  # unanalyzed


def test_and_or_case_insensitive():
    s = _schema()
    q1 = parse_query("title:a AND title:b", s)
    q2 = parse_query("title:a and title:b", s)
    assert q1 == q2
    assert q1.subqueries[0][0] == MUST


def test_implicit_or():
    s = _schema()
    explicit = parse_query("title:a OR title:b", s)
    implicit = parse_query("title:a title:b", s)
    assert explicit == implicit


def test_left_associativity():
    # "a AND b OR c" == Or(And(a,b), c)
    s = _schema()
    q = parse_query("title:a AND title:b OR title:c", s)
    assert isinstance(q, BooleanQuery)
    assert q.subqueries[0][0] == SHOULD
    inner = q.subqueries[0][1]
    assert inner.subqueries[0][0] == MUST


def test_parentheses():
    s = _schema()
    q = parse_query("(title:a OR title:b) AND title:c", s)
    assert q.subqueries[0][0] == MUST
    left = q.subqueries[0][1]
    assert isinstance(left, BooleanQuery)
    assert left.subqueries[0][0] == SHOULD


def test_readme_nql_example():
    # README.md:17: (go OR golang) AND (search or fts)
    s = _schema()
    q = parse_query("(go OR golang) AND (search or fts)", s)
    assert len(q.subqueries) == 2
    assert all(occ == MUST for occ, _ in q.subqueries)


def test_multi_token_field_value():
    # a field-qualified value that analyzes to several terms becomes an
    # OR of term queries (parser.go:100-113). 'a_b' splits on '_'.
    s = _schema()
    q = parse_query("title:a_b", s)
    assert isinstance(q, BooleanQuery)
    assert q.subqueries == [
        (SHOULD, TermQuery(0, "a")),
        (SHOULD, TermQuery(0, "b")),
    ]


def test_stopword_only_field_value_is_empty():
    s = Schema()
    s.add_text_field("d", "en_stem")
    assert isinstance(parse_query("d:the", s), EmptyQuery)


def test_unknown_field_treated_as_bare():
    s = _schema()
    q = parse_query("nosuch:x", s)
    assert isinstance(q, BooleanQuery)
    assert q.subqueries[0][1] == TermQuery(0, "nosuch:x")


def test_phrase_adjacent_to_paren():
    # regression (ADVICE r2): parens outside a quoted span must still be
    # stripped — '(title:"a b" OR title:c)' previously mis-parsed the
    # whole '(title:"a b"' token as a literal bare term.
    from ostrich_spark.query.parser import PhraseQuery

    s = _schema()
    q = parse_query('(title:"quick brown" OR title:fox)', s)
    assert isinstance(q, BooleanQuery)
    assert q.subqueries == [
        (SHOULD, PhraseQuery(0, ("quick", "brown"))),
        (SHOULD, TermQuery(0, "fox")),
    ]
    # parens INSIDE a quoted span survive to the analyzer untouched
    q2 = parse_query('title:"(quick brown)"', s)
    assert q2 == PhraseQuery(0, ("quick", "brown"))
    # nested: phrase token carrying both a leading paren and trailing parens
    q3 = parse_query('((title:"quick brown"))', s)
    assert q3 == PhraseQuery(0, ("quick", "brown"))


# --- ES match-query ergonomics: AUTO fuzziness, percentage/negative ---
# --- minimum_should_match, default_operator=AND -----------------------


def test_auto_fuzziness_ladder():
    """ES fuzziness:AUTO (default AUTO:3,6): <3 chars exact, 3-5 one
    edit, 6+ two edits — resolved at parse time."""
    from ostrich_spark.query.parser import FuzzyQuery, auto_fuzziness

    s = _schema()
    assert parse_query("title:ab~auto", s) == TermQuery(0, "ab")  # exact
    assert parse_query("title:spark~AUTO", s) == FuzzyQuery(0, "spark", 1)
    assert parse_query("title:analysis~auto", s) == FuzzyQuery(0, "analysis", 2)
    assert (auto_fuzziness(""), auto_fuzziness("abc"), auto_fuzziness("abcdef")) == (0, 1, 2)
    # programmatic form resolves too; junk strings/distances rejected
    assert FuzzyQuery(0, "spark", "auto").max_dist == 1
    with pytest.raises(QueryParseError, match="auto"):
        FuzzyQuery(0, "spark", "fuzzyish")
    with pytest.raises(QueryParseError, match="auto"):
        FuzzyQuery(0, "spark", 3)


def test_min_should_percentage_and_negative():
    """ES minimum_should_match spec forms, resolved at construction:
    'N%' floors against the SHOULD count, negative int = that many may
    be missing, both clamped to >= 1."""
    ts = [(SHOULD, TermQuery(0, t)) for t in ("a", "b", "c", "d")]
    assert BooleanQuery(list(ts), min_should="75%").min_should == 3
    assert BooleanQuery(list(ts), min_should="30%").min_should == 1  # floor(1.2)
    assert BooleanQuery(list(ts), min_should="100%").min_should == 4
    assert BooleanQuery(list(ts), min_should="-25%").min_should == 3
    assert BooleanQuery(list(ts), min_should=-1).min_should == 3
    assert BooleanQuery(list(ts), min_should=-9).min_should == 1  # clamp
    with pytest.raises(QueryParseError, match="percentage"):
        BooleanQuery(list(ts), min_should="3 of 4")
    with pytest.raises(QueryParseError, match="min_should"):
        BooleanQuery(list(ts), min_should=0)
    with pytest.raises(QueryParseError, match="\\[-100, 100\\]"):
        BooleanQuery(list(ts), min_should="150%")


def test_default_operator_and():
    """ES query_string default_operator=AND: adjacent bare primaries
    require each other; explicit operators always win."""
    s = _schema()
    assert parse_query("title:quick title:fox", s, default_operator="and") == parse_query(
        "title:quick AND title:fox", s
    )
    assert parse_query("title:quick OR title:fox", s, default_operator="and") == parse_query(
        "title:quick OR title:fox", s
    )
    # default stays the reference's implicit OR
    assert parse_query("title:quick title:fox", s) == parse_query(
        "title:quick OR title:fox", s
    )
    with pytest.raises(QueryParseError, match="default_operator"):
        parse_query("x", s, default_operator="xor")
