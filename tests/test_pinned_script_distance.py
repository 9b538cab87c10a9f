"""pinned / script_score / distance_feature / match_bool_prefix — ES
query analogs (EXTENSION). Scores hand-computed from the tfidf formula
and the pinned/bonus contracts, not just compared engine-to-engine."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import (
    PINNED_SCORE_BASE,
    attach_docmap,
    search,
    search_distance_feature,
    search_pinned,
    search_script_score,
)
from ostrich_spark.query.parser import (
    BooleanQuery,
    EmptyQuery,
    PrefixQuery,
    QueryParseError,
    TermQuery,
    parse_match_bool_prefix,
    SHOULD,
    MUST,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "spark merge policy", "rank_v": 10.0, "when_us": 0},
    {"doc_id": 1, "text": "spark spark query", "rank_v": 0.0, "when_us": 100},
    {"doc_id": 2, "text": "merge segment index", "rank_v": 5.0, "when_us": 200},
    {"doc_id": 3, "text": "sparse matrix solver", "rank_v": None, "when_us": 300},
    {"doc_id": 4, "text": "spark window join", "rank_v": 2.0, "when_us": 400},
    {"doc_id": 5, "text": "query planner spars", "rank_v": 1.0, "when_us": None},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("rank_v", "double")
    s.add_numeric_field("when_us")
    return s


@pytest.fixture(scope="module")
def qp_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("qpack") / "idx")
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


def _by_id(spark, idx, df):
    # attach_docmap's join does not preserve row order — re-derive the
    # pinned total order (score desc, id asc) from the collected rows
    rows = attach_docmap(spark, idx, df).select("doc_id", "score").collect()
    return sorted(
        ((r["doc_id"], r["score"]) for r in rows), key=lambda t: (-t[1], t[0])
    )


def _organic(spark, idx, q="text:spark"):
    res, _ = search(spark, idx, q, limit=None, scorer="tfidf")
    return dict(_by_id(spark, idx, res))


# --- pinned -----------------------------------------------------------


def test_pinned_order_and_scores(spark, qp_index):
    """Pinned ids rank first IN THE GIVEN ORDER at BASE − position;
    organic matches follow with pinned ids deduplicated."""
    got = _by_id(
        spark, qp_index,
        search_pinned(spark, qp_index, [2, 4], "text:spark", limit=None),
    )
    org = _organic(spark, qp_index)
    # doc 2 does NOT match text:spark but is pinned -> still surfaces
    assert [d for d, _ in got[:2]] == [2, 4]
    assert got[0][1] == PINNED_SCORE_BASE - 0.0
    assert got[1][1] == PINNED_SCORE_BASE - 1.0
    tail = got[2:]
    want_tail = sorted(
        ((d, s) for d, s in org.items() if d not in (2, 4)),
        key=lambda t: (-t[1], t[0]),
    )
    assert [d for d, _ in tail] == [d for d, _ in want_tail]
    for (d, s), (wd, ws) in zip(tail, want_tail):
        assert s == pytest.approx(ws, rel=1e-12)


def test_pinned_absent_id_skipped_and_validation(spark, qp_index):
    got = _by_id(
        spark, qp_index,
        search_pinned(spark, qp_index, [999, 1], "text:spark", limit=None),
    )
    assert got[0][0] == 1 and got[0][1] == PINNED_SCORE_BASE - 1.0
    assert 999 not in {d for d, _ in got}
    with pytest.raises(ValueError, match=">= 1 id"):
        search_pinned(spark, qp_index, [], "text:spark")
    with pytest.raises(ValueError, match="bounded"):
        search_pinned(spark, qp_index, list(range(1001)), "text:spark")


def test_pinned_excludes_tombstones(spark, tmp_path):
    from ostrich_spark.deletes import delete_docs

    idx = str(tmp_path / "pind")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        _schema(),
        idx,
        num_partitions=2,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    match = spark.createDataFrame([(0,)], "doc_id long")
    delete_docs(spark, idx, match, key_cols=["doc_id"])
    got = _by_id(
        spark, idx,
        search_pinned(spark, idx, [0, 1], "text:spark", limit=None),
    )
    ids = [d for d, _ in got]
    assert 0 not in ids
    assert got[0][0] == 1  # surviving pin keeps ITS position score
    assert got[0][1] == PINNED_SCORE_BASE - 1.0


# --- script_score ------------------------------------------------------


def test_script_score_expression(spark, qp_index):
    """Catalyst expression over _score + doc values reproduces the
    hand-computed rewrite; NULL doc value handled by the expression."""
    got = dict(_by_id(
        spark, qp_index,
        search_script_score(
            spark, qp_index, "text:spark",
            "sqrt(_score) + coalesce(rank_v, 0.0) * 0.5", limit=None,
        ),
    ))
    org = _organic(spark, qp_index)
    vals = {d["doc_id"]: d["rank_v"] for d in DOCS}
    assert set(got) == set(org)
    for d, s in got.items():
        want = math.sqrt(org[d]) + (vals[d] or 0.0) * 0.5
        assert s == pytest.approx(want, rel=1e-12)


def test_script_score_bad_expr_and_negative(spark, qp_index):
    with pytest.raises(ValueError, match="failed to compile"):
        search_script_score(spark, qp_index, "text:spark", "no_such_col * 2")
    with pytest.raises(ValueError, match="non-empty"):
        search_script_score(spark, qp_index, "text:spark", "  ")
    neg = search_script_score(
        spark, qp_index, "text:spark", "_score - 100.0", limit=None
    )
    with pytest.raises(Exception, match="negative score"):
        neg.collect()


# --- distance_feature --------------------------------------------------


def test_distance_feature_numeric(spark, qp_index):
    """bonus = boost * pivot / (pivot + |v − origin|); NULL adds 0."""
    got = dict(_by_id(
        spark, qp_index,
        search_distance_feature(
            spark, qp_index, "text:spark", "rank_v",
            origin=10.0, pivot=5.0, boost=2.0, limit=None,
        ),
    ))
    org = _organic(spark, qp_index)
    vals = {d["doc_id"]: d["rank_v"] for d in DOCS}
    assert set(got) == set(org)
    for d, s in got.items():
        v = vals[d]
        bonus = 0.0 if v is None else 2.0 * 5.0 / (5.0 + abs(v - 10.0))
        assert s == pytest.approx(org[d] + bonus, rel=1e-12)
    # at the origin the bonus is exactly boost; at pivot away, boost/2
    assert got[0] - org[0] == pytest.approx(2.0)
    v4 = vals[4]
    assert abs(v4 - 10.0) != 5.0  # doc4 is 8 away; sanity only


def test_distance_feature_date_and_validation(spark, qp_index):
    got = dict(_by_id(
        spark, qp_index,
        search_distance_feature(
            spark, qp_index, "text:spark", "when_us",
            origin=0, pivot=200, boost=1.0, limit=None,
        ),
    ))
    org = _organic(spark, qp_index)
    whens = {d["doc_id"]: d["when_us"] for d in DOCS}
    for d, s in got.items():
        w = whens[d]
        bonus = 0.0 if w is None else 200.0 / (200.0 + abs(w - 0.0))
        assert s == pytest.approx(org[d] + bonus, rel=1e-12)
    with pytest.raises(ValueError, match="pivot"):
        search_distance_feature(
            spark, qp_index, "text:spark", "rank_v", 0.0, 0.0
        )
    with pytest.raises(ValueError, match="doc-value"):
        search_distance_feature(
            spark, qp_index, "text:spark", "text", 0.0, 1.0
        )


# --- match_bool_prefix --------------------------------------------------


def test_match_bool_prefix_shapes(spark, qp_index):
    s = _schema()
    q = parse_match_bool_prefix("merge policy spar", s, "text")
    assert q == BooleanQuery([
        (SHOULD, TermQuery(0, "merge")),
        (SHOULD, TermQuery(0, "policy")),
        (SHOULD, PrefixQuery(0, "spar")),
    ])
    q_and = parse_match_bool_prefix("merge spar", s, "text", operator="and")
    assert q_and == BooleanQuery([
        (MUST, TermQuery(0, "merge")),
        (MUST, PrefixQuery(0, "spar")),
    ])
    assert parse_match_bool_prefix("spar", s, "text") == PrefixQuery(0, "spar")
    assert parse_match_bool_prefix("  ", s, "text") == EmptyQuery()
    with pytest.raises(QueryParseError, match="operator"):
        parse_match_bool_prefix("x", s, "text", operator="xor")
    with pytest.raises(QueryParseError, match="text field"):
        parse_match_bool_prefix("x", s, "rank_v")


def test_match_bool_prefix_end_to_end(spark, qp_index):
    """The last token matches as a prefix in ANY position (bool, not
    phrase): 'spar' expands to {spark, spars, sparse}."""
    q = parse_match_bool_prefix("query spar", _schema(), "text")
    res, _ = search(spark, qp_index, q, limit=None, scorer="tfidf")
    ids = {d for d, _ in _by_id(spark, qp_index, res)}
    # spark docs (0,1,4), sparse doc (3), 'query planner spars' (5)
    assert ids == {0, 1, 3, 4, 5}
    q_and = parse_match_bool_prefix(
        "query spar", _schema(), "text", operator="and"
    )
    res, _ = search(spark, qp_index, q_and, limit=None, scorer="tfidf")
    ids = {d for d, _ in _by_id(spark, qp_index, res)}
    assert ids == {1, 5}  # must contain 'query' AND a spar- token
