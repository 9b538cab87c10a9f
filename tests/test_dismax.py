"""DisMax (disjunction-max) queries — Lucene DisjunctionMaxQuery analog.
EXTENSION: the reference's unions always sum child scores
(/root/reference/query/union_scorer.go); dismax scores max + tie*rest,
the classic multi-field shape. Oracle: per-child searches combined in
plain Python."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    BooleanQuery,
    DisMaxQuery,
    MUST,
    QueryParseError,
    SHOULD,
    TermQuery,
    parse_multi_field,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "title": "spark shuffle internals", "body": "how spark moves data in a shuffle"},
    {"k": 1, "title": "merge policy", "body": "segment merge with spark spark spark"},
    {"k": 2, "title": "window functions", "body": "frames rows and ranges"},
    {"k": 3, "title": "spark spark", "body": "title heavy doc"},
    {"k": 4, "title": "joins", "body": "broadcast hash join in spark"},
]


def _schema():
    s = Schema()
    s.add_text_field("title", "default")
    s.add_text_field("body", "default")
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dm") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), _schema(), path,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    return path


def _scores(spark, idx, query, scorer="tfidf"):
    res, _ = search(spark, idx, query, limit=None, scorer=scorer, use_wand=False)
    return {
        r["k"]: r["score"]
        for r in attach_docmap(spark, idx, res).select("k", "score").collect()
    }


def _dismax_oracle(per_child: list[dict], tie: float) -> dict:
    out = {}
    for k in set().union(*[set(c) for c in per_child]):
        ss = [c[k] for c in per_child if k in c]
        out[k] = max(ss) + tie * (sum(ss) - max(ss))
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_dismax_matches_per_child_combination(spark, idx, tie, scorer):
    schema = _schema()
    c1 = parse_query("title:spark", schema)
    c2 = parse_query("body:spark", schema)
    got = _scores(spark, idx, DisMaxQuery([c1, c2], tie), scorer)
    want = _dismax_oracle(
        [_scores(spark, idx, "title:spark", scorer), _scores(spark, idx, "body:spark", scorer)],
        tie,
    )
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_dismax_tie_one_equals_union_sum(spark, idx):
    schema = _schema()
    dm = DisMaxQuery(
        [parse_query("title:spark", schema), parse_query("body:spark", schema)], 1.0
    )
    union = _scores(spark, idx, "title:spark OR body:spark")
    assert _scores(spark, idx, dm) == pytest.approx(union, rel=1e-9)


def test_parse_multi_field(spark, idx):
    schema = _schema()
    dm = parse_multi_field("spark shuffle", schema, ["title", "body"], 0.2)
    manual = DisMaxQuery(
        [
            parse_query("spark shuffle", schema, default_fields=["title"]),
            parse_query("spark shuffle", schema, default_fields=["body"]),
        ],
        0.2,
    )
    assert _scores(spark, idx, dm) == _scores(spark, idx, manual)
    # per-field: doc 0 has both words in both fields -> top by either
    assert 0 in _scores(spark, idx, dm)


def test_dismax_absent_child_pruned(spark, idx):
    schema = _schema()
    dm = DisMaxQuery(
        [parse_query("title:spark", schema), parse_query("body:zzznothere", schema)], 0.5
    )
    assert _scores(spark, idx, dm) == _scores(spark, idx, "title:spark")


def test_dismax_inside_boolean(spark, idx):
    schema = _schema()
    dm = DisMaxQuery(
        [parse_query("title:spark", schema), parse_query("body:spark", schema)], 0.0
    )
    q = BooleanQuery([(MUST, dm), (SHOULD, parse_query("body:join", schema))])
    got = _scores(spark, idx, q)
    dm_s = _scores(spark, idx, dm)
    join_s = _scores(spark, idx, "body:join")
    want = {k: v + join_s.get(k, 0.0) for k, v in dm_s.items()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_dismax_tie_validation():
    with pytest.raises(QueryParseError):
        DisMaxQuery([TermQuery(0, "x")], 1.5)


def test_dismax_through_batched_path(spark, idx):
    """search_many accepts DisMaxQuery objects; batched results must be
    row-identical to the per-query path."""
    from ostrich_spark.query.exec import search_many

    schema = _schema()
    dm = DisMaxQuery(
        [parse_query("title:spark", schema), parse_query("body:spark", schema)], 0.3
    )
    batch = search_many(spark, idx, {"dm": dm, "plain": parse_query("body:join", schema)}, limit=None)
    got = {
        r["k"]: r["score"]
        for r in attach_docmap(spark, idx, batch.filter("query_id = 'dm'"))
        .select("k", "score").collect()
    }
    want = _scores(spark, idx, dm)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_cli_multi_field_dismax(spark, idx):
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "-m", "ostrich_spark", "search", "spark",
         "-p", idx, "--fields", "title,body", "--tie", "0.3",
         "--scorer", "tfidf", "-l", "10"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if "/" in l and not l.startswith("elapsed")]
    assert len(hits) == 4  # every doc has spark in title or body except doc 2


def test_multi_field_boosts(spark, idx):
    """fields={'title': 2.0, 'body': 1.0}: per-field scores scale by the
    boost BEFORE the max/tie combination (ES fields: ['title^2'])."""
    schema = _schema()
    boosted = parse_multi_field("spark", schema, {"title": 2.0, "body": 1.0}, 0.4)
    got = _scores(spark, idx, boosted)
    t = _scores(spark, idx, "title:spark")
    b = _scores(spark, idx, "body:spark")
    want = _dismax_oracle([{k: 2.0 * v for k, v in t.items()}, b], 0.4)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
