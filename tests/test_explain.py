"""explain(): per-doc score breakdown must equal the engine's search
score for every query shape (it runs the same eval_node), with correct
leaf detail."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.query.exec import explain, search
from ostrich_spark.query.parser import DisMaxQuery, parse_query
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "content": "spark join spark window", "nval": 5},
    {"k": 1, "content": "spark merge policy", "nval": 10},
    {"k": 2, "content": "join window frames", "nval": 15},
    {"k": 3, "content": "spark spark spark join", "nval": 20},
]


def _schema():
    s = Schema()
    s.add_text_field("content", "default", positions=True)
    s.add_numeric_field("nval")
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ex") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), _schema(), path,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    return path


def _hits(spark, idx, q, scorer="tfidf"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer, use_wand=False)
    return [(r["segment_id"], r["doc"], r["score"]) for r in res.collect()]


QUERIES = [
    "content:spark",
    "content:spark AND content:join",
    "content:spark OR content:window",
    "content:spark^2 OR content:join",
    'content:"spark join"',
    "content:spark AND nval:[8 TO 18]",
]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_explain_equals_search_score(spark, idx, q, scorer):
    hits = _hits(spark, idx, q, scorer)
    assert hits
    for sid, doc, score in hits:
        ex = explain(spark, idx, q, sid, doc, scorer=scorer)
        assert ex["matched"] is True
        assert ex["score"] == pytest.approx(score, rel=1e-12)


def test_explain_term_detail(spark, idx):
    hits = _hits(spark, idx, "content:spark")
    # find doc 3 (tf 3): the highest-score hit
    sid, doc, score = max(hits, key=lambda h: h[2])
    ex = explain(spark, idx, "content:spark", sid, doc)
    d = ex["detail"]
    assert d["tf"] == 3 and d["doc_freq"] == 3
    assert d["idf"] == pytest.approx(1.0 + math.log(4 / (1.0 + 3)))
    assert ex["score"] == pytest.approx(d["tf"] * d["idf"])
    assert d["field_length"] == 4


def test_explain_dismax_children(spark, idx):
    schema = _schema()
    dm = DisMaxQuery(
        [parse_query("content:spark", schema), parse_query("content:join", schema)], 0.3
    )
    hits = _hits(spark, idx, dm)
    sid, doc, score = hits[0]
    ex = explain(spark, idx, dm, sid, doc)
    assert ex["kind"] == "dismax" and ex["detail"]["tie_breaker"] == 0.3
    kid_scores = [c["score"] for c in ex["children"] if c["matched"]]
    want = max(kid_scores) + 0.3 * (sum(kid_scores) - max(kid_scores))
    assert ex["score"] == pytest.approx(want, rel=1e-12)


def test_explain_non_match_and_tombstone(spark, idx, tmp_path):
    import shutil

    hits = _hits(spark, idx, "content:merge")
    assert len(hits) == 1
    sid, doc, _ = hits[0]
    # a doc that does NOT match
    other = [(s, d) for s, d, _ in _hits(spark, idx, "content:frames")][0]
    ex = explain(spark, idx, "content:merge", other[0], other[1])
    assert ex["matched"] is False and ex["score"] == 0.0
    # tombstoned doc reports its would-be score but matched=False
    tomb = str(tmp_path / "tomb")
    shutil.copytree(idx, tomb)
    delete_docs(spark, tomb, spark.createDataFrame([(1,)], "k long"), ["k"])
    ex2 = explain(spark, tomb, "content:merge", sid, doc)
    assert ex2["tombstoned"] is True and ex2["matched"] is False
    assert ex2["score"] > 0.0


def test_explain_validates_address(spark, idx):
    with pytest.raises(ValueError):
        explain(spark, idx, "content:spark", "nope", 0)
    from ostrich_spark.manifest import load_manifest

    sid = load_manifest(idx).segments[0].segment_id
    with pytest.raises(ValueError):
        explain(spark, idx, "content:spark", sid, 10_000)


def test_cli_explain(spark, idx):
    import subprocess
    import sys as _sys

    # get an address from the CLI search output format
    out = subprocess.run(
        [_sys.executable, "-m", "ostrich_spark", "search",
         "content:spark AND content:join", "-p", idx, "--scorer", "tfidf", "-l", "1"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hit = next(l for l in out.stdout.splitlines() if "/" in l)
    addr, score = hit.split()
    ex = subprocess.run(
        [_sys.executable, "-m", "ostrich_spark", "explain",
         "content:spark AND content:join", "-p", idx, "--addr", addr,
         "--scorer", "tfidf"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert ex.returncode == 0, ex.stderr[-2000:]
    assert "(match, scorer=tfidf)" in ex.stdout
    assert "'spark'" in ex.stdout and "'join'" in ex.stdout
    # root line carries the same score search printed
    root = next(l for l in ex.stdout.splitlines() if l.strip().endswith("and"))
    assert abs(float(root.split()[0]) - float(score)) < 1e-6
