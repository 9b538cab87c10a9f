"""rank_eval — ES _rank_eval analog: precision/recall/MRR/DCG/NDCG/ERR
over rated requests, one batched Spark job. Hand-computed goldens on a
deterministic single-segment ranking (tf-ordered, tie-break doc asc)."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.rank_eval import rank_eval
from ostrich_spark.schema import Schema

DOCS = [
    (0, "spark spark spark"),
    (1, "spark spark x"),
    (2, "spark y z"),
    (3, "other stuff"),
    (4, "spark w"),
]
# tfidf: idf(spark) = 1 + ln(5/(1+4)) = 1 → scores 3, 2, 1, 1
# ranking for text:spark = [0, 1, 2, 4] (tie 2 vs 4 → doc asc)
RATINGS = {0: 3, 2: 1, 4: 0, 7: 2}  # 1 unrated; 7 rated but unretrieved


@pytest.fixture(scope="module")
def rex(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("rankeval") / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    build_index(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"),
        s, idx, num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _one(spark, rex, metric, **kw):
    out = rank_eval(
        spark, rex, {"q": ("text:spark", RATINGS)}, "doc_id",
        metric=metric, k=4, scorer="tfidf", **kw,
    )
    return out["metric_score"], out["details"]["q"]


def test_ranking_and_hits_shape(spark, rex):
    _, d = _one(spark, rex, "precision")
    assert [h[0] for h in d["hits"]] == [0, 1, 2, 4]
    assert [h[1] for h in d["hits"]] == [3, None, 1, 0]
    assert d["unrated_docs"] == 1


def test_precision_variants(spark, rex):
    s, _ = _one(spark, rex, "precision")
    assert s == pytest.approx(2 / 4)  # unrated counts as non-relevant
    s, _ = _one(spark, rex, "precision", ignore_unlabeled=True)
    assert s == pytest.approx(2 / 3)
    s, _ = _one(spark, rex, "precision", relevant_threshold=2)
    assert s == pytest.approx(1 / 4)  # only the rating-3 hit


def test_recall_mrr(spark, rex):
    s, _ = _one(spark, rex, "recall")
    assert s == pytest.approx(2 / 3)  # rated-relevant: {0, 2, 7}; 7 missed
    s, _ = _one(spark, rex, "mrr")
    assert s == 1.0


def test_dcg_ndcg_err_hand_values(spark, rex):
    dcg = 7 / math.log2(2) + 0 + 1 / math.log2(4) + 0
    s, _ = _one(spark, rex, "dcg")
    assert s == pytest.approx(dcg)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    s, _ = _one(spark, rex, "ndcg")
    assert s == pytest.approx(dcg / idcg)
    # ERR with max_relevance = 3 (the request max): R = (2^r - 1)/8
    err = (7 / 8) + 0 + (1 / 3) * (1 / 8) * (1 / 8) + 0
    s, _ = _one(spark, rex, "err")
    assert s == pytest.approx(err)


def test_mean_over_requests_one_job(spark, rex):
    out = rank_eval(
        spark, rex,
        {
            "a": ("text:spark", {0: 1}),          # first hit relevant
            "b": ("text:stuff", {3: 1}),          # only doc 3 matches
            "c": ("text:zzznope", {0: 1}),        # no hits → 0
        },
        "doc_id", metric="mrr", k=3, scorer="tfidf",
    )
    assert out["details"]["a"]["score"] == 1.0
    assert out["details"]["b"]["score"] == 1.0
    assert out["details"]["c"]["score"] == 0.0
    assert out["metric_score"] == pytest.approx(2 / 3)


def test_cli_rankeval(rex, tmp_path):
    import json
    import subprocess
    import sys

    req_file = tmp_path / "reqs.json"
    req_file.write_text(json.dumps({
        "q1": {"query": "text:spark", "ratings": {"0": 1}},
        "q2": {"query": "text:stuff", "ratings": {"3": 1}},
    }))
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "rankeval", "-p", rex,
         "--requests", str(req_file), "--key", "doc_id", "--metric", "mrr",
         "--scorer", "tfidf"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert lines[0].startswith("q1 1.000000")
    assert lines[1].startswith("q2 1.000000")
    assert lines[2] == "mean 1.000000"

    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "rankeval", "-p", rex,
         "--requests", "/nonexistent.json", "--key", "doc_id"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert bad.returncode == 2
    assert "bad --requests file" in bad.stderr


def test_validation(spark, rex):
    with pytest.raises(ValueError, match="metric"):
        rank_eval(spark, rex, {"q": ("text:x", {0: 1})}, "doc_id",
                  metric="f1")
    with pytest.raises(ValueError, match="k must"):
        rank_eval(spark, rex, {"q": ("text:x", {0: 1})}, "doc_id", k=0)
    with pytest.raises(ValueError, match="ratings"):
        rank_eval(spark, rex, {"q": ("text:x", {})}, "doc_id")
    with pytest.raises(ValueError, match="non-negative"):
        rank_eval(spark, rex, {"q": ("text:x", {0: -1})}, "doc_id")
    with pytest.raises(ValueError, match="at least one"):
        rank_eval(spark, rex, {}, "doc_id")
