"""field_value_factor function score — ES function_score analog
(EXTENSION). Function values hand-computed from the ES modifier table
(log-family base 10, ln-family natural), combined with organic tfidf
scores fetched from the plain search path."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import (
    attach_docmap,
    search,
    search_field_value_factor,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "spark merge policy", "rank_v": 10.0},
    {"doc_id": 1, "text": "spark spark query", "rank_v": 0.0},
    {"doc_id": 2, "text": "merge segment index", "rank_v": 5.0},
    {"doc_id": 3, "text": "sparse matrix solver", "rank_v": None},
    {"doc_id": 4, "text": "spark window join", "rank_v": 2.0},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("rank_v", "double")
    return s


@pytest.fixture(scope="module")
def fvf_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fvf") / "idx")
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
    rows = attach_docmap(spark, idx, df).select(
        "doc_id", "score", "base_score"
    ).collect()
    return {r["doc_id"]: (r["score"], r["base_score"]) for r in rows}


def _organic(spark, idx, q="text:spark"):
    res, _ = search(spark, idx, q, limit=None, scorer="tfidf")
    rows = attach_docmap(spark, idx, res).select("doc_id", "score").collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_multiply_ln1p_hand(spark, fvf_index):
    """multiply is the ES default boost_mode; ln1p(factor*v) natural."""
    base = _organic(spark, fvf_index)
    out = search_field_value_factor(
        spark, fvf_index, "text:spark", "rank_v",
        factor=0.5, modifier="ln1p", limit=None,
    )
    got = _by_id(spark, fvf_index, out)
    assert set(got) == {0, 1, 4}
    for d, v in ((0, 10.0), (1, 0.0), (4, 2.0)):
        want = base[d] * math.log1p(0.5 * v)
        assert got[d][0] == pytest.approx(want, rel=1e-12)
        assert got[d][1] == pytest.approx(base[d], rel=1e-12)
    # rank_v=0 -> ln1p(0)=0 -> multiplied score exactly 0
    assert got[1][0] == 0.0


def test_sum_log10_hand(spark, fvf_index):
    """log modifier is COMMON log (base 10), the ES table."""
    base = _organic(spark, fvf_index)
    out = search_field_value_factor(
        spark, fvf_index, "text:merge", "rank_v",
        factor=2.0, modifier="log", boost_mode="sum", limit=None,
    )
    got = _by_id(spark, fvf_index, out)
    assert set(got) == {0, 2}
    base_m = _organic(spark, fvf_index, "text:merge")
    for d, v in ((0, 10.0), (2, 5.0)):
        want = base_m[d] + math.log10(2.0 * v)
        assert got[d][0] == pytest.approx(want, rel=1e-12)


def test_missing_param_and_loud_null(spark, fvf_index):
    # doc 3 (NULL rank_v) matches; missing=7 substitutes before factor
    base = _organic(spark, fvf_index, "text:solver")
    out = search_field_value_factor(
        spark, fvf_index, "text:solver", "rank_v",
        factor=1.0, modifier="sqrt", missing=7.0, limit=None,
    )
    got = _by_id(spark, fvf_index, out)
    assert got[3][0] == pytest.approx(base[3] * math.sqrt(7.0), rel=1e-12)
    # without missing: the ES "Missing value for field" contract -> fail
    with pytest.raises(Exception, match="missing value for field"):
        search_field_value_factor(
            spark, fvf_index, "text:solver", "rank_v", limit=None
        ).collect()


def test_domain_error_is_loud(spark, fvf_index):
    # doc 1 has rank_v = 0: reciprocal and log must fail the job, not
    # emit Infinity ranks
    for mod in ("reciprocal", "log", "ln"):
        with pytest.raises(Exception, match="domain error"):
            search_field_value_factor(
                spark, fvf_index, "text:spark", "rank_v",
                modifier=mod, limit=None,
            ).collect()


def test_negative_function_value_allowed(spark, fvf_index):
    # modifier none with a negative factor: ES allows negative function
    # scores from field_value_factor (only script_score forbids them)
    out = search_field_value_factor(
        spark, fvf_index, "text:spark", "rank_v",
        factor=-1.0, modifier="none", limit=None,
    )
    got = _by_id(spark, fvf_index, out)
    assert got[0][0] == pytest.approx(-10.0 * got[0][1], rel=1e-12)


def test_topk_order_and_validation(spark, fvf_index):
    out = search_field_value_factor(
        spark, fvf_index, "text:spark", "rank_v",
        factor=1.0, modifier="square", limit=2,
    ).collect()
    # square of (10, 0, 2) reorders: doc 0 (x100) first, doc 4 (x4) next
    ids = [r["doc"] for r in out]
    assert len(out) == 2 and out[0]["score"] >= out[1]["score"]
    with pytest.raises(ValueError, match="modifier"):
        search_field_value_factor(
            spark, fvf_index, "text:spark", "rank_v", modifier="cube"
        )
    with pytest.raises(ValueError, match="boost_mode"):
        search_field_value_factor(
            spark, fvf_index, "text:spark", "rank_v", boost_mode="avg"
        )
    with pytest.raises(ValueError):
        search_field_value_factor(
            spark, fvf_index, "text:spark", "nope_field"
        )
