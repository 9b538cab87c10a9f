"""more_like_this (Lucene MoreLikeThis analog) + numeric_percentiles:
term selection determinism, engine identity with the explicit union,
and exact-percentile agreement with numpy's linear interpolation."""

import numpy as np
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import (
    attach_docmap,
    more_like_this,
    numeric_percentiles,
    search,
)
from ostrich_spark.query.parser import BooleanQuery, TermQuery
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_key": 0, "text": "spark spark sparkle stream", "size": 10},
    {"doc_key": 1, "text": "sparse sparkle joins", "size": 20},
    {"doc_key": 2, "text": "spark stream stream shuffle", "size": 35},
    {"doc_key": 3, "text": "spars sharks join the stream", "size": 40},
    {"doc_key": 4, "text": "plain prose without the magic words", "size": 70},
]


@pytest.fixture(scope="module")
def mlt_index(spark, tmp_path_factory):
    schema = Schema()
    schema.add_text_field("text", "default")
    schema.add_numeric_field("size")
    idx = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(
        spark,
        spark.createDataFrame(DOCS),
        schema,
        idx,
        num_partitions=2,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    return idx


def _hits(spark, idx, res_df):
    rows = attach_docmap(spark, idx, res_df).select("doc_key", "score").collect()
    return sorted(
        [(r["doc_key"], round(r["score"], 9)) for r in rows],
        key=lambda t: (-t[1], t[0]),
    )


def test_mlt_source_doc_ranks_first(spark, mlt_index):
    res, _ = more_like_this(spark, mlt_index, "text", DOCS[0]["text"], limit=None)
    hits = _hits(spark, mlt_index, res)
    assert hits[0][0] == 0  # the source doc itself
    assert {d for d, _ in hits} >= {0, 1, 2}  # sparkle/stream neighbors


def test_mlt_equals_explicit_union(spark, mlt_index):
    """Selection = tf*idf desc, term asc, capped; the query IS that
    union, so running the union explicitly must be row-identical."""
    import math

    mf = load_manifest(mlt_index)
    text = DOCS[2]["text"]  # spark stream stream shuffle
    # hand-compute selection: N=5; df(spark)=2, df(stream)=3, df(shuffle)=1
    def idf(df):
        return 1.0 + math.log(5 / (1.0 + df))

    scores = {
        "spark": 1 * idf(2),
        "stream": 2 * idf(3),
        "shuffle": 1 * idf(1),
    }
    top2 = [t for t, _ in sorted(scores.items(), key=lambda p: (-p[1], p[0]))[:2]]
    res, _ = more_like_this(
        spark, mlt_index, "text", text, max_query_terms=2, limit=None, manifest=mf
    )
    explicit = BooleanQuery.union(*[TermQuery(0, t) for t in top2])
    exp, _ = search(spark, mlt_index, explicit, limit=None, manifest=mf)
    assert _hits(spark, mlt_index, res) == _hits(spark, mlt_index, exp)


def test_mlt_min_doc_freq_filters_rare_terms(spark, mlt_index):
    # min_doc_freq=2 drops shuffle (df=1); matches = spark/stream docs
    res, _ = more_like_this(
        spark, mlt_index, "text", DOCS[2]["text"], min_doc_freq=2, limit=None
    )
    assert {d for d, _ in _hits(spark, mlt_index, res)} == {0, 2, 3}


def test_mlt_unknown_terms_only_is_empty(spark, mlt_index):
    res, _ = more_like_this(spark, mlt_index, "text", "zzz qqq", limit=None)
    assert res.count() == 0


def test_mlt_rejects_numeric_field(spark, mlt_index):
    with pytest.raises(ValueError, match="not a text field"):
        more_like_this(spark, mlt_index, "size", "anything")


def test_numeric_percentiles_matches_numpy(spark, mlt_index):
    res = numeric_percentiles(
        spark, mlt_index, "text:stream", "size", (0.0, 0.25, 0.5, 1.0)
    )
    got = {r["p"]: r["value"] for r in res.collect()}
    vals = [10, 35, 40]  # docs 0, 2, 3 match text:stream
    for p in (0.0, 0.25, 0.5, 1.0):
        assert got[p] == pytest.approx(
            float(np.percentile(vals, p * 100)), rel=1e-12
        ), p


def test_numeric_percentiles_validation(spark, mlt_index):
    with pytest.raises(ValueError, match="within"):
        numeric_percentiles(spark, mlt_index, "text:stream", "size", (1.5,))
    with pytest.raises(ValueError, match="numeric doc-value"):
        numeric_percentiles(spark, mlt_index, "text:stream", "text")
