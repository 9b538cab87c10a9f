"""Hybrid retrieval — Reciprocal Rank Fusion (ES 8.x `rrf` retriever):
fused(d) = Σ 1/(rank_constant + rank). Hand-computed fusion sums, the
agreement-beats-position property, tie determinism, and the end-to-end
hybrid_search identity with a manual text+vector fusion."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.schema import Schema
from ostrich_spark.similarity import brute_force_topk, hybrid_search, rrf_fuse


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, score double")


def test_rrf_hand_math_and_agreement(spark):
    # list A ranks: 1->r1, 2->r2, 3->r3 ; list B ranks: 3->r1, 1->r2
    a = _df(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
    b = _df(spark, [(3, 0.9), (1, 0.5)])
    out = {r["id"]: r for r in rrf_fuse([a, b], "id", k=10,
                                        rank_constant=60).collect()}
    assert out[1]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62, rel=1e-12)
    assert out[3]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61, rel=1e-12)
    assert out[2]["rrf_score"] == pytest.approx(1 / 62, rel=1e-12)
    assert out[1]["n_lists"] == 2 and out[2]["n_lists"] == 1
    # agreement beats position: doc 2 is rank-2 in A but single-list,
    # doc 3 is LAST in A yet fused above it via its B rank
    ordered = [r["id"] for r in rrf_fuse([a, b], "id", k=10).collect()]
    assert ordered == [1, 3, 2]


def test_rrf_ties_and_k_cut(spark):
    # equal scores rank by id asc (deterministic)
    a = _df(spark, [(7, 1.0), (5, 1.0), (9, 1.0)])
    out = rrf_fuse([a], "id", k=2).collect()
    assert [r["id"] for r in out] == [5, 7]
    assert out[0]["rrf_score"] == pytest.approx(1 / 61, rel=1e-12)
    assert out[1]["rrf_score"] == pytest.approx(1 / 62, rel=1e-12)


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match=">= 1 ranked"):
        rrf_fuse([], "id")
    with pytest.raises(ValueError, match="rank_constant"):
        rrf_fuse([_df(spark, [(1, 1.0)])], "id", rank_constant=0)
    with pytest.raises(ValueError, match="score"):
        rrf_fuse([_df(spark, [(1, 1.0)]).select("id")], "id")


def test_hybrid_search_end_to_end(spark, tmp_path):
    """hybrid_search == manual rrf_fuse(search, brute_force_topk)."""
    docs = [
        {"doc_id": i, "text": "filler words " + ("spark " * (1 + i % 4))}
        for i in range(10)
    ]
    s = Schema()
    s.add_text_field("text", "default")
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    # embeddings: cosine to [1, 0] decreasing with doc_id
    emb = spark.createDataFrame(
        [(i, [1.0, 0.1 * i]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    qv = [1.0, 0.0]
    got = hybrid_search(
        spark, idx, "text:spark", emb, qv, id_col="doc_id",
        k=5, window=None, scorer="tfidf",
    ).collect()

    from ostrich_spark.query.exec import attach_docmap, search

    res, _ = search(spark, idx, "text:spark", limit=None, scorer="tfidf")
    text = attach_docmap(spark, idx, res).select(
        "doc_id", F.col("score").cast("double").alias("score")
    )
    vec = brute_force_topk(emb, qv, k=None).select(
        F.col("vec_id").alias("doc_id"), F.col("sim").alias("score")
    )
    want = rrf_fuse([text, vec], ["doc_id"], k=5).collect()
    assert [(r["doc_id"], round(r["rrf_score"], 12)) for r in got] == [
        (r["doc_id"], round(r["rrf_score"], 12)) for r in want
    ]
    # every doc matches text (all contain spark) and has a vector
    assert all(r["n_lists"] == 2 for r in got)
    # the fused top doc balances text tf rank and vector-closeness rank
    assert got[0]["rrf_score"] == pytest.approx(
        max(r["rrf_score"] for r in got), rel=1e-12
    )


def test_filtered_ann_knn_filter(spark, tmp_path):
    """ES knn filter: top-k among ELIGIBLE vectors only — the nearest
    vector overall is excluded when its doc fails the filter, and a
    far-but-eligible vector ranks instead (never top-k-then-filter)."""
    from ostrich_spark.similarity import filtered_ann

    docs = [
        {"doc_id": i, "text": ("hot spark" if i % 2 == 0 else "cold spark")}
        for i in range(10)
    ]
    s = Schema()
    s.add_text_field("text", "default")
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    # vec i at angle i*5 degrees from the query: doc 1 (cold) is the
    # global 2nd-nearest; the filter must skip it
    import math as m

    emb = spark.createDataFrame(
        [(i, [m.cos(m.radians(5 * i)), m.sin(m.radians(5 * i))])
         for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    qv = [1.0, 0.0]
    got = filtered_ann(
        spark, idx, "text:hot", emb, qv, id_col="doc_id", k=3
    ).collect()
    assert [r["vec_id"] for r in got] == [0, 2, 4]  # evens only, nearest-first
    # vs unfiltered: doc 1 IS the global runner-up
    allr = brute_force_topk(emb, qv, k=3).collect()
    assert [r["vec_id"] for r in allr] == [0, 1, 2]
    # k beyond the eligible set returns every eligible vector
    assert len(
        filtered_ann(spark, idx, "text:hot", emb, qv, "doc_id", k=50).collect()
    ) == 5
    # no-match filter -> empty
    assert filtered_ann(
        spark, idx, "text:zzz", emb, qv, "doc_id", k=3
    ).collect() == []


class TestLinearFuse:
    """ES 8.16 `linear` retriever analog: weighted sum of min-max
    normalized scores; hand-computed fixtures."""

    def _lists(self, spark):
        a = spark.createDataFrame(
            [(1, 10.0), (2, 5.0), (3, 0.0)], "id long, score double"
        )
        b = spark.createDataFrame(
            [(2, 2.0), (3, 4.0), (4, 3.0)], "id long, score double"
        )
        return a, b

    def test_minmax_weighted_hand_computed(self, spark):
        from ostrich_spark.similarity import linear_fuse

        a, b = self._lists(spark)
        got = {
            r["id"]: (r["linear_score"], r["n_lists"])
            for r in linear_fuse([a, b], "id", k=10, weights=[2.0, 1.0]).collect()
        }
        # a norms: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0 ; b norms: 2 -> 0.0,
        # 3 -> 1.0, 4 -> 0.5
        assert got[1] == (2.0, 1)
        assert got[2] == (2 * 0.5 + 0.0, 2)
        assert got[3] == (0.0 + 1.0, 2)
        assert got[4] == (0.5, 1)

    def test_degenerate_none_ordering_validation(self, spark):
        import pytest

        from ostrich_spark.similarity import linear_fuse

        a, b = self._lists(spark)
        one = spark.createDataFrame([(7, 3.3), (8, 3.3)], "id long, score double")
        got = {
            r["id"]: r["linear_score"]
            for r in linear_fuse([one], "id", k=10).collect()
        }
        # single-valued list: everyone normalizes to 1.0 (documented)
        assert got == {7: 1.0, 8: 1.0}
        # none: raw sums
        got = {
            r["id"]: r["linear_score"]
            for r in linear_fuse([a, b], "id", k=10, normalizer="none").collect()
        }
        assert got[2] == 7.0 and got[3] == 4.0
        # ordering + k cut deterministic
        top = linear_fuse([a, b], "id", k=2).collect()
        assert [r["id"] for r in top] == sorted(
            [1, 2, 3, 4],
            key=lambda i: (-{1: 1.0, 2: 0.5, 3: 1.0, 4: 0.5}[i], i),
        )[:2]
        with pytest.raises(ValueError, match="normalizer"):
            linear_fuse([a], "id", normalizer="zscore")
        with pytest.raises(ValueError, match="weights"):
            linear_fuse([a, b], "id", weights=[1.0])
        with pytest.raises(ValueError, match="ranked"):
            linear_fuse([], "id")
