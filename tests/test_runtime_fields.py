"""Runtime fields (ES runtime mappings) + random_score function score."""

import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search_random_score
from ostrich_spark.runtime_fields import (
    facet_runtime,
    search_runtime,
    with_runtime_fields,
)
from ostrich_spark.schema import Schema

DOCS = [
    (0, "spark merge fast", 120, "py"),
    (1, "spark merge slow", 250, "go"),
    (2, "spark other thing", 305, "py"),
    (3, "unrelated words", 90, "rs"),
    (4, "spark spark spark", 310, "go"),
]


@pytest.fixture(scope="module")
def rt_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rt") / "idx")
    df = spark.createDataFrame(DOCS, "id long, text string, n long, lang string")
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("n")
    s.add_keyword_field("lang")
    build_index(spark, df, s, d, num_partitions=2, order_col="id",
                id_cols=["id"], build_id="rt")
    return d


class TestRuntimeFields:
    def test_collision_rejected(self, spark, rt_index):
        mf = load_manifest(rt_index)
        from ostrich_spark.query.exec import read_docmap

        dm = read_docmap(spark, rt_index, mf)
        with pytest.raises(ValueError, match="collides"):
            with_runtime_fields(dm, {"n": "n + 1"})
        with pytest.raises(ValueError, match="collides"):
            with_runtime_fields(dm, {"doc": "n"})

    def test_filter_and_sort_on_runtime_field(self, spark, rt_index):
        out = search_runtime(
            spark, rt_index, "text:spark",
            fields={"bucket": "CAST(floor(n / 100.0) AS BIGINT)",
                    "tag": "concat(lang, '-', CAST(n AS STRING))"},
            predicate="bucket >= 1",
            sort_by=[("bucket", "desc"), ("id", "asc")],
            limit=None,
        )
        rows = out.select("id", "bucket", "tag").collect()
        assert [(r["id"], r["bucket"]) for r in rows] == [
            (2, 3), (4, 3), (1, 2), (0, 1),
        ]
        assert rows[0]["tag"] == "py-305"

    def test_facet_runtime_counts(self, spark, rt_index):
        out = facet_runtime(
            spark, rt_index, "text:spark",
            expr="CAST(floor(n / 100.0) AS BIGINT)", alias="bucket",
        )
        got = {r["bucket"]: r["n_docs"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}

    def test_facet_runtime_topk_and_nulls(self, spark, rt_index):
        out = facet_runtime(
            spark, rt_index, "text:spark",
            expr="CASE WHEN lang = 'py' THEN NULL ELSE lang END",
            alias="l", k=1,
        )
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["l"] == "go" and rows[0]["n_docs"] == 2

    def test_relevance_order_default(self, spark, rt_index):
        out = search_runtime(
            spark, rt_index, "text:spark", fields={"b": "n * 2"}, limit=1
        )
        assert out.first()["id"] == 4  # tf=3 doc ranks first


class TestRandomScore:
    def test_deterministic_and_modes(self, spark, rt_index):
        mf = load_manifest(rt_index)
        a = {
            r["id"]: (r["score"], r["base_score"], r["rand"])
            for r in attach_docmap(
                spark, rt_index,
                search_random_score(spark, rt_index, "text:spark", seed="u1",
                                    key_col="id", mode="sum", weight=2.0,
                                    limit=None, manifest=mf),
                manifest=mf,
            ).collect()
        }
        b = {
            r["id"]: (r["score"], r["base_score"], r["rand"])
            for r in attach_docmap(
                spark, rt_index,
                search_random_score(spark, rt_index, "text:spark", seed="u1",
                                    key_col="id", mode="sum", weight=2.0,
                                    limit=None, manifest=mf),
                manifest=mf,
            ).collect()
        }
        assert a == b  # bit-stable across runs
        for i, (s, base, r) in a.items():
            assert 0.0 <= r < 1.0
            assert s == pytest.approx(base + 2.0 * r, rel=1e-12)

    def test_seed_changes_order_replace_mode(self, spark, rt_index):
        mf = load_manifest(rt_index)

        def order(seed):
            res = search_random_score(
                spark, rt_index, "text:spark", seed=seed, key_col="id",
                mode="replace", limit=None, manifest=mf,
            )
            return [
                r["id"]
                for r in attach_docmap(spark, rt_index, res, manifest=mf)
                .orderBy(F.desc("score")).collect()
            ]

        orders = {tuple(order(s)) for s in ("s1", "s2", "s3", "s4", "s5")}
        assert len(orders) > 1  # different seeds shuffle differently
        assert all(sorted(o) == [0, 1, 2, 4] for o in orders)

    def test_validation(self, spark, rt_index):
        with pytest.raises(ValueError, match="mode"):
            search_random_score(spark, rt_index, "text:spark", seed=1,
                                mode="max")
        with pytest.raises(ValueError, match="key column"):
            search_random_score(spark, rt_index, "text:spark", seed=1,
                                key_col="nope", limit=None).collect()
