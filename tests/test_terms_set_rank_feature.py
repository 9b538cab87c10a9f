"""terms_set (Lucene CoveringQuery / ES minimum_should_match_field) and
rank_feature (Lucene FeatureQuery / ES rank_feature) queries."""

import math

import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search, search_rank_feature
from ostrich_spark.query.parser import (
    MUST,
    BooleanQuery,
    QueryParseError,
    TermQuery,
    TermsSetQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    # id, tags, required_matches (None = missing doc value)
    (0, "java spark flink", 2),
    (1, "java only here", 1),
    (2, "java spark pair", 3),       # 2 matches < m=3 -> out
    (3, "java spark beam trio", 3),  # 3 matches = m -> in
    (4, "beam solo", None),          # missing m -> floor 1 -> in
    (5, "rust zig nothing", 1),      # matches 0 query terms -> out
]


@pytest.fixture(scope="module")
def ts_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tsidx") / "idx")
    df = spark.createDataFrame(DOCS, "id long, tags string, required_matches long")
    s = Schema()
    s.add_text_field("tags", "default")
    s.add_numeric_field("required_matches")
    build_index(spark, df, s, d, num_partitions=2, order_col="id",
                id_cols=["id"], build_id="ts")
    return d


def _ids(spark, idx, res, mf):
    return sorted(
        r["id"] for r in attach_docmap(spark, idx, res, manifest=mf)
        .select("id").collect()
    )


class TestTermsSet:
    def test_per_doc_threshold(self, spark, ts_index):
        mf = load_manifest(ts_index)
        fe = mf.schema.field_by_name("tags")
        mfe = mf.schema.field_by_name("required_matches")
        q = TermsSetQuery(fe.id, ("java", "spark", "beam"), mfe.id)
        res, _ = search(spark, ts_index, q, limit=None, manifest=mf)
        assert _ids(spark, ts_index, res, mf) == [0, 1, 3, 4]

    def test_score_is_sum_of_matching_terms(self, spark, ts_index):
        mf = load_manifest(ts_index)
        fe = mf.schema.field_by_name("tags")
        mfe = mf.schema.field_by_name("required_matches")
        q = TermsSetQuery(fe.id, ("java", "spark", "beam"), mfe.id)
        res, _ = search(spark, ts_index, q, limit=None, manifest=mf)
        got = {
            r["id"]: r["score"]
            for r in attach_docmap(spark, ts_index, res, manifest=mf).collect()
        }
        # the OR query scores identically for docs that pass the threshold
        or_q = parse_query("tags:java OR tags:spark OR tags:beam", mf.schema)
        or_res, _ = search(spark, ts_index, or_q, limit=None, manifest=mf)
        want = {
            r["id"]: r["score"]
            for r in attach_docmap(spark, ts_index, or_res, manifest=mf).collect()
        }
        for i, s in got.items():
            assert s == pytest.approx(want[i], rel=1e-12)

    def test_absent_terms_cannot_count(self, spark, ts_index):
        mf = load_manifest(ts_index)
        fe = mf.schema.field_by_name("tags")
        mfe = mf.schema.field_by_name("required_matches")
        # 'java' + two absent terms: doc 0 needs m=2 but only 1 can match
        q = TermsSetQuery(fe.id, ("java", "nosuchterm", "absentterm"), mfe.id)
        res, _ = search(spark, ts_index, q, limit=None, manifest=mf)
        assert _ids(spark, ts_index, res, mf) == [1]  # only m=1 docs w/ java
        # every term absent -> empty
        q2 = TermsSetQuery(fe.id, ("nosuchterm",), mfe.id)
        res2, _ = search(spark, ts_index, q2, limit=None, manifest=mf)
        assert res2.count() == 0

    def test_composes_in_boolean_tree(self, spark, ts_index):
        mf = load_manifest(ts_index)
        fe = mf.schema.field_by_name("tags")
        mfe = mf.schema.field_by_name("required_matches")
        q = BooleanQuery(
            [
                (MUST, TermsSetQuery(fe.id, ("java", "spark", "beam"), mfe.id)),
                (MUST, TermQuery(fe.id, "trio")),
            ]
        )
        res, _ = search(spark, ts_index, q, limit=None, manifest=mf)
        assert _ids(spark, ts_index, res, mf) == [3]

    def test_tombstoned_doc_excluded(self, spark, tmp_path):
        from ostrich_spark.deletes import delete_docs

        d = str(tmp_path / "tsd")
        df = spark.createDataFrame(DOCS, "id long, tags string, required_matches long")
        s = Schema()
        s.add_text_field("tags", "default")
        s.add_numeric_field("required_matches")
        build_index(spark, df, s, d, num_partitions=2, order_col="id",
                    id_cols=["id"], build_id="tsd")
        delete_docs(spark, d, spark.createDataFrame([(0,)], "id long"), ["id"])
        mf = load_manifest(d)
        fe = mf.schema.field_by_name("tags")
        mfe = mf.schema.field_by_name("required_matches")
        q = TermsSetQuery(fe.id, ("java", "spark", "beam"), mfe.id)
        res, _ = search(spark, d, q, limit=None, manifest=mf)
        assert _ids(spark, d, res, mf) == [1, 3, 4]

    def test_validation(self):
        with pytest.raises(QueryParseError):
            TermsSetQuery(0, (), 1)


class TestRankFeature:
    @pytest.fixture(scope="class")
    def rf_index(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("rfidx") / "idx")
        rows = [
            (0, "spark engine fast", 10.0),
            (1, "spark engine slow", 100.0),
            (2, "spark other", None),
        ]
        df = spark.createDataFrame(rows, "id long, text string, pagerank double")
        s = Schema()
        s.add_text_field("text", "default")
        s.add_numeric_field("pagerank", "double")
        build_index(spark, df, s, d, num_partitions=1, order_col="id",
                    id_cols=["id"], build_id="rf")
        return d

    def _scores(self, spark, idx, **kw):
        out = search_rank_feature(spark, idx, "text:spark", "pagerank",
                                  limit=None, **kw)
        return {
            r["id"]: (r["score"], r["base_score"])
            for r in attach_docmap(spark, idx, out,
                                   manifest=load_manifest(idx)).collect()
        }

    def test_saturation_hand_values(self, spark, rf_index):
        got = self._scores(spark, rf_index, function="saturation", pivot=10.0,
                           boost=2.0)
        for i, v in ((0, 10.0), (1, 100.0)):
            s, base = got[i]
            assert s == pytest.approx(base + 2.0 * v / (v + 10.0), rel=1e-12)
        s2, base2 = got[2]
        assert s2 == pytest.approx(base2)  # NULL feature adds 0

    def test_log_and_sigmoid_hand_values(self, spark, rf_index):
        got = self._scores(spark, rf_index, function="log", scaling_factor=1.0)
        s, base = got[1]
        assert s == pytest.approx(base + math.log(1.0 + 100.0), rel=1e-12)
        got = self._scores(spark, rf_index, function="sigmoid", pivot=50.0,
                           exponent=2.0)
        s, base = got[1]
        want = 100.0**2 / (100.0**2 + 50.0**2)
        assert s == pytest.approx(base + want, rel=1e-12)

    def test_negative_feature_fails_loudly(self, spark, tmp_path):
        d = str(tmp_path / "neg")
        df = spark.createDataFrame(
            [(0, "spark bad", -5.0)], "id long, text string, pagerank double"
        )
        s = Schema()
        s.add_text_field("text", "default")
        s.add_numeric_field("pagerank", "double")
        build_index(spark, df, s, d, num_partitions=1, order_col="id",
                    id_cols=["id"], build_id="neg")
        with pytest.raises(Exception, match="rank_feature|assert"):
            search_rank_feature(
                spark, d, "text:spark", "pagerank",
                function="saturation", pivot=1.0, limit=None,
            ).collect()

    def test_validation(self, spark, rf_index):
        with pytest.raises(ValueError, match="pivot"):
            search_rank_feature(spark, rf_index, "text:spark", "pagerank")
        with pytest.raises(ValueError, match="scaling_factor"):
            search_rank_feature(spark, rf_index, "text:spark", "pagerank",
                                function="log", scaling_factor=0.5)
        with pytest.raises(ValueError, match="sigmoid"):
            search_rank_feature(spark, rf_index, "text:spark", "pagerank",
                                function="sigmoid", pivot=1.0)
        with pytest.raises(ValueError, match="function"):
            search_rank_feature(spark, rf_index, "text:spark", "pagerank",
                                function="linear", pivot=1.0)
