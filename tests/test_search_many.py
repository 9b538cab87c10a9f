"""Batched multi-query execution (search_many) — the whole query set runs
as ONE Spark job, row-identical per query to the one-job-per-query path.

The reference runs each query in-process where per-query fixed cost is ~0
(/root/reference/reader/search.go:21-66); on Spark the ~0.5s scheduling
floor must be amortized across the set — this suite pins the equivalence
that makes the batched path safe to use everywhere."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.query.exec import search, search_many
from ostrich_spark.query.parser import AllQuery
from ostrich_spark.schema import Schema

QUERY_SET = {
    "term_common": "content:merge_policy",
    "term_rare": "content:rareterm007",
    "and_mixed": "content:rareterm007 AND content:the",
    "or_fanout": "content:search OR content:index OR content:query OR content:term",
    "nested": "(content:func OR content:def) AND (content:search or content:index)",
    "must_should": "content:the AND (content:search OR content:index)",
    "phrase": 'content:"merge policy"',
    "missing_term": "content:zzzznotaterm",
}


@pytest.fixture(scope="module")
def batch_idx(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("many")
    idx = str(tmp / "idx")
    pdf = make_corpus(400, seed=11)
    s = Schema()
    s.add_text_field("content", "default", positions=True)
    build_index(
        spark, spark.createDataFrame(pdf), s, idx,
        num_partitions=4, order_col="path", id_cols=["path"], build_id="many",
    )
    return idx


def _rows(df):
    return [
        (r["segment_id"], r["doc"], round(r["score"], 9))
        for r in df.select("segment_id", "doc", "score").collect()
    ]


def _assert_batch_matches_individual(spark, idx, queries, scorer, limit=10):
    batched = search_many(spark, idx, queries, limit=limit, scorer=scorer)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append(
            (r["segment_id"], r["doc"], round(r["score"], 9))
        )
    for qid, q in queries.items():
        res, _ = search(spark, idx, q, limit=limit, scorer=scorer)
        want = _rows(res)
        assert got.get(qid, []) == want, f"{qid} ({scorer}) diverged"


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_batched_identical_to_individual(spark, batch_idx, scorer):
    _assert_batch_matches_individual(spark, batch_idx, QUERY_SET, scorer)


def test_batched_includes_all_and_empty_queries(spark, batch_idx):
    queries = dict(QUERY_SET)
    queries["everything"] = AllQuery()
    batched = search_many(spark, batch_idx, queries, limit=5)
    by_q = {}
    for r in batched.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    # AllQuery: 5 rows, all score 1.0, pinned order
    allq = by_q["everything"]
    assert len(allq) == 5
    assert all(r["score"] == 1.0 for r in allq)
    keys = [(r["segment_ord"], r["doc"]) for r in allq]
    assert keys == sorted(keys)
    # empty-term query contributes no rows
    assert "missing_term" not in by_q
    # other queries still present and identical to individual
    res, _ = search(spark, batch_idx, QUERY_SET["term_common"], limit=5)
    assert [
        (r["segment_id"], r["doc"], round(r["score"], 9)) for r in by_q["term_common"]
    ] == _rows(res)


def test_batched_with_tombstones(spark, batch_idx, tmp_path):
    import shutil

    from ostrich_spark.deletes import delete_docs
    from ostrich_spark.query.exec import attach_docmap

    idx = str(tmp_path / "idx_del")
    shutil.copytree(batch_idx, idx)
    # tombstone a handful of docs that match the common term
    res, _ = search(spark, idx, "content:merge_policy", limit=3)
    victims = attach_docmap(spark, idx, res).select("path")
    n = delete_docs(spark, idx, victims, ["path"])
    assert n == 3
    _assert_batch_matches_individual(spark, idx, QUERY_SET, "bm25")


def test_batched_offset_pagination(spark, batch_idx):
    q = {"page": QUERY_SET["or_fanout"]}
    page2 = search_many(spark, batch_idx, q, limit=5, offset=5)
    res, _ = search(spark, batch_idx, q["page"], limit=5, offset=5)
    assert _rows(page2) == _rows(res)


def test_batched_is_one_job_per_stage_shape(spark, batch_idx):
    """Plan guard: the batched path must contain exactly ONE postings scan
    (not one per query) and a single window rank for the global cut."""
    batched = search_many(spark, batch_idx, QUERY_SET, limit=10)
    plan = batched._jdf.queryExecution().executedPlan().toString()
    assert plan.count("postings.parquet") <= 1 or plan.count("Scan parquet") <= 2
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_batched_fuzz_identity_two_field(spark, tmp_path_factory):
    """The GENERATED_QUERIES fixture set (rare/common/stopword/absent/
    nested/stemmed/bare multi-field shapes) run as ONE batch must be
    row-identical per query to the per-query path on a two-field
    default+en_stem index."""
    from ostrich_spark.corpus import make_corpus
    from ostrich_spark.schema import Schema
    from tests.test_generated_queries import GENERATED_QUERIES

    tmp = tmp_path_factory.mktemp("manyfuzz")
    pdf = make_corpus(200, seed=21)
    comments = [
        f"having serious confidence in the outcome {i} searching indexes quickly"
        if i % 3 == 0
        else f"decided situations are tested only in {i} seconds"
        for i in range(len(pdf))
    ]
    pdf = pdf.assign(comment=comments)
    schema = Schema()
    schema.add_text_field("content", "default")
    schema.add_text_field("comment", "en_stem")
    idx = str(tmp / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), schema, idx,
        num_partitions=4, order_col="path", id_cols=["path"], build_id="mf",
    )
    queries = {f"g{i}": q for i, q in enumerate(GENERATED_QUERIES)}
    for scorer in ("tfidf", "bm25"):
        _assert_batch_matches_individual(spark, idx, queries, scorer, limit=None)
