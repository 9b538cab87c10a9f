"""children / parent aggregations (ES `children` / `parent` agg analogs):
a parent-context query buckets its CHILD docs (doc_count = children) and
the reverse buckets DISTINCT parents — brute-forced over the fixture."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.relations import children_facet, parent_facet
from ostrich_spark.schema import Schema

DOCS = [
    # doc_id, text, rel, parent
    (10, "spark joins question", "q", None),
    (20, "window question", "q", None),
    (30, "streaming question spark", "q", None),
    (40, "orphan question", "q", None),
    (11, "spark answer first", "a", "10"),
    (12, "spark spark answer", "a", "10"),
    (13, "plain answer", "a", "10"),
    (21, "spark answer", "a", "20"),
    (31, "totally unrelated", "a", "30"),
    (99, "spark answer dangling", "a", "777"),  # no live parent
    (98, "spark answer orphanless", "a", None),  # NULL parent never joins
]

KW = dict(
    relation_field="rel", parent_relation="q", child_relation="a",
    parent_field="parent", id_col="doc_id",
)


def _build(spark, path):
    s = Schema()
    s.add_text_field("text", "default")
    s.add_keyword_field("rel")
    s.add_keyword_field("parent")
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, rel string, parent string"
    )
    build_index(
        spark, df, s, str(path), num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"],
    )
    return str(path)


@pytest.fixture(scope="module")
def rel_idx(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory.mktemp("relagg") / "idx")


def test_children_by_parent_hand_counts(spark, rel_idx):
    """All 'question' parents matched -> children bucketed by parent key
    with a max_by-style metric; dangling/NULL-parent children excluded."""
    rows = children_facet(
        spark, rel_idx, "text:question", by="parent",
        metrics={"max_id": ("max", "doc_id")}, **KW,
    ).collect()
    got = {r["parent"]: (r["n_docs"], r["max_id"]) for r in rows}
    assert got == {"10": (3, 13), "20": (1, 21), "30": (1, 31)}


def test_children_global_and_narrowed_parents(spark, rel_idx):
    one = children_facet(spark, rel_idx, "text:question", **KW).collect()[0]
    assert one["n_docs"] == 5
    spark_only = children_facet(spark, rel_idx, "text:spark", **KW).collect()[0]
    assert spark_only["n_docs"] == 4  # parents 10 and 30 only


def test_parent_facet_distinct_parents(spark, rel_idx):
    """Children matching 'spark': 11, 12, 21, 99, 98 -> parent keys
    {10, 10, 20, 777, NULL} -> live DISTINCT parents {10, 20}."""
    one = parent_facet(spark, rel_idx, "text:spark", **KW).collect()[0]
    assert one["n_docs"] == 2
    rows = parent_facet(
        spark, rel_idx, "text:spark", by="rel",
        metrics={"min_id": ("min", "doc_id")}, **KW,
    ).collect()
    assert [(r["rel"], r["n_docs"], r["min_id"]) for r in rows] == [("q", 2, 10)]


def test_tombstoned_child_drops(spark, tmp_path):
    idx = _build(spark, tmp_path / "idx")
    match_df = spark.createDataFrame([(13,)], "doc_id long")
    assert delete_docs(spark, idx, match_df, ["doc_id"]) == 1
    rows = children_facet(
        spark, idx, "text:question", by="parent", **KW
    ).collect()
    got = {r["parent"]: r["n_docs"] for r in rows}
    assert got == {"10": 2, "20": 1, "30": 1}


def test_validation(spark, rel_idx):
    with pytest.raises(ValueError, match="docmap"):
        children_facet(spark, rel_idx, "text:question", by="nosuch", **KW)
    with pytest.raises(ValueError, match="fn must be"):
        parent_facet(
            spark, rel_idx, "text:spark",
            metrics={"x": ("frobnicate", "doc_id")}, **KW,
        )
