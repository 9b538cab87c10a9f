"""Nested fields (ES ``nested`` type): hidden element docs, cross-match
semantics, score modes, inner_hits, root filtering, and build hygiene."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ostrich_spark.nested import (
    NESTED_POS,
    NESTED_REL,
    ROOT_REL,
    build_nested_index,
    inner_hits,
    nested_query,
    nested_schema,
    search_roots,
)
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import AllQuery
from ostrich_spark.schema import Schema

ROWS = [
    # the ES cross-matching trap: (alice,1) and (bob,5) — a flattened
    # index would match author:alice AND stars>=5; nested must not
    (1, "spark engine doc", [("alice", 1, "great spark engine"), ("bob", 5, "meh")]),
    (2, "hash join doc", [("alice", 5, "spark spark fast")]),
    (3, "empty comments", []),
    (4, "null comments", None),
    (5, "two matches", [("alice", 7, "spark"), ("alice", 9, "nothing"),
                        ("carol", 2, "spark is nice")]),
]

CORPUS_T = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("comments", T.ArrayType(T.StructType([
        T.StructField("author", T.StringType()),
        T.StructField("stars", T.LongType()),
        T.StructField("body", T.StringType()),
    ]))),
])


def _schemas():
    root = Schema()
    root.add_text_field("text", "default")
    sub = Schema()
    sub.add_keyword_field("author")
    sub.add_numeric_field("stars")
    sub.add_text_field("body", "default")
    return root, sub


@pytest.fixture(scope="module")
def nested_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("nested") / "idx")
    root, sub = _schemas()
    df = spark.createDataFrame(ROWS, CORPUS_T)
    mf = build_nested_index(
        spark, df, root, {"comments": sub}, idx, id_col="doc_id",
        num_partitions=2,
    )
    return idx, mf


def test_doc_accounting(spark, nested_idx):
    idx, mf = nested_idx
    # 5 roots + 6 elements: elements are real docs (they count in N,
    # the Lucene block-join maxDoc contract)
    assert mf.total_docs == 11
    all_rows, _ = search(spark, idx, AllQuery(), limit=None)
    assert all_rows.count() == 11
    roots, _ = search_roots(spark, idx, AllQuery(), limit=None)
    assert roots.count() == 5


def test_cross_match_trap(spark, nested_idx):
    idx, mf = nested_idx
    res = nested_query(
        spark, idx, "comments", "author:alice AND stars:[5 TO *]",
        id_col="doc_id", score_mode="none", limit=None, manifest=mf,
    )
    got = {
        (r.doc_id, r.score, r.n_children)
        for r in attach_docmap(spark, idx, res, manifest=mf)
        .select("doc_id", "score", "n_children").collect()
    }
    # doc 1 has alice AND a 5-star element but in DIFFERENT elements
    assert got == {(2, 1.0, 1), (5, 1.0, 2)}


def test_score_modes_vs_brute_force(spark, nested_idx):
    idx, mf = nested_idx
    # brute force: element tf * idf with N=11, df(body,'spark')=4
    import math

    idf = 1.0 + math.log(11 / (1.0 + 4))
    per_doc = {1: [1 * idf], 2: [2 * idf], 5: [1 * idf, 1 * idf]}
    for mode, red in [
        ("avg", lambda v: sum(v) / len(v)),
        ("sum", sum), ("max", max), ("min", min),
    ]:
        res = nested_query(
            spark, idx, "comments", "body:spark", id_col="doc_id",
            score_mode=mode, limit=None, manifest=mf,
        )
        got = {
            r.doc_id: (round(r.score, 6), r.n_children)
            for r in attach_docmap(spark, idx, res, manifest=mf)
            .select("doc_id", "score", "n_children").collect()
        }
        want = {d: (round(red(v), 6), len(v)) for d, v in per_doc.items()}
        assert got == want, mode


def test_min_children(spark, nested_idx):
    idx, mf = nested_idx
    res = nested_query(
        spark, idx, "comments", "body:spark", id_col="doc_id",
        score_mode="none", min_children=2, limit=None, manifest=mf,
    )
    got = [r.doc_id for r in attach_docmap(spark, idx, res, manifest=mf)
           .select("doc_id").collect()]
    assert got == [5]


def test_inner_hits(spark, nested_idx):
    idx, mf = nested_idx
    rows = inner_hits(
        spark, idx, "comments", "body:spark", id_col="doc_id",
        per_root=None, manifest=mf, extra_cols=["author"],
    ).collect()
    got = {(r.doc_id, r.pos, r.author) for r in rows}
    assert got == {(1, 0, "alice"), (2, 0, "alice"), (5, 0, "alice"),
                   (5, 2, "carol")}
    # per_root=1: doc 5's two matches tie on score -> pos asc wins
    top1 = inner_hits(
        spark, idx, "comments", "body:spark", id_col="doc_id",
        per_root=1, manifest=mf,
    ).collect()
    assert {(r.doc_id, r.pos) for r in top1} == {(1, 0), (2, 0), (5, 0)}


def test_root_text_still_searchable(spark, nested_idx):
    idx, mf = nested_idx
    # roots with empty/NULL arrays are ordinary docs
    res, _ = search_roots(spark, idx, "text:comments", limit=None, manifest=mf)
    got = {r.doc_id for r in attach_docmap(spark, idx, res, manifest=mf)
           .select("doc_id").collect()}
    assert got == {3, 4}


def test_hidden_docs_carry_system_fields(spark, nested_idx):
    idx, mf = nested_idx
    from ostrich_spark.query.exec import read_docmap

    dm = read_docmap(spark, idx, mf)
    elems = dm.filter(F.col(NESTED_REL) == "comments")
    assert elems.count() == 6
    assert elems.filter(F.col(NESTED_POS).isNull()).count() == 0
    roots = dm.filter(F.col(NESTED_REL) == ROOT_REL)
    assert roots.count() == 5


def test_schema_validation():
    root, sub = _schemas()
    # collision with a root field name
    bad = Schema()
    bad.add_keyword_field("text")
    with pytest.raises(ValueError, match="collides"):
        nested_schema(root, {"comments": bad})
    # reserved system name
    bad2 = Schema()
    bad2.add_keyword_field(NESTED_REL)
    with pytest.raises(ValueError, match="reserved"):
        nested_schema(root, {"comments": bad2})
    with pytest.raises(ValueError, match=">=1 path"):
        nested_schema(root, {})


def test_non_array_path_rejected(spark, tmp_path):
    root, sub = _schemas()
    df = spark.createDataFrame([(1, "t", "not-an-array")],
                               "doc_id long, text string, comments string")
    with pytest.raises(ValueError, match="array<struct"):
        build_nested_index(
            spark, df, root, {"comments": sub}, str(tmp_path / "i"),
            id_col="doc_id",
        )


def test_two_paths(spark, tmp_path):
    """Two nested paths coexist; each query scopes to its own path."""
    root = Schema()
    root.add_text_field("text", "default")
    c = Schema(); c.add_keyword_field("author")
    t = Schema(); t.add_keyword_field("tag")
    df = spark.createDataFrame(
        [(1, "x", [("alice",)], [("red",), ("blue",)]),
         (2, "y", [("bob",)], [])],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("comments", T.ArrayType(T.StructType(
                [T.StructField("author", T.StringType())]))),
            T.StructField("tags", T.ArrayType(T.StructType(
                [T.StructField("tag", T.StringType())]))),
        ]),
    )
    idx = str(tmp_path / "idx")
    mf = build_nested_index(
        spark, df, root, {"comments": c, "tags": t}, idx, id_col="doc_id",
    )
    assert mf.total_docs == 2 + 2 + 2
    res = nested_query(spark, idx, "tags", "tag:red", id_col="doc_id",
                       score_mode="none", limit=None, manifest=mf)
    got = [r.doc_id for r in attach_docmap(spark, idx, res, manifest=mf)
           .select("doc_id").collect()]
    assert got == [1]
    res2 = nested_query(spark, idx, "comments", "author:bob",
                        id_col="doc_id", score_mode="none", limit=None,
                        manifest=mf)
    got2 = [r.doc_id for r in attach_docmap(spark, idx, res2, manifest=mf)
            .select("doc_id").collect()]
    assert got2 == [2]


class TestNestedFacet:
    """ES nested aggregation + reverse_nested: buckets over ELEMENT
    docs, optional root-doc counts, all vs brute force over ROWS."""

    def _elems(self):
        return [
            (doc_id, a, s)
            for doc_id, _, cs in ROWS
            if cs
            for a, s, _ in cs
        ]

    def test_bucket_counts_metrics_and_reverse(self, spark, nested_idx):
        from collections import Counter

        from ostrich_spark.nested import nested_facet

        idx, mf = nested_idx
        elems = self._elems()
        out = {
            r["author"]: r
            for r in nested_facet(
                spark, idx, "comments", "author",
                metrics={"avg_stars": ("avg", "stars"),
                         "max_stars": ("max", "stars")},
                reverse=True, manifest=mf,
            ).collect()
        }
        want_n = Counter(a for _, a, _ in elems)
        assert {k: v["n_docs"] for k, v in out.items()} == dict(want_n)
        for a in want_n:
            stars = [s for _, aa, s in elems if aa == a]
            assert out[a]["avg_stars"] == pytest.approx(
                sum(stars) / len(stars), rel=1e-12
            )
            assert out[a]["max_stars"] == max(stars)
            # reverse_nested: distinct ROOTS owning an element in bucket
            assert out[a]["n_roots"] == len(
                {d for d, aa, _ in elems if aa == a}
            )
        # alice appears in 3 roots via 4 elements — the n_docs/n_roots
        # split IS the nested-vs-reverse_nested distinction
        assert out["alice"]["n_docs"] == 4 and out["alice"]["n_roots"] == 3

    def test_element_and_root_context(self, spark, nested_idx):
        from ostrich_spark.nested import nested_facet

        idx, mf = nested_idx
        # element_query: only stars >= 5 elements bucket
        out = {
            r["author"]: r["n_docs"]
            for r in nested_facet(
                spark, idx, "comments", "author",
                element_query="stars:[5 TO *]", manifest=mf,
            ).collect()
        }
        assert out == {"bob": 1, "alice": 3}
        # root_query: only elements of roots matching text:hash (doc 2)
        out = {
            r["author"]: r["n_docs"]
            for r in nested_facet(
                spark, idx, "comments", "author",
                root_query="text:hash", id_col="doc_id", manifest=mf,
            ).collect()
        }
        assert out == {"alice": 1}
        # both contexts compose
        out = {
            r["author"]: r["n_docs"]
            for r in nested_facet(
                spark, idx, "comments", "author",
                element_query='body:spark', root_query="text:doc",
                id_col="doc_id", manifest=mf,
            ).collect()
        }
        # roots matching 'doc': 1, 2, 3(empty), ... element body:spark
        # within them: doc1 alice('great spark engine'), doc2 alice
        assert out == {"alice": 2}

    def test_validation(self, spark, nested_idx, tmp_path):
        from ostrich_spark.nested import nested_facet
        from ostrich_spark.build import build_index

        idx, mf = nested_idx
        with pytest.raises(ValueError, match="subfield"):
            nested_facet(spark, idx, "comments", "nope", manifest=mf)
        with pytest.raises(ValueError, match="needs id_col"):
            nested_facet(spark, idx, "comments", "author",
                         root_query="text:doc", manifest=mf)
        flat = str(tmp_path / "flat")
        s = Schema()
        s.add_text_field("text", "default")
        build_index(
            spark,
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            s, flat, num_partitions=1, order_col="doc_id",
            id_cols=["doc_id"],
        )
        with pytest.raises(ValueError, match="not a nested index"):
            nested_facet(spark, flat, "comments", "author")
