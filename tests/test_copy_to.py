"""copy_to (ES mapping analog): source text fields also index their RAW
value into a catch-all target field, re-analyzed with the TARGET's
analyzer. Equivalence oracle: an index built with copy_to must score
BIT-identically to one whose target field reads a manually concatenated
source column — tf accumulation, doc lengths, and df all follow."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, read_docmap, search
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "a": "spark join", "b": "window shuffle"},
    {"doc_id": 1, "a": "spark spark", "b": None},
    {"doc_id": 2, "a": "other", "b": "spark stream"},
    {"doc_id": 3, "a": None, "b": None},
]


def _build_copy(spark, path):
    s = Schema()
    s.add_text_field("a", "default", copy_to=["all_f"])
    s.add_text_field("b", "default", copy_to="all_f")  # str form
    s.add_text_field("all_f", "default")  # no own source column
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, str(path),
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return str(path)


def _build_manual(spark, path):
    df = spark.createDataFrame(pd.DataFrame(DOCS)).selectExpr(
        "doc_id", "a", "b",
        "concat(' ', coalesce(a, ''), ' ', coalesce(b, '')) AS all_src",
    )
    s = Schema()
    s.add_text_field("a", "default")
    s.add_text_field("b", "default")
    s.add_text_field("all_f", "default", source_col="all_src")
    build_index(
        spark, df, s, str(path),
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return str(path)


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("copyto")
    return _build_copy(spark, root / "copy"), _build_manual(spark, root / "manual")


def _hits(spark, idx, q, scorer):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("doc_id", "score").collect()
    return {r["doc_id"]: r["score"] for r in rows}


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize("q", ["all_f:spark", "all_f:shuffle", "a:spark"])
def test_copy_equals_manual_concat(spark, pair, q, scorer):
    cp, man = pair
    got, want = _hits(spark, cp, q, scorer), _hits(spark, man, q, scorer)
    assert got == want and got  # bit-identical, non-empty


def test_tf_accumulates_hand_score(spark, pair):
    """all_f:spark — df = 3 of N = 4 → tfidf idf = 1 + ln(4/4) = 1;
    d1 copied 'spark spark' → tf 2, score exactly 2.0."""
    got = _hits(spark, pair[0], "all_f:spark", "tfidf")
    assert got == {0: pytest.approx(1.0), 1: pytest.approx(2.0),
                   2: pytest.approx(1.0)}


def test_target_uses_own_analyzer(spark, tmp_path):
    """copy_to copies the RAW value: a stemmed source re-analyzes
    UNstemmed in a default-analyzer target."""
    s = Schema()
    s.add_text_field("src", "en_stem", copy_to=["catch"])
    s.add_text_field("catch", "default")
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 0, "src": "running quickly"}])
    )
    idx = str(tmp_path / "an")
    build_index(spark, df, s, idx, num_partitions=1,
                order_col="doc_id", id_cols=["doc_id"])
    # default analyzer: literal term matches, stemmed form does not
    res, _ = search(spark, idx, "catch:quickly", limit=None)
    assert res.count() == 1
    res, _ = search(spark, idx, "catch:quickli", limit=None)
    assert res.count() == 0
    # the source field still stems (query analyzed with en_stem)
    res, _ = search(spark, idx, "src:running", limit=None)
    assert res.count() == 1


def test_content_sha_copyto_blind(spark, pair, tmp_path):
    """content_sha256 hashes each field's OWN value only: with-copies ==
    without-copies, row for row."""
    s = Schema()
    s.add_text_field("a", "default")
    s.add_text_field("b", "default")
    s.add_text_field("all_f", "default")
    plain = str(tmp_path / "plain")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, plain,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )

    def shas(idx):
        dm = read_docmap(spark, idx, load_manifest(idx))
        return {r["doc_id"]: r["content_sha256"]
                for r in dm.select("doc_id", "content_sha256").collect()}

    assert shas(pair[0]) == shas(plain)


def test_validation(spark, tmp_path):
    df_one = pd.DataFrame([{"doc_id": 0, "a": "x"}])

    def try_build(s):
        build_index(
            spark, spark.createDataFrame(df_one), s, str(tmp_path / "v"),
            num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
        )

    s = Schema()
    s.add_text_field("a", "default", copy_to=["nosuch"])
    with pytest.raises(ValueError, match="not declared"):
        try_build(s)

    s = Schema()
    s.add_text_field("a", "default", copy_to=["a"])
    with pytest.raises(ValueError, match="itself"):
        try_build(s)

    s = Schema()
    s.add_text_field("a", "default", copy_to=["k"])
    s.add_keyword_field("k")
    with pytest.raises(ValueError, match="must be a text field"):
        try_build(s)
