"""ES multi-fields (``fields: {raw: keyword}`` analog): several schema
fields index ONE source column differently via ``source_col`` — the
ubiquitous ``title`` text + ``title_raw`` keyword pattern, or the same
text under two analyzers. EXTENSION — the reference maps one field to
one column (/root/reference/schema/schema.go:11-16)."""

import pytest

from ostrich_spark.build import build_index, reindex
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search, search_sorted
from ostrich_spark.query.parser import parse_query
from ostrich_spark.schema import Schema

DOCS = [
    (0, "Grace Hash Join", "serious viruses spreading"),
    (1, "Hash Join", "having confidence"),
    (2, "Streaming Windows", "hash join basics"),
    (3, None, "confidence builds"),
]


def _schema() -> Schema:
    schema = Schema()
    schema.add_text_field("title", "default", store=True)      # 0
    schema.add_keyword_field("title_raw", source_col="title")  # 1
    schema.add_text_field("body", "default")                   # 2
    schema.add_text_field("body_stem", "en_stem", source_col="body")  # 3
    return schema


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    idx = str(tmp_path_factory.mktemp("mf") / "idx")
    build_index(
        spark, df, _schema(), idx, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _ids(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    return sorted(
        r["doc_id"]
        for r in attach_docmap(spark, idx, res).select("doc_id").collect()
    )


def test_text_plus_keyword_multifield(spark, mf_index):
    # analyzed text search on the source column...
    assert _ids(spark, mf_index, "title:hash") == [0, 1]
    # ...and exact raw match on the keyword twin (case + spaces intact)
    assert _ids(spark, mf_index, 'title_raw:"Hash Join"') == [1]
    assert _ids(spark, mf_index, 'title_raw:"hash join"') == []  # raw case
    # NULL source -> NULL doc value: exists excludes doc 3
    assert _ids(spark, mf_index, "title_raw:*") == [0, 1, 2]


def test_two_analyzers_over_one_column(spark, mf_index):
    # en_stem stems+stops: 'viruses'->'virus', 'confidence'->'confid'
    assert _ids(spark, mf_index, "body_stem:viruses") == [0]
    assert _ids(spark, mf_index, "body:viruses") == [0]
    assert _ids(spark, mf_index, "body_stem:confidence") == [1, 3]
    # stopword removed ONLY on the stemmed twin
    assert _ids(spark, mf_index, "body:having") == [1]
    assert _ids(spark, mf_index, "body_stem:having") == []


def test_multifield_docmap_and_sort(spark, mf_index):
    # the keyword twin is a real docmap column keyed by FIELD name
    mf = load_manifest(mf_index)
    from ostrich_spark.query.exec import read_docmap

    vals = {
        r["doc_id"]: r["title_raw"]
        for r in read_docmap(spark, mf_index, mf)
        .select("doc_id", "title_raw").collect()
    }
    assert vals == {0: "Grace Hash Join", 1: "Hash Join",
                    2: "Streaming Windows", 3: None}
    # sortable like any keyword column (NULLs last)
    rows = search_sorted(
        spark, mf_index, "body:hash OR body:confidence OR title:hash",
        by="title_raw", limit=None,
    ).collect()
    got = [r["title_raw"] for r in rows]
    assert got == sorted([v for v in got if v is not None]) + [None] * got.count(None)


def test_multifield_merge_and_roundtrip(spark, mf_index, tmp_path):
    # manifest round-trips source_col; merge carries the multi-field
    import shutil

    from ostrich_spark.merge import merge_segments

    mf = load_manifest(mf_index)
    fe = mf.schema.field_by_name("title_raw")
    assert fe.source_col == "title" and fe.input_col == "title"
    idx2 = str(tmp_path / "m")
    shutil.copytree(mf_index, idx2)
    merge_segments(
        spark, idx2, [s.segment_id for s in mf.segments], "mf-merged-000"
    )
    assert load_manifest(idx2).schema.field_by_name("title_raw").source_col == "title"
    assert _ids(spark, idx2, 'title_raw:"Hash Join"') == [1]
    assert _ids(spark, idx2, "body_stem:confidence") == [1, 3]


def test_multifield_percolate_reads_source(spark):
    from ostrich_spark.percolate import percolate, register_queries

    schema = _schema()
    pq = register_queries(
        {"raw": 'title_raw:"Hash Join"', "stem": "body_stem:viruses"}, schema
    )
    docs = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(spark, docs, pq, schema, id_col="doc_id").collect()
    }
    assert got == {(1, "raw"), (0, "stem")}


def test_multifield_reindex(spark, mf_index, tmp_path):
    # text multi-field re-reads the STORED source column; keyword twin
    # reads its own doc-value column — both survive a reindex
    dest = str(tmp_path / "re")
    schema = Schema()
    schema.add_text_field("title", "default", store=True)
    schema.add_keyword_field("title_raw", source_col="title")
    reindex(spark, mf_index, dest, schema)
    assert _ids(spark, dest, 'title_raw:"Hash Join"') == [1]
    assert _ids(spark, dest, "title:hash") == [0, 1]


def test_schema_name_guards():
    schema = Schema()
    schema.add_text_field("title")
    with pytest.raises(ValueError, match="duplicate field name"):
        schema.add_keyword_field("title")
    with pytest.raises(ValueError, match="struct access"):
        schema.add_keyword_field("title.raw", source_col="title")


def test_cli_build_multifield(spark, tmp_path):
    import subprocess
    import sys

    src = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(DOCS, "doc_id long, title string, body string") \
        .write.parquet(src)
    idx = str(tmp_path / "idx")
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "build", src, "-p", idx,
         "--field", "title", "--keyword-field", "title_raw=title",
         "--order-col", "doc_id", "--id-col", "doc_id"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert _ids(spark, idx, 'title_raw:"Streaming Windows"') == [2]
