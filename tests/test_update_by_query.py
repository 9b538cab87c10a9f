"""update_by_query: rewrite every match of a query through SQL
expressions and upsert (the ES _update_by_query + script analog;
EXTENSION — the reference's delete plumbing is commented out at
/root/reference/index/index_meta.go:55-59, updates don't exist there).

Covers: numeric bump visible through get_docs + search membership on the
rewritten text, old versions invisible after the upsert, untouched docs
byte-identical, geo/keyword/date round-trip through the docmap
reconstruction, empty match = no-op commit, validation (identity target,
unknown target, unstored text field)."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import update_by_query
from ostrich_spark.geo import geo_distance_search
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, get_docs, search
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "spark merge policy", "views": 10,
     "lang": "EN", "pt": "48.8566,2.3522"},
    {"doc_id": 1, "text": "spark query planner", "views": 3,
     "lang": "FR", "pt": None},
    {"doc_id": 2, "text": "segment merge daemon", "views": 7,
     "lang": "EN", "pt": "51.5074,-0.1278"},
    {"doc_id": 3, "text": "columnar shuffle", "views": 1,
     "lang": "DE", "pt": None},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default", store=True)
    s.add_numeric_field("views", "long")
    s.add_keyword_field("lang", lowercase=True)
    s.add_geo_field("pt")
    return s


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "ubq")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        _schema(),
        d,
        num_partitions=2,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    return d


def _docmap_by_id(spark, idx_dir):
    rows = get_docs(
        spark, idx_dir, [0, 1, 2, 3], "doc_id"
    ).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_numeric_and_text_rewrite(spark, idx):
    n, mf = update_by_query(
        spark, idx, "text:spark",
        {"views": "views + 100", "text": "concat(text, ' zzboost')"},
        build_id="ubq1", num_partitions=1,
    )
    assert n == 2
    got = _docmap_by_id(spark, idx)
    # matched docs: bumped views, rewritten text
    assert got[0]["views"] == 110 and got[1]["views"] == 103
    assert got[0]["text"].endswith(" zzboost")
    # untouched docs byte-identical
    assert got[2]["views"] == 7 and got[2]["text"] == "segment merge daemon"
    assert got[3]["views"] == 1
    # the rewritten text is SEARCHABLE and exactly the matched set
    res, _ = search(spark, idx, "text:zzboost", limit=None, manifest=mf)
    ids = {
        r["doc_id"]
        for r in attach_docmap(spark, idx, res, manifest=mf).collect()
    }
    assert ids == {0, 1}
    # old versions invisible: text:spark still matches exactly 2 docs
    res2, _ = search(spark, idx, "text:spark", limit=None, manifest=mf)
    assert res2.count() == 2


def test_docvalue_roundtrip_geo_keyword(spark, idx):
    # update an unrelated column; keyword (lowercased) + geo must
    # round-trip through the reconstruction unchanged
    n, mf = update_by_query(
        spark, idx, "text:merge", {"views": "views * 2"}, build_id="ubq2",
    )
    assert n == 2  # docs 0 and 2
    got = _docmap_by_id(spark, idx)
    assert got[0]["views"] == 20 and got[2]["views"] == 14
    assert got[0]["lang"] == "en"  # normalized form survives (idempotent)
    # doc 0's point survived the rewrite: 1 km around the Eiffel Tower
    hits = geo_distance_search(
        spark, idx, "pt", 48.8566, 2.3522, 1000.0
    ).collect()
    assert {r["doc_id"] for r in hits} == {0}
    # doc 1's NULL point stays NULL (matched by neither geo nor exists)
    far = geo_distance_search(
        spark, idx, "pt", 0.0, 0.0, 3.0e7
    ).collect()
    assert {r["doc_id"] for r in far} == {0, 2}


def test_empty_match_is_noop(spark, idx):
    op0 = load_manifest(idx).opstamp
    n, mf = update_by_query(
        spark, idx, "text:nosuchterm", {"views": "views + 1"},
        build_id="ubq3",
    )
    assert n == 0
    assert load_manifest(idx).opstamp == op0


def test_scriptless_reindex_in_place(spark, idx):
    # set_exprs={} = the ES script-less _update_by_query: same docs,
    # rewritten segments
    n, mf = update_by_query(spark, idx, "text:shuffle", {}, build_id="ubq4")
    assert n == 1
    got = _docmap_by_id(spark, idx)
    assert got[3]["text"] == "columnar shuffle" and got[3]["views"] == 1


def test_validation(spark, idx):
    with pytest.raises(ValueError, match="identity column"):
        update_by_query(
            spark, idx, "text:spark", {"doc_id": "doc_id + 1"},
            build_id="ubq5",
        )
    with pytest.raises(ValueError, match="not a build-input column"):
        update_by_query(
            spark, idx, "text:spark", {"nope": "1"}, build_id="ubq6",
        )


def test_cli_update_by_query(spark, idx, capsys):
    from ostrich_spark.cli import main

    rc = main([
        "update", "-p", idx, "--query", "text:planner",
        "--set", "views=views + 1000", "--build-id", "ubqcli",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "updated by query: 1 rewritten" in out
    assert _docmap_by_id(spark, idx)[1]["views"] == 1003
    # contract errors: both/neither of corpus+--query, --set sans --query,
    # malformed --set, corpus mode sans --id-col
    assert main(["update", "-p", idx, "--build-id", "x"]) == 2
    assert main([
        "update", "c.parquet", "-p", idx, "--query", "text:a",
        "--build-id", "x",
    ]) == 2
    assert main([
        "update", "c.parquet", "-p", idx, "--set", "views=1",
        "--build-id", "x",
    ]) == 2
    assert main([
        "update", "-p", idx, "--query", "text:a", "--set", "noequals",
        "--build-id", "x",
    ]) == 2
    assert main(["update", "c.parquet", "-p", idx, "--build-id", "x"]) == 2


def test_unstored_text_field_fails(spark, tmp_path):
    d = str(tmp_path / "nostore")
    s = Schema()
    s.add_text_field("text", "default")  # store=False
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)[["doc_id", "text"]]),
        s, d, num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    with pytest.raises(ValueError, match="store=True"):
        update_by_query(spark, d, "text:spark", {}, build_id="ubq7")
