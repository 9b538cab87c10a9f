"""Point lookup by identity (IndexReader.document / ES GET analog)."""

import subprocess
import sys

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.manifest import load_manifest, set_snapshot_retention
from ostrich_spark.query.exec import get_docs
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_key": "07", "text": "spark stream merge", "nchars": 18},
    {"doc_key": "7", "text": "spark join window", "nchars": 17},
    {"doc_key": "a9", "text": "merge policy segment", "nchars": 20},
    {"doc_key": "b3", "text": "window join batch", "nchars": 17},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default", store=True)
    s.add_numeric_field("nchars", "long")
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("get") / "idx")
    set_snapshot_retention(path, 3)
    build_index(
        spark, spark.createDataFrame(DOCS), _schema(), path,
        num_partitions=2, order_col="doc_key", id_cols=["doc_key"],
    )
    return path


def test_get_returns_stored_doc_and_values(spark, idx):
    rows = get_docs(spark, idx, ["a9"], "doc_key").collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["text"] == "merge policy segment"  # store=True roundtrip
    assert r["nchars"] == 20  # numeric doc value
    assert "segment_id" in r and "doc" in r


def test_get_string_ids_stay_distinct(spark, idx):
    """'07' and '7' are different docs on a string id column — the list
    form casts the VALUES to the column dtype, never the reverse."""
    r7 = get_docs(spark, idx, ["7"], "doc_key").collect()
    r07 = get_docs(spark, idx, ["07"], "doc_key").collect()
    assert len(r7) == len(r07) == 1
    assert r7[0]["text"] != r07[0]["text"]
    both = get_docs(spark, idx, ["7", "07"], "doc_key").collect()
    assert len(both) == 2


def test_get_predicate_pushes_down(spark, idx):
    plan = get_docs(spark, idx, ["a9"], "doc_key")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_key" in plan


def test_get_dataframe_form(spark, idx):
    keys = spark.createDataFrame([("a9",), ("b3",), ("zz",)], "doc_key string")
    rows = get_docs(spark, idx, keys, "doc_key").collect()
    assert sorted(r["doc_key"] for r in rows) == ["a9", "b3"]


def test_deleted_doc_reads_absent_then_snapshot_resurrects(spark, idx):
    s0 = load_manifest(idx).opstamp
    delete_docs(
        spark, idx, spark.createDataFrame([("b3",)], "doc_key string"), ["doc_key"]
    )
    assert get_docs(spark, idx, ["b3"], "doc_key").collect() == []
    snap = load_manifest(idx, opstamp=s0)
    rows = get_docs(spark, idx, ["b3"], "doc_key", manifest=snap).collect()
    assert len(rows) == 1 and rows[0]["text"] == "window join batch"


def test_get_unknown_column_raises(spark, idx):
    with pytest.raises(ValueError, match="not in docmap"):
        get_docs(spark, idx, ["x"], "nope")


def test_cli_get(spark, idx):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "get", "-p", idx,
         "--id-col", "doc_key", "--values", "a9", "zz"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "merge policy segment" in out.stdout
    assert "found: 1/2" in out.stdout
    miss = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "get", "-p", idx,
         "--id-col", "doc_key", "--values", "zz"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert miss.returncode == 2 and "found: 0/1" in miss.stdout


# ---------------------------------------------------------------------------
# term vectors (ES _termvectors analog — decoded from the postings)
# ---------------------------------------------------------------------------


def test_term_vectors_match_analysis(spark, idx):
    from collections import Counter

    from ostrich_spark.query.exec import term_vectors

    got = term_vectors(spark, idx, ["07", "a9"], "doc_key", "text").collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["doc_key"], {})[r["term"]] = r["tf"]
    want = {
        d["doc_key"]: dict(Counter(d["text"].split()))
        for d in DOCS
        if d["doc_key"] in ("07", "a9")
    }
    assert by_key == want
    # segment address rides along
    assert all(r["segment_id"] and r["doc"] >= 0 for r in got)


def test_term_vectors_tf_counts_duplicates(spark, tmp_path):
    from ostrich_spark.query.exec import term_vectors

    p = str(tmp_path / "tv")
    build_index(
        spark,
        spark.createDataFrame(
            [{"doc_key": "x", "text": "go go go stop"},
             {"doc_key": "y", "text": "stop"}],
        ),
        _schema_text_only(),
        p,
        num_partitions=1,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    got = {
        (r["doc_key"], r["term"]): r["tf"]
        for r in term_vectors(spark, p, ["x"], "doc_key", "text").collect()
    }
    assert got == {("x", "go"): 3, ("x", "stop"): 1}


def _schema_text_only():
    s = Schema()
    s.add_text_field("text", "default")
    return s


def test_term_vectors_absent_and_deleted(spark, tmp_path):
    from ostrich_spark.query.exec import term_vectors

    p = str(tmp_path / "tvdel")
    build_index(
        spark, spark.createDataFrame(DOCS), _schema(), p,
        num_partitions=2, order_col="doc_key", id_cols=["doc_key"],
    )
    # unknown id: empty, correct columns
    empty = term_vectors(spark, p, ["zz"], "doc_key", "text")
    assert empty.count() == 0
    assert empty.schema.names == ["doc_key", "segment_id", "doc", "term", "tf"]
    # deleted doc reads as absent (GET semantics)
    delete_docs(spark, p, spark.createDataFrame([("a9",)], "doc_key string"), ["doc_key"])
    assert term_vectors(spark, p, ["a9"], "doc_key", "text").count() == 0
    with pytest.raises(ValueError, match="text field"):
        term_vectors(spark, p, ["07"], "doc_key", "nchars")
