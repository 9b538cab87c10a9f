"""categorize_text — ES analog with a deterministic exact-template key
(letter-only tokens of the field's analyzer output, space-joined).

Design under test:
- numbers / ids / mixed alphanumeric tokens drop, pure-letter tokens
  keep order: two log lines differing only in numerics land in ONE
  category;
- category == a python re-implementation over the same corpus;
- max_tokens caps the template; metrics/min_doc_count/size follow the
  facet grammar; letter-free docs form no bucket;
- store=True required.
"""

import re

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, categorize_text, search
from ostrich_spark.query.parser import AllQuery
from ostrich_spark.schema import Schema


def _mk_docs():
    docs = []
    k = 0
    for i in range(12):
        docs.append({
            "k": k, "v": float(k),
            "msg": f"Connection refused to host 10.0.{i}.7 port {400 + i}",
        })
        k += 1
    for i in range(7):
        docs.append({
            "k": k, "v": float(k),
            "msg": f"Disk full on volume vol{i} at {90 + i} percent",
        })
        k += 1
    for i in range(4):
        docs.append({
            "k": k, "v": float(k),
            "msg": f"Connection timeout to host 10.1.{i}.9",
        })
        k += 1
    # letter-free line: no bucket
    docs.append({"k": k, "v": float(k), "msg": "12345 67 89"})
    return docs


def _brute_cat(msg, max_tokens=None):
    toks = [t for t in re.split(r"[^a-z0-9]+", msg.lower()) if t]
    toks = [t for t in toks if re.fullmatch(r"[a-z]+", t)]
    if max_tokens is not None:
        toks = toks[:max_tokens]
    return " ".join(toks)


@pytest.fixture(scope="module")
def cat_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("msg", "default", store=True)
    s.add_numeric_field("v", "double")
    idx = str(tmp_path_factory.mktemp("cat") / "idx")
    build_index(
        spark,
        spark.createDataFrame(_mk_docs(), "k long, v double, msg string"),
        s, idx, num_partitions=2, order_col="k", id_cols=["k"],
    )
    return idx


def test_templates_vs_brute(spark, cat_idx):
    docs = _mk_docs()
    expect = {}
    for d in docs:
        c = _brute_cat(d["msg"])
        if c:
            expect[c] = expect.get(c, 0) + 1
    got = {
        r["category"]: r["n_docs"]
        for r in categorize_text(spark, cat_idx, AllQuery(), "msg").collect()
    }
    assert got == expect
    # the numeric-varying lines collapsed into single templates
    assert got["connection refused to host port"] == 12
    assert got["disk full on volume at percent"] == 7
    assert got["connection timeout to host"] == 4
    # vol0..vol6 (mixed alnum) and all numbers dropped; letter-free doc absent
    assert not any(any(ch.isdigit() for ch in c) for c in got)
    assert not any("vol0" in c.split() for c in got)


def test_max_tokens_merges_and_metrics(spark, cat_idx):
    # cap at 1 token: both 'connection ...' templates merge
    got = {
        r["category"]: r
        for r in categorize_text(
            spark, cat_idx, AllQuery(), "msg", max_tokens=1,
            metrics={"max_v": ("max", "v")},
        ).collect()
    }
    assert got["connection"]["n_docs"] == 16
    assert got["disk"]["n_docs"] == 7
    docs = _mk_docs()
    assert got["connection"]["max_v"] == max(
        d["v"] for d in docs if _brute_cat(d["msg"], 1) == "connection"
    )


def test_ordering_min_doc_count_size(spark, cat_idx):
    rows = categorize_text(
        spark, cat_idx, AllQuery(), "msg", min_doc_count=5, size=1
    ).collect()
    assert len(rows) == 1
    assert rows[0]["category"] == "connection refused to host port"
    assert rows[0]["n_docs"] == 12
    # narrowed query context: only timeout lines match 'timeout'
    rows = categorize_text(spark, cat_idx, "msg:timeout", "msg").collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 4


def test_validation(spark, cat_idx, tmp_path):
    with pytest.raises(ValueError, match="not a text field"):
        categorize_text(spark, cat_idx, AllQuery(), "v")
    with pytest.raises(ValueError, match="max_tokens"):
        categorize_text(spark, cat_idx, AllQuery(), "msg", max_tokens=0)
    with pytest.raises(ValueError, match="min_doc_count"):
        categorize_text(spark, cat_idx, AllQuery(), "msg", min_doc_count=0)
    # non-stored field refuses loudly
    s = Schema()
    s.add_text_field("msg", "default")
    idx = str(tmp_path / "nostore")
    import pyspark.sql.functions as F  # noqa: F401

    from pyspark.sql import SparkSession

    sp = SparkSession.getActiveSession()
    build_index(
        sp, sp.createDataFrame([(0, "a line")], "k long, msg string"),
        s, idx, num_partitions=1, order_col="k", id_cols=["k"],
    )
    with pytest.raises(ValueError, match="store=True"):
        categorize_text(sp, idx, AllQuery(), "msg")
