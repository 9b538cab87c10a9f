"""search_after cursor on field-sorted search (ES search_after analog):
constant-work deep pagination — the cursor compiles to a row predicate
before the top-k, and under early_terminate prunes whole segments."""

import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search_sorted
from ostrich_spark.schema import Schema


def _corpus(spark):
    rows = [
        (i, f"alpha doc {'spark' if i % 2 == 0 else 'flink'} {i}",
         None if i % 17 == 0 else i * 7 % 101)
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, val long")


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("after") / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("val")
    mf = build_index(
        spark, _corpus(spark), s, idx, num_partitions=4,
        order_col="doc_id", id_cols=["doc_id"],
    )
    return idx, mf


def _page(spark, idx, mf, after=None, early=False, si=None, limit=10,
          ascending=True):
    res = search_sorted(
        spark, idx, "text:spark", by="val", ascending=ascending,
        limit=limit, tiebreak=["doc_id"], manifest=mf, after=after,
        early_terminate=early, scan_info=si,
    )
    rows = attach_docmap(spark, idx, res.drop("val"), manifest=mf).select(
        "doc_id", "val", "segment_ord", "doc"
    ).collect()
    # joins don't preserve order; re-sort by the pinned total order
    # (nulls last mirrors asc_nulls_last / desc_nulls_last)
    def key(r):
        v = r.val if ascending else (None if r.val is None else -r.val)
        return (v is None, v if v is not None else 0,
                r.doc_id, r.segment_ord, r.doc)
    return sorted(rows, key=key)


def _cursor(row):
    return (row.val, row.doc_id, row.segment_ord, row.doc)


def test_cursor_walk_identical_to_full_order(spark, sorted_idx):
    idx, mf = sorted_idx
    truth = [(r.doc_id, r.val) for r in _page(spark, idx, mf, limit=None)]
    assert len(truth) == 100  # every even doc matches
    assert any(v is None for _, v in truth)  # nulls tail exercised
    pages, after = [], None
    n_pages = 0
    while True:
        p = _page(spark, idx, mf, after=after)
        if not p:
            break
        pages += [(r.doc_id, r.val) for r in p]
        after = _cursor(p[-1])
        n_pages += 1
        assert n_pages <= 12
    assert pages == truth  # incl resuming INSIDE the null tail


def test_cursor_descending(spark, sorted_idx):
    idx, mf = sorted_idx
    truth = [(r.doc_id, r.val)
             for r in _page(spark, idx, mf, limit=None, ascending=False)]
    p1 = _page(spark, idx, mf, ascending=False)
    p2 = _page(spark, idx, mf, ascending=False, after=_cursor(p1[-1]))
    assert [(r.doc_id, r.val) for r in p1 + p2] == truth[:20]


def test_cursor_early_terminate_identical(spark, sorted_idx):
    idx, mf = sorted_idx
    truth = [(r.doc_id, r.val) for r in _page(spark, idx, mf, limit=None)]
    p1 = _page(spark, idx, mf)
    si = {}
    p2 = _page(spark, idx, mf, after=_cursor(p1[-1]), early=True, si=si)
    assert [(r.doc_id, r.val) for r in p2] == truth[10:20]
    assert si["segments_scanned"] >= 1


def test_cursor_prunes_value_disjoint_segments(spark, tmp_path):
    """order_col=val makes segments value-disjoint; a deep cursor must
    drop the wholly-before segments from the scan entirely."""
    idx = str(tmp_path / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("val")
    rows = [(i, "spark doc", i) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, val long")
    mf = build_index(spark, df, s, idx, num_partitions=4,
                     order_col="val", id_cols=["doc_id"])
    assert len(mf.segments) == 4
    # cursor deep in the 4th quartile: first three segments prune away
    si = {}
    res = search_sorted(
        spark, idx, "text:spark", by="val", limit=10, manifest=mf,
        # cursor's (seg_ord, doc) past any real row: every val<=350 row
        # sorts before it, the exclusive boundary sits entirely at 350
        after=(350, 2**31 - 1, 2**31 - 1), early_terminate=True,
        scan_info=si,
    )
    got = [r.val for r in res.select("val").collect()]
    assert sorted(got) == list(range(351, 361))
    assert si["segments_total"] == 1  # 3 of 4 segments cursor-pruned


def test_validation(spark, sorted_idx):
    idx, mf = sorted_idx
    with pytest.raises(ValueError, match="mutually exclusive"):
        search_sorted(spark, idx, "text:spark", by="val", limit=10,
                      offset=5, after=(1, 2, 3, 4), tiebreak=["doc_id"],
                      manifest=mf)
    with pytest.raises(ValueError, match="got 2 values"):
        search_sorted(spark, idx, "text:spark", by="val", limit=10,
                      after=(1, 2), tiebreak=["doc_id"], manifest=mf)
