"""scroll — ES scroll API analog (exec.scroll): whole-match-set
driver-side paging over ONE pinned manifest via search_after cursors.

Design under test:
- page concatenation == the exhaustive search in the pinned total
  order, page sizes exact;
- a commit landing MID-SCROLL neither skips nor duplicates docs (the
  pinned-manifest consistency ES's scroll context provides);
- empty match set yields no pages; page_size validation.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import scroll, search
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark"]


def _docs(lo, hi):
    return [
        {
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 3)),
        }
        for i in range(lo, hi)
    ]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    return s


def _key(r):
    return (r["segment_ord"], r["doc"])


def test_pages_concatenate_to_exhaustive(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(_docs(0, 40), "k long, content string"),
        _schema(), idx, num_partitions=3, order_col="k", id_cols=["k"],
    )
    full, _ = search(spark, idx, "content:merge", limit=None)
    expect = [
        (r["score"], _key(r)) for r in full.collect()
    ]
    pages = list(scroll(spark, idx, "content:merge", page_size=5))
    assert all(len(p) == 5 for p in pages[:-1])
    assert len(pages[-1]) <= 5
    got = [(r["score"], _key(r)) for p in pages for r in p]
    assert got == expect


def test_commit_mid_scroll_is_invisible(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(_docs(0, 30), "k long, content string"),
        _schema(), idx, num_partitions=2, order_col="k", id_cols=["k"],
    )
    baseline = [
        r for p in scroll(spark, idx, "content:merge", page_size=4) for r in p
    ]
    it = scroll(spark, idx, "content:merge", page_size=4)
    first = next(it)
    # a new segment batch commits mid-scroll
    build_index(
        spark, spark.createDataFrame(_docs(100, 130), "k long, content string"),
        _schema(), idx, num_partitions=2, order_col="k", id_cols=["k"],
        build_id="later", mode="append",
    )
    from ostrich_spark.query.exec import invalidate_cache

    invalidate_cache(idx)
    rest = [r for p in it for r in p]
    assert [_key(r) for r in first + rest] == [_key(r) for r in baseline]
    # a FRESH search sees the appended matches
    _, n_new = search(spark, idx, "content:merge", limit=0, with_count=True)
    assert n_new > len(baseline)


def test_empty_and_validation(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(_docs(0, 5), "k long, content string"),
        _schema(), idx, num_partitions=1, order_col="k", id_cols=["k"],
    )
    assert list(scroll(spark, idx, "content:zzzmissing")) == []
    with pytest.raises(ValueError, match="page_size"):
        list(scroll(spark, idx, "content:merge", page_size=0))
