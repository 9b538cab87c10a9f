"""Cursor pagination (search_after).

Paging with ``after`` must reproduce exactly the same global order as
one big search — across the plain, tombstoned (cogroup), aux/range, and
match-all execution paths — while each page stays a k-per-segment job.
Reference analog: ostrich exposes only offset paging via collector
limits (/root/reference/reader/search.go:21-66); search_after is the
scale path this engine adds for deep pagination.
"""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.query.exec import search
from ostrich_spark.schema import Schema


def _schema(numeric=False):
    s = Schema()
    s.add_text_field("content", "default")
    if numeric:
        s.add_numeric_field("score_dv")
    return s


def _docs(n=40):
    return [
        {
            "k": i,
            "content": f"alpha beta doc{i} " + ("spark join " * (i % 5 + 1)),
            "score_dv": i % 7,
        }
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sa") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(_docs())),
        _schema(numeric=True),
        path,
        num_partitions=4,
        order_col="k",
        id_cols=["k"],
    )
    return path


def _rows(df):
    # exact scores: the cursor is (score, segment_ord, doc) and the
    # engine compares it bit-exactly, as documented
    return [
        (r["segment_id"], r["segment_ord"], r["doc"], r["score"])
        for r in df.collect()
    ]


def _page_all(spark, idx_path, q, page, **kw):
    """Collect every row by paging with the after-cursor."""
    out, after = [], None
    for _ in range(100):  # hard stop: fail loudly instead of looping
        res, _ = search(spark, idx_path, q, limit=page, after=after, **kw)
        rows = _rows(res)
        if not rows:
            return out
        out.extend(rows)
        last = rows[-1]
        after = (last[3], last[1], last[2])
    raise AssertionError("pagination did not terminate")


@pytest.mark.parametrize("q", ["alpha spark", "content:join OR content:beta"])
@pytest.mark.parametrize("page", [1, 3, 7])
def test_after_pages_equal_full_order(spark, idx, q, page):
    full, _ = search(spark, idx, q, limit=None, use_wand=False)
    assert _page_all(spark, idx, q, page) == _rows(full)


def test_after_matches_offset_paging(spark, idx):
    q = "alpha join"
    res1, _ = search(spark, idx, q, limit=5)
    rows1 = _rows(res1)
    last = rows1[-1]
    by_after, _ = search(spark, idx, q, limit=5, after=(last[3], last[1], last[2]))
    by_offset, _ = search(spark, idx, q, limit=5, offset=5)
    assert _rows(by_after) == _rows(by_offset)


def test_after_on_tombstoned_index(spark, idx, tmp_path):
    import shutil

    tomb = str(tmp_path / "tomb")
    shutil.copytree(idx, tomb)
    victims = spark.createDataFrame([(i,) for i in range(0, 40, 3)], "k long")
    assert delete_docs(spark, tomb, victims, ["k"]) > 0
    q = "alpha spark"
    full, _ = search(spark, tomb, q, limit=None, use_wand=False)
    assert _page_all(spark, tomb, q, 4) == _rows(full)


def test_after_on_match_all(spark, idx):
    full, _ = search(spark, idx, "", limit=None)
    assert _page_all(spark, idx, "", 11) == _rows(full)


def test_after_on_range_query(spark, idx):
    q = "score_dv:[2 TO 5]"
    full, _ = search(spark, idx, q, limit=None)
    assert _page_all(spark, idx, q, 6) == _rows(full)


def test_after_count_is_cursor_independent(spark, idx):
    q = "alpha spark"
    _, total = search(spark, idx, q, limit=3, with_count=True)
    res, _ = search(spark, idx, q, limit=3)
    last = _rows(res)[-1]
    _, total2 = search(
        spark, idx, q, limit=3, with_count=True, after=(last[3], last[1], last[2])
    )
    assert total2 == total


def test_after_rejects_offset(spark, idx):
    with pytest.raises(ValueError):
        search(spark, idx, "alpha", limit=3, offset=2, after=(1.0, 0, 0))


def test_after_past_end_is_empty(spark, idx):
    full, _ = search(spark, idx, "alpha", limit=None, use_wand=False)
    last = _rows(full)[-1]
    res, _ = search(spark, idx, "alpha", limit=10, after=(last[3], last[1], last[2]))
    assert _rows(res) == []
