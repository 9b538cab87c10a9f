"""Stored fields + snippet highlighting.

store=True keeps the raw field value in the docmap (the real StoreWriter
the reference stubs); highlight() turns top-k hits into marked snippets,
analyzer-aware (stemmed queries mark inflected surface forms)."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.highlight import _window_snippet, highlight
from ostrich_spark.schema import Schema

DOCS = [
    {
        "k": 0,
        "content": "the quick brown fox jumps over the lazy dog and keeps "
        "searching for food in the deep dark forest near the river",
    },
    {"k": 1, "content": "nothing relevant here at all"},
    {"k": 2, "content": "searched high and low, the foxes were quick indeed"},
]


@pytest.fixture(scope="module")
def stored_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("content", "en_stem", positions=True, store=True)
    d = str(tmp_path_factory.mktemp("hl") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
        d,
        num_partitions=2,
        order_col="k",
        id_cols=["k"],
    )
    return d


def test_stored_field_rides_docmap(spark, stored_idx):
    dm = spark.read.parquet(f"{stored_idx}/segments/*/docmap.parquet")
    assert "content" in dm.columns
    rows = {r["k"]: r["content"] for r in dm.select("k", "content").collect()}
    assert rows[1] == DOCS[1]["content"]


def test_highlight_stemmed_query_marks_surface_forms(spark, stored_idx):
    # query 'searching' -> stem 'search'; must mark both 'searching' and
    # 'searched' surface forms in their docs
    snips = {
        s.doc_key["k"]: s
        for s in highlight(spark, stored_idx, "content:searching", "content")
    }
    assert set(snips) == {0, 2}
    assert "**searching**" in snips[0].text
    assert "**searched**" in snips[2].text
    assert snips[0].n_matches == 1 and snips[2].n_matches == 1


def test_highlight_phrase_marks_constituents_and_windows(spark, stored_idx):
    snips = highlight(
        spark, stored_idx, 'content:"quick brown fox"', "content", window_tokens=3
    )
    assert [s.doc_key["k"] for s in snips] == [0]
    t = snips[0].text
    assert "**quick**" in t and "**brown**" in t and "**fox**" in t
    assert t.endswith("…")  # truncated window, not the whole doc


def test_highlight_ranked_order_and_scores(spark, stored_idx):
    snips = highlight(spark, stored_idx, "content:quick", "content", scorer="tfidf")
    assert [s.doc_key["k"] for s in snips] == sorted(
        (s.doc_key["k"] for s in snips),
        key=lambda k: (-dict((x.doc_key["k"], x.score) for x in snips)[k], k),
    )
    assert all(s.score > 0 for s in snips)


def test_highlight_survives_merge_and_purge(spark, tmp_path):
    from ostrich_spark.deletes import delete_docs
    from ostrich_spark.merge import purge_deletes

    s = Schema()
    s.add_text_field("content", "en_stem", positions=True, store=True)
    d = str(tmp_path / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
        d,
        num_partitions=3,
        order_col="k",
        id_cols=["k"],
    )
    delete_docs(spark, d, spark.createDataFrame([(0,)], "k long"), ["k"])
    purge_deletes(spark, d)  # docmap remap path must carry stored columns
    snips = highlight(spark, d, "content:searching", "content")
    assert [x.doc_key["k"] for x in snips] == [2]
    assert "**searched**" in snips[0].text


def test_highlight_requires_store_flag(spark, tmp_path):
    s = Schema()
    s.add_text_field("content", "default")  # no store
    d = str(tmp_path / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
        d,
        num_partitions=1,
        order_col="k",
        id_cols=["k"],
    )
    with pytest.raises(ValueError, match="store=True"):
        highlight(spark, d, "content:quick", "content")


def test_window_snippet_no_match_returns_head():
    from ostrich_spark.analysis import get_analyzer

    text, n = _window_snippet(
        "alpha beta gamma delta", {"zzz"}, get_analyzer("default"), 1, ("<", ">")
    )
    assert n == 0
    assert text.startswith("alpha")
    assert "<" not in text


def test_doc_key_excludes_all_stored_fields(spark, tmp_path):
    # regression (ADVICE r2): with TWO store=True fields, highlighting one
    # must not copy the other's full raw value into Snippet.doc_key
    s = Schema()
    s.add_text_field("title", "default", store=True)
    s.add_text_field("content", "en_stem", positions=True, store=True)
    d = str(tmp_path / "idx2")
    docs = [dict(r, title=f"title {r['k']} body") for r in DOCS]
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(docs)),
        s,
        d,
        num_partitions=2,
        order_col="k",
        id_cols=["k"],
    )
    snips = highlight(spark, d, "content:searching", "content")
    assert snips
    for sn in snips:
        assert set(sn.doc_key) == {"k"}  # no 'title', no 'content'


def test_highlight_df_matches_driver_path(spark, stored_idx):
    """The distributed (Arrow UDF) snippet path must be row-identical to
    the driver path: same keys, scores, snippet text, match counts."""
    from ostrich_spark.highlight import highlight_df

    driver = {
        s.doc_key["k"]: s
        for s in highlight(spark, stored_idx, "content:searching", "content", limit=10)
    }
    dist = {
        r["k"]: r
        for r in highlight_df(
            spark, stored_idx, "content:searching", "content", limit=10
        ).collect()
    }
    assert set(dist) == set(driver)
    for k, s in driver.items():
        assert dist[k]["snippet"] == s.text
        assert dist[k]["n_matches"] == s.n_matches
        assert dist[k]["score"] == pytest.approx(s.score)


def test_highlight_df_export_all_has_no_limit(spark, stored_idx):
    from ostrich_spark.highlight import highlight_df

    rows = highlight_df(spark, stored_idx, "content:quick", "content").collect()
    assert {r["k"] for r in rows} == {0, 2}
    # stored bodies must NOT ride along (only identity + snippet columns)
    assert "content" not in rows[0].asDict()
    for r in rows:
        assert "**quick**" in r["snippet"]


def test_highlight_df_requires_store(spark, tmp_path):
    from ostrich_spark.highlight import highlight_df

    s = Schema()
    s.add_text_field("content", "default")
    d = str(tmp_path / "nostore")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, d,
        num_partitions=1, order_col="k", id_cols=["k"],
    )
    with pytest.raises(ValueError, match="store=True"):
        highlight_df(spark, d, "content:quick", "content")


def test_highlight_marks_multiterm_expansions(spark, stored_idx):
    """A prefix/wildcard query's EXPANDED terms get marked — the pattern
    node itself carries no terms (regression: used to mark nothing)."""
    snips = {
        s.doc_key["k"]: s
        for s in highlight(spark, stored_idx, "content:sear*", "content", limit=5)
    }
    assert snips and any(s.n_matches > 0 for s in snips.values())
    # stemmed dictionary term 'search' marks both surface forms
    assert "**searching**" in snips[0].text
    assert "**searched**" in snips[2].text
