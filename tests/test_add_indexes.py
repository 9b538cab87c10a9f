"""add_indexes — absorb other indexes' segments without re-tokenizing
(Lucene IndexWriter.addIndexes(Directory...) analog; EXTENSION). The
contract: after add_indexes(dest, [src...]), dest answers every query
exactly as an index built from the UNION corpus would (BM25 included —
global doc/token stats merge), tombstones ride along, and the normal
merge policy can compact the combined segment set."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.export import add_indexes, export_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark", "query", "score"]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    return s


def _docs(lo, hi):
    return [
        {"k": i, "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 5))}
        for i in range(lo, hi)
    ]


def _build(spark, path, lo, hi, build_id):
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(_docs(lo, hi))),
        _schema(),
        path,
        num_partitions=2,
        order_col="k",
        id_cols=["k"],
        build_id=build_id,
    )
    return path


def _hits(spark, idx, q, scorer="bm25"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    return sorted(
        (r["k"], round(r["score"], 9))
        for r in attach_docmap(spark, idx, res).select("k", "score").collect()
    )


def test_add_indexes_equals_union_rebuild(spark, tmp_path):
    a = _build(spark, str(tmp_path / "a"), 0, 30, "ba")
    _build(spark, str(tmp_path / "b"), 30, 50, "bb")
    c = _build(spark, str(tmp_path / "c"), 0, 50, "bc")  # union reference
    m = add_indexes(spark, a, [str(tmp_path / "b")])
    assert m.total_docs == 50
    for q in ("content:merge", "content:spark AND content:query",
              "content:merge OR content:score"):
        for scorer in ("tfidf", "bm25"):  # bm25 exercises merged avgdl
            assert _hits(spark, a, q, scorer) == _hits(spark, c, q, scorer), (q, scorer)


def test_add_indexes_carries_tombstones_and_merges_after(spark, tmp_path):
    from ostrich_spark.merge import merge_segments

    a = _build(spark, str(tmp_path / "a"), 0, 20, "ba")
    b = _build(spark, str(tmp_path / "b"), 20, 40, "bb")
    delete_docs(spark, b, spark.createDataFrame([(25,)], "k long"), ["k"])
    add_indexes(spark, a, [b])
    ks = {k for k, _ in _hits(spark, a, "content:merge OR content:policy OR "
                              "content:segment OR content:index OR content:spark")}
    assert 25 not in ks and len(ks) == 39
    # the combined index compacts like any other: merge everything into
    # one segment (purges the carried tombstone on the way)
    mf = load_manifest(a)
    merge_segments(spark, a, [s.segment_id for s in mf.segments], "segMERGED")
    ks2 = {k for k, _ in _hits(spark, a, "content:merge OR content:policy OR "
                               "content:segment OR content:index OR content:spark")}
    assert ks2 == ks


def test_add_indexes_rejects_collisions_and_schema_drift(spark, tmp_path):
    a = _build(spark, str(tmp_path / "a"), 0, 10, "ba")
    clone = str(tmp_path / "clone")
    export_index(a, clone)  # keeps segment ids
    with pytest.raises(ValueError, match="collides"):
        add_indexes(spark, a, [clone])
    other = str(tmp_path / "other")
    s2 = Schema()
    s2.add_text_field("content", "en_stem")  # different analyzer
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(_docs(50, 60))), s2, other,
        num_partitions=1, order_col="k", id_cols=["k"], build_id="bo",
    )
    with pytest.raises(ValueError, match="prefix of the destination"):
        add_indexes(spark, a, [other])
    with pytest.raises(ValueError, match="at least one"):
        add_indexes(spark, a, [])


def test_add_indexes_dest_extra_appended_field_ok(spark, tmp_path):
    """dest evolved with an appended field: sources without it are valid
    (the add_field contract — old segments hold no data for it)."""
    from ostrich_spark.manifest import add_field

    a = _build(spark, str(tmp_path / "a"), 0, 10, "ba")
    b = _build(spark, str(tmp_path / "b"), 10, 20, "bb")
    add_field(a, "extra")
    m = add_indexes(spark, a, [b])
    assert m.total_docs == 20
    assert {k for k, _ in _hits(spark, a, "content:merge")} >= {0, 7, 14}


# ---------------------------------------------------------------------------
# reindex (ES _reindex analog — rebuild from stored fields)
# ---------------------------------------------------------------------------


def test_reindex_changes_analyzer(spark, tmp_path):
    from ostrich_spark.build import reindex

    src = str(tmp_path / "src")
    docs = [
        {"k": 0, "content": "Having serious virus issues"},
        {"k": 1, "content": "the virus spreads serious concern"},
        {"k": 2, "content": "nothing related here"},
    ]
    s = Schema()
    s.add_text_field("content", "default", store=True)
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, src,
        num_partitions=2, order_col="k", id_cols=["k"], build_id="src",
    )
    s2 = Schema()
    s2.add_text_field("content", "en_stem", store=True)
    dest = str(tmp_path / "dest")
    reindex(spark, src, dest, s2)
    # stemmed semantics: 'serious'->'seriou' matches both stem variants
    ks = {k for k, _ in _hits(spark, dest, "content:serious", "tfidf")}
    assert ks == {0, 1}
    # fresh-build reference identity
    ref = str(tmp_path / "ref")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s2, ref,
        num_partitions=2, order_col="k", id_cols=["k"], build_id="ref",
    )
    assert _hits(spark, dest, "content:virus", "bm25") == _hits(
        spark, ref, "content:virus", "bm25"
    )


def test_reindex_excludes_tombstones_and_validates(spark, tmp_path):
    from ostrich_spark.build import reindex

    src = _build(spark, str(tmp_path / "src"), 0, 10, "src")
    delete_docs(spark, src, spark.createDataFrame([(3,)], "k long"), ["k"])
    s2 = Schema()
    s2.add_text_field("content", "en_stem")
    with pytest.raises(ValueError, match="store=True"):
        reindex(spark, src, str(tmp_path / "d1"), s2)  # content not stored
    src2 = str(tmp_path / "src2")
    s3 = Schema()
    s3.add_text_field("content", "default", store=True)
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(_docs(0, 10))), s3, src2,
        num_partitions=2, order_col="k", id_cols=["k"], build_id="s2",
    )
    delete_docs(spark, src2, spark.createDataFrame([(3,)], "k long"), ["k"])
    dest = str(tmp_path / "dest")
    m = reindex(spark, src2, dest, s3)
    assert m.total_docs == 9  # tombstoned doc excluded from the rebuild
    ks = {k for k, _ in _hits(spark, dest, "content:merge OR content:policy OR "
                              "content:segment OR content:index OR content:spark")}
    assert 3 not in ks and len(ks) == 9


def test_add_indexes_crash_then_retry(spark, tmp_path, monkeypatch):
    """Crash mid-copy: dest's committed manifest is untouched (manifest
    written LAST) and a retry succeeds over the partial orphan dirs."""
    import shutil as _sh

    import ostrich_spark.export as ex

    a = _build(spark, str(tmp_path / "a"), 0, 20, "ba")
    b = _build(spark, str(tmp_path / "b"), 20, 40, "bb")
    before = load_manifest(a)
    calls = {"n": 0}
    real = _sh.copytree

    def crashing(src, dst, *args, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first segment copies, second crashes
            real(src, dst, *args, **kw)  # leave a PARTIAL second dir too
            raise RuntimeError("simulated crash mid-copy")
        return real(src, dst, *args, **kw)

    monkeypatch.setattr(ex.shutil, "copytree", crashing)
    with pytest.raises(RuntimeError, match="simulated"):
        add_indexes(spark, a, [b])
    monkeypatch.setattr(ex.shutil, "copytree", real)
    # dest commit point unchanged; search unaffected
    after = load_manifest(a)
    assert after.opstamp == before.opstamp
    assert len(after.segments) == len(before.segments)
    assert len(_hits(spark, a, "content:merge")) > 0
    # retry over the orphan dirs succeeds and equals a clean absorb
    m = add_indexes(spark, a, [b])
    assert m.total_docs == 40
    c = _build(spark, str(tmp_path / "c"), 0, 40, "bc")
    assert _hits(spark, a, "content:merge OR content:score") == _hits(
        spark, c, "content:merge OR content:score"
    )


# ---------------------------------------------------------------------------
# more_like_this by document identity (ES like:[{_id}])
# ---------------------------------------------------------------------------


def test_mlt_by_doc_id(spark, tmp_path):
    from ostrich_spark.query.exec import more_like_this, more_like_this_doc

    src = str(tmp_path / "mlt")
    docs = [
        {"k": 0, "content": "spark streaming joins windows"},
        {"k": 1, "content": "spark streaming windows galore"},
        {"k": 2, "content": "completely different topic entirely"},
    ]
    s = Schema()
    s.add_text_field("content", "default", store=True)
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, src,
        num_partitions=1, order_col="k", id_cols=["k"], build_id="m",
    )
    res, _ = more_like_this_doc(spark, src, "content", 0, "k", limit=5)
    got = attach_docmap(spark, src, res).select("k").collect()
    ks = [r["k"] for r in got]
    assert 0 not in ks and 1 in ks  # self excluded, near-dup found
    # exclude_self=False reproduces the raw text-seeded ranking
    res2, _ = more_like_this_doc(
        spark, src, "content", 0, "k", exclude_self=False, limit=5
    )
    raw, _ = more_like_this(
        spark, src, "content", docs[0]["content"], limit=5
    )
    assert sorted(map(tuple, res2.collect())) == sorted(map(tuple, raw.collect()))
    # deleted seeds and non-stored fields raise
    delete_docs(spark, src, spark.createDataFrame([(0,)], "k long"), ["k"])
    with pytest.raises(ValueError, match="deleted docs"):
        more_like_this_doc(spark, src, "content", 0, "k")
