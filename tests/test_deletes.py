"""Document deletes: tombstone visibility, stats semantics, merge-time
purge, crash safety.

Contract under test (deletes.py / merge.py docstrings):
- tombstoned docs disappear from every query path immediately (term,
  boolean, phrase, WAND top-k, AllQuery, counts) while global stats stay
  frozen (Lucene semantics);
- purge_deletes physically removes them: the purged index is
  score-identical to a fresh rebuild over the surviving docs (stats AND
  term_stats recomputed);
- top-k with deletes is exact (no WAND-threshold contamination from
  deleted docs);
- delete commits are atomic (CURRENT pointer swap) and idempotent.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.deletes import (
    delete_docs,
    has_tombstones,
    load_tombstone_map,
    read_tombstones,
    tombstone_count,
)
from ostrich_spark.manifest import load_manifest
from ostrich_spark.merge import merge_segments, purge_deletes
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema


def _docs(n=24):
    return [
        {"k": i, "content": f"alpha beta doc{i} " + ("spark join " * (i % 3 + 1))}
        for i in range(n)
    ]


def _schema():
    s = Schema()
    s.add_text_field("content", "default", positions=True)
    return s


def _build(spark, path, docs, parts=3):
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(docs)),
        _schema(),
        path,
        num_partitions=parts,
        order_col="k",
        id_cols=["k"],
    )


def _keys(spark, idx, q, **kw):
    res, cnt = search(spark, idx, q, limit=None, **kw)
    ks = sorted(r["k"] for r in attach_docmap(spark, idx, res).select("k").collect())
    return ks, cnt


def _scored(spark, idx, q, scorer="tfidf", limit=None):
    res, _ = search(spark, idx, q, limit=limit, scorer=scorer)
    return sorted(
        (r["k"], round(r["score"], 6))
        for r in attach_docmap(spark, idx, res).select("k", "score").collect()
    )


@pytest.fixture()
def deleted_idx(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())
    victims = spark.createDataFrame([(i,) for i in range(0, 24, 2)], "k long")
    n = delete_docs(spark, idx, victims, ["k"])
    assert n == 12
    return idx


def test_tombstones_hide_docs_everywhere(spark, deleted_idx):
    odd = list(range(1, 24, 2))
    assert _keys(spark, deleted_idx, "content:spark")[0] == odd
    assert _keys(spark, deleted_idx, 'content:"spark join"')[0] == odd
    assert _keys(spark, deleted_idx, "content:alpha AND content:spark")[0] == odd
    assert _keys(spark, deleted_idx, "")[0] == odd  # AllQuery
    _, cnt = _keys(spark, deleted_idx, "content:spark", with_count=True)
    assert cnt == 12
    _, cnt_all = search(spark, deleted_idx, "", limit=0, with_count=True)
    assert cnt_all == 12


def test_tombstone_stats_frozen_until_purge(spark, deleted_idx, tmp_path):
    """Lucene semantics: before purge, scores use the FULL-corpus df/N —
    identical per-doc scores to the undeleted index, just filtered."""
    ref = str(tmp_path / "ref_full")
    _build(spark, ref, _docs())
    full = dict(_scored(spark, ref, "content:spark"))
    tomb = dict(_scored(spark, deleted_idx, "content:spark"))
    assert set(tomb) == {k for k in full if k % 2 == 1}
    for k, s in tomb.items():
        assert s == full[k]


def test_topk_exact_with_deletes(spark, deleted_idx):
    """Survivor docs must fill the top-k freed by deleted docs (the
    WAND-threshold trap: a threshold seeded by deleted docs would prune
    them). doc scores rise with k%3, so top docs alternate even/odd."""
    got = _scored(spark, deleted_idx, "content:spark OR content:join", limit=5)
    all_kept = _scored(spark, deleted_idx, "content:spark OR content:join")
    want = sorted(all_kept, key=lambda t: (-t[1], t[0]))[:5]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want
    assert all(k % 2 == 1 for k, _ in got)


def test_purge_equals_rebuild(spark, deleted_idx, tmp_path):
    created = purge_deletes(spark, deleted_idx)
    assert created
    assert not has_tombstones(deleted_idx)
    mf = load_manifest(deleted_idx)
    assert mf.stats["total_docs"] == 12
    assert mf.stats["tombstones"] == 0

    ref = str(tmp_path / "ref_kept")
    _build(spark, ref, [d for d in _docs() if d["k"] % 2 == 1], parts=2)
    for q in ("content:spark", 'content:"spark join"', "content:doc3", "content:alpha"):
        for scorer in ("tfidf", "bm25"):
            assert _scored(spark, deleted_idx, q, scorer) == _scored(
                spark, ref, q, scorer
            ), (q, scorer)


def test_purge_during_size_merge(spark, deleted_idx):
    """A normal multi-source merge also purges: merge every segment into
    one, then the tombstones are gone and docs stay hidden."""
    mf = load_manifest(deleted_idx)
    merge_segments(spark, deleted_idx, [s.segment_id for s in mf.segments], "merged-all")
    assert not has_tombstones(deleted_idx)
    mf2 = load_manifest(deleted_idx)
    assert [s.segment_id for s in mf2.segments] == ["merged-all"]
    assert mf2.stats["total_docs"] == 12
    assert _keys(spark, deleted_idx, "content:spark")[0] == list(range(1, 24, 2))


def test_delete_idempotent_and_incremental(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())
    v1 = spark.createDataFrame([(0,), (2,)], "k long")
    assert delete_docs(spark, idx, v1, ["k"]) == 2
    assert delete_docs(spark, idx, v1, ["k"]) == 0  # already tombstoned
    v2 = spark.createDataFrame([(2,), (4,)], "k long")
    assert delete_docs(spark, idx, v2, ["k"]) == 1  # only 4 is new
    assert tombstone_count(idx) == 3
    assert read_tombstones(spark, idx).count() == 3
    ks, _ = _keys(spark, idx, "content:alpha")
    assert ks == [k for k in range(24) if k not in (0, 2, 4)]


def test_delete_unknown_keys_is_noop(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())
    ghosts = spark.createDataFrame([(999,)], "k long")
    assert delete_docs(spark, idx, ghosts, ["k"]) == 0
    assert not has_tombstones(idx)


def test_tombstone_map_driver_view(spark, deleted_idx):
    m = load_tombstone_map(deleted_idx)
    mf = load_manifest(deleted_idx)
    assert set(m) <= {s.segment_id for s in mf.segments}
    assert sum(len(v) for v in m.values()) == 12
    for arr in m.values():
        assert list(arr) == sorted(set(arr))


def test_crash_between_pointer_and_manifest_is_safe(spark, tmp_path):
    """The CURRENT pointer is the delete commit; a crash before the
    manifest opstamp bump leaves deletes visible and consistent."""
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())
    import ostrich_spark.deletes as del_mod

    orig = del_mod.save_manifest
    del_mod.save_manifest = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    try:
        with pytest.raises(OSError):
            delete_docs(
                spark, idx, spark.createDataFrame([(1,)], "k long"), ["k"]
            )
    finally:
        del_mod.save_manifest = orig
    # tombstone committed (pointer swapped) even though manifest save died
    assert has_tombstones(idx)
    ks, _ = _keys(spark, idx, "content:alpha")
    assert 1 not in ks
    # rerunning the same delete converges (idempotent) and bumps manifest
    assert delete_docs(spark, idx, spark.createDataFrame([(1,)], "k long"), ["k"]) == 0


def test_append_after_delete(spark, tmp_path):
    """New segments ingested after a delete are unaffected by old
    tombstones; the deleted doc stays hidden."""
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs(12))
    delete_docs(spark, idx, spark.createDataFrame([(3,)], "k long"), ["k"])
    extra = [{"k": 100 + i, "content": f"alpha extra{i}"} for i in range(4)]
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(extra)),
        _schema(),
        idx,
        num_partitions=1,
        order_col="k",
        id_cols=["k"],
        build_id="b2",
        mode="append",
    )
    ks, _ = _keys(spark, idx, "content:alpha")
    assert ks == [k for k in range(12) if k != 3] + [100, 101, 102, 103]


@pytest.mark.parametrize("seed", [11, 12])
def test_delete_fuzz_tombstone_and_purge(spark, tmp_path, seed):
    """Randomized differential: random delete subset -> (a) tombstone
    results == full-index results minus deleted docs with UNCHANGED
    scores; (b) purge results == fresh rebuild over survivors."""
    import random

    rng = random.Random(seed)
    docs = _docs(30)
    victims = sorted(rng.sample(range(30), rng.randint(5, 15)))

    idx = str(tmp_path / "idx")
    _build(spark, idx, docs)
    full = {}
    queries = ["content:spark", "content:alpha AND content:join", 'content:"spark join"']
    for q in queries:
        full[q] = dict(_scored(spark, idx, q))

    delete_docs(
        spark, idx, spark.createDataFrame([(v,) for v in victims], "k long"), ["k"]
    )
    vic = set(victims)
    for q in queries:
        got = dict(_scored(spark, idx, q))
        assert got == {k: s for k, s in full[q].items() if k not in vic}, q

    purge_deletes(spark, idx)
    ref = str(tmp_path / "ref")
    _build(spark, ref, [d for d in docs if d["k"] not in vic], parts=2)
    for q in queries:
        for scorer in ("tfidf", "bm25"):
            assert _scored(spark, idx, q, scorer) == _scored(spark, ref, q, scorer), (q, scorer)


def test_purge_through_shard_patch_path(spark, tmp_path):
    """shard_threshold=0 routes every posting row through the map-only
    patch path during merge — the purge rewrite in that branch must drop
    deleted docs and remap identically to the group-merge branch."""
    idx = str(tmp_path / "idx")
    docs = _docs(24)
    _build(spark, idx, docs)
    delete_docs(
        spark, idx, spark.createDataFrame([(i,) for i in range(0, 24, 3)], "k long"), ["k"]
    )
    mf = load_manifest(idx)
    merge_segments(
        spark, idx, [s.segment_id for s in mf.segments], "merged-sp", shard_threshold=0
    )
    assert not has_tombstones(idx)
    kept = [k for k in range(24) if k % 3 != 0]
    assert _keys(spark, idx, "content:alpha")[0] == kept
    # score identity vs rebuild over survivors (stats recomputed)
    ref = str(tmp_path / "ref")
    _build(spark, ref, [d for d in docs if d["k"] % 3 != 0], parts=2)
    for q in ("content:spark", 'content:"spark join"'):
        assert _scored(spark, idx, q) == _scored(spark, ref, q), q


def test_cli_delete_respects_string_id_type(spark, tmp_path):
    # regression (ADVICE r2): with a STRING id column, `delete --values 7`
    # must not tombstone '07' via an implicit string->long cast-join.
    import pandas as pd

    from ostrich_spark.build import build_index
    from ostrich_spark.cli import main
    from ostrich_spark.deletes import tombstone_count
    from ostrich_spark.schema import Schema

    idx = str(tmp_path / "idx")
    s = Schema()
    s.add_text_field("content", "default")
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"path": "07", "content": "alpha beta"},
                {"path": "7", "content": "gamma delta"},
                {"path": "9", "content": "epsilon zeta"},
            ]
        )
    )
    build_index(spark, df, s, idx, num_partitions=2, order_col="path", id_cols=["path"])

    rc = main(["delete", "-p", idx, "--id-col", "path", "--values", "7"])
    assert rc == 0
    assert tombstone_count(idx) == 1  # only '7', never '07'

    # unknown id column -> clean exit 2
    assert main(["delete", "-p", idx, "--id-col", "nope", "--values", "7"]) == 2


def test_delete_by_query_matches_value_path(spark, tmp_path):
    """_delete_by_query analog: tombstoning by query leaves exactly the
    same visible set as tombstoning the equivalent id list."""
    from ostrich_spark.deletes import delete_by_query

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _build(spark, a, _docs())
    _build(spark, b, _docs())
    # doc{i} with i % 3 == 2 carries "spark join spark join spark join";
    # use a phrase-ish query: every doc has spark, so pick a term query
    # on doc7's unique token to prove arbitrary query shapes work, then
    # a broad one
    n = delete_by_query(spark, a, "content:doc7")
    assert n == 1
    victims = spark.createDataFrame([(7,)], "k long")
    assert delete_docs(spark, b, victims, ["k"]) == 1
    assert _keys(spark, a, "content:alpha") == _keys(spark, b, "content:alpha")
    # idempotent
    assert delete_by_query(spark, a, "content:doc7") == 0
    # no-match query is a no-op
    assert delete_by_query(spark, a, "content:zzznomatch") == 0


def test_delete_by_query_boolean_and_compose(spark, tmp_path):
    """Boolean NQL shapes tombstone correctly and compose with existing
    value tombstones; stats stay frozen (shared tombstone semantics)."""
    from ostrich_spark.deletes import delete_by_query

    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())
    assert delete_docs(spark, idx, spark.createDataFrame([(1,)], "k long"),
                       ["k"]) == 1
    # tombstone every doc with tf(spark) >= 2 (i % 3 in (1, 2)) via an
    # OR of their unique tokens — exercise a multi-clause tree
    n = delete_by_query(spark, idx, "content:doc3 OR content:doc4")
    assert n == 2
    ks, _ = _keys(spark, idx, "content:alpha")
    assert ks == [k for k in range(24) if k not in (1, 3, 4)]
    assert tombstone_count(idx) == 3
    # the deleted docs are invisible to a query they WOULD match
    assert 3 not in _keys(spark, idx, "content:doc3")[0]


def test_cli_delete_by_query(spark, tmp_path):
    """CLI --query path goes through delete_by_query (no --id-col
    needed); --values without --id-col errors."""
    import subprocess
    import sys

    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "delete", "-p", idx,
             *extra],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("--query", "content:doc5")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tombstoned 1 docs" in out.stdout
    ks, _ = _keys(spark, idx, "content:alpha")
    assert 5 not in ks and len(ks) == 23
    bad = run("--values", "3")
    assert bad.returncode == 2 and "--id-col" in bad.stderr


def test_purge_skips_clear_shards_with_offset_adjust(spark, tmp_path):
    """r4 trim of the purge path: a tombstoned segment whose term is
    row_ord-SHARDED only rewrites the shards a deleted doc actually
    falls into — shards clear of deletions ride the columnar patch with
    seg_off reduced by the deletions BELOW them (the constant densify
    shift). Deletions confined to a narrow low docID range + a
    multi-shard merged segment exercise exactly that branch; results
    must equal a fresh rebuild over the survivors.
    """
    idx = str(tmp_path / "idx")
    docs = _docs(60)
    _build(spark, idx, docs, parts=4)
    mf = load_manifest(idx)
    # step 1: shard every term by source row (shard_threshold=0) into
    # one merged segment -> each term carries 4 doc-range shards
    merge_segments(
        spark, idx, [s.segment_id for s in mf.segments], "m-shard",
        shard_threshold=0,
    )
    # step 2: tombstone docs k in [3, 9) — all in the LOWEST shard's
    # docID range (order_col=k, 15 docs/source partition)
    victims = list(range(3, 9))
    delete_docs(
        spark, idx,
        spark.createDataFrame([(k,) for k in victims], "k long"), ["k"],
    )
    # step 3: purge through the sharded path again — upper shards are
    # clear of deletions but need the below-count offset adjustment
    mf = load_manifest(idx)
    merge_segments(
        spark, idx, [s.segment_id for s in mf.segments], "m-purged",
        shard_threshold=0,
    )
    assert not has_tombstones(idx)
    ref = str(tmp_path / "ref")
    _build(spark, ref, [d for d in docs if d["k"] not in victims], parts=2)
    kept = [k for k in range(60) if k not in victims]
    assert _keys(spark, idx, "content:alpha")[0] == kept
    for q in ("content:spark", 'content:"spark join"', "content:alpha AND content:spark"):
        for scorer in ("tfidf", "bm25"):
            assert _scored(spark, idx, q, scorer) == _scored(spark, ref, q, scorer), (q, scorer)
