"""Regression tests for the round-1 judge/advisor findings:

1. merge rerun after a fully-committed merge is a no-op (the manifest
   must never list the merged segment twice);
2. term_stats/manifest commit pairing: stats with a mismatched opstamp
   are ignored (fallback to summing segment postings), never used;
3. term_stats is range-partitioned (multi-file) and bind_stats reads it
   correctly with per-file pruning possible (disjoint sorted ranges);
4. source-tree path relativization survives regex metacharacters in the
   root and nested dirs sharing the root's basename;
5. connected_components converges on long chains in O(log d) rounds and
   raises (never silently splits) when it cannot.
"""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest, save_manifest
from ostrich_spark.schema import Schema


def _make_docs(n=60):
    words = ["merge", "policy", "segment", "index", "spark", "query", "score"]
    return [
        {"k": i, "content": " ".join(words[j % len(words)] for j in range(i, i + 6))}
        for i in range(n)
    ]


@pytest.fixture()
def small_idx(spark, tmp_path):
    idx = str(tmp_path / "idx")
    schema = Schema()
    schema.add_text_field("content", "default")
    docs = _make_docs()
    df = spark.createDataFrame(pd.DataFrame(docs))
    build_index(
        spark, df, schema, idx, num_partitions=4, order_col="k", id_cols=["k"]
    )
    return idx


def test_merge_rerun_after_commit_is_noop(spark, small_idx):
    from ostrich_spark.merge import merge_segments

    mf = load_manifest(small_idx)
    sids = [s.segment_id for s in mf.segments]
    assert len(sids) >= 2
    meta1 = merge_segments(spark, small_idx, sids, "merged-a")
    mf_after = load_manifest(small_idx)
    # blind rerun (orchestrator retry after success): must be a pure no-op
    meta2 = merge_segments(spark, small_idx, sids, "merged-a")
    mf_rerun = load_manifest(small_idx)
    assert meta2.segment_id == meta1.segment_id
    assert [s.segment_id for s in mf_rerun.segments] == [
        s.segment_id for s in mf_after.segments
    ]
    assert sum(1 for s in mf_rerun.segments if s.segment_id == "merged-a") == 1
    assert mf_rerun.opstamp == mf_after.opstamp


def test_merge_resume_after_crash_between_save_and_gc(spark, small_idx):
    """Crash window: manifest saved, GC not run (old dirs still on disk),
    then a blind rerun. The segment must appear exactly once."""
    from ostrich_spark import merge as merge_mod
    from ostrich_spark.merge import merge_segments

    mf = load_manifest(small_idx)
    sids = [s.segment_id for s in mf.segments]
    orig_gc = merge_mod.garbage_collect
    merge_mod.garbage_collect = lambda d: []  # simulate crash before GC
    try:
        merge_segments(spark, small_idx, sids, "merged-b")
    finally:
        merge_mod.garbage_collect = orig_gc
    # old segment dirs still exist; rerun blindly
    merge_segments(spark, small_idx, sids, "merged-b")
    mf2 = load_manifest(small_idx)
    assert [s.segment_id for s in mf2.segments] == ["merged-b"]


def test_term_stats_opstamp_pairing(spark, small_idx):
    from ostrich_spark.query.exec import _term_stats_valid, bind_stats
    from ostrich_spark.query.parser import TermQuery

    mf = load_manifest(small_idx)
    stats_path = os.path.join(small_idx, "term_stats.parquet")
    assert os.path.isdir(stats_path)
    assert _term_stats_valid(stats_path, mf)

    q = TermQuery(0, "merge")
    df_good, _, _ = bind_stats(spark, small_idx, mf, q)

    # simulate the crash window: manifest committed at opstamp N but the
    # stats promote never ran (stats meta still says N-1) — bind_stats
    # must IGNORE the stale stats and fall back to postings
    meta = os.path.join(stats_path, "_STATS_META.json")
    with open(meta) as f:
        recorded = json.load(f)
    with open(meta, "w") as f:
        json.dump({"opstamp": recorded["opstamp"] - 1}, f)
    assert not _term_stats_valid(stats_path, mf)
    # poison the stats values to prove the fallback is what's answering
    files = glob.glob(os.path.join(stats_path, "*.parquet"))
    tbl = pq.read_table(files[0]).to_pandas()
    tbl["doc_freq"] = tbl["doc_freq"] * 1000
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(tbl, preserve_index=False), files[0]
    )
    df_fallback, _, _ = bind_stats(spark, small_idx, mf, q)
    assert df_fallback == df_good

    # restore pairing -> (poisoned) stats would be used again
    with open(meta, "w") as f:
        json.dump(recorded, f)
    df_poisoned, _, _ = bind_stats(spark, small_idx, mf, q)
    assert df_poisoned != df_good


def test_term_stats_multifile_range_partitioned(spark, small_idx):
    """Force a multi-file stats write (est_terms >> rows/file) and check:
    files hold disjoint, sorted (field, term) ranges (so row-group /
    file-level stats can prune a point lookup) and bind_stats still
    answers correctly through the pyarrow dataset path."""
    from ostrich_spark.build import (
        _promote_term_stats,
        _write_term_stats_staged,
    )
    from ostrich_spark.query.exec import bind_stats
    from ostrich_spark.query.parser import TermQuery

    mf = load_manifest(small_idx)
    q = TermQuery(0, "segment")
    want, _, _ = bind_stats(spark, small_idx, mf, q)

    staging = _write_term_stats_staged(
        spark,
        small_idx,
        [s.segment_id for s in mf.segments],
        mf.stats["term_stats_opstamp"],
        est_terms=5_000_000,  # -> 3 range partitions
    )
    _promote_term_stats(small_idx, staging)
    files = sorted(
        glob.glob(os.path.join(small_idx, "term_stats.parquet", "*.parquet"))
    )
    nonempty = [f for f in files if pq.read_metadata(f).num_rows > 0]
    assert len(files) == 3
    ranges = []
    for f in nonempty:
        t = pq.read_table(f, columns=["field", "term"]).to_pandas()
        keys = list(zip(t["field"], t["term"]))
        assert keys == sorted(keys)  # sorted within file
        ranges.append((keys[0], keys[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint across files

    got, _, _ = bind_stats(spark, small_idx, mf, q)
    assert got == want


def test_source_tree_relativization_hostile_root(spark, tmp_path):
    from ostrich_spark.sources import load_source_tree

    root = tmp_path / "my.repo+v2"
    # nested dir sharing the root's basename — the old greedy-regex bug
    # collapsed <root>/sub/my.repo+v2/a.py onto 'a.py'
    (root / "sub" / "my.repo+v2").mkdir(parents=True)
    (root / "a.py").write_text("print('top')\n")
    (root / "sub" / "my.repo+v2" / "a.py").write_text("print('nested')\n")

    df = load_source_tree(spark, str(root))
    paths = sorted(r["path"] for r in df.select("path").collect())
    assert paths == ["a.py", "sub/my.repo+v2/a.py"]


def test_connected_components_long_chain_pointer_jumping(spark):
    from ostrich_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc_a long, doc_b long"
    )
    comp = connected_components(pairs, max_iter=12)
    rows = comp.collect()
    assert len(rows) == 200
    assert {r["comp"] for r in rows} == {0}


def test_connected_components_raises_on_non_convergence(spark):
    from ostrich_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_attach_docmap_uses_pinned_manifest(spark, small_idx, monkeypatch):
    """attach_docmap(manifest=...) must not reload from disk — results and
    docmap have to come from the same snapshot."""
    from ostrich_spark.query import exec as exec_mod
    from ostrich_spark.query.exec import attach_docmap, search

    mf = load_manifest(small_idx)
    res, _ = search(spark, small_idx, "content:merge", limit=5, manifest=mf)
    rows = res.collect()
    assert rows

    def boom(_):
        raise AssertionError("attach_docmap reloaded the manifest")

    monkeypatch.setattr(exec_mod, "load_manifest", boom)
    joined = attach_docmap(spark, small_idx, res, manifest=mf)
    assert joined.count() == len(rows)


def test_must_not_extension(spark, small_idx):
    """MUST_NOT (programmatic-only extension; the reference has no
    MustNot): base matches minus excluded matches, scores from the
    positive clause alone."""
    from ostrich_spark.query.exec import attach_docmap, search
    from ostrich_spark.query.parser import (
        MUST,
        MUST_NOT,
        BooleanQuery,
        TermQuery,
    )

    def run(q):
        res, _ = search(spark, small_idx, q, limit=None)
        return {
            r["k"]: round(r["score"], 6)
            for r in attach_docmap(spark, small_idx, res).select("k", "score").collect()
        }

    base = run(TermQuery(0, "merge"))
    excl = run(TermQuery(0, "spark"))
    got = run(
        BooleanQuery([(MUST, TermQuery(0, "merge")), (MUST_NOT, TermQuery(0, "spark"))])
    )
    assert set(got) == set(base) - set(excl)
    for k, s in got.items():
        assert s == base[k]  # scores untouched by the negative clause
    # pure-negative query matches nothing
    assert run(BooleanQuery([(MUST_NOT, TermQuery(0, "merge"))])) == {}
    # excluding an absent term is a no-op
    got2 = run(
        BooleanQuery([(MUST, TermQuery(0, "merge")), (MUST_NOT, TermQuery(0, "zzz"))])
    )
    assert got2 == base
    # BooleanQuery.excluding helper builds the same query
    from ostrich_spark.query.parser import BooleanQuery as BQ

    got3 = run(BQ.excluding(TermQuery(0, "merge"), TermQuery(0, "spark")))
    assert got3 == got
