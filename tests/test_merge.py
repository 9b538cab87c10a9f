"""Merge policy goldens (FIXTURES.md §5) + merge ≡ rebuild property."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.manifest import load_manifest, segment_dir
from ostrich_spark.merge import compute_merge_candidates, consider_merges, merge_segments
from ostrich_spark.oracle import OracleIndex
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema


# ---- policy goldens (hand-computed vs log_merge_policy.go:34-71) --------


def segs(*sizes):
    return [(f"s{i:02d}", n) for i, n in enumerate(sizes)]


def test_fewer_than_8_no_merge():
    assert compute_merge_candidates(segs(*[100] * 7)) == []


def test_8_equal_tiny_segments_one_candidate():
    out = compute_merge_candidates(segs(*[100] * 8))
    assert len(out) == 1 and len(out[0]) == 8


def test_huge_segments_excluded():
    # >=10M docs never merge (maxDocsBeforeMerge)
    out = compute_merge_candidates(segs(*([10_000_000] * 8)))
    assert out == []


def test_clip_at_min_layer_size():
    # all below 10k clip to the same level regardless of raw size
    out = compute_merge_candidates(segs(1, 10, 100, 1000, 5000, 9999, 42, 7))
    assert len(out) == 1 and len(out[0]) == 8


def test_levels_split_raw_not_log():
    # the reference compares RAW clipped sizes against curMax-0.75 — so
    # 20000 and 19999.5+ are one level, but 20000 vs 19000 SPLIT (levels
    # are ~0.75-doc wide!), reproducing the literal (buggy-vs-Lucene)
    # semantics.
    sizes = [20_000] * 8 + [19_000] * 8
    out = compute_merge_candidates(segs(*sizes))
    assert len(out) == 2
    assert all(len(g) == 8 for g in out)


def test_mixed_sizes_straddle_level_window():
    # 8 segments at 10_000 (clipped floor) + 7 at 30_000: only the floor
    # level reaches minNumSegments
    sizes = [30_000] * 7 + [10_000] * 8
    out = compute_merge_candidates(segs(*sizes))
    assert len(out) == 1 and len(out[0]) == 8


# ---- merge ≡ rebuild property (merger.go remapping invariant) ------------


@pytest.fixture(scope="module")
def corpus_docs():
    pdf = make_corpus(240, seed=42)
    return pdf


def _hits(spark, idx, q, scorer="tfidf"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("path", "score").collect()
    return sorted([(r["path"], r["score"]) for r in rows], key=lambda t: (-t[1], t[0]))


MERGE_QUERIES = [
    "content:merge_policy",
    "content:search AND content:index",
    "content:rareterm001 OR content:the",
    "(content:func OR content:def) AND content:query",
    "content:東京",
]


def test_merge_equivalent_to_rebuild(spark, tmp_path, corpus_docs):
    schema = Schema()
    schema.add_text_field("content", "default")
    df = spark.createDataFrame(corpus_docs)

    idx_a = str(tmp_path / "idx_many")
    build_index(
        spark, df, schema, idx_a, num_partitions=10, order_col="path", id_cols=["path"],
        build_id="many",
    )
    man_a = load_manifest(idx_a)
    assert len(man_a.segments) == 10

    # force a merge of all segments (policy floor would not trigger at
    # this tiny scale, so call merge_segments directly)
    all_ids = [s.segment_id for s in man_a.segments]
    merge_segments(spark, idx_a, all_ids, "merge-test-000")
    man_merged = load_manifest(idx_a)
    assert len(man_merged.segments) == 1
    assert man_merged.total_docs == 240
    # old segment dirs GC'd
    import os

    assert not any(os.path.isdir(segment_dir(idx_a, sid)) for sid in all_ids)

    idx_b = str(tmp_path / "idx_one")
    build_index(
        spark, df, schema, idx_b, num_partitions=1, order_col="path", id_cols=["path"],
        build_id="one",
    )

    oracle = OracleIndex(schema, [{"content": c} for c in corpus_docs["content"]])
    # oracle doc ids are row order; map to path for comparison
    paths = corpus_docs["path"].tolist()

    for q in MERGE_QUERIES:
        for scorer in ("tfidf", "bm25"):
            ha = _hits(spark, idx_a, q, scorer)
            hb = _hits(spark, idx_b, q, scorer)
            assert ha == hb, (q, scorer)
            expected = sorted(
                [(paths[d], s) for d, s in oracle.search(q, limit=None, scorer=scorer)],
                key=lambda t: (-t[1], t[0]),
            )
            assert [p for p, _ in ha] == [p for p, _ in expected], (q, scorer)
            for (p1, s1), (p2, s2) in zip(ha, expected):
                assert s1 == pytest.approx(s2, rel=1e-12)


def test_consider_merges_fixpoint(spark, tmp_path, corpus_docs):
    schema = Schema()
    schema.add_text_field("content", "default")
    df = spark.createDataFrame(corpus_docs)
    idx = str(tmp_path / "idx_fix")
    build_index(
        spark, df, schema, idx, num_partitions=9, order_col="path", id_cols=["path"],
        build_id="fix",
    )
    # with the tiny-scale policy override (min 8 to merge), 9 segments all
    # clip to one level -> one merge -> 1 segment; then fixpoint
    created = consider_merges(spark, idx)
    assert len(created) == 1
    man = load_manifest(idx)
    assert len(man.segments) == 1 and man.total_docs == 240
