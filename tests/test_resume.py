"""Resumable builds (north rule): kill after k of P partition checkpoints,
restart, identical final index, no duplicated partition work."""

import os

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.manifest import load_fragment, load_manifest
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    return s


def _postings_fingerprint(spark, idx):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{idx}/segments/*/postings.parquet")
    row = df.agg(
        F.count("*").alias("rows"),
        F.sum("doc_freq").alias("df"),
        F.sum("total_tf").alias("tf"),
        F.sum(F.crc32(F.col("docs"))).alias("crc"),
    ).collect()[0]
    return tuple(row)


def test_crash_and_resume(spark, tmp_path):
    pdf = make_corpus(200, seed=42)
    df = spark.createDataFrame(pdf)
    schema = _schema()

    # uninterrupted reference build
    idx_ref = str(tmp_path / "ref")
    build_index(
        spark, df, schema, idx_ref, num_partitions=6, order_col="path",
        id_cols=["path"], build_id="b1",
    )

    # crashed build: tasks fail once >=2 fragments exist
    idx = str(tmp_path / "crash")
    with pytest.raises(Exception):
        build_index(
            spark, df, schema, idx, num_partitions=6, order_col="path",
            id_cols=["path"], build_id="b1", fail_after_partitions=2,
        )
    seg_root = os.path.join(idx, "segments")
    done_before = sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []
    assert 0 < len(done_before) < 6  # partial progress is durable
    assert not os.path.exists(os.path.join(idx, "manifest.json"))  # not committed

    # resume with the same build_id: completed partitions are skipped
    manifest = build_index(
        spark, df, schema, idx, num_partitions=6, order_col="path",
        id_cols=["path"], build_id="b1",
    )
    assert manifest.total_docs == 200
    skipped = [
        s for s in manifest.segments
        if load_fragment(idx, s.segment_id) and s.segment_id in done_before
    ]
    assert len(skipped) == len([s for s in done_before if not s.endswith(".tmp")])

    # identical final index content
    assert _postings_fingerprint(spark, idx) == _postings_fingerprint(spark, idx_ref)
    assert load_manifest(idx).total_docs == load_manifest(idx_ref).total_docs

    # identical query results
    for q in ("content:merge_policy", "content:search AND content:index"):
        a, _ = search(spark, idx, q, limit=None)
        b, _ = search(spark, idx_ref, q, limit=None)
        ra = sorted(
            (r["path"], r["score"])
            for r in attach_docmap(spark, idx, a).select("path", "score").collect()
        )
        rb = sorted(
            (r["path"], r["score"])
            for r in attach_docmap(spark, idx_ref, b).select("path", "score").collect()
        )
        assert ra == rb


def test_rerun_is_all_skips(spark, tmp_path):
    """Re-running a completed build does no partition work (lineage: every
    metrics row reports skipped)."""
    pdf = make_corpus(60, seed=7)
    df = spark.createDataFrame(pdf)
    schema = _schema()
    idx = str(tmp_path / "idx")
    m1 = build_index(
        spark, df, schema, idx, num_partitions=3, order_col="path",
        id_cols=["path"], build_id="bx",
    )
    m2 = build_index(
        spark, df, schema, idx, num_partitions=3, order_col="path",
        id_cols=["path"], build_id="bx",
    )
    assert m2.total_docs == m1.total_docs == 60
    assert m2.opstamp == m1.opstamp + 1
    # fragments unchanged -> same segment ids, same metrics
    assert [s.segment_id for s in m2.segments] == [s.segment_id for s in m1.segments]
