"""Structured-Streaming incremental indexing: batches become appended
segments; final index answers queries identically to a batch build."""

import os

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema
from ostrich_spark.streaming import stream_index


def _hits(spark, idx, q, scorer="tfidf"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("path", "score").collect()
    return sorted([(r["path"], r["score"]) for r in rows])


def test_stream_index_equals_batch(spark, tmp_path):
    pdf = make_corpus(180, seed=11)
    schema = Schema()
    schema.add_text_field("content", "default")

    # stage the corpus as three parquet files arriving over time
    src = tmp_path / "incoming"
    os.makedirs(src)
    for i in range(3):
        part = pdf.iloc[i * 60 : (i + 1) * 60]
        spark.createDataFrame(part).coalesce(1).write.mode("append").parquet(str(src))

    stream_df = (
        spark.readStream.schema("repo string, path string, commit string, lang string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    idx_s = str(tmp_path / "idx_stream")
    q = stream_index(
        stream_df,
        schema,
        idx_s,
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_partitions=2,
        order_col="path",
        id_cols=["path"],
    )
    q.awaitTermination(120)

    man = load_manifest(idx_s)
    assert man.total_docs == 180
    assert man.opstamp >= 2  # multiple commits happened

    idx_b = str(tmp_path / "idx_batch")
    build_index(
        spark, spark.createDataFrame(pdf), schema, idx_b,
        num_partitions=2, order_col="path", id_cols=["path"], build_id="batch",
    )

    for query in ("content:merge_policy", "content:search AND content:index"):
        for scorer in ("tfidf", "bm25"):
            assert _hits(spark, idx_s, query, scorer) == pytest.approx(
                _hits(spark, idx_b, query, scorer)
            )


def test_stream_append_stats_accumulate(spark, tmp_path):
    """mode='append' accumulates total_docs/field_tokens across commits."""
    pdf = make_corpus(80, seed=5)
    schema = Schema()
    schema.add_text_field("content", "default")
    idx = str(tmp_path / "idx")
    a, b = pdf.iloc[:40], pdf.iloc[40:]
    build_index(spark, spark.createDataFrame(a), schema, idx, num_partitions=2,
                order_col="path", id_cols=["path"], build_id="p1", mode="append")
    m1 = load_manifest(idx)
    build_index(spark, spark.createDataFrame(b), schema, idx, num_partitions=2,
                order_col="path", id_cols=["path"], build_id="p2", mode="append")
    m2 = load_manifest(idx)
    assert m1.total_docs == 40 and m2.total_docs == 80
    assert m2.opstamp == m1.opstamp + 1
    assert sum(m2.stats["field_tokens"].values()) == m2.stats["total_tokens"]


def test_streaming_dedup_first_seen_wins(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates within a batch keep the
    min-id copy; duplicates of anything seen in an EARLIER batch are
    dropped entirely (state store remembers across micro-batches)."""
    import pandas as pd

    from ostrich_spark.streaming import streaming_dedup

    src = tmp_path / "docs_in"
    os.makedirs(src)
    batch1 = pd.DataFrame(
        [
            {"doc_id": 5, "text": "alpha"},
            {"doc_id": 2, "text": "alpha"},   # within-batch dup -> min id (2) wins
            {"doc_id": 3, "text": "beta"},
        ]
    )
    batch2 = pd.DataFrame(
        [
            {"doc_id": 1, "text": "alpha"},   # earlier batch won -> dropped (even though 1 < 2)
            {"doc_id": 9, "text": "gamma"},   # new -> kept
            {"doc_id": 8, "text": "beta"},    # dropped
        ]
    )
    # two files, forced into two micro-batches via maxFilesPerTrigger=1;
    # file order = write order (modification time)
    spark.createDataFrame(batch1).coalesce(1).write.mode("append").parquet(str(src))
    import time as _t

    _t.sleep(1.1)  # distinct mtimes so batch1 is processed first
    spark.createDataFrame(batch2).coalesce(1).write.mode("append").parquet(str(src))

    stream_df = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    deduped = streaming_dedup(stream_df, text_col="text", id_col="doc_id")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT doc_id, text FROM dedup_sink").collect()
    }
    assert rows == {(2, "alpha"), (3, "beta"), (9, "gamma")}
