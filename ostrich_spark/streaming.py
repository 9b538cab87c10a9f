"""Structured-Streaming incremental indexing.

The reference ingests via an in-process micro-batcher (go-batch handler
goroutines, /root/reference/indexer/index_writer.go:55-116): each flushed
batch becomes a new segment, Commit persists the meta, then merge
candidates are considered. The Spark-native equivalent is
``readStream -> foreachBatch``: every micro-batch is indexed into fresh
segments appended to the committed manifest (build_index mode='append'),
then the log merge policy compacts — the same log-structured lifecycle,
driven by Structured Streaming's exactly-once batch ids.

Idempotency on replay: segment ids embed the batch id, and per-partition
checkpoint fragments make re-processing a batch a no-op (the
resumability machinery doubles as streaming exactly-once).
"""

from __future__ import annotations

from .build import build_index
from .merge import consider_merges
from .schema import Schema


def foreach_batch_indexer(
    schema: Schema,
    index_dir: str,
    num_partitions: int = 4,
    order_col: str | None = None,
    id_cols: list[str] | None = None,
    merge_policy_kwargs: dict | None = None,
    run_merges: bool = True,
):
    """Returns a foreachBatch callback that indexes each micro-batch."""

    def fn(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        build_index(
            spark,
            batch_df,
            schema,
            index_dir,
            num_partitions=num_partitions,
            order_col=order_col,
            id_cols=id_cols,
            build_id=f"stream-b{batch_id:06d}",
            mode="append",
        )
        if run_merges:
            consider_merges(spark, index_dir, merge_policy_kwargs)

    return fn


def streaming_dedup(stream_df, text_col: str = "text", id_col: str = "doc_id"):
    """Exactly-first-seen streaming dedup — the stateful-operator shape
    (``applyInPandasWithState``): a doc whose content hash was emitted in
    ANY earlier micro-batch is dropped; within a batch the min-``id_col``
    copy wins (deterministic keeper).

    Scale posture: keyed by content_sha256, so the state shuffle is
    uniform and the state store holds ONE tiny row per distinct document
    ever seen — the streaming analog of the batch ``exact_dups`` keeper
    join, with the corpus-wide "seen" set living in Spark's checkpointed
    state store instead of a join against the full history."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream_df.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
    out_schema = hashed.schema

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            for _ in pdfs:  # drain: hash already emitted in a prior batch
                pass
            return
        first = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            batch_min = pdf.loc[[pdf[id_col].idxmin()]]
            if first is None or batch_min[id_col].iloc[0] < first[id_col].iloc[0]:
                first = batch_min
        state.update((1,))
        if first is not None:
            yield first

    return hashed.groupBy("content_sha256").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_index(
    stream_df,
    schema: Schema,
    index_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 4,
    order_col: str | None = None,
    id_cols: list[str] | None = None,
    trigger_available_now: bool = True,
    merge_policy_kwargs: dict | None = None,
    run_merges: bool = True,
):
    """Attach the indexer to a streaming DataFrame; returns the query."""
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            foreach_batch_indexer(
                schema,
                index_dir,
                num_partitions=num_partitions,
                order_col=order_col,
                id_cols=id_cols,
                merge_policy_kwargs=merge_policy_kwargs,
                run_merges=run_merges,
            )
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
