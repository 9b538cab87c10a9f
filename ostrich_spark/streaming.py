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
