"""Weak-scaling ladder runner (BENCH/SCALE_LADDER.md): one rung at a
chosen corpus size with constant docs/partition (15k), including the
merge stage and a persisted-ANN build at the same scale.

The corpus is generated DISTRIBUTED (one make_corpus chunk per task,
chunk-seeded, chunk-prefixed paths) so the rung size is bounded by the
cluster, not the driver — at 3.84M files the single-driver pandas
generation of the smaller rungs would not fit comfortably.

Usage: python tools/ladder.py [n_files] [cpus]
  (docs/partition pinned at 15000; partitions = n_files / 15000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 15_000


def gen_corpus(spark, n_files: int, out_path: str) -> float:
    from ostrich_spark.corpus import make_corpus

    n_chunks = n_files // CHUNK

    def gen(it):
        for pdf in it:
            for c in pdf["id"]:
                chunk = make_corpus(CHUNK, seed=42 + int(c))
                chunk["path"] = f"chunk{int(c):04d}/" + chunk["path"]
                yield chunk

    t0 = time.time()
    (
        spark.range(n_chunks)
        .repartition(n_chunks)
        .mapInPandas(gen, "repo string, path string, commit string, lang string, content string")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return time.time() - t0


def gen_embeddings(spark, n: int, dim: int = 16):
    def gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            for c in pdf["id"]:
                rng = np.random.default_rng(1000 + int(c))
                X = rng.normal(size=(CHUNK, dim))
                X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(int(c) * CHUNK, (int(c) + 1) * CHUNK),
                        "embedding": X.tolist(),
                    }
                )

    n_chunks = n // CHUNK
    return (
        spark.range(n_chunks)
        .repartition(n_chunks)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 3_840_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nparts = n_files // CHUNK

    from pyspark.sql import SparkSession

    from ostrich_spark.build import build_index
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.merge import merge_segments
    from ostrich_spark.schema import Schema
    from ostrich_spark.similarity import ivf_build

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ostrich-ladder-{n_files}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stages = set(os.environ.get("LADDER_STAGES", "gen,build,merge,ivf").split(","))

    corpus_path = f"/tmp/ladder_corpus_{n_files}"
    if not os.path.exists(corpus_path):
        gen_sec = gen_corpus(spark, n_files, corpus_path)
        print(f"corpus gen: {gen_sec:.1f}s -> {corpus_path}")
    corpus = spark.read.parquet(corpus_path)

    idx = f"/tmp/ladder_idx_{n_files}"
    schema = Schema()
    schema.add_text_field("content", "default")

    if "build" in stages:
        # small warmup build (JIT/arrow codegen; long-lived executors on
        # a real cluster amortize this)
        warm_idx = "/tmp/ladder_warm_idx"
        shutil.rmtree(warm_idx, ignore_errors=True)
        build_index(
            spark, corpus.limit(10_000), schema, warm_idx,
            num_partitions=2, order_col="path", id_cols=["path"], build_id="warm",
        )
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        manifest = build_index(
            spark, corpus, schema, idx,
            num_partitions=nparts, order_col="path", id_cols=["path"], build_id="ladder",
        )
        build_sec = time.time() - t0
        phases = manifest.stats.get("build_phases", {})
        print(
            f"build: {n_files} files, {nparts} parts, local[{cpus}]: "
            f"{build_sec:.1f}s total, map {phases.get('map_sec', 0):.1f}s, "
            f"commit {phases.get('commit_sec', 0):.1f}s -> "
            f"{n_files / build_sec:.0f} files/sec ({n_files / phases.get('map_sec', build_sec):.0f} map-stage)"
        )

    if "merge" in stages:
        # merge: all segments -> 1
        m = load_manifest(idx)
        seg_ids = [s.segment_id for s in m.sorted_segments()]
        shard_thr = int(os.environ.get("LADDER_SHARD_THRESHOLD", "1000000"))
        t0 = time.time()
        merge_segments(
            spark, idx, seg_ids, f"ladder_merged_t{shard_thr}",
            shard_threshold=shard_thr,
        )
        merge_sec = time.time() - t0
        print(
            f"merge: {len(seg_ids)} segments / {n_files} docs -> 1 in "
            f"{merge_sec:.1f}s ({n_files / merge_sec:.0f} docs/sec)"
        )

    if "ivf" in stages:
        # persisted-ANN build at the same scale
        emb = gen_embeddings(spark, n_files)
        ivf_path = f"/tmp/ladder_ivf_{n_files}"
        shutil.rmtree(ivf_path, ignore_errors=True)
        t0 = time.time()
        ivf_build(spark, emb, ivf_path, n_centroids=64, train_iters=3, sample_size=50_000)
        ivf_sec = time.time() - t0
        print(
            f"ivf_build: {n_files} vectors (dim 16, 64 trained centroids): "
            f"{ivf_sec:.1f}s ({n_files / ivf_sec:.0f} vec/sec)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
