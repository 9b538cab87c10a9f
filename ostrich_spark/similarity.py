"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: F.zip_with product + F.aggregate sum — stays
  JVM-side, no Python. The scale baseline: broadcast the query vector,
  one pass over the embeddings table, TakeOrderedAndProject top-k.
- IVF-bucketed variant: assign each vector to its nearest of C coarse
  centroids (here: the first C vectors by vec_id — a deterministic stand-
  in for k-means, which is a training detail, not a query-path one), then
  search only the query's bucket. At 100 TB this turns a full scan into a
  1/C partition-pruned scan when the table is written partitioned by
  cluster_id.
- embedding near-dup: cosine >= threshold within a blocking key (label),
  the standard blocked self-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(emb_df, query_vec: list[float], k: int = 10, exclude_vec_id=None):
    """Top-k by cosine to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    d = emb_df.withColumn("sim", F.round(cosine_col(F.col("embedding"), q), 6))
    if exclude_vec_id is not None:
        d = d.filter(F.col("vec_id") != exclude_vec_id)
    return (
        d.select("vec_id", "sim")
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_assign(emb_df, n_centroids: int = 8):
    """(vec_id, cluster_id, sim) — nearest of the first n_centroids
    vectors (deterministic ties -> lowest centroid id)."""
    cents = (
        emb_df.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    joined = emb_df.crossJoin(F.broadcast(cents)).withColumn(
        "sim", F.round(cosine_col(F.col("embedding"), F.col("cvec")), 6)
    )
    best = joined.groupBy("vec_id").agg(
        F.max(F.struct(F.col("sim"), (-F.col("cid")).alias("negcid"))).alias("m")
    )
    return best.select(
        "vec_id",
        (-F.col("m.negcid")).alias("cluster_id"),
        F.col("m.sim").alias("sim"),
    )


def ivf_topk(emb_df, query_vec: list[float], k: int = 10, n_centroids: int = 8):
    """Scale path: search only the query's coarse cluster."""
    assign = ivf_assign(emb_df, n_centroids)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = emb_df.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    qbest = (
        cents.withColumn("sim", cosine_col(F.col("cvec"), q))
        .orderBy(F.desc("sim"), F.asc("cid"))
        .limit(1)
    )
    target = [r["cid"] for r in qbest.collect()][0]
    bucket = assign.filter(F.col("cluster_id") == target).select("vec_id")
    return (
        emb_df.join(bucket, "vec_id")
        .withColumn("sim", F.round(cosine_col(F.col("embedding"), q), 6))
        .select("vec_id", "sim")
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def neardup_pairs(emb_df, threshold: float = 0.9, block_col: str = "label"):
    """Blocked self-join near-duplicate detection."""
    a = emb_df.alias("a")
    b = emb_df.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("sim", F.round(cosine_col(F.col("a.embedding"), F.col("b.embedding")), 6))
        .filter(F.col("sim") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "sim",
        )
    )
