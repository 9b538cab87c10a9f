"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: F.zip_with product + F.aggregate sum — stays
  JVM-side, no Python. The scale baseline: broadcast the query vector,
  one pass over the embeddings table, TakeOrderedAndProject top-k.
- IVF index, PERSISTED: ``ivf_build`` trains coarse centroids (sampled
  driver-side Lloyd's k-means — spherical, deterministic) and writes the
  corpus once, ``partitionBy("cluster_id")``, next to a centroids
  parquet. ``ivf_search`` reads the centroids, picks nprobe clusters,
  and scans ONLY those partitions — at 100 TB the scan cost per query is
  nprobe/C of the corpus via parquet PartitionFilters, instead of a full
  recompute per query.
- the unpersisted ``ivf_assign``/``ivf_topk`` remain as the oracle-gated
  demonstration path (first-C centroids == ``train_iters=0``).
- embedding near-dup: ``neardup_pairs`` (caller-supplied blocking key)
  and ``neardup_pairs_lsh`` — self-contained random-hyperplane LSH:
  sign-bit signatures over deterministic pseudo-random hyperplanes,
  banded bucket-join (bounded by near-dup cluster size, never
  all-pairs), exact cosine verification on candidates.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
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


def brute_force_topk(emb_df, query_vec: list[float], k: int | None = 10,
                     exclude_vec_id=None):
    """Top-k by cosine to a literal query vector. ``k=None`` returns
    EVERY vector's similarity uncut and unordered (for callers that
    rank themselves, e.g. rrf_fuse) — a TakeOrdered with a huge k would
    materialize a k-sized heap per partition for nothing."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    d = emb_df.withColumn("sim", F.round(cosine_col(F.col("embedding"), q), 6))
    if exclude_vec_id is not None:
        d = d.filter(F.col("vec_id") != exclude_vec_id)
    d = d.select("vec_id", "sim")
    if k is None:
        return d
    return d.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


# ---------------------------------------------------------------------------
# IVF: training, persisted index, partition-pruned search
# ---------------------------------------------------------------------------


def _first_c_centroids(emb_df, n_centroids: int):
    """The deterministic stand-in centroid set (first C vectors by
    vec_id) — the ``train_iters=0`` configuration the DuckDB oracle
    reproduces exactly."""
    return emb_df.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def _assign_to(emb_df, cent_df):
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    one map-side pass over the corpus — no shuffle besides the final
    groupBy(vec_id), which AQE coalesces. Ties -> lowest centroid id."""
    joined = emb_df.crossJoin(F.broadcast(cent_df)).withColumn(
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


def _assign_to_fast(emb_df, centroids: np.ndarray):
    """Nearest-centroid assignment, Arrow-batched: one numpy matmul per
    partition batch against the (tiny, closure-captured) centroid matrix
    — the scale path ``ivf_build`` uses for TRAINED centroids. Catalyst's
    higher-order array functions evaluate interpreted per element; for a
    dense (n, dim) x (dim, C) product numpy is ~10-100x faster (same
    reasoning as the LSH signature stage below). Semantics match
    ``_assign_to``: sim rounded to 6 decimals, ties -> lowest centroid
    id (np.argmax takes the first max)."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def fn(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            E = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            sims = np.round(En @ Cn.T, 6)
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster_id": best.astype(np.int64),
                    "sim": sims[np.arange(len(best)), best],
                }
            )

    return emb_df.select("vec_id", "embedding").mapInPandas(
        fn, "vec_id long, cluster_id long, sim double"
    )


def ivf_train(
    emb_df, n_centroids: int = 8, n_iter: int = 5, sample_size: int = 100_000
) -> np.ndarray:
    """Spherical Lloyd's k-means over a bounded driver-side sample.

    Deterministic end to end: the sample is the ``sample_size`` vectors
    with the SMALLEST deterministic hash (sampling._unit_hash over
    vec_id) — a uniform draw from the whole corpus regardless of how ids
    correlate with ingestion order or domain (a vec_id PREFIX, the r2
    shape, trains on a biased slice when they do). Still TakeOrdered
    (O(n) heap scan, no full sort). Init is the first ``n_centroids`` of
    the hash-ordered sample; every update is argmax-cosine with
    lowest-index tie-break. Centroid training is a one-time O(sample ×
    C × iters) numpy job; only the ASSIGNMENT pass touches the full
    corpus. Returns (C, dim) float64, L2-normalized."""
    from .sampling import _unit_hash

    u = _unit_hash(F.col("vec_id"), "ivf_train")
    rows = (
        emb_df.select("vec_id", "embedding")
        .orderBy(u.asc(), F.col("vec_id").asc())
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    if len(X) < n_centroids:
        raise ValueError(f"need >= {n_centroids} vectors to train, got {len(X)}")
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:n_centroids].copy()
    for _ in range(max(0, n_iter)):
        sims = Xn @ C.T  # (n, C) cosine since both sides normalized
        assign = np.argmax(sims, axis=1)  # argmax takes the FIRST max: lowest cid
        for c in range(n_centroids):
            members = Xn[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    C[c] = v / n
    return C


def ivf_build(
    spark,
    emb_df,
    index_path: str,
    n_centroids: int = 8,
    train_iters: int = 5,
    sample_size: int = 100_000,
    extra_cols: list[str] | None = None,
    quantize: bool = False,
    pq_m: int | None = None,
    pq_ksub: int = 256,
) -> None:
    """Materialize the IVF index once: ``<index_path>/centroids.parquet``
    + ``<index_path>/vectors/cluster_id=<c>/*.parquet``.

    ``train_iters=0`` uses the first-C-vectors centroid set (the
    oracle-reproducible configuration); otherwise sampled k-means.
    The vectors table carries the embedding itself, so a query touches
    ONLY the index — and only nprobe of its C partitions.

    ``quantize=True`` additionally stores int8 codes (``codes
    array<tinyint>``, global (lo, hi) fit persisted in ``quant.json``)
    BESIDE the float embeddings — the ES int8_hnsw economics on Spark
    terms: ivf_search's quantized candidate scan projects ONLY
    (vec_id, codes), so parquet COLUMN PRUNING delivers the 8x byte
    cut inside the same partition-pruned files, and the float column
    is read only for the small rescore window.

    ``pq_m=<m>`` stores PRODUCT-quantized codes instead/as well —
    ``pq_codes array<tinyint>`` (m bytes/vector) with the (m, pq_ksub)
    codebooks persisted in ``pq_books.parquet`` — the faiss IVF-PQ
    layout: ``ivf_search(..., rescore_factor=..., use_pq=True)`` then
    composes BOTH prunings, nprobe/C of the partitions x m/(8*dim) of
    the bytes, before the exact float rescore. Codebooks train with the
    same ``train_iters``/``sample_size`` as the coarse centroids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(index_path, exist_ok=True)
    if train_iters == 0:
        cent_df = _first_c_centroids(emb_df, n_centroids)
        cent_rows = cent_df.orderBy("cid").collect()
        cids = [int(r["cid"]) for r in cent_rows]
        cvecs = [[float(x) for x in r["cvec"]] for r in cent_rows]
    else:
        C = ivf_train(emb_df, n_centroids, train_iters, sample_size)
        cids = list(range(n_centroids))
        cvecs = [[float(x) for x in row] for row in C]
        cent_df = spark.createDataFrame(
            list(zip(cids, cvecs)), "cid int, cvec array<float>"
        )
    tbl = pa.table(
        {"cid": pa.array(cids, pa.int32()), "cvec": pa.array(cvecs, pa.list_(pa.float32()))}
    )
    pq.write_table(tbl, os.path.join(index_path, "centroids.parquet"))

    cols = ["vec_id", "embedding", *(extra_cols or [])]
    if train_iters == 0:
        # first-C path: JVM-side expressions, bit-identical to the DuckDB
        # oracle (the gated configuration)
        assign = _assign_to(emb_df.select(*cols), cent_df).select("vec_id", "cluster_id")
    else:
        # trained path: Arrow-batched numpy assignment (the scale path —
        # one matmul per batch instead of n x C interpreted array-cosines)
        assign = _assign_to_fast(
            emb_df, np.asarray(cvecs, dtype=np.float64)
        ).select("vec_id", "cluster_id")
    out = emb_df.select(*cols).join(assign, "vec_id")
    if quantize:
        import json

        lo, hi = sq_fit(emb_df)
        with open(os.path.join(index_path, "quant.json"), "w") as f:
            json.dump({"lo": lo, "hi": hi}, f)
        out = out.withColumn("codes", sq_code_col(F.col("embedding"), lo, hi))
    if pq_m is not None:
        books = pq_fit(
            emb_df, m=pq_m, ksub=pq_ksub,
            train_iters=train_iters, sample_size=sample_size,
        )
        m, ksub, dsub = books.shape
        btbl = pa.table({
            "j": pa.array(
                [j for j in range(m) for _ in range(ksub)], pa.int32()
            ),
            "cid": pa.array(list(range(ksub)) * m, pa.int32()),
            # float64 so reloaded LUT arithmetic is bit-identical to a
            # fresh fit's
            "centroid": pa.array(
                [books[j][c].tolist() for j in range(m) for c in range(ksub)],
                pa.list_(pa.float64()),
            ),
        })
        pq.write_table(btbl, os.path.join(index_path, "pq_books.parquet"))
        out = pq_encode(out, books, keep_vec=True)
    (
        out
        # range-partition on (cluster_id, vec_id): rows for one cluster
        # still land in its partition dir, but a HOT cluster spreads over
        # several writer tasks/files instead of funneling through one
        # (hash repartition on cluster_id alone = one multi-GB task per
        # hot cluster at real embedding skew)
        .repartitionByRange("cluster_id", "vec_id")
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(os.path.join(index_path, "vectors"))
    )


def _ivf_pq_books(index_path: str):
    """Reload the persisted PQ codebooks -> (m, ksub, dsub) float64
    array, or None when the index was built without ``pq_m``."""
    import pyarrow.parquet as pq

    p = os.path.join(index_path, "pq_books.parquet")
    if not os.path.exists(p):
        return None
    t = pq.read_table(p).to_pandas().sort_values(["j", "cid"])
    m = int(t["j"].max()) + 1
    ksub = int(t["cid"].max()) + 1
    cents = np.asarray([np.asarray(c) for c in t["centroid"]])
    return cents.reshape(m, ksub, -1)


def _ivf_quant_params(index_path: str):
    import json

    p = os.path.join(index_path, "quant.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return float(d["lo"]), float(d["hi"])


def _ivf_sq_candidates(spark, index_path: str, query_vec, targets, window: int,
                       lo: float, hi: float):
    """Quantized candidate scan over the probed partitions: projects
    ONLY (vec_id, codes) — parquet column pruning skips the float
    embedding bytes entirely (asserted in tests via ReadSchema)."""
    vecs = (
        spark.read.parquet(os.path.join(index_path, "vectors"))
        .filter(F.col("cluster_id").isin(targets))
        .select("vec_id", "codes")
    )
    return sq_topk(vecs, query_vec, lo, hi, k=window)


def ivf_append(spark, emb_df, index_path: str,
               extra_cols: list[str] | None = None) -> None:
    """Append new vectors to an EXISTING persisted IVF index — the
    operational shape of a 100 TB embedding pipeline, where the corpus
    arrives in batches and retraining+rewriting the whole index per
    batch is off the table.

    The new batch is assigned under the index's PERSISTED parameters —
    the stored coarse centroids, the stored (lo, hi) scalar quantizer
    if present, the stored PQ codebooks if present — so appended rows
    are bit-compatible with the original build and every ivf_search
    mode keeps working unchanged. Parquet append into the same
    ``cluster_id=<c>`` partition dirs: existing files are never
    rewritten, each append adds files only to the partitions its rows
    land in (hot clusters still spread over several writer tasks via
    the same range repartition). Centroids/quantizers deliberately do
    NOT refit here — a drifted corpus needs an explicit rebuild, the
    same re-train trade documented on sq_quantize."""
    import pyarrow.parquet as papq

    cpath = os.path.join(index_path, "centroids.parquet")
    if not os.path.exists(cpath):
        raise ValueError(f"no IVF index at {index_path!r} (missing "
                         "centroids.parquet) — build first")
    ct = papq.read_table(cpath).to_pandas().sort_values("cid")
    cvecs = np.asarray([np.asarray(v, dtype=np.float64) for v in ct["cvec"]])

    cols = ["vec_id", "embedding", *(extra_cols or [])]
    assign = _assign_to_fast(emb_df, cvecs).select("vec_id", "cluster_id")
    out = emb_df.select(*cols).join(assign, "vec_id")
    params = _ivf_quant_params(index_path)
    if params is not None:
        lo, hi = params
        out = out.withColumn("codes", sq_code_col(F.col("embedding"), lo, hi))
    books = _ivf_pq_books(index_path)
    if books is not None:
        out = pq_encode(out, books, keep_vec=True)
    (
        out
        .repartitionByRange("cluster_id", "vec_id")
        .write.mode("append")
        .partitionBy("cluster_id")
        .parquet(os.path.join(index_path, "vectors"))
    )


def ivf_search(
    spark, index_path: str, query_vec: list[float], k: int = 10, nprobe: int = 1,
    rescore_factor: float | None = None, use_pq: bool = False,
):
    """Partition-pruned ANN: pick the nprobe nearest centroids (tiny
    driver-side read), then scan only those cluster partitions.

    The filter on the PARTITION column reaches the parquet source as a
    PartitionFilter — Spark lists only nprobe/C of the index directories,
    so query cost scales with cluster size, not corpus size.

    On a ``quantize=True`` index, ``rescore_factor`` switches to the
    two-phase ES-int8 path: the candidate scan reads ONLY (vec_id,
    codes) from the probed partitions (column pruning — 1/8th the
    bytes), nominates ceil(k·rescore_factor) by dequantized cosine,
    and the float column is read back for just that window — returned
    scores are EXACT floats. None keeps the float scan (also the only
    option on an unquantized index — asking for rescore there errors).

    ``use_pq=True`` (with ``rescore_factor``) takes candidates from the
    ADC scan over the stored PQ codes instead of the int8 SQ codes —
    the faiss IVF-PQ compose: the candidate pass reads ONLY (vec_id,
    pq_codes) from the nprobe partitions, i.e. nprobe/C of the corpus
    at m/(8·dim) of the bytes, before the exact rescore."""
    cent = spark.read.parquet(os.path.join(index_path, "centroids.parquet"))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = (
        cent.withColumn("sim", cosine_col(F.col("cvec"), q))
        .orderBy(F.desc("sim"), F.asc("cid"))
        .limit(nprobe)
        .collect()
    )
    targets = [int(r["cid"]) for r in probed]
    vecs = spark.read.parquet(os.path.join(index_path, "vectors")).filter(
        F.col("cluster_id").isin(targets)
    )
    if use_pq and rescore_factor is None:
        raise ValueError("use_pq=True needs rescore_factor (ADC nominates "
                         "candidates; the rescore returns exact scores)")
    if rescore_factor is not None:
        if rescore_factor < 1.0:
            raise ValueError(
                f"rescore_factor must be >= 1.0, got {rescore_factor}"
            )
        import math

        window = int(math.ceil(k * rescore_factor))
        if use_pq:
            books = _ivf_pq_books(index_path)
            if books is None:
                raise ValueError(
                    f"use_pq needs a PQ index — rebuild {index_path!r} "
                    f"with ivf_build(..., pq_m=<m>)"
                )
            codes = (
                spark.read.parquet(os.path.join(index_path, "vectors"))
                .filter(F.col("cluster_id").isin(targets))
                .select("vec_id", "pq_codes")
            )
            cand = pq_adc_topk(codes, books, query_vec, k=window) \
                .select("vec_id")
        else:
            params = _ivf_quant_params(index_path)
            if params is None:
                raise ValueError(
                    f"rescore_factor needs a quantized index — rebuild "
                    f"{index_path!r} with ivf_build(..., quantize=True)"
                )
            lo, hi = params
            cand = _ivf_sq_candidates(
                spark, index_path, query_vec, targets, window, lo, hi
            ).select("vec_id")
        vecs = vecs.select("vec_id", "embedding").join(
            F.broadcast(cand), "vec_id", "leftsemi"
        )
    return (
        vecs.withColumn("sim", F.round(cosine_col(F.col("embedding"), q), 6))
        .select("vec_id", "sim")
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_assign(emb_df, n_centroids: int = 8):
    """(vec_id, cluster_id, sim) — nearest of the first n_centroids
    vectors (deterministic ties -> lowest centroid id). The
    oracle-reproducible assignment; ``ivf_build`` persists it."""
    return _assign_to(emb_df, _first_c_centroids(emb_df, n_centroids))


def ivf_topk(emb_df, query_vec: list[float], k: int = 10, n_centroids: int = 8):
    """One-shot IVF search WITHOUT a persisted index (recomputes the
    assignment — fine for a single ad-hoc query; repeated queries should
    ivf_build once and ivf_search the materialized index)."""
    assign = ivf_assign(emb_df, n_centroids)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = _first_c_centroids(emb_df, n_centroids)
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


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def neardup_pairs(emb_df, threshold: float = 0.9, block_col: str = "label"):
    """Blocked self-join near-duplicate detection (caller supplies the
    blocking key). For a self-contained path use ``neardup_pairs_lsh``."""
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


# random-hyperplane family: component (p, i) of plane p is a deterministic
# pseudo-random value in [-1, 1], from the same portable affine-mod trick
# as the minhash family (dedup.py) — pure int64 arithmetic, so the DuckDB
# oracle reproduces the planes bit-for-bit with no literal tables.
_PLANE_MULT = 2_654_435_761
_PLANE_ADD = 97
_PLANE_P = 1_000_000_007
_PLANE_RANGE = 2001  # -> odd so the grid is symmetric around 0


def plane_component(p: int, i: int, dim: int) -> float:
    v = (_PLANE_MULT * (p * dim + i + 1) + _PLANE_ADD) % _PLANE_P
    return float(v % _PLANE_RANGE - (_PLANE_RANGE - 1) // 2) / 1000.0


def neardup_pairs_lsh(
    emb_df,
    threshold: float = 0.9,
    n_planes: int = 64,
    bands: int = 8,
    dim: int | None = None,
):
    """Self-contained near-dup detection: random-hyperplane LSH buckets,
    then exact cosine on candidates.

    - signature bit p = sign(dot(embedding, plane_p)); cosine-similar
      vectors agree on most bits (collision prob = 1 - angle/pi).
    - bits are banded (band = p mod bands, n_planes/bands bits each);
      candidates share at least one full band -> the bucket equi-join is
      bounded by bucket sizes, never all-pairs.
    - the final exact-cosine filter makes the output precise w.r.t. the
      candidate set (recall is the LSH trade-off, tunable via
      bands/n_planes).

    SIZING (the scale knob): each band hashes into 2^(n_planes/bands)
    buckets, and the self-join cost is sum over buckets of |bucket|^2 —
    bits_per_band must GROW with log2(corpus) or buckets collide by
    volume alone. The 64/8 default (8 bits/band, 256 buckets, ~93%
    recall at sim 0.9) suits ~10^4-10^6 rows; at web scale raise toward
    16-24 bits/band and add bands to hold recall. A 16/4 config (4-bit
    bands = 16 buckets) is only usable for tiny corpora/tests.

    Signature math runs as ONE Arrow-batched numpy matmul per partition
    (embeddings (n, dim) @ planes.T) — Catalyst's higher-order array
    functions evaluate interpreted per element, which is ~100x slower for
    a dense dims×planes product; the verify-stage cosine stays JVM-side."""
    if dim is None:
        first = emb_df.select(F.size("embedding").alias("d")).limit(1).collect()
        if not first:
            return emb_df.sparkSession.createDataFrame(
                [], "vec_a long, vec_b long, sim double"
            )
        dim = int(first[0]["d"])
    bits_per_band = n_planes // bands
    planes = np.array(
        [[plane_component(p, i, dim) for i in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )
    # weight of plane p inside its band: band = p % bands, pos = p // bands
    band_of = np.arange(n_planes) % bands
    weight = 1 << (np.arange(n_planes) // bands)

    def band_hashes(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            E = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            bits = (E @ planes.T >= 0).astype(np.int64)  # (n, n_planes)
            hashes = np.zeros((len(pdf), bands), dtype=np.int64)
            for b in range(bands):
                sel = band_of == b
                hashes[:, b] = bits[:, sel] @ weight[sel]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), bands),
                    "band": np.tile(np.arange(bands, dtype=np.int64), len(pdf)),
                    "band_hash": hashes.reshape(-1),
                }
            )

    banded = emb_df.select("vec_id", "embedding").mapInPandas(
        band_hashes, "vec_id long, band long, band_hash long"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = emb_df.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb_df.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    paired = cand.join(ea, "vec_a").join(eb, "vec_b")

    # exact-cosine verify, Arrow-batched: bucket collisions produce far
    # more candidates than survivors, and a per-element interpreted array
    # expression over that volume dominates the whole job
    def verify(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            A = np.asarray(pdf["emb_a"].tolist(), dtype=np.float64)
            B = np.asarray(pdf["emb_b"].tolist(), dtype=np.float64)
            sim = (A * B).sum(axis=1) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            sim = np.round(sim, 6)
            keep = sim >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "sim": sim[keep],
                }
            )

    return paired.mapInPandas(verify, "vec_a long, vec_b long, sim double")


# ---------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal Rank Fusion (ES 8.x `rrf` retriever)
# ---------------------------------------------------------------------------


def rrf_fuse(ranked, on, k: int = 10, rank_constant: int = 60):
    """Reciprocal Rank Fusion — the Elasticsearch ``rrf`` retriever /
    Cormack-Clarke-Buettcher formula: ``fused(d) = Σ_lists
    1/(rank_constant + rank_d)``. ``ranked`` is a list of result
    DataFrames, each carrying the key column(s) ``on`` plus a
    higher-is-better ``score`` column; within each list the rank is
    ``row_number`` over (score desc, *on asc) — deterministic under
    score ties. A doc absent from a list contributes nothing for it
    (the ES window semantics: only docs inside each retriever's
    window participate). Returns top-``k`` rows (*on, ``rrf_score``,
    ``n_lists`` = how many retrievers surfaced the doc), ordered
    (rrf_score desc, *on asc).

    Scale note: inputs are expected to be top-WINDOW results (each
    bounded by its retriever's cut), so the single-partition ranking
    window, the union groupBy and the final TakeOrderedAndProject all
    operate on O(window · lists) rows — never a corpus. Do not feed an
    unbounded match set through this; cut it first."""
    from pyspark.sql import Window

    if not ranked:
        raise ValueError("rrf_fuse needs >= 1 ranked DataFrame")
    if rank_constant < 1:
        raise ValueError("rank_constant must be >= 1 (ES minimum)")
    on = [on] if isinstance(on, str) else list(on)
    parts = []
    for df in ranked:
        if "score" not in df.columns:
            raise ValueError(
                "every ranked DataFrame needs a higher-is-better "
                "`score` column"
            )
        w = Window.orderBy(F.desc("score"), *[F.asc(c) for c in on])
        parts.append(df.select(*on, F.row_number().over(w).alias("__r")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(*on).agg(
        F.sum(1.0 / (F.lit(float(rank_constant)) + F.col("__r"))).alias(
            "rrf_score"
        ),
        F.count("*").alias("n_lists"),
    )
    return fused.orderBy(
        F.desc("rrf_score"), *[F.asc(c) for c in on]
    ).limit(int(k))


def linear_fuse(ranked, on, k: int = 10, weights=None, normalizer: str = "minmax"):
    """Weighted-sum score fusion — the Elasticsearch 8.16+ ``linear``
    retriever analog: ``fused(d) = Σ_lists w_i · norm_i(score_d)``,
    the alternative to RRF when absolute score magnitudes (not just
    ranks) should matter. ``ranked`` / ``on`` follow the rrf_fuse
    contract (result DataFrames each with a higher-is-better ``score``,
    key columns ``on``); ``weights`` defaults to 1.0 per list.

    ``normalizer``: ``"minmax"`` rescales each list to [0, 1] by its
    own (min, max) — the ES option that makes lexical and vector
    scores commensurable; a single-valued list (max == min) normalizes
    to 1.0 everywhere (OUR documented convention — the doc is that
    list's best); ``"none"`` sums raw scores (the ES default, only
    sane when the retrievers share a scale). A doc absent from a list
    contributes nothing for it (the ES window semantics).

    Returns top-``k`` rows (*on, ``linear_score``, ``n_lists``),
    ordered (linear_score desc, *on asc) — deterministic under ties.

    Scale note: same as rrf_fuse — inputs are top-WINDOW results, so
    the per-list min/max window, the union groupBy and the final
    TakeOrderedAndProject all operate on O(window · lists) rows."""
    from pyspark.sql import Window

    if not ranked:
        raise ValueError("linear_fuse needs >= 1 ranked DataFrame")
    if normalizer not in ("minmax", "none"):
        raise ValueError(
            f"normalizer must be minmax/none, got {normalizer!r}"
        )
    ws = [1.0] * len(ranked) if weights is None else [float(w) for w in weights]
    if len(ws) != len(ranked):
        raise ValueError(
            f"{len(ws)} weights for {len(ranked)} ranked lists"
        )
    on = [on] if isinstance(on, str) else list(on)
    parts = []
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for df, w in zip(ranked, ws):
        if "score" not in df.columns:
            raise ValueError(
                "every ranked DataFrame needs a higher-is-better "
                "`score` column"
            )
        s = F.col("score").cast("double")
        if normalizer == "minmax":
            mn = F.min(s).over(w_all)
            mx = F.max(s).over(w_all)
            s = F.when(mx == mn, F.lit(1.0)).otherwise((s - mn) / (mx - mn))
        parts.append(df.select(*on, (F.lit(w) * s).alias("__c")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(*on).agg(
        F.sum("__c").alias("linear_score"),
        F.count("*").alias("n_lists"),
    )
    return fused.orderBy(
        F.desc("linear_score"), *[F.asc(c) for c in on]
    ).limit(int(k))


def hybrid_search(
    spark,
    index_dir: str,
    query,
    emb_df,
    query_vec,
    id_col: str,
    k: int = 10,
    window: int | None = 100,
    rank_constant: int = 60,
    scorer: str = "bm25",
    vec_id_col: str = "vec_id",
    manifest=None,
    default_fields=None,
):
    """Hybrid lexical + vector retrieval fused by RRF — the ES 8.x
    ``retriever: rrf`` over a ``standard`` (text) and a ``knn``
    retriever. The text side is the normal index search cut to
    ``window`` (``None`` = the full match set — exact, and the shape
    the oracle gates); the vector side is brute-force cosine top-window
    over ``emb_df`` against the literal ``query_vec``, keyed by
    ``vec_id_col`` which must align with the index's ``id_col`` values.
    Both lists rank (score desc, id asc) and fuse with
    ``1/(rank_constant + rank)``; docs surfaced by both lists sum both
    contributions — the whole point of RRF: agreement between
    retrievers outranks a high position in either alone.

    Returns (``id_col``, ``rrf_score``, ``n_lists``) top-``k``. The
    fusion operates on window-bounded lists; the text/vector sides keep
    their own scale postures (WAND-eligible top-k scan / one
    TakeOrderedAndProject matmul pass)."""
    from .query.exec import attach_docmap, search

    res, _ = search(
        spark, index_dir, query, limit=window, scorer=scorer,
        manifest=manifest, default_fields=default_fields,
    )
    text = attach_docmap(spark, index_dir, res, manifest=manifest).select(
        F.col(id_col), F.col("score").cast("double").alias("score")
    )
    vec = brute_force_topk(emb_df, list(query_vec), k=window).select(
        F.col(vec_id_col).alias(id_col), F.col("sim").alias("score")
    )
    return rrf_fuse([text, vec], [id_col], k=k, rank_constant=rank_constant)


def filtered_ann(
    spark,
    index_dir: str,
    filter_query,
    emb_df,
    query_vec,
    id_col: str,
    k: int = 10,
    vec_id_col: str = "vec_id",
    manifest=None,
    default_fields=None,
):
    """Pre-filtered vector search — the Elasticsearch ``knn`` query's
    ``filter`` clause: cosine top-``k`` restricted to vectors whose doc
    MATCHES ``filter_query`` (evaluated on the text index; tombstones
    excluded by the search plane). ES semantics exactly: the filter is
    applied DURING the vector search, so the result is the k nearest
    *eligible* vectors — never "top-k then filter", which can return
    fewer than k or miss eligible near vectors.

    Implementation: the filter match set's ids leftsemi-join the
    embedding table BEFORE the similarity scan, so Spark prunes
    ineligible vectors ahead of the distance math and the top-k heap
    (AQE can broadcast the id set when the filter is selective).
    Returns (``vec_id_col``, ``sim``) like brute_force_topk."""
    from .query.exec import attach_docmap, search

    res, _ = search(
        spark, index_dir, filter_query, limit=None,
        manifest=manifest, default_fields=default_fields,
    )
    allowed = (
        attach_docmap(spark, index_dir, res, manifest=manifest)
        .select(F.col(id_col).alias(vec_id_col))
        .distinct()
    )
    eligible = emb_df.join(allowed, vec_id_col, "leftsemi")
    return brute_force_topk(eligible, list(query_vec), k=k)


# ---------------------------------------------------------------------------
# scalar quantization: int8 vector codes + rescored search
# (the Elasticsearch dense_vector int8 / Lucene ScalarQuantizer analog)
# ---------------------------------------------------------------------------


def sq_fit(emb_df, vec_col: str = "embedding") -> tuple[float, float]:
    """Fit the quantizer: ONE global (lo, hi) over every component of
    every vector — the Lucene scalar-quantization parameter pair at
    confidence_interval=1.0 (true min/max; Lucene's default trims
    tails, a recall/precision trade we skip for determinism). One
    map-side min/max aggregation, two doubles to the driver."""
    row = emb_df.select(
        F.min(F.array_min(vec_col)).alias("lo"),
        F.max(F.array_max(vec_col)).alias("hi"),
    ).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    if not hi > lo:
        raise ValueError(
            f"degenerate embedding range [{lo}, {hi}] — all components "
            "equal; scalar quantization needs spread"
        )
    return lo, hi


def _sq_step(lo: float, hi: float) -> float:
    return (hi - lo) / 255.0


def sq_code_col(vec, lo: float, hi: float):
    """Catalyst column: int8 code per component —
    clamp(round((v - lo)/step), 0, 255) - 128, step = (hi - lo)/255.
    Whole-stage codegen; codes store as array<tinyint>: 1 byte per
    component vs 8 for the raw double arrays — the 8x storage/IO cut
    that makes a 100 TB embedding sweep scan-bound instead of
    IO-starved."""
    step = _sq_step(lo, hi)
    return F.transform(
        vec,
        lambda v: (
            F.least(
                F.lit(255.0),
                F.greatest(F.lit(0.0), F.round((v - F.lit(lo)) / F.lit(step))),
            ) - F.lit(128.0)
        ).cast("tinyint"),
    )


def sq_decode_col(codes, lo: float, hi: float):
    """Dequantize: v' = lo + (code + 128) * step — each component within
    step/2 of the original (in-range inputs)."""
    step = _sq_step(lo, hi)
    return F.transform(
        codes,
        lambda c: F.lit(lo) + (c.cast("double") + F.lit(128.0)) * F.lit(step),
    )


def sq_quantize(emb_df, vec_col: str = "embedding",
                lo: float | None = None, hi: float | None = None):
    """Quantize a vector table: -> (codes_df, lo, hi) where codes_df
    carries every NON-vector column plus ``codes array<tinyint>``.
    (lo, hi) default to :func:`sq_fit` over this table; pass them
    explicitly to quantize increments under the ORIGINAL fit (drifted
    new data clamps into range — re-fit when the corpus distribution
    moves, the same re-train trade as IVF centroids)."""
    if lo is None or hi is None:
        lo, hi = sq_fit(emb_df, vec_col)
    out = emb_df.withColumn("codes", sq_code_col(F.col(vec_col), lo, hi)) \
                .drop(vec_col)
    return out, lo, hi


def sq_topk(codes_df, query_vec, lo: float, hi: float, k: int | None = 10,
            id_col: str = "vec_id"):
    """Top-k by cosine over DEQUANTIZED codes — the query vector is
    quantized with the SAME (lo, hi) first (the ES rule: query and
    corpus must share the quantizer or similarities are biased). All
    arithmetic is Catalyst columns (whole-stage codegen over the int8
    scan); ``k=None`` returns every similarity uncut, like
    brute_force_topk."""
    import numpy as np

    step = _sq_step(lo, hi)
    qcodes = np.clip(
        np.round((np.asarray(query_vec, dtype=np.float64) - lo) / step),
        0, 255,
    ) - 128.0
    qdec = [float(lo + (c + 128.0) * step) for c in qcodes]
    q = F.array(*[F.lit(x) for x in qdec])
    d = codes_df.withColumn(
        "sim",
        F.round(cosine_col(sq_decode_col(F.col("codes"), lo, hi), q), 6),
    ).select(id_col, "sim")
    if k is None:
        return d
    return d.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def sq_search(codes_df, emb_df, query_vec, lo: float, hi: float,
              k: int = 10, rescore_factor: float = 4.0,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Quantized candidate scan + float rescore — the ES
    ``rescore_vector`` design (8.x quantized indexes rescore by
    default): the int8 scan nominates ``ceil(k * rescore_factor)``
    candidates (cheap: 1/8th the bytes), then ONLY those join back to
    the float table for exact cosine, and the true top-k of the
    rescored set returns with EXACT scores. Recall loss is confined to
    candidates the quantized ranking pushed below the rescore window;
    rescore_factor widens that window (the ES oversample knob)."""
    if k is None or k < 1:
        raise ValueError(f"sq_search needs k >= 1, got {k}")
    if rescore_factor < 1.0:
        raise ValueError(
            f"rescore_factor must be >= 1.0, got {rescore_factor}"
        )
    import math

    window = int(math.ceil(k * rescore_factor))
    cand = sq_topk(codes_df, query_vec, lo, hi, k=window, id_col=id_col) \
        .select(id_col)
    eligible = emb_df.join(F.broadcast(cand), id_col, "leftsemi")
    return brute_force_topk(
        eligible.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("embedding")),
        list(query_vec), k=k,
    )


def semantic_dedup(
    spark,
    emb_df,
    eps: float = 0.05,
    n_clusters: int = 8,
    train_iters: int = 5,
    sample_size: int = 100_000,
    keep: str = "far",
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    near-duplicate pruning for training data: k-means cluster the
    embedding space, then within each cluster keep ONE member of every
    group of points with pairwise cosine >= 1 - eps. Cross-cluster
    near-duplicates are missed BY DESIGN — that is the approximation
    that makes the op linear (pairwise work is m² per cluster, never
    n²; size ``n_clusters`` so corpus/n_clusters fits one task, the
    paper's own recipe — they run 50k clusters over 1e9 points).

    Duplicate groups are the CONNECTED COMPONENTS of the eps-pair graph
    within a cluster (A~B, B~C -> one group even when cos(A, C) <
    1 - eps), matching the paper; ``keep`` picks the survivor:

      - ``"far"`` (the paper's choice): the member with the LOWEST
        cosine to its centroid — pruning keeps the cluster's diverse
        edge, not its dense core;
      - ``"min_id"``: smallest vec_id.

    Ties always break vec_id asc, all similarities round to 6 decimals
    before comparison (the module convention), ``train_iters=0`` pins
    first-C centroids (the oracle-reproducible configuration) — so the
    survivor set is deterministic and partition-invariant.

    Returns one row per input vector: (vec_id, cluster_id,
    centroid_sim, survives, kept_id) — ``kept_id`` is the surviving
    member's id for dropped rows and NULL for survivors (the audit
    trail a pipeline logs before discarding data).

    Scale posture: ONE shuffle (the cluster groupBy); everything else —
    the m x m normalized matmul, union-find over the thresholded
    adjacency, the keep rule — runs numpy-side inside each cluster's
    task. No pair list ever crosses the network (a blocked self-JOIN
    would push m² rows per cluster through the shuffle)."""
    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if keep not in ("far", "min_id"):
        raise ValueError(f"keep must be 'far' or 'min_id', got {keep!r}")
    if train_iters == 0:
        cent = _first_c_centroids(emb_df, n_clusters)
        centroids = np.asarray(
            [r["cvec"] for r in cent.orderBy("cid").collect()],
            dtype=np.float64,
        )
    else:
        centroids = ivf_train(
            emb_df, n_clusters, n_iter=train_iters, sample_size=sample_size
        )
    assigned = _assign_to_fast(emb_df, centroids).withColumnRenamed(
        "sim", "centroid_sim"
    )
    work = emb_df.select("vec_id", "embedding").join(assigned, "vec_id")
    thr = 1.0 - eps
    keep_far = keep == "far"

    def dedup_cluster(pdf):
        import pandas as pd

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = len(pdf)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        E = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        sims = np.round(En @ En.T, 6)
        adj = sims >= thr
        # union-find over the thresholded adjacency (components are
        # set-determined — order cannot change them)
        parent = np.arange(m)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(m):
            nbrs = np.nonzero(adj[i, i + 1:])[0]
            for j in nbrs + i + 1:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
        root = np.fromiter((find(i) for i in range(m)), dtype=np.int64,
                           count=m)
        csim = pdf["centroid_sim"].to_numpy(dtype=np.float64)
        kept_id = np.empty(m, dtype=np.int64)
        survives = np.zeros(m, dtype=bool)
        for r in np.unique(root):
            members = np.nonzero(root == r)[0]
            if keep_far:
                # lowest centroid cosine; ids ascend within the sorted
                # frame so argmin's first-hit rule IS the vec_id tiebreak
                w = members[int(np.argmin(csim[members]))]
            else:
                w = members[0]  # smallest vec_id (frame is id-sorted)
            survives[w] = True
            kept_id[members] = ids[w]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_id": pdf["cluster_id"].to_numpy(dtype=np.int64),
                "centroid_sim": csim,
                "survives": survives,
                "kept_id": pd.array(
                    [None if s else int(k) for s, k in zip(survives, kept_id)],
                    dtype="Int64",
                ),
            }
        )

    return work.groupBy("cluster_id").applyInPandas(
        dedup_cluster,
        "vec_id long, cluster_id long, centroid_sim double, "
        "survives boolean, kept_id long",
    )


# --- product quantization (PQ) + asymmetric distance computation ------
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011) — the public-domain PQ/ADC design every major
# ANN engine (faiss IVF-PQ, Lucene 9 KNN experiments) builds on. The
# vector splits into m contiguous sub-vectors; each sub-vector
# quantizes to its nearest of ksub per-subspace centroids, so a vector
# stores as m small codes (here m tinyints: 64-dim float64 = 512 bytes
# raw -> 4 bytes at m=4, a 128x scan-size cut — at 100 TB of
# embeddings THE difference between a scan-bound and an IO-starved
# sweep). A query never decodes the corpus: ADC precomputes a
# per-query lookup table LUT[j][c] = <q_j, codebook[j][c]> (m*ksub
# floats, driver-side, microseconds) and each vector's score is m
# table lookups — pure Catalyst element_at over int8 codes, whole-stage
# codegen, no Python in the scan.


def pq_fit(emb_df, m: int = 4, ksub: int = 16, train_iters: int = 0,
           sample_size: int = 65_536, id_col: str = "vec_id",
           vec_col: str = "embedding") -> np.ndarray:
    """Fit the (m, ksub, dsub) sub-space codebooks.

    ``train_iters=0`` (default): codebooks are the sub-vectors of the
    ``ksub`` smallest-``id_col`` rows — deterministic and recomputable
    by the SQL oracle, the same convention as ``ivf_assign``'s
    first-C centroids (gate path). ``train_iters>0``: classic
    per-subspace Lloyd's k-means (L2) over the ``sample_size`` vectors
    with the smallest deterministic hash of ``id_col`` (the
    ``ivf_train`` sampling rule — uniform regardless of id/domain
    correlation; the real path, recall measured in BENCH). Training is
    a one-time bounded driver numpy job; only ``pq_encode`` touches
    the full corpus."""
    if m < 1 or ksub < 1:
        raise ValueError(f"pq_fit wants m >= 1 and ksub >= 1, got {m}, {ksub}")
    if ksub > 256:
        raise ValueError(
            f"ksub must be <= 256 (codes store as tinyint, biased by "
            f"-128 like the int8 scalar quantizer), got {ksub}"
        )
    if train_iters == 0:
        rows = (
            emb_df.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(ksub)
            .collect()
        )
    else:
        from .sampling import _unit_hash

        u = _unit_hash(F.col(id_col), "pq_fit")
        rows = (
            emb_df.select(id_col, vec_col)
            .orderBy(u.asc(), F.col(id_col).asc())
            .limit(sample_size)
            .collect()
        )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    if len(X) < ksub:
        raise ValueError(f"need >= {ksub} vectors to fit, got {len(X)}")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        C = sub[:ksub].copy()
        for _ in range(max(0, train_iters)):
            # L2 assignment; np.argmin keeps the FIRST minimum (lowest
            # centroid index) — the tie rule pq_encode repeats
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def pq_encode(emb_df, codebooks: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding", keep_vec: bool = False):
    """Encode every vector to its m sub-space codes:
    -> (every non-vector column, ``pq_codes array<tinyint>``);
    ``keep_vec=True`` retains the float column beside the codes (the
    IVF-PQ index layout, where the floats serve the rescore pass).

    One Arrow-batched pandas UDF pass (the per-batch work is m small
    numpy matmuls — the ||x||^2 - 2xC^T + ||C||^2 expansion — nothing
    per-row in Python); nearest-centroid ties break to the LOWEST
    centroid index (np.argmin), the rule the oracle's row_number
    recomputes. No shuffle: encoding is a projection."""
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    cnorm2 = (books ** 2).sum(axis=2)  # (m, ksub)

    @pandas_udf("array<tinyint>")
    def _codes(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if X.ndim != 2 or X.shape[1] != m * dsub:
            raise ValueError(
                f"pq_encode: expected dim {m * dsub}, got {X.shape}"
            )
        out = np.empty((len(X), m), dtype=np.int8)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            # argmin of ||x-c||^2 = argmin of -2xC^T + ||c||^2
            d2 = cnorm2[j][None, :] - 2.0 * (sub @ books[j].T)
            # stored code = centroid index - 128 (the int8 bias the
            # scalar quantizer also uses) so ksub can reach 256
            out[:, j] = (np.argmin(d2, axis=1) - 128).astype(np.int8)
        return pd.Series([row.tolist() for row in out])

    out = emb_df.withColumn("pq_codes", _codes(F.col(vec_col)))
    return out if keep_vec else out.drop(vec_col)


def pq_adc_topk(codes_df, codebooks: np.ndarray, query_vec, k: int | None = 10,
                id_col: str = "vec_id"):
    """Top-k by ADC inner product: score(v) = <q, reconstruction(v)> =
    sum_j LUT[j][code_j], LUT[j][c] = <q_j, codebook[j][c]>.

    The LUT is m*ksub doubles computed driver-side per query and baked
    into the plan as array literals; the scan is m ``element_at`` calls
    over the int8 codes summed in one projection — whole-stage codegen
    over 1/128th the bytes of the raw vectors, no Python, no shuffle
    before the final TakeOrdered. ``k=None`` returns every score uncut
    (brute_force_topk convention). On L2-normalized corpora the
    reconstruction inner product ranks like cosine up to quantization
    error; use :func:`pq_search` to rescore candidates exactly."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    q = np.asarray(list(query_vec), dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != codebook dim {m * dsub}")
    lut = np.stack([books[j] @ q[j * dsub:(j + 1) * dsub] for j in range(m)])
    score = None
    for j in range(m):
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in lut[j]]),
            F.col("pq_codes").getItem(j).cast("int") + F.lit(129),
        )
        score = term if score is None else score + term
    d = codes_df.withColumn("score", F.round(score, 6)).select(id_col, "score")
    if k is None:
        return d
    return d.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))


def pq_search(codes_df, emb_df, codebooks: np.ndarray, query_vec,
              k: int = 10, rescore_factor: float = 4.0,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """ADC candidate scan + exact float rescore (the sq_search /
    ES rescore_vector shape): the m-byte ADC scan nominates
    ceil(k * rescore_factor) candidates, only those join back to the
    float table for exact cosine, and the true top-k of the rescored
    set returns with EXACT scores. Recall loss is confined to
    candidates ADC pushed below the rescore window; rescore_factor
    widens it."""
    if k is None or k < 1:
        raise ValueError(f"pq_search needs k >= 1, got {k}")
    if rescore_factor < 1.0:
        raise ValueError(f"rescore_factor must be >= 1.0, got {rescore_factor}")
    import math

    window = int(math.ceil(k * rescore_factor))
    cand = pq_adc_topk(
        codes_df, codebooks, query_vec, k=window, id_col=id_col
    ).select(id_col)
    eligible = emb_df.join(F.broadcast(cand), id_col, "leftsemi")
    return brute_force_topk(
        eligible.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("embedding")),
        list(query_vec), k=k,
    )
