"""Persisted IVF index (train + build + partition-pruned search) and
random-hyperplane LSH near-dup.

Identity invariants (no recall flakiness):
- nprobe = C  => ivf_search == brute_force_topk exactly (probing every
  cluster degenerates to the exact scan, whatever the centroids are);
- nprobe = 1  => results equal brute force restricted to the probed
  cluster's members;
- the cluster_id filter shows up as a PartitionFilter in the scan plan
  (the 1/C-scan claim, checked, not asserted in a docstring);
- identical vectors collide in every LSH band, so exact duplicates are
  ALWAYS found by neardup_pairs_lsh.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ostrich_spark.similarity import (
    brute_force_topk,
    cosine_col,
    ivf_assign,
    ivf_build,
    ivf_search,
    ivf_train,
    neardup_pairs_lsh,
    plane_component,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    return [float(x) for x in row["embedding"]]


def _pairs(df):
    return [(r["vec_id"], r["sim"]) for r in df.collect()]


def test_ivf_persisted_full_probe_equals_brute_force(spark, emb, qvec, tmp_path):
    idx = str(tmp_path / "ivf0")
    ivf_build(spark, emb, idx, n_centroids=4, train_iters=0)
    got = _pairs(ivf_search(spark, idx, qvec, k=10, nprobe=4))
    want = _pairs(brute_force_topk(emb, qvec, k=10))
    assert got == want


def test_ivf_persisted_single_probe_matches_cluster_restricted_scan(
    spark, emb, qvec, tmp_path
):
    idx = str(tmp_path / "ivf1")
    ivf_build(spark, emb, idx, n_centroids=4, train_iters=0)
    res = ivf_search(spark, idx, qvec, k=10, nprobe=1)
    got = _pairs(res)

    # reference: assignment recomputed from scratch, restricted to the
    # query's nearest first-C centroid
    assign = ivf_assign(emb, n_centroids=4)
    cents = emb.filter(F.col("vec_id") < 4)
    q = F.array(*[F.lit(float(x)) for x in qvec])
    target = (
        cents.withColumn("sim", cosine_col(F.col("embedding"), q))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(1)
        .collect()[0]["vec_id"]
    )
    members = assign.filter(F.col("cluster_id") == target).select("vec_id")
    want = _pairs(
        emb.join(members, "vec_id")
        .withColumn("sim", F.round(cosine_col(F.col("embedding"), q), 6))
        .select("vec_id", "sim")
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )
    assert got == want


def test_ivf_partition_pruning_in_plan(spark, emb, qvec, tmp_path):
    """The cluster_id filter must prune at the SOURCE: a PartitionFilters
    entry naming cluster_id, not a post-scan Filter over all partitions."""
    idx = str(tmp_path / "ivf2")
    ivf_build(spark, emb, idx, n_centroids=4, train_iters=0)
    res = ivf_search(spark, idx, qvec, k=10, nprobe=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cluster_id" in pf


def test_ivf_kmeans_training_and_search(spark, emb, qvec, tmp_path):
    """Sampled k-means path: centroids persisted, full probe still exact,
    single-probe recall no worse than random centroids would allow
    (sanity: the probed cluster contains the query vector itself)."""
    idx = str(tmp_path / "ivf3")
    ivf_build(spark, emb, idx, n_centroids=4, train_iters=3)
    cents = spark.read.parquet(f"{idx}/centroids.parquet")
    assert cents.count() == 4
    # centroids are unit-norm (spherical k-means)
    norms = [
        np.linalg.norm(np.array(r["cvec"], dtype=np.float64))
        for r in cents.collect()
    ]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)

    got = _pairs(ivf_search(spark, idx, qvec, k=10, nprobe=4))
    want = _pairs(brute_force_topk(emb, qvec, k=10))
    assert got == want

    # the query's own vector lands in the probed cluster: sim(q, q) = 1
    one = _pairs(ivf_search(spark, idx, qvec, k=10, nprobe=1))
    assert one and one[0][0] == 0 and one[0][1] == pytest.approx(1.0)


def test_ivf_train_deterministic(spark, emb):
    a = ivf_train(emb, n_centroids=4, n_iter=3)
    b = ivf_train(emb, n_centroids=4, n_iter=3)
    assert np.array_equal(a, b)


def test_plane_component_range_and_determinism():
    vals = [plane_component(p, i, 64) for p in range(16) for i in range(64)]
    assert all(-1.0 <= v <= 1.0 for v in vals)
    assert len(set(vals)) > 100  # not degenerate
    assert plane_component(3, 7, 64) == plane_component(3, 7, 64)


def test_lsh_finds_exact_duplicates(spark):
    """Identical vectors have identical sign bits in every plane ->
    guaranteed collision in every band -> the pair MUST be emitted."""
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(vecs):
        rows.append((i, [float(x) for x in v]))
    # duplicates: 100=copy of 0, 101=copy of 7
    rows.append((100, [float(x) for x in vecs[0]]))
    rows.append((101, [float(x) for x in vecs[7]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in neardup_pairs_lsh(df, threshold=0.99, n_planes=16, bands=4).collect()
    }
    assert got[(0, 100)] == pytest.approx(1.0)
    assert got[(7, 101)] == pytest.approx(1.0)
    # precision: everything emitted really is >= threshold
    assert all(s >= 0.99 for s in got.values())


def test_lsh_subset_of_exact_pairs(spark, emb):
    """LSH candidates are a subset of the exact all-pairs result at the
    same threshold (precision 1 after the verify step)."""
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in neardup_pairs_lsh(emb, threshold=0.3).collect()
    }
    a, b = emb.alias("a"), emb.alias("b")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("sim", F.round(cosine_col(F.col("a.embedding"), F.col("b.embedding")), 6))
        .filter(F.col("sim") >= 0.3)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .collect()
    }
    assert lsh <= exact


# --- recall + training-sample hygiene (r2 verdict item #5) -----------------


def test_ivf_recall_at_nprobe4(spark, tmp_path):
    """End-to-end recall gate: trained (not first-C) centroids on a 20k
    clustered corpus must hit recall@10 >= 0.9 at nprobe=4 (the 100k
    version of this run is recorded in BENCH/IVF_RECALL.md)."""
    from tools.ivf_recall import recall_rows

    rows, _, files_per_cluster = recall_rows(
        spark,
        n=20_000,
        dim=16,
        n_clusters=20,
        n_centroids=32,
        nprobes=(4,),
        n_queries=8,
        k=10,
        sample_size=8_000,
        train_iters=3,
        index_path=str(tmp_path / "ivf20k"),
    )
    assert rows[0]["recall_at_k"] >= 0.9, rows
    # every centroid partition was written (no empty/missing dirs)
    assert len(files_per_cluster) >= 16


def test_ivf_train_sample_is_uniform_not_prefix(spark):
    """The k-means training sample must be a uniform deterministic draw
    over the whole id space, not a vec_id prefix (r2: ids correlated
    with ingestion order/domain train biased centroids). Pin the
    property: the top-100 sample ids by the training hash span the id
    range instead of clustering at the low end."""
    from ostrich_spark.sampling import _unit_hash

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    u = _unit_hash(F.col("vec_id"), "ivf_train")
    ids = [
        r["vec_id"]
        for r in df.orderBy(u.asc(), F.col("vec_id").asc()).limit(100).collect()
    ]
    assert max(ids) > n * 0.9  # reaches the top of the id space
    assert sum(1 for i in ids if i < 1000) < 30  # not front-loaded
    # deterministic across invocations
    ids2 = [
        r["vec_id"]
        for r in df.orderBy(u.asc(), F.col("vec_id").asc()).limit(100).collect()
    ]
    assert ids == ids2


def test_assign_fast_matches_jvm_assign(spark, emb):
    """The Arrow/numpy assignment (trained-build scale path) must agree
    with the JVM expression path on real data: same nearest centroid,
    same rounded sim (both round to 6; ties -> lowest cid)."""
    from ostrich_spark.similarity import _assign_to, _assign_to_fast, _first_c_centroids

    cent_df = _first_c_centroids(emb, 4)
    cents = np.asarray(
        [list(r["cvec"]) for r in cent_df.orderBy("cid").collect()], dtype=np.float64
    )
    jvm = {
        r["vec_id"]: (r["cluster_id"], r["sim"])
        for r in _assign_to(emb, cent_df).collect()
    }
    fast = {
        r["vec_id"]: (r["cluster_id"], r["sim"])
        for r in _assign_to_fast(emb, cents).collect()
    }
    assert set(jvm) == set(fast)
    for vid, (cid, sim) in jvm.items():
        fcid, fsim = fast[vid]
        assert fcid == cid, f"vec {vid}: {fcid} != {cid}"
        assert abs(fsim - sim) < 2e-6, f"vec {vid}: {fsim} vs {sim}"
