"""Scalar quantization (ES dense_vector int8 / Lucene ScalarQuantizer
analog): int8 codes with a global (lo, hi) fit, dequantized cosine scan,
and the ES rescore_vector design — quantized candidates, float rescore,
exact returned scores. Oracles: numpy recomputation + brute force."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ostrich_spark.similarity import (
    brute_force_topk,
    sq_decode_col,
    sq_fit,
    sq_quantize,
    sq_search,
    sq_topk,
)

DIM = 8
N = 200


def _emb_rows():
    rng = np.random.RandomState(42)
    v = rng.normal(size=(N, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return [(i, [float(x) for x in v[i]]) for i in range(N)], v


@pytest.fixture(scope="module")
def emb(spark):
    rows, v = _emb_rows()
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        v,
    )


def test_fit_and_code_bounds(spark, emb):
    df, v = emb
    lo, hi = sq_fit(df)
    assert lo == pytest.approx(v.min()) and hi == pytest.approx(v.max())
    codes, lo2, hi2 = sq_quantize(df)
    assert (lo2, hi2) == (lo, hi)
    # storage dtype is the point: 1-byte codes
    assert dict(codes.dtypes)["codes"] == "array<tinyint>"
    flat = [c for r in codes.select("codes").collect() for c in r["codes"]]
    assert min(flat) >= -128 and max(flat) <= 127


def test_roundtrip_within_half_step(spark, emb):
    df, v = emb
    codes, lo, hi = sq_quantize(df)
    step = (hi - lo) / 255.0
    dec = codes.withColumn(
        "dec", sq_decode_col(F.col("codes"), lo, hi)
    ).orderBy("vec_id").collect()
    got = np.array([r["dec"] for r in dec])
    assert np.abs(got - v).max() <= step / 2 + 1e-12


def test_out_of_range_clamps(spark):
    df = (
        spark.range(1)
        .select(F.lit(0).alias("vec_id"),
                F.array(F.lit(0.0), F.lit(1.0)).alias("embedding"))
    )
    # quantize an increment under a NARROWER original fit: clamps to edges
    codes, _, _ = sq_quantize(df, lo=0.25, hi=0.75)
    [r] = codes.collect()
    assert r["codes"] == [-128, 127]


def test_sq_topk_matches_numpy(spark, emb):
    """Quantized ranking == numpy recomputation of the exact same
    dequantize-then-cosine arithmetic (query quantized too)."""
    df, v = emb
    codes, lo, hi = sq_quantize(df)
    step = (hi - lo) / 255.0
    q = v[0]

    def quant(x):
        return lo + (np.clip(np.round((x - lo) / step), 0, 255)) * step

    vq, qq = quant(v), quant(q)
    sims = np.round(
        (vq @ qq) / (np.linalg.norm(vq, axis=1) * np.linalg.norm(qq)), 6
    )
    order = sorted(range(N), key=lambda i: (-sims[i], i))[:10]
    got = sq_topk(codes, list(q), lo, hi, k=10).collect()
    assert [r["vec_id"] for r in got] == order
    for r in got:
        assert r["sim"] == pytest.approx(sims[r["vec_id"]], abs=1e-9)
    # self-similarity: the query's own vector ranks first at 1.0
    assert got[0]["vec_id"] == 0 and got[0]["sim"] == pytest.approx(1.0)


def test_sq_search_rescored_recall_and_exact_scores(spark, emb):
    """Rescored search: recall@10 >= 0.9 vs exact brute force, and every
    returned score IS the exact float cosine (the rescore contract)."""
    df, v = emb
    codes, lo, hi = sq_quantize(df)
    hits = misses = 0
    for qi in (0, 7, 33, 91, 150):
        q = [float(x) for x in v[qi]]
        exact = brute_force_topk(df, q, k=10).collect()
        exact_ids = [r["vec_id"] for r in exact]
        exact_sims = {r["vec_id"]: r["sim"] for r in exact}
        got = sq_search(codes, df, q, lo, hi, k=10, rescore_factor=4.0).collect()
        got_ids = [r["vec_id"] for r in got]
        hits += len(set(got_ids) & set(exact_ids))
        misses += len(set(exact_ids) - set(got_ids))
        for r in got:  # scores exact wherever ids agree
            if r["vec_id"] in exact_sims:
                assert r["sim"] == exact_sims[r["vec_id"]]
    assert hits / (hits + misses) >= 0.9


def test_sq_validation(spark):
    const = spark.createDataFrame(
        [(0, [0.5, 0.5]), (1, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="degenerate"):
        sq_fit(const)
    ok = spark.createDataFrame(
        [(0, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    codes, lo, hi = sq_quantize(ok)
    with pytest.raises(ValueError, match="k >= 1"):
        sq_search(codes, ok, [0.0, 1.0], lo, hi, k=0)
    with pytest.raises(ValueError, match="rescore_factor"):
        sq_search(codes, ok, [0.0, 1.0], lo, hi, k=1, rescore_factor=0.5)


def test_ivf_quantized_build_and_rescored_search(spark, emb, tmp_path):
    """quantize=True IVF: codes stored beside floats with the (lo, hi)
    fit persisted; rescored search matches the float path's ids/scores
    (recall >= 0.9, exact scores); the candidate scan projects ONLY
    (vec_id, codes) — parquet column pruning proof via ReadSchema."""
    import os

    from ostrich_spark.similarity import (
        _ivf_quant_params,
        _ivf_sq_candidates,
        ivf_build,
        ivf_search,
    )

    df, v = emb
    idx = str(tmp_path / "ivfq")
    ivf_build(spark, df, idx, n_centroids=4, train_iters=2, quantize=True)
    lo, hi = _ivf_quant_params(idx)
    assert hi > lo
    # codes landed in the files as tinyint
    got = spark.read.parquet(os.path.join(idx, "vectors"))
    assert dict(got.dtypes)["codes"] == "array<tinyint>"
    hits = misses = 0
    for qi in (0, 33, 150):
        q = [float(x) for x in v[qi]]
        exact = ivf_search(spark, idx, q, k=10, nprobe=4).collect()
        resc = ivf_search(
            spark, idx, q, k=10, nprobe=4, rescore_factor=4.0
        ).collect()
        e = {r["vec_id"]: r["sim"] for r in exact}
        g = {r["vec_id"]: r["sim"] for r in resc}
        hits += len(set(g) & set(e))
        misses += len(set(e) - set(g))
        for vid, s in g.items():  # rescored scores ARE the exact floats
            if vid in e:
                assert s == e[vid]
    assert hits / (hits + misses) >= 0.9
    # column-pruning proof: the quantized candidate scan never reads the
    # float embedding column
    plan = _ivf_sq_candidates(
        spark, idx, [float(x) for x in v[0]], [0, 1, 2, 3], 40, lo, hi
    )._jdf.queryExecution().executedPlan().toString()
    assert "codes" in plan and "embedding" not in plan


def test_ivf_rescore_on_unquantized_index_errors(spark, emb, tmp_path):
    from ostrich_spark.similarity import ivf_build, ivf_search

    df, v = emb
    idx = str(tmp_path / "ivfplain")
    ivf_build(spark, df, idx, n_centroids=2, train_iters=0)
    with pytest.raises(ValueError, match="quantize=True"):
        ivf_search(spark, idx, [float(x) for x in v[0]], k=5,
                   rescore_factor=2.0).collect()


def test_cli_knn(spark, emb, tmp_path):
    """CLI vector surface: build --quantize, search --rescore, brute."""
    import os
    import subprocess
    import sys

    df, v = emb
    ep = str(tmp_path / "emb.parquet")
    df.write.parquet(ep)
    idx = str(tmp_path / "cli_ivf")

    def run(*a):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "knn", *a],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("build", "-p", idx, "--emb", ep, "--centroids", "4",
              "--train-iters", "2", "--quantize")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "int8-quantized" in out.stdout
    assert os.path.exists(os.path.join(idx, "quant.json"))
    out = run("search", "-p", idx, "--emb", ep, "--vec-id", "0",
              "-k", "3", "--nprobe", "4", "--rescore", "4")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if not l.endswith("s")]
    assert lines[0].startswith("0 1.000000")  # self-similarity first, exact
    out = run("brute", "--emb", ep, "--vec-id", "0", "-k", "3")
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0].startswith("0 1.0")
    # argument errors exit 2 with a message
    out = run("search", "-p", idx)
    assert out.returncode == 2 and "query needs" in out.stderr
    out = run("build", "-p", idx)
    assert out.returncode == 2 and "--emb" in out.stderr
