"""Product quantization + ADC (similarity.pq_fit/pq_encode/
pq_adc_topk/pq_search) — the Jégou et al. 2011 design.

Design under test:
- seeded codebooks (train_iters=0) == sub-vectors of the ksub
  smallest-id rows (the SQL-recomputable gate convention);
- encode == a numpy brute-force argmin per subspace (lowest-index tie);
- ADC scores == <query, reconstruction> recomputed in numpy, ranking
  and tie-break included;
- trained codebooks (train_iters>0) strictly reduce quantization error
  vs seeded on a clusterable fixture, and ADC still matches the numpy
  recompute of the SAME codebooks;
- pq_search returns EXACT cosine scores for its top-k;
- validation paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from ostrich_spark.similarity import (
    brute_force_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_search,
)

DIM, M, KSUB = 16, 4, 4


def _vecs(n=40, dim=DIM, seed=7):
    rng = np.random.default_rng(seed)
    # clusterable: 4 anchor directions + noise, L2-normalized
    anchors = rng.normal(size=(4, dim))
    X = anchors[np.arange(n) % 4] + 0.25 * rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


@pytest.fixture(scope="module")
def pq_df(spark):
    X = _vecs()
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    ).repartition(3), X


def _np_encode(X, books):
    m, ksub, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def _np_adc(X, books, q):
    codes = _np_encode(X, books)
    m, ksub, dsub = books.shape
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(m)], axis=1
    )
    return recon @ np.asarray(q)


def test_seeded_codebooks_are_first_rows(spark, pq_df):
    df, X = pq_df
    books = pq_fit(df, m=M, ksub=KSUB)
    dsub = DIM // M
    for j in range(M):
        want = X[:KSUB, j * dsub:(j + 1) * dsub]
        assert np.allclose(books[j], want), j


def test_encode_matches_numpy(spark, pq_df):
    df, X = pq_df
    books = pq_fit(df, m=M, ksub=KSUB)
    got = {r["vec_id"]: list(r["pq_codes"])
           for r in pq_encode(df, books).collect()}
    want = _np_encode(X, books)
    for i in range(len(X)):
        # stored code = centroid index - 128 (int8 bias -> ksub <= 256)
        assert got[i] == (want[i] - 128).tolist(), i


def test_adc_topk_matches_numpy(spark, pq_df):
    df, X = pq_df
    books = pq_fit(df, m=M, ksub=KSUB)
    codes = pq_encode(df, books)
    q = X[0]
    got = [(r["vec_id"], r["score"])
           for r in pq_adc_topk(codes, books, q, k=10).collect()]
    scores = np.round(_np_adc(X, books, q), 6)
    order = sorted(range(len(X)), key=lambda i: (-scores[i], i))[:10]
    assert [i for i, _ in got] == order
    for (i, s) in got:
        assert abs(s - scores[i]) < 1e-9, i
    # k=None returns every score uncut
    assert pq_adc_topk(codes, books, q, k=None).count() == len(X)


def test_trained_codebooks_reduce_error_and_still_match(spark, pq_df):
    df, X = pq_df
    seeded = pq_fit(df, m=M, ksub=KSUB)
    trained = pq_fit(df, m=M, ksub=KSUB, train_iters=8)

    def mse(books):
        codes = _np_encode(X, books)
        m, _, dsub = books.shape
        recon = np.concatenate(
            [books[j][codes[:, j]] for j in range(m)], axis=1
        )
        return float(((X - recon) ** 2).sum())

    assert mse(trained) < mse(seeded)
    # the distributed ADC over trained books == numpy over trained books
    codes = pq_encode(df, trained)
    q = X[1]
    got = [(r["vec_id"], r["score"])
           for r in pq_adc_topk(codes, trained, q, k=5).collect()]
    scores = np.round(_np_adc(X, trained, q), 6)
    order = sorted(range(len(X)), key=lambda i: (-scores[i], i))[:5]
    assert [i for i, _ in got] == order


def test_pq_search_exact_rescore(spark, pq_df):
    df, X = pq_df
    books = pq_fit(df, m=M, ksub=KSUB, train_iters=8)
    codes = pq_encode(df, books)
    q = list(X[2])
    got = pq_search(codes, df, books, q, k=5, rescore_factor=8.0).collect()
    # scores are EXACT cosine (the rescore contract), not ADC estimates
    exact = {r["vec_id"]: r["sim"]
             for r in brute_force_topk(df, q, k=None).collect()}
    for r in got:
        assert abs(r["sim"] - exact[r["vec_id"]]) < 1e-12
    # with a window covering the corpus, top-k == exact top-k
    want = [r["vec_id"]
            for r in brute_force_topk(df, q, k=5).collect()]
    assert [r["vec_id"] for r in got] == want


def test_validation(spark, pq_df):
    df, X = pq_df
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(df, m=3, ksub=4)
    with pytest.raises(ValueError, match="tinyint"):
        pq_fit(df, m=4, ksub=300)
    with pytest.raises(ValueError, match="need >="):
        pq_fit(df.limit(2), m=4, ksub=4)
    books = pq_fit(df, m=M, ksub=KSUB)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(pq_encode(df, books), books, [0.0] * 7, k=3)
    with pytest.raises(ValueError, match="rescore_factor"):
        pq_search(pq_encode(df, books), df, books, list(X[0]),
                  k=3, rescore_factor=0.5)


def test_ivf_pq_build_and_search(spark, pq_df, tmp_path):
    """IVF-PQ compose (faiss layout): pq_codes stored beside floats with
    codebooks persisted; use_pq search rescores to EXACT scores; the
    ADC candidate scan reads ONLY (vec_id, pq_codes) — column pruning
    proof via ReadSchema; validation on a PQ-less index."""
    import os

    from ostrich_spark.similarity import (
        _ivf_pq_books,
        ivf_build,
        ivf_search,
        pq_adc_topk,
    )

    df, X = pq_df
    idx = str(tmp_path / "ivfpq")
    ivf_build(spark, df, idx, n_centroids=4, train_iters=2,
              pq_m=M, pq_ksub=8)
    books = _ivf_pq_books(idx)
    assert books.shape == (M, 8, DIM // M)
    stored = spark.read.parquet(os.path.join(idx, "vectors"))
    assert dict(stored.dtypes)["pq_codes"] == "array<tinyint>"

    q = [float(x) for x in X[5]]
    exact = {r["vec_id"]: r["sim"]
             for r in ivf_search(spark, idx, q, k=10, nprobe=4).collect()}
    got = ivf_search(spark, idx, q, k=10, nprobe=4,
                     rescore_factor=16.0, use_pq=True).collect()
    assert len(got) == 10
    for r in got:  # rescored scores ARE the exact floats
        assert r["sim"] == exact[r["vec_id"]], r["vec_id"]
    # window covering the corpus -> identical top-10
    assert [r["vec_id"] for r in got] == list(exact)[:10]

    # column pruning: the ADC candidate scan never reads the floats
    codes = (
        spark.read.parquet(os.path.join(idx, "vectors"))
        .select("vec_id", "pq_codes")
    )
    plan = pq_adc_topk(codes, books, q, k=10)._jdf.queryExecution() \
        .executedPlan().toString()
    rs = plan.split("ReadSchema")[1].split("\n")[0]
    assert "pq_codes" in rs and "embedding" not in rs

    # a PQ-less index refuses use_pq with a pointed error
    idx2 = str(tmp_path / "ivfplain")
    ivf_build(spark, df, idx2, n_centroids=4, train_iters=2)
    with pytest.raises(ValueError, match="pq_m"):
        ivf_search(spark, idx2, q, k=5, nprobe=2,
                   rescore_factor=4.0, use_pq=True).collect()
    with pytest.raises(ValueError, match="needs rescore_factor"):
        ivf_search(spark, idx, q, k=5, nprobe=2, use_pq=True).collect()


def test_cli_knn_pq(spark, pq_df, tmp_path):
    """CLI IVF-PQ surface: build --pq-m stores codes+books, search
    --use-pq --rescore returns exact floats, and --use-pq without PQ
    (or without --rescore) exits 2 with the pointed error."""
    import os
    import subprocess
    import sys

    df, X = pq_df
    ep = str(tmp_path / "emb.parquet")
    df.write.parquet(ep)
    idx = str(tmp_path / "cli_ivfpq")

    def run(*a):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "knn", *a],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("build", "-p", idx, "--emb", ep, "--centroids", "4",
              "--train-iters", "2", "--pq-m", "4", "--pq-ksub", "8")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PQ m=4/ksub=8" in out.stdout
    assert os.path.exists(os.path.join(idx, "pq_books.parquet"))

    out = run("search", "-p", idx, "--emb", ep, "--vec-id", "0",
              "-k", "3", "--nprobe", "4", "--rescore", "16", "--use-pq")
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if not l.endswith("s")]
    assert hits[0].startswith("0 1.000000")  # exact rescored self-match

    out = run("search", "-p", idx, "--emb", ep, "--vec-id", "0",
              "-k", "3", "--use-pq")
    assert out.returncode == 2 and "needs rescore_factor" in out.stderr

    idx2 = str(tmp_path / "cli_plain")
    out = run("build", "-p", idx2, "--emb", ep, "--centroids", "2",
              "--train-iters", "0")
    assert out.returncode == 0, out.stderr[-2000:]
    out = run("search", "-p", idx2, "--emb", ep, "--vec-id", "0",
              "-k", "3", "--rescore", "4", "--use-pq")
    assert out.returncode == 2 and "pq_m" in out.stderr


def test_ivf_append_batches(spark, pq_df, tmp_path):
    """ivf_append: a second batch lands in the existing partition dirs
    under the PERSISTED centroids/quantizer/codebooks — full-probe
    search over the appended index equals brute force over the union,
    SQ-rescored and PQ-ADC search modes keep working with exact
    rescored floats, and appending to a non-index errors."""
    import os

    from ostrich_spark.similarity import (
        brute_force_topk,
        ivf_append,
        ivf_build,
        ivf_search,
    )

    df, X = pq_df
    first = df.filter("vec_id < 20")
    second = df.filter("vec_id >= 20")
    idx = str(tmp_path / "ivf_app")
    ivf_build(spark, first, idx, n_centroids=4, train_iters=2,
              quantize=True, pq_m=M, pq_ksub=8)
    ivf_append(spark, second, idx)

    stored = spark.read.parquet(os.path.join(idx, "vectors"))
    assert stored.count() == len(X)
    # appended rows carry BOTH code columns, like the original build's
    assert dict(stored.dtypes)["codes"] == "array<tinyint>"
    assert dict(stored.dtypes)["pq_codes"] == "array<tinyint>"

    q = [float(x) for x in X[25]]  # a query from the appended batch
    want = [(r["vec_id"], r["sim"])
            for r in brute_force_topk(df, q, k=10).collect()]
    got = [(r["vec_id"], r["sim"])
           for r in ivf_search(spark, idx, q, k=10, nprobe=4).collect()]
    assert got == want

    exact = dict(want)
    for kw in ({"rescore_factor": 16.0},
               {"rescore_factor": 16.0, "use_pq": True}):
        rows = ivf_search(spark, idx, q, k=5, nprobe=4, **kw).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["sim"] == exact[r["vec_id"]], (kw, r["vec_id"])

    with pytest.raises(ValueError, match="centroids.parquet"):
        ivf_append(spark, second, str(tmp_path / "nope"))
