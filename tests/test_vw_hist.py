"""variable_width_histogram — ES variable_width_histogram analog, but
DETERMINISTIC: optimal weighted 1-D k-means (exact DP) over a bounded
value summary, exact per-bucket stats over the raw match set.

The DP is pinned against brute-force enumeration of ALL contiguous
partitions (the definition of optimal); the Spark plumbing against
hand-separated clusters, the micro-bin fallback, and pandas recomputes."""

import itertools

import numpy as np
import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import _wkmeans_edges, variable_width_histogram
from ostrich_spark.schema import Schema


def _sse(x, w):
    ww = w.sum()
    mu = (x * w).sum() / ww
    return float((w * (x - mu) ** 2).sum())


def _brute_best(x, w, k):
    """Minimum total weighted SSE over all partitions of the sorted
    points into k contiguous non-empty groups, and its end-index tuple."""
    n = len(x)
    best, arg = np.inf, None
    for cuts in itertools.combinations(range(n - 1), k - 1):
        ends = list(cuts) + [n - 1]
        lo, tot = 0, 0.0
        for e in ends:
            tot += _sse(x[lo:e + 1], w[lo:e + 1])
            lo = e + 1
        if tot < best - 1e-12:
            best, arg = tot, tuple(ends)
    return best, arg


@pytest.mark.parametrize("seed,k", [(0, 2), (1, 3), (2, 4), (3, 3)])
def test_dp_is_optimal_vs_brute_force(seed, k):
    rng = np.random.default_rng(seed)
    n = 11
    x = np.sort(rng.uniform(0, 100, n))
    w = rng.integers(1, 6, n).astype(float)
    ends = _wkmeans_edges(x, w, k)
    got = 0.0
    lo = 0
    for e in ends:
        got += _sse(x[lo:e + 1], w[lo:e + 1])
        lo = e + 1
    best, arg = _brute_best(x, w, k)
    assert got == pytest.approx(best, rel=1e-9)
    assert tuple(ends) == arg  # unique optimum for these draws


def test_dp_edges_and_degenerate():
    x = np.array([0.0, 1.0, 50.0, 51.0, 100.0])
    w = np.ones(5)
    assert _wkmeans_edges(x, w, 3) == [1, 3, 4]
    # k >= n: every point its own cluster
    assert _wkmeans_edges(x, w, 9) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        _wkmeans_edges(x, w, 0)


DOCS = (
    [{"doc_id": i, "text": "spark", "v": float(np.cos(i))} for i in range(10)]
    + [{"doc_id": 10 + i, "text": "spark", "v": 100.0 + i} for i in range(5)]
    + [{"doc_id": 15 + i, "text": "spark", "v": 1000.0 + 2 * i} for i in range(5)]
    + [{"doc_id": 20, "text": "other", "v": 5555.0}]  # not in the match set
    + [{"doc_id": 21, "text": "spark", "v": None}]  # null drops
)


@pytest.fixture(scope="module")
def vwx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("vwhist") / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("v", "double")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def test_separated_clusters_exact_path(spark, vwx):
    out = variable_width_histogram(spark, vwx, "text:spark", "v", 3).collect()
    assert [r["bucket"] for r in out] == [0, 1, 2]
    vals = np.array([d["v"] for d in DOCS if d["text"] == "spark"
                     and d["v"] is not None])
    g0 = vals[vals < 50]
    assert out[0]["n_docs"] == 10 and out[1]["n_docs"] == 5
    assert out[0]["v_min"] == pytest.approx(g0.min())
    assert out[0]["v_max"] == pytest.approx(g0.max())
    assert out[0]["key"] == pytest.approx(g0.mean())
    assert out[1]["v_min"] == 100.0 and out[1]["v_max"] == 104.0
    assert out[2]["key"] == pytest.approx(1004.0)
    # excluded doc and null never bucket
    assert sum(r["n_docs"] for r in out) == 20


def test_micro_bin_path_recovers_separation(spark, vwx):
    """max_points below the distinct count forces the micro-bin summary;
    the well-separated clusters still recover and the stats stay EXACT
    (recomputed over raw rows, not micro-bin means)."""
    out = variable_width_histogram(
        spark, vwx, "text:spark", "v", 3, max_points=12
    ).collect()
    assert [r["n_docs"] for r in out] == [10, 5, 5]
    assert out[1]["v_min"] == 100.0 and out[1]["v_max"] == 104.0
    assert out[1]["key"] == pytest.approx(102.0)
    assert out[2]["v_min"] == 1000.0 and out[2]["v_max"] == 1008.0


def test_fewer_values_than_buckets_and_empty(spark, vwx):
    out = variable_width_histogram(
        spark, vwx, 'text:spark AND text:other', "v", 4
    )
    assert out.count() == 0
    one_per = variable_width_histogram(spark, vwx, "text:other", "v", 4).collect()
    assert len(one_per) == 1 and one_per[0]["n_docs"] == 1
    assert one_per[0]["v_min"] == one_per[0]["v_max"] == 5555.0


def test_cli_vw_hist(vwx):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "agg", "text:spark",
         "-p", vwx, "--vw-hist", "v", "--buckets", "3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert lines[1] == "1 [100.0, 104.0] key 102.0 n 5"
    assert lines[2].startswith("2 [1000.0, 1008.0] key 1004.0 n 5")


def test_validation(spark, vwx):
    with pytest.raises(ValueError, match="buckets"):
        variable_width_histogram(spark, vwx, "text:spark", "v", 0)
    with pytest.raises(ValueError, match="max_points"):
        variable_width_histogram(spark, vwx, "text:spark", "v", 5, max_points=3)
    with pytest.raises(ValueError, match="numeric"):
        variable_width_histogram(spark, vwx, "text:spark", "text", 3)
