"""scripted_metric: custom map/combine/reduce aggregation (the ES
``scripted_metric`` analog — Python callables over Arrow batches instead
of Painless strings, the Spark-idiomatic script surface).

EXTENSION — the reference's collectors return docs/counts only
(/root/reference/search/collector.go); ES's scripted_metric is the
"metric the agg grammar can't express" escape hatch, and the contract
here mirrors its four script slots exactly (see exec.scripted_metric).
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import scripted_metric, search
from ostrich_spark.schema import Schema

DOCS = [
    (0, "spark joins fast", 10),
    (1, "spark streams", 25),
    (2, "hash join spark", 31),
    (3, "window functions", 7),
    (4, "spark spark spark", 50),
    (5, "grace hash join", 16),
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("n_chars")
    return s


def _build(spark, tmp_path, n_parts, name):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, n_chars long")
    idx = str(tmp_path / name)
    build_index(spark, df, _schema(), idx, num_partitions=n_parts,
                order_col="doc_id", id_cols=["doc_id"])
    return idx


ZERO = {"n": 0, "sum": 0, "sumsq": 0}


def _fns():
    """Map/combine/reduce defined NESTED so cloudpickle ships them by
    value — a module-level function in a test file would serialize by
    reference and executors cannot import the test module (the same
    constraint ES users hit: scripts travel with the request)."""

    def map_fn(pdf):
        v = pdf["n_chars"].dropna()
        return {"n": int(v.count()), "sum": int(v.sum()),
                "sumsq": int((v * v).sum())}

    def combine_fn(a, b):
        return {k: a[k] + b[k] for k in ("n", "sum", "sumsq")}

    def variance_fn(s):
        if s["n"] == 0:
            return {"n": 0, "variance": None}
        mean = s["sum"] / s["n"]
        return {"n": s["n"], "variance": s["sumsq"] / s["n"] - mean * mean}

    return map_fn, combine_fn, variance_fn


def test_variance_vs_direct_compute(spark, tmp_path):
    idx = _build(spark, tmp_path, 2, "v")
    m, c, var = _fns()
    got = scripted_metric(
        spark, idx, "text:spark", ZERO, m, c, var,
        columns=["n_chars"],
    )
    vals = [n for d, t, n in DOCS if "spark" in t]  # docs 0, 1, 2, 4
    mean = sum(vals) / len(vals)
    exp = sum(v * v for v in vals) / len(vals) - mean * mean
    assert got["n"] == 4
    assert got["variance"] == pytest.approx(exp)


def test_partition_invariance(spark, tmp_path):
    """Associative combine => identical result whatever the partition
    boundaries (1 vs 4 segments)."""
    m, c, _ = _fns()
    a = scripted_metric(
        spark, _build(spark, tmp_path, 1, "p1"), "text:join", ZERO,
        m, c, columns=["n_chars"],
    )
    b = scripted_metric(
        spark, _build(spark, tmp_path, 4, "p4"), "text:join", ZERO,
        m, c, columns=["n_chars"],
    )
    # token "join" hits docs 2 and 5 only ("joins" in doc 0 is a
    # different term — the default analyzer does not stem)
    assert a == b == {"n": 2, "sum": 31 + 16, "sumsq": 961 + 256}


def test_empty_match_reduces_zero(spark, tmp_path):
    idx = _build(spark, tmp_path, 2, "e")
    m, c, var = _fns()
    got = scripted_metric(
        spark, idx, "text:absentterm", ZERO, m, c, var,
        columns=["n_chars"],
    )
    assert got == {"n": 0, "variance": None}


def test_include_score_matches_search(spark, tmp_path):
    idx = _build(spark, tmp_path, 2, "s")
    got = scripted_metric(
        spark, idx, "text:spark", 0.0,
        lambda pdf: float(pdf["score"].sum()),
        lambda a, b: a + b,
        include_score=True,
    )
    res, _ = search(spark, idx, "text:spark", limit=None)
    exp = sum(r["score"] for r in res.collect())
    assert got == pytest.approx(exp, rel=1e-12)


def test_validation(spark, tmp_path):
    idx = _build(spark, tmp_path, 1, "val")
    m, c, _ = _fns()
    with pytest.raises(ValueError, match="not in docmap"):
        scripted_metric(spark, idx, "text:spark", ZERO, m, c,
                        columns=["nope"])
    with pytest.raises(TypeError):
        scripted_metric(spark, idx, "text:spark", {0}, m, c,
                        columns=["n_chars"])  # a set is not JSON-able
