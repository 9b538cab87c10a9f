"""matrix_stats / string_stats / boxplot / multi_terms aggregations —
ES analogs over doc values (EXTENSION; the reference's collectors
return docs/counts only). Every number here is hand-checked against
numpy/pure Python on the same value sets — not just oracle symmetry."""

import math

import numpy as np
import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import (
    boxplot,
    matrix_stats,
    multi_terms,
    string_stats,
)
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark", "query", "score"]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    s.add_numeric_field("x", "double")
    s.add_numeric_field("y", "double")
    s.add_keyword_field("tag")
    s.add_keyword_field("grp")
    return s


DOCS = [
    {
        "k": i,
        "content": "spark " + WORDS[i % len(WORDS)],
        # x correlates positively with i, y = 100 - 2x + wiggle
        "x": float(i) if i % 11 else None,  # some NULLs
        "y": 100.0 - 2.0 * i + (i % 5),
        "tag": ["alpha", "beta", "gamma"][i % 3],
        "grp": ["g1", "g2"][i % 2],
    }
    for i in range(40)
]


@pytest.fixture(scope="module")
def stats_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("mstats") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        _schema(),
        idx,
        num_partitions=3,
        order_col="k",
        id_cols=["k"],
    )
    return idx


def _listwise():
    rows = [d for d in DOCS if d["x"] is not None and d["y"] is not None]
    return np.array([d["x"] for d in rows]), np.array([d["y"] for d in rows])


def test_matrix_stats_hand_math(spark, stats_index):
    x, y = _listwise()
    out = {
        (r["field_x"], r["field_y"]): r
        for r in matrix_stats(spark, stats_index, "content:spark", ["x", "y"]).collect()
    }
    assert set(out) == {("x", "x"), ("y", "y"), ("x", "y")}
    n = len(x)
    dx = out[("x", "x")]
    assert dx["n"] == n
    assert dx["mean"] == pytest.approx(x.mean(), rel=1e-12)
    vx = ((x - x.mean()) ** 2).mean()  # population
    assert dx["variance"] == pytest.approx(vx, rel=1e-9)
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert dx["skewness"] == pytest.approx(m3 / vx**1.5, rel=1e-9, abs=1e-12)
    assert dx["kurtosis"] == pytest.approx(m4 / vx**2 - 3.0, rel=1e-9)
    assert dx["covariance"] == pytest.approx(vx, rel=1e-9)
    assert dx["correlation"] == pytest.approx(1.0)
    p = out[("x", "y")]
    cv = ((x - x.mean()) * (y - y.mean())).mean()
    assert p["covariance"] == pytest.approx(cv, rel=1e-9)
    vy = ((y - y.mean()) ** 2).mean()
    assert p["correlation"] == pytest.approx(cv / math.sqrt(vx * vy), rel=1e-9)
    # y is ~anti-linear in x -> strong negative correlation
    assert p["correlation"] < -0.99
    assert p["mean"] is None and p["skewness"] is None


def test_matrix_stats_listwise_deletion(spark, stats_index):
    """Docs with a NULL in ANY field are excluded from EVERY cell —
    each pair sees the same doc set (PSD covariance matrix)."""
    x, _ = _listwise()
    rows = matrix_stats(spark, stats_index, "content:spark", ["x", "y"]).collect()
    assert {r["n"] for r in rows} == {len(x)}
    assert len(x) < len(DOCS)  # the NULLs actually dropped something


def test_matrix_stats_validation(spark, stats_index):
    with pytest.raises(ValueError, match=">= 2"):
        matrix_stats(spark, stats_index, "content:spark", ["x"])
    with pytest.raises(ValueError, match="duplicate"):
        matrix_stats(spark, stats_index, "content:spark", ["x", "x"])
    with pytest.raises(ValueError, match="numeric"):
        matrix_stats(spark, stats_index, "content:spark", ["x", "tag"])


def test_boxplot_hand_math(spark, stats_index):
    _, y = _listwise()
    # boxplot is over the full match set (no listwise: single field) —
    # y of ALL docs matching content:spark
    yy = np.array([d["y"] for d in DOCS])
    row = boxplot(spark, stats_index, "content:spark", "y").collect()[0]
    q1, q2, q3 = np.percentile(yy, [25, 50, 75])  # linear interpolation
    assert row["q1"] == pytest.approx(q1, rel=1e-12)
    assert row["q2"] == pytest.approx(q2, rel=1e-12)
    assert row["q3"] == pytest.approx(q3, rel=1e-12)
    assert row["min"] == yy.min() and row["max"] == yy.max()
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    assert row["lower"] == yy[yy >= lo].min()
    assert row["upper"] == yy[yy <= hi].max()
    assert row["n"] == len(yy)


def test_boxplot_whiskers_clip_outliers(spark, tmp_path, stats_index):
    """With extreme outliers the whiskers stop at the innermost value
    inside the Tukey fences — the ES lower/upper contract."""
    s = Schema()
    s.add_text_field("content", "default")
    s.add_numeric_field("v", "double")
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0, -1000.0]
    idx = str(tmp_path / "box")
    build_index(
        spark,
        spark.createDataFrame(
            pd.DataFrame(
                [{"k": i, "content": "spark", "v": v} for i, v in enumerate(vals)]
            )
        ),
        s,
        idx,
        num_partitions=2,
        order_col="k",
        id_cols=["k"],
    )
    row = boxplot(spark, idx, "content:spark", "v").collect()[0]
    a = np.array(vals)
    q1, q3 = np.percentile(a, [25, 75])
    iqr = q3 - q1
    assert row["lower"] == a[a >= q1 - 1.5 * iqr].min() != a.min()
    assert row["upper"] == a[a <= q3 + 1.5 * iqr].max() != a.max()
    with pytest.raises(ValueError, match="whisker"):
        boxplot(spark, idx, "content:spark", "v", whisker=-1)


def test_string_stats_hand_math(spark, stats_index):
    tags = [d["tag"] for d in DOCS]
    row = string_stats(spark, stats_index, "content:spark", "tag").collect()[0]
    assert row["count"] == len(tags)
    lens = [len(t) for t in tags]
    assert row["min_length"] == min(lens)
    assert row["max_length"] == max(lens)
    assert row["avg_length"] == pytest.approx(sum(lens) / len(lens), rel=1e-12)
    # Shannon entropy over the character distribution of ALL values
    from collections import Counter

    cnt = Counter("".join(tags))
    t = sum(cnt.values())
    ent = -sum((k / t) * math.log2(k / t) for k in cnt.values())
    assert row["entropy"] == pytest.approx(ent, rel=1e-9)
    with pytest.raises(ValueError, match="keyword"):
        string_stats(spark, stats_index, "content:spark", "x")


def test_string_stats_empty_match(spark, stats_index):
    row = string_stats(
        spark, stats_index, "content:zzzunseenterm", "tag"
    ).collect()[0]
    assert row["count"] == 0
    assert row["min_length"] is None and row["avg_length"] is None
    assert row["entropy"] == 0.0


def test_multi_terms_buckets_and_order(spark, stats_index):
    out = multi_terms(
        spark, stats_index, "content:spark", ["tag", "grp"],
        metrics={"avg_y": ("avg", "y")},
    ).collect()
    from collections import Counter

    want = Counter((d["tag"], d["grp"]) for d in DOCS)
    got = {(r["tag"], r["grp"]): r["n_docs"] for r in out}
    assert got == dict(want)
    # ES order: count desc, key asc tie-break
    keys = [(r["n_docs"], r["tag"], r["grp"]) for r in out]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))
    # metric grammar rides along
    for r in out:
        vals = [d["y"] for d in DOCS if (d["tag"], d["grp"]) == (r["tag"], r["grp"])]
        assert r["avg_y"] == pytest.approx(sum(vals) / len(vals), rel=1e-12)
    # size cut keeps the top rows of the same ordering
    top2 = multi_terms(
        spark, stats_index, "content:spark", ["tag", "grp"], size=2
    ).collect()
    assert [(r["tag"], r["grp"]) for r in top2] == [
        (r["tag"], r["grp"]) for r in out[:2]
    ]
    with pytest.raises(ValueError, match="facet_stats"):
        multi_terms(spark, stats_index, "content:spark", ["tag"])


def test_mad_hand_math(spark, stats_index):
    from ostrich_spark.query.exec import median_absolute_deviation

    xs = np.array([d["x"] for d in DOCS if d["x"] is not None])
    row = median_absolute_deviation(
        spark, stats_index, "content:spark", "x"
    ).collect()[0]
    med = float(np.median(xs))  # numpy median == quantile_cont(0.5)
    assert row["n"] == len(xs)
    assert row["median"] == pytest.approx(med, rel=1e-12)
    assert row["mad"] == pytest.approx(
        float(np.median(np.abs(xs - med))), rel=1e-12
    )


def test_mad_query_subset_and_empty(spark, stats_index):
    from ostrich_spark.query.exec import median_absolute_deviation

    # content:merge matches i % 7 == 0; x NULL at i % 11 == 0 drops i=0
    xs = np.array([
        d["x"] for d in DOCS if d["x"] is not None and "merge" in d["content"]
    ])
    assert len(xs) == 5  # the subset is real and asymmetric
    row = median_absolute_deviation(
        spark, stats_index, "content:merge", "x"
    ).collect()[0]
    med = float(np.median(xs))
    assert row["n"] == len(xs)
    assert row["median"] == pytest.approx(med, rel=1e-12)
    assert row["mad"] == pytest.approx(
        float(np.median(np.abs(xs - med))), rel=1e-12
    )
    empty = median_absolute_deviation(
        spark, stats_index, "content:zzznomatch", "x"
    ).collect()[0]
    assert empty["n"] == 0
    assert empty["median"] is None and empty["mad"] is None


def test_mad_validation(spark, stats_index):
    from ostrich_spark.query.exec import median_absolute_deviation

    with pytest.raises(ValueError, match="numeric doc-value"):
        median_absolute_deviation(spark, stats_index, "content:spark", "content")


def test_range_agg_metrics_project_all_referenced_columns(spark, stats_index):
    """Regression: weighted_avg's weight column and max_by's sort column
    must ride through the range tagging projection (they are spec[2],
    not spec[1] — the original projection only carried value columns)."""
    from ostrich_spark.query.exec import range_agg

    out = range_agg(
        spark, stats_index, "content:spark", "x",
        ranges=[("lo", None, 20.0), ("hi", 20.0, None)],
        metrics={
            "wavg_y": ("weighted_avg", "y", "x"),
            "y_at_max_k": ("max_by", "y", "k"),
        },
    ).collect()
    by = {r["range_key"]: r for r in out}
    for key, pred in (("lo", lambda v: v < 20.0), ("hi", lambda v: v >= 20.0)):
        rows = [d for d in DOCS if d["x"] is not None and pred(d["x"])]
        assert by[key]["n_docs"] == len(rows)
        want = sum(d["y"] * d["x"] for d in rows) / sum(d["x"] for d in rows)
        assert by[key]["wavg_y"] == pytest.approx(want, rel=1e-12)
        assert by[key]["y_at_max_k"] == pytest.approx(
            max(rows, key=lambda d: d["k"])["y"], rel=1e-12
        )
