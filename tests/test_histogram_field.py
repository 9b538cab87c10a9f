"""Histogram doc-value fields — ES `histogram` type analog
(schema.add_histogram_field, exec.histogram_field_stats /
histogram_field_percentiles).

Design under test:
- "v:c;v:c" build input → paired array columns; strictly-ascending /
  pair-shape / negative-count validation;
- weighted stats == brute force (zero-count bins hold no observation
  for min/max but contribute nothing to sums), NULL docs excluded,
  query context narrows;
- exact type-1 weighted quantiles == a python recount at p=0/0.5/0.9/1;
- exists, NQL rejection, sort/facet rejection, merge carry.
"""

import math

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import (
    histogram_field_percentiles,
    histogram_field_stats,
    search,
)
from ostrich_spark.query.parser import QueryParseError, parse_query
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark"]


def _mk_docs(n=30):
    docs = []
    for i in range(n):
        if i % 9 == 0:
            h = None
        else:
            # three ascending bins; middle bin count 0 every 4th doc
            h = (
                f"{i % 5}:{1 + i % 3};"
                f"{i % 5 + 2.5}:{0 if i % 4 == 0 else 2};"
                f"{i % 5 + 7}:{1 + i % 2}"
            )
        docs.append({
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 3)),
            "lat_hist": h,
        })
    return docs


def _pairs(matching_ks):
    out = []
    for d in _mk_docs():
        if d["k"] not in matching_ks or d["lat_hist"] is None:
            continue
        for pair in d["lat_hist"].split(";"):
            v, c = pair.split(":")
            out.append((float(v), int(c)))
    return out


def _matched_ks(spark, idx, q):
    from ostrich_spark.query.exec import attach_docmap

    res, _ = search(spark, idx, q, limit=None)
    return {r["k"] for r in attach_docmap(spark, idx, res).collect()}


@pytest.fixture(scope="module")
def hf_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("content", "default")
    s.add_histogram_field("lat_hist")
    idx = str(tmp_path_factory.mktemp("hf") / "idx")
    build_index(
        spark,
        spark.createDataFrame(
            _mk_docs(), "k long, content string, lat_hist string"
        ),
        s, idx, num_partitions=3, order_col="k", id_cols=["k"],
    )
    return idx


def test_stats_vs_brute(spark, hf_idx):
    q = "content:merge"
    ks = _matched_ks(spark, hf_idx, q)
    pairs = _pairs(ks)
    n = sum(c for _, c in pairs)
    s = sum(v * c for v, c in pairs)
    nz = [v for v, c in pairs if c > 0]
    row = histogram_field_stats(spark, hf_idx, q, "lat_hist").collect()[0]
    assert row["count"] == n
    assert abs(row["sum"] - s) < 1e-9
    assert row["min"] == min(nz)
    assert row["max"] == max(nz)
    assert abs(row["avg"] - s / n) < 1e-12


def test_percentiles_vs_brute(spark, hf_idx):
    q = "content:segment"
    ks = _matched_ks(spark, hf_idx, q)
    merged = {}
    for v, c in _pairs(ks):
        merged[v] = merged.get(v, 0) + c
    items = sorted((v, c) for v, c in merged.items() if c > 0)
    total = sum(c for _, c in items)

    def q1(p):
        target = max(math.ceil(p * total), 1)
        cum = 0
        for v, c in items:
            cum += c
            if cum >= target:
                return v
        return items[-1][0]

    ps = (0.0, 0.5, 0.9, 1.0)
    got = {
        r["p"]: r["value"]
        for r in histogram_field_percentiles(
            spark, hf_idx, q, "lat_hist", percentiles=ps
        ).collect()
    }
    assert got == {p: q1(p) for p in ps}


def test_exists_and_rejections(spark, hf_idx):
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import multi_terms, search_sorted

    ks = _matched_ks(spark, hf_idx, "lat_hist:*")
    assert ks == {d["k"] for d in _mk_docs() if d["lat_hist"] is not None}
    mf = load_manifest(hf_idx)
    with pytest.raises(QueryParseError, match="histogram"):
        parse_query("lat_hist:5", mf.schema)
    with pytest.raises(ValueError, match="histogram"):
        search_sorted(spark, hf_idx, "content:merge", "lat_hist")
    with pytest.raises(ValueError, match="histogram"):
        multi_terms(spark, hf_idx, "content:merge", ["lat_hist", "k"])
    with pytest.raises(ValueError, match="histogram field"):
        histogram_field_stats(spark, hf_idx, "content:merge", "content")
    with pytest.raises(ValueError, match="percentiles"):
        histogram_field_percentiles(
            spark, hf_idx, "content:merge", "lat_hist", percentiles=(1.5,)
        )


def test_build_validation(spark, tmp_path):
    s = Schema()
    s.add_text_field("content", "default")
    s.add_histogram_field("h")

    def _try(val, match):
        with pytest.raises(Exception, match=match):
            build_index(
                spark,
                spark.createDataFrame(
                    [(0, "a", val)], "k long, content string, h string"
                ),
                s, str(tmp_path / f"b{abs(hash(val))}"), num_partitions=1,
                order_col="k", id_cols=["k"],
            )

    _try("3:1;2:1", "ascending")
    _try("3;2", "value:count")
    _try("3:-1", "non-negative")
    _try("3:1.5", "non-negative integer")


def test_merge_carries_histograms(spark, hf_idx, tmp_path):
    import shutil

    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.merge import merge_segments
    from ostrich_spark.query.exec import invalidate_cache

    idx = str(tmp_path / "m")
    shutil.copytree(hf_idx, idx)
    before = histogram_field_stats(
        spark, idx, "content:merge", "lat_hist"
    ).collect()[0]
    m = load_manifest(idx)
    merge_segments(spark, idx, [s.segment_id for s in m.segments], "mrg-0")
    invalidate_cache(idx)
    after = histogram_field_stats(
        spark, idx, "content:merge", "lat_hist"
    ).collect()[0]
    assert after.asDict() == before.asDict()


def test_cli_hist_aggs(spark, hf_idx):
    import subprocess
    import sys

    def _run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", *argv],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = _run("agg", "content:merge", "-p", hf_idx, "--hist-stats", "lat_hist")
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.splitlines()[0]
    ks = _matched_ks(spark, hf_idx, "content:merge")
    pairs = _pairs(ks)
    assert f"count {sum(c for _, c in pairs)}" in line
    out = _run("agg", "content:merge", "-p", hf_idx,
               "--hist-pctl", "lat_hist", "--ps", "0.5")
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0].startswith("p0.5 ")
    bad = _run("agg", "content:merge", "-p", hf_idx, "--hist-stats", "content")
    assert bad.returncode == 2 and "histogram" in bad.stderr
