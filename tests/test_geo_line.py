"""geo_line aggregation — ES analog (geo.geo_line): matched points as
an ordered track, flat (by…, seq, sort, lat, lon) rows.

Design under test:
- per-bucket lines == brute force (sort by the sort field, skip docs
  missing the point or the sort value), seq contiguous from 1;
- size truncation keeps the FIRST points in sort order (ES rule);
- desc order; global (by=None) line; query context narrows;
- validation: non-geo field, bad order, unknown sort column.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.geo import geo_line
from ostrich_spark.schema import Schema


def _mk_docs():
    docs = []
    for i in range(40):
        vessel = ["alpha", "beta"][i % 2]
        # beta's ping 7 has no position; ping 11 has no timestamp
        loc = None if i == 14 else f"{10 + i * 0.5},{20 + (i % 7) * 1.5}"
        t = None if i == 23 else float(1000 + i)
        docs.append({
            "k": i, "text": f"ping {vessel}", "vessel": vessel,
            "loc": loc, "t": t,
        })
    return docs


def _brute(vessel=None, order="asc", size=10_000):
    rows = [
        d for d in _mk_docs()
        if d["loc"] is not None and d["t"] is not None
        and (vessel is None or d["vessel"] == vessel)
    ]
    rows.sort(key=lambda d: d["t"], reverse=(order == "desc"))
    rows = rows[:size]
    out = []
    for seq, d in enumerate(rows, 1):
        lat, lon = (float(x) for x in d["loc"].split(","))
        out.append((seq, d["t"], lat, lon))
    return out


@pytest.fixture(scope="module")
def gl_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("text", "default")
    s.add_keyword_field("vessel")
    s.add_geo_field("loc")
    s.add_numeric_field("t", "double")
    idx = str(tmp_path_factory.mktemp("gl") / "idx")
    build_index(
        spark,
        spark.createDataFrame(
            _mk_docs(), "k long, text string, vessel string, loc string, t double"
        ),
        s, idx, num_partitions=3, order_col="k", id_cols=["k"],
    )
    return idx


def test_per_bucket_lines_vs_brute(spark, gl_idx):
    got = {}
    for r in geo_line(spark, gl_idx, "loc", "t", by="vessel").collect():
        got.setdefault(r["vessel"], []).append(
            (r["seq"], r["t"], r["lat"], r["lon"])
        )
    for v in ("alpha", "beta"):
        got[v].sort()
        assert got[v] == _brute(v)
        assert [p[0] for p in got[v]] == list(range(1, len(got[v]) + 1))


def test_global_line_size_and_desc(spark, gl_idx):
    rows = sorted(
        (r["seq"], r["t"], r["lat"], r["lon"])
        for r in geo_line(spark, gl_idx, "loc", "t", size=5).collect()
    )
    assert rows == _brute(size=5)
    rows = sorted(
        (r["seq"], r["t"], r["lat"], r["lon"])
        for r in geo_line(spark, gl_idx, "loc", "t", size=5, order="desc").collect()
    )
    assert rows == _brute(order="desc", size=5)


def test_query_context_narrows(spark, gl_idx):
    rows = geo_line(
        spark, gl_idx, "loc", "t", query="text:alpha", by="vessel"
    ).collect()
    assert {r["vessel"] for r in rows} == {"alpha"}
    assert len(rows) == len(_brute("alpha"))


def test_validation(spark, gl_idx):
    with pytest.raises(ValueError, match="geo_point"):
        geo_line(spark, gl_idx, "t", "t")
    with pytest.raises(ValueError, match="order"):
        geo_line(spark, gl_idx, "loc", "t", order="up")
    with pytest.raises(ValueError, match="sort column"):
        geo_line(spark, gl_idx, "loc", "nope")


def test_cli_geo_line(gl_idx):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "geo", "line",
         "-p", gl_idx, "-f", "loc", "--sort-by", "t", "--by", "vessel",
         "--size", "3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith(("alpha", "beta"))]
    assert len(lines) == 6  # 2 vessels x 3 points
    assert lines[0].startswith("alpha #1 ")
    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "geo", "line",
         "-p", gl_idx, "-f", "loc"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "--sort-by" in bad.stderr
