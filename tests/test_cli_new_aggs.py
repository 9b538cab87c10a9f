"""CLI surface for the round-3 additions: agg --boxplot/--string-stats/
--auto-date-hist/--multi-terms and search --pin/--script-score/
--distance-by. One index, subprocess per command (the CLI contract)."""

import subprocess
import sys

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.schema import Schema

US_PER_DAY = 86_400_000_000


@pytest.fixture(scope="module")
def cli_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("text", "default", store=True)
    s.add_numeric_field("v", "double")
    s.add_keyword_field("tag")
    s.add_keyword_field("grp")
    s.add_date_field("t")
    docs = [
        {
            "doc_id": i,
            "text": "spark data " + ("hot" if i < 3 else "cold"),
            "v": float(i),
            "tag": ["aa", "bb"][i % 2],
            "grp": ["g1", "g2", "g3"][i % 3],
            "t": i * US_PER_DAY,
        }
        for i in range(30)
    ]
    idx = str(tmp_path_factory.mktemp("clinew") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "ostrich_spark", *argv],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )


def test_cli_agg_boxplot_and_string_stats(cli_idx):
    out = _run("agg", "text:spark", "-p", cli_idx, "--boxplot", "v")
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.splitlines()[0]
    # v = 0..29: q2 = 14.5, whiskers = data extremes (no outliers)
    assert "q2 14.5" in line and "whiskers [0.0, 29.0]" in line

    out = _run("agg", "text:spark", "-p", cli_idx, "--string-stats", "tag")
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.splitlines()[0]
    assert line.startswith("count 30  len [2, 2]")
    assert "entropy 1.0" in line  # a/b chars equi-probable -> 1 bit

    # v = 0..29: median 14.5, |v-14.5| pairs -> mad = 7.5
    out = _run("agg", "text:spark", "-p", cli_idx, "--mad", "v")
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0] == "n 30  median 14.5  mad 7.5"

    # mode exclusivity + error path
    bad = _run("agg", "text:spark", "-p", cli_idx,
               "--boxplot", "v", "--stats", "v")
    assert bad.returncode == 2
    bad = _run("agg", "text:spark", "-p", cli_idx, "--boxplot", "tag")
    assert bad.returncode == 2 and "numeric" in bad.stderr
    bad = _run("agg", "text:spark", "-p", cli_idx, "--mad", "tag")
    assert bad.returncode == 2 and "numeric" in bad.stderr


def test_cli_agg_auto_date_hist_and_multi_terms(cli_idx):
    out = _run("agg", "text:spark", "-p", cli_idx,
               "--auto-date-hist", "t", "--buckets", "40")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines[0] == "interval: day"
    assert len([l for l in lines if l[0].isdigit()]) == 30

    # date-hist --offset: t = i days at midnight, so a +6h offset puts
    # every doc in the PRECEDING day's 06:00 bucket
    out = _run("agg", "text:spark", "-p", cli_idx,
               "--date-hist", "t", "--offset", "6h")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines()
             if l.strip() and l[0].isdigit() or l.startswith("-")]
    assert len(lines) == 30
    for l in lines:
        ms = int(l.split()[0])
        assert (ms - 21_600_000) % 86_400_000 == 0
    bad = _run("agg", "text:spark", "-p", cli_idx,
               "--date-hist", "t", "--offset", "sideways")
    assert bad.returncode == 2 and "duration" in bad.stderr

    out = _run("agg", "text:spark", "-p", cli_idx,
               "--multi-terms", "tag,grp", "--size", "3")
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [l for l in out.stdout.splitlines()
            if l.strip() and not l.startswith("elapsed")]
    assert len(rows) == 3
    for l in rows:
        key, n = l.rsplit(" ", 1)
        assert "|" in key and int(n) >= 1


def test_cli_search_pin_script_distance(cli_idx):
    out = _run("search", "text:hot", "-p", cli_idx,
               "--pin", "7,3", "-l", "5", "--scorer", "tfidf")
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if "/" in l]
    assert hits[0].endswith("[pinned]") and hits[1].endswith("[pinned]")
    # docs 7 and 3 are 'cold' -> pinned surfaces them anyway, then hot
    assert len(hits) == 5

    out = _run("search", "text:hot", "-p", cli_idx,
               "--script-score", "_score + v", "-l", "3", "--scorer", "tfidf")
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if "(base " in l]
    assert len(hits) == 3
    bad = _run("search", "text:hot", "-p", cli_idx, "--script-score", "nope_col")
    assert bad.returncode == 2 and "failed to compile" in bad.stderr

    out = _run("search", "text:hot", "-p", cli_idx,
               "--distance-by", "v", "--origin", "0", "--pivot", "1",
               "-l", "3", "--scorer", "tfidf")
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if "(base " in l]
    # v=0 doc gets the full +1 bonus -> ranks first among equal text scores
    assert hits and "v=0.0" in hits[0]
    bad = _run("search", "text:hot", "-p", cli_idx, "--distance-by", "v")
    assert bad.returncode == 2 and "--origin and --pivot" in bad.stderr
    # one-at-a-time rule
    bad = _run("search", "text:hot", "-p", cli_idx,
               "--pin", "1", "--script-score", "_score")
    assert bad.returncode == 2


def test_cli_agg_t_test(cli_idx):
    """CLI agg --t-test: hot (v=0,1,2) vs cold (v=3..29) Welch t; the
    printed t/df match a numpy recomputation; paired and error paths."""
    import math

    import numpy as np

    out = _run(
        "agg", "text:hot", "-p", cli_idx, "--t-test", "v", "--vs", "text:cold"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.splitlines()[0]
    a, b = np.arange(3.0), np.arange(3.0, 30.0)
    sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
    assert line.startswith("heteroscedastic  n_a 3  n_b 27")
    assert f"t {t:.6f}" in line and "p_value" in line
    # missing --vs refuses loudly
    bad = _run("agg", "text:hot", "-p", cli_idx, "--t-test", "v")
    assert bad.returncode == 2 and "query_b" in bad.stderr


def test_cli_agg_top_hits(cli_idx):
    """CLI agg --top-hits: per-grp top-2 by v desc — ranked flat lines;
    the top doc per group is the largest v in that group (v == doc_id)."""
    out = _run(
        "agg", "text:spark", "-p", cli_idx, "--top-hits", "grp",
        "--sort", "v:desc,doc_id:asc", "--size", "2", "--columns", "doc_id,v",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("g")]
    assert len(lines) == 6  # 3 groups x size 2
    # grp g1 holds doc_ids ≡ 0 mod 3 → top v is 27, then 24
    g1 = [l for l in lines if l.startswith("g1 ")]
    assert "#1" in g1[0] and "v=27.0" in g1[0]
    assert "#2" in g1[1] and "v=24.0" in g1[1]
    # unknown sort column refuses loudly
    bad = _run("agg", "text:spark", "-p", cli_idx, "--top-hits", "grp",
               "--sort", "nope:desc")
    assert bad.returncode == 2 and "sort column" in bad.stderr


def test_cli_agg_categorize(cli_idx):
    """CLI agg --categorize: 'spark data hot' x3 and 'spark data cold'
    x27 are the only letter-only templates (no numerics in the corpus),
    count-desc ordered."""
    out = _run("agg", "text:spark", "-p", cli_idx, "--categorize", "text")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if not l.startswith("elapsed")]
    assert lines == ["27 spark data cold", "3 spark data hot"]
    # --max-tokens merges both templates
    out = _run("agg", "text:spark", "-p", cli_idx, "--categorize", "text",
               "--max-tokens", "2")
    lines = [l for l in out.stdout.splitlines() if not l.startswith("elapsed")]
    assert lines == ["30 spark data"]


def test_cli_agg_itemsets_and_sampler(cli_idx):
    """CLI agg --freq-itemsets and --sample-by print deterministic
    lines; both error paths loud."""
    out = _run("agg", "text:spark", "-p", cli_idx,
               "--freq-itemsets", "tag,grp", "--min-support", "0.2")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if not l.startswith("elapsed")]
    # 30 docs: tags 15/15, grps 10/10/10 -> singles all >= 0.2 support
    assert any(l.endswith("tag=aa") and l.startswith("15") for l in lines)
    assert any(l.endswith("grp=g1") and l.startswith("10") for l in lines)

    out = _run("agg", "text:spark", "-p", cli_idx,
               "--sample-by", "grp", "--sample-p", "0.5")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("g")]
    assert len(lines) >= 1 and all("~" in l for l in lines)
    bad = _run("agg", "text:spark", "-p", cli_idx, "--sample-by", "grp")
    assert bad.returncode == 2 and "--sample-p" in bad.stderr
    bad = _run("agg", "text:spark", "-p", cli_idx,
               "--sample-by", "grp", "--sample-p", "0.7")
    assert bad.returncode == 2 and "probability" in bad.stderr
