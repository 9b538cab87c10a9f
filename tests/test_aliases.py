"""Named alias registry (the ES ``_aliases`` API analog): atomic action
lists, per-index filters/boosts riding the multi-index search path,
write-index routing, the zero-downtime swap.

EXTENSION — the reference is single-index (/root/reference/reader/
search.go); ES's alias registry is the deployment surface that makes
per-day/per-wave indexes queryable as one stable name.
"""

import json
import os

import pytest

from ostrich_spark.aliases import (
    REGISTRY_FILE,
    alias_search,
    get_aliases,
    resolve_alias,
    update_aliases,
    write_index,
)
from ostrich_spark.build import build_index
from ostrich_spark.query.multi import search_multi
from ostrich_spark.schema import Schema

DOCS = [
    (0, "spark joins fast", 300),
    (1, "spark streams", 120),
    (2, "hash join spark", 500),
    (3, "window functions", 80),
    (4, "spark spark spark", 900),
    (5, "grace hash join", 40),
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    s.add_numeric_field("n_chars")
    return s


@pytest.fixture(scope="module")
def halves(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("alr")
    dirs = []
    for parity in (0, 1):
        df = spark.createDataFrame(
            [d for d in DOCS if d[0] % 2 == parity],
            "doc_id long, text string, n_chars long",
        )
        idx = str(base / f"half{parity}")
        build_index(spark, df, _schema(), idx, num_partitions=1,
                    order_col="doc_id", id_cols=["doc_id"])
        dirs.append(idx)
    return dirs


def test_update_list_and_atomicity(halves, tmp_path):
    reg_dir = str(tmp_path / "reg")
    reg = update_aliases(reg_dir, [
        {"add": {"alias": "docs", "index": halves[0],
                 "filter": "n_chars:[100 TO 1000]"}},
        {"add": {"alias": "docs", "index": halves[1], "boost": 2.0}},
    ])
    assert [r["index"] for r in reg["docs"]] == [
        os.path.realpath(d) for d in halves]
    # re-add updates the entry IN PLACE (position + the ES semantics)
    reg = update_aliases(reg_dir, [
        {"add": {"alias": "docs", "index": halves[0], "filter": None}},
    ])
    assert reg["docs"][0]["filter"] is None
    assert reg["docs"][1]["boost"] == 2.0
    before = json.load(open(os.path.join(reg_dir, REGISTRY_FILE)))
    # atomicity: a valid head + invalid tail changes NOTHING
    with pytest.raises(ValueError, match="not a committed index"):
        update_aliases(reg_dir, [
            {"add": {"alias": "docs", "index": halves[0], "boost": 3.0}},
            {"add": {"alias": "docs", "index": str(tmp_path / "nope")}},
        ])
    assert json.load(open(os.path.join(reg_dir, REGISTRY_FILE))) == before
    # remove one; removing the last index drops the alias entirely
    update_aliases(reg_dir, [{"remove": {"alias": "docs",
                                         "index": halves[0]}}])
    assert len(get_aliases(reg_dir, "docs")["docs"]) == 1
    update_aliases(reg_dir, [{"remove": {"alias": "docs",
                                         "index": halves[1]}}])
    with pytest.raises(ValueError, match="does not exist"):
        get_aliases(reg_dir, "docs")
    with pytest.raises(ValueError, match="does not exist"):
        update_aliases(reg_dir, [{"remove": {"alias": "docs",
                                             "index": halves[0]}}])


def test_write_index_rules(halves, tmp_path):
    reg_dir = str(tmp_path / "reg")
    update_aliases(reg_dir, [
        {"add": {"alias": "single", "index": halves[0]}},
        {"add": {"alias": "multi", "index": halves[0]}},
        {"add": {"alias": "multi", "index": halves[1]}},
    ])
    # single-index alias: its one index IS the write index
    assert write_index(reg_dir, "single") == os.path.realpath(halves[0])
    # multi without a flag: rejected (the ES write-routing rule)
    with pytest.raises(ValueError, match="flag exactly one"):
        write_index(reg_dir, "multi")
    update_aliases(reg_dir, [
        {"add": {"alias": "multi", "index": halves[1],
                 "is_write_index": True}},
    ])
    assert write_index(reg_dir, "multi") == os.path.realpath(halves[1])
    # two write flags reject at update time, leaving the file untouched
    with pytest.raises(ValueError, match="at most one"):
        update_aliases(reg_dir, [
            {"add": {"alias": "multi", "index": halves[0],
                     "is_write_index": True}},
        ])
    assert write_index(reg_dir, "multi") == os.path.realpath(halves[1])


def test_alias_search_identity(spark, halves, tmp_path):
    """alias_search == search_multi with the same dirs/filters/boosts —
    the registry only RESOLVES; the scoring machinery is the gated
    multi-index path."""
    reg_dir = str(tmp_path / "reg")
    update_aliases(reg_dir, [
        {"add": {"alias": "docs", "index": halves[0],
                 "filter": "n_chars:[100 TO 1000]", "boost": 1.5}},
        {"add": {"alias": "docs", "index": halves[1]}},
    ])
    got, _ = alias_search(spark, reg_dir, "docs", "text:spark",
                          limit=None)
    exp, _ = search_multi(
        spark, [os.path.realpath(d) for d in halves], "text:spark",
        limit=None, alias_filters=["n_chars:[100 TO 1000]", None],
        index_boosts=[1.5, None],
    )
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in exp.collect()]
    r = resolve_alias(reg_dir, "docs")
    assert r["filters"] == ["n_chars:[100 TO 1000]", None]
    assert r["boosts"] == [1.5, None]


def test_zero_downtime_swap(spark, halves, tmp_path):
    """The documented ES rollover: remove old + add new in ONE action
    list — readers of the alias never see an empty or doubled state."""
    reg_dir = str(tmp_path / "reg")
    update_aliases(reg_dir, [
        {"add": {"alias": "live", "index": halves[0]}},
    ])
    update_aliases(reg_dir, [
        {"remove": {"alias": "live", "index": halves[0]}},
        {"add": {"alias": "live", "index": halves[1]}},
    ])
    rows = get_aliases(reg_dir, "live")["live"]
    assert [r["index"] for r in rows] == [os.path.realpath(halves[1])]
    got, _ = alias_search(spark, reg_dir, "live", "text:spark",
                          limit=None)
    # odd half only: docs 1 (spark streams) — doc 3/5 carry no 'spark'
    assert {r["doc"] for r in got.collect()} == {
        r["doc"] for r in search_multi(
            spark, [halves[1]], "text:spark", limit=None)[0].collect()}


def test_add_validation(halves, tmp_path):
    reg_dir = str(tmp_path / "reg")
    with pytest.raises(ValueError, match="filter does not parse"):
        update_aliases(reg_dir, [
            {"add": {"alias": "a", "index": halves[0],
                     "filter": "n_chars:[broken"}},
        ])
    with pytest.raises(ValueError, match="boost must be > 0"):
        update_aliases(reg_dir, [
            {"add": {"alias": "a", "index": halves[0], "boost": 0}},
        ])
    with pytest.raises(ValueError, match="add action needs"):
        update_aliases(reg_dir, [{"add": {"alias": "a"}}])
    with pytest.raises(ValueError, match="must be"):
        update_aliases(reg_dir, [{"frobnicate": {}}])
    assert get_aliases(reg_dir) == {}


def test_cli_alias(halves, tmp_path):
    import subprocess
    import sys

    reg = str(tmp_path / "reg")

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "alias", *argv,
             "--registry", reg],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("add", "docs", "-p", halves[0], "--filter",
              "n_chars:[100 TO 1000]", "--boost", "1.5")
    assert out.returncode == 0, out.stderr[-2000:]
    out = run("add", "docs", "-p", halves[1], "--write")
    assert out.returncode == 0, out.stderr[-2000:]
    out = run("list")
    assert out.returncode == 0 and "docs ->" in out.stdout
    assert "boost=1.5" in out.stdout and "write" in out.stdout
    out = run("search", "docs", "text:spark", "-l", "10")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "docs" in out.stdout.splitlines()[-2]  # "N docs" line
    out = run("remove", "docs", "-p", halves[0])
    assert out.returncode == 0
    out = run("remove", "nope", "-p", halves[0])
    assert out.returncode == 2 and "does not exist" in out.stderr
