"""terms_enum — ES _terms_enum API analog (EXTENSION; the reference has
no dictionary API).

Design under test:
- term-order enumeration of a text field's dictionary, prefix-pruned
  via the sorted term_stats range read (early-stopping batch scan);
- search_after pages strictly after a term; page concatenation == full
  enumeration;
- postings fallback when term_stats is absent gives identical output;
- commit-time dictionary: tombstoned docs' terms still enumerate (the
  documented ES deleted-docs caveat);
- case_insensitive lowercases the prefix (exact for lowercasing
  analyzers).
"""

import re
import subprocess
import sys

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.expand import terms_enum
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "content": "Spark sparse sparrow split splice apache"},
    {"k": 1, "content": "spark split merge policy segment"},
    {"k": 2, "content": "sparse query plan merge spark"},
    {"k": 3, "content": "zebra yak xylophone split"},
]


def _brute_dict(prefix=""):
    df = {}
    for d in DOCS:
        toks = {t for t in re.split(r"[^a-z0-9]+", d["content"].lower()) if t}
        for t in toks:
            if t.startswith(prefix):
                df[t] = df.get(t, 0) + 1
    return sorted(df.items())


@pytest.fixture(scope="module")
def te_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("content", "default")
    idx = str(tmp_path_factory.mktemp("te") / "idx")
    build_index(
        spark,
        spark.createDataFrame(DOCS, "k long, content string"),
        s, idx, num_partitions=2, order_col="k", id_cols=["k"],
    )
    return idx


def test_enum_vs_brute_and_size_cut(spark, te_idx):
    full = _brute_dict("sp")
    got = terms_enum(spark, te_idx, "content", prefix="sp", size=100)
    assert got == full
    assert terms_enum(spark, te_idx, "content", prefix="sp", size=2) == full[:2]
    # empty prefix = whole dictionary, still term-ordered
    assert terms_enum(spark, te_idx, "content", size=1000) == _brute_dict()


def test_enum_paging_concatenates(spark, te_idx):
    full = _brute_dict()
    pages, after = [], None
    while True:
        page = terms_enum(spark, te_idx, "content", size=3, search_after=after)
        if not page:
            break
        pages.extend(page)
        after = page[-1][0]
    assert pages == full
    # after inside a prefix range composes with the prefix bound
    sp = _brute_dict("sp")
    assert terms_enum(
        spark, te_idx, "content", prefix="sp", size=100,
        search_after=sp[0][0],
    ) == sp[1:]


def test_enum_postings_fallback_identical(spark, te_idx, tmp_path):
    import os
    import shutil

    stats = os.path.join(te_idx, "term_stats.parquet")
    moved = str(tmp_path / "stats_away")
    shutil.move(stats, moved)
    try:
        got = terms_enum(spark, te_idx, "content", prefix="sp", size=100)
    finally:
        shutil.move(moved, stats)
    assert got == _brute_dict("sp")


def test_enum_case_insensitive_and_validation(spark, te_idx):
    got = terms_enum(
        spark, te_idx, "content", prefix="SP", size=100, case_insensitive=True
    )
    assert got == _brute_dict("sp")
    # verbatim mode: an uppercase prefix matches nothing (lowercasing analyzer)
    assert terms_enum(spark, te_idx, "content", prefix="SP", size=100) == []
    with pytest.raises(ValueError, match="unknown field"):
        terms_enum(spark, te_idx, "nope")
    with pytest.raises(ValueError, match="size"):
        terms_enum(spark, te_idx, "content", size=0)


def test_enum_tombstone_caveat(spark, te_idx, tmp_path):
    """Commit-time dictionary: deleting the only doc containing 'zebra'
    leaves it enumerable (the ES deleted-docs caveat) until purge."""
    import shutil

    from ostrich_spark.deletes import delete_docs

    idx = str(tmp_path / "idx2")
    shutil.copytree(te_idx, idx)
    delete_docs(spark, idx, spark.createDataFrame([(3,)], "k long"), "k")
    got = dict(terms_enum(spark, idx, "content", prefix="z", size=10))
    assert got == {"zebra": 1}


def test_enum_multifile_stats_ordering(spark, te_idx, tmp_path):
    """Force a MULTI-file term_stats dir (nparts=3) and re-check
    enumeration + paging: the early-exit batch scan assumes batches
    arrive in (field, term) order ACROSS files (filename sort ==
    repartitionByRange key order, use_threads=False pins sequential
    scanning) — sandbox-scale indices write one file, so this is the
    only coverage of the multi-file ordering path."""
    import glob
    import os
    import shutil

    idx = str(tmp_path / "idx_mf")
    shutil.copytree(te_idx, idx)
    stats = os.path.join(idx, "term_stats.parquet")
    re_stats = str(tmp_path / "re_stats")
    (
        spark.read.parquet(stats)
        .repartitionByRange(3, "field", "term")
        .sortWithinPartitions("field", "term")
        .write.mode("overwrite")
        .parquet(re_stats)
    )
    shutil.copy(os.path.join(stats, "_STATS_META.json"),
                os.path.join(re_stats, "_STATS_META.json"))
    shutil.rmtree(stats)
    os.rename(re_stats, stats)
    assert len(glob.glob(os.path.join(stats, "*.parquet"))) > 1

    assert terms_enum(spark, idx, "content", size=1000) == _brute_dict()
    assert terms_enum(spark, idx, "content", prefix="sp", size=100) == \
        _brute_dict("sp")
    # size cut spanning a file boundary still yields the global term order
    full = _brute_dict()
    for size in (1, 3, 5, 7):
        assert terms_enum(spark, idx, "content", size=size) == full[:size]
    # paging across file boundaries concatenates to the full dictionary
    pages, after = [], None
    while True:
        page = terms_enum(spark, idx, "content", size=2, search_after=after)
        if not page:
            break
        pages.extend(page)
        after = page[-1][0]
    assert pages == full


def test_cli_terms(te_idx):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "terms", "content",
         "-p", te_idx, "--prefix", "sp", "--size", "3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if not l.startswith("elapsed")]
    assert lines == [f"{t} {d}" for t, d in _brute_dict("sp")[:3]]
    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "terms", "year",
         "-p", te_idx],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert bad.returncode == 2
