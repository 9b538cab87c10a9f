"""Did-you-mean suggester (Lucene DirectSpellChecker analog; EXTENSION —
the reference has no suggest API). Oracle: pure-Python Levenshtein over
a recount of the corpus dictionary."""

from collections import Counter

import pandas as pd
import pytest

from ostrich_spark.analysis import get_analyzer
from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.expand import (
    damerau_dist,
    damerau_within,
    expand_fuzzy,
    levenshtein_dist,
    levenshtein_within,
    suggest_terms,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "content": "spark shuffle merge stream"},
    {"k": 1, "content": "spark spans sparse stream streams"},
    {"k": 2, "content": "shard share spark stream"},
    {"k": 3, "content": "merge policy segment spear"},
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sugg") / "idx")
    s = Schema()
    s.add_text_field("content", "default")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), s, path,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    return path


def _dictionary():
    an = get_analyzer("default")
    df = Counter()
    for d in DOCS:
        for t in set(an.analyze_one(d["content"])):
            df[t] += 1
    return df


def _oracle(word, max_dist, prefix_length, dist_fn=levenshtein_dist):
    df = _dictionary()
    out = []
    for t, n in df.items():
        if prefix_length and t[:prefix_length] != word[:prefix_length]:
            continue
        d = dist_fn(t, word)
        if d <= max_dist:
            out.append((t, n, d))
    return sorted(out, key=lambda x: (x[2], -x[1], x[0]))


def test_levenshtein_dist_goldens():
    assert levenshtein_dist("spark", "spark") == 0
    assert levenshtein_dist("sparc", "spark") == 1
    assert levenshtein_dist("spak", "spark") == 1
    assert levenshtein_dist("sprak", "spark") == 2  # no transposition op
    assert levenshtein_dist("kitten", "sitting") == 3
    assert levenshtein_dist("", "abc") == 3


def test_within_consistent_with_dist():
    words = ["spark", "sparse", "spear", "shard", "stream", "merge", ""]
    for a in words:
        for b in words:
            for m in (0, 1, 2, 3):
                assert levenshtein_within(a, b, m) == (levenshtein_dist(a, b) <= m)


@pytest.mark.parametrize("word,max_dist", [("sparc", 1), ("sparc", 2), ("strem", 2)])
def test_suggest_matches_oracle(spark, idx, word, max_dist):
    mf = load_manifest(idx)
    got = suggest_terms(spark, idx, mf, 0, word, max_dist=max_dist, prefix_length=1)
    assert got == _oracle(word, max_dist, 1)


def test_suggest_includes_exact_term_at_dist0(spark, idx):
    mf = load_manifest(idx)
    got = suggest_terms(spark, idx, mf, 0, "spark", max_dist=2, prefix_length=1)
    assert got[0] == ("spark", 3, 0)


def test_suggest_wholedict_scan_superset(spark, idx):
    """prefix_length=0 (distributed JVM path) finds everything the
    prefix-pruned path finds, plus terms with a different first letter."""
    mf = load_manifest(idx)
    full = suggest_terms(spark, idx, mf, 0, "sparc", max_dist=2, prefix_length=0)
    pruned = suggest_terms(spark, idx, mf, 0, "sparc", max_dist=2, prefix_length=1)
    assert [x for x in full if x[0][:1] == "s"] == pruned
    assert full == _oracle("sparc", 2, 0)


def test_damerau_dist_goldens():
    assert damerau_dist("spark", "spark") == 0
    assert damerau_dist("sprak", "spark") == 1  # adjacent swap = ONE edit
    assert damerau_dist("sparc", "spark") == 1
    assert damerau_dist("abcd", "acbd") == 1
    # UNRESTRICTED variant (DuckDB parity): edit between a transposed
    # pair allowed — OSA would say 3 here
    assert damerau_dist("ca", "abc") == 2
    assert damerau_dist("kitten", "sitting") == 3
    assert damerau_dist("", "abc") == 3


def test_damerau_bounds_and_duckdb_parity():
    """DL <= Lev <= 2*DL (the 2x bound justifies the distributed path's
    JVM pre-filter radius), and exact DuckDB damerau_levenshtein parity
    on seeded random pairs — the same function the oracle gate runs."""
    import random

    import duckdb

    con = duckdb.connect()
    rng = random.Random(42)
    for _ in range(400):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 7)))
        dl = damerau_dist(a, b)
        lev = levenshtein_dist(a, b)
        assert dl <= lev <= 2 * dl or (dl == 0 and lev == 0)
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert dl == want, (a, b, dl, want)
        for m in (0, 1, 2):
            assert damerau_within(a, b, m) == (dl <= m)


@pytest.mark.parametrize("prefix_length", [1, 0])
def test_suggest_transpositions_oracle(spark, idx, prefix_length):
    """sprak: transpositions ranks spark at distance 1 (plain Levenshtein
    says 2); both the prefix-pruned and the distributed paths match the
    pure-Python Damerau oracle."""
    mf = load_manifest(idx)
    got = suggest_terms(
        spark, idx, mf, 0, "sprak", max_dist=2,
        prefix_length=prefix_length, transpositions=True,
    )
    assert got == _oracle("sprak", 2, prefix_length, damerau_dist)
    assert got[0] == ("spark", 3, 1)


def test_expand_fuzzy_transpositions_superset(spark, idx):
    """Damerau radius contains the plain-Levenshtein radius at the same
    max_dist, and the distributed path (prefix_length=0, 2x JVM
    pre-filter + exact driver-side DP) agrees with the dictionary
    ground truth."""
    mf = load_manifest(idx)
    plain = set(expand_fuzzy(spark, idx, mf, 0, "sprak", 1, prefix_length=0))
    damerau = set(
        expand_fuzzy(
            spark, idx, mf, 0, "sprak", 1, prefix_length=0, transpositions=True
        )
    )
    assert plain <= damerau
    assert "spark" in damerau and "spark" not in plain
    want = {t for t in _dictionary() if damerau_dist(t, "sprak") <= 1}
    assert damerau == want


def test_suggest_text_corrects_only_unknown_words(spark, idx):
    """Whole-text correction: in-dictionary words untouched, typos fixed
    to the best (dist, df) suggestion, hopeless words kept as typed."""
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.expand import suggest_text

    mf = load_manifest(idx)
    corrected, fixes = suggest_text(
        spark, idx, mf, 0,
        ["stream", "strem", "zzzzzzzzqq"],  # known, typo, hopeless
        max_dist=2, prefix_length=0,
    )
    assert corrected == ["stream", "stream", "zzzzzzzzqq"]
    assert fixes == [("strem", "stream", 1)]


def test_cli_suggest_multiword(spark, idx):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "suggest", "-p", idx,
         "--field", "content", "stream strem", "--prefix-length", "0"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0] == "stream stream"
    assert "strem -> stream" in out.stdout


# --- completion suggester (ES completion / fuzzy completion analog) ---


def test_complete_exact_prefix_ranking(spark, idx):
    """Exact completion: every dictionary term with the prefix, ranked
    doc_freq desc then term asc (popularity = the ES weight analog)."""
    from ostrich_spark.query.expand import complete_terms

    mf = load_manifest(idx)
    got = complete_terms(spark, idx, mf, 0, "sp")
    want = sorted(
        ((t, n, 0) for t, n in _dictionary().items() if t.startswith("sp")),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want  # spark(3) first, then spans/sparse/spear alphabetical
    assert got[0][0] == "spark"
    # size cut
    assert complete_terms(spark, idx, mf, 0, "sp", size=2) == want[:2]
    # no-match prefix
    assert complete_terms(spark, idx, mf, 0, "zz") == []
    with pytest.raises(ValueError, match="non-empty"):
        complete_terms(spark, idx, mf, 0, "")


def test_complete_fuzzy_typo_in_prefix(spark, idx):
    """ES fuzzy completion: the typo lives in the PREFIX, the completion
    tail is free — 'stram' (dropped e) still completes to stream(s);
    exact-prefix hits rank before fuzzy ones (distance-first)."""
    from ostrich_spark.query.expand import complete_terms

    mf = load_manifest(idx)
    got = complete_terms(spark, idx, mf, 0, "stram", fuzzy=True, max_dist=1)
    assert got == [("stream", 3, 1), ("streams", 1, 1)]
    # exact-before-fuzzy: 'spars' completes sparse exactly (d0) and
    # reaches spark/spans at one prefix edit, popularity-ranked within d1
    got = complete_terms(spark, idx, mf, 0, "spars", fuzzy=True, max_dist=1)
    assert got == [("sparse", 1, 0), ("spark", 3, 1), ("spans", 1, 1)]
    # min_length guard: a 2-char fuzzy input completes EXACTLY
    assert complete_terms(spark, idx, mf, 0, "sp", fuzzy=True, max_dist=1) \
        == complete_terms(spark, idx, mf, 0, "sp")


def test_prefix_edit_dist_bruteforce():
    """prefix_edit_dist == min over term-prefix lengths of Levenshtein,
    exhaustively over a small alphabet."""
    import itertools

    from ostrich_spark.query.expand import prefix_edit_dist

    def brute(term, prefix, md):
        best = min(
            levenshtein_dist(term[:L], prefix) for L in range(len(term) + 1)
        )
        return best if best <= md else None

    for md in (1, 2):
        for tlen in range(0, 5):
            for term in map("".join, itertools.product("abc", repeat=tlen)):
                for plen in range(1, 4):
                    for prefix in map("".join, itertools.product("abc", repeat=plen)):
                        assert prefix_edit_dist(term, prefix, md) == brute(
                            term, prefix, md
                        ), (term, prefix, md)


def test_cli_complete(spark, idx):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "complete", "-p", idx,
         "--field", "content", "sp", "--size", "3"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert lines[0] == "spark 3 0"
    assert len([l for l in lines if l and not l.startswith("elapsed")]) == 3
    # fuzzy mode through the CLI
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "complete", "-p", idx,
         "--field", "content", "stram", "--fuzzy"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0] == "stream 3 1"
