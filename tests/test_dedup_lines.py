"""Corpus-level exact-line dedup (dedup.dedup_lines) — the RefinedWeb /
C4-class boilerplate-removal op: lines in > max_line_df distinct docs
drop from EVERY doc; blank lines are structure (never counted, always
kept); docs keep their row even fully emptied. Oracle: hand-enumerated
expectations on the fixture."""

import pandas as pd
import pytest

from ostrich_spark.dedup import dedup_lines

DOCS = [
    {"doc_id": 0, "text": "alpha\nFOOTER\nshared\nbeta"},
    {"doc_id": 1, "text": "gamma\nFOOTER\n\nshared\ndelta"},
    {"doc_id": 2, "text": "FOOTER"},
    {"doc_id": 3, "text": "epsilon\nepsilon"},  # within-doc repeat: df=1
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS))


def _run(spark, corpus, **kw):
    return {r["doc_id"]: r for r in dedup_lines(corpus, **kw).collect()}


def test_boilerplate_removed_everywhere(spark, corpus):
    got = _run(spark, corpus)  # max_line_df=1
    # FOOTER (df 3) and shared (df 2) drop; blanks survive; the doc-3
    # within-doc repeat has df=1 and survives BOTH occurrences
    assert got[0]["text"] == "alpha\nbeta"
    assert got[1]["text"] == "gamma\n\ndelta"
    assert got[2]["text"] == ""  # fully emptied doc keeps its row
    assert got[3]["text"] == "epsilon\nepsilon"
    assert (got[0]["n_kept"], got[0]["n_dropped"]) == (2, 2)
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (3, 2)
    assert (got[2]["n_kept"], got[2]["n_dropped"]) == (0, 1)
    assert (got[3]["n_kept"], got[3]["n_dropped"]) == (2, 0)


def test_max_line_df_threshold(spark, corpus):
    """max_line_df=2: 'shared' (df 2) now survives, FOOTER (df 3) still
    drops — the threshold is strictly-greater-than."""
    got = _run(spark, corpus, max_line_df=2)
    assert got[0]["text"] == "alpha\nshared\nbeta"
    assert got[1]["text"] == "gamma\n\nshared\ndelta"
    assert got[2]["text"] == ""
    # a threshold above every df is the identity transform
    got_hi = _run(spark, corpus, max_line_df=99)
    for d in DOCS:
        assert got_hi[d["doc_id"]]["text"] == d["text"]


def test_keep_one_policy(spark, corpus):
    """policy='keep_one' (C4-style, deterministic): the smallest
    (doc_id, pos) occurrence of each hot line survives, every other
    copy drops — doc 0 holds the keepers for both FOOTER and shared."""
    got = _run(spark, corpus, policy="keep_one")
    assert got[0]["text"] == "alpha\nFOOTER\nshared\nbeta"  # keeper doc intact
    assert got[1]["text"] == "gamma\n\ndelta"
    assert got[2]["text"] == ""
    assert got[3]["text"] == "epsilon\nepsilon"  # df=1: untouched
    assert (got[0]["n_kept"], got[0]["n_dropped"]) == (4, 0)
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (3, 2)
    assert (got[2]["n_kept"], got[2]["n_dropped"]) == (0, 1)


def test_keep_one_within_keeper_doc(spark):
    """A hot line repeated INSIDE the keeper doc keeps only its first
    occurrence (the keeper is one (id, pos), not one doc)."""
    df = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 0, "text": "dup\nmiddle\ndup"},
        {"doc_id": 1, "text": "dup\nother"},
    ]))
    got = _run(spark, df, policy="keep_one")
    assert got[0]["text"] == "dup\nmiddle"  # second in-doc copy drops
    assert got[1]["text"] == "other"
    with pytest.raises(ValueError, match="policy"):
        _run(spark, df, policy="first")


def test_blank_and_single_line_docs(spark):
    df = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": "   "},
        {"doc_id": 2, "text": "only"},
    ]))
    got = _run(spark, df)
    assert got[0]["text"] == "" and got[0]["n_kept"] == 1  # blank kept
    assert got[1]["text"] == "   "
    assert got[2]["text"] == "only"
