"""c4_clean — the C4 (Raffel et al. 2020 §2.2) cleaning pass with its
DuckDB twin from the same generator.

Design under test:
- line rules (terminal punct incl closing quotes, min words, blank,
  javascript token) and page rules (min kept lines, lorem ipsum, `{`)
  against a hand-labeled fixture;
- engine == the c4_clean_sql twin in ACTUAL DuckDB;
- kept lines preserve original text and order; parameter toggles.
"""

import pytest

from ostrich_spark.textops import c4_clean, c4_clean_sql

DOCS = [
    # doc 0: 3 good lines -> survives
    (0, "this line has five good words.\n"
        "does this one have enough words?\n"
        "yes it clearly does end well!"),
    # doc 1: only 2 kept (short line + no-terminal line drop) -> page dies
    (1, "one two three four five six.\n"
        "too short.\n"
        "this line has no terminal punctuation\n"
        "a second fine line it is.\n"),
    # doc 2: javascript line drops; quote-terminated line keeps
    (2, "please enable javascript to continue browsing.\n"
        "he said the words were “quite good enough here.”\n"
        "another perfectly ordinary line right here.\n"
        "and a third one to keep the page alive."),
    # doc 3: lorem ipsum kills the page though lines are fine
    (3, "lorem ipsum dolor sit amet friend.\n"
        "this other line is quite fine.\n"
        "and a third keeps counts high."),
    # doc 4: curly brace kills the page
    (4, "function body { return nothing; } is code.\n"
        "this other line is quite fine.\n"
        "and one more good line appears here."),
    # doc 5: blank-only
    (5, "\n\n  \n"),
]


def test_rules_vs_hand_labels(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert got[0]["n_kept"] == 3 and got[0]["survives"]
    assert got[0]["clean_text"] == DOCS[0][1]
    assert got[1]["n_kept"] == 2 and not got[1]["survives"]
    assert "too short." not in got[1]["clean_text"]
    assert "no terminal punctuation" not in got[1]["clean_text"]
    # javascript line dropped, quote-terminated kept, page survives
    assert got[2]["n_kept"] == 3 and got[2]["survives"]
    assert "javascript" not in got[2]["clean_text"]
    assert "”" in got[2]["clean_text"]
    assert not got[3]["survives"] and got[3]["n_kept"] == 3
    assert not got[4]["survives"]
    assert got[5]["n_kept"] == 0 and not got[5]["survives"]


def test_duckdb_twin_identical(spark):
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"], r["survives"])
        for r in c4_clean(df).collect()
    }
    ex = c4_clean_sql("text")
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    q = (
        f"SELECT doc_id, {ex['clean_text']} AS ct, {ex['n_kept']} AS nk, "
        f"{ex['n_dropped']} AS nd, {ex['survives']} AS sv FROM d"
    )
    for doc_id, ct, nk, nd, sv in con.sql(q).fetchall():
        assert got[doc_id] == (ct, nk, nd, sv), doc_id


def test_parameter_toggles_and_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # no terminal requirement: doc 1's unpunctuated line now keeps
    got = {
        r["doc_id"]: r
        for r in c4_clean(df, require_terminal=False).collect()
    }
    assert "no terminal punctuation" in got[1]["clean_text"]
    assert got[1]["survives"]
    # min_words raised: three-word lines die
    got = {r["doc_id"]: r for r in c4_clean(df, min_words=8).collect()}
    assert got[0]["n_kept"] == 0
    with pytest.raises(ValueError, match="min_words"):
        c4_clean(df, min_words=0)
    with pytest.raises(ValueError, match="min_lines"):
        c4_clean(df, min_lines=-1)
