"""hashed_ngram_score — fastText-style linear classifier over hashed
word n-grams (textops), with its DuckDB twin from the same generator.

Design under test:
- score == a hashlib-based python recompute (unigrams + bigrams,
  hashing-trick absent-id-is-zero, mean normalization, sigmoid);
- engine == the hashed_ngram_score_sql twin run in ACTUAL DuckDB over
  the same rows (the shared-generator convention);
- bigram features fire (a weight keyed on a bigram id changes scores),
  sum vs mean, empty doc scores sigmoid(bias);
- validation paths.
"""

import hashlib
import math
import re

import pytest

from ostrich_spark.textops import hashed_ngram_score, hashed_ngram_score_sql

N_FEAT = 4096


def _fid(gram, salt="clf"):
    return int(hashlib.sha256((salt + gram).encode()).hexdigest()[:8], 16) % N_FEAT


def _brute(text, weights, word_ngrams=2, bias=0.0, mode="mean"):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    grams = list(toks)
    if word_ngrams == 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    z = sum(weights.get(_fid(g), 0.0) for g in grams)
    if mode == "mean":
        z /= max(len(grams), 1)
    z += bias
    return 1.0 / (1.0 + math.exp(-z))


DOCS = [
    (0, "Spark shuffles data across the cluster"),
    (1, "merge policy drives segment compaction"),
    (2, "spark spark spark join window"),
    (3, ""),
    (4, "data quality matters for training data pipelines"),
]


def _weights():
    # weights on unigrams AND one specific bigram
    w = {
        _fid("spark"): 1.4,
        _fid("data"): 0.6,
        _fid("merge"): -1.1,
        _fid("training data"): 2.0,  # bigram feature
    }
    return w


def test_scores_vs_brute_and_duckdb(spark):
    import duckdb
    import pandas as pd

    w = _weights()
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_ngram_score(
            df, w, n_features=N_FEAT, bias=0.25
        ).collect()
    }
    for k, text in DOCS:
        assert abs(got[k] - _brute(text, w, bias=0.25)) < 1e-12, k
    # empty doc scores sigmoid(bias)
    assert abs(got[3] - 1.0 / (1.0 + math.exp(-0.25))) < 1e-12
    # DuckDB twin from the same generator — identical at 1e-12
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    expr = hashed_ngram_score_sql("text", w, n_features=N_FEAT, bias=0.25)
    for k, v in con.sql(f"SELECT doc_id, {expr} AS s FROM d").fetchall():
        assert abs(got[k] - v) < 1e-12, k


def test_bigram_fires_and_modes(spark):
    w = _weights()
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # without the bigram weight, doc 4 scores differently
    w_nobi = {k: v for k, v in w.items() if k != _fid("training data")}
    a = hashed_ngram_score(df, w, n_features=N_FEAT).collect()
    b = hashed_ngram_score(df, w_nobi, n_features=N_FEAT).collect()
    sa = {r["doc_id"]: r["clf_score"] for r in a}
    sb = {r["doc_id"]: r["clf_score"] for r in b}
    assert sa[4] != sb[4] and sa[0] == sb[0]
    # unigram-only mode ignores the bigram weight entirely
    uni = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_ngram_score(
            df, w, n_features=N_FEAT, word_ngrams=1
        ).collect()
    }
    for k, text in DOCS:
        assert abs(uni[k] - _brute(text, w, word_ngrams=1)) < 1e-12
    # sum mode
    s = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_ngram_score(
            df, w, n_features=N_FEAT, mode="sum"
        ).collect()
    }
    for k, text in DOCS:
        assert abs(s[k] - _brute(text, w, mode="sum")) < 1e-12


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="word_ngrams"):
        hashed_ngram_score(df, {0: 1.0}, word_ngrams=3)
    with pytest.raises(ValueError, match="mode"):
        hashed_ngram_score(df, {0: 1.0}, mode="max")
    with pytest.raises(ValueError, match="weights"):
        hashed_ngram_score(df, {})
    with pytest.raises(ValueError, match="outside"):
        hashed_ngram_score(df, {N_FEAT + 5: 1.0}, n_features=N_FEAT)
