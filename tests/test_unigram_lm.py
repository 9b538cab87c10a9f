"""Unigram-LM perplexity-proxy quality scoring (textops.unigram_lm /
unigram_nll) — the cheap end of the CCNet/KenLM pretrain-filter recipe.
Oracle: HAND-computed add-alpha arithmetic on a tiny corpus (the gated
DuckDB entry recomputes the same formula, so this is the independent
check the sketch-op rule requires)."""

import math

import pandas as pd
import pytest

from ostrich_spark.textops import unigram_lm, unigram_nll

DOCS = [
    {"doc_id": 0, "text": "a a b"},
    {"doc_id": 1, "text": "b c"},
]
# counts: a=2 b=2 c=1 -> T=5, V=3, denom = 5 + 0.5*3 = 6.5
DENOM = 6.5
LP = {"a": math.log(2.5 / DENOM), "b": math.log(2.5 / DENOM),
      "c": math.log(1.5 / DENOM)}
UNK = math.log(0.5 / DENOM)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS))


def test_hand_computed_nll(spark, corpus):
    model, unk = unigram_lm(corpus)
    assert unk == pytest.approx(UNK, rel=1e-12)
    got_m = {r["term"]: r["logp"] for r in model.collect()}
    assert got_m.keys() == LP.keys()
    for t, lp in LP.items():
        assert got_m[t] == pytest.approx(lp, rel=1e-12)
    got = {r["doc_id"]: r for r in unigram_nll(corpus, model, unk).collect()}
    d0 = -(2 * LP["a"] + LP["b"]) / 3
    d1 = -(LP["b"] + LP["c"]) / 2
    assert got[0]["n_tokens"] == 3 and got[1]["n_tokens"] == 2
    assert got[0]["nll"] == pytest.approx(round(d0, 6), abs=1e-9)
    assert got[1]["nll"] == pytest.approx(round(d1, 6), abs=1e-9)
    assert got[1]["ppl"] == pytest.approx(round(math.exp(d1), 6), abs=1e-9)
    # rare-token doc is LESS likely -> higher nll (the filter property)
    assert got[1]["nll"] > got[0]["nll"]


def test_unseen_tokens_score_unk(spark, corpus):
    """Scoring a different corpus: unseen tokens take unk_logp; a fully
    out-of-vocabulary doc's nll is exactly -unk_logp."""
    model, unk = unigram_lm(corpus)
    other = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 9, "text": "zz yy zz"},
                      {"doc_id": 10, "text": "a zz"}])
    )
    got = {r["doc_id"]: r for r in unigram_nll(other, model, unk).collect()}
    assert got[9]["nll"] == pytest.approx(round(-UNK, 6), abs=1e-9)
    want10 = -(LP["a"] + UNK) / 2
    assert got[10]["nll"] == pytest.approx(round(want10, 6), abs=1e-9)


def test_zero_token_docs_and_validation(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 0, "text": "a b"}, {"doc_id": 1, "text": "!!!"}])
    )
    model, unk = unigram_lm(df)
    scored = unigram_nll(df, model, unk)
    assert {r["doc_id"] for r in scored.collect()} == {0}  # no tokens, no row
    with pytest.raises(ValueError, match="alpha"):
        unigram_lm(df, alpha=0.0)
    empty = spark.createDataFrame(pd.DataFrame([{"doc_id": 0, "text": "!!"}]))
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_lm(empty)
