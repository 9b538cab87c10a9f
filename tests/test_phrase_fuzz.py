"""Randomized differential test: engine vs single-process oracle on
queries mixing PHRASES, terms, AND/OR, and MUST_NOT over a
positions-enabled multi-segment index.

The oracle evaluates phrase semantics with plain Python position lists;
the engine with the packed-positions keyset intersection — agreement on
40 seeded random queries x 2 scorers is strong evidence neither side has
a structural bug (they share only the formula contract)."""

import random

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.oracle import OracleIndex
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    PhraseQuery,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

VOCAB = ["spark", "join", "index", "merge", "query", "scan", "table", "row"]


def _mk_corpus(n=150, seed=9):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(4, 30))]
        docs.append({"k": i, "text": " ".join(toks)})
    return docs


@pytest.fixture(scope="module")
def fuzz_index(spark, tmp_path_factory):
    docs = _mk_corpus()
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    idx = str(tmp_path_factory.mktemp("pf") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(docs)),
        schema,
        idx,
        num_partitions=4,
        order_col="k",
        id_cols=["k"],
    )
    oracle = OracleIndex(schema, [{"text": d["text"]} for d in docs])
    return idx, oracle, schema


def _rand_leaf(rng):
    if rng.random() < 0.45:
        n = rng.randint(2, 3)
        return PhraseQuery(0, tuple(rng.choice(VOCAB) for _ in range(n)))
    return TermQuery(0, rng.choice(VOCAB))


def _rand_query(rng):
    shape = rng.random()
    if shape < 0.3:
        return _rand_leaf(rng)
    if shape < 0.55:
        return BooleanQuery.intersection(_rand_leaf(rng), _rand_leaf(rng))
    if shape < 0.75:
        return BooleanQuery.union(_rand_leaf(rng), _rand_leaf(rng), _rand_leaf(rng))
    if shape < 0.9:
        return BooleanQuery(
            [(MUST, _rand_leaf(rng)), (MUST_NOT, _rand_leaf(rng))]
        )
    return BooleanQuery(
        [(MUST, _rand_leaf(rng)), (SHOULD, _rand_leaf(rng)), (MUST_NOT, TermQuery(0, rng.choice(VOCAB)))]
    )


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_phrase_boolean_fuzz_rank_and_score_identity(spark, fuzz_index, scorer):
    idx, oracle, _ = fuzz_index
    rng = random.Random(1234)
    n_nonempty = 0
    for trial in range(40):
        q = _rand_query(rng)
        res, _ = search(spark, idx, q, limit=None, scorer=scorer)
        rows = attach_docmap(spark, idx, res).select("k", "score").collect()
        got = sorted(((r["k"], r["score"]) for r in rows), key=lambda t: (-t[1], t[0]))
        exp = sorted(oracle.search(q, limit=None, scorer=scorer), key=lambda t: (-t[1], t[0]))
        assert [k for k, _ in got] == [k for k, _ in exp], (trial, q)
        for (k1, s1), (k2, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-9), (trial, q, k1)
        n_nonempty += bool(got)
    assert n_nonempty >= 25  # the query mix must actually exercise matches


def test_phrase_string_query_matches_programmatic(spark, fuzz_index):
    idx, oracle, schema = fuzz_index
    s = 'text:"spark join" OR text:scan'
    logical = parse_query(s, schema)
    a, _ = search(spark, idx, s, limit=None)
    b, _ = search(spark, idx, logical, limit=None)
    ra = sorted((r["k"], r["score"]) for r in attach_docmap(spark, idx, a).select("k", "score").collect())
    rb = sorted((r["k"], r["score"]) for r in attach_docmap(spark, idx, b).select("k", "score").collect())
    assert ra == rb and ra
