"""Seeded differential fuzz for the session's query kinds — span_or,
span_containing/span_within, constant_score, combined_fields — against
the single-process reference-semantics oracle (rank identity + score
agreement), over a positions-enabled two-field corpus index. Big spans
are drawn from REAL adjacent bigrams of sampled docs (so containment
does real work) mixed with noise pairs (mostly-empty results exercise
the CEmpty paths)."""

import random

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.oracle import OracleIndex
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    SHOULD,
    BooleanQuery,
    CombinedTermQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    PrefixQuery,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanMultiQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanWithinQuery,
    TermQuery,
    WildcardQuery,
)
from ostrich_spark.schema import Schema


@pytest.fixture(scope="module")
def fuzz_index(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nkfuzz")
    pdf = make_corpus(150, seed=33)
    # second text field sharing the analyzer (combined_fields target)
    pdf = pdf.assign(tag=[f"src{i % 5} spark note{i % 11}" for i in range(len(pdf))])
    schema = Schema()
    schema.add_text_field("content", "default", positions=True)
    schema.add_text_field("tag", "default")
    idx = str(tmp / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), schema, idx,
        num_partitions=4, order_col="path", id_cols=["path"], build_id="nk",
    )
    oracle = OracleIndex(
        schema,
        [{"content": c, "tag": t} for c, t in zip(pdf["content"], pdf["tag"])],
    )
    return idx, oracle, pdf


def _gen_queries(pdf, n=40, seed=7):
    rng = random.Random(seed)
    # term pool from real content + noise
    toks0 = [d.lower().split() for d in pdf["content"].head(30)]
    pool = sorted({t for doc in toks0 for t in doc if t.isalnum()})
    bigrams = sorted({(doc[i], doc[i + 1]) for doc in toks0 for i in range(len(doc) - 1)})
    noise = ["zzznope", "qqq", "absent_term"]
    qs = []
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:
            terms = tuple(
                rng.choice(pool if rng.random() < 0.8 else noise)
                for _ in range(rng.randint(1, 4))
            )
            qs.append(SpanOrQuery(0, terms))
        elif kind == 1:
            big = rng.choice(bigrams) if rng.random() < 0.7 else (
                rng.choice(pool), rng.choice(pool))
            little = rng.choice(big) if rng.random() < 0.6 else rng.choice(pool)
            cls = SpanContainingQuery if rng.random() < 0.5 else SpanWithinQuery
            qs.append(cls(0, big, little))
        elif kind == 2:
            inner = BooleanQuery([
                (SHOULD, TermQuery(0, rng.choice(pool))),
                (SHOULD, TermQuery(0, rng.choice(pool + noise))),
            ])
            qs.append(ConstantScoreQuery(inner, round(rng.uniform(0.5, 5.0), 3)))
        elif kind == 3:
            w = float(rng.randint(1, 3))
            qs.append(CombinedTermQuery(((0, 1.0), (1, w)),
                                        rng.choice(pool + ["spark"])))
        else:
            # new kind SHOULD-composed beside a plain scoring term
            qs.append(BooleanQuery([
                (SHOULD, SpanOrQuery(0, (rng.choice(pool), rng.choice(pool)))),
                (SHOULD, TermQuery(0, rng.choice(pool))),
            ]))
    return qs


def _rand_multiterm(rng, pool):
    """A random multi-term node whose expansion does real work: prefixes
    / wildcards / fuzzies derived from REAL corpus tokens (plus the odd
    dead prefix for the EmptyQuery path)."""
    base = rng.choice(pool)
    kind = rng.randrange(4)
    if kind == 0:
        cut = rng.randint(1, max(1, len(base) - 1))
        return PrefixQuery(0, base[:cut] if rng.random() < 0.9 else "zzzz")
    if kind == 1:
        cut = rng.randint(1, max(1, len(base) - 1))
        return WildcardQuery(0, base[:cut] + "*")
    if kind == 2 and len(base) >= 4:
        # one substitution typo keeps real matches reachable at dist 1-2
        i = rng.randrange(1, len(base))
        typo = base[:i] + ("x" if base[i] != "x" else "y") + base[i + 1:]
        return FuzzyQuery(0, typo, max_dist=rng.choice((1, 2)))
    cut = rng.randint(1, max(1, len(base) - 1))
    return PrefixQuery(0, base[:cut], max_expansions=rng.choice((1, 2, 5)))


def _gen_span_queries(pdf, n=40, seed=17):
    """Random span_first / span_not / span_multi shapes over real
    corpus tokens — the union-kernel + rewrite paths added this round."""
    rng = random.Random(seed)
    toks0 = [d.lower().split() for d in pdf["content"].head(30)]
    pool = sorted({t for doc in toks0 for t in doc if t.isalnum() and len(t) >= 3})
    noise = ["zzznope", "qqq"]
    qs = []
    for _ in range(n):
        kind = rng.randrange(4)
        if kind == 0:
            qs.append(SpanMultiQuery(
                _rand_multiterm(rng, pool),
                boost=round(rng.uniform(0.5, 2.0), 3),
            ))
        elif kind == 1:
            term = (
                SpanMultiQuery(_rand_multiterm(rng, pool))
                if rng.random() < 0.5
                else tuple(
                    rng.choice(pool if rng.random() < 0.85 else noise)
                    for _ in range(rng.randint(1, 3))
                )
            )
            qs.append(SpanFirstQuery(0, term, rng.randint(1, 12)))
        elif kind == 2:
            term = (
                SpanMultiQuery(_rand_multiterm(rng, pool))
                if rng.random() < 0.5
                else rng.choice(pool)
            )
            excl = tuple(
                SpanMultiQuery(_rand_multiterm(rng, pool))
                if rng.random() < 0.4
                else rng.choice(pool + noise)
                for _ in range(rng.randint(1, 2))
            )
            qs.append(SpanNotQuery(
                0, term, excl, pre=rng.randint(0, 2), post=rng.randint(0, 2)
            ))
        else:
            # SHOULD-composed beside a plain term (batch/boolean path)
            qs.append(BooleanQuery([
                (SHOULD, SpanFirstQuery(
                    0, SpanMultiQuery(_rand_multiterm(rng, pool)),
                    rng.randint(2, 8),
                )),
                (SHOULD, TermQuery(0, rng.choice(pool))),
            ]))
    return qs


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_new_kinds_rank_and_score_identity(spark, fuzz_index, scorer):
    idx, oracle, pdf = fuzz_index
    paths = pdf["path"].tolist()
    fails = []
    for qi, q in enumerate(_gen_queries(pdf)):
        res, _ = search(spark, idx, q, limit=None, scorer=scorer)
        rows = attach_docmap(spark, idx, res).select("path", "score").collect()
        got = sorted([(r["path"], r["score"]) for r in rows],
                     key=lambda t: (-t[1], t[0]))
        exp = sorted(
            [(paths[d], s) for d, s in oracle.search(q, limit=None, scorer=scorer)],
            key=lambda t: (-t[1], t[0]),
        )
        if [p for p, _ in got] != [p for p, _ in exp]:
            fails.append((qi, q, "rank", got[:3], exp[:3]))
            continue
        for (p1, s1), (_, s2) in zip(got, exp):
            if s1 != pytest.approx(s2, rel=1e-9):
                fails.append((qi, q, "score", p1, s1, s2))
                break
    assert not fails, fails[:3]


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_span_union_kinds_rank_and_score_identity(spark, fuzz_index, scorer):
    """span_first / span_not / span_multi differential fuzz: the oracle
    expands multi-term nodes with its OWN dictionary enumeration (regex /
    edit-distance over plain dicts) and evaluates spans with per-doc
    position-list loops — independent of the engine's range-scan
    expansion and doc*BIG+pos searchsorted kernels."""
    idx, oracle, pdf = fuzz_index
    paths = pdf["path"].tolist()
    fails = []
    for qi, q in enumerate(_gen_span_queries(pdf)):
        res, _ = search(spark, idx, q, limit=None, scorer=scorer)
        rows = attach_docmap(spark, idx, res).select("path", "score").collect()
        got = sorted([(r["path"], r["score"]) for r in rows],
                     key=lambda t: (-t[1], t[0]))
        exp = sorted(
            [(paths[d], s) for d, s in oracle.search(q, limit=None, scorer=scorer)],
            key=lambda t: (-t[1], t[0]),
        )
        if [p for p, _ in got] != [p for p, _ in exp]:
            fails.append((qi, q, "rank", got[:3], exp[:3]))
            continue
        for (p1, s1), (_, s2) in zip(got, exp):
            if s1 != pytest.approx(s2, rel=1e-9):
                fails.append((qi, q, "score", p1, s1, s2))
                break
    assert not fails, fails[:3]
