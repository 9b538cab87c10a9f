"""FIXTURES.md §3 generated-query coverage over the synthetic corpus:
rare/common terms, stopword-only, absent terms, AND of rare+common,
OR fan-out >=4, nested parens, field-vs-bare asymmetry, offset
pagination, multi-field en_stem, multi-valued fields."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.corpus import make_corpus
from ostrich_spark.oracle import OracleIndex
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema


@pytest.fixture(scope="module")
def two_field_index(spark, tmp_path_factory):
    """Corpus with an en_stem comment field + default code field."""
    tmp = tmp_path_factory.mktemp("gen")
    pdf = make_corpus(200, seed=21)
    # derive a second field with stemmable English
    comments = [
        f"having serious confidence in the outcome {i} searching indexes quickly"
        if i % 3 == 0
        else f"decided situations are tested only in {i} seconds"
        for i in range(len(pdf))
    ]
    pdf = pdf.assign(comment=comments)
    schema = Schema()
    schema.add_text_field("content", "default")
    schema.add_text_field("comment", "en_stem")
    idx = str(tmp / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), schema, idx,
        num_partitions=4, order_col="path", id_cols=["path"], build_id="gen",
    )
    oracle = OracleIndex(
        schema, [{"content": c, "comment": m} for c, m in zip(pdf["content"], pdf["comment"])]
    )
    return idx, oracle, pdf["path"].tolist()


GENERATED_QUERIES = [
    "content:rareterm003",                       # rare term
    "content:the",                               # common term
    "comment:the",                               # stopword under en_stem -> empty
    "content:zzz_absent_zzz",                    # absent term
    "content:rareterm003 AND content:the",       # AND rare+common (ordering)
    "content:search OR content:index OR content:query OR content:term",  # fanout
    "((content:func OR content:def) AND (content:search OR content:term))",  # nested
    "comment:serious",                           # en_stem: seriou
    "comment:searching",                         # stem: search
    "serious",                                   # bare, unanalyzed, both fields
    "comment:confidence content:merge_policy",   # implicit OR across fields
    "comment:having",                            # stems to stopword 'have' -> empty
]


@pytest.mark.parametrize("q", GENERATED_QUERIES)
@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_generated_rank_identity(spark, two_field_index, q, scorer):
    idx, oracle, paths = two_field_index
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("path", "score").collect()
    got = sorted([(r["path"], r["score"]) for r in rows], key=lambda t: (-t[1], t[0]))
    exp = sorted(
        [(paths[d], s) for d, s in oracle.search(q, limit=None, scorer=scorer)],
        key=lambda t: (-t[1], t[0]),
    )
    assert [p for p, _ in got] == [p for p, _ in exp], q
    for (p1, s1), (p2, s2) in zip(got, exp):
        assert s1 == pytest.approx(s2, rel=1e-12), (q, p1)


def test_offset_pagination_identity(spark, two_field_index):
    idx, oracle, paths = two_field_index
    # page through a fanout query 5 at a time; engine order must page
    # consistently (no duplicates/gaps across pages)
    seen = []
    for off in range(0, 20, 5):
        res, _ = search(spark, idx, "content:search OR content:index", limit=5, offset=off)
        seen.extend((r["segment_ord"], r["doc"]) for r in res.collect())
    assert len(seen) == len(set(seen)) == 20
    full, _ = search(spark, idx, "content:search OR content:index", limit=20, offset=0)
    assert [(r["segment_ord"], r["doc"]) for r in full.collect()] == seen


def test_multi_valued_field(spark, tmp_path):
    """Repeated field values: token streams concatenated
    (schema/document.go:20-46)."""
    schema = Schema()
    schema.add_text_field("tags", "default")
    docs = [
        {"tags": ["alpha beta", "gamma"], "k": 0},
        {"tags": ["beta"], "k": 1},
        {"tags": ["delta", "alpha", "alpha"], "k": 2},
    ]
    df = spark.createDataFrame([{"k": d["k"], "tags": d["tags"]} for d in docs])
    idx = str(tmp_path / "idx")
    build_index(spark, df, schema, idx, num_partitions=1, order_col="k",
                id_cols=["k"], build_id="mv")
    oracle = OracleIndex(schema, [{"tags": d["tags"]} for d in docs])
    for q in ("tags:alpha", "tags:beta AND tags:gamma", "tags:alpha OR tags:delta"):
        res, _ = search(spark, idx, q, limit=None)
        rows = attach_docmap(spark, idx, res).select("k", "score").collect()
        got = sorted([(r["k"], r["score"]) for r in rows])
        exp = sorted(oracle.search(q, limit=None))
        assert [k for k, _ in got] == [k for k, _ in exp], q
        for (k1, s1), (k2, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-12)
    # tf counts multi-value repeats: doc 2 has alpha twice
    res, _ = search(spark, idx, "tags:alpha", limit=None)
    rows = {r["k"]: r["score"] for r in attach_docmap(spark, idx, res).select("k", "score").collect()}
    assert rows[2] == pytest.approx(2 * rows[0], rel=1e-12)


def test_random_query_fuzz_rank_identity(spark, two_field_index):
    """Seeded random boolean-query fuzz (beyond the fixed list): 40
    queries of depth <=2 over present/absent/stopword terms, both
    scorers, exhaustive results, rank- AND score-identical to the
    reference-semantics oracle. A 200-query sweep of the same generator
    ran clean during round 1 (see COVERAGE.md)."""
    import random

    from ostrich_spark.analysis import get_analyzer

    idx, oracle, paths = two_field_index
    an = get_analyzer("default")
    rng = random.Random(4242)
    # term pool from the corpus itself + adversarial extras
    toks = set()
    for d, s in oracle.search("content:the", limit=None, scorer="tfidf")[:0]:
        pass  # oracle warm no-op
    pool = sorted({t for t in an.analyze_one(" ".join(paths))} )[:50] + [
        "the", "have", "serious", "searching", "zzz_absent", "rareterm003",
        "search", "index", "func", "confidence",
    ]

    def gen(depth=0):
        if depth >= 2 or rng.random() < 0.45:
            return rng.choice(["content:", "comment:", ""]) + rng.choice(pool)
        op = rng.choice([" AND ", " OR ", " "])
        parts = [gen(depth + 1) for _ in range(rng.randint(2, 3))]
        q = op.join(parts)
        return f"({q})" if rng.random() < 0.5 else q

    from ostrich_spark.query.exec import attach_docmap, search as eng_search

    for i in range(40):
        q = gen()
        scorer = "bm25" if i % 2 else "tfidf"
        res, _ = eng_search(spark, idx, q, limit=None, scorer=scorer)
        rows = attach_docmap(spark, idx, res).select("path", "score").collect()
        got = sorted([(r["path"], r["score"]) for r in rows], key=lambda t: (-t[1], t[0]))
        exp = sorted(
            [(paths[d], s) for d, s in oracle.search(q, limit=None, scorer=scorer)],
            key=lambda t: (-t[1], t[0]),
        )
        assert [p for p, _ in got] == [p for p, _ in exp], (scorer, q)
        for (p1, s1), (p2, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-12), (scorer, q, p1)


def test_random_dismax_fuzz_rank_identity(spark, two_field_index):
    """Seeded random DisMax fuzz: dismax-of-boolean children with random
    tie_breakers (0, 0.5, 1 and random), both scorers — rank- and
    score-identical (rel 1e-12) to the oracle's dismax combination."""
    import random

    from ostrich_spark.query.exec import attach_docmap, search as eng_search
    from ostrich_spark.query.parser import DisMaxQuery, parse_query
    from ostrich_spark.schema import Schema

    idx, oracle, paths = two_field_index
    schema = Schema()
    schema.add_text_field("content", "default")
    schema.add_text_field("comment", "en_stem")
    rng = random.Random(777)
    pool = [
        "content:the", "content:search", "content:index OR content:func",
        "comment:serious", "comment:searching AND comment:outcome",
        "content:rareterm003", "content:zzz_absent", "comment:having",
        "content:search AND content:term",
    ]
    for i in range(20):
        n = rng.randint(2, 4)
        kids_s = rng.sample(pool, n)
        tie = rng.choice([0.0, 0.5, 1.0, round(rng.random(), 3)])
        dm = DisMaxQuery([parse_query(s, schema) for s in kids_s], tie)
        scorer = "bm25" if i % 2 else "tfidf"
        res, _ = eng_search(spark, idx, dm, limit=None, scorer=scorer)
        rows = attach_docmap(spark, idx, res).select("path", "score").collect()
        got = sorted([(r["path"], r["score"]) for r in rows], key=lambda t: (-t[1], t[0]))
        exp = sorted(
            [(paths[d], s) for d, s in oracle.search(
                DisMaxQuery([parse_query(s, schema) for s in kids_s], tie),
                limit=None, scorer=scorer)],
            key=lambda t: (-t[1], t[0]),
        )
        assert [p for p, _ in got] == [p for p, _ in exp], (i, kids_s, tie)
        for (p1, s1), (p2, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-12), (i, p1, tie)


def test_random_boosting_blended_fuzz_rank_identity(spark, two_field_index):
    """Seeded fuzz for the two newest score shapes: BoostingQuery
    (random positive/negative boolean trees, random negative_boost) and
    BlendedTermQuery (random term/field groups, random tie/boosts) —
    rank- and score-identical (rel 1e-9) to the independent oracle on
    both scorers."""
    import random

    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import attach_docmap, search
    from ostrich_spark.query.parser import (
        BlendedTermQuery,
        BoostingQuery,
        parse_query,
    )

    idx, oracle, paths = two_field_index
    mf = load_manifest(idx)
    rng = random.Random(90210)
    words = ["the", "merge", "policy", "segment", "spark", "absent_zz",
             "index", "stream", "scorer"]

    def bool_q():
        terms = rng.sample(words, rng.randint(1, 3))
        op = rng.choice([" AND ", " OR "])
        return op.join(f"content:{t}" for t in terms)

    checked = 0
    for trial in range(24):
        scorer = ("tfidf", "bm25")[trial % 2]
        if trial % 2 == 0:
            q = BoostingQuery(
                parse_query(bool_q(), oracle.schema),
                parse_query(bool_q(), oracle.schema),
                rng.choice([0.0, 0.2, 0.5, 1.0, 1.7]),
            )
        else:
            pairs = tuple(
                (rng.randint(0, 1), rng.choice(words),
                 rng.choice([0.5, 1.0, 2.0]))
                for _ in range(rng.randint(1, 3))
            )
            q = BlendedTermQuery(pairs, rng.choice([0.0, 0.3, 1.0]))
        exp = sorted(
            [(paths[d], round(s, 9)) for d, s in
             oracle.search(q, limit=None, scorer=scorer)],
        )
        res, _ = search(spark, idx, q, limit=None, scorer=scorer, manifest=mf)
        got = sorted(
            (r["path"], round(r["score"], 9))
            for r in attach_docmap(spark, idx, res, manifest=mf)
            .select("path", "score").collect()
        )
        assert [p for p, _ in got] == [p for p, _ in exp], (trial, q)
        for (p1, s1), (p2, s2) in zip(got, exp):
            assert abs(s1 - s2) <= 1e-9 * max(1.0, abs(s2)), (trial, q, p1)
        checked += len(got)
    assert checked > 100  # the fuzz really exercised non-trivial matches
