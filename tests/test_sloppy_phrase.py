"""Sloppy (proximity) phrases: NQL ``field:"a b"~N`` matches in-order
windows with span <= (k-1)+slop; tf = distinct end positions. Verified
against a brute-force positional oracle on a seeded random corpus, plus
hand-computed cases and the slop=0 == consecutive-phrase identity."""

import itertools
import random

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import PhraseQuery, parse_query
from ostrich_spark.schema import Schema

VOCAB = ["quick", "brown", "fox", "lazy", "dog"]


def _brute_sloppy(tokens: list[str], terms: list[str], slop: int) -> int:
    """tf by definition: distinct end positions q of terms[-1] admitting
    an in-order chain p1<...<pk=q with span <= (k-1)+slop."""
    pos = {t: [i for i, w in enumerate(tokens) if w == t] for t in set(terms)}
    k = len(terms)
    ends = set()
    for chain in itertools.product(*[pos.get(t, []) for t in terms]):
        if all(chain[i] < chain[i + 1] for i in range(k - 1)) and (
            chain[-1] - chain[0] <= (k - 1) + slop
        ):
            ends.add(chain[-1])
    return len(ends)


def _make_docs(n=40, seed=7):
    rng = random.Random(seed)
    return [
        {
            "doc_key": i,
            "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 12))),
        }
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def sp_index(spark, tmp_path_factory):
    docs = _make_docs()
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    idx = str(tmp_path_factory.mktemp("sloppy") / "idx")
    build_index(
        spark,
        spark.createDataFrame(docs),
        schema,
        idx,
        num_partitions=3,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    return idx, docs


def _hits(spark, idx, query):
    res, _ = search(spark, idx, query, limit=None)
    rows = attach_docmap(spark, idx, res).select("doc_key", "score").collect()
    return {r["doc_key"]: round(r["score"], 9) for r in rows}


# --- parser -----------------------------------------------------------------


def test_parse_sloppy_phrase(sp_index):
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    assert parse_query('text:"quick fox"~2', schema) == PhraseQuery(
        0, ("quick", "fox"), slop=2
    )
    # boost composes (stripped before the slop suffix is read)
    assert parse_query('text:"quick fox"~2^1.5', schema) == PhraseQuery(
        0, ("quick", "fox"), boost=1.5, slop=2
    )
    # bare sloppy phrase expands over default fields (single field here)
    assert parse_query('"quick fox"~1', schema) == PhraseQuery(
        0, ("quick", "fox"), slop=1
    )
    # plain quoted phrase is still slop=0
    assert parse_query('text:"quick fox"', schema) == PhraseQuery(0, ("quick", "fox"))


# --- hand-computed ----------------------------------------------------------


def test_sloppy_hand_cases(spark, tmp_path):
    docs = [
        {"doc_key": 0, "text": "quick brown fox"},
        {"doc_key": 1, "text": "quick fox quick lazy fox"},
        {"doc_key": 2, "text": "fox quick"},  # wrong order only
    ]
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(docs), schema, idx,
        num_partitions=1, order_col="doc_key", id_cols=["doc_key"],
    )
    # slop=0: only the adjacent occurrence in doc 1
    assert set(_hits(spark, idx, 'text:"quick fox"')) == {1}
    # slop=1: doc 0 (span 2) + doc 1 (ends at pos 1 and pos 4)
    h1 = _hits(spark, idx, 'text:"quick fox"~1')
    assert set(h1) == {0, 1}
    assert h1[1] == pytest.approx(2 * h1[0], rel=1e-12)  # tf 2 vs tf 1
    # order matters: doc 2 never matches
    assert 2 not in _hits(spark, idx, 'text:"quick fox"~5')


def test_sloppy_three_terms(spark, tmp_path):
    docs = [{"doc_key": 0, "text": "quick dog brown dog fox"}]
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(docs), schema, idx,
        num_partitions=1, order_col="doc_key", id_cols=["doc_key"],
    )
    # positions: quick=0 brown=2 fox=4 -> span 4 = (3-1)+2
    assert set(_hits(spark, idx, 'text:"quick brown fox"~2')) == {0}
    assert set(_hits(spark, idx, 'text:"quick brown fox"~1')) == set()


# --- brute-force differential ----------------------------------------------


@pytest.mark.parametrize(
    "terms,slop",
    [
        (["quick", "fox"], 0),
        (["quick", "fox"], 1),
        (["quick", "fox"], 3),
        (["fox", "dog"], 2),
        (["quick", "brown", "fox"], 0),
        (["quick", "brown", "fox"], 2),
        (["quick", "brown", "fox"], 4),
        (["dog", "dog"], 1),  # repeated constituent
    ],
)
def test_sloppy_matches_brute_force(spark, sp_index, terms, slop):
    idx, docs = sp_index
    q = 'text:"' + " ".join(terms) + '"' + (f"~{slop}" if slop else "")
    got = _hits(spark, idx, q)
    exp_tf = {
        d["doc_key"]: _brute_sloppy(d["text"].split(), terms, slop) for d in docs
    }
    exp_tf = {k: v for k, v in exp_tf.items() if v > 0}
    assert set(got) == set(exp_tf)
    # scores proportional to tf (same idf-sum factor per query)
    if exp_tf:
        base_key = min(exp_tf)
        for k in exp_tf:
            assert got[k] * exp_tf[base_key] == pytest.approx(
                got[base_key] * exp_tf[k], rel=1e-9
            )


def test_large_slop_equals_window_unbounded(spark, sp_index):
    """A slop wider than any doc = every doc with an in-order pair."""
    idx, docs = sp_index
    got = set(_hits(spark, idx, 'text:"quick fox"~50'))
    exp = {
        d["doc_key"]
        for d in docs
        if _brute_sloppy(d["text"].split(), ["quick", "fox"], 50) > 0
    }
    assert got == exp


def test_sloppy_in_batched_path(spark, sp_index):
    """search_many carries slop through the shared wire: batched results
    row-identical to the per-query path."""
    from ostrich_spark.query.exec import search_many

    idx, _ = sp_index
    queries = {
        "s1": 'text:"quick fox"~2',
        "s0": 'text:"quick fox"',
        "t": "text:dog",
    }
    batched = search_many(spark, idx, queries, limit=None).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], set()).add(
            (r["segment_id"], r["doc"], round(r["score"], 9))
        )
    for qid, q in queries.items():
        res, _ = search(spark, idx, q, limit=None)
        single = {
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in res.collect()
        }
        assert by_q.get(qid, set()) == single, qid
