"""BlendedTermQuery / parse_cross_fields (ES multi_match
type=cross_fields, Lucene BlendedTermQuery — EXTENSION; the reference
has single-field terms only, /root/reference/query/parser.go).

The contract: the query text analyzes ONCE; each token is looked up in
EVERY field with a BLENDED document frequency — idf(max df across the
group) — so the same word scores comparably whichever field holds it;
per-doc combination is dismax; operator="and" requires every token in
SOME field (the first-name/last-name shape best_fields cannot express).
"""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.percolate import percolate, register_queries
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    BlendedTermQuery,
    EmptyQuery,
    QueryParseError,
    parse_cross_fields,
)
from ostrich_spark.schema import Schema

N = 10


def _schema():
    s = Schema()
    s.add_text_field("first", "default")
    s.add_text_field("last", "default")
    s.add_numeric_field("num")
    return s


DOCS = [
    # 'will' in first of docs 0-6 (df=7), in last of docs 6-7 (df=2) —
    # doc 6 has it in BOTH fields; 'smith' in last of 6-8; doc 9 nothing
    {
        "k": i,
        "first": "will here" if i < 6 else ("will other" if i == 6 else "other name"),
        "last": "will smith" if i in (6, 7) else ("smith" if i == 8 else "jones"),
        "num": i,
    }
    for i in range(N)
]


@pytest.fixture(scope="module")
def xf_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("xfidx") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), _schema(), idx,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    return idx


def _hits(spark, idx, q, **kw):
    mf = load_manifest(idx)
    df, _ = search(spark, idx, q, limit=None, manifest=mf, **kw)
    dm = attach_docmap(spark, idx, df, manifest=mf)
    return {r["k"]: r["score"] for r in dm.select("k", "score").collect()}


def _idf(df):
    return 1.0 + math.log(N / (1.0 + df))


def test_blended_idf_hand_anchor(spark, xf_idx):
    """A last-field-only hit scores with idf(max df) = idf(7), NOT its
    own field's idf(2) — the cross-field comparability contract."""
    got = _hits(spark, xf_idx, parse_cross_fields("will", _schema(), ["first", "last"]))
    assert set(got) == set(range(8))
    for k in range(8):
        # first-only (0-5), both (6, tie=0 -> pure max), last-only (7):
        # every hit scores idf(7), wherever the word lives
        assert abs(got[k] - _idf(7)) < 1e-9
    assert abs(_idf(7) - _idf(2)) > 0.1  # blending is observable


def test_tie_breaker_and_field_boost(spark, xf_idx):
    got = _hits(
        spark, xf_idx,
        parse_cross_fields("will", _schema(), {"first": 1.0, "last": 2.0},
                           tie_breaker=0.25),
    )
    b = _idf(7)
    for k in range(6):  # first-only: single matching leaf, boost 1
        assert abs(got[k] - b) < 1e-9
    assert abs(got[7] - 2 * b) < 1e-9  # last-only, boost 2
    # doc 6 matches both: max(b, 2b) + 0.25 * (3b - 2b)
    assert abs(got[6] - (2 * b + 0.25 * b)) < 1e-9


def test_operator_and(spark, xf_idx):
    """'will smith' with and: each token in SOME field — only 6, 7."""
    q = parse_cross_fields("will smith", _schema(), ["first", "last"],
                           operator="and")
    assert set(_hits(spark, xf_idx, q)) == {6, 7}
    q_or = parse_cross_fields("will smith", _schema(), ["first", "last"])
    assert set(_hits(spark, xf_idx, q_or)) == set(range(9))


def test_absent_leaf_drops_absent_everywhere_empty(spark, xf_idx):
    """'jones' exists only in last -> the first-field leaf drops and
    the single survivor still uses the blended (its own) df; a term in
    NO field yields the empty query."""
    got = _hits(spark, xf_idx, parse_cross_fields("jones", _schema(),
                                                  ["first", "last"]))
    assert set(got) == {0, 1, 2, 3, 4, 5, 9}  # docs with last=jones
    assert all(abs(s - _idf(7)) < 1e-9 for s in got.values())
    assert _hits(spark, xf_idx, parse_cross_fields("zzz", _schema(),
                                                   ["first", "last"])) == {}


def test_percolation_membership_identity(spark):
    schema = Schema()
    schema.add_text_field("first", "default")
    schema.add_text_field("last", "default")
    docs = spark.createDataFrame(
        [(i, d["first"], d["last"]) for i, d in enumerate(DOCS)],
        "doc_key long, first string, last string",
    )
    q = parse_cross_fields("will smith", schema, ["first", "last"],
                           operator="and")
    pq = register_queries({"xf": q}, schema)
    got = {r["doc_key"] for r in percolate(spark, docs, pq, schema,
                                           id_col="doc_key").collect()}
    assert got == {6, 7}


def test_validation():
    s = _schema()
    with pytest.raises(QueryParseError, match="text field"):
        parse_cross_fields("x", s, ["first", "num"])
    with pytest.raises(QueryParseError, match="operator"):
        parse_cross_fields("x", s, ["first"], operator="xor")
    with pytest.raises(QueryParseError, match=">= 1 field"):
        parse_cross_fields("x", s, [])
    with pytest.raises(QueryParseError, match=">= 1"):
        BlendedTermQuery(())
    with pytest.raises(QueryParseError, match="tie_breaker"):
        BlendedTermQuery(((0, "a", 1.0),), tie_breaker=1.5)
    s2 = Schema()
    s2.add_text_field("a", "default")
    s2.add_text_field("b", "en_stem")
    with pytest.raises(QueryParseError, match="ONE analyzer"):
        parse_cross_fields("x", s2, ["a", "b"])
    assert isinstance(parse_cross_fields("...", s, ["first"]), EmptyQuery)
