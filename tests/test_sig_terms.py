"""significant_terms: term-level facet over a query's match set.

EXTENSION — the reference's collectors return docs/counts only
(/root/reference/reader/search.go:21-66). Oracle here is a pure-Python
recount over the same analyzer output: fg = matching docs containing
the term, bg = committed doc_freq.
"""

from collections import Counter

import pandas as pd
import pytest

from ostrich_spark.analysis import get_analyzer
from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.query.exec import attach_docmap, search, significant_terms
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "content": "spark join shuffle merge"},
    {"k": 1, "content": "spark window aggregate"},
    {"k": 2, "content": "join join broadcast spark"},
    {"k": 3, "content": "merge policy segment"},
    {"k": 4, "content": "window frame rows spark join"},
    {"k": 5, "content": "tokenize analyze stem"},
    {"k": 6, "content": "spark spark spark"},
    {"k": 7, "content": "broadcast shuffle window"},
]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sig") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), _schema(), path,
        num_partitions=3, order_col="k", id_cols=["k"],
    )
    return path


def _oracle(query_match_ks):
    an = get_analyzer("default")
    fg, bg = Counter(), Counter()
    for d in DOCS:
        terms = set(an.analyze_one(d["content"]))
        for t in terms:
            bg[t] += 1
            if d["k"] in query_match_ks:
                fg[t] += 1
    return sorted((t, fg[t], bg[t]) for t in fg)


def _match_ks(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    return {r["k"] for r in attach_docmap(spark, idx, res).select("k").collect()}


def _engine(spark, idx, q, **kw):
    st = significant_terms(spark, idx, q, "content", **kw)
    return sorted(
        (r["term"], r["n_docs"], r["doc_freq"]) for r in st.collect()
    )


def test_sig_terms_matches_recount(spark, idx):
    q = "content:spark"
    assert _engine(spark, idx, q) == _oracle(_match_ks(spark, idx, q))


def test_sig_terms_boolean_query(spark, idx):
    q = "content:spark AND content:join"
    assert _engine(spark, idx, q) == _oracle(_match_ks(spark, idx, q))


def test_sig_terms_min_doc_count(spark, idx):
    q = "content:spark"
    full = _oracle(_match_ks(spark, idx, q))
    expected = sorted(t for t in full if t[1] >= 2)
    assert _engine(spark, idx, q, min_doc_count=2) == expected


def test_sig_terms_unknown_field_raises(spark, idx):
    with pytest.raises(ValueError):
        significant_terms(spark, idx, "content:spark", "nope")


def test_sig_terms_tombstones_shrink_fg_not_bg(spark, idx, tmp_path):
    import shutil

    tomb = str(tmp_path / "tomb")
    shutil.copytree(idx, tomb)
    victims = spark.createDataFrame([(2,), (4,)], "k long")
    assert delete_docs(spark, tomb, victims, ["k"]) == 2
    q = "content:spark"
    got = _engine(spark, tomb, q)
    # fg recount over the post-delete match set; bg = committed stats,
    # frozen until purge (same contract as scoring doc_freq)
    an = get_analyzer("default")
    ks = _match_ks(spark, tomb, q)
    assert ks == {0, 1, 6}
    fg = Counter()
    for d in DOCS:
        if d["k"] in ks:
            for t in set(an.analyze_one(d["content"])):
                fg[t] += 1
    bg = Counter()
    for d in DOCS:
        for t in set(an.analyze_one(d["content"])):
            bg[t] += 1
    assert got == sorted((t, fg[t], bg[t]) for t in fg)
