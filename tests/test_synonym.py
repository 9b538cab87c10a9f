"""SynonymFilter: synonym-normalizing token filter (EXTENSION — the
reference's analyzer plane has stem/stopword only,
/root/reference/analyzer/*)."""

import pandas as pd
import pytest

from ostrich_spark.analysis import Analyzer, SynonymFilter, register_analyzer
from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema

MAPPING = {"colour": "color", "grey": "gray", "analyse": "analyze"}


@pytest.fixture(scope="module")
def syn_analyzer():
    an = Analyzer("test_syn", (SynonymFilter(MAPPING),))
    register_analyzer(an)
    return an


def test_analyze_arrow_and_py_agree(syn_analyzer):
    text = "The Colour grey and COLOR: analyse_this"
    want = ["the", "color", "gray", "and", "color", "analyze", "this"]
    assert syn_analyzer.analyze_one(text) == want
    assert syn_analyzer._analyze_one_py(text) == want
    got = syn_analyzer.analyze_series(pd.Series([text, "grey colour"]))
    assert list(got) == [want, ["gray", "color"]]


def test_flat_counts_preserved(syn_analyzer):
    flat, lens = syn_analyzer.analyze_flat(["colour grey", "", "plain words"])
    assert list(lens) == [2, 0, 2]
    assert flat.to_pylist() == ["color", "gray", "plain", "words"]


def test_chain_with_stopword(spark):
    an = Analyzer("test_syn_stop", (SynonymFilter({"teh": "the"}), "stopword"))
    register_analyzer(an)
    # typo-normalized THEN stopword-removed
    assert an.analyze_one("teh quick fox") == ["quick", "fox"]


def test_end_to_end_search_both_directions(spark, tmp_path, syn_analyzer):
    docs = [
        {"k": 0, "content": "the colour of water"},
        {"k": 1, "content": "color theory basics"},
        {"k": 2, "content": "grey skies"},
        {"k": 3, "content": "nothing relevant"},
    ]
    s = Schema()
    s.add_text_field("content", "test_syn")
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=2, order_col="k", id_cols=["k"],
    )

    def ks(q):
        res, _ = search(spark, idx, q, limit=None)
        return sorted(
            r["k"] for r in attach_docmap(spark, idx, res).select("k").collect()
        )

    # canonical query matches variant docs; variant query normalizes too
    assert ks("content:color") == [0, 1]
    assert ks("content:colour") == [0, 1]
    assert ks("content:gray") == [2]
    assert ks("content:grey") == [2]
