"""Edge n-gram search-as-you-type — EXTENSION (Lucene
EdgeNGramTokenFilter / ES search_as_you_type analog; the reference's
analyzer plane has stem/stopword only,
/root/reference/analyzer/english_analyzer.go:3-8).

Design under test:
- EdgeNGramFilter expands each token into char prefixes min..max at
  INDEX time (short tokens kept whole; long tokens also emit the
  original);
- FieldEntry.search_analyzer (ES search_analyzer analog): QUERY text
  for the field analyzes with a different (non-expanding) analyzer, so
  a partial keystroke is ONE gram-term lookup — no query-time
  expansion;
- the Arrow flat path and the pure-Python path agree exactly.
"""

import pandas as pd
import pytest

from ostrich_spark.analysis import Analyzer, EdgeNGramFilter, register_analyzer
from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import TermQuery, parse_query
from ostrich_spark.schema import FieldEntry, Schema


def test_gram_goldens():
    f = EdgeNGramFilter(2, 5)
    assert f._grams("spark") == ["sp", "spa", "spar", "spark"]
    assert f._grams("streaming") == ["st", "str", "stre", "strea", "streaming"]
    assert f._grams("i") == ["i"]  # shorter than min_gram: kept whole
    assert f._grams("io") == ["io"]
    g = EdgeNGramFilter(2, 5, preserve_original=False)
    assert g._grams("streaming") == ["st", "str", "stre", "strea"]
    with pytest.raises(ValueError, match="min_gram"):
        EdgeNGramFilter(0, 5)
    with pytest.raises(ValueError, match="min_gram"):
        EdgeNGramFilter(6, 5)


def test_flat_equals_python_path():
    a = Analyzer("t_sayt", (EdgeNGramFilter(1, 4),))
    texts = ["Spark Streaming", "naïve café ß", "", "a b_c 42", None]
    flat = a.analyze_series(pd.Series(texts)).tolist()
    py = [a._analyze_one_py("" if t is None else t) for t in texts]
    assert flat == py
    # duplicate tokens expand once per instance
    assert a.analyze_one("go go") == ["g", "go", "g", "go"]


def _sayt_schema():
    register_analyzer(Analyzer("sayt25", (EdgeNGramFilter(2, 5),)))
    s = Schema()
    s.add_text_field("title", "sayt25", search_analyzer="default")
    return s


DOCS = [
    {"k": 0, "title": "spark streaming"},
    {"k": 1, "title": "sparse matrix spark"},
    {"k": 2, "title": "spotless kitchen"},
    {"k": 3, "title": "stream processing"},
]


@pytest.fixture(scope="module")
def sayt_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sayt") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        _sayt_schema(),
        idx,
        num_partitions=2,
        order_col="k",
        id_cols=["k"],
    )
    return idx


def _hits(spark, idx, q):
    mf = load_manifest(idx)
    res, _ = search(spark, idx, q, limit=None, manifest=mf, scorer="tfidf")
    return {
        r["k"]: r["score"]
        for r in attach_docmap(spark, idx, res, manifest=mf).collect()
    }


def test_query_is_single_term_not_expanded(sayt_idx):
    """search_analyzer=default: the typed prefix stays ONE term — the
    query plan does not edge-ngram the input."""
    mf = load_manifest(sayt_idx)
    q = parse_query("title:spar", mf.schema)
    assert q == TermQuery(0, "spar")
    # and multi-token input analyzes per-WORD (union of 2 terms), never
    # per-prefix (which would be 4+8 gram terms here)
    from ostrich_spark.query.parser import BooleanQuery

    q2 = parse_query("title:Spark_Stream", mf.schema)
    assert isinstance(q2, BooleanQuery)
    assert [t.term for _, t in q2.subqueries] == ["spark", "stream"]


def test_prefix_keystrokes_match(spark, sayt_idx):
    import math

    # "spar" is a gram of spark (docs 0,1) and sparse (doc 1): tf 1,2
    got = _hits(spark, sayt_idx, "title:spar")
    assert set(got) == {0, 1}
    idf = 1.0 + math.log(4 / (1.0 + 2))
    assert got[0] == pytest.approx(1 * idf, rel=1e-12)
    assert got[1] == pytest.approx(2 * idf, rel=1e-12)
    # "spo" only the kitchen doc
    assert set(_hits(spark, sayt_idx, "title:spo")) == {2}
    # "st" hits streaming (doc 0) and stream (doc 3)
    assert set(_hits(spark, sayt_idx, "title:st")) == {0, 3}


def test_full_word_still_matches_via_preserve_original(spark, sayt_idx):
    # "streaming" (9 chars > max_gram 5) is preserved as itself
    assert set(_hits(spark, sayt_idx, "title:streaming")) == {0}
    # a word longer than max_gram with no doc match
    assert _hits(spark, sayt_idx, "title:sparkling") == {}


def test_search_analyzer_roundtrips_manifest(sayt_idx):
    mf = load_manifest(sayt_idx)
    fe = mf.schema.field_by_name("title")
    assert fe.analyzer == "sayt25"
    assert fe.search_analyzer == "default"
    assert fe.query_analyzer == "default"


def test_search_analyzer_json_backcompat():
    # manifests written before the field existed load with "" (= index
    # analyzer), and schema equality/extends still hold
    old = FieldEntry.from_json(
        {"id": 0, "name": "t", "type": "text", "analyzer": "default",
         "positions": False, "store": False}
    )
    assert old.search_analyzer == "" and old.query_analyzer == "default"
    new = Schema([old])
    cur = Schema()
    cur.add_text_field("t", "default")
    assert cur.extends(new) and new.extends(cur)


def test_manifest_carries_analyzer_spec(spark, sayt_idx):
    """Self-describing index: the edge-ngram chain round-trips through
    the manifest and auto-registers on load — a fresh reader process
    needs no out-of-band register_analyzer call."""
    import ostrich_spark.analysis as an

    mf = load_manifest(sayt_idx)
    assert "sayt25" in mf.analyzers
    spec = mf.analyzers["sayt25"]
    assert spec["filters"][0]["type"] == "edge_ngram"
    assert (spec["filters"][0]["min_gram"], spec["filters"][0]["max_gram"]) == (2, 5)
    # simulate a fresh process: drop the registration, reload, search
    saved = an._REGISTRY.pop("sayt25")
    try:
        mf2 = load_manifest(sayt_idx)
        assert "sayt25" in an._REGISTRY
        got = an.get_analyzer("sayt25")
        assert got.analyze_one("spark") == saved.analyze_one("spark")
        # queries parse and run against the auto-registered chain
        res, _ = search(spark, sayt_idx, "title:spar", limit=None, manifest=mf2)
        assert res.count() > 0
    finally:
        an._REGISTRY["sayt25"] = saved


def test_analyzer_spec_roundtrip_synonym_and_errors():
    from ostrich_spark.analysis import (
        Analyzer,
        SynonymFilter,
        analyzer_from_spec,
        analyzer_spec,
    )

    a = Analyzer("syn", (SynonymFilter({"k8s": "kubernetes"}), "stem", "stopword"))
    b = analyzer_from_spec("syn", analyzer_spec(a))
    assert b.analyze_one("K8s having the") == a.analyze_one("K8s having the")

    class Opaque:
        def apply_tokens(self, toks):  # pragma: no cover
            return toks

    with pytest.raises(ValueError, match="not serializable"):
        analyzer_spec(Analyzer("x", (Opaque(),)))
    with pytest.raises(KeyError, match="unknown analyzer filter"):
        analyzer_from_spec("x", {"filters": [{"type": "nope"}]})
