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


# --- round-3 additions: shingle / ascii_fold / char filters ----------------


def test_shingle_bigrams_with_unigrams():
    from ostrich_spark.analysis import Analyzer, ShingleFilter

    a = Analyzer("sh2", (ShingleFilter(2, 2),))
    assert a.analyze_one("the quick brown fox") == [
        "the", "the quick", "quick", "quick brown", "brown", "brown fox", "fox",
    ]


def test_shingle_sizes_2_to_3_lucene_emission_order():
    from ostrich_spark.analysis import Analyzer, ShingleFilter

    a = Analyzer("sh23", (ShingleFilter(2, 3),))
    # at each position: unigram, then shingles by increasing size
    assert a.analyze_one("a1 b2 c3 d4") == [
        "a1", "a1 b2", "a1 b2 c3",
        "b2", "b2 c3", "b2 c3 d4",
        "c3", "c3 d4",
        "d4",
    ]


def test_shingle_no_unigrams_custom_separator():
    from ostrich_spark.analysis import Analyzer, ShingleFilter

    a = Analyzer("shx", (ShingleFilter(2, 2, "_", output_unigrams=False),))
    assert a.analyze_one("one two three") == ["one_two", "two_three"]
    assert a.analyze_one("single") == []


def test_shingle_never_crosses_doc_boundaries():
    import pandas as pd

    from ostrich_spark.analysis import Analyzer, ShingleFilter

    a = Analyzer("shb", (ShingleFilter(2, 3),))
    s = pd.Series(["alpha beta", "gamma delta", "", "zeta"])
    got = a.analyze_series(s).tolist()
    assert got[0] == ["alpha", "alpha beta", "beta"]
    assert got[1] == ["gamma", "gamma delta", "delta"]
    assert got[2] == [] and got[3] == ["zeta"]
    assert not any("beta gamma" in t for doc in got for t in doc)


def test_shingle_arrow_matches_python_property():
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from ostrich_spark.analysis import Analyzer, ShingleFilter

    a = Analyzer("shp", (ShingleFilter(2, 3),))
    word = st.text(alphabet="abc xyz0", max_size=24)

    @settings(max_examples=80, deadline=None)
    @given(st.lists(word, min_size=1, max_size=6))
    def check(texts):
        s = pd.Series(texts)
        assert a.analyze_series(s).tolist() == a._analyze_series_py(s).tolist()

    check()


def test_shingle_validation():
    import pytest

    from ostrich_spark.analysis import ShingleFilter

    with pytest.raises(ValueError):
        ShingleFilter(1, 2)
    with pytest.raises(ValueError):
        ShingleFilter(3, 2)


def test_ascii_fold_goldens():
    from ostrich_spark.analysis import Analyzer, ascii_fold

    assert ascii_fold("crème") == "creme"
    assert ascii_fold("brûlée") == "brulee"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("øre") == "ore"
    assert ascii_fold("næv") == "naev"
    # no ASCII equivalent -> pass through, never dropped
    assert ascii_fold("日本語") == "日本語"
    a = Analyzer("fold", ("ascii_fold",))
    assert a.analyze_one("Crème Brûlée") == ["creme", "brulee"]
    assert a.analyze_one("Crème Brûlée") == a._analyze_one_py("Crème Brûlée")


def test_html_strip_tags_and_entities():
    from ostrich_spark.analysis import Analyzer, HtmlStripCharFilter

    a = Analyzer("hs", (), (HtmlStripCharFilter(),))
    got = a.analyze_one('<p class="x">Hello&nbsp;<b>world</b> &amp; fish&lt;3</p>')
    assert got == ["hello", "world", "fish", "3"]
    # tags become SPACES: adjacent words don't weld
    assert a.analyze_one("a<br>b") == ["a", "b"]
    assert a.analyze_one("a<br>b") == a._analyze_one_py("a<br>b")


def test_pattern_replace_char_filter():
    from ostrich_spark.analysis import Analyzer, PatternReplaceCharFilter

    a = Analyzer("pr", (), (PatternReplaceCharFilter(r"\d+", " num "),))
    assert a.analyze_one("abc 123 x9y") == ["abc", "num", "x", "num", "y"]
    assert a.analyze_one("abc 123 x9y") == a._analyze_one_py("abc 123 x9y")


def test_new_filters_spec_roundtrip():
    from ostrich_spark.analysis import (
        Analyzer,
        HtmlStripCharFilter,
        PatternReplaceCharFilter,
        ShingleFilter,
        analyzer_from_spec,
        analyzer_spec,
    )

    a = Analyzer(
        "combo",
        (ShingleFilter(2, 3, "_", False), "ascii_fold"),
        (HtmlStripCharFilter(), PatternReplaceCharFilter(r"\d+", "N")),
    )
    b = analyzer_from_spec("combo", analyzer_spec(a))
    text = "<i>Crème 42</i> brûlée house"
    assert b.analyze_one(text) == a.analyze_one(text)
    assert a.analyze_one(text) == a._analyze_one_py(text)


def test_shingle_index_end_to_end_phrase_as_single_term(spark, tmp_path):
    """The classic shingle use: index bigrams so a PHRASE becomes ONE
    term lookup — no positions needed, no intersection. Also proves the
    self-describing manifest carries the shingle spec (a fresh reader
    reconstructs the analyzer from the index alone)."""
    from ostrich_spark.analysis import (
        _REGISTRY,
        Analyzer,
        ShingleFilter,
        register_analyzer,
    )
    from ostrich_spark.build import build_index
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import attach_docmap, search
    from ostrich_spark.query.parser import TermQuery
    from ostrich_spark.schema import Schema

    register_analyzer(Analyzer("shingle2", (ShingleFilter(2, 2),)))
    docs = [
        (0, "merge policy drives segment selection"),
        (1, "the policy merge order differs"),
        (2, "merge policy tuning"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    s = Schema()
    s.add_text_field("text", "shingle2")
    d = str(tmp_path / "shidx")
    build_index(spark, df, s, d, num_partitions=1, order_col="id",
                id_cols=["id"], build_id="sh")
    mf = load_manifest(d)
    fe = mf.schema.field_by_name("text")
    # the bigram IS a dictionary term: docs 0 and 2 match, doc 1 (both
    # words present, wrong order) does not
    res, _ = search(spark, d, TermQuery(fe.id, "merge policy"), limit=None,
                    manifest=mf)
    ids = sorted(
        r["id"] for r in attach_docmap(spark, d, res, manifest=mf)
        .select("id").collect()
    )
    assert ids == [0, 2]
    # self-describing: wipe the registration, reload from the manifest
    del _REGISTRY["shingle2"]
    mf2 = load_manifest(d)
    res2, _ = search(spark, d, TermQuery(fe.id, "merge policy"), limit=None,
                     manifest=mf2)
    assert res2.count() == 2


# --- round-3 session-6: length / truncate / unique / protected stem -------


def test_length_filter_goldens_and_bounds():
    from ostrich_spark.analysis import Analyzer, LengthFilter
    import pytest as _pt

    a = Analyzer("len24", (LengthFilter(2, 4),))
    # both bounds INCLUSIVE (the ES contract)
    assert a.analyze_one("a bb cccc ddddd ee") == ["bb", "cccc", "ee"]
    with _pt.raises(ValueError, match="min_length"):
        LengthFilter(5, 2)


def test_truncate_filter_goldens():
    from ostrich_spark.analysis import Analyzer, TruncateFilter
    import pytest as _pt

    a = Analyzer("tr3", (TruncateFilter(3),))
    # counts/positions unchanged, strings capped at 3 codepoints
    assert a.analyze_one("abcdef gh ijkl") == ["abc", "gh", "ijk"]
    with _pt.raises(ValueError, match=">= 1"):
        TruncateFilter(0)


def test_unique_filter_per_doc_not_global():
    import pandas as pd

    from ostrich_spark.analysis import Analyzer, UniqueFilter

    a = Analyzer("uniq", (UniqueFilter(),))
    # first occurrence kept, order preserved
    assert a.analyze_one("b a b c a b") == ["b", "a", "c"]
    # dedupe is PER DOCUMENT: the same term reappears in the next doc
    out = a.analyze_series(pd.Series(["x y x", "x z", "", "y y"])).tolist()
    assert out == [["x", "y"], ["x", "z"], [], ["y"]]


def test_protected_stem_filter():
    from ostrich_spark.analysis import Analyzer, StemFilter

    a = Analyzer("pstem", (StemFilter(["maps"]),))
    # 'maps' protected verbatim; 'mapping' still stems
    assert a.analyze_one("maps mapping serious") == ["maps", "map", "seriou"]
    # empty protected set == the plain "stem" filter
    b = Analyzer("stem0", (StemFilter(()),))
    c = Analyzer("plain", ("stem",))
    t = "having confidence in serious viruses"
    assert b.analyze_one(t) == c.analyze_one(t)


def test_session6_filters_arrow_python_parity():
    import pandas as pd

    from ostrich_spark.analysis import (
        Analyzer,
        LengthFilter,
        StemFilter,
        TruncateFilter,
        UniqueFilter,
    )

    texts = pd.Series([
        "a bb cccc ddddd maps mapping",
        "b a b c a b x" * 3,
        "",
        "unique unique tokens tokens here",
    ])
    for fs in (
        (LengthFilter(2, 4),),
        (TruncateFilter(3),),
        (UniqueFilter(),),
        (StemFilter(["maps"]),),
        (LengthFilter(2, 6), UniqueFilter(), TruncateFilter(4)),
    ):
        a = Analyzer("combo6", fs)
        assert a.analyze_series(texts).tolist() == (
            a._analyze_series_py(texts).tolist()
        )


def test_session6_filters_spec_roundtrip():
    from ostrich_spark.analysis import (
        Analyzer,
        LengthFilter,
        StemFilter,
        TruncateFilter,
        UniqueFilter,
        analyzer_from_spec,
        analyzer_spec,
    )

    a = Analyzer(
        "combo6rt",
        (LengthFilter(2, 8), UniqueFilter(), StemFilter(["maps"]),
         TruncateFilter(5)),
    )
    b = analyzer_from_spec("combo6rt", analyzer_spec(a))
    t = "a maps mapping serious serious confidence xx"
    assert b.analyze_one(t) == a.analyze_one(t)
    assert analyzer_spec(b) == analyzer_spec(a)


def test_unique_filter_index_collapses_tf(spark, tmp_path):
    """End-to-end: a unique-filtered field scores tf=1 however often the
    term repeats — the field-as-set contract."""
    from ostrich_spark.analysis import (
        _REGISTRY,
        Analyzer,
        UniqueFilter,
        register_analyzer,
    )
    from ostrich_spark.build import build_index
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import attach_docmap, search
    from ostrich_spark.schema import Schema

    register_analyzer(Analyzer("uniq_e2e", (UniqueFilter(),)))
    docs = [(0, "spark spark spark merge"), (1, "spark merge")]
    df = spark.createDataFrame(docs, "id long, text string")
    s = Schema()
    s.add_text_field("text", "uniq_e2e")
    d = str(tmp_path / "uidx")
    build_index(spark, df, s, d, num_partitions=1, order_col="id",
                id_cols=["id"], build_id="uq")
    mf = load_manifest(d)
    res, _ = search(spark, d, "text:spark", limit=None, manifest=mf)
    rows = attach_docmap(spark, d, res, manifest=mf).select(
        "id", "score").collect()
    scores = {r["id"]: r["score"] for r in rows}
    assert scores[0] == scores[1]  # tf collapsed to 1 in both
    del _REGISTRY["uniq_e2e"]
