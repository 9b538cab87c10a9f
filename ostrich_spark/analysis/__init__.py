"""Text analysis pipeline — PySpark-native re-expression of ostrich's
analyzer plane (/root/reference/analyzer/*).

Ostrich semantics reproduced exactly:

- LowerCaseCharFilter (lower_case_char_filter.go:11-13): unicode lowercase
  of the whole text.
- SimpleTokenizer (simple_tokenizer.go:12-16): split on any rune that is
  NOT a unicode letter or number. NOTE: ``_`` is a separator (unlike regex
  ``\\w``).
- StopWordTokenFilter (stopword_token_filter.go:7-19): drop the 10
  hardcoded stopwords, order/duplicate-preserving.
- StemmingTokenFilter (stemming_token_filter.go:9-15): snowball English.
- EnglishAnalyzer (english_analyzer.go:3-8): lowercase -> tokenize ->
  **stem THEN stopword** (quirky order preserved: "having"->"have" is then
  removed; "this"->"thi" survives).
- "default" analyzer (analyzer.go:9-14): lowercase + tokenize only.

All functions are vectorized over pandas Series (Arrow batches); stemming
memoizes per unique token. No per-row Python in the Spark hot path — these
run inside pandas UDF / mapInPandas stages.
"""

from __future__ import annotations

import pandas as pd

from .porter2 import stem

# Token characters are exactly unicode Letter|Number (ostrich's
# unicode.IsLetter/IsNumber). Python's `re` \W includes _ as a word char,
# so we use an explicit character-class split.
try:
    import regex

    _SPLIT_RE = regex.compile(r"[^\p{L}\p{N}]+")
except ImportError:  # pragma: no cover - regex module is commonly present
    import re
    import sys
    import unicodedata

    # Build the same semantics with re: match runs of non-(letter|number).
    # \W in re(UNICODE) ≈ [^\w] where \w = [letters digits _]; we must also
    # split on '_'.
    _SPLIT_RE = re.compile(r"[\W_]+", re.UNICODE)

STOPWORDS = ("a", "and", "be", "have", "i", "in", "of", "that", "the", "to")
_STOPSET = frozenset(STOPWORDS)

# The exact split pattern for Spark SQL (Java regex) and DuckDB (RE2) —
# all three dialects support \p{L} / \p{N}.
SPLIT_PATTERN_SQL = r"[^\p{L}\p{N}]+"


def lowercase_series(texts: pd.Series) -> pd.Series:
    """A1: unicode lowercase (vectorized)."""
    return texts.fillna("").astype(str).str.lower()


def tokenize_series(texts: pd.Series) -> pd.Series:
    """A2: split on non-letter/number runs; drop empties. Returns Series of lists."""
    def _tok(t: str) -> list[str]:
        return [tok for tok in _SPLIT_RE.split(t) if tok]

    return texts.fillna("").astype(str).map(_tok)


def stopword_filter_tokens(tokens: list[str]) -> list[str]:
    """A3: order/dup-preserving stopword removal."""
    return [t for t in tokens if t not in _STOPSET]


def stem_tokens(tokens: list[str]) -> list[str]:
    """A4: snowball English stem per token (memoized via lru_cache)."""
    return [stem(t) for t in tokens]


class Analyzer:
    """A5/A6: composable analyzer = char filters -> tokenizer -> token filters.

    Mirrors /root/reference/analyzer/analyzer.go:64-73.
    """

    def __init__(self, name: str, token_filters: tuple[str, ...] = ()):
        self.name = name
        self.token_filters = token_filters

    def analyze_one(self, text: str) -> list[str]:
        toks = [t for t in _SPLIT_RE.split(str(text).lower()) if t]
        for f in self.token_filters:
            if f == "stem":
                toks = stem_tokens(toks)
            elif f == "stopword":
                toks = stopword_filter_tokens(toks)
            else:  # pragma: no cover
                raise KeyError(f"unknown token filter {f!r}")
        return toks

    def analyze_series(self, texts: pd.Series) -> pd.Series:
        """Vectorized: Series[str] -> Series[list[str]]."""
        toks = tokenize_series(lowercase_series(texts))
        for f in self.token_filters:
            if f == "stem":
                toks = toks.map(stem_tokens)
            elif f == "stopword":
                toks = toks.map(stopword_filter_tokens)
            else:  # pragma: no cover
                raise KeyError(f"unknown token filter {f!r}")
        return toks


# A6: registry (analyzer/analyzer.go:5-32). "default" = lowercase+tokenize.
# "en_stem" = EnglishAnalyzer: stem BEFORE stopword (english_analyzer.go:3-8).
_REGISTRY: dict[str, Analyzer] = {
    "default": Analyzer("default"),
    "en_stem": Analyzer("en_stem", ("stem", "stopword")),
}


def get_analyzer(name: str) -> Analyzer:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"analyzer {name!r} is not registered") from None


def register_analyzer(analyzer: Analyzer) -> None:
    _REGISTRY[analyzer.name] = analyzer
