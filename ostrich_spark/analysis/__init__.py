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

import numpy as np
import pandas as pd

from .porter2 import stem

try:  # Arrow-native fast path (utf8_lower + RE2 split, C++ side)
    import pyarrow as pa
    import pyarrow.compute as pc

    _ARROW_OK = hasattr(pc, "split_pattern_regex") and hasattr(pc, "utf8_lower")
except ImportError:  # pragma: no cover
    _ARROW_OK = False

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


def _lower_tokenize_flat(texts) -> "tuple[pa.Array, np.ndarray]":
    """Arrow-native lowercase + tokenize over a batch of texts.

    Returns (flat_tokens, lens): all tokens of all docs concatenated in
    document order as an Arrow string array, plus per-doc token counts.
    Runs entirely in Arrow C++ (utf8_lower + RE2 split + filter) — no
    per-row Python, no per-doc list objects. This is the authoritative
    semantics: Arrow's simple case mapping matches the reference's Go
    strings.ToLower (/root/reference/analyzer/lower_case_char_filter.go:11)
    exactly (non-contextual final sigma, İ→i), where Python str.lower()
    deviates on a handful of codepoints.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts  # char-filtered upstream (already large_string)
    elif isinstance(texts, pd.Series):
        vals = texts.fillna("").astype(str)
        arr = pa.array(vals, type=pa.large_string())
    else:
        arr = pa.array(
            ["" if t is None else str(t) for t in texts], type=pa.large_string()
        )
    sp = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=SPLIT_PATTERN_SQL)
    raw_lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(sp)
    mask = pc.not_equal(flat, "")
    mask_np = mask.to_numpy(zero_copy_only=False)
    bounds = np.concatenate(([0], np.cumsum(raw_lens)))
    csum = np.zeros(len(mask_np) + 1, dtype=np.int64)
    np.cumsum(mask_np, out=csum[1:])
    lens = csum[bounds[1:]] - csum[bounds[:-1]]
    return flat.filter(mask), lens


class SynonymFilter:
    """Synonym-normalizing token filter (EXTENSION — the reference has
    stem/stopword only): maps each token to its canonical form via a
    fixed table, order- and count-preserving (Lucene SynonymFilter in
    single-token replacement mode; multi-token graph expansion is NOT
    implemented — it would change token counts/positions).

    Analyzers carrying a SynonymFilter are identified by NAME in the
    index schema like any analyzer: register the same analyzer (same
    mapping) with register_analyzer before reading an index built with
    it."""

    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)

    def apply_flat(self, flat, lens):
        # normalize once per UNIQUE term, scatter back over instances
        d = flat.dictionary_encode()
        mapped = pa.array(
            [self.mapping.get(t, t) for t in d.dictionary.to_pylist()],
            type=pa.large_string(),
        )
        return mapped.take(d.indices), lens

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        return [self.mapping.get(t, t) for t in tokens]


class EdgeNGramFilter:
    """Edge n-gram token filter (EXTENSION — Lucene EdgeNGramTokenFilter
    / the index side of Elasticsearch ``search_as_you_type``): each token
    expands into its character prefixes of length ``min_gram`` to
    ``max_gram``. A token shorter than ``min_gram`` is kept whole (every
    token stays searchable); a token longer than ``max_gram`` also emits
    itself when ``preserve_original`` (so exact full-word queries still
    match). Index a field with this filter and a plain (non-expanding)
    ``search_analyzer``, and every keystroke's prefix is a SINGLE term
    lookup — no dictionary expansion at query time.

    Positions shift (one source token occupies several consecutive
    positions), so phrase queries over an edge-gram field are not
    meaningful — use the parallel source field for phrases, like ES
    subfields."""

    def __init__(self, min_gram: int = 1, max_gram: int = 10,
                 preserve_original: bool = True):
        if not (1 <= min_gram <= max_gram):
            raise ValueError(
                f"need 1 <= min_gram <= max_gram, got {min_gram}/{max_gram}"
            )
        self.min_gram = int(min_gram)
        self.max_gram = int(max_gram)
        self.preserve_original = bool(preserve_original)

    def _grams(self, t: str) -> list[str]:
        n = len(t)
        if n < self.min_gram:
            return [t]
        out = [t[:k] for k in range(self.min_gram, min(n, self.max_gram) + 1)]
        if n > self.max_gram and self.preserve_original:
            out.append(t)
        return out

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        return [g for t in tokens for g in self._grams(t)]

    def apply_flat(self, flat, lens):
        # expand once per UNIQUE term (vocabulary-sized Python work, like
        # stemming), then scatter the gram runs back over instances with
        # one vectorized take — no per-token Python on the hot path
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        gram_lists = [self._grams(t) for t in uniq]
        counts = np.fromiter((len(g) for g in gram_lists), dtype=np.int64,
                             count=len(gram_lists))
        flat_uniq = pa.array(
            [g for gl in gram_lists for g in gl], type=pa.large_string()
        )
        offsets = np.concatenate(([0], np.cumsum(counts)))
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        inst_counts = counts[idx]
        total = int(inst_counts.sum())
        starts = np.concatenate(([0], np.cumsum(inst_counts)))[:-1]
        # position within each instance's gram run: 0..inst_counts[i]-1
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, inst_counts)
        take = np.repeat(offsets[idx], inst_counts) + within
        new_flat = flat_uniq.take(pa.array(take, type=pa.int64()))
        bounds = np.concatenate(([0], np.cumsum(lens)))
        csum = np.concatenate(([0], np.cumsum(inst_counts)))
        new_lens = csum[bounds[1:]] - csum[bounds[:-1]]
        return new_flat, new_lens


_ASCII_FOLD_SUPPLEMENT = str.maketrans({
    # common Latin letters NFKD does NOT decompose (Lucene
    # ASCIIFoldingFilter folds these too)
    "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ß": "ss", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
})


def ascii_fold(token: str) -> str:
    """Fold a token to its ASCII skeleton: NFKD-decompose, drop combining
    marks, then the supplement table for non-decomposable Latin letters
    (ø, æ, ß, ...) — the useful core of Lucene's ASCIIFoldingFilter.
    Characters with no ASCII equivalent (CJK, Cyrillic, ...) pass through
    unchanged rather than being dropped: folding must never delete
    information it cannot transliterate."""
    import unicodedata

    decomposed = unicodedata.normalize("NFKD", token)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped.translate(_ASCII_FOLD_SUPPLEMENT)


class ShingleFilter:
    """Word-shingle token filter (EXTENSION — Lucene ShingleFilter / the
    ES ``shingle`` filter): emits word n-grams of ``min_size`` to
    ``max_size`` consecutive tokens joined by ``separator`` (Lucene
    default " "), plus the unigrams themselves when ``output_unigrams``.
    Emission order is Lucene's position order: at each source position,
    the unigram first, then shingles by increasing size.

    Like EdgeNGramFilter, one source position emits several tokens, so
    phrase queries over a shingled field are not meaningful — shingles
    exist precisely so PHRASES become single-term lookups (index-time
    phrase optimization, the classic shingle use)."""

    def __init__(self, min_size: int = 2, max_size: int = 2,
                 separator: str = " ", output_unigrams: bool = True):
        if not (2 <= min_size <= max_size):
            raise ValueError(
                f"need 2 <= min_size <= max_size, got {min_size}/{max_size}"
            )
        self.min_size = int(min_size)
        self.max_size = int(max_size)
        self.separator = str(separator)
        self.output_unigrams = bool(output_unigrams)

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        out = []
        n = len(tokens)
        for i in range(n):
            if self.output_unigrams:
                out.append(tokens[i])
            for k in range(self.min_size, self.max_size + 1):
                if i + k <= n:
                    out.append(self.separator.join(tokens[i : i + k]))
        return out

    def apply_flat(self, flat, lens):
        """Vectorized shingling over the flat token array: per size k,
        ONE element-wise Arrow join of k shifted slices, cross-doc
        starts masked by numpy doc-id comparison; the per-position
        emission order is reassembled with a single argsort+take. No
        per-token Python."""
        n = len(flat)
        if n == 0:
            return flat, lens
        lens = np.asarray(lens, dtype=np.int64)
        doc_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pieces: list = []   # pa arrays to concatenate
        keys: list = []     # emission order: start_index * B + slot
        B = self.max_size + 2
        if self.output_unigrams:
            pieces.append(flat)
            keys.append(np.arange(n, dtype=np.int64) * B)
        for k in range(self.min_size, self.max_size + 1):
            if n < k:
                continue
            m = n - k + 1
            joined = pc.binary_join_element_wise(
                *[flat.slice(j, m) for j in range(k)],
                pa.scalar(self.separator, type=pa.large_string()),
            )
            valid = np.nonzero(doc_id[:m] == doc_id[k - 1 :])[0]
            if len(valid) == 0:
                continue
            pieces.append(joined.take(pa.array(valid, type=pa.int64())))
            keys.append(valid * B + (k - self.min_size + 1))
        if not pieces:
            return flat.slice(0, 0), np.zeros(len(lens), dtype=np.int64)
        all_keys = np.concatenate(keys)
        order = np.argsort(all_keys, kind="stable")
        combined = pa.concat_arrays(
            [p.cast(pa.large_string()) for p in pieces]
        ).take(pa.array(order, type=pa.int64()))
        # new per-doc counts: unigrams (L) + sum over k of max(0, L-k+1)
        new_lens = lens * (1 if self.output_unigrams else 0)
        for k in range(self.min_size, self.max_size + 1):
            new_lens = new_lens + np.maximum(lens - (k - 1), 0)
        return combined, new_lens


def _mask_filter(flat, lens, mask):
    """Drop tokens where ``mask`` is False, recomputing per-doc lengths
    (the stopword-filter math, shared by every dropping filter)."""
    mask_np = mask.to_numpy(zero_copy_only=False)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    csum = np.zeros(len(mask_np) + 1, dtype=np.int64)
    np.cumsum(mask_np, out=csum[1:])
    new_lens = csum[bounds[1:]] - csum[bounds[:-1]]
    return flat.filter(mask), new_lens


class LengthFilter:
    """Length token filter (EXTENSION — Lucene LengthFilter / the ES
    ``length`` filter): keeps tokens whose CHARACTER length is within
    ``[min_length, max_length]`` (both inclusive, the ES contract —
    ``utf8_length`` counts codepoints like Python ``len``). The classic
    uses: drop single-letter noise (min 2) or unbounded garbage runs
    (max 64) before they bloat the dictionary."""

    def __init__(self, min_length: int = 0, max_length: int = 255):
        if not (0 <= min_length <= max_length):
            raise ValueError(
                f"need 0 <= min_length <= max_length, "
                f"got {min_length}/{max_length}"
            )
        self.min_length = int(min_length)
        self.max_length = int(max_length)

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        return [
            t for t in tokens if self.min_length <= len(t) <= self.max_length
        ]

    def apply_flat(self, flat, lens):
        n = pc.utf8_length(flat)
        mask = pc.and_(
            pc.greater_equal(n, pa.scalar(self.min_length)),
            pc.less_equal(n, pa.scalar(self.max_length)),
        )
        return _mask_filter(flat, lens, mask)


class TruncateFilter:
    """Truncate token filter (EXTENSION — Lucene TruncateTokenFilter /
    the ES ``truncate`` filter, default length 10): hard-caps every
    token at ``length`` characters (codepoints). Token counts and
    positions are unchanged — only the strings shrink."""

    def __init__(self, length: int = 10):
        if length < 1:
            raise ValueError(f"truncate length must be >= 1, got {length}")
        self.length = int(length)

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        return [t[: self.length] for t in tokens]

    def apply_flat(self, flat, lens):
        return pc.utf8_slice_codeunits(flat, 0, self.length), lens


class UniqueFilter:
    """Unique token filter (EXTENSION — the ES ``unique`` filter with
    ``only_on_same_position=false``, its default): per DOCUMENT, keeps
    only the FIRST occurrence of each distinct token — the order-
    preserving dedupe that turns a field into a set (tf collapses to
    0/1, the classic pairing with keyword-ish relevance)."""

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        return list(dict.fromkeys(tokens))

    def apply_flat(self, flat, lens):
        n = len(flat)
        if n == 0:
            return flat, lens
        lens = np.asarray(lens, dtype=np.int64)
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # first occurrence of each (doc, term) pair: np.unique returns
        # the index of the FIRST hit of every distinct key
        key = doc * np.int64(len(d.dictionary)) + codes
        _, first = np.unique(key, return_index=True)
        mask_np = np.zeros(n, dtype=bool)
        mask_np[first] = True
        return _mask_filter(flat, lens, pa.array(mask_np))


class StemFilter:
    """Snowball stemmer with a PROTECTED keyword set — the Lucene/ES
    ``keyword_marker`` + stemmer pair fused into one stage (EXTENSION;
    flat pipelines carry plain strings, not flagged token objects, so
    the marker fuses into its consumer — the observable semantics are
    identical: a protected token passes the stemmer verbatim, exact
    match after lowercasing). ``StemFilter(())`` ≡ the plain ``"stem"``
    filter. The classic use: brand/domain words the stemmer would
    mangle (``StemFilter(["maps"])`` keeps ``maps`` while ``mapping``
    still stems to ``map``)."""

    def __init__(self, protected=()):
        self.protected = frozenset(str(t) for t in protected)

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        return [t if t in self.protected else stem(t) for t in tokens]

    def apply_flat(self, flat, lens):
        d = flat.dictionary_encode()
        stemmed = pa.array(
            [
                t if t in self.protected else stem(t)
                for t in d.dictionary.to_pylist()
            ],
            type=pa.large_string(),
        )
        return stemmed.take(d.indices), lens


class HtmlStripCharFilter:
    """HTML-strip char filter (EXTENSION — Lucene HTMLStripCharFilter /
    ES ``html_strip``): drops tags (replaced by a space so adjacent
    words don't weld together) and decodes the common named entities
    (&amp; &lt; &gt; &quot; &apos; &#39; &nbsp;). Numeric entities
    beyond those are left as-is (the tokenizer splits them away);
    documented subset, not a full HTML5 entity table."""

    _ENTITIES = (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    )

    def apply_text(self, text: str) -> str:
        import re

        out = re.sub(r"<[^>]*>", " ", text)
        for ent, ch in self._ENTITIES:
            out = out.replace(ent, ch)
        return out

    def apply_array(self, arr: "pa.Array") -> "pa.Array":
        out = pc.replace_substring_regex(arr, pattern="<[^>]*>", replacement=" ")
        for ent, ch in self._ENTITIES:
            out = pc.replace_substring(out, pattern=ent, replacement=ch)
        return out


class PatternReplaceCharFilter:
    """Regex-replace char filter (EXTENSION — the ES ``pattern_replace``
    char filter): every match of ``pattern`` in the raw text becomes
    ``replacement`` BEFORE tokenization. RE2 syntax (the Arrow kernel);
    the pure-Python fallback uses ``re``, which accepts the same core
    syntax."""

    def __init__(self, pattern: str, replacement: str = ""):
        self.pattern = str(pattern)
        self.replacement = str(replacement)

    def apply_text(self, text: str) -> str:
        import re

        return re.sub(self.pattern, self.replacement, text)

    def apply_array(self, arr: "pa.Array") -> "pa.Array":
        return pc.replace_substring_regex(
            arr, pattern=self.pattern, replacement=self.replacement
        )


def _apply_char_filters(texts, char_filters):
    """Run char filters over raw texts; returns the same container kind
    (pa.Array in the Arrow path, list/Series otherwise)."""
    if not char_filters:
        return texts
    if _ARROW_OK:
        arr = texts if isinstance(texts, pa.Array) else pa.array(
            [("" if t is None else str(t)) for t in texts], type=pa.large_string()
        )
        for cf in char_filters:
            arr = cf.apply_array(arr)
        return arr
    out = [("" if t is None else str(t)) for t in texts]
    for cf in char_filters:
        out = [cf.apply_text(t) for t in out]
    return out


def _filter_flat(flat, lens, token_filter):
    """Apply one token filter to the flat representation."""
    if isinstance(token_filter, (SynonymFilter, EdgeNGramFilter, ShingleFilter, LengthFilter, TruncateFilter, UniqueFilter, StemFilter)):
        return token_filter.apply_flat(flat, lens)
    if token_filter == "ascii_fold":
        d = flat.dictionary_encode()
        folded = pa.array(
            [ascii_fold(t) for t in d.dictionary.to_pylist()],
            type=pa.large_string(),
        )
        # fold once per UNIQUE term, scatter back (the stem pattern)
        return folded.take(d.indices), lens
    if token_filter == "stem":
        d = flat.dictionary_encode()
        stemmed = pa.array(
            [stem(t) for t in d.dictionary.to_pylist()], type=pa.large_string()
        )
        # stem once per UNIQUE term, then scatter back over instances
        return stemmed.take(d.indices), lens
    if token_filter == "stopword":
        mask = pc.invert(
            pc.is_in(flat, value_set=pa.array(STOPWORDS, type=pa.large_string()))
        )
        mask_np = mask.to_numpy(zero_copy_only=False)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        csum = np.zeros(len(mask_np) + 1, dtype=np.int64)
        np.cumsum(mask_np, out=csum[1:])
        new_lens = csum[bounds[1:]] - csum[bounds[:-1]]
        return flat.filter(mask), new_lens
    raise KeyError(f"unknown token filter {token_filter!r}")  # pragma: no cover


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

    def __init__(self, name: str, token_filters: tuple = (),
                 char_filters: tuple = ()):
        self.name = name
        self.token_filters = token_filters
        # char filters run over the RAW text before lowercase+tokenize
        # (the Lucene char-filter stage): HtmlStripCharFilter,
        # PatternReplaceCharFilter
        self.char_filters = tuple(char_filters)

    def analyze_one(self, text: str) -> list[str]:
        if _ARROW_OK:
            flat, _ = self.analyze_flat([text])
            return flat.to_pylist()
        return self._analyze_one_py(text)

    def _analyze_one_py(self, text: str) -> list[str]:
        text = str(text)
        for cf in self.char_filters:
            text = cf.apply_text(text)
        toks = [t for t in _SPLIT_RE.split(text.lower()) if t]
        for f in self.token_filters:
            if isinstance(f, (SynonymFilter, EdgeNGramFilter, ShingleFilter, LengthFilter, TruncateFilter, UniqueFilter, StemFilter)):
                toks = f.apply_tokens(toks)
            elif f == "stem":
                toks = stem_tokens(toks)
            elif f == "stopword":
                toks = stopword_filter_tokens(toks)
            elif f == "ascii_fold":
                toks = [ascii_fold(t) for t in toks]
            else:  # pragma: no cover
                raise KeyError(f"unknown token filter {f!r}")
        return toks

    def analyze_flat(self, texts) -> "tuple":
        """Batch analyze -> (flat_tokens: pa.Array, lens: np.int64 array).

        The hot path for the segment builder: zero per-doc Python
        objects. Falls back to the pure-Python chain when pyarrow lacks
        the compute kernels.
        """
        if not _ARROW_OK:  # pragma: no cover - pyarrow is baked in
            toks = self._analyze_series_py(
                texts if isinstance(texts, pd.Series) else pd.Series(list(texts))
            )
            lens = toks.map(len).to_numpy(dtype=np.int64)
            flat = [t for lst in toks for t in lst]
            import pyarrow as _pa

            return _pa.array(flat, type=_pa.large_string()), lens
        flat, lens = _lower_tokenize_flat(
            _apply_char_filters(texts, self.char_filters)
        )
        for f in self.token_filters:
            flat, lens = _filter_flat(flat, lens, f)
        return flat, lens

    def analyze_series(self, texts: pd.Series) -> pd.Series:
        """Vectorized: Series[str] -> Series[list[str]]."""
        if not _ARROW_OK:  # pragma: no cover
            return self._analyze_series_py(texts)
        flat, lens = self.analyze_flat(texts)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        la = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)
        index = texts.index if isinstance(texts, pd.Series) else None
        return pd.Series(la.to_pylist(), index=index)

    def _analyze_series_py(self, texts: pd.Series) -> pd.Series:
        if self.char_filters:
            texts = texts.fillna("").astype(str)
            for cf in self.char_filters:
                texts = texts.map(cf.apply_text)
        toks = tokenize_series(lowercase_series(texts))
        for f in self.token_filters:
            if isinstance(f, (SynonymFilter, EdgeNGramFilter, ShingleFilter, LengthFilter, TruncateFilter, UniqueFilter, StemFilter)):
                toks = toks.map(f.apply_tokens)
            elif f == "stem":
                toks = toks.map(stem_tokens)
            elif f == "stopword":
                toks = toks.map(stopword_filter_tokens)
            elif f == "ascii_fold":
                toks = toks.map(lambda ts: [ascii_fold(t) for t in ts])
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


# --- analyzer serialization (self-describing indexes) ----------------------
# Custom analyzers (synonym tables, edge n-grams) are identified by NAME
# in the schema; serializing their filter chain into the index manifest
# lets any reader reconstruct them without out-of-band registration.

BUILTIN_ANALYZERS = ("default", "en_stem")


def analyzer_spec(a: Analyzer) -> dict:
    """JSON-serializable spec of an analyzer's filter chain. Raises
    ValueError for a filter type that cannot round-trip (the caller then
    falls back to name-only identification, the pre-spec behavior)."""
    filters: list = []
    for f in a.token_filters:
        if isinstance(f, SynonymFilter):
            filters.append({"type": "synonym", "mapping": dict(f.mapping)})
        elif isinstance(f, EdgeNGramFilter):
            filters.append({
                "type": "edge_ngram",
                "min_gram": f.min_gram,
                "max_gram": f.max_gram,
                "preserve_original": f.preserve_original,
            })
        elif isinstance(f, ShingleFilter):
            filters.append({
                "type": "shingle",
                "min_size": f.min_size,
                "max_size": f.max_size,
                "separator": f.separator,
                "output_unigrams": f.output_unigrams,
            })
        elif isinstance(f, LengthFilter):
            filters.append({
                "type": "length",
                "min_length": f.min_length,
                "max_length": f.max_length,
            })
        elif isinstance(f, TruncateFilter):
            filters.append({"type": "truncate", "length": f.length})
        elif isinstance(f, UniqueFilter):
            filters.append({"type": "unique"})
        elif isinstance(f, StemFilter):
            filters.append({
                "type": "stem_protected",
                "protected": sorted(f.protected),
            })
        elif f in ("stem", "stopword", "ascii_fold"):
            filters.append(f)
        else:
            raise ValueError(
                f"analyzer {a.name!r}: filter {f!r} is not serializable"
            )
    char_filters: list = []
    for cf in getattr(a, "char_filters", ()):
        if isinstance(cf, HtmlStripCharFilter):
            char_filters.append({"type": "html_strip"})
        elif isinstance(cf, PatternReplaceCharFilter):
            char_filters.append({
                "type": "pattern_replace",
                "pattern": cf.pattern,
                "replacement": cf.replacement,
            })
        else:
            raise ValueError(
                f"analyzer {a.name!r}: char filter {cf!r} is not serializable"
            )
    spec = {"filters": filters}
    if char_filters:
        spec["char_filters"] = char_filters
    return spec


def analyzer_from_spec(name: str, spec: dict) -> Analyzer:
    fs: list = []
    for f in spec.get("filters", []):
        if isinstance(f, str):
            fs.append(f)
        elif f.get("type") == "synonym":
            fs.append(SynonymFilter(f["mapping"]))
        elif f.get("type") == "edge_ngram":
            fs.append(EdgeNGramFilter(
                f["min_gram"], f["max_gram"], f.get("preserve_original", True)
            ))
        elif f.get("type") == "shingle":
            fs.append(ShingleFilter(
                f["min_size"], f["max_size"], f.get("separator", " "),
                f.get("output_unigrams", True),
            ))
        elif f.get("type") == "length":
            fs.append(LengthFilter(f["min_length"], f["max_length"]))
        elif f.get("type") == "truncate":
            fs.append(TruncateFilter(f["length"]))
        elif f.get("type") == "unique":
            fs.append(UniqueFilter())
        elif f.get("type") == "stem_protected":
            fs.append(StemFilter(f.get("protected", ())))
        else:
            raise KeyError(f"unknown analyzer filter spec {f!r}")
    cfs: list = []
    for cf in spec.get("char_filters", []):
        if cf.get("type") == "html_strip":
            cfs.append(HtmlStripCharFilter())
        elif cf.get("type") == "pattern_replace":
            cfs.append(PatternReplaceCharFilter(cf["pattern"], cf.get("replacement", "")))
        else:
            raise KeyError(f"unknown analyzer char-filter spec {cf!r}")
    return Analyzer(name, tuple(fs), tuple(cfs))


def ensure_registered(specs: dict) -> None:
    """Register manifest-carried analyzer specs that are absent from the
    process registry. An existing registration wins (the user may have
    registered the same name deliberately; same-config is the normal
    case) — manifests only fill gaps."""
    for name, spec in specs.items():
        if name not in _REGISTRY:
            register_analyzer(analyzer_from_spec(name, spec))
