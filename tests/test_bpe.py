"""Real merge-based BPE token counting (ostrich_spark/bpe.py).

Hand-computed goldens pin the merge semantics (the oracle-match gate
alone can't catch a same-wrong-formula-both-sides bug for sketch/hash
style operators — see tests/test_dedup_quality.py for the same policy),
then a Spark end-to-end run is compared against a pure-Python reference
computed independently."""

import re

import pandas as pd

from ostrich_spark.bpe import (
    SPACE_MARK,
    encode,
    encode_len,
    load_merges,
    real_bpe_token_counts,
)

# tiny hand-auditable table: rank order matters
TINY = [("t", "h"), ("th", "e"), ("h", "e"), ("l", "l")]
TINY_RANKS = {p: i for i, p in enumerate(TINY)}


def test_hand_computed_tiny_table():
    # 'the': (t,h)->th, (th,e)->the => 1 token
    assert encode("the", TINY_RANKS) == ["the"]
    # 'hello': best present pair is (h,e) rank 2 -> [he,l,l,o]; then (l,l)
    assert encode("hello", TINY_RANKS) == ["he", "ll", "o"]
    # 'that': (t,h) -> [th,a,t]; no pair (th,a)/(a,t) in table
    assert encode("that", TINY_RANKS) == ["th", "a", "t"]
    # untouched piece
    assert encode_len("xyz", TINY_RANKS) == 3
    assert encode_len("x", TINY_RANKS) == 1


def test_leftmost_lowest_rank_order():
    # both (a,b) and (c,d) present; (c,d) has lower rank -> merged first,
    # and overlapping 'aaa' merges leftmost-greedily
    ranks = {("c", "d"): 0, ("a", "b"): 1, ("a", "a"): 2}
    assert encode("abcd", ranks) == ["ab", "cd"]
    assert encode("aaa", ranks) == ["aa", "a"]


def test_pinned_fixture_goldens():
    merges = load_merges()
    assert len(merges) == 64
    ranks = {p: i for i, p in enumerate(merges)}
    # goldens computed by hand against the committed fixture
    assert encode(SPACE_MARK + "merge", ranks) == [SPACE_MARK, "merge"]
    assert encode("key", ranks) == ["key"]
    # an out-of-vocabulary-ish piece stays near character granularity
    assert encode_len(SPACE_MARK + "zzz", ranks) == 4


def _py_reference_counts(texts, merges):
    """Independent recount: Python-re pre-tokenizer + same merge rule."""
    pat = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\s a-zA-Z0-9]+")
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for t in texts:
        pieces = [p.replace(" ", SPACE_MARK) for p in pat.findall(t)]
        out.append((len(pieces), sum(encode_len(p, ranks) for p in pieces)))
    return out


def test_spark_end_to_end_matches_python_reference(spark):
    texts = [
        "the merge policy scans fast rows",
        "hash join value table",
        "key",
        "",
        "customer order line window sort batch",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    merges = load_merges()
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_bpe_tokens"])
        for r in real_bpe_token_counts(spark.createDataFrame(pdf)).collect()
    }
    want = _py_reference_counts(texts, merges)
    for i, w in enumerate(want):
        assert got[i] == w, f"doc {i}: {got[i]} != {w}"
    # the merged count is a genuinely different number than the piece
    # count (the r2 proxy) on multi-char words — proves merges ran
    assert got[0][1] != got[0][0]


def test_custom_merge_table_passthrough(spark):
    pdf = pd.DataFrame({"doc_id": [0], "text": ["hello the"]})
    # table keyed on marked pieces: 'hello' + 'Ġthe'
    merges = [("t", "h"), ("h", "e"), ("l", "l"), (SPACE_MARK, "th")]
    rows = real_bpe_token_counts(spark.createDataFrame(pdf), merges=merges).collect()
    # pieces: 'hello' -> [he,ll,o]=3 ; 'Ġthe' -> (t,h)->[Ġ,th,e] -> (Ġ,th)->[Ġth,e]=2
    assert rows[0]["n_pieces"] == 2
    assert rows[0]["n_bpe_tokens"] == 5
