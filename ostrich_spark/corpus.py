"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Iceberg-shaped table of source files: (repo, path, commit, lang, content),
seed-pinned (default 42), no wall clock. Exercises: '_' as a token
separator, unicode letters, mixed case, tf>1 repeats, rare vs common
terms, ostrich's 10 stopwords.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_EXT_LANG = [("go", "go"), ("py", "py"), ("rs", "rs"), ("java", "java"), ("ts", "ts")]

_KEYWORDS = [
    "func", "def", "return", "import", "package", "class", "struct", "interface",
    "let", "const", "var", "impl", "match", "async", "await", "pub", "fn",
]
_IDENTS = [
    "parse_query", "IndexWriter", "segment_reader", "doc_id", "TermQuery",
    "postings_list", "merge_policy", "BM25Scorer", "tokenStream", "fieldNorm",
    "commitLog", "shard_router", "heap_limit", "byteBuffer", "checksum",
    "walk_tree", "emit_token", "GarbageCollector", "LruCache", "retry_backoff",
]
_COMMENT_WORDS = [
    # includes ostrich's 10 stopwords: a and be have i in of that the to
    "a", "and", "be", "have", "i", "in", "of", "that", "the", "to",
    "search", "index", "query", "term", "document", "score", "ranking",
    "serious", "outcome", "rubber", "road", "test", "hat", "wire",
    "naïve", "café", "東京", "straße",
]
_NUMBERS = ["0", "1", "42", "1024", "65535", "3141592"]
_RARE = [f"rareterm{i:03d}" for i in range(50)]

VOCAB = _KEYWORDS + _IDENTS + _COMMENT_WORDS + _NUMBERS


def make_corpus(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Vectorized generation — fast enough for the 60k+-row bench corpus."""
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB, dtype=object)
    # zipf-ish weights -> realistic skew: few very common terms
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    weights = 1.0 / ranks
    weights /= weights.sum()

    i = np.arange(n_rows)
    repos = [f"org{(j % 20) // 4:02d}/repo{j % 20:03d}" for j in i]
    exts = [_EXT_LANG[j % len(_EXT_LANG)] for j in i]
    paths = [f"src/pkg{j % 7}/mod{j % 13}/file{j}.{e[0]}" for j, e in zip(i, exts)]
    langs = [e[1] for e in exts]
    commits = [
        hashlib.sha256(f"{r}:{p}".encode()).hexdigest()[:40] for r, p in zip(repos, paths)
    ]

    n_tok = rng.integers(50, 400, size=n_rows)
    total = int(n_tok.sum())
    flat = rng.choice(vocab, size=total, p=weights)
    bounds = np.concatenate(([0], np.cumsum(n_tok)))
    contents = []
    for j in range(n_rows):
        toks = flat[bounds[j] : bounds[j + 1]]
        extra = []
        # sprinkle: repeats (tf>1), a rare term for ~10% of docs
        if j % 10 == 0:
            extra.append(_RARE[j // 10 % len(_RARE)])
        if j % 3 == 0:
            extra.extend(["merge_policy", "merge_policy"])
        contents.append(" ".join(toks.tolist() + extra))
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def corpus_df(spark, n_rows: int, seed: int = 42, partitions: int = 4):
    pdf = make_corpus(n_rows, seed)
    return spark.createDataFrame(pdf).repartition(partitions)
