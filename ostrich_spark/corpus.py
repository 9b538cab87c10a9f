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
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    vocab = np.array(VOCAB, dtype=object)
    # zipf-ish weights -> realistic skew: few very common terms
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    weights = 1.0 / ranks
    weights /= weights.sum()
    for i in range(n_rows):
        r, s = i % 20 // 4, i % 20
        repo = f"org{r:02d}/repo{s:03d}"
        ext, lang = _EXT_LANG[i % len(_EXT_LANG)]
        path = f"src/pkg{i % 7}/mod{i % 13}/file{i}.{ext}"
        commit = hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]
        n_tok = int(rng.integers(50, 400))
        toks = list(rng.choice(vocab, size=n_tok, p=weights))
        # sprinkle: repeats (tf>1), a rare term for ~10% of docs
        if i % 10 == 0:
            toks.append(_RARE[i // 10 % len(_RARE)])
        if i % 3 == 0:
            toks.extend(["merge_policy", "merge_policy"])
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(" ".join(toks))
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def corpus_df(spark, n_rows: int, seed: int = 42, partitions: int = 4):
    pdf = make_corpus(n_rows, seed)
    return spark.createDataFrame(pdf).repartition(partitions)
