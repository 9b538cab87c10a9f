"""Real merge-based BPE token counting.

Replaces the pre-tokenizer piece-count *proxy* (textops.bpe_token_counts)
with the actual byte-pair-encoding algorithm: pre-tokenize with the
engine's lookahead-free GPT-2-style pattern, then apply a pinned public
merge table (ostrich_spark/fixtures/bpe_merges.txt, GPT-2 merges.txt
format with the 'Ġ' space convention) until no adjacent pair remains in
the table. Anyone budgeting training tokens gets merged-token counts,
not piece counts.

Execution shape (100 TB posture):
- pre-tokenization stays JVM-side (``regexp_extract_all`` — whole-stage
  codegen, no Python in that step);
- merge application is an Arrow-batched pandas UDF over the pieces
  array. Pieces follow a Zipf law, so a per-batch memo dict turns the
  per-piece merge loop into a hash lookup for all but the first
  occurrence of each distinct piece — the Python cost is O(distinct
  pieces), not O(tokens);
- the merge table is a few KB captured in the UDF closure (shipped once
  per task, the same way a broadcast variable would be).

Merge application rule: repeatedly merge the LEFTMOST occurrence of the
lowest-rank adjacent pair, one merge per step. For a consistently
trained table this is step-for-step equal to the classic "merge all
occurrences of the best pair" formulation (any pair containing a merged
token was necessarily learned later, so it ranks higher), and it is the
exact rule the DuckDB recursive-CTE oracle implements — equality by
construction, not coincidence.

Reference parity note: the reference engine (k-yomo/ostrich) has no
tokenizer-budgeting surface at all; this is part of the LLM-pipeline
extension set (SURVEY.md §2).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textops import BPE_ISH_PATTERN

SPACE_MARK = "Ġ"  # 'Ġ', the public GPT-2 space-marker convention

DEFAULT_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "bpe_merges.txt"
)

_NO_PAIR = 2**31


def load_merges(path: str = DEFAULT_MERGES_PATH) -> list[tuple[str, str]]:
    """Read a GPT-2-format merges file: one 'left right' pair per line,
    rank = line order, '#'-prefixed header lines skipped."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    return merges


def encode_len(piece: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one pre-tokenizer piece (spaces already
    mapped to SPACE_MARK). Leftmost-lowest-rank merge loop."""
    toks = list(piece)
    while len(toks) > 1:
        best_rank, best_i = _NO_PAIR, -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]), _NO_PAIR)
            if r < best_rank:
                best_rank, best_i = r, i
        if best_i < 0:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return len(toks)


def encode(piece: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Full token sequence (test/debug surface; counting uses encode_len)."""
    toks = list(piece)
    while len(toks) > 1:
        best_rank, best_i = _NO_PAIR, -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]), _NO_PAIR)
            if r < best_rank:
                best_rank, best_i = r, i
        if best_i < 0:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def real_bpe_token_counts(
    df, text_col: str = "text", merges: list[tuple[str, str]] | None = None
):
    """Per-doc REAL BPE token counts: (doc_id, n_pieces, n_bpe_tokens).

    n_pieces is the pre-merge piece count (the old proxy, kept so the
    overcount the proxy suffered is visible in the same row); n_bpe_tokens
    is the merged count a real tokenizer with this table would produce.
    """
    if merges is None:
        merges = load_merges()
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.LongType())
    def merged_count(pieces_ser):
        import pandas as pd

        memo: dict[str, int] = {}
        out = []
        for pieces in pieces_ser:
            n = 0
            if pieces is not None:
                for p in pieces:
                    p = p.replace(" ", SPACE_MARK)
                    c = memo.get(p)
                    if c is None:
                        c = encode_len(p, ranks)
                        memo[p] = c
                    n += c
            out.append(n)
        return pd.Series(out, dtype="int64")

    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))
    return df.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_pieces"),
        merged_count(pieces).alias("n_bpe_tokens"),
    )
