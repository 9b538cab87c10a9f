"""Train the pinned BPE merge table committed at
ostrich_spark/fixtures/bpe_merges.txt.

Standard byte-pair-encoding training (Sennrich et al. 2016, the public
algorithm GPT-2's tokenizer uses): pre-tokenize the training corpus with
the engine's lookahead-free GPT-2-style pattern, represent each piece as
a character sequence (space mapped to 'Ġ', U+0120, the public GPT-2
convention so merge-table lines stay space-separated), then repeatedly
merge the most frequent adjacent pair. Ties break lexicographically on
(left, right) so the table is bit-reproducible.

Run once; the output fixture is committed. Re-running on the same
training parquet reproduces the identical file.

Usage: python tools/train_bpe.py [n_merges] [training_parquet]
"""

from __future__ import annotations

import collections
import os
import re
import sys

# mirror of textops.BPE_ISH_PATTERN with Python-re-compatible classes
# (stdlib re has no \p{L}; the training corpus is ASCII so [a-zA-Z]
# / [0-9] are exact here — the runtime Spark/DuckDB sides keep \p{L}).
PY_PIECE_PATTERN = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\s a-zA-Z0-9]+"
)

SPACE_MARK = "Ġ"  # 'Ġ'


def piece_freqs(texts):
    freqs = collections.Counter()
    for t in texts:
        for p in PY_PIECE_PATTERN.findall(t or ""):
            freqs[p.replace(" ", SPACE_MARK)] += 1
    return freqs


def train(freqs: collections.Counter, n_merges: int) -> list[tuple[str, str]]:
    words = {w: list(w) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = collections.Counter()
        for w, toks in words.items():
            f = freqs[w]
            for a, b in zip(toks, toks[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        # most frequent; ties lexicographic on the pair for determinism
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, toks in words.items():
            i, out = 0, []
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            words[w] = out
    return merges


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    src = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/testdata/sf0.001/documents.parquet"
    )
    import duckdb

    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM read_parquet('{src}') ORDER BY doc_id")
        .fetchall()
    ]
    merges = train(piece_freqs(texts), n_merges)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ostrich_spark",
        "fixtures",
        "bpe_merges.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write("#version: ostrich_spark bpe fixture (trained on sf0.001 documents)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
