"""Phrase suggester — whole-input did-you-mean with a noisy-channel
bigram language model (the Elasticsearch ``phrase`` suggester /
Lucene ``NoisyChannelSpellChecker`` analog; EXTENSION — the reference
has no suggest API, and :func:`ostrich_spark.query.expand.suggest_text`
is the documented per-word-greedy LITE form this module completes).

Two halves, split Spark-idiomatically:

- :func:`train_phrase_lm` builds the language model ONCE — the analog of
  ES indexing a shingle subfield next to the text field. The stored
  source of a ``store=True`` text field (the significant_text
  precondition and pattern) re-analyzes with the field's OWN analyzer in
  an Arrow-batched pass, and two partial-aggregated groupBys produce the
  unigram and bigram count tables, written range-partitioned + sorted by
  key so query-time lookups are parquet predicate-pushed point reads.
  One linear corpus pass; nothing corpus-sized touches the driver.

- :func:`phrase_suggest` answers a query — the ES coordinating-node
  model: candidate generation per input token against the index
  dictionary (the existing :func:`suggest_terms` pruned reads), TWO
  predicate-pushed parquet lookups collecting only the O(candidates²)
  counts the scorer needs, then an exact Viterbi over the candidate
  lattice driver-side (slots × candidates is tiny by construction).

Scoring is the noisy channel: ``score(seq) = Σ ln P_channel(cand_i |
token_i) + Σ ln P_lm``, with

- ``P_channel(original) = real_word_error_likelihood`` (ES default 0.95
  — the prior that what the user typed is what they meant, even when
  the term exists in the dictionary);
- ``P_channel(correction) = (1 − rwel) · (1 − dist / max(|token|,
  |cand|))`` — the misspelling mass split by edit-distance similarity
  (our exact split; ES's generator likewise weighs candidates by string
  distance, but does not document the formula — ours is stated so the
  DuckDB oracle can recompute it);
- ``P_lm``: the first token scores its unigram probability, every
  transition its smoothed bigram probability per the three ES
  ``smoothing`` models (exact semantics from the ES docs):
  ``stupid_backoff`` (default): ``count(w1 w2)/count(w1)`` when the
  bigram was seen, else ``discount · count(w2)/N`` (discount 0.4);
  ``laplace``: ``(count(w1 w2) + α)/(count(w1) + α·V)`` (α 0.5);
  ``linear_interpolation``: ``λ_bi · count(w1 w2)/count(w1) + λ_uni ·
  count(w2)/N`` (lambdas must sum to 1, the ES validation).

A path through a zero-probability state (an out-of-vocabulary original
under stupid_backoff, a channel similarity of 0) is impossible — it is
dropped, never returned with −inf. ``max_errors`` bounds how many slots
may differ from the input (ES: values > 1 are an absolute count, values
≤ 1 a fraction of the token count, ceil'd); ``confidence`` keeps only
suggestions scoring above ``confidence × score(input)`` in probability
space (log-space shift; an input with zero probability never gates).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import functions as F

from .manifest import atomic_write_json, load_manifest

MODEL_SUBDIR = "models"
SMOOTHINGS = ("stupid_backoff", "laplace", "linear_interpolation")


def _model_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, MODEL_SUBDIR, f"phrase_lm_{field}")


def _text_field(manifest, field: str):
    fe = manifest.schema.field_by_name(field)
    if fe is None or fe.is_doc_value:
        raise ValueError(f"{field!r} is not a text field of this index")
    if not fe.store:
        raise ValueError(
            f"phrase LM needs the stored source of {field!r} — index with "
            "store=True (the ES _source / significant_text precondition)"
        )
    return fe


def train_phrase_lm(
    spark,
    index_dir: str,
    field: str,
    manifest=None,
    num_partitions: int = 4,
) -> str:
    """Materialize the unigram + bigram model for ``field`` under
    ``<index_dir>/models/phrase_lm_<field>/`` (the ivf_build persisted-
    artifact pattern): ``unigrams.parquet`` (term, cnt),
    ``bigrams.parquet`` (w1, w2, cnt), ``meta.json`` (n_tokens,
    vocab_size, field, analyzer, opstamp). Built from the live
    (tombstone-excluded) stored source so the model matches what a
    fresh build over the current corpus would see; rerunning replaces
    the model atomically (tmp + rename). Returns the model dir."""
    from .analysis import get_analyzer
    from .deletes import has_tombstones, read_tombstones
    from .query.exec import read_docmap

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = _text_field(manifest, field)
    analyzer = get_analyzer(fe.analyzer)
    docmap = read_docmap(spark, index_dir, manifest).select(
        "segment_id", "doc", F.col(fe.name).alias("_src")
    )
    if has_tombstones(index_dir, manifest):
        docmap = docmap.join(
            read_tombstones(spark, index_dir, manifest),
            ["segment_id", "doc"],
            "left_anti",
        )

    def _pairs(batches):
        import pandas as pd

        for pdf in batches:
            toks_col = analyzer.analyze_series(pdf["_src"].fillna(""))
            w1, w2 = [], []
            for toks in toks_col:
                n = len(toks)
                if not n:
                    continue
                w1.extend(toks)
                w2.extend(toks[1:])
                w2.append(None)
            yield pd.DataFrame({"w1": w1, "w2": w2})

    # one exploded pass, cached for the two aggregations: every token
    # emits (token, follower-or-NULL), so unigrams = count per w1 and
    # bigrams = count per (w1, w2 NOT NULL) — both map-side partial
    pairs = docmap.select("_src").mapInPandas(
        _pairs, "w1 string, w2 string"
    )
    pairs.persist()
    try:
        uni = pairs.groupBy("w1").agg(F.count("*").alias("cnt")).select(
            F.col("w1").alias("term"), "cnt"
        )
        big = (
            pairs.filter(F.col("w2").isNotNull())
            .groupBy("w1", "w2")
            .agg(F.count("*").alias("cnt"))
        )
        tmp = tempfile.mkdtemp(
            dir=os.path.join(index_dir), prefix=".phrase_lm_tmp_"
        )
        try:
            (
                uni.repartitionByRange(num_partitions, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(tmp, "unigrams.parquet"))
            )
            (
                big.repartitionByRange(num_partitions, "w1", "w2")
                .sortWithinPartitions("w1", "w2")
                .write.mode("overwrite")
                .parquet(os.path.join(tmp, "bigrams.parquet"))
            )
            totals = uni.agg(
                F.sum("cnt").alias("n"), F.count("*").alias("v")
            ).collect()[0]
            atomic_write_json(
                os.path.join(tmp, "meta.json"),
                {
                    "field": field,
                    "analyzer": fe.analyzer,
                    "n_tokens": int(totals["n"] or 0),
                    "vocab_size": int(totals["v"] or 0),
                    "opstamp": manifest.opstamp,
                },
            )
            final = _model_dir(index_dir, field)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            os.rename(tmp, final)
        finally:
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
    finally:
        pairs.unpersist()
    return _model_dir(index_dir, field)


@dataclass(frozen=True)
class PhraseSuggestion:
    text: str
    score: float  # ln-probability of the suggested sequence
    n_errors: int  # slots where the suggestion differs from the input


def _resolve_max_errors(max_errors: float, n_tokens: int) -> int:
    if max_errors <= 0:
        raise ValueError(f"max_errors must be > 0, got {max_errors}")
    if max_errors > 1:
        return int(max_errors)
    return max(1, math.ceil(max_errors * n_tokens))


def phrase_suggest(
    spark,
    index_dir: str,
    field: str,
    text: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    min_word_length: int = 4,
    num_candidates: int = 5,
    real_word_error_likelihood: float = 0.95,
    confidence: float = 1.0,
    max_errors: float = 1.0,
    smoothing: str = "stupid_backoff",
    discount: float = 0.4,
    alpha: float = 0.5,
    lambdas: tuple[float, float] = (0.7, 0.3),
    transpositions: bool = False,
    include_input: bool = False,
    collate: bool = False,
    manifest=None,
) -> list[PhraseSuggestion]:
    """Suggest corrected versions of ``text``, best first (score desc,
    text asc). See the module docstring for the model. ES-parameter
    parity: ``size``/``confidence``/``max_errors``/``smoothing`` +
    ``real_word_error_likelihood`` are the suggester's own options;
    ``max_edits``/``prefix_length``/``min_word_length`` mirror the
    direct_generator (corrections are only generated for tokens of at
    least ``min_word_length`` characters; ``num_candidates`` bounds
    each slot's corrections, ranked distance asc, doc_freq desc, term
    asc — the suggest_terms order). ``include_input=True`` also returns
    the unchanged input when its probability is finite (off by default,
    matching ES: only corrections come back). ``collate=True`` keeps
    only suggestions whose tokens ALL occur in some document — one
    batched search_many job for the whole suggestion list (the ES
    collate query, amortized like msearch).

    ``lambdas`` are (bigram λ, unigram λ) for linear_interpolation and
    must sum to 1 (the ES validation)."""
    from .analysis import get_analyzer
    from .query.expand import suggest_terms

    if smoothing not in SMOOTHINGS:
        raise ValueError(
            f"smoothing must be one of {SMOOTHINGS}, got {smoothing!r}"
        )
    if smoothing == "linear_interpolation" and not math.isclose(
        sum(lambdas), 1.0, rel_tol=0, abs_tol=1e-9
    ):
        raise ValueError(
            f"linear_interpolation lambdas must sum to 1, got {lambdas}"
        )
    if not 0.0 <= real_word_error_likelihood <= 1.0:
        raise ValueError(
            "real_word_error_likelihood must be in [0, 1], got "
            f"{real_word_error_likelihood}"
        )
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = _text_field(manifest, field)
    mdir = _model_dir(index_dir, field)
    meta_path = os.path.join(mdir, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no phrase LM for field {field!r} at {mdir} — run "
            "train_phrase_lm(spark, index_dir, field) first (the analog "
            "of indexing the ES shingle subfield)"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    n_total = meta["n_tokens"]
    vocab = meta["vocab_size"]
    if n_total <= 0:
        raise ValueError(f"phrase LM at {mdir} is empty")

    tokens = get_analyzer(fe.query_analyzer).analyze_one(text)
    if not tokens:
        return []
    err_budget = _resolve_max_errors(max_errors, len(tokens))
    rwel = real_word_error_likelihood

    # candidate lattice: per slot, the original + up to num_candidates
    # corrections from the pruned dictionary scan
    slots: list[list[tuple[str, float]]] = []  # (candidate, ln channel)
    for tok in tokens:
        cands: list[tuple[str, float]] = []
        if rwel > 0:
            cands.append((tok, math.log(rwel)))
        if len(tok) >= min_word_length and rwel < 1.0:
            sugg = suggest_terms(
                spark, index_dir, manifest, fe.id, tok,
                max_dist=max_edits, prefix_length=prefix_length,
                transpositions=transpositions,
            )
            n_kept = 0
            for term, _df, dist in sugg:  # already (dist, -df, term) order
                if term == tok or n_kept >= num_candidates:
                    continue
                sim = 1.0 - dist / max(len(tok), len(term))
                if sim <= 0:
                    continue
                cands.append((term, math.log((1.0 - rwel) * sim)))
                n_kept += 1
        if not cands:
            return []  # rwel == 0 with an uncorrectable token
        slots.append(cands)

    # LM counts for exactly the lattice's terms: two predicate-pushed
    # reads of the sorted model tables, each collecting O(candidates²)
    # rows at most
    all_terms = sorted({c for slot in slots for c, _ in slot})
    uni_rows = (
        spark.read.parquet(os.path.join(mdir, "unigrams.parquet"))
        .filter(F.col("term").isin(all_terms))
        .collect()
    )
    uni = {r["term"]: int(r["cnt"]) for r in uni_rows}
    big: dict[tuple[str, str], int] = {}
    if len(slots) > 1:
        big_rows = (
            spark.read.parquet(os.path.join(mdir, "bigrams.parquet"))
            .filter(
                F.col("w1").isin(all_terms) & F.col("w2").isin(all_terms)
            )
            .collect()
        )
        big = {(r["w1"], r["w2"]): int(r["cnt"]) for r in big_rows}

    def ln_uni(w: str) -> float:
        c = uni.get(w, 0)
        if smoothing == "laplace":
            return math.log((c + alpha) / (n_total + alpha * vocab))
        return math.log(c / n_total) if c else float("-inf")

    def ln_bi(w1: str, w2: str) -> float:
        c1 = uni.get(w1, 0)
        c12 = big.get((w1, w2), 0)
        if smoothing == "laplace":
            return math.log((c12 + alpha) / (c1 + alpha * vocab))
        if smoothing == "linear_interpolation":
            p = (lambdas[0] * c12 / c1 if c1 else 0.0) + lambdas[1] * (
                uni.get(w2, 0) / n_total
            )
            return math.log(p) if p > 0 else float("-inf")
        # stupid_backoff
        if c12 and c1:
            return math.log(c12 / c1)
        c2 = uni.get(w2, 0)
        return math.log(discount * c2 / n_total) if c2 else float("-inf")

    # exact top-`size` Viterbi over (slot, last candidate, errors-used):
    # each state keeps its best `size` paths, so the final merge is the
    # true global top-size (states partition the paths)
    State = tuple[str, int]  # (last candidate, errors used)
    beams: dict[State, list[tuple[float, list[str]]]] = {}
    for cand, ch in slots[0]:
        err = 0 if cand == tokens[0] else 1
        if err > err_budget:
            continue
        s = ch + ln_uni(cand)
        if s == float("-inf"):
            continue
        beams.setdefault((cand, err), []).append((s, [cand]))
    for i in range(1, len(slots)):
        nxt: dict[State, list[tuple[float, list[str]]]] = {}
        for (prev, err), paths in beams.items():
            for cand, ch in slots[i]:
                e = err + (0 if cand == tokens[i] else 1)
                if e > err_budget:
                    continue
                step = ch + ln_bi(prev, cand)
                if step == float("-inf"):
                    continue
                bucket = nxt.setdefault((cand, e), [])
                for s, path in paths:
                    bucket.append((s + step, path + [cand]))
        for k, v in nxt.items():
            v.sort(key=lambda sp: (-sp[0], sp[1]))
            del v[size:]
        beams = nxt

    results: dict[str, tuple[float, int]] = {}
    input_score = float("-inf")
    for (_, err), paths in beams.items():
        for s, path in paths:
            txt = " ".join(path)
            if path == tokens:
                input_score = s
            if err == 0 and not include_input:
                continue
            cur = results.get(txt)
            if cur is None or s > cur[0]:
                results[txt] = (s, err)
    if confidence > 0 and input_score > float("-inf"):
        floor = math.log(confidence) + input_score
        results = {
            t: (s, e)
            for t, (s, e) in results.items()
            if s > floor or (include_input and t == " ".join(tokens))
        }

    out = [
        PhraseSuggestion(t, s, e) for t, (s, e) in results.items()
    ]
    out.sort(key=lambda p: (-p.score, p.text))
    out = out[:size]

    if collate and out:
        from .query.exec import search_many
        from .query.parser import BooleanQuery, TermQuery

        qs = {
            str(i): BooleanQuery(
                [("must", TermQuery(fe.id, w)) for w in p.text.split(" ")]
            )
            for i, p in enumerate(out)
        }
        hits = search_many(
            spark, index_dir, qs, limit=1, manifest=manifest
        )
        seen = {r["query_id"] for r in hits.select("query_id").collect()}
        out = [p for i, p in enumerate(out) if str(i) in seen]
    return out
