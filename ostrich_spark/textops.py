"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (pyspark.sql.functions; no Python UDFs in the hot path):
language-ID (lexicon-hit heuristic), quality scoring, token counting,
positional document fingerprinting. Each has an equivalent ANSI-SQL
oracle (see __spark_entry__.py) — the arithmetic is integer/portable by
construction so Spark and DuckDB agree exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .analysis import SPLIT_PATTERN_SQL, STOPWORDS

# fingerprint modulus (fits comfortably in int64 intermediate products)
FP_PRIME = 1_000_000_007

LANG_LEXICONS = {
    "en": ["the", "and", "of", "to", "in", "that", "have", "be"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "une", "est"],
    "es": ["el", "los", "las", "y", "una", "es"],
}


def tokens_col(text_col="text"):
    """Array of analyzed tokens (default analyzer: lowercase + unicode
    word-break), empties removed — JVM-side, whole-stage-codegen friendly."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), SPLIT_PATTERN_SQL), lambda t: t != F.lit("")
    )


def with_tokens(df, text_col="text"):
    return df.withColumn("toks", tokens_col(text_col))


def token_stats(df, text_col="text"):
    """Per-lang token counting: (lang, n_docs, total_tokens, avg_tokens)."""
    return (
        with_tokens(df, text_col)
        .withColumn("n_tokens", F.size("toks"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


# GPT-2-style pre-tokenizer pattern, restricted to the lookahead-free
# subset so Java regex (Spark) and RE2 (DuckDB oracle) count identically:
# contractions | space?-letters | space?-digits | space?-other. Whitespace
# runs are not themselves tokens (a single leading space folds into the
# following token, as in the real pattern); the `(?!\S)` trailing-space
# branch of the original is dropped because RE2 has no lookahead.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_counts(df, text_col="text"):
    """Per-doc token-count estimators for training-data budgeting:
    (doc_id, n_ws_tokens, n_bpe_tokens).

    - n_ws_tokens: whitespace-split count (the cheap classic);
    - n_bpe_tokens: matches of the BPE-ish pre-tokenizer regex — the
      piece count BEFORE merges, i.e. an upper bound on (and good linear
      proxy for) a real BPE token count, computed JVM-side with no
      vocabulary or model artifact."""
    trimmed = F.trim(F.col(text_col))
    ws = F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
    return df.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )


def unigram_lm(df, text_col="text", alpha: float = 0.5):
    """Train an add-``alpha`` smoothed unigram language model over the
    corpus — the cheap end of the CCNet/KenLM perplexity-filter recipe,
    vocabulary-free to ship (the model IS a DataFrame).

    Returns ``(model_df, unk_logp)``: ``model_df`` is (term, logp) with
    logp = ln((count + alpha) / (T + alpha * V)) over corpus totals
    T = token count, V = vocab size; ``unk_logp`` = ln(alpha / (T +
    alpha * V)) scores tokens unseen at training time (scoring a
    DIFFERENT corpus than the model was trained on).

    Scale posture: one explode + one partial-aggregated groupBy(term) —
    the same linear token shuffle as the dedup signatures; T/V is a
    single-row collect. The model table is vocabulary-sized parquet-able
    data, joined (not broadcast) at scoring time."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha}) — zero-count "
                         f"smoothing is what makes unseen tokens scoreable")
    toks = df.select(F.explode(tokens_col(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    tot = counts.agg(
        F.sum("c").alias("T"), F.count("*").alias("V")
    ).collect()[0]
    t_total, vocab = int(tot["T"] or 0), int(tot["V"] or 0)
    if not vocab:
        raise ValueError("unigram_lm over an empty corpus")
    denom = float(t_total) + alpha * float(vocab)
    import math

    model = counts.select(
        "term",
        F.log((F.col("c") + F.lit(float(alpha))) / F.lit(denom)).alias("logp"),
    )
    return model, math.log(alpha / denom)


def unigram_nll(df, model, unk_logp: float, text_col="text"):
    """Score docs against a :func:`unigram_lm` model: (doc_id, n_tokens,
    nll, ppl) where nll = mean negative log-probability (nats) and
    ppl = exp(nll) — the perplexity-proxy quality signal (gibberish and
    off-distribution docs score high; the classic pretrain filter keeps
    a middle band). Tokens unseen by the model score ``unk_logp``.
    Zero-token docs produce no row (no tokens, no likelihood —
    anti-join them separately if they need a verdict).

    One explode + one term join (linear, vocabulary-sized right side) +
    one partial-aggregated groupBy(doc_id)."""
    toks = df.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("term")
    )
    scored = toks.join(model, "term", "left").select(
        "doc_id",
        F.coalesce(F.col("logp"), F.lit(float(unk_logp))).alias("logp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(-F.col("logp")), 6).alias("nll"),
        F.round(F.exp(F.avg(-F.col("logp"))), 6).alias("ppl"),
    )


def quality_scores(df, text_col="text"):
    """Per-doc quality features: token count, distinct ratio, stopword
    ratio, mean token length — standard corpus-filtering signals."""
    t = with_tokens(df, text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.round(
            F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
            / F.greatest(F.size("toks"), F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.aggregate("toks", F.lit(0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size("toks"), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def lang_id(df, text_col="text"):
    """Lexicon-hit language ID. Deterministic argmax (ties -> lexicon
    declaration order via the greatest-of-structs trick)."""
    t = with_tokens(df, text_col)
    cols = []
    for lang, lex in LANG_LEXICONS.items():
        arr = F.array(*[F.lit(w) for w in lex])
        cols.append(
            F.size(F.filter("toks", lambda x: F.array_contains(arr, x))).alias(f"hits_{lang}")
        )
    t = t.select("doc_id", F.size("toks").alias("n_tokens"), *cols)
    # predicted = lang with max hits; ties resolve to earlier lexicon
    # (struct comparison: hits desc, priority desc)
    langs = list(LANG_LEXICONS)
    structs = [
        F.struct(
            F.col(f"hits_{lang}").alias("h"),
            F.lit(len(langs) - i).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    return t.withColumn("predicted", F.greatest(*structs).getField("lang"))


def fingerprint(df, text_col="text"):
    """Positional document fingerprint (rolling-hash style): over the
    token-id sequence, fp = sum((tid * (pos+1)^2) mod p) mod p — order
    sensitive, pure integer arithmetic (portable to any SQL engine).

    Token ids are sha256-derived map-side (dedup.term_id_col): no corpus
    vocabulary, no global window, no broadcast — the whole operator is a
    narrow projection plus one groupBy(doc_id) with map-side partial
    sums. The inner mod keeps every intermediate < TID_MOD * p, inside
    int64 even for million-token documents.
    """
    from .dedup import term_id_col

    t = with_tokens(df, text_col)
    pos = t.select("doc_id", F.posexplode("toks").alias("pos", "term"))
    pos = pos.select(
        "doc_id",
        (F.col("pos").cast("long") + 1).alias("p1"),
        term_id_col(F.col("term")).alias("tid"),
    )
    elem = (
        F.col("tid") * ((F.col("p1") * F.col("p1")) % F.lit(FP_PRIME))
    ) % F.lit(FP_PRIME)
    return pos.groupBy("doc_id").agg((F.sum(elem) % F.lit(FP_PRIME)).alias("fp"))


def repetition_scores(df, text_col="text"):
    """Gopher-style repetition quality signals per doc:

    - top_tf / rep_ratio: count and share of the single most frequent
      token (template/spam detector);
    - dup_line_frac: fraction of non-empty lines that are duplicates of
      an earlier line (boilerplate detector).

    top_tf comes from explode -> groupBy(doc, term) -> max (linear in
    tokens, partial-aggregated map-side; an in-array count would be
    O(distinct x tokens) per doc and die on million-token files); the
    line stats are per-row array expressions.
    """
    t = with_tokens(df, text_col)
    tf = (
        t.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .groupBy("doc_id")
        .agg(F.max("tf").alias("top_tf"))
    )
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != F.lit(""))
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    base = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (n_lines - n_distinct_lines).alias("_dup_lines"),
        F.greatest(n_lines, F.lit(1)).alias("_n_lines"),
    )
    return (
        base.join(tf, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("top_tf"), F.lit(0)).alias("top_tf"),
            F.round(
                F.coalesce(F.col("top_tf"), F.lit(0)) / F.greatest(F.col("n_tokens"), F.lit(1)), 6
            ).alias("rep_ratio"),
            F.round(F.col("_dup_lines") / F.col("_n_lines"), 6).alias("dup_line_frac"),
        )
    )


def chunk_tokens(df, text_col="text", chunk_size: int = 128, overlap: int = 0):
    """Split each doc's token stream into training-window chunks:
    (doc_id, chunk_id, n_chunk_tokens, chunk_text). Starts at 0, stride
    = chunk_size - overlap, last chunk may be short; token-less docs
    yield no chunks. Pure array expressions (sequence + slice) — the
    explode multiplies rows but never shuffles.
    """
    if chunk_size <= 0 or not 0 <= overlap < chunk_size:
        raise ValueError(f"need chunk_size > 0 and 0 <= overlap < chunk_size, got {chunk_size}, {overlap}")
    step = chunk_size - overlap
    t = with_tokens(df, text_col).filter(F.size("toks") > 0)
    # a chunk starting at s contributes NEW tokens only if s + overlap <
    # size — without this bound, any doc whose final remainder <= overlap
    # emits a tail window fully contained in the previous chunk
    # (duplicated training data). greatest(...,0) keeps chunk 0 for docs
    # shorter than the overlap.
    last_start = F.greatest(F.size("toks") - F.lit(overlap) - 1, F.lit(0))
    starts = F.sequence(F.lit(0), last_start, F.lit(step))
    c = t.select("doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return c.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# Conservative Java-regex/RE2 common-subset patterns (portable to the
# DuckDB oracle verbatim)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "hex_secret": r"\b[0-9a-fA-F]{32,}\b",
}


def scrub_pii(df, text_col="text"):
    """Redact emails / IPv4s / long hex secrets: (doc_id, n_<pattern>...,
    scrubbed). Pure regexp_count/regexp_replace — JVM-side.

    Semantics: the n_* counts are ground truth taken on the ORIGINAL
    text; `scrubbed` applies the replacements sequentially (email, ip,
    hex). Sequential redaction can, at replacement-token boundaries,
    synthesize or suppress a later pattern's match (e.g.
    'a@b.co4.5.6.7' -> '<EMAIL><IP>' although n_ip counted 0 on the
    original, where 'co4.5.6.7' was not a standalone IPv4) — so marker
    occurrences in `scrubbed` need not equal the counts. Audit with the
    counts; treat markers as best-effort redaction.
    """
    count_cols = [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    scrubbed = F.col(text_col)
    for name, p in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, p, f"<{name.upper()}>")
    return df.select("doc_id", *count_cols, scrubbed.alias("scrubbed"))


def keyterms(df, text_col="text", top_m=5, id_col="doc_id"):
    """Per-document key terms: the ``top_m`` terms by tf·idf with the
    engine's idf formula ``1 + ln(N / (1 + df))`` — keyword extraction
    for training-data curation (topic tagging, near-dup triage, corpus
    exploration). Returns (id_col, term, tf, score, rank) with rank
    1..top_m per doc, ties broken score DESC then term ASC so the cut
    is deterministic and engine-portable.

    Scale posture: one explode → partial-aggregated groupBy(doc, term)
    for tf, one groupBy(term) for df (vocabulary-sized, rides back via a
    join AQE will broadcast when small), one window partitioned by doc
    for the top-m cut. All JVM-side expressions — no Python in the path;
    N is a scalar literal (one count job), not a cross-join.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    toks = with_tokens(df, text_col).select(id_col, F.explode("toks").alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        id_col,
        "term",
        "tf",
        F.round(
            F.col("tf") * (F.lit(1.0) + F.log(F.lit(float(n_docs)) / (F.lit(1.0) + F.col("df")))),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_m)
    )


def pack_sequences(
    df,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 1_000_000,
):
    """Sequence PACKING for pretraining: concatenate every doc's token
    stream in deterministic ``id_col`` order and slice the concatenation
    into fixed-length training sequences — the GPT-style
    document-concatenation prep (contrast ``chunk_tokens``, which
    windows each doc independently and pads/wastes the tail of every
    doc; packing wastes at most one partial sequence for the WHOLE
    corpus).

    Returns the packing map, one row per (sequence, doc) overlap:

        (seq_id, ``id_col``, n_tokens, doc_start, seq_start, n)

    meaning: tokens [doc_start, doc_start+n) of the doc occupy positions
    [seq_start, seq_start+n) of sequence seq_id. Token-less docs emit
    nothing. The map is pure integer arithmetic over token counts —
    downstream materialization gathers the actual tokens however the
    trainer stores them.

    Scale posture: the global offset of each doc is an exclusive prefix
    sum over id order — computed as a TWO-LEVEL prefix sum, never one
    global window: an intra-bucket running sum windows WITHIN
    ``id_col // bucket_size`` buckets (parallel across buckets), and the
    per-bucket totals (corpus/bucket_size rows — one task's worth by
    construction; at 10^12 docs and the default bucket_size that is
    10^6 rows) get their own cumulative sum before broadcasting back.
    The result is deterministic and partition-invariant: same ids, same
    packing, on any cluster.
    """
    from pyspark.sql.window import Window

    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    t = (
        with_tokens(df, text_col)
        .select(id_col, F.size("toks").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("_bucket", F.expr(f"{id_col} div {bucket_size}"))
    )
    # level 1: running sum WITHIN each bucket (parallel; bounded groups)
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("_intra", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
    # level 2: exclusive cumulative sum of the per-bucket totals — a
    # corpus/bucket_size-row frame, small by construction
    totals = t.groupBy("_bucket").agg(F.sum("n_tokens").alias("_tot"))
    w_b = Window.orderBy(F.asc("_bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bucket", "_base")
    t = t.join(F.broadcast(offsets), "_bucket").withColumn(
        "off", F.col("_base") + F.col("_intra")
    )
    # integral division (`div`) — float division + cast loses exactness
    # past 2^53 tokens, which a 10^12-doc corpus exceeds
    first = F.expr(f"off div {seq_len}")
    last = F.expr(f"(off + n_tokens - 1) div {seq_len}")
    spans = t.select(
        id_col,
        "n_tokens",
        "off",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seg_lo = F.greatest(F.col("off"), F.col("seq_id") * seq_len)
    seg_hi = F.least(
        F.col("off") + F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len
    )
    return spans.select(
        "seq_id",
        id_col,
        "n_tokens",
        (seg_lo - F.col("off")).alias("doc_start"),
        (seg_lo - F.col("seq_id") * seq_len).alias("seq_start"),
        (seg_hi - seg_lo).alias("n"),
    )


def hashed_ngram_score(
    df,
    weights: dict,
    text_col="text",
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    bias: float = 0.0,
    mode: str = "mean",
    salt: str = "clf",
    out: str = "clf_score",
):
    """Linear text classifier over HASHED word n-gram features — the
    fastText-supervised / sklearn-HashingVectorizer inference shape
    every corpus-quality pipeline runs ("CCNet/LLaMA-style quality
    scoring: a linear model over hashed n-grams, applied to every doc").
    Returns ``df`` + ``out`` = sigmoid(bias + agg of feature weights),
    where each token unigram (and bigram, when ``word_ngrams=2``) maps
    to ``sha256(salt || gram) mod n_features`` — the dedup module's
    portable hash family, so the DuckDB oracle (and any other engine)
    reproduces feature ids bit-exactly. ``weights`` maps feature id ->
    weight (the SPARSE trained model; absent ids weigh 0, exactly the
    hashing-trick contract); ``mode`` 'mean' (fastText's default
    normalization) or 'sum'. Empty docs score sigmoid(bias).

    Scale posture: pure Catalyst end to end — tokenize / n-gram
    (zip_with over shifted slices) / hash / map-lookup / aggregate all
    inside whole-stage codegen; the model broadcasts as a literal map
    (sparse models are small — that is the point of the hashing
    trick); NO Python, NO shuffle, NO vocabulary build. A 100 TB scan
    scores at IO speed."""
    if word_ngrams not in (1, 2):
        raise ValueError(f"word_ngrams must be 1 or 2, got {word_ngrams}")
    if mode not in ("mean", "sum"):
        raise ValueError(f"mode must be mean/sum, got {mode!r}")
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    if not weights:
        raise ValueError("weights must be a non-empty {feature_id: weight} dict")
    for k in weights:
        if not (0 <= int(k) < n_features):
            raise ValueError(
                f"weight feature id {k} outside [0, {n_features})"
            )
    toks = tokens_col(text_col)
    grams = toks
    if word_ngrams == 2:
        n = F.size(toks)
        bi = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.concat(toks, bi)
    fid = (
        F.transform(
            grams,
            lambda g: F.conv(
                F.substring(F.sha2(F.concat(F.lit(salt), g), 256), 1, 8),
                16, 10,
            ).cast("long") % F.lit(int(n_features)),
        )
    )
    wmap = F.create_map(
        *[x for k, v in weights.items()
          for x in (F.lit(int(k)), F.lit(float(v)))]
    )
    ws = F.transform(fid, lambda i: F.coalesce(wmap[i], F.lit(0.0)))
    z = F.aggregate(ws, F.lit(0.0), lambda a, x: a + x)
    if mode == "mean":
        z = z / F.greatest(F.size(ws), F.lit(1))
    z = z + F.lit(float(bias))
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def _sql_str(s: str) -> str:
    """Escape a Python string for inlining into a single-quoted SQL
    literal (doubling embedded quotes) — so caller tokens like "don't"
    produce valid oracle SQL instead of a parse error or silent
    engine/oracle divergence."""
    return str(s).replace("'", "''")


def hashed_ngram_score_sql(
    text_expr: str,
    weights: dict,
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    bias: float = 0.0,
    mode: str = "mean",
    salt: str = "clf",
) -> str:
    """DuckDB expression computing the IDENTICAL score as
    hashed_ngram_score — the shared-generator convention (geohash_sql /
    ip_hex_sql): both engines' arithmetic comes from one place, so the
    oracle checks the ENGINE, not a reimplementation drifting on its
    own. ``weights`` inlines as a CASE over feature ids."""
    toks = (
        "list_filter(regexp_split_to_array(lower(" + text_expr + "), "
        "'[^\\p{L}\\p{N}]+'), x -> x <> '')"
    )
    grams = toks
    if word_ngrams == 2:
        grams = (
            f"list_concat({toks}, "
            f"list_transform(range(1, greatest(len({toks}), 1)), "
            f"i -> {toks}[i] || ' ' || {toks}[i + 1]))"
        )
    case = " ".join(
        f"WHEN {int(k)} THEN {float(v)!r}" for k, v in weights.items()
    )
    ws = (
        f"list_transform({grams}, g -> CASE "
        f"(('0x' || substr(sha256('{_sql_str(salt)}' || g), 1, 8))::BIGINT "
        f"% {int(n_features)}) {case} ELSE 0.0 END)"
    )
    z = f"list_sum(list_concat({ws}, [0.0]))"
    if mode == "mean":
        z = f"({z} / greatest(len({ws}), 1))"
    return f"(1.0 / (1.0 + exp(-({z} + {float(bias)!r}))))"


# C4 cleaning rule constants (Raffel et al. 2020 §2.2, the public C4
# heuristics) — the terminal-punctuation regex is the single source for
# both engines (c4_clean / c4_clean_sql)
C4_TERMINAL_RE = '[.!?]["”’]?$'


def c4_clean(
    df,
    text_col="text",
    id_col="doc_id",
    min_words: int = 5,
    min_lines: int = 3,
    require_terminal: bool = True,
    drop_tokens: tuple = ("javascript",),
    page_drop_substrings: tuple = ("lorem ipsum",),
    drop_brace: bool = True,
    out: str = "clean_text",
):
    """The C4 cleaning pass (Raffel et al. 2020 §2.2 — the public
    heuristics every web-corpus pipeline starts from), line rules and
    page rules together:

    A LINE survives iff its trimmed form (1) is non-blank, (2) ends in
    terminal punctuation — ``.``/``!``/``?`` optionally followed by a
    closing quote (C4_TERMINAL_RE; disable with
    ``require_terminal=False``), (3) has at least ``min_words``
    whitespace words (the paper's "at least 5 words" retention rule;
    default 5), and (4) contains none of
    ``drop_tokens`` case-insensitively (C4 drops the word
    "javascript"). Surviving lines keep their ORIGINAL text and order.

    The PAGE survives (``survives`` column) iff it keeps at least
    ``min_lines`` lines (the C4 ≥3-sentence rule applied to kept
    lines), contains none of ``page_drop_substrings``
    case-insensitively ("lorem ipsum"), and — when ``drop_brace`` —
    no ``{`` anywhere (the C4 code-page heuristic). The row is KEPT
    either way so callers can audit; filter on ``survives``.

    Returns df + (``out``, n_kept, n_dropped, survives). Blank lines
    count as dropped (C4 rebuilds prose; contrast dedup_lines, which
    preserves blank lines as structure — both stances documented).

    Scale posture: a pure per-row projection — split / filter /
    array_join inside whole-stage codegen; no explode, no shuffle, no
    Python. The cheapest possible 100 TB pass."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    if min_lines < 0:
        raise ValueError(f"min_lines must be >= 0, got {min_lines}")
    lines = F.split(F.col(text_col), "\n")

    def _kept(ln):
        t = F.trim(ln)
        p = t != F.lit("")
        if require_terminal:
            p = p & t.rlike(C4_TERMINAL_RE)
        words = F.size(F.filter(F.split(t, "\\s+"), lambda x: x != F.lit("")))
        p = p & (words >= F.lit(int(min_words)))
        for tok in drop_tokens:
            p = p & ~F.lower(ln).contains(tok.lower())
        return p

    kept = F.filter(lines, _kept)
    surv = F.size(kept) >= F.lit(int(min_lines))
    for s in page_drop_substrings:
        surv = surv & ~F.lower(F.col(text_col)).contains(s.lower())
    if drop_brace:
        surv = surv & ~F.col(text_col).contains("{")
    return (
        df.withColumn(out, F.array_join(kept, "\n"))
        .withColumn("n_kept", F.size(kept))
        .withColumn("n_dropped", F.size(lines) - F.size(kept))
        .withColumn("survives", surv)
    )


def c4_clean_sql(
    text_expr: str,
    min_words: int = 5,
    min_lines: int = 3,
    require_terminal: bool = True,
    drop_tokens: tuple = ("javascript",),
    page_drop_substrings: tuple = ("lorem ipsum",),
    drop_brace: bool = True,
) -> dict:
    """DuckDB expressions computing IDENTICAL outputs to c4_clean (the
    shared-generator convention): returns {clean_text, n_kept,
    n_dropped, survives} expression strings over ``text_expr``."""
    t = "trim(ln)"
    conds = [f"{t} <> ''"]
    if require_terminal:
        conds.append(f"regexp_matches({t}, '{C4_TERMINAL_RE}')")
    conds.append(
        f"len(list_filter(regexp_split_to_array({t}, '\\s+'), "
        f"x -> x <> '')) >= {int(min_words)}"
    )
    for tok in drop_tokens:
        conds.append(f"NOT contains(lower(ln), '{_sql_str(tok.lower())}')")
    kept = (
        f"list_filter(string_split({text_expr}, chr(10)), "
        f"ln -> {' AND '.join(conds)})"
    )
    surv = [f"len({kept}) >= {int(min_lines)}"]
    for s in page_drop_substrings:
        surv.append(f"NOT contains(lower({text_expr}), '{_sql_str(s.lower())}')")
    if drop_brace:
        surv.append(f"NOT contains({text_expr}, '{{')")
    return {
        # DuckDB's array_to_string returns NULL for an empty list;
        # Spark's array_join returns '' — coalesce to the Spark value
        "clean_text": f"coalesce(array_to_string({kept}, chr(10)), '')",
        "n_kept": f"len({kept})",
        "n_dropped": f"(len(string_split({text_expr}, chr(10))) - len({kept}))",
        "survives": f"({' AND '.join(surv)})",
    }
