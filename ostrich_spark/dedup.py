"""Deduplication operators for training-data pipelines at corpus scale.

- exact: sha256 hash-groupBy — one shuffle on the hash, keeper = min id.
- MinHash + LSH: shingle -> K minhashes -> banded bucket-join. The hash
  family is affine over PORTABLE token ids ((a_i*tid + b_i) mod p), pure
  int64 arithmetic, so the DuckDB oracle reproduces it bit-for-bit. At
  web scale the candidate join is the classic band-bucket equi-join —
  shuffle keyed by (band, hash); skew-resistant because bucket sizes are
  bounded by near-duplicate cluster sizes.
- SimHash: 32-bit sign-of-weighted-sum sketch over the same portable
  hash family.
- n-gram Jaccard: token-trigram sets, |A∩B| via shared-trigram equi-join,
  exact Jaccard on candidate pairs.

Scale design: token ids are derived map-side from sha256(term) — there
is NO corpus vocabulary, no global window, no broadcast dictionary, so
the sketch stages are a single shuffle each (groupBy doc_id with k
partial-aggregated min/sum columns map-side-combined). At 10^12 docs the
only wide exchanges are the per-doc agg (keyed by doc_id — uniform) and
the LSH band-bucket self-join (bounded by duplicate cluster size).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .textops import with_tokens

MINHASH_K = 16
MINHASH_BANDS = 8  # rows per band = 2
P = 1_000_000_007
TID_MOD = 1_000_003  # keeps every affine-hash product well inside int64

# Affine hash family h_i(t) = (a_i*t + b_i) mod P. The multipliers MUST
# be large enough that a_i*tid wraps mod P many times — with small
# multipliers (the naive 37+101*i) the mod never fires for tid<=1e6, the
# hash is monotone in tid, every minhash collapses to the min-tid token,
# and simhash bits reduce to tid parity. Derived from the Knuth constant;
# closed-form so ANY k/bits works, with the default-size lists inlined as
# literals into the DuckDB oracle SQL (see __spark_entry__).


def minhash_a(i: int) -> int:
    return (2_654_435_761 * (i + 1) + 101) % P


def minhash_b(i: int) -> int:
    return (40_503 * (i + 1) * (i + 1) + 61) % P


def simhash_a(b: int) -> int:
    return (2_654_435_761 * (b + 17) + 131) % P


def simhash_b(b: int) -> int:
    return (40_503 * (b + 17) * (b + 17) + 89) % P


SIMHASH_BITS = 32
MINHASH_A = [minhash_a(i) for i in range(MINHASH_K)]
MINHASH_B = [minhash_b(i) for i in range(MINHASH_K)]
SIMHASH_A = [simhash_a(b) for b in range(SIMHASH_BITS)]
SIMHASH_B = [simhash_b(b) for b in range(SIMHASH_BITS)]


def term_id_col(term_col):
    """Portable deterministic token id: first 32 sha256 bits mod TID_MOD,
    1-based. Pure column expression (map-side, no vocabulary build);
    DuckDB oracle: (('0x' || substr(sha256(term),1,8))::BIGINT % 1000003) + 1.
    """
    return (
        F.conv(F.substring(F.sha2(term_col, 256), 1, 8), 16, 10).cast("long") % F.lit(TID_MOD)
    ) + F.lit(1)


def exact_dups(df, text_col="text"):
    """Groups of byte-identical docs: (content_sha256, dup_count, keeper)."""
    h = df.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
    return h.groupBy("content_sha256").agg(
        F.count("*").alias("dup_count"), F.min("doc_id").alias("keeper")
    )


def dedup_lines(
    df,
    text_col="text",
    max_line_df: int = 1,
    id_col="doc_id",
    policy: str = "remove_all",
):
    """Corpus-level exact-line deduplication — the RefinedWeb / C4-class
    boilerplate-removal op: a (raw, byte-exact) line appearing in MORE
    than ``max_line_df`` distinct docs is a *hot* line. ``policy`` picks
    what happens to hot lines:

    - ``"remove_all"`` (default): removed from EVERY doc — the repeated
      header/footer/nav rule (RefinedWeb); order-free.
    - ``"keep_one"``: exactly ONE occurrence survives — the C4-style
      keep-first, made deterministic and order-free by electing the
      keeper as the lexicographically smallest (id, position) occurrence
      (a second occurrence inside the keeper doc itself also drops).

    Blank lines (whitespace-only) are structure, not boilerplate: they
    never count and are always kept. Docs keep their row even when every
    line drops (text becomes '').

    Returns (id_col, text, n_kept, n_dropped).

    Scale posture: posexplode -> one partial-aggregated two-level
    groupBy(line) for the distinct-doc counts (+ a min-struct keeper
    election riding the same agg under keep_one; hot-line set is
    boilerplate-sized, but delivered by JOIN, not broadcast — at web
    scale the hot set can be millions of lines) -> left join + one
    groupBy(doc) rebuild via sort_array(collect_list(struct(pos, line)))
    (NOT orderBy-then-collect_list, which Spark does not guarantee)."""
    if policy not in ("remove_all", "keep_one"):
        raise ValueError(
            f"policy must be 'remove_all' or 'keep_one', got {policy!r}"
        )
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "ln"),
    )
    hot = (
        lines.filter(F.trim("ln") != "")
        .groupBy("ln")
        .agg(
            F.countDistinct(id_col).alias("line_df"),
            # keeper election (used by keep_one): smallest (id, pos)
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("_keeper"),
        )
        .filter(F.col("line_df") > int(max_line_df))
        .select("ln", F.lit(True).alias("_hot"), "_keeper")
    )
    # blank lines never join: they are all identical strings, so sending
    # them through a join keyed by line content would funnel every blank
    # in the corpus into ONE shuffle partition. They are kept by rule,
    # so they bypass the join entirely. Hot non-blank keys (a footer in
    # 10^9 docs) still skew the probe side — AQE's skew-join splitting
    # handles that (the hot set is the small side); keep AQE on.
    blank = F.trim("ln") == ""
    keep_pred = F.col("_hot").isNull()
    if policy == "keep_one":
        keep_pred = keep_pred | (
            (F.col(id_col) == F.col("_keeper.d"))
            & (F.col("pos") == F.col("_keeper.p"))
        )
    kept = (
        lines.filter(blank).withColumn("_keep", F.lit(True))
        .unionByName(
            lines.filter(~blank)
            .join(hot, "ln", "left")
            .withColumn("_keep", keep_pred)
            .drop("_hot", "_keeper")
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct(F.col("pos"), F.col("ln")),
                        )
                    )
                ),
                lambda x: x["ln"],
            ),
        ).alias(text_col),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("_keep")).cast("long")).alias("n_dropped"),
    )
    # a doc whose every line dropped still aggregated (collect_list of
    # NULL whens is empty -> ''), so no doc vanishes; no back-join needed
    return rebuilt


def _token_ids(df, text_col="text"):
    """(doc_id, tid) pairs over the DISTINCT tokens of each doc. tid is
    computed in-place from sha256(term) — zero shuffles, zero joins."""
    toks = with_tokens(df, text_col).select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term")
    )
    return toks.select("doc_id", term_id_col(F.col("term")).alias("tid"))


def minhash_signatures(df, text_col="text", k: int = MINHASH_K):
    """(doc_id, sig_i, minhash) signature rows.

    One groupBy(doc_id) computing all k minimums as separate aggregate
    columns (map-side combined — the shuffle carries k longs per doc, not
    k× the token stream), then an unpivot. Replaces the naive
    explode(k)->groupBy(doc,sig_i) plan, which shuffled k× the distinct-
    token volume.
    """
    ids = _token_ids(df, text_col)
    mins = ids.groupBy("doc_id").agg(
        *[
            F.min((F.lit(minhash_a(i)) * F.col("tid") + F.lit(minhash_b(i))) % F.lit(P)).alias(
                f"m{i}"
            )
            for i in range(k)
        ]
    )
    stack_args = ", ".join(f"{i}L, m{i}" for i in range(k))
    return mins.selectExpr(
        "doc_id", f"stack({k}, {stack_args}) AS (sig_i, minhash)"
    )


def _band_hashes(df, text_col="text", k: int = MINHASH_K, bands: int = MINHASH_BANDS):
    """(doc_id, band, band_hash) — the banded LSH bucket keys.
    band_hash combines the band's minhashes positionally — pure int64."""
    sigs = minhash_signatures(df, text_col, k).withColumn(
        "band", F.col("sig_i") % F.lit(bands)
    )
    # deterministic positional combine within a band
    return sigs.groupBy("doc_id", "band").agg(
        (F.sum(F.col("minhash") * (F.floor(F.col("sig_i") / bands) * F.lit(100_003) + 1)) % F.lit(P)).alias(
            "band_hash"
        )
    )


def minhash_lsh_pairs(
    df,
    text_col="text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    max_bucket: int | None = 1024,
):
    """Candidate near-dup pairs sharing >=1 LSH band (rows/band = k/bands).

    ``max_bucket`` is the scale guard: a bucket of B docs emits B(B-1)/2
    pairs, so on template-heavy corpora (the common web-data shape) ONE
    hot bucket of 10^6 near-identical docs would alone produce ~10^12
    join rows (measured here: the sf0.1 synthetic docs table put 11.5M
    pairs into shared buckets from just 5k template docs). With the cap,
    buckets larger than ``max_bucket`` are dropped from the pair join
    BEFORE it runs, with a loud warning — the standard trade for a
    per-candidate-verification workflow, where an over-cap bucket is
    better handled by :func:`minhash_lsh_edges` + clustering than by an
    explicit clique. The default is FINITE (1024 → ≤~524k pairs/bucket)
    so a naive call can never all-pairs-explode; callers wanting the
    exact full pair list must opt in with ``max_bucket=None``.

    For clustering, use :func:`minhash_lsh_edges` — identical connected
    components at O(B) edges per bucket, no cap needed."""
    band_hashes = _band_hashes(df, text_col, k, bands)
    if max_bucket is not None:
        bsz = band_hashes.groupBy("band", "band_hash").agg(
            F.count("*").alias("bucket_size")
        )
        n_hot = bsz.filter(F.col("bucket_size") > max_bucket).count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: max_bucket=%d drops %d hot bucket(s) "
                "from the pair join; their members' candidate pairs are "
                "NOT emitted (use minhash_lsh_edges + clustering for hot "
                "buckets, or pass max_bucket=None for the exact clique)",
                max_bucket,
                n_hot,
            )
        keep = bsz.filter(F.col("bucket_size") <= max_bucket).select(
            "band", "band_hash"
        )
        band_hashes = band_hashes.join(keep, ["band", "band_hash"])
    a = band_hashes.alias("a")
    b = band_hashes.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def minhash_lsh_edges(df, text_col="text", k: int = MINHASH_K, bands: int = MINHASH_BANDS):
    """Connectivity-equivalent LSH edge list: per (band, band_hash)
    bucket, a STAR from the bucket's min doc_id (hub) to every other
    member — B-1 edges instead of the B(B-1)/2 clique.

    The pair relation is bare band collision (no similarity
    verification), so a bucket is a CLIQUE in the pair graph; a star
    over the same vertex set has the same connected components (every
    member reaches every other through the hub), and components across
    buckets are unioned identically. Hence
    ``connected_components(minhash_lsh_edges(df))`` ==
    ``connected_components(minhash_lsh_pairs(df))`` EXACTLY (pinned by
    test) while a 10^6-doc template family costs 10^6 edges, not
    10^12 — the hot-bucket case 100 TB corpora actually contain
    (self-found: the sf0.1 synthetic docs table put half of all doc
    pairs into shared buckets, 11.5M pairs from 5k docs)."""
    band_hashes = _band_hashes(df, text_col, k, bands)
    hubs = band_hashes.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("hub"), F.count("*").alias("bucket_size")
    ).filter(F.col("bucket_size") > 1)
    return (
        band_hashes.join(hubs, ["band", "band_hash"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(df, text_col="text", bits: int = 32):
    """32-bit SimHash, tf-weighted, portable hash family.

    The tf weighting is implicit: summing each bit's ±1 contribution over
    ALL token instances equals summing tf·(±1) over distinct terms — so
    no per-(doc,term) tf aggregation, no vocabulary, no bit explosion.
    One groupBy(doc_id) with `bits` partial-aggregated sum columns, then
    a pure projection packs the sign bits into one int64.
    """
    if not 1 <= bits <= 63:
        raise ValueError(f"simhash bits must be in [1, 63] (int64 packing), got {bits}")
    toks = with_tokens(df, text_col).select("doc_id", F.explode("toks").alias("term"))
    t = toks.select("doc_id", term_id_col(F.col("term")).alias("tid"))
    aggs = []
    for b in range(bits):
        bit = (
            (F.lit(simhash_a(b)) * F.col("tid") + F.lit(simhash_b(b))) % F.lit(P)
        ) % F.lit(2)
        aggs.append(F.sum(F.lit(2) * bit - F.lit(1)).alias(f"s{b}"))
    per = t.groupBy("doc_id").agg(*aggs)
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return per.select("doc_id", packed.alias("simhash"))


def ngram_jaccard_pairs(
    df, text_col="text", n: int = 3, threshold: float = 0.3, max_gram_df: int | None = 10_000
):
    """Pairs with token-n-gram Jaccard >= threshold (exact, join-based).

    ``max_gram_df`` is the scale guard: a shingle appearing in d docs
    contributes d^2 candidate rows to the self-join, so one boilerplate
    trigram shared by 1M docs would alone produce 10^12 join rows. With
    a cap, ultra-frequent shingles are dropped from the gram universe
    BEFORE the join (sizes and intersections both computed over the
    reduced universe, so the Jaccard stays exact w.r.t. that universe —
    the standard trade in web-scale shingle dedup). The default is
    FINITE (10k) so a naive call can never all-pairs-explode; callers
    wanting the exact full-universe join must opt in with
    ``max_gram_df=None``.
    """
    t = with_tokens(df, text_col)
    tri = t.filter(F.size("toks") >= n).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(toks)-{n}), "
                    f"i -> concat_ws(' ', slice(toks, i+1, {n})))"
                )
            )
        ).alias("gram"),
    )
    if max_gram_df is not None:
        gdf = tri.groupBy("gram").agg(F.count("*").alias("gdf"))
        # Signal when the cap actually reduces the shingle universe —
        # Jaccard values are then exact w.r.t. the REDUCED universe, and
        # silent universe shrinkage surprised callers migrating from the
        # old max_gram_df=None default.
        n_dropped = gdf.filter(F.col("gdf") > max_gram_df).count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: max_gram_df=%d drops %d ultra-frequent "
                "shingle(s) from the universe; Jaccard is exact w.r.t. the "
                "reduced universe (pass max_gram_df=None for the full join)",
                max_gram_df,
                n_dropped,
            )
        keep = gdf.filter(F.col("gdf") <= max_gram_df).select("gram")
        tri = tri.join(keep, "gram")
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = tri.alias("a")
    b = tri.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def connected_components(pairs, id_a="doc_a", id_b="doc_b", max_iter: int = 50):
    """Duplicate-cluster formation: connected components over a pair list
    -> (doc_id, component) with component = min doc_id reachable. The
    canonical post-LSH step (cluster -> keep min id, drop the rest).

    Each round does (1) min-label propagation — comp(x) <- min(comp(x),
    min over neighbors' comp) — then (2) POINTER JUMPING: comp(x) <-
    comp(comp(x)) (labels are node ids, so a self-join resolves the hop).
    The jump doubles label reach per round, so convergence is
    O(log diameter), not O(diameter): a 10^6-long chain of templated
    near-dup docs — exactly the shape web corpora produce — resolves in
    ~20 rounds where plain propagation needed 10^6. Two shuffles per
    round, both keyed by node id (uniform); lineage cut per round via
    localCheckpoint. Driver only sees a convergence COUNT.

    Raises RuntimeError if max_iter rounds don't converge — silently
    returning split components would let extra duplicates survive dedup
    with no signal.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    comp = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(comp, edges.dst == comp.node)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        hopped = (
            comp.join(neighbor_min, comp.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias("comp"),
            )
        )
        # pointer jump: comp(x) <- comp(comp(x)). Every label IS a node in
        # the table (labels start as own ids and min-propagate), so the
        # lookup join always hits; left join guards the invariant anyway.
        lookup = hopped.select(F.col("node").alias("lnode"), F.col("comp").alias("lcomp"))
        new_comp = (
            hopped.join(lookup, hopped.comp == lookup.lnode, "left")
            .select("node", F.coalesce(F.col("lcomp"), F.col("comp")).alias("comp"))
        )
        new_comp = new_comp.localCheckpoint(eager=True)  # cut lineage growth
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "clusters would be silently split (extra duplicates kept). "
            "Raise max_iter — with pointer jumping rounds grow as "
            "log2(component diameter)."
        )
    return comp.select(F.col("node").alias("doc_id"), "comp")


def dup_clusters(df, text_col="text", k: int = MINHASH_K, bands: int = MINHASH_BANDS):
    """MinHash-LSH end-to-end dedup clustering: (doc_id, component,
    cluster_size, is_keeper). Docs with no near-dup pair form singleton
    clusters (component = own id). Connectivity comes from the bucket-
    star edge list (minhash_lsh_edges) — identical components to the
    full pair list at O(bucket) instead of O(bucket^2) edges."""
    edges = minhash_lsh_edges(df, text_col, k, bands)
    comp = connected_components(edges)
    all_docs = df.select("doc_id").distinct()
    comp_full = (
        all_docs.join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("comp"), F.col("doc_id")).alias("component"))
    )
    sizes = comp_full.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp_full.join(sizes, "component")
        .select(
            "doc_id",
            "component",
            "cluster_size",
            (F.col("doc_id") == F.col("component")).alias("is_keeper"),
        )
    )


def _distinct_doc_grams(df, text_col: str, n: int, id_col: str = "doc_id"):
    """(id, gram) rows: each doc's DISTINCT token n-grams (docs with
    fewer than n tokens contribute none)."""
    t = with_tokens(df, text_col)
    return t.filter(F.size("toks") >= n).select(
        id_col,
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(toks)-{n}), "
                    f"i -> concat_ws(' ', slice(toks, i+1, {n})))"
                )
            )
        ).alias("gram"),
    )


def decontaminate(
    df,
    benchmark_df,
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
    id_col: str = "doc_id",
):
    """Benchmark decontamination: flag training docs that share at least
    ``min_overlap`` distinct token ``n``-grams with an evaluation/
    benchmark set — the GPT-3/PaLM-style n-gram overlap protocol with a
    configurable n (those used 13-grams; smaller n is stricter).

    Returns one row per input doc:
        (``id_col``, n_grams, n_hit, contaminated)
    where ``n_grams`` is the doc's distinct-gram count, ``n_hit`` how
    many of those appear anywhere in the benchmark set, and
    ``contaminated`` = n_hit >= min_overlap. Docs shorter than ``n``
    tokens have n_grams = 0 and are never contaminated.

    Scale posture: one explode+distinct per side, ONE equi-join on the
    gram, one partial-aggregated per-doc count. Benchmark sets are
    eval-sized (thousands of docs), so their distinct-gram side is
    broadcast by default — the 100 TB corpus side never shuffles on the
    gram key; pass ``broadcast_bench=False`` for a benchmark union too
    big to broadcast (the join then shuffles both sides). Both analyses
    use the engine tokenizer, so contamination is invariant to
    case/punctuation differences between corpus and benchmark copies.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    bench_text_col = bench_text_col or text_col
    bench = benchmark_df.select(F.col(bench_text_col).alias("text"))
    bench = with_tokens(bench, "text").filter(F.size("toks") >= n).select(
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(toks)-{n}), "
                    f"i -> concat_ws(' ', slice(toks, i+1, {n})))"
                )
            )
        ).alias("gram")
    ).distinct()
    if broadcast_bench:
        bench = F.broadcast(bench)
    grams = _distinct_doc_grams(df, text_col, n, id_col)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = grams.join(bench, "gram").groupBy(id_col).agg(
        F.count("*").alias("n_hit")
    )
    base = df.select(id_col)
    return (
        base.join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def repeated_spans(
    df,
    text_col="text",
    id_col="doc_id",
    k: int = 10,
    min_df: int = 2,
    policy: str = "keep_first",
    hash_shingles: bool = False,
):
    """Exact substring-span deduplication — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    ExactSubstr operation at token granularity: any ``k``-token window
    whose exact content occurs at least ``min_df`` times across the
    corpus (WITHIN-doc repeats count — occurrence count, not document
    count, the paper's semantics) is a repeated span, and every token
    covered by an excised occurrence drops.

    ``policy``: ``"keep_first"`` (the paper's rule — ONE occurrence
    survives; the keeper is the lexicographically smallest (id, pos)
    occurrence, deterministic and order-free) or ``"remove_all"``.
    Overlapping excised spans union naturally (a token drops if ANY
    covering occurrence is excised). Docs shorter than ``k`` tokens
    carry no shingles and pass through whole.

    Returns (``id_col``, ``clean_text``, ``n_kept``, ``n_removed``).
    ``clean_text`` is the SURVIVING TOKEN STREAM space-rejoined (the
    form LM training consumes — token-level like the paper's suffix
    array over tokenized text; raw-byte fidelity is not the contract
    and is stated so).

    Scale posture vs the paper's suffix array: a suffix array needs the
    whole corpus in one address space; the Spark shape is shingle
    inventory instead — per-doc window keys map-side (by default the
    exact window STRING: collision-free, and the groupBy key
    dictionary-encodes; ``hash_shingles=True`` keys on xxhash64 of the
    window instead — an 8-byte key that cuts the shingle shuffle
    ~10× for long windows, at 64-bit-collision odds: at 10^10 windows
    the birthday bound is ~0.3%, and a collision can only ever excise
    a FALSE-POSITIVE span, never corrupt surviving text — the standard
    web-scale trade, stated), ONE partial-aggregated groupBy for counts +
    keeper election, one join of occurrences against the hot-shingle
    set (hot set is boilerplate-sized but delivered by JOIN, not
    broadcast — at web scale it can be millions of windows), then a
    per-doc mask built from the sorted excised-start list with
    index-aware array filters — no per-token explode ever reaches the
    wire a second time."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    if policy not in ("keep_first", "remove_all"):
        raise ValueError(
            f"policy must be 'keep_first' or 'remove_all', got {policy!r}"
        )
    t = with_tokens(df, text_col).select(id_col, "toks")
    n = F.size("toks")
    sh = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice("toks", i + 1, k), " "),
    )
    if hash_shingles:
        sh = F.transform(sh, lambda s: F.xxhash64(s))
    occ = (
        t.filter(n >= k)
        .select(id_col, F.posexplode(sh).alias("pos", "shingle"))
    )
    stats = occ.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("keeper"),
    )
    hot = stats.filter(F.col("n_occ") >= min_df)
    exc = occ.join(hot, "shingle")
    if policy == "keep_first":
        exc = exc.filter(
            ~((F.col(id_col) == F.col("keeper.i")) & (F.col("pos") == F.col("keeper.p")))
        )
    starts = exc.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("__starts")
    )
    kw = int(k)
    out = t.join(starts, id_col, "left").select(
        id_col,
        "toks",
        F.coalesce("__starts", F.array().cast("array<int>")).alias("__st"),
    )
    kept = F.filter(
        "toks",
        lambda x, i: ~F.exists(
            "__st", lambda s: (s <= i) & (i < s + kw)
        ),
    )
    return out.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).alias("n_kept"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
    )
