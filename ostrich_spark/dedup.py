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
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import with_tokens

MINHASH_K = 16
MINHASH_BANDS = 8  # rows per band = 2
P = 1_000_000_007


def minhash_a(i: int) -> int:
    return 37 + 101 * i


def minhash_b(i: int) -> int:
    return 61 + 211 * i


def exact_dups(df, text_col="text"):
    """Groups of byte-identical docs: (content_sha256, dup_count, keeper)."""
    h = df.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
    return h.groupBy("content_sha256").agg(
        F.count("*").alias("dup_count"), F.min("doc_id").alias("keeper")
    )


def _token_ids(df, text_col="text"):
    """(doc_id, tid) pairs over the DISTINCT tokens of each doc, with
    portable dense-rank token ids (see textops.fingerprint note)."""
    toks = with_tokens(df, text_col).select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term")
    )
    vocab = (
        toks.select("term").distinct().withColumn("tid", F.row_number().over(Window.orderBy("term")))
    )
    return toks.join(F.broadcast(vocab), "term").select("doc_id", "tid")


def minhash_signatures(df, text_col="text", k: int = MINHASH_K):
    """(doc_id, sig_i, minhash) exploded signature rows."""
    ids = _token_ids(df, text_col)
    sigs = ids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("sig_i"),
        "tid",
    ).withColumn(
        "h",
        (
            (F.lit(37) + F.lit(101) * F.col("sig_i")) * F.col("tid")
            + (F.lit(61) + F.lit(211) * F.col("sig_i"))
        )
        % F.lit(P),
    )
    return sigs.groupBy("doc_id", "sig_i").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(df, text_col="text", k: int = MINHASH_K, bands: int = MINHASH_BANDS):
    """Candidate near-dup pairs sharing >=1 LSH band (rows/band = k/bands).

    band_hash combines the band's minhashes positionally — pure int64.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(df, text_col, k).withColumn(
        "band", F.col("sig_i") % F.lit(bands)
    )
    # deterministic positional combine within a band
    band_hashes = sigs.groupBy("doc_id", "band").agg(
        (F.sum(F.col("minhash") * (F.floor(F.col("sig_i") / bands) * F.lit(100_003) + 1)) % F.lit(P)).alias(
            "band_hash"
        )
    )
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


def simhash(df, text_col="text", bits: int = 32):
    """32-bit SimHash over token tfs with the portable hash family."""
    toks = with_tokens(df, text_col).select("doc_id", F.explode("toks").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    vocab = tf.select("term").distinct().withColumn("tid", F.row_number().over(Window.orderBy("term")))
    t = tf.join(F.broadcast(vocab), "term")
    bitrows = t.select(
        "doc_id",
        "tf",
        "tid",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).withColumn(
        "bit",
        (
            (
                (F.lit(131) + F.lit(17) * F.col("b")) * F.col("tid")
                + (F.lit(89) + F.lit(23) * F.col("b"))
            )
            % F.lit(P)
        )
        % F.lit(2),
    )
    per_bit = bitrows.groupBy("doc_id", "b").agg(
        F.sum(F.col("tf") * (F.lit(2) * F.col("bit") - F.lit(1))).alias("s")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("long")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def ngram_jaccard_pairs(df, text_col="text", n: int = 3, threshold: float = 0.3):
    """Pairs with token-n-gram Jaccard >= threshold (exact, join-based)."""
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
