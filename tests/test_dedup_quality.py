"""Sketch-quality regression tests for the dedup operators.

Guards against the degenerate-hash-family bug: with small affine
multipliers, `(a*tid + b) mod P` never wraps for tid <= 1e6, so the hash
is monotone in tid — every minhash collapses to the min-tid token and
simhash bits reduce to tid parity (half the bits constantly zero). The
constants in ostrich_spark.dedup must keep the family well-mixed; these
tests assert the OBSERVABLE sketch properties, not the constants.
"""

from __future__ import annotations

import pytest

from ostrich_spark.dedup import (
    MINHASH_A,
    MINHASH_K,
    P,
    TID_MOD,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)

NEAR_A = "the quick brown fox jumps over the lazy dog and runs far away today"
NEAR_B = "the quick brown fox jumps over the lazy cat and runs far away today"
UNRELATED = "import numpy as np def main return zero parse spark query engine"


@pytest.fixture(scope="module")
def sketch_docs(spark):
    return spark.createDataFrame(
        [(1, NEAR_A), (2, NEAR_B), (3, UNRELATED)], ["doc_id", "text"]
    )


def _sigs_by_doc(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], {})[r["sig_i"]] = r["minhash"]
    return out


def test_minhash_discriminates(spark, sketch_docs):
    sigs = _sigs_by_doc(minhash_signatures(sketch_docs))
    overlap_near = sum(1 for i in range(MINHASH_K) if sigs[1][i] == sigs[2][i])
    overlap_far = sum(1 for i in range(MINHASH_K) if sigs[1][i] == sigs[3][i])
    # true Jaccard(A,B) ~= 0.86, Jaccard(A,unrelated) = 0
    assert overlap_near >= MINHASH_K // 2, f"near-dup overlap only {overlap_near}/{MINHASH_K}"
    assert overlap_far <= 2, f"unrelated docs share {overlap_far}/{MINHASH_K} sigs"
    # non-degeneracy: the k hash functions must not all pick the same token
    distinct_per_doc = len(set(sigs[1].values()))
    assert distinct_per_doc >= MINHASH_K // 2


def test_simhash_hamming(spark, sketch_docs):
    h = {r["doc_id"]: r["simhash"] for r in simhash(sketch_docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h[1], h[2]) < ham(h[1], h[3]), (
        f"near-dup hamming {ham(h[1], h[2])} !< unrelated {ham(h[1], h[3])}"
    )
    # non-degeneracy: a real 32-bit sketch is neither 0 nor parity-striped
    assert h[1] not in (0, 0x55555555, 0xFFFFFFFF)
    assert ham(h[1], h[3]) >= 8


def test_lsh_finds_near_dup_not_unrelated(spark, sketch_docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(sketch_docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_hash_family_wraps_modulus():
    # every multiplier must wrap the modulus for mid-range tids, else the
    # hash is order-preserving in tid and the min degenerates
    assert all(a * (TID_MOD // 2) > P for a in MINHASH_A)


def test_connected_components_shapes(spark):
    """Chain, triangle, and singleton: min-label propagation must find
    the exact components (including multi-hop chains that need several
    propagation rounds)."""
    from ostrich_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {r["doc_id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dup_clusters_keeper_and_singletons(spark, sketch_docs):
    from ostrich_spark.dedup import dup_clusters

    rows = {r["doc_id"]: r for r in dup_clusters(sketch_docs).collect()}
    # docs 1,2 are near-dups (LSH pair), doc 3 unrelated singleton
    assert rows[1]["component"] == 1 and rows[2]["component"] == 1
    assert rows[1]["is_keeper"] and not rows[2]["is_keeper"]
    assert rows[1]["cluster_size"] == 2
    assert rows[3]["component"] == 3 and rows[3]["is_keeper"] and rows[3]["cluster_size"] == 1


def test_hash_sampling_partition_invariant_and_monotone(spark):
    """The properties that make hash sampling the scale choice: the kept
    set is identical under any repartitioning, and a grown corpus keeps
    every previously kept row (monotone sample growth)."""
    from ostrich_spark.sampling import hash_sample, stratified_hash_sample

    df = spark.createDataFrame([(i, "en" if i % 2 else "de") for i in range(400)], ["doc_id", "lang"])
    kept1 = {r["doc_id"] for r in hash_sample(df, 0.3).collect()}
    kept2 = {r["doc_id"] for r in hash_sample(df.repartition(7, "lang"), 0.3).collect()}
    assert kept1 == kept2 and 60 <= len(kept1) <= 180
    # monotone: sampling the first half yields exactly the intersection
    half = df.filter(df.doc_id < 200)
    kept_half = {r["doc_id"] for r in hash_sample(half, 0.3).collect()}
    assert kept_half == {d for d in kept1 if d < 200}
    # stratified rates actually differ per stratum
    s = stratified_hash_sample(df, {"en": 0.9, "de": 0.1}).collect()
    n_en = sum(1 for r in s if r["lang"] == "en")
    n_de = sum(1 for r in s if r["lang"] == "de")
    assert n_en > 140 and n_de < 60


def test_chunking_overlap_invariants(spark):
    """The invariant the duplicate-tail bug violated: with overlap o,
    every chunk past the first must contribute at least one NEW token
    (size > o), and total tokens = sum(sizes) - o*(n_chunks-1)."""
    from pyspark.sql import functions as F

    from ostrich_spark.textops import chunk_tokens, with_tokens

    sizes = [1, 10, 31, 32, 33, 64, 65, 95, 96, 97, 128, 160, 161, 200]
    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(sizes)],
        ["doc_id", "text"],
    )
    c = chunk_tokens(df, chunk_size=96, overlap=32)
    agg = (
        c.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("tok_sum"),
            F.min("n_chunk_tokens").alias("min_sz"),
        )
        .collect()
    )
    by_doc = {r["doc_id"]: r for r in agg}
    for i, n in enumerate(sizes):
        r = by_doc[i]
        assert r["tok_sum"] - 32 * (r["n_chunks"] - 1) == n, (n, dict(r.asDict()))
        if r["n_chunks"] > 1:
            assert r["min_sz"] > 32, (n, dict(r.asDict()))


def test_star_edges_same_components_no_quadratic(spark):
    """minhash_lsh_edges (per-bucket star) must give IDENTICAL connected
    components to the full pair list, with edge count linear in bucket
    size instead of quadratic — the hot-bucket case template-heavy
    corpora produce (self-found at sf0.1: 11.5M pairs from 5k docs).

    Fixture: a 40-doc template family (identical text -> one bucket =
    one clique in the pair graph), a 2-doc near-dup pair, a singleton.
    """
    from ostrich_spark.dedup import (
        connected_components,
        minhash_lsh_edges,
        minhash_lsh_pairs,
    )

    rows = [(i, "the same boilerplate template text repeated verbatim here")
            for i in range(100, 140)]
    rows += [(1, NEAR_A), (2, NEAR_B), (3, UNRELATED)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)

    pairs = minhash_lsh_pairs(df)
    edges = minhash_lsh_edges(df)
    n_pairs, n_edges = pairs.count(), edges.count()
    # clique: 40*39/2 = 780 pairs for the family alone; star: 39 edges
    assert n_pairs >= 780
    assert n_edges < 100, f"star edge list should be linear, got {n_edges}"

    cp = {r["doc_id"]: r["comp"]
          for r in connected_components(pairs).collect()}
    ce = {r["doc_id"]: r["comp"]
          for r in connected_components(edges).collect()}
    assert cp == ce and cp[100] == 100 and cp[139] == 100


def test_lsh_pairs_max_bucket_guard(spark, caplog):
    """The finite max_bucket default must keep hot buckets from
    all-pairs-exploding: over-cap buckets are dropped from the pair join
    with a loud warning, pairs from under-cap buckets are untouched, and
    max_bucket=None opts back into the exact clique.

    Fixture: a 40-doc template family (one bucket = one 780-pair clique)
    plus a genuine 2-doc near-dup pair that lives in small buckets.
    """
    import logging

    rows = [(i, "the same boilerplate template text repeated verbatim here")
            for i in range(100, 140)]
    rows += [(1, NEAR_A), (2, NEAR_B), (3, UNRELATED)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)

    with caplog.at_level(logging.WARNING, logger="ostrich_spark.dedup"):
        capped = {(r["doc_a"], r["doc_b"])
                  for r in minhash_lsh_pairs(df, max_bucket=16).collect()}
    assert any("max_bucket=16 drops" in rec.getMessage()
               for rec in caplog.records), "hot-bucket drop must warn loudly"
    # the family's clique is gone; the small-bucket near-dup pair survives
    assert (1, 2) in capped
    assert not any(100 <= a < 140 and 100 <= b < 140 for a, b in capped)
    assert len(capped) < 100, f"capped call emitted {len(capped)} pairs"

    exact = minhash_lsh_pairs(df, max_bucket=None)
    assert exact.count() >= 780  # full clique restored on opt-in
    # under-cap buckets are byte-identical between the two calls
    assert capped <= {(r["doc_a"], r["doc_b"]) for r in exact.collect()}
