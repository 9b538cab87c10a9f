"""Corpus-curation pipeline ops — benchmark decontamination (n-gram
overlap) and deterministic training-mixture composition. Both are
EXTENSIONS (the reference is a search library); both must be exactly
reproducible across runs, partitionings, and engines (the gated entries
sample_mixture / decontam_ngrams pin DuckDB parity)."""

import pytest
from pyspark.sql import functions as F

from ostrich_spark.dedup import decontaminate
from ostrich_spark.sampling import mix_corpus

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "a quick brown fox jumps over the lazy cat"),
    (2, "completely unrelated text snippet right here now"),
    (3, "tiny"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_decontaminate_counts(spark, docs):
    bench = spark.createDataFrame(
        [("Quick brown FOX jumps over the lazy",)], "text string"
    )
    got = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=5).collect()
    }
    # doc 0: 6 distinct 5-grams, 3 shared ("quick brown fox jumps over",
    # "brown fox jumps over the", "fox jumps over the lazy")
    assert (got[0]["n_grams"], got[0]["n_hit"], got[0]["contaminated"]) == (6, 3, True)
    assert (got[1]["n_grams"], got[1]["n_hit"], got[1]["contaminated"]) == (5, 3, True)
    assert (got[2]["n_hit"], got[2]["contaminated"]) == (0, False)
    # shorter than n tokens: zero grams, never contaminated
    assert (got[3]["n_grams"], got[3]["contaminated"]) == (0, False)


def test_decontaminate_min_overlap_and_tokenizer_invariance(spark, docs):
    bench = spark.createDataFrame(
        [("quick brown fox jumps over",)], "text string"
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=5, min_overlap=2).collect()
    }
    # only ONE shared 5-gram per doc -> min_overlap=2 clears everything
    assert got == {0: False, 1: False, 2: False, 3: False}
    with pytest.raises(ValueError, match="min_overlap"):
        decontaminate(docs, bench, min_overlap=0)


def test_decontaminate_no_broadcast_mode_identical(spark, docs):
    bench = spark.createDataFrame([("brown fox jumps over the",)], "text string")
    a = sorted(map(tuple, decontaminate(docs, bench, n=5).collect()))
    b = sorted(
        map(tuple, decontaminate(docs, bench, n=5, broadcast_bench=False).collect())
    )
    assert a == b


@pytest.fixture(scope="module")
def mix_docs(spark):
    rows = [
        (i, "en" if i % 4 != 3 else "de", 100 + (i % 7) * 10)
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_mix_partition_invariant_and_deterministic(spark, mix_docs):
    t = {"en": 0.5, "de": 0.5}
    a = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(mix_docs, t, 20_000).collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(mix_docs.repartition(13), t, 20_000).collect()
    )
    assert a == b and a


def test_mix_upsampling_epochs(spark, mix_docs):
    # de holds ~1/4 of chars; demanding half the budget of a big budget
    # forces rate > 1: every de doc appears in epoch 0 AND a hash-sampled
    # subset appears again
    avail = {
        r["lang"]: r["s"]
        for r in mix_docs.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    }
    budget = 2 * (avail["en"] + avail["de"])
    got = mix_corpus(mix_docs, {"de": 0.5}, budget).collect()
    assert all(r["lang"] == "de" for r in got)
    rate = 0.5 * budget / avail["de"]
    n_de = mix_docs.filter("lang = 'de'").count()
    by_epoch = {}
    for r in got:
        by_epoch.setdefault(r["epoch"], set()).add(r["doc_id"])
    # full epochs contain EVERY de doc
    for e in range(int(rate)):
        assert by_epoch[e] == {r["doc_id"] for r in got if r["epoch"] == 0}
        assert len(by_epoch[e]) == n_de
    # fractional epoch: strict subset, roughly frac * n_de
    frac = rate - int(rate)
    if frac > 0:
        top = max(by_epoch)
        assert top == int(rate)
        assert 0 < len(by_epoch[top]) < n_de
        assert by_epoch[top] < by_epoch[0]


def test_mix_achieved_weights_near_targets(spark, mix_docs):
    m = mix_corpus(mix_docs, {"en": 0.7, "de": 0.3}, 40_000)
    got = {
        r["lang"]: r["s"]
        for r in m.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    }
    assert got["en"] == pytest.approx(28_000, rel=0.15)
    assert got["de"] == pytest.approx(12_000, rel=0.15)


def test_mix_validation(spark, mix_docs):
    with pytest.raises(ValueError, match="sum"):
        mix_corpus(mix_docs, {"en": 0.8, "de": 0.5}, 1000)
    with pytest.raises(ValueError, match="no n_chars"):
        mix_corpus(mix_docs, {"xx": 0.5}, 1000)
    with pytest.raises(ValueError, match="at least one"):
        mix_corpus(mix_docs, {}, 1000)
    with pytest.raises(ValueError, match=">= 0"):
        mix_corpus(mix_docs, {"en": -0.1}, 1000)
    # a tiny domain asked to fill a huge budget would explode
    # budget/avail copies per row — refused beyond max_epochs
    with pytest.raises(ValueError, match="max_epochs"):
        mix_corpus(mix_docs, {"de": 1.0}, 10_000_000)
    assert mix_corpus(
        mix_docs, {"de": 1.0}, 10_000_000, max_epochs=2000
    ).count() > 0
