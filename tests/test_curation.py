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


# --- pack_sequences (GPT-style concatenation packing) ---


@pytest.fixture(scope="module")
def pack_docs(spark):
    rows = [(i, " ".join(f"t{j}" for j in range((i * 7) % 23))) for i in range(80)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_pack(rows, seq_len):
    out, off = [], 0
    for doc_id, text in sorted(rows):
        n = len(text.split())
        if n == 0:
            continue
        for s in range(off // seq_len, (off + n - 1) // seq_len + 1):
            lo, hi = max(off, s * seq_len), min(off + n, (s + 1) * seq_len)
            out.append((s, doc_id, n, lo - off, lo - s * seq_len, hi - lo))
        off += n
    return sorted(out)


def test_pack_matches_bruteforce_and_bucket_invariance(spark, pack_docs):
    from ostrich_spark.textops import pack_sequences

    rows = [(r["doc_id"], r["text"]) for r in pack_docs.collect()]
    want = _brute_pack(rows, 16)
    for bucket in (1, 7, 10**6):
        got = sorted(
            map(tuple, pack_sequences(pack_docs, 16, bucket_size=bucket).collect())
        )
        assert got == want, f"bucket_size={bucket}"
    # partition invariance
    got = sorted(
        map(tuple, pack_sequences(pack_docs.repartition(13), 16, bucket_size=7).collect())
    )
    assert got == want


def test_pack_invariants(spark, pack_docs):
    from ostrich_spark.textops import pack_sequences

    got = pack_sequences(pack_docs, 32, bucket_size=11).collect()
    by_seq, by_doc = {}, {}
    for r in got:
        by_seq.setdefault(r["seq_id"], []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every sequence except the last is exactly full, positions tile it
    last = max(by_seq)
    for s, parts in by_seq.items():
        parts.sort(key=lambda r: r["seq_start"])
        covered = sum(p["n"] for p in parts)
        assert covered == 32 or s == last
        pos = 0
        for p in parts:
            assert p["seq_start"] == pos
            pos += p["n"]
    # every doc's tokens are fully and contiguously assigned
    for d, parts in by_doc.items():
        parts.sort(key=lambda r: r["doc_start"])
        assert sum(p["n"] for p in parts) == parts[0]["n_tokens"]
        pos = 0
        for p in parts:
            assert p["doc_start"] == pos
            pos += p["n"]


def test_pack_validation(spark, pack_docs):
    from ostrich_spark.textops import pack_sequences

    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(pack_docs, 0)
    with pytest.raises(ValueError, match="bucket_size"):
        pack_sequences(pack_docs, 8, bucket_size=0)


# --- cap_per_group (domain cap) --------------------------------------------


@pytest.fixture()
def cap_docs(spark):
    rows = [
        (i, f"h{i % 3}", float(i % 7), f"t{i}") for i in range(60)
    ] + [(100, None, 1.0, "nullhost"), (101, None, 2.0, "nullhost2"),
         (102, None, 3.0, "nullhost3")]
    return spark.createDataFrame(
        rows, "doc_id long, host string, quality double, text string"
    )


def test_cap_per_group_hash_order_matches_window(spark, cap_docs):
    """Default order = the sampler unit hash: survivors equal a brute
    row_number window over (hash, doc_id); partitioning-invariant."""
    from ostrich_spark.sampling import _unit_hash, cap_per_group

    for nparts in (1, 7):
        df = cap_docs.repartition(nparts)
        got = sorted(
            r["doc_id"]
            for r in cap_per_group(df, "host", 4, salt="cap").collect()
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("host").orderBy(
            _unit_hash(F.col("doc_id"), "cap").asc(), F.col("doc_id").asc()
        )
        exp = sorted(
            r["doc_id"]
            for r in cap_docs.withColumn(
                "rn", F.row_number().over(w)
            ).filter("rn <= 4").collect()
        )
        assert got == exp
        # every group capped at 4, incl the NULL-host group (3 rows pass)
        sizes = {
            r["host"]: r["n"]
            for r in cap_per_group(df, "host", 4, salt="cap")
            .groupBy("host").agg(F.count("*").alias("n")).collect()
        }
        assert sizes == {"h0": 4, "h1": 4, "h2": 4, None: 3}


def test_cap_per_group_quality_order(spark, cap_docs):
    """ascending=False keeps the BEST-quality n; ties broken by key
    asc, so the survivor set is pinned."""
    from ostrich_spark.sampling import cap_per_group

    out = cap_per_group(
        cap_docs.filter("host = 'h0'"), "host", 3,
        order_col="quality", ascending=False, key_col="doc_id",
    ).collect()
    # h0 docs: ids 0,3,6,...57; quality = id % 7. Best quality 6 at ids
    # 6,27,48 — ties on quality -> smallest ids win
    assert sorted(r["doc_id"] for r in out) == [6, 27, 48]
    # all original columns survive the round trip
    assert set(out[0].asDict()) == {"doc_id", "host", "quality", "text"}


def test_cap_per_group_validation(spark, cap_docs):
    from ostrich_spark.sampling import cap_per_group

    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(cap_docs, "host", 0)
    with pytest.raises(ValueError, match="not in frame"):
        cap_per_group(cap_docs, "nope", 2)
    with pytest.raises(ValueError, match="explicit order_col"):
        cap_per_group(cap_docs, "host", 2, ascending=False)
    with pytest.raises(ValueError, match="numeric order_col"):
        cap_per_group(
            cap_docs, "host", 2, order_col="text", ascending=False
        )
    # n >= group size: everything passes through
    from pyspark.sql import functions as _F

    assert cap_per_group(cap_docs, "host", 1000).count() == cap_docs.count()


class TestWeightedSample:
    """Efraimidis–Spirakis weighted sampling without replacement:
    deterministic portable-hash draw; selection == a hashlib recount;
    distributional sanity on weight proportionality."""

    def _brute(self, rows, k, salt="wsample"):
        import hashlib
        import math

        keyed = []
        for rid, w in rows:
            if w is None or w <= 0:
                continue
            h = hashlib.sha256(f"{salt}{rid}".encode()).hexdigest()[:8]
            u = int(h, 16) / 2**32
            keyed.append((math.log(u) / w, -rid))
        keyed.sort(reverse=True)
        return [-r for _, r in keyed[:k]]

    def test_selection_vs_brute_and_partition_invariance(self, spark):
        from ostrich_spark.sampling import weighted_sample

        rows = [(i, None if i % 17 == 0 else (0.0 if i % 13 == 0 else float(1 + i % 7)))
                for i in range(200)]
        for parts in (1, 5):
            df = spark.createDataFrame(rows, "doc_id long, w double").repartition(parts)
            got = [r["doc_id"] for r in weighted_sample(df, "w", 25).collect()]
            assert got == self._brute(rows, 25)
        # different salt -> different draw; same salt reproduces
        df = spark.createDataFrame(rows, "doc_id long, w double")
        a = [r["doc_id"] for r in weighted_sample(df, "w", 25, salt="s1").collect()]
        b = [r["doc_id"] for r in weighted_sample(df, "w", 25, salt="s2").collect()]
        assert a != b

    def test_weight_proportionality(self, spark):
        """A weight-10 item should appear in small samples far more
        often than weight-1 items: estimate inclusion frequency across
        salts — deterministic per salt, so this is exact, not flaky."""
        from ostrich_spark.sampling import weighted_sample

        rows = [(i, 10.0 if i == 0 else 1.0) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        hits = sum(
            0 in {r["doc_id"] for r in weighted_sample(df, "w", 5, salt=f"t{s}").collect()}
            for s in range(30)
        )
        # expected inclusion ~= 1 - prod(1 - 10/59-ish) >> uniform 10%;
        # loose bound: at least a third of the draws
        assert hits >= 10

    def test_validation(self, spark):
        import pytest

        from ostrich_spark.sampling import weighted_sample

        df = spark.createDataFrame([(0, 1.0)], "doc_id long, w double")
        with pytest.raises(ValueError, match="k must"):
            weighted_sample(df, "w", 0)
        with pytest.raises(ValueError, match="column"):
            weighted_sample(df, "nope", 1)


class TestEpochShuffle:
    def _df(self, spark, nparts):
        return spark.createDataFrame(
            [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
        ).repartition(nparts)

    def test_reproducible_and_partition_invariant(self, spark):
        from ostrich_spark.sampling import epoch_shuffle

        import hashlib

        def brute(epoch):
            def u(i):
                h = hashlib.sha256(f"epoch:{epoch}{i}".encode()).hexdigest()
                return int(h[:8], 16) / 4294967296.0
            return [i for i in sorted(range(200), key=lambda i: (u(i), i))]

        for nparts in (1, 7):
            got0 = [r["doc_id"]
                    for r in epoch_shuffle(self._df(spark, nparts), 0).collect()]
            assert got0 == brute(0), nparts
        # same epoch twice -> identical; different epoch -> a genuinely
        # different permutation that still matches its own brute force
        again = [r["doc_id"] for r in epoch_shuffle(self._df(spark, 3), 0).collect()]
        got1 = [r["doc_id"] for r in epoch_shuffle(self._df(spark, 3), 1).collect()]
        assert again == brute(0)
        assert got1 == brute(1) and got1 != again

    def test_total_order_and_distributed_sort(self, spark):
        from ostrich_spark.sampling import epoch_shuffle

        out = epoch_shuffle(self._df(spark, 5), 2)
        keys = [r["__ek"] for r in out.collect()]
        assert keys == sorted(keys)
        # the plan is a distributed range sort, not a single-partition
        # global window
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()
        assert "Window" not in plan

    def test_validation(self, spark):
        from ostrich_spark.sampling import epoch_shuffle

        df = self._df(spark, 1)
        with pytest.raises(ValueError, match="epoch"):
            epoch_shuffle(df, -1)
        with pytest.raises(ValueError, match="column"):
            epoch_shuffle(df, 0, key_col="nope")


class TestTokenBudget:
    def _df(self, spark, nparts=4):
        rows = [(i, f"d{i}", (i * 37) % 250 + 1) for i in range(300)]
        rows.append((999, "nullcount", None))
        return spark.createDataFrame(
            rows, "doc_id long, text string, n_tok long"
        ).repartition(nparts)

    def _brute(self, budget, epoch=0):
        import hashlib

        def u(i):
            h = hashlib.sha256(f"epoch:{epoch}{i}".encode()).hexdigest()
            return int(h[:8], 16) / 4294967296.0

        docs = [(i, (i * 37) % 250 + 1) for i in range(300)] + [(999, 0)]
        docs.sort(key=lambda d: (u(d[0]), d[0]))
        kept, off = [], 0
        for i, n in docs:
            if off < budget:
                kept.append((i, off))
            off += n
        return kept

    def test_matches_brute_and_partition_invariant(self, spark):
        from ostrich_spark.sampling import take_token_budget

        for nparts, n_buckets in ((1, 7), (6, 4096)):
            got = sorted(
                (r["doc_id"], r["__off"])
                for r in take_token_budget(
                    self._df(spark, nparts), 10_000, "n_tok",
                    n_buckets=n_buckets,
                ).collect()
            )
            assert got == sorted(self._brute(10_000)), (nparts, n_buckets)
        # overshoot bounded by one doc: kept total >= budget, and
        # removing the LAST kept doc drops under budget
        kept = self._brute(10_000)
        by_id = dict((i, (i * 37) % 250 + 1) for i in range(300))
        by_id[999] = 0
        total = sum(by_id[i] for i, _ in kept)
        last = max(kept, key=lambda d: d[1])
        assert total >= 10_000 > total - by_id[last[0]]

    def test_epochs_slice_differently(self, spark):
        from ostrich_spark.sampling import take_token_budget

        a = {r["doc_id"] for r in take_token_budget(
            self._df(spark), 5_000, "n_tok", epoch=0).collect()}
        b = {r["doc_id"] for r in take_token_budget(
            self._df(spark), 5_000, "n_tok", epoch=1).collect()}
        assert a != b and a and b

    def test_validation(self, spark):
        from ostrich_spark.sampling import take_token_budget

        df = self._df(spark, 1)
        with pytest.raises(ValueError, match="budget"):
            take_token_budget(df, 0, "n_tok")
        with pytest.raises(ValueError, match="column"):
            take_token_budget(df, 10, "nope")
        neg = spark.createDataFrame(
            [(0, -5)], "doc_id long, n_tok long"
        )
        with pytest.raises(ValueError, match="negative"):
            take_token_budget(neg, 10, "n_tok").collect()
