"""random_sampler aggregation — ES analog with a DETERMINISTIC draw
(the curation module's portable unit hash, not per-shard RNG).

Design under test:
- sample membership == the sha256 unit-hash rule recomputed driver-side;
- partition invariance (2 vs 5 segment builds sample identical docs);
- seed isolates draws, same seed reproduces;
- n_docs raw + n_docs_est scaled; sum/count metrics scaled 1/p in
  place, avg unscaled (the ES scaling rule);
- the ES probability rule: (0, 0.5] or exactly 1.
"""

import hashlib

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, random_sampler_facet, search
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark", "query", "score"]


def _unit(salt, key):
    h = hashlib.sha256(f"{salt}{key}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


@pytest.fixture(scope="module", params=[2, 5])
def rs_idx(request, spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("content", "default")
    s.add_numeric_field("year")
    s.add_numeric_field("rating", "double")
    tmp = tmp_path_factory.mktemp(f"rs{request.param}")
    idx = str(tmp / "idx")
    docs = [
        {
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 6)),
            "year": 2000 + i % 3,
            "rating": (i % 9) * 0.5,
        }
        for i in range(80)
    ]
    build_index(
        spark,
        spark.createDataFrame(docs, "k long, content string, year long, rating double"),
        s, idx, num_partitions=request.param, order_col="k", id_cols=["k"],
    )
    return idx


def test_sample_vs_brute_and_scaling(spark, rs_idx):
    q = "content:merge"
    res, _ = search(spark, rs_idx, q, limit=None)
    matched = [r.asDict() for r in attach_docmap(spark, rs_idx, res).collect()]
    p, seed = 0.5, 3
    salt = f"rsampler-{seed}-"
    sample = [r for r in matched if _unit(salt, r["k"]) < p]
    expect = {}
    for r in sample:
        e = expect.setdefault(r["year"], {"n": 0, "sum": 0.0, "vals": []})
        e["n"] += 1
        e["sum"] += r["rating"]
        e["vals"].append(r["rating"])
    got = {
        int(r["year"]): r
        for r in random_sampler_facet(
            spark, rs_idx, q, by="year",
            metrics={"sum_r": ("sum", "rating"), "avg_r": ("avg", "rating")},
            probability=p, seed=seed, key_col="k",
        ).collect()
    }
    assert set(got) == set(expect)
    for y, e in expect.items():
        r = got[y]
        assert r["n_docs"] == e["n"]
        assert abs(r["n_docs_est"] - e["n"] / p) < 1e-9
        # sum scaled in place (ES rule), avg an unscaled sample statistic
        assert abs(r["sum_r"] - e["sum"] / p) < 1e-9
        assert abs(r["avg_r"] - e["sum"] / e["n"]) < 1e-9


def test_seed_isolation_and_reproducibility(spark, rs_idx):
    q = "content:segment"

    def draw(seed):
        return {
            (r["year"], r["n_docs"])
            for r in random_sampler_facet(
                spark, rs_idx, q, by="year", probability=0.5,
                seed=seed, key_col="k",
            ).collect()
        }

    assert draw(1) == draw(1)
    assert draw(1) != draw(2)


def test_probability_one_is_exact_and_validation(spark, rs_idx):
    from ostrich_spark.query.exec import facet_stats

    q = "content:index"
    exact = {
        (r["year"], r["n_docs"])
        for r in facet_stats(spark, rs_idx, q, by="year", metrics={}).collect()
    }
    got = {
        (r["year"], r["n_docs"])
        for r in random_sampler_facet(
            spark, rs_idx, q, by="year", probability=1.0, key_col="k"
        ).collect()
    }
    assert got == exact
    for bad in (0.0, 0.7, -0.1, 1.5):
        with pytest.raises(ValueError, match="probability"):
            random_sampler_facet(
                spark, rs_idx, q, by="year", probability=bad, key_col="k"
            )
    with pytest.raises(ValueError, match="key_col"):
        random_sampler_facet(
            spark, rs_idx, q, by="year", probability=0.5, key_col="nope"
        )
