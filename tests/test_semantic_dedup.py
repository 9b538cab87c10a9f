"""SemDeDup (Abbas et al. 2023) — semantic near-duplicate pruning.
Hand-built 2-d geometry so every cosine, cluster assignment, component
and keep decision is verifiable on paper."""

import pytest

from ostrich_spark.similarity import semantic_dedup

# first-2 centroids (train_iters=0): v0 = x-axis, v1 = y-axis.
# eps = 0.01 -> pair threshold cos >= 0.99.
VECS = [
    (0, [1.0, 0.0]),     # centroid 0 anchor; dup group {0, 2, 3}
    (1, [0.0, 1.0]),     # centroid 1 anchor; dup group {1, 4}
    (2, [1.0, 0.0]),     # exact dup of 0
    (3, [0.9999, 0.0141]),  # cos to 0 ~ 0.99990 >= 0.99
    (4, [0.0, 2.0]),     # exact-direction dup of 1
    (5, [0.7, 0.7]),     # 45 deg: tie -> cluster 0; near-dup of 6 ACROSS
    (6, [0.69, 0.72]),   # just past 45 deg -> cluster 1
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>"
    )


def _run(spark, emb, **kw):
    rows = semantic_dedup(
        spark, emb, eps=0.01, n_clusters=2, train_iters=0, **kw
    ).collect()
    return {r["vec_id"]: r.asDict() for r in rows}


def test_keep_far_hand_geometry(spark, emb):
    got = _run(spark, emb)
    assert len(got) == len(VECS)
    # clusters: x-axis-ish -> 0 (incl the 45-deg tie), y-axis-ish -> 1
    assert {v: got[v]["cluster_id"] for v in got} == {
        0: 0, 2: 0, 3: 0, 5: 0, 1: 1, 4: 1, 6: 1,
    }
    # group {0,2,3}: centroid sims 1.0, 1.0, ~0.99990 -> 3 is FARTHEST
    assert got[3]["survives"] and got[3]["kept_id"] is None
    assert not got[0]["survives"] and got[0]["kept_id"] == 3
    assert not got[2]["survives"] and got[2]["kept_id"] == 3
    # group {1,4}: both sims 1.0 -> tie -> vec_id asc -> 1 survives
    assert got[1]["survives"] and not got[4]["survives"]
    assert got[4]["kept_id"] == 1
    # 5 and 6 are near-duplicates (cos ~ 0.9998) but live in DIFFERENT
    # clusters: both survive — the documented cross-cluster miss that
    # makes SemDeDup linear
    assert got[5]["survives"] and got[6]["survives"]
    # centroid sims surface rounded to 6
    assert got[3]["centroid_sim"] == pytest.approx(0.99990, abs=5e-6)


def test_keep_min_id(spark, emb):
    got = _run(spark, emb, keep="min_id")
    assert got[0]["survives"] and not got[2]["survives"] and not got[3]["survives"]
    assert got[2]["kept_id"] == 0 and got[3]["kept_id"] == 0
    assert got[1]["survives"] and got[4]["kept_id"] == 1


def test_partition_invariance(spark, emb):
    a = sorted(
        (r["vec_id"], r["survives"], r["kept_id"])
        for r in semantic_dedup(
            spark, emb.repartition(1), eps=0.01, n_clusters=2,
            train_iters=0,
        ).collect()
    )
    b = sorted(
        (r["vec_id"], r["survives"], r["kept_id"])
        for r in semantic_dedup(
            spark, emb.repartition(5), eps=0.01, n_clusters=2,
            train_iters=0,
        ).collect()
    )
    assert a == b


def test_transitive_group_single_survivor(spark):
    """A~B and B~C but cos(A,C) < threshold: one component, ONE
    survivor (the paper's grouping is the component, not the clique)."""
    import math

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # eps=0.01 -> thr 0.99 -> pair angle <= ~8.1 deg. Chain at 0/6/12:
    # 0~6 and 6~12 pass, 0-12 (cos ~ 0.978) fails.
    emb = spark.createDataFrame(
        [(0, unit(0)), (1, unit(6)), (2, unit(12)), (9, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_dedup(
            spark, emb, eps=0.01, n_clusters=1, train_iters=0
        ).collect()
    }
    survivors = [v for v in (0, 1, 2) if got[v]["survives"]]
    assert len(survivors) == 1
    # farthest from centroid [1,0] is the 12-deg member
    assert survivors == [2]
    assert got[0]["kept_id"] == 2 and got[1]["kept_id"] == 2
    assert got[9]["survives"]  # singleton


def test_validation(spark, emb):
    with pytest.raises(ValueError, match="eps"):
        semantic_dedup(spark, emb, eps=0.0)
    with pytest.raises(ValueError, match="keep"):
        semantic_dedup(spark, emb, eps=0.1, keep="random")
