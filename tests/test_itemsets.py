"""frequent_item_sets — ES analog as EXACT distributed Apriori
(itemsets.frequent_item_sets).

Design under test:
- all frequent sets == a driver-side brute-force enumeration of every
  field-value combination over the matched docs (counts, support,
  ranking, size cut);
- min_support ceil rule, min/max_set_size, NULL values contribute no
  item but keep the doc in the denominator;
- partition invariance (2 vs 5 segments);
- validation paths.
"""

from itertools import combinations

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.itemsets import frequent_item_sets
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark"]


def _mk_docs(n=60):
    docs = []
    for i in range(n):
        docs.append({
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 3)),
            "tag": None if i % 13 == 0 else ["aa", "bb"][i % 2],
            "grp": ["g1", "g2", "g3"][i % 3],
            "src": ["x", "y"][(i // 2) % 2],
        })
    return docs


@pytest.fixture(scope="module", params=[2, 5])
def fis_idx(request, spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("content", "default")
    s.add_keyword_field("tag")
    s.add_keyword_field("grp")
    s.add_keyword_field("src")
    tmp = tmp_path_factory.mktemp(f"fis{request.param}")
    idx = str(tmp / "idx")
    build_index(
        spark,
        spark.createDataFrame(
            _mk_docs(), "k long, content string, tag string, grp string, src string"
        ),
        s, idx, num_partitions=request.param, order_col="k", id_cols=["k"],
    )
    return idx


def _brute(spark, idx, q, fields, min_support, min_set_size, max_set_size):
    import math

    res, _ = search(spark, idx, q, limit=None)
    rows = [r.asDict() for r in attach_docmap(spark, idx, res).collect()]
    n = len(rows)
    min_count = max(1, math.ceil(min_support * n))
    counts = {}
    for r in rows:
        items = sorted(
            f"{f}={r[f]}" for f in fields if r[f] is not None
        )
        for sz in range(1, min(len(items), max_set_size) + 1):
            for combo in combinations(items, sz):
                counts[combo] = counts.get(combo, 0) + 1
    out = [
        (",".join(c), len(c), v, v / n)
        for c, v in counts.items()
        if v >= min_count and len(c) >= min_set_size
    ]
    out.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return out, n


def test_all_frequent_sets_vs_brute(spark, fis_idx):
    q = "content:merge"
    expect, _ = _brute(
        spark, fis_idx, q, ["tag", "grp", "src"], 0.1, 1, 3
    )
    got = [
        (r["items"], r["set_size"], r["support_count"], r["support"])
        for r in frequent_item_sets(
            spark, fis_idx, q, ["tag", "grp", "src"],
            min_support=0.1, size=1000,
        ).collect()
    ]
    assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in expect]
    for g, e in zip(got, expect):
        assert abs(g[3] - e[3]) < 1e-12


def test_support_threshold_and_set_size_filters(spark, fis_idx):
    q = "content:spark"
    # higher support bar prunes sets; min_set_size=2 drops singles
    expect, n = _brute(spark, fis_idx, q, ["tag", "grp"], 0.25, 2, 2)
    got = [
        (r["items"], r["set_size"], r["support_count"])
        for r in frequent_item_sets(
            spark, fis_idx, q, ["tag", "grp"],
            min_support=0.25, min_set_size=2, size=1000,
        ).collect()
    ]
    assert got == [(a, b, c) for a, b, c, _ in expect]
    assert all(b == 2 for _, b, _ in got)
    # max_set_size=1 mines only singles
    singles = frequent_item_sets(
        spark, fis_idx, q, ["tag", "grp"], min_support=0.1,
        max_set_size=1, size=1000,
    ).collect()
    assert all(r["set_size"] == 1 for r in singles)


def test_size_cut_and_null_denominator(spark, fis_idx):
    q = "content:policy"
    expect, n = _brute(
        spark, fis_idx, q, ["tag", "grp", "src"], 0.05, 1, 3
    )
    got = frequent_item_sets(
        spark, fis_idx, q, ["tag", "grp", "src"], min_support=0.05, size=5,
    ).collect()
    assert len(got) == 5
    assert [(r["items"], r["support_count"]) for r in got] == [
        (a, c) for a, _, c, _ in expect[:5]
    ]
    # support denominators include tag-NULL docs (they matched the query)
    res, _ = search(spark, fis_idx, q, limit=None)
    n_matched = res.count()
    for r in got:
        assert abs(r["support"] - r["support_count"] / n_matched) < 1e-12


def test_validation(spark, fis_idx):
    with pytest.raises(ValueError, match="field"):
        frequent_item_sets(spark, fis_idx, "content:merge", [])
    with pytest.raises(ValueError, match="duplicate"):
        frequent_item_sets(spark, fis_idx, "content:merge", ["tag", "tag"])
    with pytest.raises(ValueError, match="min_support"):
        frequent_item_sets(spark, fis_idx, "content:merge", ["tag"], min_support=0.0)
    with pytest.raises(ValueError, match="min_set_size"):
        frequent_item_sets(spark, fis_idx, "content:merge", ["tag"], min_set_size=0)
    with pytest.raises(ValueError, match="max_set_size"):
        frequent_item_sets(
            spark, fis_idx, "content:merge", ["tag", "grp"],
            min_set_size=2, max_set_size=1,
        )
    with pytest.raises(ValueError, match="docmap column"):
        frequent_item_sets(spark, fis_idx, "content:merge", ["nope"])
    # unmatched query -> empty frame with the contract schema
    empty = frequent_item_sets(spark, fis_idx, "content:zzzmissing", ["tag"])
    assert empty.count() == 0
    assert empty.columns == ["items", "set_size", "support_count", "support"]


def test_df_mode_identical_to_driver(spark, fis_idx):
    """driver_cap=0 forces the all-DataFrame Apriori; its ranked output
    must be row-identical to the driver-candidate mode (same data, same
    contract — the mode is a physical choice, not a semantic one)."""
    q = "content:merge"
    kw = dict(min_support=0.1, size=1000)
    want = [
        tuple(r) for r in frequent_item_sets(
            spark, fis_idx, q, ["tag", "grp", "src"], **kw
        ).collect()
    ]
    got = [
        tuple(r) for r in frequent_item_sets(
            spark, fis_idx, q, ["tag", "grp", "src"], driver_cap=0, **kw
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_df_mode_wide_l1_no_driver_loop(spark, monkeypatch):
    """|L1| >= 10k items: the DF path must engage (driver Apriori
    monkeypatched to fail loudly — proving no O(|L1|^2) driver pair
    loop runs) and still mine the planted frequent sets exactly.

    10_000 singleton items (each in its own transaction) would make
    L1 x L1 candidate generation 10^8 pairs; generation-from-data keeps
    level 2 at the actual co-occurrences (30 planted transactions)."""
    from itertools import combinations as _combos

    import ostrich_spark.itemsets as it

    def _boom(*a, **k):
        raise AssertionError("driver-side Apriori must not run for wide L1")

    monkeypatch.setattr(it, "_mine_driver", _boom)

    # 10_000 distinct items, each frequent via 10 single-item
    # transactions (no co-occurrence) -> |L1| = 10_004 > driver_cap
    rows = [
        (0, i * 10 + rep, f"u={i:05d}")
        for i in range(10_000) for rep in range(10)
    ]
    base = 100_000
    # 30 planted transactions over 4 shared items: {A,B,C} x20, {A,B,D} x10
    for t in range(30):
        items = ("f=A", "g=B", "h=C") if t < 20 else ("f=A", "g=B", "i=D")
        for itname in items:
            rows.append((1, base + t, itname))
    exploded = spark.createDataFrame(
        rows, "segment_id long, doc long, item string"
    ).repartition(8)
    n = 100_030
    got = it.mine_itemsets(
        spark, exploded, n=n, min_count=10, max_set_size=4, size=20_000,
        driver_cap=2048,
    ).collect()

    # brute force: every singleton at count 10, plus the planted combos
    tx = (
        [(f"u={i:05d}",) for i in range(10_000) for _ in range(10)]
        + [("f=A", "g=B", "h=C")] * 20
        + [("f=A", "g=B", "i=D")] * 10
    )
    counts = {}
    for items in tx:
        for sz in range(1, 4):
            for c in _combos(sorted(items), sz):
                counts[c] = counts.get(c, 0) + 1
    want = sorted(
        ((",".join(c), len(c), v, v / n) for c, v in counts.items() if v >= 10),
        key=lambda r: (-r[2], -r[1], r[0]),
    )
    assert [(r["items"], r["set_size"], r["support_count"]) for r in got] == \
        [(a, b, c) for a, b, c, _ in want]
    for g, e in zip(got, want):
        assert abs(g["support"] - e[3]) < 1e-12


def test_max_l1_loud_cap(spark):
    from ostrich_spark.itemsets import mine_itemsets

    exploded = spark.createDataFrame(
        [(0, i, f"u={i}") for i in range(200)],
        "segment_id long, doc long, item string",
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="max_l1"):
        mine_itemsets(spark, exploded, n=200, min_count=1, max_l1=100)


def test_l1_bound_skips_count_job(spark, monkeypatch):
    """When the caller's analytic |L1| bound fits under driver_cap, the
    standalone L1 count job must be skipped (driver mode's collect IS
    the measurement) and the ranked output must be unchanged."""
    from ostrich_spark.itemsets import mine_itemsets

    rows = [
        (0, d, it_)
        for d in range(40)
        for it_ in (("a=1", "b=2") if d % 2 else ("a=1", "c=3"))
    ]
    exploded = spark.createDataFrame(
        rows, "segment_id long, doc long, item string"
    )
    want = [tuple(r) for r in mine_itemsets(
        spark, exploded, n=40, min_count=10, size=100,
    ).collect()]

    calls = []
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract base in Spark 4; instances don't dispatch through it)
    cdf = type(exploded)
    real_count = cdf.count
    monkeypatch.setattr(
        cdf, "count",
        lambda self: (calls.append(1), real_count(self))[1],
    )
    got = [tuple(r) for r in mine_itemsets(
        spark, exploded, n=40, min_count=10, size=100, l1_bound=8,
    ).collect()]
    assert got == want and len(got) >= 3
    assert not calls, f"l1_bound path ran {len(calls)} DataFrame.count job(s)"

    # an over-cap bound falls back to the measured-count mode pick
    calls.clear()
    got2 = [tuple(r) for r in mine_itemsets(
        spark, exploded, n=40, min_count=10, size=100, l1_bound=99_999,
    ).collect()]
    assert got2 == want and calls

    # bound path with an empty L1 yields the empty contract frame
    empty = mine_itemsets(
        spark, exploded, n=40, min_count=1000, size=10, l1_bound=1,
    )
    assert empty.count() == 0
    assert empty.columns == ["items", "set_size", "support_count", "support"]
