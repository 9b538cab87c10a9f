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
