"""top_hits / top_metrics aggregations — ES analogs (EXTENSION; the
reference's collectors return one global ranking only).

Design under test:
- per-bucket top-``size`` docs under an explicit sort spec list
  (default score desc), rank 1-based, pinned (segment_ord, doc)
  tie-break appended;
- NULL sort values order LAST under either direction (ES missing:_last);
- skew-safe plan: map-side Arrow pre-prune before the bounded window
  (cap_per_group two-phase shape) — results partition-invariant;
- top_metrics = single sort spec + metric value columns only.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search, top_hits, top_metrics
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark", "query", "score"]


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    s.add_numeric_field("year")
    s.add_numeric_field("rating", "double")
    return s


@pytest.fixture(scope="module", params=[2, 5])
def th_idx(request, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"th{request.param}")
    idx = str(tmp / "idx")
    docs = [
        {
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 6)),
            "year": 2000 + i % 5,
            # every 7th doc has no rating: NULL-last behavior under test
            "rating": None if i % 7 == 0 else (i % 11) * 0.5,
        }
        for i in range(60)
    ]
    build_index(
        spark,
        spark.createDataFrame(docs, "k long, content string, year long, rating double"),
        _schema(),
        idx,
        num_partitions=request.param,
        order_col="k",
        id_cols=["k"],
        build_id=f"th-{request.param}",
    )
    return idx


def _matched_rows(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    return [r.asDict() for r in attach_docmap(spark, idx, res).collect()]


def _brute(rows, by, size, keyfns):
    """Expected (bucket -> [k ranked]) under keyfns (list of (fn, asc))."""
    import functools

    buckets = {}
    for r in rows:
        buckets.setdefault(r[by], []).append(r)

    def cmp(a, b):
        for fn, asc in keyfns:
            va, vb = fn(a), fn(b)
            # NULLs last under either direction
            if va is None and vb is None:
                continue
            if va is None:
                return 1
            if vb is None:
                return -1
            if va != vb:
                lt = va < vb
                return (-1 if lt else 1) if asc else (1 if lt else -1)
        # engine's pinned tie-break
        ta = (a["segment_ord"], a["doc"])
        tb = (b["segment_ord"], b["doc"])
        return -1 if ta < tb else 1

    return {
        y: [r["k"] for r in sorted(v, key=functools.cmp_to_key(cmp))[:size]]
        for y, v in buckets.items()
    }


def test_top_hits_score_default_vs_brute(spark, th_idx):
    """Default sort (score desc, then k asc via explicit spec) == brute
    force per bucket; ranks contiguous from 1."""
    q = "content:merge"
    rows = _matched_rows(spark, th_idx, q)
    expect = _brute(
        rows, "year", 3,
        [(lambda r: r["score"], False), (lambda r: r["k"], True)],
    )
    got = {}
    for r in top_hits(
        spark, th_idx, q, by="year", size=3,
        sort=[("score", "desc"), ("k", "asc")],
    ).collect():
        got.setdefault(r["year"], []).append((r["rank"], r["k"]))
    assert set(got) == set(expect)
    for y, pairs in got.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        assert [p[1] for p in pairs] == expect[y]


def test_top_hits_value_sort_nulls_last(spark, th_idx):
    """rating desc: NULL ratings only appear when a bucket runs out of
    non-NULL docs (ES missing:_last), and carried columns round-trip."""
    q = "content:segment"
    rows = _matched_rows(spark, th_idx, q)
    expect = _brute(
        rows, "year", 4,
        [(lambda r: r["rating"], False), (lambda r: r["k"], True)],
    )
    vals = {r["k"]: r for r in rows}
    got = {}
    for r in top_hits(
        spark, th_idx, q, by="year", size=4,
        sort=[("rating", "desc"), ("k", "asc")], columns=["k", "rating"],
    ).collect():
        got.setdefault(r["year"], []).append(r)
    assert {y: [x["k"] for x in sorted(v, key=lambda x: x["rank"])] for y, v in got.items()} == expect
    for v in got.values():
        for r in v:
            assert r["rating"] == vals[r["k"]]["rating"]


def test_top_metrics_shape_and_values(spark, th_idx):
    """top_metrics == the metric values of top_hits' docs; size=1 is the
    max_by shape."""
    q = "content:index"
    rows = _matched_rows(spark, th_idx, q)
    expect = _brute(
        rows, "year", 1,
        [(lambda r: r["rating"], False), (lambda r: r["k"], True)],
    )
    vals = {r["k"]: r["rating"] for r in rows}
    out = top_metrics(
        spark, th_idx, q, by="year", sort=("rating", "desc"),
        metrics=["rating", "k"], size=1,
    )
    assert out.columns == ["year", "rank", "rating", "k"]
    got = {r["year"]: r for r in out.collect()}
    assert set(got) == set(expect)
    for y, ks in expect.items():
        assert got[y]["k"] == ks[0]
        assert got[y]["rating"] == vals[ks[0]]


def test_top_hits_validation(spark, th_idx):
    with pytest.raises(ValueError, match="size"):
        top_hits(spark, th_idx, "content:merge", by="year", size=0)
    with pytest.raises(ValueError, match="sort column"):
        top_hits(spark, th_idx, "content:merge", by="year", sort=[("nope", "asc")])
    with pytest.raises(ValueError, match="direction"):
        top_hits(spark, th_idx, "content:merge", by="year", sort=[("rating", "down")])
    with pytest.raises(ValueError, match="bucket column"):
        top_hits(spark, th_idx, "content:merge", by="score")
    with pytest.raises(ValueError, match="column"):
        top_hits(spark, th_idx, "content:merge", by="year", columns=["nope"])
    with pytest.raises(ValueError, match="metric"):
        top_metrics(spark, th_idx, "content:merge", by="year",
                    sort=("rating", "desc"), metrics=[])
