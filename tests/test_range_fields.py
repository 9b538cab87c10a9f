"""Range doc-value fields — ES long_range/double_range analog
(schema.RANGE_FIELD_TYPES, RangeFieldQuery).

Design under test:
- "lo,hi" build input → two typed docmap columns; point range "v";
  NULL = no range; lo>hi and non-integer long_range raise;
- intersects/within/contains vs brute force, ALL bounds inclusive
  (exact-boundary docs included), open ends, NULL never matches;
- FILTER context beside scored text (score invariance), exists,
  NQL rejection, sort/facet rejection;
- merge carries the bound columns.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    FILTER,
    MUST,
    BooleanQuery,
    QueryParseError,
    RangeFieldQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

WORDS = ["merge", "policy", "segment", "index", "spark"]


def _mk_docs(n=50):
    docs = []
    for i in range(n):
        if i % 11 == 0:
            rng = None  # no range
        elif i % 7 == 0:
            rng = f"{i}"  # point range [i, i]
        else:
            rng = f"{i},{i + (i % 9)}"
        docs.append({
            "k": i,
            "content": " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 3)),
            "valid": rng,
            "ratio": None if i % 13 == 0 else f"{i * 0.5}, {i * 0.5 + 2.25}",
        })
    return docs


def _iv(d, f):
    v = d[f]
    if v is None:
        return None
    parts = [p.strip() for p in str(v).split(",")]
    lo = float(parts[0])
    hi = float(parts[1]) if len(parts) > 1 else lo
    return lo, hi


def _brute(field, rel, qlo, qhi):
    out = set()
    for d in _mk_docs():
        iv = _iv(d, field)
        if iv is None:
            continue
        lo, hi = iv
        if rel == "intersects":
            ok = (qhi is None or lo <= qhi) and (qlo is None or hi >= qlo)
        elif rel == "within":
            ok = (qlo is None or lo >= qlo) and (qhi is None or hi <= qhi)
        else:
            ok = (qlo is None or lo <= qlo) and (qhi is None or hi >= qhi)
        if ok:
            out.add(d["k"])
    return out


@pytest.fixture(scope="module")
def rf_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("content", "default")
    s.add_range_field("valid", "long_range")
    s.add_range_field("ratio", "double_range")
    idx = str(tmp_path_factory.mktemp("rf") / "idx")
    build_index(
        spark,
        spark.createDataFrame(
            _mk_docs(), "k long, content string, valid string, ratio string"
        ),
        s, idx, num_partitions=3, order_col="k", id_cols=["k"],
    )
    return idx


def _ks(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    return {r["k"] for r in attach_docmap(spark, idx, res).collect()}


def test_relations_vs_brute(spark, rf_idx):
    cases = [
        ("intersects", 10, 30), ("within", 5, 40), ("contains", 20, 21),
        # exact-boundary inclusivity: doc 12 is [12, 15]
        ("intersects", 15, 15), ("within", 12, 15), ("contains", 12, 15),
        # open ends
        ("intersects", None, 8), ("within", 30, None), ("contains", None, 3),
    ]
    for rel, lo, hi in cases:
        got = _ks(spark, rf_idx, RangeFieldQuery(1, rel, lo, hi))
        assert got == _brute("valid", rel, lo, hi), (rel, lo, hi)
    # double_range field with fractional bounds
    got = _ks(spark, rf_idx, RangeFieldQuery(2, "intersects", 3.25, 7.75))
    assert got == _brute("ratio", "intersects", 3.25, 7.75)


def test_filter_context_and_exists(spark, rf_idx):
    base = {}
    res, _ = search(spark, rf_idx, "content:merge", limit=None)
    for r in attach_docmap(spark, rf_idx, res).collect():
        base[r["k"]] = r["score"]
    from ostrich_spark.query.parser import TermQuery

    q = BooleanQuery([
        (MUST, TermQuery(0, "merge")),
        (FILTER, RangeFieldQuery(1, "intersects", 10, 30)),
    ])
    res, _ = search(spark, rf_idx, q, limit=None)
    rows = attach_docmap(spark, rf_idx, res).collect()
    want = set(base) & _brute("valid", "intersects", 10, 30)
    assert {r["k"] for r in rows} == want
    for r in rows:  # FILTER never moves scores
        assert r["score"] == base[r["k"]]
    # exists == every doc with a range
    assert _ks(spark, rf_idx, "valid:*") == {
        d["k"] for d in _mk_docs() if d["valid"] is not None
    }


def test_nql_and_sort_facet_rejection(spark, rf_idx):
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import multi_terms, search_sorted

    mf = load_manifest(rf_idx)
    with pytest.raises(QueryParseError, match="range field"):
        parse_query("valid:5", mf.schema)
    with pytest.raises(ValueError, match="range field"):
        search_sorted(spark, rf_idx, "content:merge", "valid")
    with pytest.raises(ValueError, match="range field"):
        multi_terms(spark, rf_idx, "content:merge", ["valid", "k"])


def test_query_validation(spark, rf_idx):
    with pytest.raises(QueryParseError, match="relation"):
        RangeFieldQuery(1, "overlaps", 1, 2)
    with pytest.raises(QueryParseError, match="bound"):
        RangeFieldQuery(1, "intersects", None, None)
    with pytest.raises(QueryParseError, match="inverted"):
        RangeFieldQuery(1, "intersects", 5, 1)
    # range_field op on a non-range field refuses loudly
    with pytest.raises(Exception, match="non-range"):
        _ks(spark, rf_idx, RangeFieldQuery(0, "intersects", 1, 2))


def test_build_validation(spark, tmp_path):
    s = Schema()
    s.add_text_field("content", "default")
    s.add_range_field("r", "long_range")
    with pytest.raises(Exception, match="lo > hi"):
        build_index(
            spark,
            spark.createDataFrame([(0, "a", "9,3")], "k long, content string, r string"),
            s, str(tmp_path / "bad1"), num_partitions=1, order_col="k",
            id_cols=["k"],
        )
    with pytest.raises(Exception, match="integer"):
        build_index(
            spark,
            spark.createDataFrame([(0, "a", "1.5,3")], "k long, content string, r string"),
            s, str(tmp_path / "bad2"), num_partitions=1, order_col="k",
            id_cols=["k"],
        )
    with pytest.raises(ValueError, match="range_type"):
        Schema().add_range_field("x", "int_range")


def test_merge_carries_ranges(spark, rf_idx, tmp_path):
    import shutil

    from ostrich_spark.merge import merge_segments

    from ostrich_spark.manifest import load_manifest

    idx = str(tmp_path / "m")
    shutil.copytree(rf_idx, idx)
    before = _ks(spark, idx, RangeFieldQuery(1, "intersects", 10, 30))
    m = load_manifest(idx)
    merge_segments(spark, idx, [s.segment_id for s in m.segments], "mrg-0")
    from ostrich_spark.query.exec import invalidate_cache

    invalidate_cache(idx)
    assert _ks(spark, idx, RangeFieldQuery(1, "intersects", 10, 30)) == before


def test_cli_range_rel(spark, rf_idx):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search",
         "content:merge", "-p", rf_idx,
         "--range-rel", "valid=intersects:10,30", "--count"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    want = _brute("valid", "intersects", 10, 30)
    res, _ = search(spark, rf_idx, "content:merge", limit=None)
    base = {r["k"] for r in attach_docmap(spark, rf_idx, res).collect()}
    assert f"count: {len(base & want)}" in out.stdout
    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search",
         "content:merge", "-p", rf_idx, "--range-rel", "valid=overlaps:1,2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert bad.returncode == 2


def test_batched_identity(spark, rf_idx):
    """search_many carries the range_field wire identically to the
    single-query path (the generic CRange aux delivery)."""
    from ostrich_spark.query.exec import search_many
    from ostrich_spark.query.parser import TermQuery

    q = BooleanQuery([
        (MUST, TermQuery(0, "merge")),
        (FILTER, RangeFieldQuery(1, "intersects", 10, 30)),
    ])
    single, _ = search(spark, rf_idx, q, limit=None)
    batch = search_many(spark, rf_idx, {"a": q}, limit=None)
    ks = sorted((r["segment_ord"], r["doc"], round(r["score"], 9))
                for r in single.collect())
    kb = sorted((r["segment_ord"], r["doc"], round(r["score"], 9))
                for r in batch.filter("query_id = 'a'").collect())
    assert ks == kb and ks
