"""Multi-index (alias) search — Lucene MultiReader / ES alias analog.

The contract under test: ``search_multi`` over an alias of indexes is
score-identical to ``search`` over ONE index built from the union of
their documents. That holds only if stats bind globally (df summed, N
summed, avgdl from summed totals) and multi-term expansion caps against
the union dictionary — both pinned here.
"""

import subprocess
import sys

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.multi import attach_docmap_multi, search_multi
from ostrich_spark.query.parser import AllQuery, PrefixQuery, parse_query
from ostrich_spark.schema import Schema

# split chosen so per-index stats genuinely differ from global ones:
# 'spark' df: A=2, B=3 (global 5); 'sparse' df: A=3, B=0 (global 3) —
# a per-index cap-1 prefix expansion on A would pick 'sparse', the
# global one picks 'spark'
DOCS_A = [
    {"doc_key": 0, "text": "spark stream merge", "nchars": 18},
    {"doc_key": 1, "text": "sparse sparse matrix sparse join", "nchars": 32},
    {"doc_key": 2, "text": "spark spark shuffle sparse", "nchars": 26},
    {"doc_key": 3, "text": "sparse vector stream", "nchars": 20},
]
DOCS_B = [
    {"doc_key": 4, "text": "spark stream stream window", "nchars": 26},
    {"doc_key": 5, "text": "spark join window", "nchars": 17},
    {"doc_key": 6, "text": "merge policy segment", "nchars": 20},
    {"doc_key": 7, "text": "spark stream", "nchars": 12},
    {"doc_key": 8, "text": "window window join", "nchars": 18},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    s.add_numeric_field("nchars", "long")
    return s


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("alias")
    paths = {}
    for name, docs, parts in (
        ("a", DOCS_A, 2),
        ("b", DOCS_B, 2),
        ("full", DOCS_A + DOCS_B, 3),
    ):
        p = str(tmp / name)
        build_index(
            spark, spark.createDataFrame(docs), _schema(), p,
            num_partitions=parts, order_col="doc_key", id_cols=["doc_key"],
        )
        paths[name] = p
    return paths


def _alias_hits(spark, paths, query, **kw):
    res, cnt = search_multi(spark, [paths["a"], paths["b"]], query, **kw)
    rows = attach_docmap_multi(
        spark, [paths["a"], paths["b"]], res
    ).select("doc_key", "score").collect()
    return sorted(
        [(r["doc_key"], round(r["score"], 9)) for r in rows],
        key=lambda t: (-t[1], t[0]),
    ), cnt


def _full_hits(spark, paths, query, **kw):
    res, cnt = search(spark, paths["full"], query, **kw)
    rows = attach_docmap(spark, paths["full"], res).select("doc_key", "score").collect()
    return sorted(
        [(r["doc_key"], round(r["score"], 9)) for r in rows],
        key=lambda t: (-t[1], t[0]),
    ), cnt


@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
@pytest.mark.parametrize(
    "query",
    [
        "text:spark",
        "text:spark OR text:window",
        "text:spark AND text:stream",
        'text:"spark stream"',
        'text:"spark str*"',  # phrase-prefix: union-dictionary expansion
        'text:"spark w*"~2',
    ],
)
def test_alias_score_identity(spark, indexes, query, scorer):
    """Term / OR / AND / phrase / phrase-prefix over the alias == the
    merged index, score-identical (global df, N, avgdl; the prefix
    expands against the UNION dictionary)."""
    got, _ = _alias_hits(spark, indexes, query, limit=None, scorer=scorer)
    want, _ = _full_hits(spark, indexes, query, limit=None, scorer=scorer)
    assert got == want and got


def test_alias_topk_and_order(spark, indexes):
    """Global top-3 carries the same (doc, score) set as the merged
    index's top-3, and rows come back in the pinned global order."""
    res, _ = search_multi(
        spark, [indexes["a"], indexes["b"]], "text:spark OR text:stream", limit=3
    )
    rows = res.collect()
    assert len(rows) == 3
    order = [(r["score"], r["index_ord"], r["segment_ord"], r["doc"]) for r in rows]
    assert order == sorted(order, key=lambda t: (-t[0], t[1], t[2], t[3]))
    got = sorted(round(r["score"], 9) for r in rows)
    want_res, _ = search(spark, indexes["full"], "text:spark OR text:stream", limit=3)
    want = sorted(round(r["score"], 9) for r in want_res.collect())
    assert got == want


def test_alias_with_count_sums(spark, indexes):
    got, gc = _alias_hits(
        spark, indexes, "text:spark OR text:window", limit=None, with_count=True
    )
    want, wc = _full_hits(
        spark, indexes, "text:spark OR text:window", limit=None, with_count=True
    )
    assert gc == wc == len(got) and got == want


def test_alias_all_query_count(spark, indexes):
    """AllQuery over the alias: every doc of every index, count summed
    index-locally (regression for the stats_override all-count path)."""
    got, cnt = _alias_hits(spark, indexes, AllQuery(), limit=None, with_count=True)
    assert cnt == len(DOCS_A) + len(DOCS_B)
    assert [d for d, _ in got] == sorted(d["doc_key"] for d in DOCS_A + DOCS_B)


def test_alias_range_in_boolean(spark, indexes):
    """Numeric range rides the per-index aux cogroup under the alias."""
    q = "text:spark AND nchars:[20 TO *]"
    got, _ = _alias_hits(spark, indexes, q, limit=None)
    want, _ = _full_hits(spark, indexes, q, limit=None)
    assert got == want and got


def test_alias_multiterm_global_cap(spark, indexes):
    """PrefixQuery 'spar*' with max_expansions=1: index A's local cap
    would pick 'sparse' (df 3 > 2 locally), the global union picks
    'spark' (df 5 > 3) — the alias must match the merged index."""
    q = PrefixQuery(0, "spar", max_expansions=1)
    got, _ = _alias_hits(spark, indexes, q, limit=None)
    want, _ = _full_hits(spark, indexes, q, limit=None)
    assert got == want
    # the merged ranking is the 'spark' docs — proof the global cap won
    assert {d for d, _ in got} == {0, 2, 4, 5, 7}


def test_alias_tombstones_visible(spark, indexes, tmp_path):
    """A delete in one index of the alias drops its docs from the merged
    result with every other score unchanged (stats frozen until purge —
    same visibility contract as single-index tombstones)."""
    import shutil

    from ostrich_spark.deletes import delete_docs

    a2 = str(tmp_path / "a_del")
    shutil.copytree(indexes["a"], a2)
    victims = spark.createDataFrame([(0,)], "doc_key long")
    assert delete_docs(spark, a2, victims, ["doc_key"]) == 1

    paths = {"a": a2, "b": indexes["b"], "full": indexes["full"]}
    got, _ = _alias_hits(spark, paths, "text:spark", limit=None)
    want, _ = _full_hits(spark, paths, "text:spark", limit=None)
    assert got == [x for x in want if x[0] != 0]


def test_alias_schema_mismatch_raises(spark, indexes, tmp_path):
    other = str(tmp_path / "other")
    s = Schema()
    s.add_text_field("body", "default")
    build_index(
        spark,
        spark.createDataFrame([{"doc_key": 9, "body": "spark"}]),
        s, other, num_partitions=1, order_col="doc_key", id_cols=["doc_key"],
    )
    with pytest.raises(ValueError, match="schema differs"):
        search_multi(spark, [indexes["a"], other], "text:spark")


def test_cli_alias_search(indexes):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", indexes["a"], "-p", indexes["b"], "-l", "4", "--count"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    hit_lines = [l for l in lines if ":" in l.split()[0] and "/" in l]
    assert len(hit_lines) == 4
    for l in hit_lines:
        addr, score = l.split()
        iord, rest = addr.split(":")
        seg, doc = rest.split("/")
        int(iord), int(seg), int(doc), float(score)
    assert any(l.startswith("count: 5") for l in lines)


def test_cli_alias_rejects_single_index_options(indexes):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", indexes["a"], "-p", indexes["b"], "--sort-by", "nchars"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 2
    assert "single-index only" in out.stderr


# --- filtered aliases (ES alias `filter`) -----------------------------------


def test_filtered_alias_scores_unchanged(spark, indexes):
    """Filter context: the filter narrows MEMBERSHIP per index, scores
    and stats stay the unfiltered alias-global ones — every surviving
    hit scores exactly its unfiltered value."""
    unfiltered, _ = _alias_hits(spark, indexes, "text:spark")
    got, cnt = _alias_hits(
        spark, indexes, "text:spark",
        alias_filters=["text:stream", None], with_count=True, limit=None,
    )
    base = dict(unfiltered)
    # index A narrowed to docs also containing 'stream' (0 survives,
    # 2 drops); index B unfiltered (4, 5, 7 keep)
    assert [k for k, _ in got] == sorted(
        [0, 4, 5, 7], key=lambda k: (-base[k], k)
    )
    for k, s in got:
        assert s == base[k]
    assert cnt == 4


def test_filtered_alias_dict_form_and_range_filter(spark, indexes):
    """Dict keyed by index dir; a numeric-range filter composes; a
    filter on BOTH indexes narrows both."""
    got, cnt = _alias_hits(
        spark, indexes, "text:spark",
        alias_filters={
            indexes["a"]: "nchars:[20 TO 100]",
            indexes["b"]: "nchars:[1 TO 20]",
        },
        with_count=True, limit=None,
    )
    # A: spark docs with nchars>=20 -> doc 2 (26); B: <=20 -> 5 (17), 7 (12)
    assert sorted(k for k, _ in got) == [2, 5, 7]
    assert cnt == 3


def test_filtered_alias_multiterm_filter_and_validation(spark, indexes):
    """A prefix inside a filter expands against the UNION dictionary;
    list-length and unknown-dict-key validation is loud."""
    got, _ = _alias_hits(
        spark, indexes, "text:stream",
        alias_filters=["text:spar*", "text:spar*"], limit=None,
    )
    # stream docs also containing spark/sparse...: A {0,3}, B {4,7}
    assert sorted(k for k, _ in got) == [0, 3, 4, 7]
    with pytest.raises(ValueError, match="parallel"):
        search_multi(
            spark, [indexes["a"], indexes["b"]], "text:spark",
            alias_filters=["text:x"],
        )
    with pytest.raises(ValueError, match="keys not in index_dirs"):
        search_multi(
            spark, [indexes["a"], indexes["b"]], "text:spark",
            alias_filters={"/nope": "text:x"},
        )


def test_cli_filtered_alias(indexes):
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", indexes["a"], "-p", indexes["b"],
         "--alias-filter", "text:stream", "--alias-filter", "",
         "--count", "-l", "10"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert "count: 4" in out.stdout
    # wrong arity: loud exit 2
    bad = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "search", "text:spark",
         "-p", indexes["a"], "-p", indexes["b"],
         "--alias-filter", "text:stream"],
        capture_output=True, text=True,
    )
    assert bad.returncode == 2
    assert "once per -p" in bad.stderr


# --- indices_boost (ES per-index score multiplier) --------------------------


def test_index_boosts_scale_and_rerank(spark, indexes):
    """Boosted index's hits score exactly boost x their plain value;
    the merged ranking re-sorts on boosted scores; stats/membership
    untouched. Dict and list forms agree."""
    plain, _ = _alias_hits(spark, indexes, "text:spark", limit=None)
    base = dict(plain)
    got, _ = _alias_hits(
        spark, indexes, "text:spark", limit=None,
        index_boosts=[1.0, 3.0],
    )
    a_keys = {0, 1, 2, 3}
    for k, s in got:
        exp = base[k] * (3.0 if k not in a_keys else 1.0)
        assert s == pytest.approx(exp, rel=1e-9)
    assert sorted(k for k, _ in got) == sorted(base)
    got_d, _ = _alias_hits(
        spark, indexes, "text:spark", limit=None,
        index_boosts={indexes["b"]: 3.0},
    )
    assert got_d == got
    # composes with a filtered alias: filter narrows, boost scales
    fb, _ = _alias_hits(
        spark, indexes, "text:spark", limit=None,
        alias_filters=["text:stream", None], index_boosts=[2.0, 1.0],
    )
    assert dict(fb)[0] == pytest.approx(base[0] * 2.0, rel=1e-9)
    assert set(dict(fb)) == {0, 4, 5, 7}


def test_index_boosts_validation(spark, indexes):
    dirs = [indexes["a"], indexes["b"]]
    with pytest.raises(ValueError, match="parallel"):
        search_multi(spark, dirs, "text:spark", index_boosts=[2.0])
    with pytest.raises(ValueError, match="> 0"):
        search_multi(spark, dirs, "text:spark", index_boosts=[1.0, 0.0])
    with pytest.raises(ValueError, match="keys not in"):
        search_multi(
            spark, dirs, "text:spark", index_boosts={"/nope": 2.0}
        )
