"""Field collapsing (one champion per group), function score (doc-value
boost), and two-phase rescoring — Lucene/ES analogs, all EXTENSIONS.
Each is verified against brute-force recomputation from the engine's own
exhaustive match set (rank identity, not just row counts)."""

import math

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import (
    attach_docmap,
    rescore,
    search,
    search_boosted,
    search_collapsed,
)
from ostrich_spark.schema import Schema

DOCS = [
    # grp a: doc 0 scores best on "spark" (tf 3), doc 1 lower
    {"doc_key": 0, "grp": "a", "pop": 1, "text": "spark spark spark"},
    {"doc_key": 1, "grp": "a", "pop": 50, "text": "spark join"},
    # grp b: doc 2 only member matching
    {"doc_key": 2, "grp": "b", "pop": 9, "text": "spark window stream"},
    {"doc_key": 3, "grp": "b", "pop": 2, "text": "window only here"},
    # grp c: tie shapes + a phrase target
    {"doc_key": 4, "grp": "c", "pop": 0, "text": "spark hash join fast"},
    {"doc_key": 5, "grp": "c", "pop": 30, "text": "join hash spark"},
    # null group + missing pop
    {"doc_key": 6, "grp": None, "pop": None, "text": "spark alone"},
    {"doc_key": 7, "grp": None, "pop": 4, "text": "spark also alone"},
]


@pytest.fixture(scope="module")
def cb_index(spark, tmp_path_factory):
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    schema.add_numeric_field("pop")
    idx = str(tmp_path_factory.mktemp("cb") / "idx")
    build_index(
        spark,
        spark.createDataFrame(
            DOCS, "doc_key long, grp string, pop long, text string"
        ),
        schema,
        idx,
        num_partitions=3,
        order_col="doc_key",
        id_cols=["doc_key", "grp"],
    )
    return idx


def _exhaustive(spark, idx, query, scorer="tfidf"):
    """(doc_key, grp, pop, score, segment_ord, doc) of every match."""
    res, _ = search(spark, idx, query, limit=None, scorer=scorer)
    return {
        r["doc_key"]: r
        for r in attach_docmap(spark, idx, res)
        .select("doc_key", "grp", "pop", "score", "segment_ord", "doc")
        .collect()
    }


# ---------------------------------------------------------------------------
# collapse
# ---------------------------------------------------------------------------


def test_collapse_champion_per_group(spark, cb_index):
    got = search_collapsed(spark, cb_index, "text:spark", "grp", limit=None)
    rows = got.collect()
    # every match group appears exactly once
    grps = [r["grp"] for r in rows]
    assert len(grps) == len(set(grps))
    # brute force from the exhaustive match set
    full = _exhaustive(spark, cb_index, "text:spark")
    best = {}
    for r in full.values():
        key = r["grp"]
        cur = best.get(key)
        cand = (-r["score"], r["segment_ord"], r["doc"])
        if cur is None or cand < cur[0]:
            best[key] = (cand, r)
    want = {g: r["doc"] for g, (_, r) in best.items()}
    got_docs = {r["grp"]: r["doc"] for r in rows}
    assert got_docs == want
    # ranked by the pinned total order
    keys = [(-r["score"], r["segment_ord"], r["doc"]) for r in rows]
    assert keys == sorted(keys)


def test_collapse_null_group_collapses_together(spark, cb_index):
    rows = search_collapsed(spark, cb_index, "text:spark", "grp", limit=None).collect()
    nulls = [r for r in rows if r["grp"] is None]
    assert len(nulls) == 1  # docs 6 and 7 both match; one champion


def test_collapse_limit_offset(spark, cb_index):
    all_rows = search_collapsed(spark, cb_index, "text:spark", "grp", limit=None).collect()
    top2 = search_collapsed(spark, cb_index, "text:spark", "grp", limit=2).collect()
    page2 = search_collapsed(
        spark, cb_index, "text:spark", "grp", limit=2, offset=2
    ).collect()
    assert [r["doc"] for r in top2] == [r["doc"] for r in all_rows[:2]]
    assert [r["doc"] for r in page2] == [r["doc"] for r in all_rows[2:4]]


def test_collapse_unknown_column_raises(spark, cb_index):
    with pytest.raises(ValueError, match="collapse column"):
        search_collapsed(spark, cb_index, "text:spark", "nope")


# ---------------------------------------------------------------------------
# function score
# ---------------------------------------------------------------------------


def test_boost_multiply_values(spark, cb_index):
    full = _exhaustive(spark, cb_index, "text:spark", scorer="bm25")
    rows = search_boosted(
        spark, cb_index, "text:spark", "pop", weight=0.1, mode="multiply",
        limit=None, scorer="bm25",
    ).collect()
    assert {r["doc"] for r in rows} == {v["doc"] for v in full.values()}
    by_doc = {(r["segment_ord"], r["doc"]): r for r in rows}
    for v in full.values():
        r = by_doc[(v["segment_ord"], v["doc"])]
        pop = v["pop"] or 0
        assert math.isclose(r["base_score"], v["score"], rel_tol=1e-12)
        assert math.isclose(
            r["score"], v["score"] * (1.0 + 0.1 * pop), rel_tol=1e-12
        )
    # ordered by combined score
    keys = [(-r["score"], r["segment_ord"], r["doc"]) for r in rows]
    assert keys == sorted(keys)


def test_boost_sum_and_reorder(spark, cb_index):
    # plain relevance ranks doc 0 first ("spark spark spark"); a strong
    # popularity signal must promote doc 1 (pop=50) over it
    plain, _ = search(spark, cb_index, "text:spark", limit=1)
    assert attach_docmap(spark, cb_index, plain).collect()[0]["doc_key"] == 0
    boosted = search_boosted(
        spark, cb_index, "text:spark", "pop", weight=1.0, mode="sum", limit=1
    )
    top = attach_docmap(spark, cb_index, boosted.drop("pop")).collect()[0]
    assert top["doc_key"] == 1


def test_boost_null_value_keeps_base(spark, cb_index):
    rows = search_boosted(
        spark, cb_index, "text:spark", "pop", weight=9.9, mode="multiply", limit=None
    ).collect()
    null_row = [r for r in rows if r["pop"] is None]
    assert null_row and all(
        math.isclose(r["score"], r["base_score"], rel_tol=1e-12) for r in null_row
    )


def test_boost_validation(spark, cb_index):
    with pytest.raises(ValueError, match="mode"):
        search_boosted(spark, cb_index, "text:spark", "pop", mode="max")
    with pytest.raises(Exception):
        search_boosted(spark, cb_index, "text:spark", "text")  # not numeric


# ---------------------------------------------------------------------------
# rescore
# ---------------------------------------------------------------------------


def test_rescore_values_and_order(spark, cb_index):
    base_full = _exhaustive(spark, cb_index, "text:spark OR text:join")
    phrase_full = _exhaustive(spark, cb_index, 'text:"hash join"')
    got = rescore(
        spark, cb_index, "text:spark OR text:join", 'text:"hash join"',
        window=100, weight=2.0, limit=None,
    ).collect()
    assert {r["doc"] for r in got} == {v["doc"] for v in base_full.values()}
    for r in got:
        dk = [k for k, v in base_full.items()
              if (v["segment_ord"], v["doc"]) == (r["segment_ord"], r["doc"])][0]
        want_r = phrase_full[dk]["score"] if dk in phrase_full else 0.0
        assert math.isclose(r["rescore_score"], want_r, rel_tol=1e-12)
        assert math.isclose(
            r["score"], base_full[dk]["score"] + 2.0 * want_r, rel_tol=1e-12
        )
    keys = [(-r["score"], r["segment_ord"], r["doc"]) for r in got]
    assert keys == sorted(keys)


def test_rescore_window_bounds_candidates(spark, cb_index):
    # window=2 keeps only the top-2 first-pass docs: a doc outside that
    # window never surfaces, however strong its rescore match
    base, _ = search(spark, cb_index, "text:spark", limit=2)
    window_docs = {(r["segment_ord"], r["doc"]) for r in base.collect()}
    got = rescore(
        spark, cb_index, "text:spark", 'text:"hash join"',
        window=2, weight=100.0, limit=None,
    ).collect()
    assert {(r["segment_ord"], r["doc"]) for r in got} == window_docs


def test_rescore_validation(spark, cb_index):
    with pytest.raises(ValueError, match="window"):
        rescore(spark, cb_index, "text:spark", "text:join", window=0)


def test_collapse_plan_partial_agg_no_window(spark, cb_index):
    """Scale contract: the champion is a map-side partial min_by, never
    a Window (row_number would shuffle every match per group)."""
    df = search_collapsed(spark, cb_index, "text:spark", "grp", limit=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# grouped top-N (search_grouped)
# ---------------------------------------------------------------------------


def _brute_grouped(full, per_group):
    """Expected grouping from the exhaustive match set: group order =
    champion key asc, within-group order = pinned total order."""
    groups = {}
    for r in full.values():
        groups.setdefault(r["grp"], []).append(r)
    hits = {}
    for g, rows in groups.items():
        rows.sort(key=lambda r: (-r["score"], r["segment_ord"], r["doc"]))
        hits[g] = rows[:per_group]
    order = sorted(
        hits,
        key=lambda g: (
            -hits[g][0]["score"],
            hits[g][0]["segment_ord"],
            hits[g][0]["doc"],
        ),
    )
    return order, hits


def test_grouped_matches_bruteforce(spark, cb_index):
    from ostrich_spark.query.exec import search_grouped

    full = _exhaustive(spark, cb_index, "text:spark")
    order, hits = _brute_grouped(full, per_group=2)
    got = search_grouped(
        spark, cb_index, "text:spark", "grp", per_group=2, groups=None
    ).collect()
    want = [
        (gi + 1, hi + 1, r["segment_ord"], r["doc"], r["score"])
        for gi, g in enumerate(order)
        for hi, r in enumerate(hits[g])
    ]
    assert [
        (r["group_rank"], r["hit_rank"], r["segment_ord"], r["doc"], r["score"])
        for r in got
    ] == want
    # group value rides along, including the NULL group
    by_rank = {r["group_rank"]: r["grp"] for r in got}
    assert by_rank == {gi + 1: g for gi, g in enumerate(order)}


def test_grouped_per_group1_equals_collapse(spark, cb_index):
    from ostrich_spark.query.exec import search_grouped

    champs = search_collapsed(
        spark, cb_index, "text:spark", "grp", limit=None
    ).collect()
    got = search_grouped(
        spark, cb_index, "text:spark", "grp", per_group=1, groups=None
    ).collect()
    assert [(r["segment_ord"], r["doc"]) for r in got] == [
        (r["segment_ord"], r["doc"]) for r in champs
    ]
    assert all(r["hit_rank"] == 1 for r in got)


def test_grouped_group_paging_tiles(spark, cb_index):
    from ostrich_spark.query.exec import search_grouped

    all_rows = search_grouped(
        spark, cb_index, "text:spark", "grp", per_group=2, groups=None
    ).collect()
    n_groups = max(r["group_rank"] for r in all_rows)
    paged = []
    for off in range(n_groups):
        page = search_grouped(
            spark, cb_index, "text:spark", "grp",
            per_group=2, groups=1, group_offset=off,
        ).collect()
        assert all(r["group_rank"] == 1 for r in page)
        paged.extend((r["grp"], r["hit_rank"], r["doc"]) for r in page)
    assert paged == [(r["grp"], r["hit_rank"], r["doc"]) for r in all_rows]


def test_grouped_prune_survives_tiny_batches(spark, cb_index):
    """The map-side pre-prune keeps per-batch top-N; the union across
    batches must recover the global top-N for ANY batching — force
    1-row Arrow batches and demand the identical result."""
    from ostrich_spark.query.exec import search_grouped

    want = [
        (r["group_rank"], r["hit_rank"], r["doc"], r["score"])
        for r in search_grouped(
            spark, cb_index, "text:spark OR text:join", "grp",
            per_group=2, groups=None,
        ).collect()
    ]
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "1")
    try:
        got = [
            (r["group_rank"], r["hit_rank"], r["doc"], r["score"])
            for r in search_grouped(
                spark, cb_index, "text:spark OR text:join", "grp",
                per_group=2, groups=None,
            ).collect()
        ]
    finally:
        spark.conf.set(key, old)
    assert got == want


def test_grouped_tiebreak_column(spark, cb_index):
    """doc_key tiebreak makes within-group order layout-independent on
    full-precision score ties (docs 6/7 score identically on
    text:alone: same tf, same dl-free tfidf)."""
    from ostrich_spark.query.exec import search_grouped

    got = search_grouped(
        spark, cb_index, "text:alone", "grp",
        per_group=2, groups=None, tiebreak=["doc_key"],
    ).collect()
    docmap = {r["doc_key"]: r for r in _exhaustive(spark, cb_index, "text:alone").values()}
    assert len(got) == 2
    assert got[0]["score"] == got[1]["score"]
    # tiebreak asc: doc_key 6 before 7 regardless of segment layout
    assert (got[0]["segment_ord"], got[0]["doc"]) == (
        docmap[6]["segment_ord"], docmap[6]["doc"],
    )


def test_grouped_validation(spark, cb_index):
    from ostrich_spark.query.exec import search_grouped

    with pytest.raises(ValueError, match="group column"):
        search_grouped(spark, cb_index, "text:spark", "nope")
    with pytest.raises(ValueError, match="per_group"):
        search_grouped(spark, cb_index, "text:spark", "grp", per_group=0)


def test_grouped_plan_no_window_over_matches(spark, cb_index):
    """Scale contract: no Window touches the raw match set — the only
    Window ranks one-row-per-group AFTER the bounded global sort; the
    per-group hit lists come from the batch-pruned collect_list."""
    from ostrich_spark.query.exec import search_grouped

    df = search_grouped(spark, cb_index, "text:spark", "grp", per_group=2, groups=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the group ranking window must sit above the TakeOrderedAndProject
    # (bounded rows), never below the aggregation
    assert "TakeOrderedAndProject" in plan
    win = plan.find("Window")
    agg_last = plan.rfind("ObjectHashAggregate")
    if win == -1:
        win = plan.find("WindowGroupLimit")
    assert win != -1 and agg_last != -1 and win < agg_last


# ---------------------------------------------------------------------------
# export_hits (distributed export-all-matches)
# ---------------------------------------------------------------------------


def test_export_hits_matches_search(spark, cb_index, tmp_path):
    from ostrich_spark.query.exec import export_hits

    out = str(tmp_path / "hits")
    n = export_hits(spark, cb_index, "text:spark OR text:join", out)
    full = _exhaustive(spark, cb_index, "text:spark OR text:join")
    back = spark.read.parquet(out).collect()
    assert n == len(back) == len(full)
    got = {r["doc_key"]: (r["segment_ord"], r["doc"], round(r["score"], 9)) for r in back}
    want = {
        k: (v["segment_ord"], v["doc"], round(v["score"], 9)) for k, v in full.items()
    }
    assert got == want
    # identity + grp column present (docmap columns ride along)
    assert "grp" in back[0].asDict()


def test_export_hits_column_selection_and_errors(spark, cb_index, tmp_path):
    from ostrich_spark.query.exec import export_hits

    out = str(tmp_path / "hits2")
    export_hits(spark, cb_index, "text:spark", out, columns=["doc_key"])
    cols = set(spark.read.parquet(out).schema.names)
    assert "doc_key" in cols and "score" in cols and "grp" not in cols
    with pytest.raises(ValueError, match="export columns"):
        export_hits(spark, cb_index, "text:spark", str(tmp_path / "x"),
                    columns=["nope"])
    # refuses to clobber an existing export
    with pytest.raises(Exception):
        export_hits(spark, cb_index, "text:spark", out)


def test_grouped_fuzz_vs_bruteforce(spark, cb_index):
    """20 seeded random (query, per_group, tiebreak) grouped searches,
    each row-identical to the brute-force grouping of the engine's own
    exhaustive match set."""
    import random

    from ostrich_spark.query.exec import search_grouped

    rng = random.Random(42)
    terms = ["spark", "join", "window", "hash", "alone", "stream", "fast"]
    for trial in range(20):
        k = rng.randint(1, 3)
        q = " OR ".join(f"text:{t}" for t in rng.sample(terms, k))
        per_group = rng.randint(1, 3)
        tiebreak = ["doc_key"] if rng.random() < 0.5 else None
        full = _exhaustive(spark, cb_index, q)
        groups = {}
        for r in full.values():
            groups.setdefault(r["grp"], []).append(r)
        hits = {}
        for g, rows in groups.items():
            key = (
                (lambda r: (-r["score"], r["doc_key"], r["segment_ord"], r["doc"]))
                if tiebreak
                else (lambda r: (-r["score"], r["segment_ord"], r["doc"]))
            )
            rows.sort(key=key)
            hits[g] = rows[:per_group]
        order = sorted(
            hits,
            key=lambda g: (
                (-hits[g][0]["score"], hits[g][0]["doc_key"],
                 hits[g][0]["segment_ord"], hits[g][0]["doc"])
                if tiebreak
                else (-hits[g][0]["score"], hits[g][0]["segment_ord"],
                      hits[g][0]["doc"])
            ),
        )
        want = [
            (gi + 1, hi + 1, r["segment_ord"], r["doc"])
            for gi, g in enumerate(order)
            for hi, r in enumerate(hits[g])
        ]
        got = [
            (r["group_rank"], r["hit_rank"], r["segment_ord"], r["doc"])
            for r in search_grouped(
                spark, cb_index, q, "grp",
                per_group=per_group, groups=None, tiebreak=tiebreak,
            ).collect()
        ]
        assert got == want, (trial, q, per_group, tiebreak)


def test_grouped_with_totals(spark, cb_index):
    """with_totals=True adds group_total = the group's FULL match count
    (what the per_group cut hides), without changing any base column —
    and the count survives the map-side prune under 1-row Arrow batches
    (the prune re-weights survivors so per-batch sums are preserved)."""
    from ostrich_spark.query.exec import search_grouped

    q = "text:spark OR text:join"
    full = _exhaustive(spark, cb_index, q)
    want_totals = {}
    for r in full.values():
        want_totals[r["grp"]] = want_totals.get(r["grp"], 0) + 1

    base = search_grouped(
        spark, cb_index, q, "grp", per_group=1, groups=None
    ).collect()

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "1")
    try:
        got = search_grouped(
            spark, cb_index, q, "grp", per_group=1, groups=None,
            with_totals=True,
        ).collect()
    finally:
        spark.conf.set(key, old)

    # base columns identical to the plain path
    cols = ("group_rank", "hit_rank", "segment_ord", "doc", "score")
    assert [tuple(r[c] for c in cols) for r in got] == [
        tuple(r[c] for c in cols) for r in base
    ]
    # every row of a group reports the same total, equal to the
    # exhaustive match count — including for groups larger than per_group
    for r in got:
        assert r["group_total"] == want_totals[r["grp"]], r
    assert any(
        want_totals[r["grp"]] > 1 for r in got
    ), "fixture must have a group bigger than per_group"
