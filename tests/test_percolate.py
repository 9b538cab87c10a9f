"""Percolator (reverse search): registered boolean queries matched
against incoming documents in one broadcast join. The contract is
IDENTITY with forward search — for every registered query, the set of
docs percolate() reports must equal the engine's own search() match set
over an index of the same documents."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.percolate import percolate, register_queries
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    BooleanQuery,
    ExistsQuery,
    KeywordQuery,
    PhraseQuery,
    RangeQuery,
    TermQuery,
    TermsQuery,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_key": 0, "text": "spark join window", "title": "Serious streaming", "num": 5, "cat": "news"},
    {"doc_key": 1, "text": "spark join", "title": "viruses everywhere", "num": 12, "cat": "blog"},
    {"doc_key": 2, "text": "spark", "title": "spark notes", "num": 30, "cat": "news"},
    {"doc_key": 3, "text": "join window stream", "title": "windows", "num": 18, "cat": None},
    {"doc_key": 4, "text": "window", "title": "join the stream", "num": None, "cat": "docs"},
    {"doc_key": 5, "text": "nothing here at all", "title": "empty", "num": 44, "cat": "blog"},
    {"doc_key": 6, "text": "spark spark join window stream", "title": "all of it", "num": 10, "cat": "news"},
]

T = lambda t: TermQuery(0, t)  # field 0 = text


@pytest.fixture(scope="module")
def perc_schema():
    schema = Schema()
    schema.add_text_field("text", "default", positions=True)
    schema.add_text_field("title", "en_stem")
    schema.add_numeric_field("num")  # field 2
    schema.add_keyword_field("cat")  # field 3
    return schema


@pytest.fixture(scope="module")
def perc_index(spark, tmp_path_factory, perc_schema):
    idx = str(tmp_path_factory.mktemp("perc") / "idx")
    build_index(
        spark,
        spark.createDataFrame(DOCS),
        perc_schema,
        idx,
        num_partitions=2,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    return idx


QUERIES = {
    "q_term": "text:spark",
    "q_and": "text:spark AND text:join",
    "q_or": "text:spark OR text:window",
    "q_must_should": BooleanQuery(
        [("must", T("spark")), ("should", T("window")), ("should", T("stream"))]
    ),
    "q_not": BooleanQuery.excluding(T("spark"), T("window")),
    "q_at_least_2": BooleanQuery.at_least(2, T("spark"), T("join"), T("stream")),
    "q_filter": BooleanQuery.filtering(T("spark"), T("join")),
    # en_stem field: "Serious" analyzes to "seriou" on both sides
    "q_stem": "title:Serious",
    # multi-field
    "q_two_fields": BooleanQuery(
        [("must", T("spark")), ("must", TermQuery(1, "stream"))]
    ),
    # phrases: exact, sloppy, and as a MUST_NOT clause — all verified
    # positionally against the doc token stream
    "q_phrase": 'text:"join window"',
    "q_phrase_sloppy": 'text:"spark window"~1',
    "q_not_phrase": BooleanQuery.excluding(
        T("spark"), PhraseQuery(0, ("spark", "join"))
    ),
    "q_phrase_beside_term": BooleanQuery(
        [("must", PhraseQuery(0, ("join", "window"))), ("must", T("stream"))]
    ),
    # numeric ranges: pure, FILTER beside a term, as MUST_NOT, open bound
    # (null num values never match — SQL comparison semantics both sides)
    "q_range": "num:[10 TO 30]",
    "q_range_filter": BooleanQuery(
        [("must", T("spark")), ("filter", RangeQuery(2, 10, None))]
    ),
    "q_not_range": BooleanQuery.excluding(T("spark"), RangeQuery(2, None, 15)),
    "q_range_excl": "num:{10 TO 30}",
    # keyword doc values: pure eq, FILTER beside a term, as MUST_NOT,
    # exists on keyword and numeric (NULL cat/num never matches)
    "q_kw": "cat:news",
    "q_kw_filter": BooleanQuery.filtering(T("spark"), KeywordQuery(3, "news")),
    "q_kw_not": BooleanQuery.excluding(T("spark"), KeywordQuery(3, "blog")),
    "q_kw_should": BooleanQuery(
        [("should", KeywordQuery(3, "docs")), ("should", T("stream"))]
    ),
    # SHOULD + FILTER with NO true MUST: the should-union stays REQUIRED
    # (forward puts it in CFilter's base) — a FILTER clause must not
    # make SHOULD optional (regression: found by the seeded fuzz)
    "q_should_filter": BooleanQuery(
        [("should", T("stream")), ("should", T("nothing")),
         ("filter", RangeQuery(2, 10, None))]
    ),
    "q_should_filter_not": BooleanQuery(
        [("must_not", T("join")), ("should", T("spark")),
         ("filter", RangeQuery(2, 18, 30))]
    ),
    "q_exists_kw": "cat:*",
    "q_exists_num": BooleanQuery(
        [("must", T("spark")), ("filter", ExistsQuery(2))]
    ),
}


def _forward_matches(spark, idx, q, perc_schema) -> set:
    res, _ = search(spark, idx, q, limit=None)
    return {
        r["doc_key"]
        for r in attach_docmap(spark, idx, res).select("doc_key").collect()
    }


def test_percolate_identity_with_forward_search(spark, perc_index, perc_schema):
    pq = register_queries(QUERIES, perc_schema)
    docs = spark.createDataFrame(DOCS)
    got = percolate(spark, docs, pq, perc_schema, id_col="doc_key").collect()
    got_sets = {}
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(r["doc_key"])
    for qid, q in QUERIES.items():
        want = _forward_matches(spark, perc_index, q, perc_schema)
        assert got_sets.get(qid, set()) == want, qid


def test_percolate_no_false_rows(spark, perc_schema):
    pq = register_queries({"q": "text:absent_term"}, perc_schema)
    docs = spark.createDataFrame(DOCS)
    assert percolate(spark, docs, pq, perc_schema, id_col="doc_key").count() == 0


def test_percolate_column_map(spark, perc_schema):
    pq = register_queries({"q": "text:spark"}, perc_schema)
    docs = spark.createDataFrame(DOCS).withColumnRenamed("text", "body")
    got = percolate(
        spark, docs, pq, perc_schema, id_col="doc_key",
        column_map={"text": "body"},
    ).collect()
    assert {r["doc_key"] for r in got} == {0, 1, 2, 6}


def test_percolate_registration_errors(perc_schema):
    with pytest.raises(ValueError, match="pure-negative"):
        register_queries(
            {"bad": BooleanQuery([("must_not", T("spark"))])}, perc_schema
        )
    # every query type percolates since round 3; a non-query object is
    # still rejected with a clear error
    from ostrich_spark.query.parser import AllQuery

    with pytest.raises(ValueError, match="unsupported"):
        register_queries({"all": AllQuery()}, perc_schema)
    with pytest.raises(ValueError, match="non-keyword"):
        register_queries({"kw": KeywordQuery(0, "x")}, perc_schema)
    with pytest.raises(ValueError, match="non-doc-value"):
        register_queries({"ex": ExistsQuery(0)}, perc_schema)


def test_percolate_missing_doc_column(spark, perc_schema):
    pq = register_queries({"q": "title:serious"}, perc_schema)
    docs = spark.createDataFrame([{"doc_key": 0, "text": "x"}])
    with pytest.raises(ValueError, match="no column"):
        percolate(spark, docs, pq, perc_schema, id_col="doc_key")


def test_percolate_plan_broadcast_and_partial_agg(spark, perc_schema):
    """Scale contract: the stored-query side broadcasts (docs never
    shuffle to meet it) and satisfaction counting partial-aggregates
    map-side (one row per (partition, doc, query) reaches the shuffle)."""
    pq = register_queries(QUERIES, perc_schema)
    docs = spark.createDataFrame(DOCS)
    m = percolate(spark, docs, pq, perc_schema, id_col="doc_key")
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_percolate_streaming_foreachbatch(spark, tmp_path, perc_schema):
    """The alerting shape: percolate each micro-batch inside
    foreachBatch; every (doc, subscription) match surfaces as the docs
    arrive, batch boundaries invisible in the result."""
    import os
    import time as _t

    import pandas as pd

    pq = register_queries({"alerts": "text:spark AND text:join"}, perc_schema)
    src = tmp_path / "stream_in"
    os.makedirs(src)
    half = len(DOCS) // 2
    spark.createDataFrame(pd.DataFrame(DOCS[:half])).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    _t.sleep(1.1)
    spark.createDataFrame(pd.DataFrame(DOCS[half:])).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    matches = []

    def handle(batch_df, batch_id):
        rows = percolate(
            spark, batch_df, pq, perc_schema, id_col="doc_key"
        ).collect()
        matches.extend((r["doc_key"], r["query_id"]) for r in rows)

    stream = (
        spark.readStream.schema("doc_key long, text string, title string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {(0, "alerts"), (1, "alerts"), (6, "alerts")}
    assert set(matches) == want


def test_percolate_range_on_text_field_rejected(perc_schema):
    with pytest.raises(ValueError, match="non-numeric"):
        register_queries(
            {"bad": BooleanQuery([("must", RangeQuery(0, 1, 2))])}, perc_schema
        )


def test_percolate_fuzz_identity(spark, perc_index, perc_schema):
    """25 seeded random subscriptions (boolean trees over terms, phrases,
    numeric ranges and keyword eq/terms-set/string-range/exists, random
    occurs + min_should) — match sets identical to forward search for
    every one."""
    import random

    rng = random.Random(7)
    terms = ["spark", "join", "window", "stream", "nothing", "absent"]

    def rand_leaf():
        r = rng.random()
        if r < 0.45:
            return TermQuery(0, rng.choice(terms))
        if r < 0.62:
            n = rng.randint(2, 3)
            return PhraseQuery(0, tuple(rng.sample(terms[:4], n)), slop=rng.choice([0, 1]))
        if r < 0.75:
            rr = rng.random()
            if rr < 0.25:
                return ExistsQuery(rng.choice([2, 3]))
            if rr < 0.5:
                vals = rng.sample(["news", "blog", "docs", "zz"],
                                  rng.randint(1, 3))
                return TermsQuery(3, tuple(vals))
            if rr < 0.75:
                lo = rng.choice([None, "blog", "docs"])
                hi = rng.choice([None, "docs", "news", "zz"])
                if lo is None and hi is None:
                    lo = "blog"
                if lo is not None and hi is not None and lo > hi:
                    lo, hi = hi, lo
                return RangeQuery(
                    3, lo, hi, rng.random() < 0.8, rng.random() < 0.8
                )
            return KeywordQuery(3, rng.choice(["news", "blog", "docs", "zz"]))
        lo = rng.choice([None, 5, 10, 18])
        hi = rng.choice([None, 12, 30, 44])
        if lo is None and hi is None:
            lo = 10
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo
        return RangeQuery(2, lo, hi, rng.random() < 0.8, rng.random() < 0.8)

    subs = {}
    for i in range(25):
        n = rng.randint(1, 4)
        clauses, has_positive = [], False
        for _ in range(n):
            occ = rng.choice(["must", "should", "must_not", "filter"])
            if occ != "must_not":
                has_positive = True
            clauses.append((occ, rand_leaf()))
        if not has_positive:
            clauses.append(("must", TermQuery(0, rng.choice(terms[:4]))))
        n_should = sum(1 for o, _ in clauses if o == "should")
        ms = rng.randint(1, max(n_should, 1)) if n_should else 1
        subs[f"f{i}"] = BooleanQuery(clauses, min_should=ms)

    pq = register_queries(subs, perc_schema)
    docs = spark.createDataFrame(DOCS)
    got = {}
    for r in percolate(spark, docs, pq, perc_schema, id_col="doc_key").collect():
        got.setdefault(r["query_id"], set()).add(r["doc_key"])
    for qid, q in subs.items():
        want = _forward_matches(spark, perc_index, q, perc_schema)
        assert got.get(qid, set()) == want, (qid, q)


def test_percolate_nested_trees(spark, perc_index, perc_schema):
    """NESTED boolean subscriptions (arbitrary depth, DisMax-as-OR):
    match sets identical to forward search. The flat fast path and the
    tree path coexist in one percolate() call."""
    from ostrich_spark.query.parser import DisMaxQuery, KeywordQuery, TermsQuery

    subs = {
        "or_of_ands": BooleanQuery(
            [("should", BooleanQuery.intersection(T("spark"), T("join"))),
             ("should", BooleanQuery.intersection(T("window"), T("stream")))]
        ),
        "not_subtree": BooleanQuery(
            [("must", T("spark")),
             ("must_not", BooleanQuery.union(
                 T("join"), PhraseQuery(0, ("window", "stream"))))]
        ),
        "dismax_filtered": BooleanQuery(
            [("should", DisMaxQuery([T("spark"), T("window")])),
             ("filter", RangeQuery(2, 10, 30))]
        ),
        "nested_min_should": BooleanQuery(
            [("must", BooleanQuery.at_least(2, T("spark"), T("join"), T("stream"))),
             ("should", KeywordQuery(3, "news"))]
        ),
        "three_deep": BooleanQuery(
            [("should", BooleanQuery(
                [("must", T("spark")),
                 ("must", BooleanQuery(
                     [("should", KeywordQuery(3, "news")),
                      ("should", TermsQuery(3, ("blog", "docs")))]))])),
             ("should", T("stream"))]
        ),
        # SHOULD+FILTER inside a NESTED node: the req_should rule holds
        # recursively (should stays required without a true MUST)
        "inner_should_filter": BooleanQuery(
            [("must", BooleanQuery(
                [("should", T("stream")), ("should", T("nothing")),
                 ("filter", RangeQuery(2, 10, None))]))]
        ),
        "flat_beside": "text:spark AND text:join",
    }
    pq = register_queries(subs, perc_schema)
    docs = spark.createDataFrame(DOCS)
    got = {}
    for r in percolate(spark, docs, pq, perc_schema, id_col="doc_key").collect():
        got.setdefault(r["query_id"], set()).add(r["doc_key"])
    for qid, q in subs.items():
        want = _forward_matches(spark, perc_index, q, perc_schema)
        assert got.get(qid, set()) == want, (qid, q)
    # pure-negative nested root rejected like flat
    with pytest.raises(ValueError, match="no positive clause"):
        register_queries(
            {"bad": BooleanQuery(
                [("must_not", BooleanQuery.union(T("spark"), T("join")))])},
            perc_schema,
        )


def test_percolate_nested_fuzz_identity(spark, perc_index, perc_schema):
    """20 seeded random NESTED subscriptions (depth <= 3 boolean trees
    with dismax nodes and every leaf kind) — match-set identity with
    forward search."""
    import random

    from ostrich_spark.query.parser import DisMaxQuery, KeywordQuery, TermsQuery

    rng = random.Random(13)
    terms = ["spark", "join", "window", "stream", "nothing", "absent"]

    def rand_leaf():
        r = rng.random()
        if r < 0.5:
            return TermQuery(0, rng.choice(terms))
        if r < 0.62:
            n = rng.randint(2, 3)
            return PhraseQuery(0, tuple(rng.sample(terms[:4], n)),
                               slop=rng.choice([0, 1]))
        if r < 0.74:
            return KeywordQuery(3, rng.choice(["news", "blog", "docs", "zz"]))
        if r < 0.84:
            return TermsQuery(3, tuple(
                rng.sample(["news", "blog", "docs", "zz"], rng.randint(1, 2))))
        lo = rng.choice([None, 5, 10, 18])
        hi = rng.choice([None, 12, 30, 44])
        if lo is None and hi is None:
            lo = 10
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo
        return RangeQuery(2, lo, hi, rng.random() < 0.8, rng.random() < 0.8)

    def rand_node(depth):
        if depth == 0 or rng.random() < 0.35:
            return rand_leaf()
        if rng.random() < 0.2:
            return DisMaxQuery(
                [rand_node(depth - 1) for _ in range(rng.randint(2, 3))]
            )
        clauses, has_positive = [], False
        for _ in range(rng.randint(1, 3)):
            occ = rng.choice(["must", "should", "must_not", "filter"])
            if occ != "must_not":
                has_positive = True
            clauses.append((occ, rand_node(depth - 1)))
        if not has_positive:
            clauses.append(("must", TermQuery(0, rng.choice(terms[:4]))))
        n_should = sum(1 for o, _ in clauses if o == "should")
        ms = rng.randint(1, max(n_should, 1)) if n_should else 1
        return BooleanQuery(clauses, min_should=ms)

    subs = {}
    while len(subs) < 20:
        q = rand_node(3)
        if not isinstance(q, (BooleanQuery, DisMaxQuery)):
            continue
        try:
            register_queries({"probe": q}, perc_schema)
        except ValueError:
            continue  # e.g. pure-negative roots after random assembly
        subs[f"n{len(subs)}"] = q

    pq = register_queries(subs, perc_schema)
    docs = spark.createDataFrame(DOCS)
    got = {}
    for r in percolate(spark, docs, pq, perc_schema, id_col="doc_key").collect():
        got.setdefault(r["query_id"], set()).add(r["doc_key"])
    for qid, q in subs.items():
        want = _forward_matches(spark, perc_index, q, perc_schema)
        assert got.get(qid, set()) == want, (qid, q)


def test_percolate_multiterm_leaves(spark, perc_index, perc_schema):
    """Prefix/wildcard/regexp/fuzzy subscriptions evaluate against the
    doc's OWN token set (ES MemoryIndex semantics, uncapped) — identity
    with forward search on a corpus whose expansions fit the caps."""
    from ostrich_spark.query.parser import (
        FuzzyQuery,
        PrefixQuery,
        RegexpQuery,
        WildcardQuery,
    )

    subs = {
        "pre": "text:spar*",
        "wild": "text:s?ark",
        "rex": "text:/st[a-z]+m/",
        "fuzz": FuzzyQuery(0, "spark", max_dist=1, prefix_length=0),
        "fuzz_dl": FuzzyQuery(0, "sprak", max_dist=1, prefix_length=0,
                              transpositions=True),
        # stemmed field: pattern matches the ANALYZED token ('seriou')
        "stem_pre": "title:serio*",
        "mt_combo": BooleanQuery(
            [("must", PrefixQuery(0, "wind")),
             ("must_not", WildcardQuery(0, "*eam"))]
        ),
        "nested_mt": BooleanQuery(
            [("should", BooleanQuery.intersection(
                PrefixQuery(0, "spar"), TermQuery(0, "join"))),
             ("should", RegexpQuery(0, "noth.*"))]
        ),
    }
    pq = register_queries(subs, perc_schema)
    docs = spark.createDataFrame(DOCS)
    got = {}
    for r in percolate(spark, docs, pq, perc_schema, id_col="doc_key").collect():
        got.setdefault(r["query_id"], set()).add(r["doc_key"])
    for qid, q in subs.items():
        want = _forward_matches(spark, perc_index, q, perc_schema)
        assert got.get(qid, set()) == want, (qid, q)
    # one hit row per unit per doc even when SEVERAL tokens match the
    # pattern (doc 6 has spark twice + stream; 'mt at most once per doc')
    from ostrich_spark.query.parser import BooleanQuery as BQ

    pq2 = register_queries(
        {"two_pat": BQ.intersection(PrefixQuery(0, "s"), PrefixQuery(0, "w"))},
        perc_schema,
    )
    got2 = {r["doc_key"] for r in
            percolate(spark, docs, pq2, perc_schema, id_col="doc_key").collect()}
    want2 = _forward_matches(
        spark, perc_index,
        BQ.intersection(PrefixQuery(0, "s"), PrefixQuery(0, "w")), perc_schema)
    assert got2 == want2
    # doc-value fields reject multi-term clauses
    with pytest.raises(ValueError, match="doc-value"):
        register_queries({"bad": PrefixQuery(3, "ne")}, perc_schema)
    # phrase-prefix percolates too (slot DP + doc-local prefix slot)
    pq3 = register_queries({"pp": 'text:"spark jo*"'}, perc_schema)
    got3 = {r["doc_key"] for r in
            percolate(spark, docs, pq3, perc_schema, id_col="doc_key").collect()}
    assert got3 == _forward_matches(spark, perc_index, 'text:"spark jo*"',
                                    perc_schema)


# --- geo percolation (geofence alerting) ------------------------------------


GEO_DOCS = [
    {"gid": 0, "text": "taxi downtown", "loc": "48.8566,2.3522"},   # paris
    {"gid": 1, "text": "bus northern", "loc": "51.5074,-0.1278"},   # london
    {"gid": 2, "text": "taxi eastern", "loc": "52.52,13.405"},      # berlin
    {"gid": 3, "text": "tram southern", "loc": "40.4168,-3.7038"},  # madrid
    {"gid": 4, "text": "ferry remote", "loc": "-36.8485,174.7633"},
    {"gid": 5, "text": "taxi nowhere", "loc": None},                # no point
    {"gid": 6, "text": "bus garbled", "loc": "not-a-point"},        # bad
]

_RING = ((55.0, -5.0), (55.0, -1.0), (50.0, -0.1), (55.0, 1.0),
         (55.0, 14.0), (45.0, 14.5), (39.0, -5.5))


def _geo_schema():
    s = Schema()
    s.add_text_field("text", "default")
    s.add_geo_field("loc")
    return s


def test_percolate_geo_identity_with_forward_search(spark, tmp_path):
    """Geo subscriptions (distance / bbox / concave polygon, bare and
    composed under text clauses, flat and nested) percolate to EXACTLY
    the forward-search match sets over an index of the same docs —
    the geofence-alerting contract."""
    from ostrich_spark.query.parser import (
        FILTER,
        MUST,
        SHOULD,
        GeoBoundingBoxQuery,
        GeoDistanceQuery,
        GeoPolygonQuery,
    )

    schema = _geo_schema()
    fid = schema.field_by_name("loc").id
    queries = {
        "near_paris": GeoDistanceQuery(fid, 48.8566, 2.3522, 500_000.0),
        "europe_box": GeoBoundingBoxQuery(fid, 56.0, -6.0, 39.5, 15.0),
        "notch_ring": GeoPolygonQuery(fid, _RING),
        "taxi_in_ring": BooleanQuery([
            (MUST, TermQuery(0, "taxi")),
            (FILTER, GeoPolygonQuery(fid, _RING)),
        ]),
        # nested: (bus OR inside-ring) AND text exists-ish term
        "bus_or_ring": BooleanQuery([
            (MUST, BooleanQuery([
                (SHOULD, TermQuery(0, "bus")),
                (SHOULD, GeoPolygonQuery(fid, _RING)),
            ])),
            (MUST, BooleanQuery([
                (SHOULD, TermQuery(0, "taxi")),
                (SHOULD, TermQuery(0, "bus")),
                (SHOULD, TermQuery(0, "tram")),
                (SHOULD, TermQuery(0, "ferry")),
            ])),
        ]),
    }
    pq = register_queries(queries, schema)
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame(GEO_DOCS))
    got = {}
    for r in percolate(spark, docs, pq, schema, id_col="gid").collect():
        got.setdefault(r["query_id"], set()).add(r["gid"])

    idx = str(tmp_path / "geoperc")
    # the forward build REJECTS malformed points by design; percolation
    # tolerates them (a garbled stream doc matches nothing) — index the
    # well-formed docs only for the identity check
    build_index(
        spark, docs.filter("gid <> 6"), schema, idx, num_partitions=2,
        order_col="gid", id_cols=["gid"],
    )
    for qid, q in queries.items():
        res, _ = search(spark, idx, q, limit=None)
        exp = {
            r["gid"] for r in attach_docmap(spark, idx, res).collect()
        }
        # identity over the INDEXED doc set (gid 6 is not indexable;
        # its text clauses may legitimately percolate)
        assert got.get(qid, set()) - {6} == exp, qid
    # sanity on the fixtures: the notch excludes london, includes paris;
    # null and garbled points never match any geo subscription
    assert 0 in got["notch_ring"] and 1 not in got["notch_ring"]
    for qid in ("near_paris", "europe_box", "notch_ring"):
        assert 5 not in got.get(qid, set()) and 6 not in got.get(qid, set())


def test_percolate_geo_on_non_geo_field_rejected():
    from ostrich_spark.query.parser import GeoDistanceQuery

    schema = _geo_schema()
    with pytest.raises(ValueError, match="geo clause on non-geo"):
        register_queries(
            {"bad": GeoDistanceQuery(0, 0.0, 0.0, 1000.0)}, schema
        )


def test_bare_term_keyword_field_no_crash(spark, perc_schema):
    """A bare NQL term expands over EVERY field — including doc-value
    (keyword/numeric) fields, where forward search finds no postings
    and silently matches nothing. Percolation must mirror that
    (self-found: the 10k-subscription ladder crashed on
    'analyzer \'\' is not registered' for the keyword leg).

    'spark' bare -> SHOULD over (text, title, cat[, num]) term clauses;
    matches = docs whose TEXT fields carry the token, the keyword leg
    contributing nothing."""
    subs = register_queries({"bare": "spark"}, perc_schema)
    docs = spark.createDataFrame(DOCS)
    got = sorted(
        r["doc_key"]
        for r in percolate(spark, docs, subs, perc_schema,
                           id_col="doc_key").collect()
    )
    # docs with 'spark' in text or title
    assert got == [0, 1, 2, 6]
    # a bare term matching ONLY via the keyword field's value text never
    # matches (no analyzed tokens on doc-value fields) — forward parity
    subs2 = register_queries({"kw_only": "docs"}, perc_schema)
    got2 = [r["doc_key"] for r in percolate(
        spark, docs, subs2, perc_schema, id_col="doc_key").collect()]
    assert got2 == []


def test_percolate_broadcast_cap_degrades_to_shuffle(spark, perc_schema):
    """Subscription-scale ceiling: when the driver-compiled query tables
    exceed broadcast_cap, the broadcast HINT must disappear from the
    plan (Spark's own sizing then picks the join — shuffle at real
    100k+ subscription scale, never a forced-broadcast OOM) and the
    match set must be IDENTICAL to the hinted plan's."""
    pq = register_queries(QUERIES, perc_schema)
    docs = spark.createDataFrame(DOCS)

    hinted = percolate(spark, docs, pq, perc_schema, id_col="doc_key")
    capped = percolate(
        spark, docs, pq, perc_schema, id_col="doc_key", broadcast_cap=0
    )
    h_plan = hinted._jdf.queryExecution().analyzed().toString()
    c_plan = capped._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" in h_plan
    assert "strategy=broadcast" not in c_plan

    want = {(r["doc_key"], r["query_id"]) for r in hinted.collect()}
    got = {(r["doc_key"], r["query_id"]) for r in capped.collect()}
    assert got == want and len(got) > 0
