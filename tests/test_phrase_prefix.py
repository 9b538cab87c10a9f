"""Phrase-prefix / MultiPhraseQuery (Lucene MatchPhrasePrefix analog).

Contract (parser.MultiPhraseQuery): in-order window of the fixed terms
followed by ANY dictionary expansion of the prefix; tf = distinct end
positions; idf = sum over fixed constituents + every expansion; the
prefix is lowercased but never analyzed. Engine scores are checked
bit-tight (rel 1e-9) against a brute-force single-process matcher
implementing exactly that contract.
"""

import math

import pytest

from ostrich_spark.analysis import get_analyzer
from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search, search_many
from ostrich_spark.query.parser import (
    EmptyQuery,
    MultiPhraseQuery,
    PhrasePrefixQuery,
    PhraseQuery,
    QueryParseError,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"k": 0, "text": "spark streaming pipeline"},
    {"k": 1, "text": "spark stream processing"},
    {"k": 2, "text": "stream spark strange"},
    {"k": 3, "text": "spark strange stream spark streaming"},
    {"k": 4, "text": "apache spark batch"},
    {"k": 5, "text": "stream processing without the lead word"},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default", positions=True)
    return s


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "idx")
    build_index(
        spark, spark.createDataFrame(DOCS), _schema(), path,
        num_partitions=2, order_col="k", id_cols=["k"],
    )
    return path


def _hits(spark, idx, query, scorer="tfidf"):
    res, _ = search(spark, idx, query, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("k", "score").collect()
    return sorted((r["k"], r["score"]) for r in rows)


def _brute(fixed, prefix, slop=0, scorer="tfidf", docs=DOCS):
    """Reference matcher for the documented contract."""
    an = get_analyzer("default")
    toks = {d["k"]: an.analyze_one(d["text"]) for d in docs}
    n = len(docs)
    vocab = {t for ts in toks.values() for t in ts}
    expansions = sorted(t for t in vocab if t.startswith(prefix))
    df = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in set(fixed) | set(expansions)
    }
    if scorer == "tfidf":
        idf = lambda d: 1.0 + math.log(n / (1.0 + d))  # noqa: E731
    else:
        idf = lambda d: math.log(1.0 + (n - d + 0.5) / (d + 0.5))  # noqa: E731
    idf_sum = sum(idf(df[t]) for t in (*fixed, *expansions))
    k = len(fixed) + 1
    out = {}
    avgdl = sum(len(ts) for ts in toks.values()) / n
    exp_set = set(expansions)
    for key, ts in toks.items():
        ends = set()
        for end, last in enumerate(ts):
            if last not in exp_set:
                continue
            if fixed:
                # in-order chain of fixed terms before `end`; the LATEST
                # feasible start decides the span test (engine DP contract)
                best = _latest_start(ts, fixed, end)
                if best is None or end - best > k - 1 + slop:
                    continue
            ends.add(end)
        if ends:
            tf = len(ends)
            if scorer == "tfidf":
                out[key] = tf * idf_sum
            else:
                dl = len(ts)
                out[key] = idf_sum * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
    return sorted(out.items())


def _latest_start(ts, fixed, end):
    """Latest start of an in-order chain fixed[0..] ending before `end`
    — mirrors the engine's DP exactly."""
    best = None
    starts = [p for p, t in enumerate(ts) if t == fixed[0] and p < end]
    for s0 in starts:
        p = s0
        ok = True
        for f in fixed[1:]:
            nxt = [q for q, t in enumerate(ts) if t == f and p < q < end]
            if not nxt:
                ok = False
                break
            p = min(nxt)
        if ok and (best is None or s0 > best):
            best = s0
    return best


# --- parsing -------------------------------------------------------------

def test_parse_shapes():
    s = _schema()
    q = parse_query('text:"spark str*"', s)
    assert q == PhrasePrefixQuery(0, ("spark",), "str")
    q = parse_query('text:"spark str*"~2', s)
    assert q.slop == 2 and q.prefix == "str"
    q = parse_query('text:"STR*"', s)  # prefix lowercased, never stemmed
    assert q == PhrasePrefixQuery(0, (), "str")
    # detached * is an ordinary separator -> plain phrase of the words
    q = parse_query('text:"spark stream *"', s)
    assert isinstance(q, PhraseQuery) and q.terms == ("spark", "stream")
    # bare "*" alone analyzes to nothing
    assert isinstance(parse_query('text:"*"', s), EmptyQuery)


def test_parse_bare_over_default_fields():
    s = _schema()
    q = parse_query('"spark str*"', s)
    assert q == PhrasePrefixQuery(0, ("spark",), "str")


# --- matching + scoring ---------------------------------------------------

@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_engine_matches_brute_force(spark, idx, scorer):
    got = _hits(spark, idx, 'text:"spark str*"', scorer)
    want = _brute(("spark",), "str", scorer=scorer)
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


@pytest.mark.parametrize("slop", [1, 2])
def test_sloppy_matches_brute_force(spark, idx, slop):
    got = _hits(spark, idx, f'text:"spark str*"~{slop}')
    want = _brute(("spark",), "str", slop=slop)
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_prefix_only_phrase(spark, idx):
    """Single-slot form: tf = occurrences of ANY expansion."""
    got = _hits(spark, idx, 'text:"str*"')
    want = _brute((), "str")
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_single_expansion_equals_plain_phrase(spark, idx):
    """When the prefix expands to exactly one term the contract reduces
    to PhraseQuery: identical idf sum, identical windows."""
    a = _hits(spark, idx, 'text:"spark streaming*"')
    b = _hits(spark, idx, 'text:"spark streaming"')
    assert a == b and a


def test_no_expansion_matches_nothing(spark, idx):
    assert _hits(spark, idx, 'text:"spark zzz*"') == []


def test_expansion_cap_is_deterministic(spark, idx):
    """cap=1 keeps only the highest-df expansion (df DESC, term ASC)."""
    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import attach_docmap as ad

    q = PhrasePrefixQuery(0, ("spark",), "str", max_expansions=1)
    res, _ = search(spark, idx, q, limit=None)
    got = sorted(r["k"] for r in ad(spark, idx, res).select("k").collect())
    # df: stream appears in docs 1,2,3,5 (df=4) > streaming (2) > strange (2)
    want = [k for k, _ in _brute(("spark",), "stream")]  # exact term stream
    # brute with full prefix 'stream' also includes 'streaming' — restrict:
    an = get_analyzer("default")
    manual = []
    for d in DOCS:
        ts = an.analyze_one(d["text"])
        if any(
            ts[i] == "spark" and i + 1 < len(ts) and ts[i + 1] == "stream"
            for i in range(len(ts))
        ):
            manual.append(d["k"])
    assert got == manual


def test_batched_path_identity(spark, idx):
    queries = {
        "pp": 'text:"spark str*"',
        "pps": 'text:"spark str*"~2',
        "t": "text:spark",
    }
    batched = search_many(spark, idx, queries, limit=None)
    got = {}
    for r in batched.select("query_id", "segment_id", "doc", "score").collect():
        got.setdefault(r["query_id"], []).append(
            (r["segment_id"], r["doc"], round(r["score"], 9))
        )
    for qid, q in queries.items():
        res, _ = search(spark, idx, q, limit=None)
        want = [
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in res.select("segment_id", "doc", "score").collect()
        ]
        assert sorted(got.get(qid, [])) == sorted(want)


def test_highlight_marks_expansions(spark, tmp_path):
    from ostrich_spark.highlight import highlight

    path = str(tmp_path / "hl")
    s = Schema()
    s.add_text_field("text", "default", positions=True, store=True)
    build_index(
        spark, spark.createDataFrame(DOCS), s, path,
        num_partitions=1, order_col="k", id_cols=["k"],
    )
    snips = highlight(spark, path, 'text:"spark str*"', "text", limit=3)
    assert snips
    marked = " ".join(sn.text for sn in snips)
    assert "**spark**" in marked
    assert "**streaming**" in marked or "**stream**" in marked or "**strange**" in marked


def test_explain_shows_phrase_prefix(spark, idx):
    from ostrich_spark.query.exec import explain

    res, _ = search(spark, idx, 'text:"spark str*"', limit=1)
    hit = res.select("segment_id", "doc").collect()[0]
    tree = explain(spark, idx, 'text:"spark str*"', hit["segment_id"], hit["doc"])
    assert tree["kind"] == "multi_phrase" and tree["matched"]
    assert len(tree["detail"]["slots"]) == 2 and len(tree["detail"]["slots"][1]) > 1


def test_multi_phrase_alternatives_at_any_slot(spark, idx):
    """Full MultiPhraseQuery generality (query-time synonym phrase):
    alternatives at the FIRST slot. ('spark'|'apache') followed by any
    'b*' expansion — brute-checked per the documented contract."""
    import numpy as np

    q = MultiPhraseQuery(0, (("stream", "apache"), ("spark",)))
    res, _ = search(spark, idx, q, limit=None)
    got = sorted(
        (r["k"], r["score"])
        for r in attach_docmap(spark, idx, res).select("k", "score").collect()
    )
    # brute: window (a in {stream, apache}) at p, spark at p+1
    an = get_analyzer("default")
    n = len(DOCS)
    toks = {d["k"]: an.analyze_one(d["text"]) for d in DOCS}
    df = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in ("stream", "apache", "spark")
    }
    idf_sum = sum(1.0 + math.log(n / (1.0 + df[t])) for t in df)
    want = []
    for key, ts in toks.items():
        ends = {
            p + 1
            for p, t in enumerate(ts)
            if t in ("stream", "apache")
            and p + 1 < len(ts)
            and ts[p + 1] == "spark"
        }
        if ends:
            want.append((key, len(ends) * idf_sum))
    want.sort()
    assert [k for k, _ in got] == [k for k, _ in want] and got
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_multi_phrase_dead_slot_is_empty(spark, idx):
    """A slot whose every alternative is absent can never match."""
    q = MultiPhraseQuery(0, (("zzz", "qqq"), ("spark",)))
    res, _ = search(spark, idx, q, limit=None)
    assert res.collect() == []
