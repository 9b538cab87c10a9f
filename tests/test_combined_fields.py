"""combined_fields — Lucene CombinedFieldQuery / ES combined_fields
analog (BM25F pseudo-field, term-centric): the listed fields merge into
one virtual field; tf = weighted sum of per-field tfs, dl = weighted sum
of EVERY listed field's length (norms delivered via the aux cogroup),
df = max over fields clipped to N, avgdl = weighted sum of field avgdl.
Oracle: full hand recomputation of the BM25F arithmetic below."""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search
from ostrich_spark.query.parser import (
    CombinedTermQuery,
    QueryParseError,
    parse_combined_fields,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "title": "spark engine", "body": "spark spark fast engine query"},
    {"doc_id": 1, "title": "index build", "body": "spark index postings merge"},
    {"doc_id": 2, "title": "query spark spark", "body": "engine fast"},
    {"doc_id": 3, "title": "merge policy", "body": "build segments and merge policy"},
]
N = len(DOCS)
K1, B = 1.2, 0.75

TITLE_LEN = {0: 2, 1: 2, 2: 3, 3: 2}
BODY_LEN = {0: 5, 1: 4, 2: 2, 3: 5}


def _tf(field, term, doc_id):
    return DOCS[doc_id][field].split().count(term)


def _df(field, term):
    return sum(1 for d in DOCS if term in d[field].split())


def _bm25_idf(df):
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def _tfidf_idf(df):
    return 1.0 + math.log(N / (1.0 + df))


def _combined_expected(term, weights, scorer="bm25"):
    """Hand BM25F: weights = {field_name: w}. Returns {doc_id: score}."""
    df = min(N, max(_df(f, term) for f in weights))
    if df == 0:
        return {}
    idf = _bm25_idf(df) if scorer == "bm25" else _tfidf_idf(df)
    avg_title = sum(TITLE_LEN.values()) / N
    avg_body = sum(BODY_LEN.values()) / N
    avgdl = weights.get("title", 0) * avg_title + weights.get("body", 0) * avg_body
    out = {}
    for d in range(N):
        tf = sum(w * _tf(f, term, d) for f, w in weights.items())
        if tf == 0:
            continue
        if scorer == "tfidf":
            out[d] = tf * idf
            continue
        dl = weights.get("title", 0) * TITLE_LEN[d] + weights.get("body", 0) * BODY_LEN[d]
        out[d] = idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    return out


def _schema():
    s = Schema()
    s.add_text_field("title", "default")
    s.add_text_field("body", "default")
    return s


@pytest.fixture(scope="module")
def cfx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("combined") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        _schema(),
        idx,
        num_partitions=2,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    return idx


def _hits(spark, idx, q, scorer="bm25"):
    res, _ = search(spark, idx, q, limit=None, scorer=scorer)
    rows = attach_docmap(spark, idx, res).select("doc_id", "score").collect()
    return {r["doc_id"]: r["score"] for r in rows}


def _q(text, weights, operator="or"):
    return parse_combined_fields(text, _schema(), weights, operator=operator)


def test_bm25f_hand_identity(spark, cfx):
    """Weighted-sum tf + weighted-sum dl + max-df: exact arithmetic."""
    weights = {"title": 1.0, "body": 2.0}
    got = _hits(spark, cfx, _q("spark", weights))
    want = _combined_expected("spark", weights)
    assert set(got) == set(want) == {0, 1, 2}
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)
    # term-centric saturation: doc0 (tf 1+2*2=5) outranks both tf=2 docs
    assert got[0] > got[1] and got[0] > got[2]


def test_unweighted_and_tfidf(spark, cfx):
    """Weight 1 on both fields; tfidf mode ignores lengths entirely
    (score = summed tf * idf) — norms delivery must be harmless there."""
    weights = {"title": 1.0, "body": 1.0}
    for scorer in ("bm25", "tfidf"):
        got = _hits(spark, cfx, _q("spark", weights), scorer=scorer)
        want = _combined_expected("spark", weights, scorer=scorer)
        assert set(got) == set(want)
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-9)


def test_operator_and_sums_terms(spark, cfx):
    """operator=and: every token must match the pseudo-field; the doc
    score is the sum of the per-term combined scores."""
    weights = {"title": 1.0, "body": 2.0}
    got = _hits(spark, cfx, _q("spark merge", weights, operator="and"))
    spark_s = _combined_expected("spark", weights)
    merge_s = _combined_expected("merge", weights)
    want_docs = set(spark_s) & set(merge_s)
    assert set(got) == want_docs == {1}
    assert got[1] == pytest.approx(spark_s[1] + merge_s[1], rel=1e-9)
    # operator=or: union, same sums where both match
    got_or = _hits(spark, cfx, _q("spark merge", weights))
    assert set(got_or) == set(spark_s) | set(merge_s)
    for d in got_or:
        assert got_or[d] == pytest.approx(
            spark_s.get(d, 0.0) + merge_s.get(d, 0.0), rel=1e-9
        )


def test_single_field_reduces_to_bm25(spark, cfx):
    """One field with weight 1 == plain per-field BM25 of that field."""
    got = _hits(spark, cfx, _q("spark", {"body": 1.0}))
    want = _combined_expected("spark", {"body": 1.0})
    assert set(got) == {0, 1}
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_term_absent_in_one_field(spark, cfx):
    """'segments' lives only in body: title contributes 0 tf but its
    length STILL counts in the combined dl (the BM25F contract)."""
    weights = {"title": 1.0, "body": 1.0}
    got = _hits(spark, cfx, _q("segments", weights))
    want = _combined_expected("segments", weights)
    assert set(got) == set(want) == {3}
    assert got[3] == pytest.approx(want[3], rel=1e-9)


def test_absent_everywhere_and_explain(spark, cfx):
    got = _hits(spark, cfx, _q("zzznope", {"title": 1.0, "body": 1.0}))
    assert got == {}
    # explain: the combined node reports the pseudo-field stats and the
    # same score the engine computed
    weights = {"title": 1.0, "body": 2.0}
    res, _ = search(spark, cfx, _q("spark", weights), limit=1, scorer="bm25")
    row = res.collect()[0]
    ex = explain(
        spark, cfx, _q("spark", weights), row["segment_id"], row["doc"],
        scorer="bm25",
    )
    assert ex["kind"] == "combined_term" and ex["matched"]
    assert ex["score"] == pytest.approx(row["score"], rel=1e-9)
    assert {f["field"] for f in ex["detail"]["fields"]} == {0, 1}


def test_batched_row_identity(spark, cfx):
    """Batched search_many runs combined_fields in one job with the
    shared aux rid namespace: the norms deliveries of BOTH queries
    coexist without collision, rows identical to the single path."""
    from ostrich_spark.query.exec import search_many

    qs = {
        "cf1": _q("spark", {"title": 1.0, "body": 2.0}),
        "cf2": _q("merge", {"title": 1.0, "body": 1.0}),
    }
    batched = search_many(spark, cfx, qs, limit=None, scorer="bm25")
    for qid, q in qs.items():
        single, _ = search(spark, cfx, q, limit=None, scorer="bm25")
        want = {
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in single.collect()
        }
        got = {
            (r["segment_id"], r["doc"], round(r["score"], 9))
            for r in batched.filter(batched.query_id == qid).collect()
        }
        assert got == want, qid


def test_percolation_membership_identity(spark):
    """Percolation normalizes a combined_fields leaf to the OR of its
    per-field terms (pseudo-stats change scores, not membership)."""
    from ostrich_spark.percolate import percolate, register_queries

    schema = _schema()
    docs = spark.createDataFrame(
        [(d["doc_id"], d["title"], d["body"]) for d in DOCS],
        "doc_key long, title string, body string",
    )
    q = _q("spark merge", {"title": 1.0, "body": 2.0}, operator="and")
    pq = register_queries({"cf": q}, schema)
    got = {r["doc_key"] for r in percolate(spark, docs, pq, schema,
                                           id_col="doc_key").collect()}
    assert got == {1}  # the only doc holding both terms in some field


def test_norms_scan_pushdown(spark, cfx):
    """The per-field norms delivery must prune on ``field`` at the
    parquet scan (PushedFilters), not post-filter — at 100 TB each
    combined field costs ONE pruned norms column read, the Lucene
    norms-file analog."""
    from pyspark.sql import functions as F

    from ostrich_spark.manifest import load_manifest
    from ostrich_spark.query.exec import read_norms

    mf = load_manifest(cfx)
    df = read_norms(spark, cfx, mf).filter(F.col("field") == 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(field,1)" in plan.split("PushedFilters", 1)[1][:120]


def test_alias_bit_identity(spark, cfx, tmp_path_factory):
    """combined_fields through the multi-index alias: parity-split
    halves searched with alias-GLOBAL stats (summed df -> max-df over
    fields, summed field tokens -> pseudo avgdl) score BIT-identical to
    the single full index — the alias contract extends to BM25F."""
    from ostrich_spark.query.multi import attach_docmap_multi, search_multi

    halves = []
    for parity in (0, 1):
        idx = str(tmp_path_factory.mktemp(f"cfalias{parity}") / "idx")
        build_index(
            spark,
            spark.createDataFrame(
                pd.DataFrame([d for d in DOCS if d["doc_id"] % 2 == parity])
            ),
            _schema(), idx, num_partitions=1,
            order_col="doc_id", id_cols=["doc_id"],
        )
        halves.append(idx)
    q = _q("spark", {"title": 1.0, "body": 2.0})
    res = search_multi(spark, halves, q, limit=None, scorer="bm25")[0]
    got = {
        r["doc_id"]: r["score"]
        for r in attach_docmap_multi(spark, halves, res)
        .select("doc_id", "score").collect()
    }
    want = _hits(spark, cfx, q)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == want[d], d  # bit-identical, not approx


def test_cli_combined_fields(spark, cfx):
    """CLI --fields title,body^2 --combined drives the BM25F path; top
    hit's score matches the engine; --combined without --fields and
    --tie with --combined refuse loudly."""
    import subprocess
    import sys as _sys

    run = lambda extra: subprocess.run(
        [_sys.executable, "-m", "ostrich_spark", "search", "spark",
         "-p", cfx, "--scorer", "bm25", "-l", "5"] + extra,
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    out = run(["--fields", "title,body^2", "--combined"])
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines()
            if "/" in l and not l.startswith("elapsed")]
    assert len(hits) == 3
    top_cli = float(hits[0].split()[1])
    want = max(_combined_expected("spark", {"title": 1.0, "body": 2.0}).values())
    assert top_cli == pytest.approx(want, rel=1e-6)
    assert run(["--combined"]).returncode != 0
    assert run(["--fields", "title,body", "--combined", "--tie", "0.3"]).returncode != 0


def test_validation():
    with pytest.raises(QueryParseError):
        CombinedTermQuery((), "spark")
    with pytest.raises(QueryParseError):
        CombinedTermQuery(((0, 0.5),), "spark")  # weight < 1
    with pytest.raises(QueryParseError):
        CombinedTermQuery(((0, 1.0), (0, 2.0)), "spark")  # dup field
    with pytest.raises(QueryParseError):
        CombinedTermQuery(((0, 1.0),), "")
    s = _schema()
    s.add_numeric_field("n")
    with pytest.raises(QueryParseError):
        parse_combined_fields("x", s, {"n": 1.0})  # non-text field
    s2 = Schema()
    s2.add_text_field("a", "default")
    s2.add_text_field("b", "en_stem")
    with pytest.raises(QueryParseError):
        parse_combined_fields("x", s2, {"a": 1.0, "b": 1.0})  # mixed analyzers
    with pytest.raises(QueryParseError):
        parse_combined_fields("x", _schema(), {"title": 1.0}, operator="nor")
