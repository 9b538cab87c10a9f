"""IdsQuery — ES `ids` query analog: identity-column set membership,
dtype-exact ('07' != '7' on string ids), composable as FILTER/MUST_NOT,
one pushed-down docmap scan."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, explain, search
from ostrich_spark.query.parser import (
    FILTER, MUST, MUST_NOT, BooleanQuery, IdsQuery, QueryParseError,
    parse_query,
)
from ostrich_spark.schema import Schema

DOCS = [
    (0, "07", "spark join window"),
    (1, "7", "spark shuffle"),
    (2, "a", "spark stream"),
    (3, "b", "flink stream"),
    (4, "c", "spark plan"),
    (5, "d", "other text"),
]


@pytest.fixture(scope="module")
def idsx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ids") / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    df = spark.createDataFrame(DOCS, "doc_id long, sid string, text string")
    build_index(
        spark, df, s, idx, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id", "sid"],
    )
    return idx


def _ids(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    rows = attach_docmap(spark, idx, res).select("doc_id", "score").collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_bare_ids_query_and_boost(spark, idsx):
    got = _ids(spark, idsx, IdsQuery("doc_id", [1, 4]))
    assert got == {1: 1.0, 4: 1.0}
    boosted = _ids(spark, idsx, IdsQuery("doc_id", [1, 4], boost=2.5))
    assert boosted == {1: 2.5, 4: 2.5}


def test_string_ids_dtype_exact(spark, idsx):
    """'7' matches only the sid='7' doc — never '07' (string identity
    stays string; the cli-delete dtype contract)."""
    assert set(_ids(spark, idsx, IdsQuery("sid", ["7"]))) == {1}
    assert set(_ids(spark, idsx, IdsQuery("sid", ["07"]))) == {0}
    # numeric column accepts castable strings
    assert set(_ids(spark, idsx, IdsQuery("doc_id", ["3", 4]))) == {3, 4}


def test_composes_as_filter_and_must_not(spark, idsx):
    from ostrich_spark.manifest import load_manifest

    schema = load_manifest(idsx).schema
    text = parse_query("text:spark", schema)
    plain = _ids(spark, idsx, text)
    filtered = _ids(
        spark, idsx, BooleanQuery([(MUST, text),
                                   (FILTER, IdsQuery("doc_id", [0, 1, 3]))])
    )
    # filter restricts without touching scores
    assert set(filtered) == {0, 1}
    assert all(filtered[d] == plain[d] for d in filtered)
    excluded = _ids(
        spark, idsx, BooleanQuery([(MUST, text),
                                   (MUST_NOT, IdsQuery("sid", ["07", "a"]))])
    )
    assert set(excluded) == set(plain) - {0, 2}


def test_explain_and_validation(spark, idsx):
    res, _ = search(spark, idsx, IdsQuery("sid", ["7"]), limit=None)
    hit = res.collect()[0]
    tree = explain(spark, idsx, IdsQuery("sid", ["7"]),
                   hit["segment_id"], hit["doc"])
    import json

    s = json.dumps(tree)
    assert '"op": "ids"' in s and '"column": "sid"' in s
    with pytest.raises(ValueError, match="not in docmap"):
        search(spark, idsx, IdsQuery("nosuch", ["x"]), limit=None)
    with pytest.raises(ValueError, match="cannot cast"):
        search(spark, idsx, IdsQuery("doc_id", ["xx"]), limit=None)
    with pytest.raises(QueryParseError):
        IdsQuery("doc_id", [])


def test_cli_ids_filter(idsx):
    import subprocess
    import sys

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", *argv],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("search", "text:spark", "-p", idsx, "--ids", "sid=07,a",
              "--limit", "10")
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if "/" in l.split()[0]]
    assert len(hits) == 2  # docs 0 and 2 only
    bad = run("search", "text:spark", "-p", idsx, "--ids", "justacolumn")
    assert bad.returncode == 2 and "COLUMN=v1,v2" in bad.stderr


def test_batched_row_identity(spark, idsx):
    from ostrich_spark.query.exec import search_many

    qs = {
        "a": IdsQuery("doc_id", [1, 4]),
        "b": "text:spark",
    }
    many = search_many(spark, idsx, qs, limit=None)
    by_qid = {}
    for r in many.collect():
        by_qid.setdefault(r["query_id"], set()).add(
            (r["segment_id"], r["doc"], round(r["score"], 9))
        )
    for name, q in qs.items():
        solo, _ = search(spark, idsx, q, limit=None)
        want = {(r["segment_id"], r["doc"], round(r["score"], 9))
                for r in solo.collect()}
        assert by_qid.get(name, set()) == want, name
