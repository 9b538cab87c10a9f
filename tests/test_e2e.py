"""End-to-end rank-identity: Spark engine vs single-process oracle
(SURVEY.md §5.2) on the reference fixtures (FIXTURES.md §2-3)."""

import math

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.oracle import OracleIndex
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema


def _build_example(spark, tmp_path, schema, docs):
    rows = [{"doc_key": i, **d} for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows)
    idx = str(tmp_path / "idx")
    manifest = build_index(
        spark, df, schema, idx, num_partitions=2, order_col="doc_key", id_cols=["doc_key"]
    )
    return idx, manifest


def _engine_hits(spark, idx, query, **kw):
    """-> [(doc_key, score)] sorted by (score desc, doc_key asc)."""
    res, cnt = search(spark, idx, query, **kw)
    joined = attach_docmap(spark, idx, res).select("doc_key", "score").collect()
    return sorted([(r["doc_key"], r["score"]) for r in joined], key=lambda t: (-t[1], t[0])), cnt


@pytest.fixture(scope="module")
def example_index(spark, tmp_path_factory, example_schema, example_docs):
    tmp = tmp_path_factory.mktemp("example")
    idx, manifest = _build_example(spark, tmp, example_schema, example_docs)
    oracle = OracleIndex(example_schema, example_docs)
    return idx, manifest, oracle


def test_manifest_stats(example_index, example_schema):
    idx, manifest, oracle = example_index
    assert manifest.stats["total_docs"] == 3
    assert manifest.total_docs == 3
    # field token totals match the oracle's
    for fe in example_schema.fields:
        assert manifest.stats["field_tokens"][str(fe.id)] == oracle.field_tokens.get(fe.id, 0)


def test_readme_example_query(spark, example_index):
    """/root/reference/example/main.go:79: TupleCollector(TopScore(10,0), Count)."""
    idx, _, oracle = example_index
    hits, cnt = _engine_hits(
        spark, idx, "phrase:hat OR description:serious", limit=10, with_count=True
    )
    expected = oracle.search("phrase:hat OR description:serious", limit=10)
    assert cnt == 2
    assert [d for d, _ in hits] == [d for d, _ in expected] == [1, 2]
    for (d1, s1), (d2, s2) in zip(hits, expected):
        assert d1 == d2 and s1 == pytest.approx(s2, rel=1e-12)
    # exact formula: idf = 1 + ln(3/(1+1)), tf=1
    assert hits[0][1] == pytest.approx(1.0 + math.log(3.0 / 2.0), rel=1e-12)


def test_index_writer_fixture(spark, tmp_path):
    """/root/reference/indexer/index_writer_test.go:16-73: 2 docs, default
    analyzer, TermQuery(title:test) -> exactly 1 hit."""
    schema = Schema()
    schema.add_text_field("title", "default")
    schema.add_text_field("description", "default")
    docs = [{"title": "test title"}, {"title": "abc"}]
    rows = [{"doc_key": i, "title": d["title"], "description": ""} for i, d in enumerate(docs)]
    idx = str(tmp_path / "idx2")
    build_index(
        spark,
        spark.createDataFrame(rows),
        schema,
        idx,
        num_partitions=1,
        order_col="doc_key",
        id_cols=["doc_key"],
    )
    hits, _ = _engine_hits(spark, idx, "title:test", limit=1)
    assert len(hits) == 1 and hits[0][0] == 0


QUERIES = [
    "phrase:hat OR description:serious",
    "description:outcome",
    "description:outcome AND description:confidence",
    "(rubber OR road) AND (test or begin)",
    "rubber road",
    "description:something description:test",
    "phrase:the",  # en_stem drops stopword 'the' -> empty -> no hits
    "description:nonexistentterm",
    "phrase:Rubber AND description:BEGIN",
]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("scorer", ["tfidf", "bm25"])
def test_rank_identity_all_queries(spark, example_index, q, scorer):
    idx, _, oracle = example_index
    hits, _ = _engine_hits(spark, idx, q, limit=None, scorer=scorer)
    expected = oracle.search(q, limit=None, scorer=scorer)
    assert [d for d, _ in hits] == [d for d, _ in expected], q
    for (d1, s1), (d2, s2) in zip(hits, expected):
        assert s1 == pytest.approx(s2, rel=1e-12), (q, d1)


def test_all_query(spark, example_index):
    idx, _, oracle = example_index
    hits, cnt = _engine_hits(spark, idx, "", limit=10, with_count=True)
    assert cnt == 3
    assert [d for d, _ in hits] == [0, 1, 2]
    assert all(s == 1.0 for _, s in hits)


def test_offset_pagination(spark, example_index):
    idx, _, oracle = example_index
    full, _ = _engine_hits(spark, idx, "rubber road test hat", limit=None)
    # engine global order must equal oracle order; offset slices it
    res, _ = search(spark, idx, "rubber road test hat", limit=2, offset=1)
    got = attach_docmap(spark, idx, res).select("doc_key", "score").collect()
    got = sorted([(r["doc_key"], r["score"]) for r in got], key=lambda t: (-t[1], t[0]))
    expected = oracle.search("rubber road test hat", limit=2, offset=1)
    assert [d for d, _ in got] == [d for d, _ in expected]


def test_content_sha256_invariant(spark, example_index, example_docs):
    """Per-row invariant (BASELINE.json input_hint): sha256 of the indexed
    content equals a locally recomputed hash, source vs docmap."""
    import hashlib

    idx, _, _ = example_index
    dm = spark.read.parquet(f"{idx}/segments/*/docmap.parquet").collect()
    assert len(dm) == 3
    for r in dm:
        d = example_docs[r["doc_key"]]
        expect = (
            hashlib.sha256(d["phrase"].encode()).hexdigest()
            + hashlib.sha256(d["description"].encode()).hexdigest()
        )
        assert r["content_sha256"] == expect


def test_count_only(spark, example_index):
    idx, _, oracle = example_index
    q = "rubber road test hat"
    _, cnt = _engine_hits(spark, idx, q, limit=0, with_count=True)
    assert cnt == oracle.count(q)
