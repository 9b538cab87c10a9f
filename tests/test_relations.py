"""Parent/child join queries: has_child / has_parent.

EXTENSION (Elasticsearch ``join`` field analog — the reference engine
has no relational surface, /root/reference/query/query.go:3-33). Parents
and children live in one index, discriminated by a keyword relation
field; children carry the parent key in a doc-value field.
"""

import math

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import delete_docs
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.relations import has_child, has_parent
from ostrich_spark.schema import Schema

# parents (rel=q): question docs; children (rel=a): answers keyed by parent
DOCS = [
    # doc_id, text, rel, parent
    (10, "spark joins question", "q", None),
    (20, "window question", "q", None),
    (30, "streaming question spark", "q", None),
    (40, "orphan question", "q", None),
    (11, "spark answer first", "a", "10"),
    (12, "spark spark answer", "a", "10"),
    (13, "plain answer", "a", "10"),
    (21, "spark answer", "a", "20"),
    (31, "totally unrelated", "a", "30"),
    (99, "spark answer dangling", "a", "777"),  # parent key with no parent doc
    (98, "spark answer orphanless", "a", None),  # NULL parent never counts
]


def _schema() -> Schema:
    s = Schema()
    s.add_text_field("text", "default")
    s.add_keyword_field("rel")
    s.add_keyword_field("parent")
    return s


@pytest.fixture(scope="module")
def rel_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, rel string, parent string"
    )
    idx = str(tmp_path_factory.mktemp("rel") / "idx")
    build_index(
        spark, df, _schema(), idx, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def _hc(spark, idx, q, **kw):
    kw.setdefault("limit", None)
    res = has_child(
        spark, idx, q,
        relation_field="rel", child_relation="a", parent_relation="q",
        parent_field="parent", id_col="doc_id", **kw,
    )
    mf = load_manifest(idx)
    rows = attach_docmap(spark, idx, res, manifest=mf).collect()
    return {r.doc_id: (r.score, r.n_children) for r in rows}


def _hp(spark, idx, q, **kw):
    kw.setdefault("limit", None)
    res = has_parent(
        spark, idx, q,
        relation_field="rel", parent_relation="q", child_relation="a",
        parent_field="parent", id_col="doc_id", **kw,
    )
    mf = load_manifest(idx)
    rows = attach_docmap(spark, idx, res, manifest=mf).collect()
    return {r.doc_id: r.score for r in rows}


def _child_scores(spark, idx, q):
    """Reference: per-child scores of q among rel=a docs, via plain search."""
    res, _ = search(spark, idx, q, limit=None)
    rows = attach_docmap(spark, idx, res).collect()
    by_id = {r.doc_id: r.score for r in rows if r.rel == "a"}
    parent = {d[0]: d[3] for d in DOCS}
    out = {}
    for did, sc in by_id.items():
        p = parent[did]
        if p is not None:
            out.setdefault(p, []).append(sc)
    return out


def test_has_child_none_constant_score(spark, rel_index):
    got = _hc(spark, rel_index, "text:spark", score_mode="none")
    # children matching 'spark': 11,12,21,99(dangling),98(null parent)
    # -> parents 10 (n=2), 20 (n=1); 777 has no parent doc; NULL ignored
    assert got == {10: (1.0, 2), 20: (1.0, 1)}


def test_has_child_score_modes_match_brute_force(spark, rel_index):
    per_parent = _child_scores(spark, rel_index, "text:spark")
    for mode, fn in [
        ("sum", sum), ("max", max), ("min", min),
        ("avg", lambda v: sum(v) / len(v)),
    ]:
        got = _hc(spark, rel_index, "text:spark", score_mode=mode)
        want = {
            int(p): (fn(v), len(v))
            for p, v in per_parent.items()
            if int(p) in (10, 20, 30)
        }
        assert set(got) == set(want)
        for p in want:
            assert math.isclose(got[p][0], want[p][0], rel_tol=1e-9), (mode, p)
            assert got[p][1] == want[p][1]


def test_has_child_min_max_children(spark, rel_index):
    got = _hc(spark, rel_index, "text:spark", min_children=2)
    assert set(got) == {10}
    got = _hc(spark, rel_index, "text:spark", max_children=1)
    assert set(got) == {20}
    got = _hc(spark, rel_index, "text:answer", min_children=3)
    assert set(got) == {10}  # 11,12,13 all match 'answer'
    assert got[10][1] == 3


def test_has_child_relation_filter_excludes_parent_matches(spark, rel_index):
    # 'question' appears only in parent docs -> zero child matches
    assert _hc(spark, rel_index, "text:question") == {}


def test_has_child_limit_order(spark, rel_index):
    res = has_child(
        spark, rel_index, "text:spark",
        relation_field="rel", child_relation="a", parent_relation="q",
        parent_field="parent", id_col="doc_id",
        score_mode="sum", limit=1,
    )
    rows = res.collect()
    assert len(rows) == 1
    full = _hc(spark, rel_index, "text:spark", score_mode="sum")
    best = max(full.items(), key=lambda kv: kv[1][0])
    got = attach_docmap(spark, rel_index, res).collect()[0]
    assert got.doc_id == best[0]


def test_has_parent_filter_and_scored(spark, rel_index):
    got = _hp(spark, rel_index, "text:streaming")
    # parent 30 matches -> its child 31, constant score
    assert got == {31: 1.0}
    # scored: children inherit the parent's score
    res, _ = search(spark, rel_index, "text:streaming", limit=None)
    prow = [
        r for r in attach_docmap(spark, rel_index, res).collect() if r.rel == "q"
    ]
    assert len(prow) == 1
    got = _hp(spark, rel_index, "text:streaming", score=True)
    assert set(got) == {31}
    assert math.isclose(got[31], prow[0].score, rel_tol=1e-9)


def test_has_parent_multiple_children(spark, rel_index):
    got = _hp(spark, rel_index, "text:joins")
    # parent 10 -> children 11,12,13
    assert set(got) == {11, 12, 13}
    assert all(v == 1.0 for v in got.values())


def test_relation_errors(spark, rel_index):
    with pytest.raises(ValueError, match="score_mode"):
        _hc(spark, rel_index, "text:spark", score_mode="mean")
    with pytest.raises(ValueError, match="min_children"):
        _hc(spark, rel_index, "text:spark", min_children=0)
    with pytest.raises(ValueError, match="max_children"):
        _hc(spark, rel_index, "text:spark", min_children=2, max_children=1)
    with pytest.raises(ValueError, match="doc-value"):
        has_child(
            spark, rel_index, "text:spark",
            relation_field="text", child_relation="a", parent_relation="q",
            parent_field="parent", id_col="doc_id",
        ).collect()
    with pytest.raises(ValueError, match="not in docmap"):
        has_child(
            spark, rel_index, "text:spark",
            relation_field="rel", child_relation="a", parent_relation="q",
            parent_field="nope", id_col="doc_id",
        ).collect()


def test_string_keys_stay_exact(spark, tmp_path):
    # '07' and '7' are DIFFERENT string keys: the numeric->string cast
    # rule must never merge them (long ids cast to canonical '7')
    docs = [
        (7, "seven parent", "q", None),
        (100, "child of seven", "a", "7"),
        (101, "child of zero seven", "a", "07"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, rel string, parent string"
    )
    idx = str(tmp_path / "idx")
    build_index(
        spark, df, _schema(), idx, num_partitions=1,
        order_col="doc_id", id_cols=["doc_id"],
    )
    res = has_child(
        spark, idx, "text:child",
        relation_field="rel", child_relation="a", parent_relation="q",
        parent_field="parent", id_col="doc_id", limit=None,
    )
    rows = attach_docmap(spark, idx, res).collect()
    assert len(rows) == 1 and rows[0].doc_id == 7
    assert rows[0].n_children == 1  # only '7', never '07'
    got = _hp(spark, idx, "text:seven")
    assert set(got) == {100}


def test_cli_join(rel_index):
    import subprocess
    import sys

    base = [
        sys.executable, "-m", "ostrich_spark", "join",
    ]
    tail = [
        "-p", rel_index, "--relation-field", "rel", "--child", "a",
        "--parent", "q", "--parent-field", "parent", "--id-col", "doc_id",
        "--scorer", "tfidf", "-l", "10",
    ]
    out = subprocess.run(
        base + ["haschild", "text:spark", "--score-mode", "sum"] + tail,
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hit = [l for l in out.stdout.splitlines() if "children=" in l]
    assert len(hit) == 2  # parents 10 and 20
    for l in hit:
        addr, score, nc = l.split()
        seg, doc = addr.split("/")
        int(seg), int(doc), float(score)
        assert nc.startswith("children=")
    out = subprocess.run(
        base + ["hasparent", "text:streaming", "--score"] + tail,
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hit = [l for l in out.stdout.splitlines() if "/" in l and not l.startswith("elapsed")]
    assert len(hit) == 1  # child 31
    out = subprocess.run(
        base + ["haschild", "text:spark", "--score-mode", "median"] + tail,
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 2


def test_tombstoned_parent_and_child_excluded(spark, tmp_path):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, rel string, parent string"
    )
    idx = str(tmp_path / "idx")
    build_index(
        spark, df, _schema(), idx, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"],
    )
    # delete parent 20 and child 12
    victims = spark.createDataFrame([(20,), (12,)], "doc_id long")
    assert delete_docs(spark, idx, victims, ["doc_id"]) == 2
    got = _hc(spark, idx, "text:spark", score_mode="none")
    # child 12 tombstoned -> parent 10 now n=1; parent 20 tombstoned -> gone
    assert got == {10: (1.0, 1)}
    got = _hp(spark, idx, "text:joins")
    assert set(got) == {11, 13}  # child 12 tombstoned
