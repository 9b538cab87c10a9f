"""Data streams — ES data-stream / rollover analog: numbered generation
indexes behind one stream, appends to the write index, condition-based
rollover, alias-global search. The load-bearing claim: a corpus split
across generations scores BIT-IDENTICALLY to the same corpus in one
index (summed doc_freq / N / avgdl), pinned against a combined index."""

import os

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.datastream import (
    StreamError,
    append,
    attach_stream_docmap,
    create_stream,
    rollover,
    search_stream,
    stream_indexes,
    stream_stats,
    write_index,
)
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": i, "text": t}
    for i, t in enumerate([
        "spark shuffle merge",
        "spark stream join",
        "merge policy segment",
        "stream spark spark",
        "join filter scan",
        "spark merge merge stream",
    ])
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    return s


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def _scores(spark, df_rows):
    return {r["doc_id"]: round(r["score"], 9) for r in df_rows}


@pytest.fixture()
def stream(spark, tmp_path):
    sd = str(tmp_path / "stream")
    create_stream(sd, name="docs")
    append(spark, _df(spark, DOCS[:3]), _schema(), sd,
           num_partitions=2, order_col="doc_id", id_cols=["doc_id"])
    r = rollover(sd, force=True)
    assert r["rolled"] and r["conditions"] == {"force": True}
    append(spark, _df(spark, DOCS[3:]), _schema(), sd,
           num_partitions=2, order_col="doc_id", id_cols=["doc_id"])
    return sd


def test_stream_search_identical_to_single_index(spark, stream, tmp_path):
    """Two generations score bit-identically to one combined index —
    the alias-global statistics contract, both scorers."""
    single = str(tmp_path / "single")
    build_index(spark, _df(spark, DOCS), _schema(), single,
                num_partitions=2, order_col="doc_id", id_cols=["doc_id"])
    for scorer in ("tfidf", "bm25"):
        res, cnt = search_stream(
            spark, stream, "text:spark", limit=None, with_count=True,
            scorer=scorer,
        )
        got = _scores(
            spark,
            attach_stream_docmap(spark, stream, res)
            .select("doc_id", "score").collect(),
        )
        sres, _ = search(spark, single, "text:spark", limit=None, scorer=scorer)
        want = _scores(
            spark,
            attach_docmap(spark, single, sres)
            .select("doc_id", "score").collect(),
        )
        assert got == want and len(got) == 4
        assert cnt == 4


def test_rollover_conditions(spark, tmp_path):
    sd = str(tmp_path / "s2")
    create_stream(sd)
    # empty write index never rolls — even forced
    r = rollover(sd, force=True)
    assert not r["rolled"] and r["conditions"] == {}
    append(spark, _df(spark, DOCS[:3]), _schema(), sd,
           num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    # under threshold: no roll
    r = rollover(sd, max_docs=10)
    assert not r["rolled"] and r["conditions"] == {"max_docs": False}
    # at/over threshold: rolls, reports which condition fired
    r = rollover(sd, max_docs=3, max_segments=99)
    assert r["rolled"]
    assert r["conditions"] == {"max_docs": True, "max_segments": False}
    assert r["write_index"].endswith("gen-000002")
    assert write_index(sd).endswith("gen-000002")
    # fresh write index is unsearchable until its first append
    assert [os.path.basename(d) for d in stream_indexes(sd)] == ["gen-000001"]
    res, _ = search_stream(spark, sd, "text:spark", limit=None)
    assert res.count() == 2  # docs 0,1 in gen-1 only
    # next append lands in gen-2
    append(spark, _df(spark, DOCS[3:]), _schema(), sd,
           num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    st = stream_stats(sd)
    assert st["write_index"] == "gen-000002"
    assert [g["docs"] for g in st["generations"]] == [3, 3]


def test_stream_errors(spark, tmp_path):
    sd = str(tmp_path / "s3")
    with pytest.raises(StreamError, match="create_stream"):
        write_index(sd)
    create_stream(sd)
    with pytest.raises(StreamError, match="already exists"):
        create_stream(sd)
    with pytest.raises(StreamError, match="no committed generation"):
        search_stream(spark, sd, "text:spark")


def test_stream_deletes_visible(spark, stream):
    """Tombstones inside one generation are excluded from stream-wide
    search (each generation's search path is manifest-pinned)."""
    from ostrich_spark.deletes import delete_docs

    gens = stream_indexes(stream)
    delete_docs(
        spark, gens[0],
        spark.createDataFrame([(1,)], "doc_id long"), ["doc_id"],
    )
    res, _ = search_stream(spark, stream, "text:spark", limit=None)
    got = attach_stream_docmap(spark, stream, res).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [0, 3, 5]


def test_cli_stream(spark, stream, tmp_path):
    import subprocess
    import sys

    def run(*a):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "stream", *a],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    sd = str(tmp_path / "clistream")
    out = run("create", "-p", sd, "--name", "clidocs")
    assert out.returncode == 0 and "created stream 'clidocs'" in out.stdout
    out = run("create", "-p", sd)
    assert out.returncode == 2 and "already exists" in out.stderr
    # status + rollover + search against the populated fixture stream
    out = run("status", "-p", stream)
    assert out.returncode == 0
    import json

    st = json.loads(out.stdout)
    assert st["write_index"] == "gen-000002"
    assert [g["docs"] for g in st["generations"]] == [3, 3]
    out = run("rollover", "-p", stream, "--max-docs", "999")
    assert out.returncode == 0 and "rolled: False" in out.stdout
    out = run("rollover", "-p", stream, "--force")
    assert out.returncode == 0
    assert "rolled: True (force)" in out.stdout
    assert "gen-000003" in out.stdout
    out = run("search", "-p", stream, "-q", "text:spark", "--limit", "2")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("gen=")]
    assert len(lines) == 2 and all("doc_id=" in l and "score=" in l for l in lines)


def test_cli_stream_append(spark, tmp_path):
    """Templated create -> append parquet -> search, all via the CLI;
    append on an untemplated stream errors (exit 2, no schema guessing)."""
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    def run(*a):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "stream", *a],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2],
                  "text": ["spark merge", "stream join", "spark spark"]}),
        os.path.join(corpus, "part0.parquet"),
    )
    sd = str(tmp_path / "tplstream")
    out = run("create", "-p", sd, "--field", "text")
    assert out.returncode == 0 and "templated" in out.stdout
    out = run("append", "-p", sd, "--input", corpus,
              "--partitions", "1", "--order-col", "doc_id",
              "--id-col", "doc_id")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "3 docs" in out.stdout
    out = run("search", "-p", sd, "-q", "text:spark", "--limit", "10")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("gen=")]
    assert len(lines) == 2  # docs 0 and 2
    # missing --input and untemplated-append error paths
    out = run("append", "-p", sd)
    assert out.returncode == 2 and "needs --input" in out.stderr
    sd2 = str(tmp_path / "notpl")
    assert run("create", "-p", sd2).returncode == 0
    out = run("append", "-p", sd2, "--input", corpus)
    assert out.returncode == 2 and "needs a schema" in out.stderr


def test_stream_template_enforced(spark, tmp_path):
    """A templated stream appends WITHOUT a schema arg and rejects a
    drifted one; an untemplated stream demands the schema."""
    from ostrich_spark.datastream import stream_template

    sd = str(tmp_path / "tpl")
    create_stream(sd, schema=_schema())
    assert stream_template(sd).to_json() == _schema().to_json()
    append(spark, _df(spark, DOCS[:2]), None, sd,
           num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    # identical schema allowed explicitly
    append(spark, _df(spark, DOCS[2:4]), _schema(), sd,
           num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    drifted = Schema()
    drifted.add_text_field("text", "en_stem")
    with pytest.raises(StreamError, match="differs from the stream template"):
        append(spark, _df(spark, DOCS[4:]), drifted, sd,
               num_partitions=1, order_col="doc_id", id_cols=["doc_id"])
    res, _ = search_stream(spark, sd, "text:spark", limit=None)
    assert res.count() == 3  # docs 0, 1, 3 — both same-generation appends live
    # untemplated stream: schema required
    sd2 = str(tmp_path / "notpl")
    create_stream(sd2)
    assert stream_template(sd2) is None
    with pytest.raises(StreamError, match="needs a schema"):
        append(spark, _df(spark, DOCS[:2]), None, sd2,
               num_partitions=1, order_col="doc_id", id_cols=["doc_id"])


def test_prune_generations(spark, stream, tmp_path):
    """Retention: oldest generations drop, write index survives,
    stream.json stops listing a generation before its dir is removed."""
    from ostrich_spark.datastream import prune_generations

    rollover(stream, force=True)
    append(spark, _df(spark, [{"doc_id": 9, "text": "spark late"}]),
           _schema(), stream, num_partitions=1, order_col="doc_id",
           id_cols=["doc_id"])
    # 3 generations now; keep 2 -> gen-000001 (docs 0-2) drops
    dropped = prune_generations(stream, keep_last=2)
    assert dropped == ["gen-000001"]
    assert not os.path.exists(os.path.join(stream, "gen-000001"))
    assert [os.path.basename(d) for d in stream_indexes(stream)] == [
        "gen-000002", "gen-000003"
    ]
    res, _ = search_stream(spark, stream, "text:spark", limit=None)
    got = attach_stream_docmap(spark, stream, res).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [3, 5, 9]
    # nothing else to prune at keep=2; keep clamps/validates
    assert prune_generations(stream, keep_last=2) == []
    with pytest.raises(ValueError, match=">= 1"):
        prune_generations(stream, keep_last=0)
    # rollover AFTER a prune must mint max-existing+1, never list-length+1:
    # gens are [2,3] here, so len+1 would re-mint the live write index
    # gen-000003 (appends landing in the sealed index, searches listing
    # the dir twice)
    r = rollover(stream, force=True)
    assert os.path.basename(r["write_index"]) == "gen-000004"
    append(spark, _df(spark, [{"doc_id": 11, "text": "spark newest"}]),
           _schema(), stream, num_partitions=1, order_col="doc_id",
           id_cols=["doc_id"])
    assert [os.path.basename(d) for d in stream_indexes(stream)] == [
        "gen-000002", "gen-000003", "gen-000004"
    ]
    res, _ = search_stream(spark, stream, "text:spark", limit=None)
    got = attach_stream_docmap(spark, stream, res).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [3, 5, 9, 11]  # no double-count


def test_append_under_live_writer(spark, stream):
    """A second append queued behind a live writer (lock_wait > 0) mints
    its build_id from the POST-commit state once the lock frees — the
    id is computed under the generation lock, so it can never go stale
    against a concurrent commit. With the default lock_wait=0 the same
    situation is a loud LockHeldError, never a reused-build_id crash."""
    import threading

    from ostrich_spark.datastream import write_index as _wi
    from ostrich_spark.lock import LockHeldError, write_lock

    target = _wi(stream)
    from ostrich_spark.manifest import load_manifest

    m0 = load_manifest(target)
    results: dict = {}

    def queued_append():
        try:
            results["manifest"] = append(
                spark, _df(spark, [{"doc_id": 21, "text": "spark queued"}]),
                _schema(), stream, num_partitions=1, order_col="doc_id",
                id_cols=["doc_id"], lock_wait=30.0,
            )
        except Exception as e:  # surfaces in the main thread's assert
            results["error"] = e

    # hold the generation's write lock from THIS thread (a different
    # thread of the same process is a foreign writer to the lock)
    with write_lock(target, owner="test-writer"):
        # default lock_wait=0: loud refusal while a writer is live
        err: dict = {}

        def refused():
            try:
                append(spark, _df(spark, [{"doc_id": 22, "text": "x"}]),
                       _schema(), stream, num_partitions=1,
                       order_col="doc_id", id_cols=["doc_id"])
            except LockHeldError as e:
                err["e"] = e

        t0 = threading.Thread(target=refused)
        t0.start(); t0.join(timeout=60)
        assert "e" in err
        # queued append blocks on the lock...
        t = threading.Thread(target=queued_append)
        t.start()
        t.join(timeout=2.0)
        assert t.is_alive()  # still waiting — the lock is held here
    t.join(timeout=120)
    assert not t.is_alive()
    assert "error" not in results, results.get("error")
    m1 = results["manifest"]
    assert m1.total_docs == m0.total_docs + 1
    # the minted id reflects the state it observed under the lock
    new_seg = [s for s in m1.segments
               if s.lineage.get("build_id", "").startswith("stream-append-")]
    assert any(
        s.lineage["build_id"] == f"stream-append-{m0.opstamp}-{len(m0.segments)}"
        for s in new_seg
    )
    res, _ = search_stream(spark, stream, "text:queued", limit=None)
    got = attach_stream_docmap(spark, stream, res).select("doc_id").collect()
    assert [r["doc_id"] for r in got] == [21]
