"""update_docs upsert: tombstone-then-append in one call.

EXTENSION — the reference's delete plumbing is commented out
(/root/reference/index/index_meta.go:55-59); updates are the standard
LSM contract: old version hidden by tombstone, new version lives in a
fresh segment, physical space reclaimed at merge/purge.
"""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.deletes import update_docs
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.schema import Schema


def _schema():
    s = Schema()
    s.add_text_field("content", "default")
    return s


def _docs(n=12):
    return [{"k": i, "content": f"alpha original doc{i}"} for i in range(n)]


def _build(spark, path, docs):
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), _schema(), path,
        num_partitions=3, order_col="k", id_cols=["k"],
    )


def _ks(spark, idx, q):
    res, _ = search(spark, idx, q, limit=None)
    return sorted(r["k"] for r in attach_docmap(spark, idx, res).select("k").collect())


def test_update_replaces_and_inserts(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs())
    batch = [
        {"k": 3, "content": "alpha updated fresh"},   # replace
        {"k": 7, "content": "alpha updated fresh"},   # replace
        {"k": 100, "content": "alpha brandnew"},      # insert
    ]
    n_tomb, mf = update_docs(
        spark, idx, spark.createDataFrame(pd.DataFrame(batch)), ["k"], "u1",
        num_partitions=1,
    )
    assert n_tomb == 2
    # old versions hidden everywhere
    assert _ks(spark, idx, "content:original") == [i for i in range(12) if i not in (3, 7)]
    # new versions + clean insert visible
    assert _ks(spark, idx, "content:updated") == [3, 7]
    assert _ks(spark, idx, "content:brandnew") == [100]
    # each identity resolves to exactly one live doc
    assert _ks(spark, idx, "content:alpha") == sorted(list(range(12)) + [100])


def test_update_twice_latest_wins(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs(6))
    b1 = [{"k": 2, "content": "alpha version two"}]
    update_docs(spark, idx, spark.createDataFrame(pd.DataFrame(b1)), ["k"], "u1", num_partitions=1)
    b2 = [{"k": 2, "content": "alpha version three"}]
    update_docs(spark, idx, spark.createDataFrame(pd.DataFrame(b2)), ["k"], "u2", num_partitions=1)
    assert _ks(spark, idx, "content:two") == []
    assert _ks(spark, idx, "content:three") == [2]
    assert _ks(spark, idx, "content:alpha") == [0, 1, 2, 3, 4, 5]


def test_update_duplicate_identity_rejected(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs(4))
    batch = [
        {"k": 1, "content": "alpha a"},
        {"k": 1, "content": "alpha b"},
    ]
    with pytest.raises(ValueError, match="duplicate identity"):
        update_docs(spark, idx, spark.createDataFrame(pd.DataFrame(batch)), ["k"], "dup", num_partitions=1)
    # index unchanged
    assert _ks(spark, idx, "content:alpha") == [0, 1, 2, 3]


def test_update_crash_then_rerun_recovers(spark, tmp_path):
    """Crash after the tombstone commit but mid-append: rerunning the
    SAME call is the documented recovery (delete idempotent, append
    resumes its checkpoints)."""
    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs(6))
    batch = spark.createDataFrame(
        pd.DataFrame([
            {"k": 1, "content": "alpha replacement"},
            {"k": 50, "content": "alpha insert"},
        ])
    )
    with pytest.raises(Exception):
        update_docs(
            spark, idx, batch, ["k"], "u1",
            num_partitions=2, fail_after_partitions=1,
        )
    # victims already hidden; batch not yet visible
    assert 1 not in _ks(spark, idx, "content:original")
    n_tomb, _ = update_docs(spark, idx, batch, ["k"], "u1", num_partitions=2)
    assert n_tomb == 0  # delete leg idempotent
    assert _ks(spark, idx, "content:replacement") == [1]
    assert _ks(spark, idx, "content:insert") == [50]
    assert _ks(spark, idx, "content:alpha") == [0, 1, 2, 3, 4, 5, 50]


def test_update_then_purge_reclaims(spark, tmp_path):
    from ostrich_spark.merge import purge_deletes

    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs(6))
    batch = [{"k": 0, "content": "alpha reborn"}]
    update_docs(spark, idx, spark.createDataFrame(pd.DataFrame(batch)), ["k"], "u1", num_partitions=1)
    purge_deletes(spark, idx)
    assert _ks(spark, idx, "content:reborn") == [0]
    assert _ks(spark, idx, "content:alpha") == [0, 1, 2, 3, 4, 5]
    assert _ks(spark, idx, "content:original") == [1, 2, 3, 4, 5]


def test_append_guard_no_suffix_false_positive(spark, tmp_path):
    """A build_id that is a dash-suffix of an earlier one must still be
    accepted as a fresh append (exact-id guard, not endswith)."""
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(_docs(4))), _schema(), idx,
        num_partitions=1, order_col="k", id_cols=["k"], build_id="entry-upd-x",
    )
    extra = [{"k": 100, "content": "alpha extra"}]
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(extra)), _schema(), idx,
        num_partitions=1, order_col="k", id_cols=["k"],
        build_id="upd-x", mode="append",
    )
    assert _ks(spark, idx, "content:alpha") == [0, 1, 2, 3, 100]
    # the true duplicate still raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="already committed"):
        build_index(
            spark, spark.createDataFrame(pd.DataFrame(extra)), _schema(), idx,
            num_partitions=1, order_col="k", id_cols=["k"],
            build_id="upd-x", mode="append",
        )


def test_cli_update(spark, tmp_path):
    import subprocess
    import sys as _sys

    idx = str(tmp_path / "idx")
    _build(spark, idx, _docs(5))
    batch = tmp_path / "batch.parquet"
    spark.createDataFrame(
        pd.DataFrame([{"k": 2, "content": "alpha cliupdated"}])
    ).write.parquet(str(batch))
    out = subprocess.run(
        [_sys.executable, "-m", "ostrich_spark", "update", str(batch),
         "-p", idx, "--id-col", "k", "--build-id", "cliu1", "--partitions", "1"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "updated: 1 replaced" in out.stdout
    assert _ks(spark, idx, "content:cliupdated") == [2]
    assert _ks(spark, idx, "content:alpha") == [0, 1, 2, 3, 4]
