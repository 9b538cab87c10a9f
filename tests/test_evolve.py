"""Append-only schema evolution (manifest.add_field).

Contract: a new field appears at the next FieldID via an explicit
commit; older segments hold no data for it (queries match only docs
appended afterwards, stored/doc-value columns read as null on old
docs); appends must use the evolved schema; anything that is not an
append-only extension is rejected before it can re-address postings.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import add_field, load_manifest, set_snapshot_retention
from ostrich_spark.query.exec import attach_docmap, get_docs, search
from ostrich_spark.schema import Schema

OLD_DOCS = [
    {"k": 0, "text": "spark stream merge"},
    {"k": 1, "text": "spark join window"},
]
NEW_DOCS = [
    {"k": 2, "text": "spark merge policy", "lang": "english text here", "stars": 7},
    {"k": 3, "text": "window batch", "lang": "english words", "stars": 2},
]


def _base_schema():
    s = Schema()
    s.add_text_field("text", "default")
    return s


@pytest.fixture()
def idx(spark, tmp_path):
    path = str(tmp_path / "idx")
    set_snapshot_retention(path, 3)
    build_index(
        spark, spark.createDataFrame(OLD_DOCS), _base_schema(), path,
        num_partitions=1, order_col="k", id_cols=["k"],
    )
    return path


def _evolve_and_append(spark, idx):
    add_field(idx, "lang", "default")
    add_field(idx, "stars", numeric_type="long")
    evolved = load_manifest(idx).schema
    build_index(
        spark, spark.createDataFrame(NEW_DOCS), evolved, idx,
        num_partitions=1, order_col="k", id_cols=["k"],
        build_id="evolved-batch", mode="append",
    )
    return evolved


def test_new_field_matches_only_new_docs(spark, idx):
    _evolve_and_append(spark, idx)
    res, _ = search(spark, idx, "lang:english", limit=None)
    got = sorted(r["k"] for r in attach_docmap(spark, idx, res).select("k").collect())
    assert got == [2, 3]
    # the old field spans both generations with merged stats
    res, _ = search(spark, idx, "text:spark", limit=None)
    got = sorted(r["k"] for r in attach_docmap(spark, idx, res).select("k").collect())
    assert got == [0, 1, 2]


def test_evolved_doc_values_null_on_old_docs(spark, idx):
    _evolve_and_append(spark, idx)
    rows = {r["k"]: r.asDict() for r in get_docs(spark, idx, [0, 2], "k").collect()}
    assert rows[0]["stars"] is None  # old segment: column surfaces as null
    assert rows[2]["stars"] == 7
    # range query on the evolved numeric field sees only valued docs
    res, _ = search(spark, idx, "stars:[1 TO 10]", limit=None)
    got = sorted(r["k"] for r in attach_docmap(spark, idx, res).select("k").collect())
    assert got == [2, 3]


def test_add_field_commits_and_snapshots(spark, idx):
    before = load_manifest(idx).opstamp
    add_field(idx, "lang", "default")
    m = load_manifest(idx)
    assert m.opstamp == before + 1
    assert m.schema.field_by_name("lang").id == 1
    # the pre-evolution snapshot still loads the OLD schema
    old = load_manifest(idx, opstamp=before)
    assert old.schema.field_by_name("lang") is None
    with pytest.raises(ValueError, match="already exists"):
        add_field(idx, "lang")
    with pytest.raises(KeyError):
        add_field(idx, "x", analyzer="no-such-analyzer")


def test_append_rejects_non_extension_schemas(spark, idx):
    reordered = Schema()
    reordered.add_text_field("other", "default")
    reordered.add_text_field("text", "default")
    with pytest.raises(ValueError, match="append-only extension"):
        build_index(
            spark, spark.createDataFrame(NEW_DOCS), reordered, idx,
            num_partitions=1, order_col="k", id_cols=["k"],
            build_id="bad", mode="append",
        )
    retyped = Schema()
    retyped.add_text_field("text", "en_stem")  # same name, different analyzer
    with pytest.raises(ValueError, match="append-only extension"):
        build_index(
            spark, spark.createDataFrame(NEW_DOCS), retyped, idx,
            num_partitions=1, order_col="k", id_cols=["k"],
            build_id="bad2", mode="append",
        )


def test_fsck_clean_after_evolution(spark, idx):
    from ostrich_spark.check import check_index

    _evolve_and_append(spark, idx)
    assert check_index(spark, idx) == []


def test_cli_evolve(spark, idx):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "evolve", "-p", idx,
         "--add-field", "stars", "--numeric", "long"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "added field 1: stars (long)" in out.stdout
    dup = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "evolve", "-p", idx,
         "--add-field", "stars"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert dup.returncode == 2 and "already exists" in dup.stderr
