"""field_caps — ES _field_caps analog: per-(field, type) capabilities
across indexes, type conflicts flagged with per-type index lists."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.multi import field_caps
from ostrich_spark.schema import Schema


def _build(spark, path, numeric_v: bool):
    s = Schema()
    s.add_text_field("text", "en_stem", positions=True, store=True)
    s.add_keyword_field("lang")
    if numeric_v:
        s.add_numeric_field("v", "double")
    else:
        s.add_keyword_field("v")  # type CONFLICT with the numeric twin
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 0, "text": "x", "lang": "fr",
                       "v": 1.5 if numeric_v else "one"}])
    )
    build_index(spark, df, s, str(path), num_partitions=1,
                order_col="doc_id", id_cols=["doc_id"])
    return str(path)


@pytest.fixture(scope="module")
def two(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fcaps")
    return _build(spark, root / "a", True), _build(spark, root / "b", False)


def test_single_index_caps(spark, two):
    a, _ = two
    rows = {r["field"]: r for r in field_caps(a)}
    assert rows["text"]["searchable"] and not rows["text"]["aggregatable"]
    assert rows["text"]["metadata"] == {
        "analyzer": "en_stem", "positions": True, "store": True,
    }
    assert rows["lang"]["aggregatable"] and rows["lang"]["searchable"]
    assert rows["v"]["type"] == "f64" or rows["v"]["type"] == "double"
    assert not any(r["conflict"] for r in rows.values())


def test_conflict_across_alias(spark, two):
    a, b = two
    rows = field_caps([a, b])
    v_rows = [r for r in rows if r["field"] == "v"]
    assert len(v_rows) == 2  # one row PER type
    assert all(r["conflict"] for r in v_rows)
    by_type = {r["type"]: r["indices"] for r in v_rows}
    types = sorted(by_type)
    assert len(types) == 2
    # each type names exactly the index that carries it
    all_idx = set(sum(by_type.values(), []))
    assert all_idx == {a, b}
    # non-conflicting fields list both indexes on ONE row
    text_rows = [r for r in rows if r["field"] == "text"]
    assert len(text_rows) == 1 and sorted(text_rows[0]["indices"]) == sorted([a, b])
    assert not text_rows[0]["conflict"]
    with pytest.raises(ValueError):
        field_caps([])


def test_cli_fields(two):
    import subprocess
    import sys

    a, b = two
    out = subprocess.run(
        [sys.executable, "-m", "ostrich_spark", "fields", "-p", a, "-p", b],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert any("CONFLICT" in l and l.startswith("v ") for l in lines)
    assert any(l.startswith("text ") and "en_stem positions store" in l
               for l in lines)
    assert any("(2/2 indexes)" in l for l in lines if l.startswith("text"))
