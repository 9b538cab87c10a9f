"""parse_query_lenient — the ES simple_query_string never-throw
contract: full NQL first, syntax-stripped bare-word degradation on any
parse error, AllQuery when nothing survives."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import attach_docmap, search
from ostrich_spark.query.parser import (
    AllQuery,
    EmptyQuery,
    TermQuery,
    parse_query,
    parse_query_lenient,
)
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "spark join stream"},
    {"doc_id": 1, "text": "merge policy"},
]


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    return s


def test_valid_queries_parse_identically():
    s = _schema()
    for q in ("text:spark", "text:spark AND text:join", 'text:"spark join"'):
        assert parse_query_lenient(q, s) == parse_query(q, s)


def test_invalid_syntax_degrades_to_words():
    s = _schema()
    # unclosed phrase -> words survive as bare terms (implicit OR)
    q = parse_query_lenient('text:"spark join', s)
    assert q == parse_query("spark join", s)
    # dangling operator -> operator dropped
    assert parse_query_lenient("spark AND", s) == parse_query("spark", s)
    # unclosed range bracket -> brackets/colon strip, words survive
    # ('5' and 'TO' become plain bare words — ignore-invalid-parts)
    q2 = parse_query_lenient("text:[5 TO spark", s)
    assert q2 == parse_query("5 TO spark", s)
    # unclosed phrase after a valid one -> ALL quotes strip
    q3 = parse_query_lenient('"a b" OR "c', s)
    assert q3 == parse_query("a b c", s)
    # nothing survives -> AllQuery (parse_query's empty contract)
    assert isinstance(parse_query_lenient('"', s), AllQuery)


def test_end_to_end_never_throws(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("lenient") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(DOCS)), _schema(), idx,
        num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    res, _ = search(
        spark, idx, parse_query_lenient('text:"spark join', _schema()),
        limit=None,
    )
    got = {r["doc_id"] for r in attach_docmap(spark, idx, res).collect()}
    assert got == {0}  # both words live in doc 0 only
    # CLI --lenient: the same malformed query exits 0 with hits; the
    # strict path exits non-zero
    import subprocess
    import sys as _sys

    run = lambda extra: subprocess.run(
        [_sys.executable, "-m", "ostrich_spark", "search",
         'text:"spark join', "-p", idx, "-l", "5"] + extra,
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    ok = run(["--lenient"])
    assert ok.returncode == 0, ok.stderr[-2000:]
    assert any("/" in l for l in ok.stdout.splitlines())
    assert run([]).returncode != 0  # strict stays loud
