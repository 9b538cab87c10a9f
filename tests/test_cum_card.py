"""cumulative_cardinality (ES pipeline agg analog): exact cumulative
distinct-value curve over date_histogram buckets via the first-seen
reduction — hand-counted fixture, null handling, match-set scoping."""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import cumulative_cardinality
from ostrich_spark.schema import Schema

US_PER_DAY = 86_400_000_000
MS_PER_DAY = 86_400_000

DOCS = [
    # day 0: users 1, 1, 2  -> n_new 2
    {"doc_id": 0, "text": "click", "t": 0, "u": 1},
    {"doc_id": 1, "text": "click", "t": 1_000_000, "u": 1},
    {"doc_id": 2, "text": "click", "t": 2_000_000, "u": 2},
    # day 1: users 2, 3 -> n_new 1
    {"doc_id": 3, "text": "click", "t": US_PER_DAY, "u": 2},
    {"doc_id": 4, "text": "click", "t": US_PER_DAY + 5, "u": 3},
    # day 2: null user + repeat user -> n_new 0, n_docs 2
    {"doc_id": 5, "text": "click", "t": 2 * US_PER_DAY, "u": None},
    {"doc_id": 6, "text": "click", "t": 2 * US_PER_DAY + 9, "u": 1},
    # day 4: new user
    {"doc_id": 7, "text": "click", "t": 4 * US_PER_DAY, "u": 4},
    # non-matching doc with an otherwise-new user: must NOT count
    {"doc_id": 8, "text": "view", "t": 0, "u": 99},
    # null date: drops entirely
    {"doc_id": 9, "text": "click", "t": None, "u": 5},
]


@pytest.fixture(scope="module")
def ccx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cumcard") / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    s.add_date_field("t")
    s.add_numeric_field("u")
    df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["t"], d["u"]) for d in DOCS],
        "doc_id long, text string, t long, u long",
    )
    build_index(
        spark, df, s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


def test_hand_counts(spark, ccx):
    rows = cumulative_cardinality(
        spark, ccx, "text:click", "t", "u", interval="day"
    ).collect()
    got = [(r["bucket_ms"], r["n_docs"], r["n_new"], r["cum_card"])
           for r in rows]
    assert got == [
        (0, 3, 2, 2),
        (MS_PER_DAY, 2, 1, 3),
        (2 * MS_PER_DAY, 2, 0, 3),
        (4 * MS_PER_DAY, 1, 1, 4),
    ]


def test_single_week_bucket(spark, ccx):
    rows = cumulative_cardinality(
        spark, ccx, "text:click", "t", "u", interval="week"
    ).collect()
    # days 0..4 of epoch fall in two ISO weeks (1970-01-01 is a Thursday)
    assert [r["cum_card"] for r in rows] == [3, 4]
    assert sum(r["n_docs"] for r in rows) == 8


def test_cli_cum_card(ccx):
    import subprocess
    import sys

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", *argv],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("agg", "text:click", "-p", ccx, "--cum-card", "t", "--of", "u")
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0] == "0 n 3 new 2 cum 2"
    assert f"{4 * MS_PER_DAY} n 1 new 1 cum 4" in out.stdout
    # --of is mandatory
    bad = run("agg", "text:click", "-p", ccx, "--cum-card", "t")
    assert bad.returncode == 2 and "--of" in bad.stderr


def test_validation(spark, ccx):
    with pytest.raises(ValueError, match="interval"):
        cumulative_cardinality(spark, ccx, "text:click", "t", "u",
                               interval="fortnight")
    with pytest.raises(ValueError, match="date field"):
        cumulative_cardinality(spark, ccx, "text:click", "u", "u")
    with pytest.raises(ValueError, match="doc-value"):
        cumulative_cardinality(spark, ccx, "text:click", "t", "text")
