"""significant_text — ES significant_text aggregation analog: free-text
significant terms recomputed from the STORED source of a match-set
sample, with the duplicate-run token filter (filter_duplicate_text).

Cross-validation: with the dedup off and the sample unbounded, the
stored-text re-analysis path must reproduce ``significant_terms``
EXACTLY (two independent implementations — postings cogroup decode vs
stored-text Arrow re-tokenization — agreeing on every count and score).

Dedup expectations are hand-derived over the fixture below: FOOTER is a
6-token run pasted into several docs; the globally-first occurrence
(keep-first by (segment_ord, doc, spos)) keeps its tokens, every other
occurrence (including a within-doc repeat) drops exactly the covered
positions."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import significant_terms, significant_text
from ostrich_spark.schema import Schema

FOOTER = "alpha beta gamma delta epsilon zeta"  # exactly dup_len=6 tokens

DOCS = [
    {"doc_id": 0, "text": "spark core engine " + FOOTER},
    {"doc_id": 1, "text": "spark sql planner " + FOOTER},
    {"doc_id": 2, "text": "spark mllib " + FOOTER},
    {"doc_id": 3, "text": "flink runtime " + FOOTER},  # not in the match set
    {"doc_id": 4, "text": "spark tiny"},  # < 6 tokens: no shingles
    {"doc_id": 5, "text": "spark " + FOOTER + " " + FOOTER},  # in-doc repeat
]
FOOTER_TERMS = FOOTER.split()


def _build(spark, path, num_partitions=1, store=True):
    s = Schema()
    s.add_text_field("text", "default", positions=False, store=store)
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
        str(path),
        num_partitions=num_partitions,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    return str(path)


@pytest.fixture(scope="module")
def stx(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory.mktemp("sigtext") / "idx")


def _counts(df):
    return {r["term"]: (r["n_docs"], r["doc_freq"]) for r in df.collect()}


def test_nodedup_equals_significant_terms(spark, stx):
    """shard_size=None + filter off == significant_terms, count for count
    — and score for score through the shared significance tail."""
    st = _counts(significant_terms(spark, stx, "text:spark", "text"))
    sx = _counts(
        significant_text(
            spark, stx, "text:spark", "text",
            shard_size=None, filter_duplicate_text=False,
        )
    )
    assert sx == st and len(sx) > 5
    a = significant_terms(
        spark, stx, "text:spark", "text", significance="jlh", size=10
    ).collect()
    b = significant_text(
        spark, stx, "text:spark", "text",
        shard_size=None, filter_duplicate_text=False,
        significance="jlh", size=10,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_dedup_hand_counts(spark, stx):
    """Keep-first: d0 (smallest key) keeps the footer; d1/d2 drop it; the
    d5 within-doc repeat drops BOTH footer occurrences (pos-2 run
    duplicates d0, pos-8 run duplicates pos 2); short d4 keeps all."""
    got = _counts(
        significant_text(
            spark, stx, "text:spark", "text",
            shard_size=None, filter_duplicate_text=True,
        )
    )
    for t in FOOTER_TERMS:
        assert got[t] == (1, 5), t  # fg: d0 only; bg: 5 docs corpus-wide
    assert got["spark"] == (5, 5)  # never inside a duplicated run
    for t, bgdf in (("core", 1), ("sql", 1), ("mllib", 1), ("tiny", 1)):
        assert got[t] == (1, bgdf), t
    assert "flink" not in got  # d3 never matches the query


def test_dedup_invariant_across_segmentation(spark, stx, tmp_path):
    """2-segment build elects a different-but-unique first occurrence;
    the COUNTS are segmentation-invariant for this fixture (exactly one
    sampled doc keeps the footer, whichever it is)."""
    two = _build(spark, tmp_path / "idx2", num_partitions=2)
    one_c = _counts(
        significant_text(spark, stx, "text:spark", "text",
                         shard_size=None, filter_duplicate_text=True)
    )
    two_c = _counts(
        significant_text(spark, two, "text:spark", "text",
                         shard_size=None, filter_duplicate_text=True)
    )
    assert one_c == two_c


def test_shard_size_sampling(spark, stx):
    """shard_size=1 on the single-segment index keeps only the champion
    hit (score desc, doc asc → d0: all tf(spark)=1, tie on doc): only
    d0's terms appear and the jlh subset size is the SAMPLE size."""
    got = _counts(
        significant_text(spark, stx, "text:spark", "text",
                         shard_size=1, filter_duplicate_text=False)
    )
    assert set(got) == set("spark core engine".split()) | set(FOOTER_TERMS)
    assert all(n == 1 for n, _ in got.values())
    j = significant_text(
        spark, stx, "text:spark", "text",
        shard_size=1, filter_duplicate_text=False,
        significance="percentage",
    ).collect()
    by_term = {r["term"]: r["score"] for r in j}
    # percentage = n_docs / doc_freq on the sampled foreground
    assert by_term["core"] == pytest.approx(1.0)
    assert by_term["alpha"] == pytest.approx(1 / 5)


def test_cli_text_mode(stx):
    """sigterms --text runs significant_text (dedup on by default): the
    pasted footer counts once where the postings path counts every
    matching doc — the boilerplate-cleansing contract, visible through
    the CLI."""
    import subprocess
    import sys

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", *argv],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    plain = run("sigterms", "text:spark", "-p", stx, "--field", "text")
    assert plain.returncode == 0, plain.stderr[-2000:]
    assert "alpha 4 5" in plain.stdout
    text = run("sigterms", "text:spark", "-p", stx, "--field", "text", "--text")
    assert text.returncode == 0, text.stderr[-2000:]
    assert "alpha 1 5" in text.stdout
    assert text.stdout.splitlines()[0].startswith("spark 5 5")


def test_validation(spark, stx, tmp_path):
    with pytest.raises(ValueError, match="store=True"):
        nostore = _build(spark, tmp_path / "nostore", store=False)
        significant_text(spark, nostore, "text:spark", "text")
    with pytest.raises(ValueError, match="not a text field"):
        significant_text(spark, stx, "text:spark", "nosuch")
    with pytest.raises(ValueError, match="significance heuristic"):
        significant_text(spark, stx, "text:spark", "text", size=5)
    with pytest.raises(ValueError, match="dup_len"):
        significant_text(spark, stx, "text:spark", "text", dup_len=1)
    with pytest.raises(ValueError, match="shard_size"):
        significant_text(spark, stx, "text:spark", "text", shard_size=0)
