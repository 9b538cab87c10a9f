"""Phrase suggester (ES phrase suggester / Lucene NoisyChannelSpellChecker
analog; EXTENSION — the reference has no suggest API; suggest_text is the
documented per-word-greedy LITE this completes).

Every score below is hand-computed from the fixture's unigram/bigram
counts — the sketch-op rule: the LM arithmetic (channel split, all three
smoothing models, backoff branch) is pinned against independent math, not
just oracle symmetry.

Fixture counts: N=13 tokens, V=8 vocab.
unigrams: spark 2, merge 3, policy 3, daemon 1, engine 1, fast 1, scan 1,
marge 1. bigrams: (spark,merge) 2, (merge,policy) 2, (merge,daemon) 1,
(policy,engine) 1, (fast,scan) 1, (marge,policy) 1.
"""

import math

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.phrase_suggest import phrase_suggest, train_phrase_lm
from ostrich_spark.schema import Schema

DOCS = [
    {"doc_id": 0, "text": "spark merge policy"},
    {"doc_id": 1, "text": "spark merge daemon"},
    {"doc_id": 2, "text": "merge policy engine"},
    {"doc_id": 3, "text": "fast scan"},
    {"doc_id": 4, "text": "marge policy"},
]
N, V = 13, 8
LN = math.log


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plm") / "idx")
    s = Schema()
    s.add_text_field("text", "default", store=True)
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s,
        d,
        num_partitions=2,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    train_phrase_lm(spark, d, "text")
    return d


def test_stupid_backoff_hand_scores(spark, idx):
    # 'mergw' candidates (prefix m, <=2 edits): merge d1, marge d2.
    # (spark, merge): bigram SEEN -> ln(2/2)=0; channel .05*(1-1/5).
    # (spark, marge): bigram UNSEEN -> backoff ln(.4*1/13); channel
    # .05*(1-2/5). Both branches of stupid_backoff in one input.
    out = phrase_suggest(spark, idx, "text", "spark mergw", confidence=0.0)
    assert [p.text for p in out] == ["spark merge", "spark marge"]
    s_merge = LN(0.95) + LN(2 / N) + LN(0.05 * 0.8) + LN(2 / 2)
    s_marge = LN(0.95) + LN(2 / N) + LN(0.05 * 0.6) + LN(0.4 * 1 / N)
    assert out[0].score == pytest.approx(s_merge, rel=1e-12)
    assert out[1].score == pytest.approx(s_marge, rel=1e-12)
    assert out[0].n_errors == 1 and out[1].n_errors == 1


def test_laplace_hand_scores(spark, idx):
    out = phrase_suggest(
        spark, idx, "text", "spark mergw", confidence=0.0,
        smoothing="laplace",
    )
    a = 0.5
    s_merge = (
        LN(0.95) + LN((2 + a) / (N + a * V))
        + LN(0.05 * 0.8) + LN((2 + a) / (2 + a * V))
    )
    s_marge = (
        LN(0.95) + LN((2 + a) / (N + a * V))
        + LN(0.05 * 0.6) + LN((0 + a) / (2 + a * V))
    )
    got = {p.text: p.score for p in out}
    assert got["spark merge"] == pytest.approx(s_merge, rel=1e-12)
    assert got["spark marge"] == pytest.approx(s_marge, rel=1e-12)


def test_linear_interpolation_hand_scores(spark, idx):
    out = phrase_suggest(
        spark, idx, "text", "spark mergw", confidence=0.0,
        smoothing="linear_interpolation", lambdas=(0.7, 0.3),
    )
    s_merge = (
        LN(0.95) + LN(2 / N) + LN(0.05 * 0.8)
        + LN(0.7 * 2 / 2 + 0.3 * 3 / N)
    )
    s_marge = (
        LN(0.95) + LN(2 / N) + LN(0.05 * 0.6)
        + LN(0.7 * 0 + 0.3 * 1 / N)
    )
    got = {p.text: p.score for p in out}
    assert got["spark merge"] == pytest.approx(s_merge, rel=1e-12)
    assert got["spark marge"] == pytest.approx(s_marge, rel=1e-12)


def test_max_errors_budget(spark, idx):
    # both tokens misspelled: fraction 0.5 of 2 tokens = budget 1 ->
    # nothing reachable; absolute 2 -> the double correction appears
    assert (
        phrase_suggest(
            spark, idx, "text", "sparq mergw", confidence=0.0,
            max_errors=0.5,
        )
        == []
    )
    out = phrase_suggest(
        spark, idx, "text", "sparq mergw", confidence=0.0, max_errors=2,
    )
    assert out and out[0].text == "spark merge" and out[0].n_errors == 2


def test_confidence_gate_and_include_input(spark, idx):
    # valid input "spark merge": the marge rewrite scores below the
    # input, so ES-default confidence=1.0 returns nothing...
    assert phrase_suggest(spark, idx, "text", "spark merge") == []
    # ...confidence=0 surfaces it...
    out = phrase_suggest(spark, idx, "text", "spark merge", confidence=0.0)
    assert [p.text for p in out] == ["spark marge"]
    # ...and include_input returns the unchanged input (n_errors 0)
    out = phrase_suggest(
        spark, idx, "text", "spark merge", include_input=True,
    )
    assert [(p.text, p.n_errors) for p in out] == [("spark merge", 0)]
    s_input = LN(0.95) + LN(2 / N) + LN(0.95) + LN(2 / 2)
    assert out[0].score == pytest.approx(s_input, rel=1e-12)


def test_collate_drops_non_cooccurring(spark, idx):
    # "spark marge": both terms exist, never in one doc -> collate kills
    out = phrase_suggest(
        spark, idx, "text", "spark merge", confidence=0.0, collate=True,
    )
    assert out == []
    # sanity: a co-occurring suggestion survives collate
    out = phrase_suggest(
        spark, idx, "text", "spark mergw", confidence=0.0, collate=True,
    )
    assert [p.text for p in out] == ["spark merge"]


def test_tombstoned_docs_leave_the_model(spark, idx, tmp_path):
    # copy the index, delete the 'marge policy' doc, retrain: marge stays
    # in the DICTIONARY (stats frozen until purge) but its unigram count
    # is 0 -> the marge path is impossible; merge rescores over N=11
    import shutil

    from ostrich_spark.deletes import delete_docs

    d = str(tmp_path / "copy")
    shutil.copytree(idx, d)
    match = spark.createDataFrame([(4,)], "doc_id long")
    delete_docs(spark, d, match, ["doc_id"])
    train_phrase_lm(spark, d, "text")
    out = phrase_suggest(spark, d, "text", "spark mergw", confidence=0.0)
    assert [p.text for p in out] == ["spark merge"]
    n2 = 11
    s_merge = LN(0.95) + LN(2 / n2) + LN(0.05 * 0.8) + LN(2 / 2)
    assert out[0].score == pytest.approx(s_merge, rel=1e-12)


def test_validation(spark, idx, tmp_path):
    with pytest.raises(ValueError, match="smoothing"):
        phrase_suggest(spark, idx, "text", "x", smoothing="kneser_ney")
    with pytest.raises(ValueError, match="sum to 1"):
        phrase_suggest(
            spark, idx, "text", "x",
            smoothing="linear_interpolation", lambdas=(0.5, 0.4),
        )
    with pytest.raises(ValueError, match="real_word_error_likelihood"):
        phrase_suggest(
            spark, idx, "text", "x", real_word_error_likelihood=1.5,
        )
    with pytest.raises(ValueError, match="max_errors"):
        phrase_suggest(spark, idx, "text", "spark merge", max_errors=0)
    assert phrase_suggest(spark, idx, "text", "   ") == []
    # unstored field: loud, with the store=True hint, before model check
    d = str(tmp_path / "nostore")
    s = Schema()
    s.add_text_field("text", "default")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s, d, num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    with pytest.raises(ValueError, match="store=True"):
        train_phrase_lm(spark, d, "text")
    # stored but untrained: actionable FileNotFoundError
    d2 = str(tmp_path / "untrained")
    s2 = Schema()
    s2.add_text_field("text", "default", store=True)
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(DOCS)),
        s2, d2, num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    with pytest.raises(FileNotFoundError, match="train_phrase_lm"):
        phrase_suggest(spark, d2, "text", "spark mergw")


def test_cli_phrase(spark, idx, capsys):
    from ostrich_spark.cli import main

    rc = main([
        "suggest", "spark mergw", "-p", idx, "--field", "text",
        "--phrase", "--confidence", "0",
    ])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("spark merge\t")
    assert out[1].startswith("spark marge\t")
    # untrained index: exit 2 with the actionable hint
    import shutil

    d = idx + "_cli_untrained"
    if not __import__("os").path.exists(d):
        shutil.copytree(idx, d)
        shutil.rmtree(d + "/models")
    assert main([
        "suggest", "spark mergw", "-p", d, "--field", "text", "--phrase",
    ]) == 2
