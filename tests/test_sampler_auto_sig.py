"""sampler / diversified_sampler facets, auto_date_histogram, and
significance-scored significant_terms — ES agg analogs (EXTENSION).
Hand-computed expectations from the documented formulas."""

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import (
    attach_docmap,
    auto_date_histogram,
    date_histogram,
    sampler_facet,
    search,
    significant_terms,
)
from ostrich_spark.schema import Schema

US_PER_DAY = 86_400_000_000


def _mk_docs():
    # 12 docs, 1 segment: text:spark tf differentiates scores; author
    # diversification key; cat facet key
    rows = []
    for i in range(12):
        tf = 3 if i < 2 else (2 if i < 6 else 1)
        rows.append({
            "doc_id": i,
            "text": ("spark " * tf) + f"filler{i} common",
            "author": f"a{i % 3}",
            "cat": "x" if i % 2 == 0 else "y",
        })
    return rows


@pytest.fixture(scope="module")
def smp_index(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("text", "default")
    s.add_keyword_field("author")
    s.add_keyword_field("cat")
    idx = str(tmp_path_factory.mktemp("smp") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(_mk_docs())),
        s,
        idx,
        num_partitions=1,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    return idx


def _scores(spark, idx):
    res, _ = search(spark, idx, "text:spark", limit=None, scorer="tfidf")
    rows = attach_docmap(spark, idx, res).select("doc_id", "score").collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_sampler_top_shard_size(spark, smp_index):
    """Plain sampler: facet over only the best shard_size docs of the
    (single) segment, tie-broken by doc asc."""
    got = {
        r["cat"]: r["n_docs"]
        for r in sampler_facet(
            spark, smp_index, "text:spark", "cat", shard_size=4
        ).collect()
    }
    # ranking: docs 0,1 (tf=3) then 2,3 (tf=2, doc asc tie-break)
    docs = _mk_docs()
    want = {}
    for i in (0, 1, 2, 3):
        want[docs[i]["cat"]] = want.get(docs[i]["cat"], 0) + 1
    assert got == want


def test_diversified_sampler_caps_per_value(spark, smp_index):
    """diversify=author, max_docs_per_value=1: the sample has at most
    one doc per author, chosen best-first."""
    out = sampler_facet(
        spark, smp_index, "text:spark", "author",
        shard_size=10, diversify="author", max_docs_per_value=1,
    ).collect()
    assert {r["author"] for r in out} == {"a0", "a1", "a2"}
    assert all(r["n_docs"] == 1 for r in out)
    # cap 2: two docs per author survive (sample = 6 < shard_size)
    out2 = sampler_facet(
        spark, smp_index, "text:spark", "author",
        shard_size=10, diversify="author", max_docs_per_value=2,
    ).collect()
    assert sorted(r["n_docs"] for r in out2) == [2, 2, 2]
    with pytest.raises(ValueError, match="shard_size"):
        sampler_facet(spark, smp_index, "text:spark", "cat", shard_size=0)
    with pytest.raises(ValueError, match="max_docs_per_value"):
        sampler_facet(
            spark, smp_index, "text:spark", "cat",
            diversify="author", max_docs_per_value=0,
        )


def test_diversified_selection_is_best_first(spark, smp_index):
    """Cap-then-top equals ES's best-first-with-skips: with cap 1 and
    shard_size 2 the sample is the best doc of each of the two best
    authors — docs 0 (a0) and 1 (a1), never two a0 docs."""
    out = sampler_facet(
        spark, smp_index, "text:spark", "author",
        shard_size=2, diversify="author", max_docs_per_value=1,
    ).collect()
    assert {r["author"]: r["n_docs"] for r in out} == {"a0": 1, "a1": 1}


# --- auto_date_histogram -------------------------------------------------


@pytest.fixture(scope="module")
def auto_idx(spark, tmp_path_factory):
    s = Schema()
    s.add_text_field("kind", "default")
    s.add_date_field("t")
    # 90 days of hourly-ish points
    rows = [
        {"doc_id": i, "kind": "evt", "t": i * (US_PER_DAY // 4)}
        for i in range(360)
    ]
    idx = str(tmp_path_factory.mktemp("auto") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pd.DataFrame(rows)),
        s,
        idx,
        num_partitions=2,
        order_col="doc_id",
        id_cols=["doc_id"],
    )
    return idx


def test_auto_date_histogram_ladder(spark, auto_idx):
    """90-day span: buckets=100 -> day (90 buckets), buckets=20 ->
    week (13+1 est), buckets=5 -> month, huge -> hour."""
    for buckets, want in ((100, "day"), (20, "week"), (5, "month"), (3000, "hour")):
        out = auto_date_histogram(
            spark, auto_idx, "kind:evt", "t", buckets=buckets
        )
        rows = out.collect()
        assert rows and all(r["interval"] == want for r in rows), (
            buckets, want, rows[0]["interval"] if rows else None,
        )
        assert len(rows) <= buckets
        # identical to the explicit histogram at the chosen interval
        explicit = date_histogram(spark, auto_idx, "kind:evt", "t", want)
        assert sorted((r["bucket_ms"], r["n_docs"]) for r in rows) == sorted(
            (r["bucket_ms"], r["n_docs"]) for r in explicit.collect()
        )


def test_auto_date_histogram_empty_and_validation(spark, auto_idx):
    out = auto_date_histogram(spark, auto_idx, "kind:nomatch", "t").collect()
    assert out == []
    with pytest.raises(ValueError, match="buckets"):
        auto_date_histogram(spark, auto_idx, "kind:evt", "t", buckets=0)
    with pytest.raises(ValueError, match="date field"):
        auto_date_histogram(spark, auto_idx, "kind:evt", "kind")


# --- significance-scored significant_terms -------------------------------


def test_significance_jlh_hand_math(spark, smp_index):
    """JLH = (fg% − bg%)·(fg%/bg%) recomputed by hand from the corpus."""
    out = {
        r["term"]: r
        for r in significant_terms(
            spark, smp_index, "text:spark", "text", significance="jlh"
        ).collect()
    }
    docs = _mk_docs()
    n_total = len(docs)
    matched = [d for d in docs if "spark" in d["text"]]
    subset = len(matched)
    # 'common' occurs in every doc: fg% == bg% == 1 -> score 0
    assert out["common"]["score"] == pytest.approx(0.0, abs=1e-12)
    # filler0 occurs in exactly one matched doc
    fg = 1 / subset
    bg = 1 / n_total
    assert out["filler0"]["score"] == pytest.approx(
        (fg - bg) * (fg / bg), rel=1e-12
    )
    assert out["filler0"]["bg_percent"] == pytest.approx(100.0 / n_total)
    # every doc matches here, so subset == superset and ALL scores are 0
    assert subset == n_total


def test_significance_chi_square_and_ranking(spark, smp_index):
    """chi_square via the textbook 2×2 formula; size cut keeps the
    top-N by (score desc, term asc)."""
    rows = significant_terms(
        spark, smp_index, "text:spark", "text",
        significance="chi_square", size=3,
    ).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    full = significant_terms(
        spark, smp_index, "text:spark", "text", significance="chi_square"
    ).collect()
    ranked = sorted(full, key=lambda r: (-r["score"], r["term"]))[:3]
    assert [(r["term"], r["score"]) for r in rows] == [
        (r["term"], r["score"]) for r in ranked
    ]
    with pytest.raises(ValueError, match="significance"):
        significant_terms(
            spark, smp_index, "text:spark", "text", significance="kl"
        )
    with pytest.raises(ValueError, match="heuristic"):
        significant_terms(spark, smp_index, "text:spark", "text", size=5)


def test_significance_mi_and_gnd_hand_math(spark, tmp_path, smp_index):
    """mutual_information: textbook 2×2 MI in bits — independence -> 0,
    perfect correlation of balanced binaries -> 1 bit, everywhere-term
    -> 0. gnd: 1/(1+NGD) with the Cilibrasi–Vitányi formula; the
    degenerate fx = fy = N table scores 0."""
    import math

    s = Schema()
    s.add_text_field("text", "default")
    docs = [
        {"doc_id": 0, "text": "spark rare shared"},
        {"doc_id": 1, "text": "spark shared"},
        {"doc_id": 2, "text": "other shared"},
        {"doc_id": 3, "text": "other rare shared"},
    ]
    idx = str(tmp_path / "mig")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    mi = {
        r["term"]: r["score"]
        for r in significant_terms(
            spark, idx, "text:spark", "text",
            significance="mutual_information",
        ).collect()
    }
    # 'rare': all four cells are 1 -> independence -> 0 bits
    assert mi["rare"] == pytest.approx(0.0, abs=1e-12)
    # 'spark': perfectly correlated balanced binaries -> exactly 1 bit
    assert mi["spark"] == pytest.approx(1.0, rel=1e-12)
    # 'shared' in every doc: no information
    assert mi["shared"] == pytest.approx(0.0, abs=1e-12)
    gnd = {
        r["term"]: r["score"]
        for r in significant_terms(
            spark, idx, "text:spark", "text", significance="gnd"
        ).collect()
    }
    # 'spark': fxy == fx == fy -> NGD 0 -> similarity 1
    assert gnd["spark"] == pytest.approx(1.0, rel=1e-12)
    # 'rare': NGD = (ln2 - ln1)/(ln4 - ln2) = 1 -> 0.5
    assert gnd["rare"] == pytest.approx(0.5, rel=1e-12)
    # 'shared': NGD = (ln4 - ln2)/(ln4 - ln2)... max/min pick fy=4:
    # (ln4-ln2)/(ln4-ln2) = 1 -> 0.5 (hand-traced through the formula)
    num = max(math.log(2), math.log(4)) - math.log(2)
    den = math.log(4) - min(math.log(2), math.log(4))
    assert gnd["shared"] == pytest.approx(1 / (1 + num / den), rel=1e-12)
    # degenerate: every doc matches and the term is everywhere ->
    # fx = fy = N -> zero denominator -> 0 by rule
    g2 = {
        r["term"]: r["score"]
        for r in significant_terms(
            spark, smp_index, "text:spark", "text", significance="gnd"
        ).collect()
    }
    assert g2["common"] == pytest.approx(0.0, abs=1e-12)


def test_significance_percentage_and_lift(spark, tmp_path):
    """On a corpus where the foreground is a strict subset: percentage =
    n_docs/doc_freq; lift = fg%/bg%."""
    s = Schema()
    s.add_text_field("text", "default")
    docs = [
        {"doc_id": 0, "text": "spark rare shared"},
        {"doc_id": 1, "text": "spark shared"},
        {"doc_id": 2, "text": "other shared"},
        {"doc_id": 3, "text": "other rare shared"},
    ]
    idx = str(tmp_path / "sig")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=1, order_col="doc_id", id_cols=["doc_id"],
    )
    pct = {
        r["term"]: r["score"]
        for r in significant_terms(
            spark, idx, "text:spark", "text", significance="percentage"
        ).collect()
    }
    # 'rare' in 1 of 2 matched docs, 2 docs overall -> 0.5
    assert pct["rare"] == pytest.approx(0.5)
    assert pct["shared"] == pytest.approx(0.5)  # 2 of 4
    assert pct["spark"] == pytest.approx(1.0)
    lift = {
        r["term"]: r["score"]
        for r in significant_terms(
            spark, idx, "text:spark", "text", significance="lift"
        ).collect()
    }
    # fg%('rare') = 1/2, bg% = 2/4 -> lift 1.0
    assert lift["rare"] == pytest.approx(1.0)
    assert lift["spark"] == pytest.approx(2.0)  # 2/2 over 2/4
