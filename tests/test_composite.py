"""Composite aggregation (ES `composite`): paginated multi-source bucket
reports with an after-key cursor. Verified by sweeping every page and
comparing the union against a pandas brute-force groupBy — no bucket
missed, none duplicated, pages in key order."""

import datetime as dt
import tempfile

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import composite_agg
from ostrich_spark.query.parser import AllQuery
from ostrich_spark.schema import Schema


@pytest.fixture(scope="module")
def comp_index(spark):
    rows = []
    for i in range(120):
        rows.append({
            "doc_id": i,
            "event_type": ["error", "click", "view"][i % 3],
            # every 11th date NULL; every 17th value NULL; negatives too
            "ts": None if i % 11 == 4 else
                  dt.datetime(2024, 1, 1) + dt.timedelta(days=(i * 5) % 90),
            "value": None if i % 17 == 9 else float(i % 13) * 10.0 - 30.0,
        })
    pdf = pd.DataFrame(rows)
    d = tempfile.mkdtemp(prefix="ostrich_comp_idx")
    sc = Schema()
    sc.add_text_field("event_type")
    sc.add_keyword_field("etype", source_col="event_type")
    sc.add_date_field("ts")
    sc.add_numeric_field("value", "double")
    build_index(
        spark, spark.createDataFrame(pdf), sc, d, num_partitions=3,
        order_col="doc_id", id_cols=["doc_id"], build_id="comp1",
    )
    return d, pdf


SOURCES = [
    ("etype", "terms", "etype"),
    ("month_ms", "date_histogram", "ts", "month"),
    ("vb", "histogram", "value", 25.0),
]


def _brute(pdf):
    m = pdf[pdf.ts.notna() & pdf.value.notna()].copy()
    ts = pd.to_datetime(m.ts)
    month_start = ts.dt.to_period("M").dt.start_time
    m["month_ms"] = month_start.astype("datetime64[us]").astype("int64") // 1000
    m["vb"] = (m.value / 25.0).apply(lambda v: float(int(v) - (v < int(v)))) * 25.0
    g = (
        m.groupby(["event_type", "month_ms", "vb"], as_index=False)
        .agg(n_docs=("doc_id", "size"), avg_value=("value", "mean"))
        .rename(columns={"event_type": "etype"})
        .sort_values(["etype", "month_ms", "vb"])
        .reset_index(drop=True)
    )
    return g


def test_page_sweep_equals_brute_force(spark, comp_index):
    idx, pdf = comp_index
    mf = load_manifest(idx)
    want = _brute(pdf)
    got_pages, after = [], None
    for _ in range(100):
        page = composite_agg(
            spark, idx, AllQuery(), SOURCES, size=3, after=after,
            metrics={"avg_value": ("avg", "value")}, manifest=mf,
        ).collect()
        if not page:
            break
        keys = [(r["etype"], r["month_ms"], r["vb"]) for r in page]
        assert keys == sorted(keys), "page not in composite-key order"
        got_pages.extend(page)
        last = page[-1]
        after = {"etype": last["etype"], "month_ms": last["month_ms"],
                 "vb": last["vb"]}
    assert len(got_pages) == len(want)
    for r, (_, w) in zip(got_pages, want.iterrows()):
        assert (r["etype"], r["month_ms"], r["vb"]) == (
            w.etype, w.month_ms, w.vb)
        assert r["n_docs"] == w.n_docs
        assert r["avg_value"] == pytest.approx(w.avg_value, rel=1e-12)


def test_after_tuple_equals_dict_and_prunes(spark, comp_index):
    idx, pdf = comp_index
    mf = load_manifest(idx)
    p1 = composite_agg(spark, idx, AllQuery(), SOURCES, size=4,
                       manifest=mf).collect()
    last = p1[-1]
    via_dict = composite_agg(
        spark, idx, AllQuery(), SOURCES, size=4,
        after={"etype": last["etype"], "month_ms": last["month_ms"],
               "vb": last["vb"]}, manifest=mf,
    ).collect()
    via_tuple = composite_agg(
        spark, idx, AllQuery(), SOURCES, size=4,
        after=(last["etype"], last["month_ms"], last["vb"]), manifest=mf,
    ).collect()
    assert [tuple(r) for r in via_dict] == [tuple(r) for r in via_tuple]
    # strictly after the cursor
    for r in via_dict:
        assert (r["etype"], r["month_ms"], r["vb"]) > (
            last["etype"], last["month_ms"], last["vb"])


def test_null_sources_omitted_and_negative_floor(spark, comp_index):
    idx, pdf = comp_index
    mf = load_manifest(idx)
    all_rows = composite_agg(spark, idx, AllQuery(), SOURCES, size=10_000,
                             manifest=mf).collect()
    # docs with NULL ts or value contribute to no bucket
    assert sum(r["n_docs"] for r in all_rows) == int(
        (pdf.ts.notna() & pdf.value.notna()).sum())
    # value -30 -> floor(-30/25)*25 = -50 (floor toward -inf, not trunc)
    assert any(r["vb"] == -50.0 for r in all_rows)


def test_single_source_terms_counts(spark, comp_index):
    idx, pdf = comp_index
    mf = load_manifest(idx)
    got = composite_agg(
        spark, idx, "event_type:error", [("etype", "terms", "etype")],
        size=10, manifest=mf,
    ).collect()
    assert len(got) == 1
    assert got[0]["etype"] == "error"
    assert got[0]["n_docs"] == int((pdf.event_type == "error").sum())


def test_validation_errors(spark, comp_index):
    idx, _ = comp_index
    mf = load_manifest(idx)
    q = AllQuery()
    with pytest.raises(ValueError, match="at least one source"):
        composite_agg(spark, idx, q, [], manifest=mf)
    with pytest.raises(ValueError, match="kind"):
        composite_agg(spark, idx, q, [("x", "range", "value")], manifest=mf)
    with pytest.raises(ValueError, match="not a docmap column"):
        composite_agg(spark, idx, q, [("x", "terms", "nope")], manifest=mf)
    with pytest.raises(ValueError, match="duplicate source name"):
        composite_agg(spark, idx, q, [("x", "terms", "etype"),
                                      ("x", "terms", "value")], manifest=mf)
    with pytest.raises(ValueError, match="width"):
        composite_agg(spark, idx, q, [("x", "histogram", "value")], manifest=mf)
    with pytest.raises(ValueError, match="date field"):
        composite_agg(spark, idx, q, [("x", "date_histogram", "value", "day")],
                      manifest=mf)
    with pytest.raises(ValueError, match="one value per source"):
        composite_agg(spark, idx, q, SOURCES, after=("error",), manifest=mf)
    with pytest.raises(ValueError, match="missing sources"):
        composite_agg(spark, idx, q, SOURCES, after={"etype": "error"},
                      manifest=mf)
