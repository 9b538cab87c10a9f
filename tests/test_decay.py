"""Decay function score (ES function_score gauss/exp/linear decay):
query-time recency/proximity boosting on date and numeric doc values.
Factors are verified against hand-computed ES formulas (the repo rule for
distribution-sensitive ops: never trust two engines agreeing on the same
wrong formula), using the returned base_score so the check isolates the
decay arithmetic itself."""

import datetime as dt
import math
import tempfile

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import (
    _parse_duration_us,
    attach_docmap,
    search_decayed,
)
from ostrich_spark.schema import Schema

UTC = dt.timezone.utc
EPOCH = dt.datetime(1970, 1, 1, tzinfo=UTC)


def _us(*args):
    return (dt.datetime(*args, tzinfo=UTC) - EPOCH) // dt.timedelta(microseconds=1)


ORIGIN = "2024-02-01"
ORIGIN_US = _us(2024, 2, 1)
SCALE_US = 10 * 86_400_000_000  # 10d


@pytest.fixture(scope="module")
def decay_index(spark):
    """Synthetic events: exact-distance anchor docs (at the origin, at
    1x and 2x scale on both the date and numeric axes) plus filler, and
    a NULL-date doc — enough to pin every branch of the formulas."""
    rows = []
    anchors = [
        # (doc_id, ts, value)
        (0, dt.datetime(2024, 2, 1), 50.0),            # dist 0 on both axes
        (1, dt.datetime(2024, 2, 11), 75.0),           # exactly 1x scale
        (2, dt.datetime(2024, 1, 22), 25.0),           # 1x scale, other side
        (3, dt.datetime(2024, 2, 21), 100.0),          # exactly 2x scale
        (4, None, None),                               # missing values
    ]
    for i, ts, v in anchors:
        rows.append({"doc_id": i, "event_type": "error", "ts": ts, "value": v})
    for i in range(5, 60):
        rows.append({
            "doc_id": i,
            "event_type": ["error", "click"][i % 2],
            "ts": dt.datetime(2024, 1, 1) + dt.timedelta(hours=11 * i, seconds=i),
            "value": float(i % 23) * 7.5,
        })
    pdf = pd.DataFrame(rows)
    d = tempfile.mkdtemp(prefix="ostrich_decay_idx")
    sc = Schema()
    sc.add_text_field("event_type")
    sc.add_date_field("ts")
    sc.add_numeric_field("value", "double")
    build_index(
        spark, spark.createDataFrame(pdf), sc, d, num_partitions=2,
        order_col="doc_id", id_cols=["doc_id"], build_id="decay1",
    )
    return d, pdf


def _rows(spark, idx, **kw):
    mf = load_manifest(idx)
    res = search_decayed(
        spark, idx, "event_type:error", kw.pop("by", "ts"),
        limit=None, manifest=mf, **kw,
    )
    out = attach_docmap(
        spark, idx,
        res.select("segment_id", "doc", "score", "base_score"),
        manifest=mf,
    )
    return {r["doc_id"]: r for r in out.collect()}


def _es_factor(fn, dist, scale, decay=0.5, offset=0.0):
    d = max(0.0, abs(dist) - offset)
    if fn == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return math.exp(-(d * d) / (2.0 * sigma2))
    if fn == "exp":
        return math.exp(math.log(decay) / scale * d)
    s = scale / (1.0 - decay)
    return max(0.0, (s - d) / s)


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
def test_date_decay_matches_hand_formula(spark, decay_index, fn):
    idx, pdf = decay_index
    got = _rows(spark, idx, origin=ORIGIN, scale="10d", fn=fn)
    err = pdf[(pdf.event_type == "error")]
    assert set(got) == set(err.doc_id)
    for _, row in err.iterrows():
        r = got[row.doc_id]
        if row.ts is None or pd.isna(row.ts):
            want = 1.0  # ES missing convention: no decay
        else:
            ts_us = int(pd.Timestamp(row.ts).value // 1000)
            want = _es_factor(fn, ts_us - ORIGIN_US, SCALE_US)
        assert r["score"] == pytest.approx(r["base_score"] * want, rel=1e-12)


def test_anchor_values_exact(spark, decay_index):
    """decay is reached EXACTLY at scale; 2x scale pins the shape:
    gauss 0.5^4, exp 0.25, linear 0."""
    idx, _ = decay_index
    for fn, at_scale, at_2x in [
        ("gauss", 0.5, 0.5 ** 4),
        ("exp", 0.5, 0.25),
        ("linear", 0.5, 0.0),
    ]:
        got = _rows(spark, idx, origin=ORIGIN, scale="10d", fn=fn)
        assert got[0]["score"] == pytest.approx(got[0]["base_score"], rel=1e-12)
        for doc in (1, 2):  # both sides of the origin, exactly 1x scale
            assert got[doc]["score"] == pytest.approx(
                got[doc]["base_score"] * at_scale, rel=1e-12)
        assert got[3]["score"] == pytest.approx(
            got[3]["base_score"] * at_2x, rel=1e-12, abs=1e-300)


def test_numeric_field_and_offset(spark, decay_index):
    idx, _ = decay_index
    # origin 50, scale 25: doc1 value 75 -> dist 25 -> 0.5; doc3 value
    # 100 -> dist 50 -> linear 0; offset 25 absorbs doc1's distance
    got = _rows(spark, idx, by="value", origin=50.0, scale=25.0, fn="linear")
    assert got[1]["score"] == pytest.approx(got[1]["base_score"] * 0.5, rel=1e-12)
    assert got[3]["score"] == 0.0
    assert got[4]["score"] == pytest.approx(got[4]["base_score"], rel=1e-12)
    got = _rows(spark, idx, by="value", origin=50.0, scale=25.0,
                fn="linear", decay_offset=25.0)
    assert got[1]["score"] == pytest.approx(got[1]["base_score"], rel=1e-12)
    assert got[3]["score"] == pytest.approx(got[3]["base_score"] * 0.5, rel=1e-12)


def test_weight_sum_mode_and_custom_decay(spark, decay_index):
    idx, _ = decay_index
    got = _rows(spark, idx, origin=ORIGIN, scale="10d", fn="exp",
                weight=3.0, mode="sum")
    # sum mode: final = base + weight * factor; doc1 at exactly scale
    assert got[1]["score"] == pytest.approx(
        got[1]["base_score"] + 3.0 * 0.5, rel=1e-12)
    # ES weight applies to the MISSING factor too
    assert got[4]["score"] == pytest.approx(got[4]["base_score"] + 3.0, rel=1e-12)
    got = _rows(spark, idx, origin=ORIGIN, scale="10d", fn="exp", decay=0.1)
    assert got[1]["score"] == pytest.approx(got[1]["base_score"] * 0.1, rel=1e-12)


def test_ordering_and_limit(spark, decay_index):
    idx, _ = decay_index
    mf = load_manifest(idx)
    res = search_decayed(
        spark, idx, "event_type:error", "ts",
        origin=ORIGIN, scale="10d", limit=5, manifest=mf,
    ).collect()
    assert len(res) == 5
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_duration_parsing():
    assert _parse_duration_us("10d", "x") == 10 * 86_400_000_000
    assert _parse_duration_us("36h", "x") == 36 * 3_600_000_000
    assert _parse_duration_us("1.5m", "x") == 90_000_000
    assert _parse_duration_us("500ms", "x") == 500_000
    assert _parse_duration_us("2w", "x") == 2 * 604_800_000_000
    assert _parse_duration_us(12345, "x") == 12345
    assert _parse_duration_us("12345", "x") == 12345
    with pytest.raises(ValueError, match="duration"):
        _parse_duration_us("10 fortnights", "x")


def test_errors(spark, decay_index):
    idx, _ = decay_index
    mf = load_manifest(idx)
    with pytest.raises(ValueError, match="gauss"):
        search_decayed(spark, idx, "event_type:error", "ts",
                       origin=ORIGIN, scale="10d", fn="cosine", manifest=mf)
    with pytest.raises(ValueError, match="decay must be in"):
        search_decayed(spark, idx, "event_type:error", "ts",
                       origin=ORIGIN, scale="10d", decay=1.0, manifest=mf)
    with pytest.raises(ValueError, match="numeric or date"):
        search_decayed(spark, idx, "event_type:error", "event_type",
                       origin=ORIGIN, scale="10d", manifest=mf)
    with pytest.raises(ValueError, match="origin"):
        search_decayed(spark, idx, "event_type:error", "ts",
                       origin="next tuesday", scale="10d", manifest=mf)
    with pytest.raises(ValueError, match="scale must be"):
        search_decayed(spark, idx, "event_type:error", "value",
                       origin=50.0, scale=0.0, manifest=mf)


def test_distance_feature_date_string_origin(spark, decay_index):
    """distance_feature on a DATE field with an ISO-8601 string origin —
    the path that raised NameError in the pre-split monolith
    (_parse_date_span was only bound inside search_decayed's local
    scope); bonus hand-computed from the reciprocal-saturation formula."""
    from ostrich_spark.query.exec import search_distance_feature

    idx, pdf = decay_index
    mf = load_manifest(idx)
    res = search_distance_feature(
        spark, idx, "event_type:error", "ts",
        origin=ORIGIN, pivot="10d", boost=2.0, limit=None, manifest=mf,
    )
    out = attach_docmap(
        spark, idx, res.select("segment_id", "doc", "score", "base_score"),
        manifest=mf,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got, "no matches"
    ts_by_id = {
        int(r.doc_id): (None if pd.isna(r.ts) else
                        int(r.ts.value // 1000))  # ns -> us
        for r in pdf.itertuples()
    }
    for d, r in got.items():
        ts = ts_by_id[d]
        bonus = 0.0 if ts is None else (
            2.0 * SCALE_US / (SCALE_US + abs(ts - ORIGIN_US))
        )
        assert r["score"] == pytest.approx(r["base_score"] + bonus, rel=1e-12)
    # the at-origin anchor doc gets the full boost
    assert got[0]["score"] - got[0]["base_score"] == pytest.approx(2.0)
    # unparseable origin string still rejects loudly
    with pytest.raises(ValueError, match="origin"):
        search_distance_feature(
            spark, idx, "event_type:error", "ts",
            origin="not-a-date", pivot="10d", manifest=mf,
        )
