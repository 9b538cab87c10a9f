"""Date doc-value fields (the ES `date` type): epoch-micros longs in the
docmap (the Lucene dates-are-longs representation), ISO-8601 range bounds
with ES date-math unit rounding, tz-free calendar histograms, sorted
search, and percolation — all verified against brute-force pandas/duckdb
recomputation over a synthetic event table."""

import datetime as dt
import tempfile

import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.manifest import add_field, load_manifest
from ostrich_spark.query.exec import (
    attach_docmap,
    date_histogram,
    search,
    search_sorted,
)
from ostrich_spark.query.parser import (
    QueryParseError,
    RangeQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

UTC = dt.timezone.utc
EPOCH = dt.datetime(1970, 1, 1, tzinfo=UTC)


def _us(*args):
    return (dt.datetime(*args, tzinfo=UTC) - EPOCH) // dt.timedelta(microseconds=1)


def _mk_events(spark, n=400):
    """Deterministic synthetic events: ~90 minutes apart over ~25 days of
    January–February 2024, three types, every 13th ts NULL."""
    rows = []
    for i in range(n):
        ts = (
            None
            if i % 13 == 5
            else dt.datetime(2024, 1, 1, tzinfo=UTC)
            + dt.timedelta(minutes=90 * i, seconds=i % 61, microseconds=(i * 7919) % 1_000_000)
        )
        rows.append(
            {
                "doc_id": i,
                "event_type": ["error", "click", "view"][i % 3],
                "ts": ts.replace(tzinfo=None) if ts else None,
                "value": float(i % 17),
            }
        )
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf), pdf


@pytest.fixture(scope="module")
def date_index(spark):
    df, pdf = _mk_events(spark)
    d = tempfile.mkdtemp(prefix="ostrich_date_idx")
    sc = Schema()
    sc.add_text_field("event_type")
    sc.add_date_field("ts")
    sc.add_numeric_field("value", "double")
    build_index(
        spark, df, sc, d, num_partitions=3, order_col="doc_id",
        id_cols=["doc_id"], build_id="date1",
    )
    return d, pdf


def _ids(spark, idx, q, **kw):
    mf = load_manifest(idx)
    res, _ = search(spark, idx, q, limit=None, manifest=mf, **kw)
    out = attach_docmap(spark, idx, res, manifest=mf)
    return sorted(r["doc_id"] for r in out.collect())


def _brute_ids(pdf, typ, lo_us=None, hi_us=None):
    m = pdf[pdf.ts.notna()].copy()
    us = m.ts.astype("datetime64[us]").astype("int64")
    keep = pd.Series(True, index=m.index)
    if typ is not None:
        keep &= m.event_type == typ
    if lo_us is not None:
        keep &= us >= lo_us
    if hi_us is not None:
        keep &= us <= hi_us
    return sorted(m[keep].doc_id.tolist())


def test_range_day_bounds_es_rounding(spark, date_index):
    idx, pdf = date_index
    # inclusive day bounds round THROUGH the end of the upper day
    got = _ids(spark, idx, 'event_type:error AND ts:[2024-01-05 TO 2024-01-10]')
    want = _brute_ids(pdf, "error", _us(2024, 1, 5), _us(2024, 1, 11) - 1)
    assert got == want and len(got) > 0


def test_range_exclusive_and_open_bounds(spark, date_index):
    idx, pdf = date_index
    # {lo TO hi} : gt rounds UP past the whole lower day, lt stops at
    # the upper day's start
    got = _ids(spark, idx, 'event_type:click AND ts:{2024-01-05 TO 2024-01-10}')
    want = _brute_ids(pdf, "click", _us(2024, 1, 6), _us(2024, 1, 10) - 1)
    assert got == want and len(got) > 0
    # open upper bound
    got = _ids(spark, idx, 'event_type:view AND ts:[2024-01-20 TO *]')
    want = _brute_ids(pdf, "view", _us(2024, 1, 20), None)
    assert got == want and len(got) > 0


def test_range_full_precision_and_epoch_millis(spark, date_index):
    idx, pdf = date_index
    lo = dt.datetime(2024, 1, 3, 7, 30, 5, tzinfo=UTC)
    lo_us = (lo - EPOCH) // dt.timedelta(microseconds=1)
    got = _ids(spark, idx, f'event_type:error AND ts:["{lo.isoformat()[:19]}" TO *]')
    assert got == _brute_ids(pdf, "error", lo_us, None)
    # epoch millis bounds (ES epoch_millis format)
    lo_ms = _us(2024, 1, 10) // 1000
    hi_ms = _us(2024, 1, 15) // 1000
    got = _ids(spark, idx, f"event_type:error AND ts:[{lo_ms} TO {hi_ms}]")
    want = _brute_ids(pdf, "error", lo_ms * 1000, hi_ms * 1000 + 999)
    assert got == want


def test_equality_is_unit_span_and_exists(spark, date_index):
    idx, pdf = date_index
    got = _ids(spark, idx, "event_type:error AND ts:2024-01-07")
    want = _brute_ids(pdf, "error", _us(2024, 1, 7), _us(2024, 1, 8) - 1)
    assert got == want
    # exists: NULL ts rows (every 13th) never match
    got = _ids(spark, idx, "event_type:error AND ts:*")
    assert got == _brute_ids(pdf, "error")
    n_null = int((pdf.ts.isna() & (pdf.event_type == "error")).sum())
    assert n_null > 0 and len(got) + n_null == int((pdf.event_type == "error").sum())


def test_parser_units_and_errors(spark, date_index):
    idx, _ = date_index
    sc = load_manifest(idx).schema
    q = parse_query("ts:[2024-01 TO 2024-02]", sc, ["event_type"])
    assert isinstance(q, RangeQuery)
    assert q.lo == _us(2024, 1, 1) and q.hi == _us(2024, 3, 1) - 1
    q = parse_query("ts:2024", sc, ["event_type"])
    assert q.lo == _us(2024, 1, 1) and q.hi == _us(2025, 1, 1) - 1
    q = parse_query("ts:[2024-01-05T12 TO 2024-01-05T13:30]", sc, ["event_type"])
    assert q.lo == _us(2024, 1, 5, 12) and q.hi == _us(2024, 1, 5, 13, 31) - 1
    with pytest.raises(QueryParseError):
        parse_query("ts:notadate", sc, ["event_type"])
    with pytest.raises(QueryParseError):
        parse_query("ts:[banana TO *]", sc, ["event_type"])


def test_histogram_day_week_month(spark, date_index):
    idx, pdf = date_index
    m = pdf[(pdf.event_type == "click") & pdf.ts.notna()]
    ts = m.ts.astype("datetime64[us]")
    for interval, trunc in (("day", "D"), ("hour", "h")):
        got = {
            r["bucket_ms"]: r["n_docs"]
            for r in date_histogram(spark, idx, "event_type:click", "ts", interval).collect()
        }
        want = (
            ts.dt.floor(trunc).astype("datetime64[ms]").astype("int64")
            .value_counts().to_dict()
        )
        assert got == want, interval
    for interval, period in (("week", "W-SUN"), ("month", "M"), ("quarter", "Q"), ("year", "Y")):
        got = {
            r["bucket_ms"]: r["n_docs"]
            for r in date_histogram(spark, idx, "event_type:click", "ts", interval).collect()
        }
        if interval == "week":
            # ISO Monday start: pandas period W-SUN ends Sunday, starts Monday
            starts = ts.dt.to_period("W-SUN").dt.start_time
        else:
            starts = ts.dt.to_period(period[0]).dt.start_time
        want = (
            starts.astype("datetime64[ms]").astype("int64")
            .value_counts().to_dict()
        )
        assert got == want, interval
    with pytest.raises(ValueError):
        date_histogram(spark, idx, "event_type:click", "ts", "fortnight")
    with pytest.raises(ValueError):
        date_histogram(spark, idx, "event_type:click", "value", "day")


def test_sorted_search_on_date(spark, date_index):
    idx, pdf = date_index
    res = search_sorted(spark, idx, "event_type:view", "ts", limit=7)
    got = [r["ts"] for r in res.collect()]
    m = pdf[(pdf.event_type == "view") & pdf.ts.notna()]
    want = sorted(m.ts.astype("datetime64[us]").astype("int64"))[:7]
    assert got == want
    res = search_sorted(spark, idx, "event_type:view", "ts", limit=7, ascending=False)
    got = [r["ts"] for r in res.collect()]
    assert got == sorted(m.ts.astype("datetime64[us]").astype("int64"), reverse=True)[:7]


def test_input_dtypes_equivalent(spark):
    """string / ntz / date / long inputs produce the same stored micros
    as the timestamp input (the add_date_field dtype contract)."""
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 3, 5, 7, 30, 15, 123456)
    pdf = pd.DataFrame({"doc_id": [0, 1], "t": [base, base + dt.timedelta(days=2)],
                        "txt": ["a", "a"]})
    want_us = pdf.t.astype("datetime64[us]").astype("int64").tolist()
    variants = {
        "ts": spark.createDataFrame(pdf),
        "string": spark.createDataFrame(pdf.assign(t=pdf.t.map(lambda v: v.isoformat()))),
        "long": spark.createDataFrame(pdf.assign(t=pdf.t.astype("datetime64[us]").astype("int64"))),
        "ntz": spark.createDataFrame(pdf).withColumn("t", F.col("t").cast("timestamp_ntz")),
    }
    for name, df in variants.items():
        d = tempfile.mkdtemp(prefix=f"ostrich_date_{name}")
        sc = Schema()
        sc.add_text_field("txt")
        sc.add_date_field("t")
        build_index(spark, df, sc, d, num_partitions=1, order_col="doc_id",
                    id_cols=["doc_id"], build_id="b")
        mf = load_manifest(d)
        res, _ = search(spark, d, "txt:a", limit=None, manifest=mf)
        vals = sorted(
            r["t"] for r in attach_docmap(spark, d, res, manifest=mf).collect()
        )
        assert vals == want_us, name
    # date input: day precision
    d = tempfile.mkdtemp(prefix="ostrich_date_dd")
    df = spark.createDataFrame(pdf).withColumn("t", F.col("t").cast("date"))
    sc = Schema()
    sc.add_text_field("txt")
    sc.add_date_field("t")
    build_index(spark, df, sc, d, num_partitions=1, order_col="doc_id",
                id_cols=["doc_id"], build_id="b")
    res, _ = search(spark, d, "txt:a", limit=None)
    vals = sorted(r["t"] for r in attach_docmap(spark, d, res).collect())
    assert vals == [_us(2024, 3, 5), _us(2024, 3, 7)]
    # unsupported dtype fails fast
    bad = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "txt": ["a"], "t": [1.5]}))
    sc = Schema()
    sc.add_text_field("txt")
    sc.add_date_field("t")
    with pytest.raises(ValueError, match="expected timestamp"):
        build_index(spark, bad, sc, tempfile.mkdtemp(), num_partitions=1,
                    order_col="doc_id", id_cols=["doc_id"], build_id="b")


def test_merge_carries_date_column(spark, date_index):
    import shutil

    from ostrich_spark.merge import consider_merges

    idx, pdf = date_index
    d2 = tempfile.mkdtemp(prefix="ostrich_date_merge")
    shutil.rmtree(d2)
    shutil.copytree(idx, d2)
    created = consider_merges(spark, d2, policy_kwargs={"min_num_segments": 2})
    assert created
    q = 'event_type:error AND ts:[2024-01-05 TO 2024-01-10]'
    assert _ids(spark, d2, q) == _ids(spark, idx, q)


def test_evolve_add_date_field(spark, date_index):
    import shutil

    idx, _ = date_index
    d2 = tempfile.mkdtemp(prefix="ostrich_date_evolve")
    shutil.rmtree(d2)
    shutil.copytree(idx, d2)
    m = add_field(d2, "seen_at", date=True)
    fe = m.schema.field_by_name("seen_at")
    assert fe.is_date and fe.is_doc_value
    # old docs hold no value: exists matches nothing
    assert _ids(spark, d2, "event_type:error AND seen_at:*") == []
    with pytest.raises(ValueError, match="pick one"):
        add_field(d2, "x", date=True, keyword=True)


def test_percolate_date_range_identity(spark, date_index):
    """Stored subscriptions with date-range clauses match exactly the
    docs forward search matches (registration takes the same NQL)."""
    from ostrich_spark.percolate import percolate, register_queries

    idx, pdf = date_index
    mf = load_manifest(idx)
    subs = {
        "q_day": 'event_type:error AND ts:[2024-01-05 TO 2024-01-10]',
        "q_open": 'event_type:view AND ts:[2024-01-20 TO *]',
    }
    pq = register_queries(subs, mf.schema, ["event_type"])
    df, _ = _mk_events(spark)
    hits = percolate(spark, df, pq, mf.schema, id_col="doc_id")
    got: dict[str, list] = {}
    for r in hits.collect():
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    for qid, q in subs.items():
        assert sorted(got.get(qid, [])) == _ids(spark, idx, q), qid


def test_histogram_min_doc_count_zero_fills_gaps(spark, tmp_path):
    """ES min_doc_count=0: every bucket between the first and last
    occupied one appears with n_docs=0; extended_bounds widens past the
    data with bounds snapped to bucket starts; calendar intervals step
    correctly across the gap months."""
    idx = str(tmp_path / "gapidx")
    days = [
        dt.datetime(2024, 1, 1, 10), dt.datetime(2024, 1, 1, 11),
        dt.datetime(2024, 1, 2, 9), dt.datetime(2024, 1, 5, 3),
        dt.datetime(2024, 3, 10, 23),
    ]
    sc = Schema()
    sc.add_text_field("event_type", "default")
    sc.add_date_field("ts")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(days)),
            "event_type": ["click"] * len(days),
            "ts": [d.replace(tzinfo=None) for d in days],
        }
    )
    build_index(
        spark, spark.createDataFrame(pdf), sc, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )

    def day_ms(*a):
        return _us(*a) // 1000

    got = {
        r["bucket_ms"]: r["n_docs"]
        for r in date_histogram(
            spark, idx, "event_type:click", "ts", "day", min_doc_count=0
        ).collect()
    }
    # spine: every day Jan 1 .. Mar 10 (69 buckets, leap year)
    assert len(got) == 70
    assert got[day_ms(2024, 1, 1)] == 2
    assert got[day_ms(2024, 1, 2)] == 1
    assert got[day_ms(2024, 1, 3)] == 0  # the filled gap
    assert got[day_ms(2024, 2, 29)] == 0
    assert got[day_ms(2024, 3, 10)] == 1
    assert sum(got.values()) == 5
    # occupied-only mode unchanged
    occ = {
        r["bucket_ms"]: r["n_docs"]
        for r in date_histogram(spark, idx, "event_type:click", "ts", "day").collect()
    }
    assert occ == {k: v for k, v in got.items() if v > 0}

    # month calendar fill: Jan, Feb (empty), Mar
    got_m = {
        r["bucket_ms"]: r["n_docs"]
        for r in date_histogram(
            spark, idx, "event_type:click", "ts", "month", min_doc_count=0
        ).collect()
    }
    assert got_m == {
        day_ms(2024, 1, 1): 4, day_ms(2024, 2, 1): 0, day_ms(2024, 3, 1): 1,
    }

    # extended_bounds widens and snaps (Dec 15 snaps to Dec 1)
    got_e = {
        r["bucket_ms"]: r["n_docs"]
        for r in date_histogram(
            spark, idx, "event_type:click", "ts", "month", min_doc_count=0,
            extended_bounds=(day_ms(2023, 12, 15), day_ms(2024, 4, 2)),
        ).collect()
    }
    assert got_e == {
        day_ms(2023, 12, 1): 0, day_ms(2024, 1, 1): 4, day_ms(2024, 2, 1): 0,
        day_ms(2024, 3, 1): 1, day_ms(2024, 4, 1): 0,
    }

    # empty match set: extended_bounds still yields the spine (ES
    # behavior), no bounds yields no rows
    assert (
        date_histogram(
            spark, idx, "event_type:zzz", "ts", "month", min_doc_count=0,
            extended_bounds=(day_ms(2024, 1, 1), day_ms(2024, 2, 1)),
        ).count()
        == 2
    )
    assert (
        date_histogram(
            spark, idx, "event_type:zzz", "ts", "month", min_doc_count=0
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="min_doc_count"):
        date_histogram(
            spark, idx, "event_type:click", "ts", "day", min_doc_count=2
        )


def test_histogram_offset_shifted_rounding(spark, date_index):
    """ES offset: key = bucket(v - offset) + offset. Fixed-day buckets
    verified against a pandas recomputation at +6h and -30m; every key
    must carry the offset phase."""
    idx, pdf = date_index
    m = pdf[(pdf.event_type == "click") & pdf.ts.notna()]
    us = m.ts.astype("datetime64[us]").astype("int64")
    day_us, day_ms = 86_400_000_000, 86_400_000
    for off, off_us in (("6h", 6 * 3600 * 1_000_000), ("-30m", -1_800_000_000)):
        got = {
            r["bucket_ms"]: r["n_docs"]
            for r in date_histogram(
                spark, idx, "event_type:click", "ts", "day", offset=off
            ).collect()
        }
        shifted = ((us - off_us) // day_us) * day_ms + off_us // 1000
        assert got == pd.Series(shifted).value_counts().to_dict(), off
        assert all((k - off_us // 1000) % day_ms == 0 for k in got)
    # calendar interval: month of the SHIFTED instant, key + offset
    got = {
        r["bucket_ms"]: r["n_docs"]
        for r in date_histogram(
            spark, idx, "event_type:click", "ts", "month", offset="6h"
        ).collect()
    }
    sh = (m.ts - pd.Timedelta(hours=6)).dt.to_period("M").dt.start_time
    want = (
        (sh.astype("datetime64[ms]").astype("int64") + 6 * 3600 * 1000)
        .value_counts().to_dict()
    )
    assert got == want


def test_histogram_offset_fill_and_bounds(spark, date_index):
    """offset composes with min_doc_count=0 + extended_bounds: the spine
    steps on the shifted axis (contiguous day keys, all at the offset
    phase) and the widened bound snaps to its SHIFTED bucket start."""
    idx, _ = date_index
    off_ms = 6 * 3600 * 1000
    day_ms = 86_400_000
    lo_ms = int(
        (dt.datetime(2023, 12, 28, tzinfo=UTC) - EPOCH)
        / dt.timedelta(milliseconds=1)
    )
    rows = (
        date_histogram(
            spark, idx, "event_type:click", "ts", "day",
            min_doc_count=0, extended_bounds=(lo_ms, None), offset="6h",
        )
        .orderBy("bucket_ms")
        .collect()
    )
    keys = [r["bucket_ms"] for r in rows]
    assert all((k - off_ms) % day_ms == 0 for k in keys)
    assert keys == list(range(keys[0], keys[-1] + 1, day_ms))  # contiguous
    assert keys[0] == ((lo_ms - off_ms) // day_ms) * day_ms + off_ms
    assert rows[0]["n_docs"] == 0  # zero-filled head before the data
    occ = {
        r["bucket_ms"]: r["n_docs"]
        for r in date_histogram(
            spark, idx, "event_type:click", "ts", "day", offset="6h"
        ).collect()
    }
    assert {r["bucket_ms"]: r["n_docs"] for r in rows if r["n_docs"]} == occ


def test_histogram_offset_validation(spark, date_index):
    idx, _ = date_index
    with pytest.raises(ValueError, match="whole number of milliseconds"):
        date_histogram(
            spark, idx, "event_type:click", "ts", "day", offset=1500
        )  # 1500 MICROS = 1.5 ms
    with pytest.raises(ValueError, match="duration"):
        date_histogram(
            spark, idx, "event_type:click", "ts", "day", offset="sideways"
        )


def test_date_range_agg_iso_bounds(spark, date_index):
    """ES date_range analog: ISO-8601 string bounds resolve to the
    unit's START on both sides (from inclusive, to exclusive), so a
    month pair covers exactly that calendar month — recomputed from the
    raw pandas frame. Epoch-millis strings and open sides compose."""
    from ostrich_spark.query.exec import range_agg

    idx, pdf = date_index
    out = range_agg(
        spark, idx, "event_type:click", "ts",
        [
            ("jan", "2024-01", "2024-02"),
            ("feb_on", "2024-02", None),
            ("first_10d", None, "2024-01-11"),
        ],
    ).collect()
    clicks = pdf[(pdf.event_type == "click") & pdf.ts.notna()]
    ts = pd.to_datetime(clicks.ts)
    exp = {
        "jan": int((ts < dt.datetime(2024, 2, 1)).sum()
                   - (ts < dt.datetime(2024, 1, 1)).sum()),
        "feb_on": int((ts >= dt.datetime(2024, 2, 1)).sum()),
        "first_10d": int((ts < dt.datetime(2024, 1, 11)).sum()),
    }
    got = {r["range_key"]: r["n_docs"] for r in out}
    assert got == exp
    # declaration order and resolved micros bounds surface in lo/hi
    assert [r["range_key"] for r in out] == ["jan", "feb_on", "first_10d"]
    assert out[0]["lo"] == float(_us(2024, 1, 1))
    assert out[0]["hi"] == float(_us(2024, 2, 1))
    # epoch-millis string bound == the equivalent ISO bound
    ms = str(_us(2024, 2, 1) // 1000)
    out2 = range_agg(
        spark, idx, "event_type:click", "ts", [("feb_on", ms, None)]
    ).collect()
    assert out2[0]["n_docs"] == exp["feb_on"]


def test_date_range_agg_validation(spark, date_index):
    from ostrich_spark.query.exec import range_agg

    idx, _ = date_index
    with pytest.raises(ValueError, match="date field"):
        range_agg(
            spark, idx, "event_type:click", "value", [("x", "2024-01", None)]
        )
    with pytest.raises(ValueError, match="cannot parse date bound"):
        range_agg(
            spark, idx, "event_type:click", "ts", [("x", "not-a-date", None)]
        )
