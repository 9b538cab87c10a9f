"""events module: gap sessionization (batch) + watermarked streaming
windows (late-data drop, append-mode exactly-once emission)."""

import os
import time

import pandas as pd
import pytest

from ostrich_spark.events import sessionize, windowed_event_counts


def test_sessionize_hand_computed(spark):
    rows = [
        # user 1: two sessions (gap 40 min > 30 min)
        (1, 10, "2024-01-01 10:00:00"),
        (1, 11, "2024-01-01 10:10:00"),
        (1, 12, "2024-01-01 10:50:00"),
        # user 2: one session, single event
        (2, 20, "2024-01-01 09:00:00"),
        # user 3: exactly-at-gap boundary stays in the SAME session
        (3, 30, "2024-01-01 08:00:00"),
        (3, 31, "2024-01-01 08:30:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts string")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = {
        (r["user_id"], r["session_ord"]): (r["n_events"], r["duration_us"])
        for r in sessionize(df, gap_s=1800).collect()
    }
    assert got == {
        (1, 1): (2, 600_000_000),
        (1, 2): (1, 0),
        (2, 1): (1, 0),
        (3, 1): (2, 1_800_000_000),  # gap == 1800s is NOT > gap -> same session
    }


def test_sessionize_tie_break_deterministic(spark):
    rows = [(1, 2, "2024-01-01 10:00:00"), (1, 1, "2024-01-01 10:00:00")]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts string")
    out = sessionize(df, gap_s=60).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_streaming_watermark_drops_late_event(spark, tmp_path):
    """Two micro-batches through a file source: batch 1 carries a
    10:00-window pair plus an 11:00 event that advances the watermark
    far past the 10:00 window; batch 2 tries to add a LATE 10:02 event.
    Append mode must emit the closed 10:00 window exactly once with
    count 2 — the late event is dropped by the watermark."""
    src = tmp_path / "src"
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    def write_batch(name, ts_list):
        pdf = pd.DataFrame({"ts": pd.to_datetime(ts_list), "event_type": "x"})
        spark.createDataFrame(pdf).write.parquet(str(src / name))

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    write_batch("b1", ["2024-01-01 10:01:00", "2024-01-01 10:04:00", "2024-01-01 11:00:00"])

    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(src) + "/*")
    )
    out = windowed_event_counts(stream, "ts", "10 minutes", "5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        # late event, far behind the watermark (max seen 11:00 - 5min)
        write_batch("b2", ["2024-01-01 10:02:00"])
        q.processAllAvailable()
        # one more batch so the engine re-evaluates emission after b2
        write_batch("b3", ["2024-01-01 12:00:00"])
        q.processAllAvailable()
        rows = {
            str(r["win_start"]): r["n"]
            for r in spark.sql("SELECT * FROM wm_counts").collect()
        }
    finally:
        q.stop()
    # the 10:00-10:10 window emitted once, WITHOUT the late event
    assert rows.get("2024-01-01 10:00:00") == 2


class TestDownsample:
    """ES TSDB downsample analog: aggregate_metric_double quadruples
    per (dims, bucket) vs a pandas recount."""

    def test_quadruples_vs_brute(self, spark):
        import datetime as dt

        import pandas as pd

        from ostrich_spark.events import downsample

        rows = []
        base = dt.datetime(2024, 3, 1, 0, 0, 0)
        for i in range(200):
            rows.append({
                "event_id": i,
                "ts": base + dt.timedelta(minutes=7 * i),
                "user_id": i % 3,
                "event_type": ["view", "click"][i % 2],
                "value": None if i % 11 == 0 else float(i % 17),
            })
        df = spark.createDataFrame(pd.DataFrame(rows))
        got = {
            (r["bucket_ts"], r["user_id"], r["event_type"]): r
            for r in downsample(df, interval="hour").collect()
        }
        pdf = pd.DataFrame(rows)
        pdf["bucket_ts"] = pdf["ts"].dt.floor("h")
        g = pdf.groupby(["bucket_ts", "user_id", "event_type"], dropna=False)
        assert len(got) == len(g)
        for key, grp in g:
            r = got[key]
            assert r["n_events"] == len(grp)
            v = grp["value"].dropna()
            assert r["value_count"] == len(v)
            if len(v):
                assert r["value_min"] == v.min()
                assert r["value_max"] == v.max()
                assert abs(r["value_sum"] - v.sum()) < 1e-9
            else:
                assert r["value_min"] is None and r["value_sum"] is None

    def test_validation(self, spark):
        import pytest

        from ostrich_spark.events import downsample

        df = spark.createDataFrame(
            [(0, "2024-01-01 00:00:00", 1, "a", 1.0)],
            "event_id long, ts string, user_id long, event_type string, value double",
        )
        with pytest.raises(ValueError, match="interval"):
            downsample(df, interval="fortnight")
        with pytest.raises(ValueError, match="metric"):
            downsample(df, metrics=())
        with pytest.raises(ValueError, match="column"):
            downsample(df, metrics=("nope",))
