"""Pipeline aggregations (ES derivative / cumulative_sum / moving_fn /
serial_diff / bucket_selector / bucket_sort) over bucket DataFrames —
hand goldens + pandas brute force, ES window-placement semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ostrich_spark.pipeline_aggs import (
    bucket_selector,
    bucket_sort,
    cumulative_sum,
    derivative,
    moving_fn,
    serial_diff,
)

BUCKETS = [
    # (bucket_ms, n_docs) with a GAP between 3 and 6
    (0, 4),
    (86_400_000, 7),
    (2 * 86_400_000, 1),
    (3 * 86_400_000, 5),
    (6 * 86_400_000, 2),
    (7 * 86_400_000, 9),
]


@pytest.fixture(scope="module")
def bdf(spark):
    return spark.createDataFrame(BUCKETS, "bucket_ms long, n_docs long")


def _sorted(df, extra):
    return [
        tuple(r)
        for r in df.orderBy("bucket_ms").select("bucket_ms", "n_docs", extra).collect()
    ]


class TestDerivative:
    def test_plain_diff_vs_previous_present_bucket(self, bdf):
        got = _sorted(derivative(bdf, "bucket_ms", "n_docs"), "deriv")
        # gap_policy=skip: bucket 6d differences against 3d, not a
        # phantom empty bucket
        assert got == [
            (0, 4, None),
            (86_400_000, 7, 3),
            (2 * 86_400_000, 1, -6),
            (3 * 86_400_000, 5, 4),
            (6 * 86_400_000, 2, -3),
            (7 * 86_400_000, 9, 7),
        ]

    def test_unit_rate_normalization(self, bdf):
        got = _sorted(
            derivative(
                bdf, "bucket_ms", "n_docs", x_col="bucket_ms", unit_ms=86_400_000
            ),
            "deriv",
        )
        # the 6d bucket is 3 days past 3d: rate = (2-5)/3 = -1/day
        by_key = dict((k, d) for k, _, d in got)
        assert by_key[6 * 86_400_000] == pytest.approx(-1.0)
        assert by_key[86_400_000] == pytest.approx(3.0)
        assert by_key[0] is None

    def test_x_col_requires_unit(self, bdf):
        with pytest.raises(ValueError, match="unit_ms"):
            derivative(bdf, "bucket_ms", "n_docs", x_col="bucket_ms")


class TestCumulativeAndDiff:
    def test_cumulative_sum(self, bdf):
        got = _sorted(cumulative_sum(bdf, "bucket_ms", "n_docs"), "cumsum")
        run = 0
        for (k, n), (gk, gn, gc) in zip(BUCKETS, got):
            run += n
            assert (gk, gn, gc) == (k, n, run)

    def test_serial_diff_lag2(self, bdf):
        got = _sorted(serial_diff(bdf, "bucket_ms", "n_docs", lag=2), "diff")
        vals = [n for _, n in BUCKETS]
        want = [None, None] + [vals[i] - vals[i - 2] for i in range(2, len(vals))]
        assert [g[2] for g in got] == want

    def test_serial_diff_validation(self, bdf):
        with pytest.raises(ValueError):
            serial_diff(bdf, "bucket_ms", "n_docs", lag=0)


class TestMovingFn:
    def test_shift0_excludes_current(self, bdf):
        # ES moving_fn default: window of the `window` buckets BEFORE
        # the current one
        got = _sorted(moving_fn(bdf, "bucket_ms", "n_docs", window=2), "moving")
        vals = [n for _, n in BUCKETS]
        want = [None] + [
            sum(vals[max(0, i - 2) : i]) / len(vals[max(0, i - 2) : i])
            for i in range(1, len(vals))
        ]
        assert [g[2] for g in got] == [
            pytest.approx(w) if w is not None else None for w in want
        ]

    def test_shift1_includes_current(self, bdf):
        got = _sorted(
            moving_fn(bdf, "bucket_ms", "n_docs", window=3, shift=1), "moving"
        )
        vals = [n for _, n in BUCKETS]
        want = [
            sum(vals[max(0, i - 2) : i + 1]) / len(vals[max(0, i - 2) : i + 1])
            for i in range(len(vals))
        ]
        assert [g[2] for g in got] == [pytest.approx(w) for w in want]

    @pytest.mark.parametrize("fn", ["min", "max", "sum"])
    def test_fns_on_window3_at_last_bucket(self, bdf, fn):
        got = _sorted(
            moving_fn(bdf, "bucket_ms", "n_docs", window=3, fn=fn), "moving"
        )
        # last bucket, shift=0: window = the 3 buckets before it,
        # values (1, 5, 2)
        vals = [n for _, n in BUCKETS][2:5]
        want = {"min": min(vals), "max": max(vals), "sum": sum(vals)}[fn]
        assert got[-1][2] == want

    def test_validation(self, bdf):
        with pytest.raises(ValueError):
            moving_fn(bdf, "bucket_ms", "n_docs", window=0)
        with pytest.raises(ValueError):
            moving_fn(bdf, "bucket_ms", "n_docs", window=3, fn="median")


class TestSelectorSort:
    def test_bucket_selector_sql_string(self, bdf):
        got = _sorted(bucket_selector(bdf, "n_docs >= 4"), "n_docs")
        assert [g[0] for g in got] == [0, 86_400_000, 3 * 86_400_000, 7 * 86_400_000]

    def test_bucket_selector_column(self, bdf):
        got = bucket_selector(bdf, F.col("n_docs") < 3).count()
        assert got == 2

    def test_bucket_sort_size(self, bdf):
        rows = bucket_sort(
            bdf, [("n_docs", "desc"), ("bucket_ms", "asc")], size=3
        ).collect()
        assert [(r["n_docs"]) for r in rows] == [9, 7, 5]

    def test_bucket_sort_from(self, bdf):
        rows = bucket_sort(
            bdf, [("n_docs", "desc"), ("bucket_ms", "asc")], size=2, from_=2
        ).collect()
        assert [r["n_docs"] for r in rows] == [5, 4]
        rows = bucket_sort(
            bdf, [("n_docs", "desc"), ("bucket_ms", "asc")], from_=4
        ).collect()
        assert sorted(r["n_docs"] for r in rows) == [1, 2]

    def test_bucket_sort_validation(self, bdf):
        with pytest.raises(ValueError):
            bucket_sort(bdf, ("n_docs", "desc"), size=2, from_=-1)


class TestOverRealHistogram:
    def test_composes_with_date_histogram(self, spark, tmp_path):
        from ostrich_spark.build import build_index
        from ostrich_spark.query.exec import date_histogram
        from ostrich_spark.schema import Schema

        rows = [
            (i, "click event", f"2024-01-{(i % 9) + 1:02d}") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "id long, text string, ts string")
        s = Schema()
        s.add_text_field("text", "default")
        s.add_date_field("ts")
        d = str(tmp_path / "idx")
        build_index(spark, df, s, d, num_partitions=2, order_col="id",
                    id_cols=["id"], build_id="pa")
        hist = date_histogram(spark, d, "text:click", "ts", "day")
        out = cumulative_sum(hist, "bucket_ms", "n_docs").orderBy("bucket_ms")
        pdf = out.toPandas()
        assert pdf["cumsum"].iloc[-1] == 40
        assert (pdf["cumsum"].to_numpy() == pdf["n_docs"].cumsum().to_numpy()).all()


class TestSiblingFamily:
    """avg/sum/min/max_bucket, stats/extended_stats/percentiles_bucket —
    single-row summaries over the bucket list (ES sibling pipeline)."""

    VALS = [4, 7, 1, 5, 2, 9]

    def test_bucket_metric_avg_sum(self, bdf):
        from ostrich_spark.pipeline_aggs import bucket_metric

        assert bucket_metric(bdf, "n_docs", "avg").collect()[0]["avg_bucket"] == (
            sum(self.VALS) / len(self.VALS)
        )
        assert bucket_metric(bdf, "n_docs", "sum").collect()[0]["sum_bucket"] == sum(
            self.VALS
        )
        with pytest.raises(ValueError, match="fn must be"):
            bucket_metric(bdf, "n_docs", "median")

    def test_bucket_metric_min_max_keys(self, spark, bdf):
        from ostrich_spark.pipeline_aggs import bucket_metric

        r = bucket_metric(bdf, "n_docs", "min", key="bucket_ms").collect()[0]
        assert r["min_bucket"] == 1 and r["keys"] == [2 * 86_400_000]
        # ties: EVERY extreme bucket's key, sorted (ES keys array)
        tied = spark.createDataFrame(
            [(0, 9), (1, 3), (2, 9)], "bucket_ms long, n_docs long"
        )
        r = bucket_metric(tied, "n_docs", "max", key="bucket_ms").collect()[0]
        assert r["max_bucket"] == 9 and r["keys"] == [0, 2]
        with pytest.raises(ValueError, match="min/max"):
            bucket_metric(bdf, "n_docs", "avg", key="bucket_ms")

    def test_stats_and_extended_stats(self, bdf):
        from ostrich_spark.pipeline_aggs import extended_stats_bucket, stats_bucket

        r = stats_bucket(bdf, "n_docs").collect()[0]
        assert (r["count"], r["min"], r["max"], r["sum"]) == (6, 1, 9, 28)
        assert abs(r["avg"] - 28 / 6) < 1e-12
        e = extended_stats_bucket(bdf, "n_docs").collect()[0]
        assert e["sum_of_squares"] == sum(v * v for v in self.VALS)
        mean = 28 / 6
        var = sum((v - mean) ** 2 for v in self.VALS) / 6  # population
        assert abs(e["variance"] - var) < 1e-9
        assert abs(e["std_upper"] - (mean + 2 * var**0.5)) < 1e-9
        assert abs(e["std_lower"] - (mean - 2 * var**0.5)) < 1e-9

    def test_percentiles_nearest_rank_hand_computed(self, spark):
        from ostrich_spark.pipeline_aggs import percentiles_bucket

        # sorted = [1..10]; ES exact pick: sorted[round(p/100*(n-1))]
        df = spark.createDataFrame(
            [(i, float(i + 1)) for i in range(10)], "k long, v double"
        )
        got = {
            r["percent"]: r["value"]
            for r in percentiles_bucket(df, "v", [0, 50, 90, 100]).collect()
        }
        # round(0.5*9)=5 (HALF_UP) -> sorted[5] = 6.0; round(0.9*9)=8 -> 9.0
        assert got == {0.0: 1.0, 50.0: 6.0, 90.0: 9.0, 100.0: 10.0}
        with pytest.raises(ValueError, match="outside"):
            percentiles_bucket(df, "v", [101])
        with pytest.raises(ValueError, match=">= 1"):
            percentiles_bucket(df, "v", [])

    def test_nulls_skipped_and_empty_series(self, spark):
        from ostrich_spark.pipeline_aggs import (
            bucket_metric,
            percentiles_bucket,
            stats_bucket,
        )

        df = spark.createDataFrame(
            [(0, 5.0), (1, None), (2, 3.0)], "k long, v double"
        )
        assert stats_bucket(df, "v").collect()[0]["count"] == 2
        assert bucket_metric(df, "v", "min", key="k").collect()[0]["keys"] == [2]
        empty = spark.createDataFrame([(0, None)], "k long, v double")
        assert percentiles_bucket(empty, "v", [50]).collect()[0]["value"] is None


class TestBucketScript:
    def test_sql_string_and_column(self, bdf):
        from ostrich_spark.pipeline_aggs import bucket_script

        got = _sorted(
            bucket_script(bdf, "r", "n_docs * 2 + 1"), "r"
        )
        assert [t[2] for t in got] == [9, 15, 3, 11, 5, 19]
        got2 = _sorted(
            bucket_script(bdf, "r", F.col("n_docs") * 2 + 1), "r"
        )
        assert got == got2

    def test_gap_policy_skip_nulls_output(self, spark):
        from ostrich_spark.pipeline_aggs import bucket_script

        df = spark.createDataFrame(
            [(0, 4, 2.0), (1, None, 3.0), (2, 6, None)],
            "k long, a long, b double",
        )
        # coalesce would MASK the gap without inputs= — with it, any
        # NULL input nulls the bucket (ES gap_policy: skip)
        out = bucket_script(
            df, "r", "coalesce(a, 0) / coalesce(b, 1)", inputs=["a", "b"]
        )
        rows = {r["k"]: r["r"] for r in out.collect()}
        assert rows[0] == 2.0 and rows[1] is None and rows[2] is None


class TestNormalize:
    def test_methods_hand_computed(self, bdf):
        from ostrich_spark.pipeline_aggs import normalize

        vals = [4.0, 7.0, 1.0, 5.0, 2.0, 9.0]  # bucket_ms order
        mn, mx, s = min(vals), max(vals), sum(vals)
        avg = s / len(vals)
        var = sum((v - avg) ** 2 for v in vals) / len(vals)
        import math

        sm = sum(math.exp(v) for v in vals)
        want = {
            "rescale_0_1": [(v - mn) / (mx - mn) for v in vals],
            "rescale_0_100": [100 * (v - mn) / (mx - mn) for v in vals],
            "percent_of_sum": [v / s for v in vals],
            "mean": [(v - avg) / (mx - mn) for v in vals],
            "z-score": [(v - avg) / math.sqrt(var) for v in vals],
            "softmax": [math.exp(v) / sm for v in vals],
        }
        for method, exp in want.items():
            got = [t[2] for t in _sorted(normalize(bdf, "n_docs", method), "normalized")]
            assert got == pytest.approx(exp, rel=1e-12), method

    def test_null_skip_and_degenerate(self, spark):
        from ostrich_spark.pipeline_aggs import normalize

        df = spark.createDataFrame(
            [(0, 2.0), (1, None), (2, 6.0)], "k long, v double"
        )
        rows = {
            r["k"]: r["normalized"]
            for r in normalize(df, "v", "percent_of_sum").collect()
        }
        # NULL stays NULL and is excluded from the sum (8, not  NULL)
        assert rows[1] is None
        assert rows[0] == pytest.approx(0.25) and rows[2] == pytest.approx(0.75)
        flat = spark.createDataFrame([(0, 3.0), (1, 3.0)], "k long, v double")
        got = {r["k"]: r["normalized"] for r in normalize(flat, "v", "rescale_0_1").collect()}
        assert got[0] is None and got[1] is None  # zero range -> NULL

    def test_validation(self, bdf):
        from ostrich_spark.pipeline_aggs import normalize

        with pytest.raises(ValueError, match="method"):
            normalize(bdf, "n_docs", "nope")


class TestRate:
    def test_fixed_interval_units(self, bdf):
        from ostrich_spark.pipeline_aggs import rate

        # day buckets, hour unit: each bucket spans 24 hours
        got = [t[2] for t in _sorted(rate(bdf, "day", "hour"), "rate")]
        assert got == pytest.approx([v / 24 for v in (4, 7, 1, 5, 2, 9)], rel=1e-12)
        # unit LARGER than the bucket extrapolates (day bucket per week)
        got_w = [t[2] for t in _sorted(rate(bdf, "day", "week"), "rate")]
        assert got_w == pytest.approx([v * 7 for v in (4, 7, 1, 5, 2, 9)], rel=1e-12)

    def test_calendar_month_is_calendar_aware(self, spark):
        from ostrich_spark.pipeline_aggs import rate

        # 2024-01 (31d), 2024-02 (LEAP: 29d), 2024-03 (31d)
        jan = 1704067200000
        feb = 1706745600000
        mar = 1709251200000
        df = spark.createDataFrame(
            [(jan, 62), (feb, 58), (mar, 93)], "bucket_ms long, n_docs long"
        )
        got = {r["bucket_ms"]: r["rate"] for r in rate(df, "month", "day").collect()}
        assert got[jan] == pytest.approx(2.0)
        assert got[feb] == pytest.approx(2.0)
        assert got[mar] == pytest.approx(3.0)
        # per-quarter rate of month buckets: month/quarter = 1/3
        gq = {r["bucket_ms"]: r["rate"] for r in rate(df, "month", "quarter").collect()}
        assert gq[jan] == pytest.approx(62 * 3.0)
        # year bucket per month = /12
        y = spark.createDataFrame([(jan, 120)], "bucket_ms long, n_docs long")
        gy = {r["bucket_ms"]: r["rate"] for r in rate(y, "year", "month").collect()}
        assert gy[jan] == pytest.approx(10.0)

    def test_validation(self, bdf):
        from ostrich_spark.pipeline_aggs import rate

        with pytest.raises(ValueError, match="interval"):
            rate(bdf, "fortnight", "day")
        with pytest.raises(ValueError, match="unit"):
            rate(bdf, "day", "decade")
        with pytest.raises(ValueError, match="months-family"):
            rate(bdf, "day", "month")
        with pytest.raises(ValueError, match="months-family"):
            rate(bdf, "week", "month")


class TestMovingPercentiles:
    def test_window3_shift1_hand_values(self, spark, bdf):
        from ostrich_spark.pipeline_aggs import moving_percentiles

        got = [
            tuple(r)
            for r in moving_percentiles(
                bdf, "bucket_ms", "n_docs", window=3, percents=(50.0,), shift=1
            )
            .orderBy("bucket_ms")
            .select("moving_pctl_50")
            .collect()
        ]
        vals = [n for _, n in BUCKETS]
        # nearest-rank: sorted[round(0.5 * (n-1))] with HALF_UP
        # rounding (Spark F.round; python round() is banker's)
        import math

        want = []
        for i in range(len(vals)):
            wvals = sorted(vals[max(0, i - 2): i + 1])
            want.append(wvals[int(math.floor(0.5 * (len(wvals) - 1) + 0.5))])
        assert [g[0] for g in got] == want

    def test_shift0_empty_start_and_null_skip(self, spark):
        from ostrich_spark.pipeline_aggs import moving_percentiles

        df = spark.createDataFrame(
            [(0, 10), (1, None), (2, 30), (3, 50)],
            "bucket_ms long, n_docs long",
        )
        got = [
            r["moving_pctl_100"]
            for r in moving_percentiles(
                df, "bucket_ms", "n_docs", window=2, percents=(100.0,)
            ).orderBy("bucket_ms").collect()
        ]
        # bucket0: empty window -> NULL; bucket1: [10]; bucket2: [10]
        # (the NULL skipped); bucket3: [30] window = buckets 1,2
        assert got == [None, 10, 10, 30]

    def test_multi_percent_columns_and_validation(self, spark, bdf):
        from ostrich_spark.pipeline_aggs import moving_percentiles

        out = moving_percentiles(
            bdf, "bucket_ms", "n_docs", window=6, percents=(50.0, 99.9), shift=1
        )
        assert "moving_pctl_50" in out.columns
        assert "moving_pctl_99_9" in out.columns
        last = out.orderBy("bucket_ms").collect()[-1]
        svals = sorted(n for _, n in BUCKETS)
        assert last["moving_pctl_50"] == svals[3]  # round(2.5) HALF_UP
        assert last["moving_pctl_99_9"] == svals[round(0.999 * 5)]
        with pytest.raises(ValueError):
            moving_percentiles(bdf, "bucket_ms", "n_docs", window=0)
        with pytest.raises(ValueError):
            moving_percentiles(bdf, "bucket_ms", "n_docs", window=3, percents=())
        with pytest.raises(ValueError):
            moving_percentiles(
                bdf, "bucket_ms", "n_docs", window=3, percents=(123.0,)
            )


class TestChangePoint:
    """Deterministic AMOC step detection (ES change_point analog):
    argmin split vs a numpy brute force."""

    def _brute(self, vals, min_side=2):
        import numpy as np

        x = np.asarray(vals, dtype=float)
        n = len(x)
        best = None
        for s in range(min_side, n - min_side + 1):
            l, r = x[:s], x[s:]
            sse = ((l - l.mean()) ** 2).sum() + ((r - r.mean()) ** 2).sum()
            if best is None or sse < best[0] - 1e-12:
                best = (sse, s, l.mean(), r.mean())
        tot = ((x - x.mean()) ** 2).sum()
        gain = 0.0 if tot == 0 else 1.0 - best[0] / tot
        return best[1], best[2], best[3], gain

    def test_step_up_detected_at_right_key(self, spark):
        from ostrich_spark.pipeline_aggs import change_point

        vals = [10.0, 11.0, 9.0, 10.5, 10.0, 30.0, 29.0, 31.0, 30.5, 30.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k long, v double"
        )
        row = change_point(df, "k", "v").collect()[0]
        s, bm, am, gain = self._brute(vals)
        assert row["type"] == "step_up"
        assert row["change_key"] == s  # first key of the after-segment
        assert abs(row["before_mean"] - bm) < 1e-9
        assert abs(row["after_mean"] - am) < 1e-9
        assert abs(row["gain"] - gain) < 1e-6

    def test_step_down_none_and_edges(self, spark):
        from ostrich_spark.pipeline_aggs import change_point

        down = [30.0, 31.0, 29.0, 10.0, 9.0, 11.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(down)], "k long, v double"
        )
        row = change_point(df, "k", "v").collect()[0]
        assert row["type"] == "step_down" and row["change_key"] == 3
        # flat-noise series: no step at min_gain 0.5
        flat = [10.0, 10.4, 9.8, 10.1, 9.9, 10.2, 10.0, 10.3]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(flat)], "k long, v double"
        )
        row = change_point(df, "k", "v").collect()[0]
        assert row["type"] == "none" and row["change_key"] is None
        # constant series: SSE_total = 0 -> none
        df = spark.createDataFrame([(i, 5.0) for i in range(6)], "k long, v double")
        assert change_point(df, "k", "v").collect()[0]["type"] == "none"
        # too short: empty frame
        df = spark.createDataFrame([(0, 1.0), (1, 9.0)], "k long, v double")
        assert change_point(df, "k", "v").count() == 0
        import pytest

        with pytest.raises(ValueError, match="min_gain"):
            change_point(df, "k", "v", min_gain=2.0)
        with pytest.raises(ValueError, match="min_side"):
            change_point(df, "k", "v", min_side=0)
