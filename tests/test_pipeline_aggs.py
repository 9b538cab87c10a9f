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
