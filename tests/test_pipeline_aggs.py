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
