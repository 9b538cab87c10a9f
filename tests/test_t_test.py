"""t_test aggregation (ES ``t_test`` analog): Welch / pooled / paired
Student's t over numeric doc values of query match sets, with the exact
two-sided p-value via the incomplete-beta identity (no scipy).

Evidence layers: the p-value kernel is pinned against CLOSED FORMS
(df=1 Cauchy, df=2 algebraic) and published critical values
(t_{0.025,df} -> p = 0.05); the t/df arithmetic is recomputed brute
force with numpy from the raw fixture values."""

import math

import numpy as np
import pandas as pd
import pytest

from ostrich_spark.build import build_index
from ostrich_spark.query.exec import t_test, t_two_sided_p
from ostrich_spark.schema import Schema

A_VALS = [27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6]
B_VALS = [27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8]
B2_VALS = [25.0, 20.5, 18.0, 24.1, 18.2, 19.3, 17.5, 21.6, 20.0, 23.3]


@pytest.fixture(scope="module")
def tt_index(spark, tmp_path_factory):
    docs = []
    for i, v in enumerate(A_VALS):
        docs.append({"doc_id": i, "tag": "alpha", "v": v, "w": B2_VALS[i]})
    for j, v in enumerate(B_VALS):
        docs.append(
            {"doc_id": 100 + j, "tag": "beta", "v": v, "w": float(j)}
        )
    s = Schema()
    s.add_text_field("tag", "default")
    s.add_numeric_field("v", "double")
    s.add_numeric_field("w", "double")
    idx = str(tmp_path_factory.mktemp("ttest") / "idx")
    build_index(
        spark, spark.createDataFrame(pd.DataFrame(docs)), s, idx,
        num_partitions=2, order_col="doc_id", id_cols=["doc_id"],
    )
    return idx


class TestPValueKernel:
    def test_cauchy_closed_form_df1(self):
        # df=1 is Cauchy: two-sided p = 1 - 2*arctan(t)/pi, exactly
        for t in (0.5, 1.0, 2.0, 12.706, 100.0):
            want = 1.0 - 2.0 * math.atan(t) / math.pi
            assert t_two_sided_p(t, 1.0) == pytest.approx(want, rel=1e-12)

    def test_df2_closed_form(self):
        # df=2: two-sided p = 1 - t / sqrt(2 + t^2), exactly
        for t in (0.3, 1.0, 4.303, 10.0):
            want = 1.0 - t / math.sqrt(2.0 + t * t)
            assert t_two_sided_p(t, 2.0) == pytest.approx(want, rel=1e-12)

    def test_published_criticals_give_p05(self):
        # t_{0.025, df} from standard tables -> two-sided p = 0.05
        for t, df in ((12.706, 1), (4.303, 2), (2.228, 10), (2.042, 30)):
            assert t_two_sided_p(t, float(df)) == pytest.approx(0.05, abs=2e-4)

    def test_edges_and_symmetry(self):
        assert t_two_sided_p(0.0, 7.0) == 1.0
        assert t_two_sided_p(3.3, 5.0) == t_two_sided_p(-3.3, 5.0)
        ps = [t_two_sided_p(t, 9.0) for t in (0.0, 0.5, 1.0, 2.0, 4.0, 8.0)]
        assert ps == sorted(ps, reverse=True)  # monotone in |t|
        with pytest.raises(ValueError, match="df"):
            t_two_sided_p(1.0, 0.0)


def _row(df):
    return df.collect()[0]


class TestTTest:
    def test_welch_vs_numpy(self, spark, tt_index):
        r = _row(t_test(spark, tt_index, "v", "tag:alpha", query_b="tag:beta"))
        a, b = np.array(A_VALS), np.array(B_VALS)
        na, nb = len(a), len(b)
        sa, sb = a.var(ddof=1) / na, b.var(ddof=1) / nb
        t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
        df = (sa + sb) ** 2 / (sa**2 / (na - 1) + sb**2 / (nb - 1))
        assert r["type"] == "heteroscedastic"
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["mean_a"] == pytest.approx(a.mean(), rel=1e-12)
        assert r["t"] == pytest.approx(t, rel=1e-12)
        assert r["df"] == pytest.approx(df, rel=1e-12)
        assert r["p_value"] == pytest.approx(t_two_sided_p(t, df), rel=1e-12)
        assert 0.0 < r["p_value"] < 1.0

    def test_homoscedastic_pooled(self, spark, tt_index):
        r = _row(t_test(
            spark, tt_index, "v", "tag:alpha", query_b="tag:beta",
            ttype="homoscedastic",
        ))
        a, b = np.array(A_VALS), np.array(B_VALS)
        na, nb = len(a), len(b)
        sp2 = ((na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1)) / (na + nb - 2)
        t = (a.mean() - b.mean()) / math.sqrt(sp2 * (1 / na + 1 / nb))
        assert r["df"] == na + nb - 2
        assert r["t"] == pytest.approx(t, rel=1e-12)

    def test_paired_vs_numpy(self, spark, tt_index):
        r = _row(t_test(
            spark, tt_index, "v", "tag:alpha", field_b="w", ttype="paired",
        ))
        d = np.array(A_VALS) - np.array(B2_VALS)
        n = len(d)
        t = d.mean() / math.sqrt(d.var(ddof=1) / n)
        assert (r["n_a"], r["df"]) == (n, n - 1)
        assert r["t"] == pytest.approx(t, rel=1e-12)
        assert r["p_value"] == pytest.approx(
            t_two_sided_p(t, n - 1), rel=1e-12
        )

    def test_field_b_population_mode(self, spark, tt_index):
        # unpaired with a DIFFERENT field on side B
        r = _row(t_test(
            spark, tt_index, "v", "tag:alpha", field_b="w",
            query_b="tag:alpha",
        ))
        a, b = np.array(A_VALS), np.array(B2_VALS)
        sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
        assert r["t"] == pytest.approx(t, rel=1e-12)

    def test_validation(self, spark, tt_index):
        with pytest.raises(ValueError, match="type"):
            t_test(spark, tt_index, "v", "tag:alpha", query_b="tag:beta",
                   ttype="welch")
        with pytest.raises(ValueError, match="query_b"):
            t_test(spark, tt_index, "v", "tag:alpha")
        with pytest.raises(ValueError, match="field_b"):
            t_test(spark, tt_index, "v", "tag:alpha", ttype="paired")
        with pytest.raises(ValueError, match="query_b unset"):
            t_test(spark, tt_index, "v", "tag:alpha", field_b="w",
                   query_b="tag:beta", ttype="paired")
        with pytest.raises(ValueError, match=">= 2"):
            t_test(spark, tt_index, "v", "tag:zzznope", query_b="tag:beta")
