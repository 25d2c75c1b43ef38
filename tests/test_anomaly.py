"""ops/anomaly units: rolling z-score, Benford, freshness, count anomaly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from driftray.ops.anomaly import (benford_digit_counts, freshness_lag,
                                  rolling_zscore, window_count_anomaly)


class TestRollingZscore:
    def _ds(self, users, vals):
        n = len(vals)
        return rd.from_arrow(pa.table({
            "user": pa.array(users, pa.string()),
            "ord": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }))

    def test_spike_flagged_current_row_excluded(self, ray_session):
        # 10 steady values then a huge spike: the spike row's baseline is
        # the 10 predecessors only, so it IS flagged; the steady rows are not
        vals = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 5000]
        out = (rolling_zscore(self._ds(["u"] * 11, vals), ["user"], ["ord"],
                              "v", window=20, min_periods=5,
                              num_partitions=4)
               .to_pandas().sort_values("ord", ignore_index=True))
        assert out["is_anomaly"].tolist()[:-1] == [0] * 10
        assert out["is_anomaly"].iloc[-1] == 1
        assert out["n_prev"].tolist() == list(range(11))

    def test_min_periods_gate(self, ray_session):
        # spike at position 3 (< min_periods predecessors) is NOT flagged
        vals = [100, 100, 100, 9000]
        out = (rolling_zscore(self._ds(["u"] * 4, vals), ["user"], ["ord"],
                              "v", window=20, min_periods=5,
                              num_partitions=4).to_pandas())
        assert out["is_anomaly"].sum() == 0

    def test_window_truncates_history(self, ray_session):
        # window=3: an old spike rolls out of the frame
        vals = [100, 100, 100, 100, 100, 100, 100, 100]
        out = (rolling_zscore(self._ds(["u"] * 8, vals), ["user"], ["ord"],
                              "v", window=3, min_periods=2,
                              num_partitions=4).to_pandas())
        assert (out["n_prev"].to_numpy() <= 3).all()

    def test_keys_isolated(self, ray_session):
        # the spike user must not contaminate the steady user
        users = ["a"] * 6 + ["b"] * 6
        vals = [100] * 5 + [9000] + [50] * 6
        out = (rolling_zscore(self._ds(users, vals), ["user"], ["ord"], "v",
                              window=20, min_periods=5, num_partitions=4)
               .to_pandas())
        assert out[out.user == "a"]["is_anomaly"].sum() == 1
        assert out[out.user == "b"]["is_anomaly"].sum() == 0

    def test_float_value_rejected(self, ray_session):
        ds = rd.from_arrow(pa.table({"user": ["u"], "ord": [1],
                                     "v": pa.array([1.5], pa.float64())}))
        with pytest.raises((TypeError, Exception)):
            rolling_zscore(ds, ["user"], ["ord"], "v", window=5,
                           num_partitions=4).to_pandas()

    def test_matches_pandas_oracle(self, ray_session):
        rng = np.random.default_rng(7)
        n = 400
        users = rng.choice(["u1", "u2", "u3"], size=n)
        vals = rng.integers(50, 150, size=n)
        vals[rng.choice(n, 8, replace=False)] += 5000
        df = pd.DataFrame({"user": users, "ord": np.arange(n), "v": vals})
        out = (rolling_zscore(
            rd.from_pandas(df), ["user"], ["ord"], "v", window=20,
            min_periods=5, z_threshold=3.0, num_partitions=4)
            .to_pandas().sort_values("ord", ignore_index=True))

        def oracle(g):
            g = g.sort_values("ord")
            v = g["v"].to_numpy(dtype=np.int64)
            flags, nprev = [], []
            for i in range(len(v)):
                lo = max(0, i - 20)
                w = v[lo:i]
                nprev.append(len(w))
                if len(w) < 5:
                    flags.append(0)
                    continue
                m, sd = w.mean(), w.std(ddof=1)
                flags.append(int(sd > 0 and abs(v[i] - m) > 3 * sd))
            return pd.DataFrame({"ord": g["ord"], "n_prev": nprev,
                                 "f": flags})

        want = (pd.concat([oracle(g) for _, g in df.groupby("user")])
                .sort_values("ord", ignore_index=True))
        assert out["n_prev"].tolist() == want["n_prev"].tolist()
        assert out["is_anomaly"].tolist() == want["f"].tolist()


class TestBenford:
    def test_digit_extraction(self, ray_session):
        ds = rd.from_arrow(pa.table({
            "g": ["a", "a", "a", "a", "b", "b"],
            "v": pa.array([1.5, 19.0, 950.2, 0.5, 200.0, 2.0], pa.float64()),
        }))
        out = (benford_digit_counts(ds, "v", ["g"]).to_pandas()
               .sort_values(["g", "digit"], ignore_index=True))
        # 0.5 dropped (< 1); a → digits 1,1,9; b → 2,2
        assert out.values.tolist() == [["a", 1, 2], ["a", 9, 1], ["b", 2, 2]]

    def test_no_groups(self, ray_session):
        ds = rd.from_arrow(pa.table({"v": pa.array([12.0, 15.0, 3.0])}))
        out = (benford_digit_counts(ds, "v").to_pandas()
               .sort_values("digit", ignore_index=True))
        assert out.values.tolist() == [[1, 2], [3, 1]]


class TestFreshness:
    def test_lag_vs_watermark(self, ray_session):
        ts = pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:05",
                             "2026-01-02 00:00:00.000003"], format="ISO8601")
        ds = rd.from_pandas(pd.DataFrame({"g": ["a", "a", "b"], "ts": ts}))
        out = freshness_lag(ds, "g", "ts")
        assert out["g"].tolist() == ["a", "b"]
        day_us = 86_400_000_000
        assert out["lag_us"].tolist() == [day_us - 5_000_000 + 3, 0]


class TestCountAnomaly:
    def test_outlier_days_flagged(self, ray_session):
        days = (["2026-01-01"] * 100 + ["2026-01-02"] * 101 +
                ["2026-01-03"] * 99 + ["2026-01-04"] * 10 +
                ["2026-01-05"] * 300)
        ds = rd.from_pandas(pd.DataFrame({"ts": pd.to_datetime(days)}))
        out = window_count_anomaly(ds, "ts", low_pct=80, high_pct=120)
        flagged = out[out.is_anomaly == 1]["day"].dt.strftime("%d").tolist()
        assert flagged == ["04", "05"]

    def test_even_day_count_median(self, ray_session):
        # 4 days, counts 10,10,20,20 → 2×median = 30; band 80–120% → all
        # four are outside [12, 18] and flagged
        days = (["2026-01-01"] * 10 + ["2026-01-02"] * 10 +
                ["2026-01-03"] * 20 + ["2026-01-04"] * 20)
        ds = rd.from_pandas(pd.DataFrame({"ts": pd.to_datetime(days)}))
        out = window_count_anomaly(ds, "ts", low_pct=80, high_pct=120)
        assert out["is_anomaly"].tolist() == [1, 1, 1, 1]


class TestCusum:
    def test_level_shift_detected(self, ray_session):
        import pandas as pd
        from driftray.ops.anomaly import cusum_changepoints
        import ray.data as rd
        # 20 days at level 10, then 10 days at level 12 → hi-side alarm
        days, vals = [], []
        for d in range(30):
            lvl = 10.0 if d < 20 else 12.0
            for k in range(50):
                days.append(pd.Timestamp("2026-01-01") + pd.Timedelta(days=d,
                                                                      minutes=k))
                vals.append(lvl + (k % 5 - 2) * 0.01)
        ds = rd.from_pandas(pd.DataFrame({"ts": days, "value": vals}))
        out = cusum_changepoints(ds, "ts", "value", k_sigma=0.5, h_sigma=3.0,
                                 baseline_days=15)
        assert len(out) == 30
        assert out["alarm"].iloc[:20].sum() == 0
        assert out["alarm"].iloc[22:].all()

    def test_no_shift_no_alarm(self, ray_session):
        import pandas as pd
        from driftray.ops.anomaly import cusum_changepoints
        import ray.data as rd
        rng = np.random.default_rng(2)
        ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, size=3000), unit="s")
        ds = rd.from_pandas(pd.DataFrame({"ts": ts,
                                          "value": rng.normal(5, 1, 3000)}))
        out = cusum_changepoints(ds, "ts", "value", k_sigma=0.5, h_sigma=5.0)
        assert out["alarm"].sum() == 0


class TestWinsorize:
    def test_exact_order_statistic_bounds(self, ray_session):
        import pandas as pd
        from driftray.ops.grouped import grouped_winsorize_stats
        import ray.data as rd
        # group a: values 1..20 → q05 bound = ceil(.05*20)=1st = 1,
        # q95 = ceil(.95*20)=19th = 19
        df = pd.DataFrame({"g": ["a"] * 20 + ["b"] * 10,
                           "v": list(range(1, 21)) + [100] * 9 + [1000]})
        out = (grouped_winsorize_stats(rd.from_pandas(df), ["g"], "v",
                                       num_partitions=4)
               .to_pandas().set_index("g"))
        assert out.loc["a", ["n", "lo", "hi"]].tolist() == [20, 1, 19]
        assert out.loc["a", "n_below"] == 0 and out.loc["a", "n_above"] == 1
        assert out.loc["a", "wins_sum"] == sum(range(1, 20)) + 19
        # group b: lo = 1st = 100, hi = ceil(9.5)=10th = 1000
        assert out.loc["b", ["lo", "hi"]].tolist() == [100, 1000]
        assert out.loc["b", "wins_sum"] == 900 + 1000

    def test_float_rejected(self, ray_session):
        import pandas as pd
        import pytest as _pt
        from driftray.ops.grouped import grouped_winsorize_stats
        import ray.data as rd
        df = pd.DataFrame({"g": ["a"], "v": [1.5]})
        with _pt.raises(Exception):
            grouped_winsorize_stats(rd.from_pandas(df), ["g"], "v",
                                    num_partitions=4).to_pandas()
