"""ops/profile.profile_table + ops/stats.fd_violations units."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from driftray.ops.profile import profile_table
from driftray.ops.stats import fd_violations


def _toy_ds():
    n = 3000
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=n).astype("float64")
    vals[::7] = np.nan  # float NaN is a VALUE here, not a null
    t = pa.table({
        "i": pa.array(np.arange(n), pa.int64()),
        "f": pa.array(vals, pa.float64()),
        "s": pa.array([None if k % 11 == 0 else f"w{k % 5}" for k in range(n)],
                      pa.string()),
        "ts": pa.array(pd.date_range("2026-01-01", periods=n, freq="min")),
    })
    return rd.from_arrow(t).repartition(6), t


class TestProfileTable:
    def test_counts_and_exact_stats(self, ray_session):
        ds, t = _toy_ds()
        prof = profile_table(ds).set_index("col")
        n = t.num_rows
        assert (prof["n"] == n).all()
        assert prof.loc["s", "n_null"] == sum(1 for k in range(n) if k % 11 == 0)
        assert prof.loc["i", "n_null"] == 0
        # integer column: exact min/max/sum
        assert prof.loc["i", "vmin"] == 0 and prof.loc["i", "vmax"] == n - 1
        assert prof.loc["i", "vsum"] == n * (n - 1) // 2
        # string column: stats over utf8 lengths (w0..w4 → all length 2)
        assert prof.loc["s", "vmin"] == 2 and prof.loc["s", "vmax"] == 2
        assert prof.loc["s", "kind"] == "str"
        assert prof.loc["ts", "kind"] == "ts"

    def test_approx_distinct_within_tolerance(self, ray_session):
        ds, _ = _toy_ds()
        prof = profile_table(ds).set_index("col")
        assert abs(prof.loc["i", "approx_distinct"] - 3000) / 3000 < 0.05
        # s has 5 distinct non-null values; HLL is near-exact at tiny card.
        assert prof.loc["s", "approx_distinct"] == 5

    def test_top_values(self, ray_session):
        skew = ["hot"] * 500 + ["warm"] * 100 + [f"cold{i}" for i in range(50)]
        ds = rd.from_arrow(pa.table({"s": pa.array(skew)})).repartition(4)
        prof = profile_table(ds).set_index("col")
        top = json.loads(prof.loc["s", "top_values"])
        assert top[0][0] == "hot" and top[0][1] >= 450
        assert top[1][0] == "warm"

    def test_mean_std_match_numpy(self, ray_session):
        vals = np.random.default_rng(5).normal(10, 3, size=2000)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(5)
        prof = profile_table(ds).set_index("col")
        assert abs(prof.loc["x", "mean"] - vals.mean()) < 1e-9
        assert abs(prof.loc["x", "std"] - vals.std()) < 1e-9
        assert prof.loc["x", "vsum"] is None or np.isnan(prof.loc["x", "vsum"])

    def test_column_subset(self, ray_session):
        ds, _ = _toy_ds()
        prof = profile_table(ds, columns=["i", "s"])
        assert sorted(prof["col"]) == ["i", "s"]


class TestFDViolations:
    def test_fd_holds(self, ray_session):
        df = pd.DataFrame({"k": ["a", "a", "b", "c", "c"],
                           "v": ["x", "x", "y", "z", "z"]})
        out = fd_violations(rd.from_pandas(df), ["k"], ["v"])
        assert out.iloc[0].tolist() == [3, 0]

    def test_fd_violated(self, ray_session):
        df = pd.DataFrame({"k": ["a", "a", "b", "b", "b", "c"],
                           "v": ["x", "y", "y", "y", "z", "z"]})
        out = fd_violations(rd.from_pandas(df), ["k"], ["v"])
        assert out.iloc[0].tolist() == [3, 2]   # a→{x,y}, b→{y,z}

    def test_composite_lhs(self, ray_session):
        df = pd.DataFrame({"k1": ["a", "a", "a"], "k2": [1, 1, 2],
                           "v": ["x", "y", "z"]})
        out = fd_violations(rd.from_pandas(df), ["k1", "k2"], ["v"])
        assert out.iloc[0].tolist() == [2, 1]
