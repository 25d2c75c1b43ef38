"""ops/ml logistic regression: distributed GD vs a local numpy oracle."""

import numpy as np
import pandas as pd

import ray.data as rd

from driftray.ops.ml import logistic_fit, logistic_score, _sigmoid


def _synthetic(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3)) * [2.0, 0.5, 5.0] + [1.0, -3.0, 10.0]
    true_w = np.array([1.5, -2.0, 0.8])
    z = (x - x.mean(0)) / x.std(0) @ true_w + 0.3
    y = (rng.uniform(size=n) < _sigmoid(z)).astype(np.float64)
    return pd.DataFrame({"x0": x[:, 0], "x1": x[:, 1], "x2": x[:, 2], "y": y})


def _local_gd(df, epochs, lr):
    x = df[["x0", "x1", "x2"]].to_numpy()
    y = df["y"].to_numpy()
    mean, std = x.mean(0), x.std(0)
    xs = (x - mean) / np.maximum(std, 1e-6)
    w = np.zeros(4)
    for _ in range(epochs):
        z = xs @ w[1:] + w[0]
        err = _sigmoid(z) - y
        g = np.concatenate(([err.sum()], err @ xs)) / len(y)
        w -= lr * g
    return w


class TestLogisticFit:
    def test_matches_local_oracle(self, ray_session):
        df = _synthetic()
        ds = rd.from_pandas(df).repartition(6)
        m = logistic_fit(ds, ["x0", "x1", "x2"], "y", epochs=20, lr=1.0)
        want = _local_gd(df, epochs=20, lr=1.0)
        got = np.concatenate(([m["bias"]], m["weights"]))
        # per-block partial sums vs one flat sum: identical up to float assoc
        assert np.allclose(got, want, atol=1e-8)

    def test_loss_decreases_and_separates(self, ray_session):
        df = _synthetic()
        ds = rd.from_pandas(df).repartition(6)
        m = logistic_fit(ds, ["x0", "x1", "x2"], "y", epochs=30, lr=1.0)
        assert m["loss"][-1] < m["loss"][0]
        scored = logistic_score(rd.from_pandas(df), m,
                                ["x0", "x1", "x2"]).to_pandas()
        acc = ((scored["p"] > 0.5).astype(float) == scored["y"]).mean()
        assert acc > 0.8
        assert m["n"] == len(df)

    def test_deterministic(self, ray_session):
        df = _synthetic()
        ds = rd.from_pandas(df).repartition(4)
        m1 = logistic_fit(ds, ["x0", "x1", "x2"], "y", epochs=5, lr=0.5)
        m2 = logistic_fit(rd.from_pandas(df).repartition(4),
                          ["x0", "x1", "x2"], "y", epochs=5, lr=0.5)
        assert np.array_equal(m1["weights"], m2["weights"])
