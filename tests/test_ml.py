"""ops/ml logistic regression: distributed GD vs a local numpy oracle."""

import numpy as np
import pandas as pd
import pytest

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


class TestHistSplitGains:
    def test_matches_numpy_reference(self, ray_session):
        import ray.data as rd

        from driftray.ops.ml import hist_split_gains

        rng = np.random.default_rng(11)
        n, n_bins = 5000, 8
        x1 = rng.integers(0, 100, n)
        x2 = rng.integers(-50, 50, n)
        # integer target with a real split structure on x1
        y = np.where(x1 >= 60, 500, 100) + rng.integers(0, 10, n)
        df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
        out = hist_split_gains(rd.from_pandas(df).repartition(4),
                               ["x1", "x2"], "y", n_bins=n_bins)

        for feat in ("x1", "x2"):
            x = df[feat].to_numpy(dtype=np.float64)
            vmin, vmax = x.min(), x.max()
            w = (vmax - vmin) / n_bins
            b = np.minimum(np.floor((x - vmin) / w).astype(int), n_bins - 1)
            cnt = np.bincount(b, minlength=n_bins)
            s = np.bincount(b, weights=y.astype(np.float64),
                            minlength=n_bins)
            nl, sl = np.cumsum(cnt), np.cumsum(s)
            nt, st = nl[-1], sl[-1]
            got = out[out["feature"] == feat].set_index("split_bin")
            for k in range(n_bins - 1):
                if nl[k] == 0 or nt - nl[k] == 0:
                    continue
                ref = (sl[k] ** 2 / nl[k]
                       + (st - sl[k]) ** 2 / (nt - nl[k]) - st ** 2 / nt)
                assert got.loc[k, "n_left"] == nl[k]
                assert abs(got.loc[k, "gain"] - ref) < 1e-9 * max(abs(ref), 1)

        # the planted split (x1 ~ 60) must be the global best
        best = out.loc[out["gain"].idxmax()]
        assert best["feature"] == "x1"
        assert 55 <= best["threshold"] <= 65

    def test_constant_feature_raises(self, ray_session):
        import ray.data as rd

        from driftray.ops.ml import hist_split_gains

        df = pd.DataFrame({"x": [3] * 100, "y": range(100)})
        with pytest.raises(ValueError, match="constant"):
            hist_split_gains(rd.from_pandas(df), ["x"], "y", n_bins=4)


class TestGbdtStumps:
    def _reference(self, df, feats, y, n_rounds, lr, n_bins):
        """Local numpy replica of the exact boosting recurrence."""
        edges = {}
        for f in feats:
            x = df[f].to_numpy(dtype=np.float64)
            vmin, vmax = x.min(), x.max()
            edges[f] = (vmin, (vmax - vmin) / n_bins)
        base = df[y].to_numpy(dtype=np.float64).mean()
        pred = np.full(len(df), base)
        stumps = []
        for _ in range(n_rounds):
            r = df[y].to_numpy(dtype=np.float64) - pred
            best = None
            for f in feats:
                vmin, w = edges[f]
                x = df[f].to_numpy(dtype=np.float64)
                b = np.minimum(np.floor((x - vmin) / w).astype(int),
                               n_bins - 1)
                cnt = np.bincount(b, minlength=n_bins)
                s = np.bincount(b, weights=r, minlength=n_bins)
                nl, sl = np.cumsum(cnt), np.cumsum(s)
                nt, st = nl[-1], sl[-1]
                for k in range(n_bins - 1):
                    if nl[k] == 0 or nt - nl[k] == 0:
                        continue
                    gain = (sl[k] ** 2 / nl[k]
                            + (st - sl[k]) ** 2 / (nt - nl[k])
                            - st ** 2 / nt)
                    key = (-gain, f, k)
                    if best is None or key < best[0]:
                        best = (key, f, vmin + w * (k + 1),
                                lr * sl[k] / nl[k],
                                lr * (st - sl[k]) / (nt - nl[k]))
            _, f, thr, lv, rv = best
            stumps.append((f, thr, lv, rv))
            go_left = df[f].to_numpy(dtype=np.float64) < thr
            pred += np.where(go_left, lv, rv)
        return base, stumps, pred

    def test_matches_numpy_boosting(self, ray_session):
        import ray.data as rd

        from driftray.ops.ml import gbdt_score, gbdt_stumps

        rng = np.random.default_rng(5)
        n = 4000
        df = pd.DataFrame({
            "a": rng.integers(0, 100, n).astype(float),
            "b": rng.integers(0, 100, n).astype(float)})
        df["y"] = (np.where(df["a"] > 70, 50.0, 0.0)
                   + np.where(df["b"] > 30, 20.0, 0.0)
                   + rng.normal(0, 1, n))

        model = gbdt_stumps(rd.from_pandas(df).repartition(4),
                            ["a", "b"], "y", n_rounds=6, lr=0.5, n_bins=16)
        base, stumps, pred = self._reference(df, ["a", "b"], "y",
                                             6, 0.5, 16)
        assert abs(model["base"] - base) < 1e-9
        assert len(model["stumps"]) == 6
        for got, (f, thr, lv, rv) in zip(model["stumps"], stumps):
            assert got["feature"] == f
            assert abs(got["threshold"] - thr) < 1e-9
            assert abs(got["left"] - lv) < 1e-6
            assert abs(got["right"] - rv) < 1e-6

        scored = gbdt_score(rd.from_pandas(df), model,
                            ["a", "b"]).to_pandas()
        assert np.allclose(scored["pred"].to_numpy(), pred, atol=1e-6)

        # boosting must actually reduce training MSE
        assert model["train_mse"][-1] < model["train_mse"][0] * 0.2
