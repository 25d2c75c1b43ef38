"""Distributed model fitting over Dataset passes: logistic regression.

The curation stack scores documents with small linear models (quality
classifiers a la CCNet/FineWeb).  Training one at corpus scale is an
ITERATIVE full-batch gradient descent where each epoch is one streaming
``map_batches`` pass emitting a (D+1)-dim gradient partial per block; the
driver holds only the weight vector (KBs), so the input can be 100 TB.

The input is materialized once (it is consumed ``epochs`` times; without
the pin the lazy pipeline would re-read storage every epoch) after
projecting to exactly the feature + label columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logistic_fit(ds: rd.Dataset, x_cols: list[str], y_col: str,
                 epochs: int = 30, lr: float = 1.0, l2: float = 0.0,
                 standardize: bool = True) -> dict:
    """Full-batch gradient-descent logistic regression.

    Returns ``{"weights": np.ndarray[D], "bias": float, "mean": ...,
    "std": ..., "loss": list[float per epoch], "n": int}`` — weights are in
    STANDARDIZED feature space when ``standardize`` (apply via
    :func:`logistic_score`).  Deterministic: full-batch gradients, fixed
    epoch count; per-block partial sums reduce in block order.

    Scale shape: one projection + materialize, then per epoch ONE
    map_batches pass emitting a (D+2)-scalar row per block (gradient, loss,
    count) — the driver reduces |blocks| tiny rows and updates the
    broadcast weight vector.  No shuffle at any point.
    """
    import ray

    d = len(x_cols)
    proj = ds.select_columns(list(x_cols) + [y_col]).materialize()

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_cols].to_numpy(dtype=np.float64)
        return pd.DataFrame([{
            "n": np.int64(len(df)),
            **{f"s{j}": x[:, j].sum() for j in range(d)},
            **{f"q{j}": (x[:, j] ** 2).sum() for j in range(d)},
        }])

    if standardize:
        st = proj.map_batches(stats_partial, batch_format="pandas").to_pandas()
        st = st.sort_values(list(st.columns),
                            ignore_index=True, kind="mergesort")  # see below
        n = float(st["n"].sum())
        mean = np.array([st[f"s{j}"].sum() / n for j in range(d)])
        var = np.array([st[f"q{j}"].sum() / n - mean[j] ** 2 for j in range(d)])
        std = np.sqrt(np.maximum(var, 1e-12))
    else:
        mean, std = np.zeros(d), np.ones(d)
    mean_ref, std_ref = ray.put(mean), ray.put(std)

    w = np.zeros(d + 1)  # [bias, weights...]
    losses = []
    n_total = 0
    for _ in range(epochs):
        w_ref = ray.put(w)

        def grad_partial(df: pd.DataFrame) -> pd.DataFrame:
            wv = ray.get(w_ref)
            x = (df[x_cols].to_numpy(dtype=np.float64) - ray.get(mean_ref)) \
                / ray.get(std_ref)
            y = df[y_col].to_numpy(dtype=np.float64)
            z = x @ wv[1:] + wv[0]
            p = _sigmoid(z)
            err = p - y
            # numerically-stable log-loss: log(1+e^-|z|) + max(z,0) - z*y
            ll = np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - z * y
            return pd.DataFrame([{
                "n": np.int64(len(df)), "loss": ll.sum(),
                "g0": err.sum(),
                **{f"g{j + 1}": (err * x[:, j]).sum() for j in range(d)},
            }])

        parts = proj.map_batches(grad_partial, batch_format="pandas").to_pandas()
        # Ray does not guarantee block arrival order (preserve_order is
        # off); sort the per-block partials before the float reduce so
        # repeated fits produce bit-identical weights
        parts = parts.sort_values(list(parts.columns),
                                  ignore_index=True, kind="mergesort")
        n_total = int(parts["n"].sum())
        g = np.array([parts[f"g{j}"].sum() for j in range(d + 1)]) / n_total
        g[1:] += l2 * w[1:]
        w = w - lr * g
        losses.append(float(parts["loss"].sum()) / n_total)

    return {"weights": w[1:], "bias": float(w[0]), "mean": mean, "std": std,
            "loss": losses, "n": n_total}


def logistic_score(ds: rd.Dataset, model: dict, x_cols: list[str],
                   out_col: str = "p") -> rd.Dataset:
    """Score a Dataset with a :func:`logistic_fit` model — broadcast the
    tiny model once, vectorized per batch."""
    import ray

    ref = ray.put({k: model[k] for k in ("weights", "bias", "mean", "std")})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        x = (df[x_cols].to_numpy(dtype=np.float64) - m["mean"]) / m["std"]
        df = df.copy()
        df[out_col] = _sigmoid(x @ m["weights"] + m["bias"])
        return df

    return ds.map_batches(score, batch_format="pandas")


def hist_split_gains(ds: rd.Dataset, feature_cols: list[str], y_col: str,
                     n_bins: int = 32) -> pd.DataFrame:
    """GBDT-style histogram split finder (the LightGBM/XGBoost 'hist'
    method): for every feature and every candidate bin boundary, the
    squared-error gain of splitting there —
    ``gain = S_L²/n_L + S_R²/n_R − S²/N`` (variance reduction × N).

    Scale shape: ONE Min/Max aggregate fixes uniform bin edges, ONE
    map_batches pass reduces each block to (feature, bin, n, sum_y)
    partials via ``np.bincount`` (|features| × n_bins rows per block, KB),
    one tiny groupby folds them, and the prefix-sum + gain scan runs on
    the driver over |features| × n_bins rows — raw rows never shuffle.

    EXACTNESS CONTRACT: ``y_col`` must be integer-valued (pre-scale
    prices to cents upstream) with |Σy| per split < 2⁵³ — partials and
    prefix sums then stay exact integers in float64, and the gain floats
    are deterministic functions of exact inputs (hash-checkable against
    a SQL window-function oracle, q144).

    Returns one row per (feature, split bin b < n_bins-1) with n_left>0
    and n_right>0: ``feature, split_bin, threshold (right-edge of b),
    n_left, n_right, gain``.
    """
    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    for f in feature_cols:
        aggs += [Min(f), Max(f)]
    mm = ds.aggregate(*aggs)
    edges = {}
    for f in feature_cols:
        vmin, vmax = float(mm[f"min({f})"]), float(mm[f"max({f})"])
        if vmax <= vmin:
            raise ValueError(f"feature {f!r} is constant — no split exists")
        edges[f] = (vmin, (vmax - vmin) / n_bins)

    def partial(df: pd.DataFrame) -> pa.Table:
        y = df[y_col].to_numpy(dtype=np.float64)
        feats, bins, ns, sums = [], [], [], []
        for f in feature_cols:
            vmin, w = edges[f]
            x = df[f].to_numpy(dtype=np.float64)
            b = np.minimum(np.floor((x - vmin) / w).astype(np.int64),
                           n_bins - 1)
            ns.append(np.bincount(b, minlength=n_bins))
            sums.append(np.bincount(b, weights=y, minlength=n_bins))
            feats.append(np.repeat(f, n_bins))
            bins.append(np.arange(n_bins, dtype=np.int64))
        return pa.table({
            "feature": pa.array(np.concatenate(feats)),
            "bin": pa.array(np.concatenate(bins)),
            "n": pa.array(np.concatenate(ns).astype(np.int64)),
            "s": pa.array(np.concatenate(sums))})

    hist = (ds.select_columns(list(feature_cols) + [y_col])
            .map_batches(partial, batch_format="pandas")
            .groupby(["feature", "bin"])
            .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
            .to_pandas())

    rows = []
    for f in feature_cols:
        h = (hist[hist["feature"] == f]
             .sort_values("bin", ignore_index=True))
        n = np.zeros(n_bins, np.int64)
        s = np.zeros(n_bins, np.float64)
        n[h["bin"].to_numpy()] = h["n"].to_numpy()
        s[h["bin"].to_numpy()] = h["s"].to_numpy()
        nl, sl = np.cumsum(n), np.cumsum(s)
        nt, st = int(nl[-1]), float(sl[-1])
        vmin, w = edges[f]
        for b in range(n_bins - 1):
            if nl[b] == 0 or nt - nl[b] == 0:
                continue
            slb, srb = float(sl[b]), st - float(sl[b])
            gain = (slb * slb / int(nl[b]) + srb * srb / (nt - int(nl[b]))
                    - st * st / nt)
            rows.append({"feature": f, "split_bin": int(b),
                         "threshold": vmin + w * (b + 1),
                         "n_left": int(nl[b]), "n_right": nt - int(nl[b]),
                         "gain": gain})
    return pd.DataFrame(rows)


def gbdt_stumps(ds: rd.Dataset, feature_cols: list[str], y_col: str,
                n_rounds: int = 10, lr: float = 0.3,
                n_bins: int = 32) -> dict:
    """Gradient-boosted depth-1 trees (stumps) on squared error — the
    histogram method end to end: boosting over
    :func:`hist_split_gains`-style bin statistics.

    Because a stump ensemble's prediction for a row depends only on
    which side of each stump the row falls, residuals are recomputable
    per batch from the broadcast model — NO per-row state is ever
    stored, and each boosting round is exactly ONE streaming
    ``map_batches`` pass emitting (feature, bin) partials (count,
    sum_residual).  The driver holds the stump list (n_rounds × 4
    floats) and picks the best (feature, bin, left/right leaf values)
    per round.  Leaf value = mean residual × lr (standard shrinkage).

    Returns ``{"stumps": [{feature, threshold, left, right}...],
    "base": float, "edges": {feature: (vmin, w)}, "train_mse":
    [per-round]}``.  Deterministic: fixed bins, full-batch statistics,
    ties break by (gain DESC, feature name, bin).
    """
    from ray.data.aggregate import Max, Mean, Min, Sum
    import ray

    aggs = [Mean(y_col)]
    for f in feature_cols:
        aggs += [Min(f), Max(f)]
    mm = ds.aggregate(*aggs)
    base = float(mm[f"mean({y_col})"])
    edges = {}
    for f in feature_cols:
        vmin, vmax = float(mm[f"min({f})"]), float(mm[f"max({f})"])
        if vmax <= vmin:
            raise ValueError(f"feature {f!r} is constant — no split exists")
        edges[f] = (vmin, (vmax - vmin) / n_bins)

    proj = ds.select_columns(list(feature_cols) + [y_col]).materialize()
    stumps: list[dict] = []
    mse: list[float] = []

    def predict_np(x_cols: dict[str, np.ndarray], model: list[dict],
                   b0: float) -> np.ndarray:
        n = len(next(iter(x_cols.values())))
        pred = np.full(n, b0)
        for s in model:
            go_left = x_cols[s["feature"]] < s["threshold"]
            pred += np.where(go_left, s["left"], s["right"])
        return pred

    for _ in range(n_rounds):
        model_ref = ray.put(list(stumps))

        def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
            model = ray.get(model_ref)
            xc = {f: df[f].to_numpy(dtype=np.float64)
                  for f in feature_cols}
            r = df[y_col].to_numpy(dtype=np.float64) \
                - predict_np(xc, model, base)
            rows = []
            for f in feature_cols:
                vmin, w = edges[f]
                b = np.minimum(np.floor((xc[f] - vmin) / w).astype(np.int64),
                               n_bins - 1)
                cnt = np.bincount(b, minlength=n_bins)
                sr = np.bincount(b, weights=r, minlength=n_bins)
                sq = float((r * r).sum())  # same for every f; divide later
                rows.append(pd.DataFrame({
                    "feature": np.repeat(f, n_bins),
                    "bin": np.arange(n_bins, dtype=np.int64),
                    "n": cnt.astype(np.int64), "s": sr,
                    "sq": np.where(np.arange(n_bins) == 0,
                                   sq / len(feature_cols), 0.0)}))
            return pd.concat(rows, ignore_index=True)

        hist = (proj.map_batches(hist_partial, batch_format="pandas")
                .groupby(["feature", "bin"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("s", alias_name="s"),
                           Sum("sq", alias_name="sq"))
                .to_pandas())

        best = None
        for f in feature_cols:
            h = hist[hist["feature"] == f].sort_values("bin",
                                                       ignore_index=True)
            n = np.zeros(n_bins, np.int64)
            s = np.zeros(n_bins, np.float64)
            n[h["bin"].to_numpy()] = h["n"].to_numpy()
            s[h["bin"].to_numpy()] = h["s"].to_numpy()
            nl, sl = np.cumsum(n), np.cumsum(s)
            nt, st = int(nl[-1]), float(sl[-1])
            for b in range(n_bins - 1):
                if nl[b] == 0 or nt - nl[b] == 0:
                    continue
                slb = float(sl[b])
                gain = (slb * slb / int(nl[b])
                        + (st - slb) ** 2 / (nt - int(nl[b])) - st * st / nt)
                key = (-gain, f, b)
                if best is None or key < best[0]:
                    vmin, w = edges[f]
                    best = (key, {
                        "feature": f, "threshold": vmin + w * (b + 1),
                        "left": lr * slb / int(nl[b]),
                        "right": lr * (st - slb) / (nt - int(nl[b]))})
        mse.append(float(hist["sq"].sum())
                   / int(hist.groupby("feature")["n"].sum().iloc[0]))
        if best is None:
            break
        stumps.append(best[1])

    return {"stumps": stumps, "base": base, "edges": edges,
            "train_mse": mse}


def gbdt_score(ds: rd.Dataset, model: dict, feature_cols: list[str],
               out_col: str = "pred") -> rd.Dataset:
    """Score with a :func:`gbdt_stumps` model — broadcast once,
    vectorized per batch."""
    import ray

    ref = ray.put({"stumps": model["stumps"], "base": model["base"]})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        pred = np.full(len(df), m["base"])
        for s in m["stumps"]:
            go_left = df[s["feature"]].to_numpy(dtype=np.float64) \
                < s["threshold"]
            pred += np.where(go_left, s["left"], s["right"])
        df = df.copy()
        df[out_col] = pred
        return df

    return ds.map_batches(score, batch_format="pandas")
