"""Distributed linear algebra over embedding columns.

Two iterative/moment algorithms a curation pipeline needs beyond ANN
(`ops/ann.py`) and diversity sampling (`ops/sampling.py`):

* **PCA** — covariance from ONE pass of per-batch moment partials
  (n, Σx, XᵀX); only d×d matrices ever leave a worker, the eigensolve is
  a driver-side `np.linalg.eigh` on the d×d covariance (d = embedding
  width, hundreds — trivially driver-sized at any corpus scale).
* **k-means (Lloyd)** — full-data iterations: each pass reduces every
  batch to k×(d+1) partial sums, merged driver-side (≈ blocks × k × d
  floats — sketch-sized, never data-sized), new centroids broadcast via
  ``ray.put``.  The sample-fit variant lives in ``ann._kmeans_fit``;
  this one is for when the sample misses small modes.

Both are deterministic given (corpus, seed) — init derives from a seeded
RNG over a hash-deterministic sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def embedding_moments(ds: rd.Dataset, vec_col: str = "embedding"):
    """One streaming pass → (n, sum, XᵀX) global moments.

    Per batch: a single matmul reduces the batch to d + d² floats
    (serialized to bytes so the tiny partial rows survive any block
    format); the driver merges ≤ #blocks such rows."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"n": pd.Series([], dtype="int64"),
                                 "d": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="object"),
                                 "ss": pd.Series([], dtype="object")})
        X = _stack(batch[vec_col].to_numpy())
        return pd.DataFrame({"n": [len(X)], "d": [X.shape[1]],
                             "s": [X.sum(axis=0).tobytes()],
                             "ss": [np.ascontiguousarray(X.T @ X).tobytes()]})

    rows = ds.select_columns([vec_col]).map_batches(
        partial, batch_format="pandas").take_all()
    rows = [r for r in rows if r["n"]]
    if not rows:
        raise ValueError("empty dataset")
    d = rows[0]["d"]
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"], dtype=np.float64) for r in rows],
               axis=0)
    ss = np.sum([np.frombuffer(r["ss"], dtype=np.float64).reshape(d, d)
                 for r in rows], axis=0)
    return n, s, ss


def embedding_pca(ds: rd.Dataset, vec_col: str = "embedding",
                  n_components: int = 2):
    """PCA of an embedding column from one distributed moment pass.

    Returns (mean[d], components[k, d], explained_variance[k]) —
    population covariance (ddof=0), eigenvectors sorted by eigenvalue
    DESC with a deterministic sign convention (largest-|x| coordinate
    positive) so results are reproducible across runs/architectures."""
    n, s, ss = embedding_moments(ds, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_transform(ds: rd.Dataset, mean: np.ndarray, components: np.ndarray,
                  vec_col: str = "embedding",
                  out_col: str = "pca") -> rd.Dataset:
    """Project every vector onto broadcast PCA components (one matmul
    per batch; mean/components ship once via ``ray.put``)."""
    ref = ray.put((np.asarray(mean), np.asarray(components)))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m, C = ray.get(ref)
        out = batch.copy()
        if len(batch) == 0:
            out[out_col] = pd.Series([], dtype="object")
            return out
        X = _stack(batch[vec_col].to_numpy())
        P = (X - m) @ C.T
        out[out_col] = list(P)
        return out

    return ds.map_batches(project, batch_format="pandas")


def kmeans_fit(ds: rd.Dataset, n_clusters: int, vec_col: str = "embedding",
               iters: int = 10, tol: float = 1e-6, seed: int = 42,
               init_sample: int = 4096):
    """Full-data Lloyd k-means over a Dataset.

    Init: seeded choice of k distinct vectors from a deterministic
    ``limit(init_sample)`` head.  Each iteration is ONE streaming pass:
    per batch, squared-distance argmin assignment + ``np.add.at``
    scatter into k×(d+1) partial sums; the driver merges the partials
    (blocks × k × d floats) and broadcasts new centroids.  Empty
    clusters keep their previous centroid.  Stops early when max
    centroid shift < ``tol``.

    Returns (centers[k, d], n_iters_run, shift_history)."""
    head = ds.select_columns([vec_col]).limit(init_sample).take_all()
    X0 = _stack([r[vec_col] for r in head])
    if len(X0) < n_clusters:
        raise ValueError("fewer vectors than clusters in the init sample")
    rng = np.random.default_rng(seed)
    centers = X0[rng.choice(len(X0), size=n_clusters, replace=False)]
    shifts = []
    vec_only = ds.select_columns([vec_col])
    for _ in range(iters):
        ref = ray.put(centers)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(ref)
            k, d = C.shape
            if len(batch) == 0:
                return pd.DataFrame({
                    "sums": pd.Series([], dtype="object"),
                    "cnts": pd.Series([], dtype="object")})
            X = _stack(batch[vec_col].to_numpy())
            d2 = ((X ** 2).sum(1)[:, None] - 2.0 * X @ C.T
                  + (C ** 2).sum(1)[None, :])
            a = d2.argmin(axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, a, X)
            cnts = np.bincount(a, minlength=k).astype(np.float64)
            return pd.DataFrame({"sums": [sums.tobytes()],
                                 "cnts": [cnts.tobytes()]})

        rows = vec_only.map_batches(partial, batch_format="pandas").take_all()
        k, d = centers.shape
        sums = np.sum([np.frombuffer(r["sums"]).reshape(k, d)
                       for r in rows], axis=0)
        cnts = np.sum([np.frombuffer(r["cnts"]) for r in rows], axis=0)
        new = centers.copy()
        nz = cnts > 0
        new[nz] = sums[nz] / cnts[nz, None]
        shift = float(np.abs(new - centers).max())
        shifts.append(shift)
        centers = new
        if shift < tol:
            break
    return centers, len(shifts), shifts


def kmeans_assign(ds: rd.Dataset, centers: np.ndarray,
                  vec_col: str = "embedding",
                  out_col: str = "cluster") -> rd.Dataset:
    """Assign every vector to its nearest (Euclidean) broadcast centroid."""
    ref = ray.put(np.asarray(centers))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(ref)
        out = batch.copy()
        if len(batch) == 0:
            out[out_col] = pd.Series([], dtype="int64")
            return out
        X = _stack(batch[vec_col].to_numpy())
        d2 = ((X ** 2).sum(1)[:, None] - 2.0 * X @ C.T
              + (C ** 2).sum(1)[None, :])
        out[out_col] = d2.argmin(axis=1).astype(np.int64)
        return out

    return ds.map_batches(assign, batch_format="pandas")
