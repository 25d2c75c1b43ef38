"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — the exact baseline: the (small) query matrix is
  broadcast once via ``ray.put``; every batch computes a vectorized
  ``batch @ Q.T`` and emits only its LOCAL top-k per query; a tiny driver
  merge finishes.  Cost per batch is one BLAS matmul — the Dataset streams,
  nothing materializes.
* ``ivf_topk`` — the scale path: k-means centroids are fit on a driver-side
  sample, broadcast, and every vector is assigned a cluster id in one
  ``map_batches`` pass (writable as a partitioned index).  A query probes
  only the ``nprobe`` nearest clusters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from .pool import actor_pool


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     metric: str = "cosine", batch_size: int = 8192,
                     mask_col: str | None = None,
                     query_mask: np.ndarray | None = None) -> pa.Table:
    """Exact top-k per query row.  Returns (query_id, vec_id, score) sorted
    by (query_id, score desc, vec_id).

    ``mask_col``/``query_mask`` restrict which vectors compete for which
    queries (IVF semantics): ``query_mask`` is a boolean (n_groups, q)
    matrix — broadcast once via ``ray.put`` — and a vector with group id
    ``g`` (its ``mask_col`` value) only scores for queries where
    ``query_mask[g, qi]`` is True.  Masked scores never reach the merge."""
    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if metric == "cosine":
        Q = _normalize(Q)
    q_ref = ray.put(Q)
    m_ref = ray.put(query_mask) if query_mask is not None else None

    class Scorer:
        def __init__(self):
            self.Q = ray.get(q_ref)
            self.M = ray.get(m_ref) if m_ref is not None else None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:     # filters upstream can emit empty blocks
                return pd.DataFrame({"query_id": np.array([], dtype=np.int64),
                                     id_col: batch[id_col],
                                     "score": np.array([], dtype=np.float64)})
            X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            if metric == "cosine":
                X = _normalize(X)
            sims = X @ self.Q.T                      # (n, q)
            if self.M is not None:
                # hive-inferred partition values arrive as strings
                g = batch[mask_col].to_numpy()
                if g.dtype.kind not in "iu":
                    g = g.astype(np.int64)
                allowed = self.M[g]                           # (n, q)
                sims = np.where(allowed, sims, -np.inf)
            n, q = sims.shape
            kk = min(k, n)
            # local top-k per query, vectorized argpartition + gather
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]   # (k, q)
            ids = batch[id_col].to_numpy()
            qcol = np.repeat(np.arange(q), kk)
            icol = ids[idx].T.ravel()
            scol = np.take_along_axis(sims, idx, axis=0).T.ravel()
            out = pd.DataFrame({"query_id": qcol, id_col: icol, "score": scol})
            if self.M is not None:
                out = out[np.isfinite(out["score"].to_numpy())]
            return out

    cols = [id_col, vec_col] + ([mask_col] if mask_col else [])
    local = ds.select_columns(cols).map_batches(
        Scorer, batch_format="pandas", batch_size=batch_size, concurrency=actor_pool())
    pdf = local.to_pandas()  # ≤ k × q × n_batches rows — tiny
    pdf = (pdf.sort_values(["query_id", "score", id_col],
                           ascending=[True, False, True], kind="stable")
           .groupby("query_id", sort=True).head(k).reset_index(drop=True))
    return pa.Table.from_pandas(pdf, preserve_index=False)


def _kmeans_fit(X: np.ndarray, n_clusters: int, iters: int = 10,
                seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centers)):
            members = X[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


def _fit_ivf_centers(ds: rd.Dataset, n_clusters: int, vec_col: str,
                     sample_rows: int, seed: int) -> np.ndarray:
    sample = ds.select_columns([vec_col]).limit(sample_rows).to_pandas()
    X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    return _normalize(_kmeans_fit(X, n_clusters, seed=seed))


def _assign_clusters(ds: rd.Dataset, centers: np.ndarray, vec_col: str,
                     batch_size: int,
                     keep_clusters: frozenset[int] | None = None) -> rd.Dataset:
    """Attach ``ivf_cluster`` per row.  With ``keep_clusters``, rows of
    other clusters are DROPPED inside the same pass — they never leave the
    assign stage, so a probe ships/scores only the probed partitions."""
    c_ref = ray.put(centers)

    class Assign:
        def __init__(self):
            self.centers = ray.get(c_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                batch["ivf_cluster"] = np.array([], dtype=np.int64)
                return batch
            V = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            cid = (V @ self.centers.T).argmax(axis=1).astype(np.int64)
            batch["ivf_cluster"] = cid
            if keep_clusters is not None:
                batch = batch[np.isin(cid, list(keep_clusters))]
            return batch

    return ds.map_batches(Assign, batch_format="pandas",
                          batch_size=batch_size, concurrency=actor_pool())


def build_ivf_index(ds: rd.Dataset, n_clusters: int = 16, id_col: str = "vec_id",
                    vec_col: str = "embedding", sample_rows: int = 10_000,
                    seed: int = 42, batch_size: int = 8192):
    """Fit centroids on a sample, assign every vector a cluster id.

    Returns (centers, assigned_ds) where assigned_ds carries an extra
    ``ivf_cluster`` column — at scale this is written as partitioned
    Parquet (one directory per cluster) and probed selectively."""
    centers = _fit_ivf_centers(ds, n_clusters, vec_col, sample_rows, seed)
    assigned = _assign_clusters(ds, centers, vec_col, batch_size)
    return centers, assigned


def write_ivf_index(ds: rd.Dataset, index_dir: str, n_clusters: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    sample_rows: int = 10_000, seed: int = 42,
                    batch_size: int = 8192) -> np.ndarray:
    """Persist the IVF index as PARTITIONED Parquet: one hive directory per
    cluster (``ivf_cluster=N/``) plus the centroid matrix as a
    ``_centroids.npy`` sidecar (underscore-prefixed → ignored by dataset
    discovery).  At scale a probe then reads ONLY the probed directories —
    partition pruning, not a post-hoc filter."""
    import os

    centers, assigned = build_ivf_index(ds, n_clusters, id_col, vec_col,
                                        sample_rows, seed, batch_size)
    assigned.write_parquet(index_dir, partition_cols=["ivf_cluster"])
    np.save(os.path.join(index_dir, "_centroids.npy"), centers)
    return centers


def ivf_query_index(index_dir: str, queries: np.ndarray, k: int = 10,
                    nprobe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pa.Table:
    """Query a persisted IVF index: pick the ``nprobe`` nearest centroids
    per query, then ``read_parquet`` with a partition-column filter so only
    those cluster DIRECTORIES are scanned (~nprobe/n_clusters of the
    corpus leaves storage)."""
    import os

    import pyarrow.compute as pc

    centers = np.load(os.path.join(index_dir, "_centroids.npy"))
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(Q @ centers.T), axis=1)[:, :nprobe]
    wanted = sorted(int(c) for c in np.unique(probe))
    # PATH-level pruning: only the probed cluster directories' files are
    # listed — un-probed partitions never produce read tasks at all
    import glob as _glob

    paths = [f for c in wanted
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"ivf_cluster={c}", "*.parquet")))]
    if not paths:
        # every probed centroid ended up empty (degenerate k-means sample)
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    # hive-partition inference recovers ``ivf_cluster`` from the paths, so
    # the per-query probe mask can apply inside the scorer
    pruned = rd.read_parquet(paths)
    mask = np.zeros((len(centers), len(Q)), dtype=bool)             # (c, q)
    for qi in range(len(Q)):
        mask[probe[qi], qi] = True
    return brute_force_topk(pruned, Q, k=k, id_col=id_col, vec_col=vec_col,
                            mask_col="ivf_cluster", query_mask=mask)


def lsh_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
             n_tables: int = 16, n_bits: int = 8, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             batch_size: int = 8192) -> pa.Table:
    """Random-hyperplane LSH ANN — the hash-bucketed scale path beside
    ``ivf_topk`` (SURVEY "similarity search": brute-force baseline + a
    bucketed variant).

    ``n_tables`` independent tables of ``n_bits`` signed random
    projections each; a vector is a CANDIDATE for a query iff they share
    a bucket in at least one table.  The query buckets (a few hundred
    64-bit keys) broadcast once via ``ray.put`` as a sorted array + CSR
    (offsets, query-index) map; each batch computes its vectors' buckets
    with two matmuls + packbits, finds collisions with one
    ``searchsorted``, scores ONLY colliding (vector, query) cells, and
    emits its local top-k.  Per-batch cost beyond the brute baseline is
    O(n × n_tables × n_bits) projection flops; the scored-cell count —
    the expensive part at scale — drops to the collision density.
    Recall is tunable (more tables ↑recall, more bits ↓candidates);
    tolerance-tested vs ``brute_force_topk`` in the suite."""
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    nq, dim = Q.shape
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_tables, n_bits, dim))          # hyperplanes
    pows = (1 << np.arange(n_bits, dtype=np.int64))

    def buckets(X: np.ndarray) -> np.ndarray:
        """(n, dim) → (n, n_tables) int64 keys = (table << n_bits) | bits."""
        bits = np.einsum("nd,tbd->ntb", X, H) > 0             # (n, t, b)
        codes = bits.astype(np.int64) @ pows                  # (n, t)
        return codes + (np.arange(n_tables, dtype=np.int64) << n_bits)

    qkeys = buckets(Q)                                        # (q, t)
    flat = qkeys.T.ravel()
    order = np.argsort(flat, kind="stable")
    skeys = flat[order]
    sqidx = np.tile(np.arange(nq, dtype=np.int64), n_tables)[order]
    # collapse duplicate keys into CSR runs so the probe is one searchsorted
    ukeys, starts = np.unique(skeys, return_index=True)
    offsets = np.append(starts, len(skeys))
    bcast = ray.put((ukeys, offsets, sqidx, Q))

    class Scorer:
        def __init__(self):
            self.ukeys, self.offsets, self.sqidx, self.Q = ray.get(bcast)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"query_id": np.array([], dtype=np.int64),
                                  id_col: np.array([], dtype=np.int64),
                                  "score": np.array([], dtype=np.float64)})
            if len(batch) == 0:
                return empty
            X = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            vkeys = buckets(X)                                # (n, t)
            pos = np.searchsorted(self.ukeys, vkeys)
            pos = np.clip(pos, 0, len(self.ukeys) - 1)
            hit = self.ukeys[pos] == vkeys                    # (n, t)
            rows, tabs = np.nonzero(hit)
            if len(rows) == 0:
                return empty
            allowed = np.zeros((len(batch), len(self.Q)), dtype=bool)
            for r, p in zip(rows, pos[rows, tabs]):
                allowed[r, self.sqidx[self.offsets[p]:self.offsets[p + 1]]] = True
            cand = allowed.any(axis=1)
            sims = np.where(allowed[cand], X[cand] @ self.Q.T, -np.inf)
            n, q = sims.shape
            kk = min(k, n)
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            ids = batch[id_col].to_numpy()[cand]
            out = pd.DataFrame({
                "query_id": np.repeat(np.arange(q), kk),
                id_col: ids[idx].T.ravel(),
                "score": np.take_along_axis(sims, idx, axis=0).T.ravel()})
            return out[np.isfinite(out["score"].to_numpy())]

    local = ds.select_columns([id_col, vec_col]).map_batches(
        Scorer, batch_format="pandas", batch_size=batch_size,
        concurrency=actor_pool())
    pdf = local.to_pandas()  # ≤ k × q × n_batches rows — tiny
    pdf = (pdf.sort_values(["query_id", "score", id_col],
                           ascending=[True, False, True], kind="stable")
           .groupby("query_id", sort=True).head(k).reset_index(drop=True))
    return pa.Table.from_pandas(pdf, preserve_index=False)


def ivf_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42,
             index_dir: str | None = None,
             batch_size: int = 8192) -> pa.Table:
    """IVF ANN: probe only the ``nprobe`` clusters nearest each query —
    scans ~nprobe/n_clusters of the corpus instead of all of it.  True
    IVF semantics: a vector competes ONLY for queries that probe its
    cluster (per-query boolean mask applied inside the scorer), not a
    post-hoc filter — un-probed (vector, query) scores are never
    computed into the merge.

    Two pruning tiers:

    * ``index_dir=None`` (one-shot): unprobed rows are dropped INSIDE the
      assign pass (``_assign_clusters(keep_clusters=...)``) — they never
      leave that stage, so the scorer receives only probed-cluster rows.
      One full scan is inherent (every vector must be assigned once).
    * ``index_dir=path`` (write-through): the assignment is persisted as
      hive-partitioned Parquet once and the probe reads ONLY the probed
      cluster directories (path-level pruning — unprobed partitions
      produce zero read tasks).  The index stays on disk for reuse; repeat
      probes pay no assignment scan at all."""
    if index_dir is not None:
        import os
        if not os.path.exists(os.path.join(index_dir, "_centroids.npy")):
            write_ivf_index(ds, index_dir, n_clusters, id_col, vec_col,
                            seed=seed, batch_size=batch_size)
        return ivf_query_index(index_dir, queries, k=k, nprobe=nprobe,
                               id_col=id_col, vec_col=vec_col)

    centers = _fit_ivf_centers(ds, n_clusters, vec_col, 10_000, seed)
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(Q @ centers.T), axis=1)[:, :nprobe]        # (q, nprobe)
    wanted = frozenset(int(c) for c in np.unique(probe))
    pruned = _assign_clusters(ds, centers, vec_col, batch_size,
                              keep_clusters=wanted)
    mask = np.zeros((len(centers), len(Q)), dtype=bool)             # (c, q)
    for qi in range(len(Q)):
        mask[probe[qi], qi] = True
    return brute_force_topk(pruned, Q, k=k, id_col=id_col, vec_col=vec_col,
                            mask_col="ivf_cluster", query_mask=mask)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the MEMORY scale path for vector search: a
# d-dim float32 vector compresses to m uint8 codes (d·4 → m bytes, e.g.
# 32× at d=64, m=8), and queries score against codes via an
# asymmetric-distance lookup table (ADC) without ever touching the
# original vectors.  Train = m independent tiny k-means (driver-side over
# a sample, like IVF); encode + score are streaming map_batches passes.
# ---------------------------------------------------------------------------


def pq_train(ds: rd.Dataset, m: int = 8, n_codes: int = 32,
             vec_col: str = "embedding", sample_rows: int = 4096,
             seed: int = 42, metric: str = "cosine") -> dict:
    """Train PQ codebooks: split dimensions into ``m`` contiguous
    subspaces, k-means each over a sample (vectors normalized first for
    cosine — L2-over-normalized is monotone with cosine similarity).

    Returns ``{"codebooks": (m, n_codes, d//m) float64, "m", "n_codes",
    "metric"}``.  Driver cost ∝ sample, independent of corpus size.
    """
    if not 1 <= n_codes <= 256:
        raise ValueError(
            f"n_codes={n_codes} out of range: PQ code ids are stored as "
            "uint8, so 1 <= n_codes <= 256")
    sample = ds.select_columns([vec_col]).limit(sample_rows).to_pandas()
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    if metric == "cosine":
        X = _normalize(X)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds_sub = d // m

    # the m subspace fits are independent — run them as parallel Ray
    # tasks (same seeds, byte-identical result; 24.1 s -> ~4 s at a
    # 32 k sample with 64 codes on 32 CPUs)
    @ray.remote
    def fit(sub: np.ndarray, s: int) -> np.ndarray:
        cb = _kmeans_fit(sub.copy(), n_codes, seed=s)
        # pad deterministic rows if the sample had < n_codes points
        if len(cb) < n_codes:
            cb = np.vstack([cb,
                            np.repeat(cb[:1], n_codes - len(cb), axis=0)])
        return cb

    refs = [fit.remote(X[:, j * ds_sub:(j + 1) * ds_sub], seed + j)
            for j in range(m)]
    books = np.stack(ray.get(refs))
    return {"codebooks": books, "m": m, "n_codes": n_codes, "metric": metric}


def pq_encode(ds: rd.Dataset, model: dict, id_col: str = "vec_id",
              vec_col: str = "embedding",
              code_col: str = "pq_code") -> rd.Dataset:
    """Encode vectors to m-byte PQ codes (``pa.binary`` — m uint8 code
    ids per row).  Codebooks broadcast once; one streaming pass."""
    books_ref = ray.put(model["codebooks"])
    metric = model["metric"]

    def encode(batch: pd.DataFrame) -> pa.Table:
        books = ray.get(books_ref)                    # (m, K, ds)
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             code_col: pa.array([], pa.binary())})
        X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        if metric == "cosine":
            X = _normalize(X)
        m, K, ds_sub = books.shape
        codes = np.zeros((len(X), m), dtype=np.uint8)
        for j in range(m):
            sub = X[:, j * ds_sub:(j + 1) * ds_sub]           # (n, ds)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (-2.0 * sub @ books[j].T
                  + (books[j] ** 2).sum(axis=1)[None, :])     # (n, K)
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pa.table({id_col: pa.array(batch[id_col].to_numpy()),
                         code_col: pa.array([c.tobytes() for c in codes],
                                            pa.binary())})

    return ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pandas")


def pq_topk(codes: rd.Dataset, model: dict, queries: np.ndarray,
            k: int = 10, id_col: str = "vec_id",
            code_col: str = "pq_code") -> pa.Table:
    """Approximate top-k via asymmetric distance (ADC): per query, a
    (m, n_codes) lookup table of sub-distances broadcasts once; scoring a
    code row is m table gathers + a sum — the original vectors are never
    read.  Score = -||q - decode(code)||² (monotone with cosine for
    normalized training).  Returns (query_id, vec_id, score) like
    :func:`brute_force_topk`."""
    books = model["codebooks"]                        # (m, K, ds)
    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if model["metric"] == "cosine":
        Q = _normalize(Q)
    m, K, ds_sub = books.shape
    nq = len(Q)
    lut = np.zeros((nq, m, K))
    for j in range(m):
        qs = Q[:, j * ds_sub:(j + 1) * ds_sub]        # (q, ds)
        diff = qs[:, None, :] - books[j][None, :, :]  # (q, K, ds)
        lut[:, j, :] = (diff ** 2).sum(axis=2)
    lut_ref = ray.put(lut)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        L = ray.get(lut_ref)                          # (q, m, K)
        if len(batch) == 0:
            return pd.DataFrame({"query_id": np.array([], dtype=np.int64),
                                 id_col: batch[id_col],
                                 "score": np.array([], dtype=np.float64)})
        C = np.frombuffer(b"".join(batch[code_col]),
                          dtype=np.uint8).reshape(len(batch), m)
        # dist[n, q] = Σ_j L[q, j, C[n, j]] — one take per subspace
        dist = np.zeros((len(C), L.shape[0]))
        for j in range(m):
            dist += L[:, j, :][:, C[:, j]].T          # (n, q)
        sims = -dist
        n, q = sims.shape
        kk = min(k, n)
        idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        ids = batch[id_col].to_numpy()
        return pd.DataFrame({
            "query_id": np.repeat(np.arange(q), kk),
            id_col: ids[idx].T.ravel(),
            "score": np.take_along_axis(sims, idx, axis=0).T.ravel()})

    local = codes.map_batches(score, batch_format="pandas")
    pdf = local.to_pandas()
    pdf = (pdf.sort_values(["query_id", "score", id_col],
                           ascending=[True, False, True], kind="stable")
           .groupby("query_id", sort=True).head(k).reset_index(drop=True))
    return pa.Table.from_pandas(pdf, preserve_index=False)


def pq_topk_rerank(ds: rd.Dataset, codes: rd.Dataset, model: dict,
                   queries: np.ndarray, k: int = 10, rerank: int = 100,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pa.Table:
    """The production PQ design: ADC over the m-byte codes selects
    ``rerank`` coarse candidates per query (cheap — codes only), then ONE
    filtered pass over the original vectors exact-scores just those
    candidates.  Recall ≈ exact at a fraction of the float traffic; the
    candidate id set (q × rerank ids) broadcasts via ``ray.put``."""
    coarse = pq_topk(codes, model, queries, k=rerank,
                     id_col=id_col).to_pandas()
    cand = np.unique(coarse[id_col].to_numpy())
    cand_ref = ray.put(cand)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, ray.get(cand_ref))
        return batch.filter(pa.array(mask))

    pruned = ds.select_columns([id_col, vec_col]).map_batches(
        keep, batch_format="pyarrow")
    return brute_force_topk(pruned, queries, k=k, id_col=id_col,
                            vec_col=vec_col)


def knn_join(left: rd.Dataset, right: rd.Dataset, k: int = 10,
             left_id_col: str = "vec_id", right_id_col: str = "vec_id",
             vec_col: str = "embedding", n_clusters: int = 16,
             nprobe: int = 2, sample_rows: int = 20_000, seed: int = 42,
             num_partitions: int = 64,
             batch_size: int = 4096) -> rd.Dataset:
    """Distributed kNN JOIN: for every LEFT vector, the top-k RIGHT
    vectors by cosine similarity — both sides are Datasets, neither is
    broadcast.  This is the shape when the query set itself is corpus
    scale (retrieval-pair mining, cross-corpus nearest-neighbor audits),
    where ``brute_force_topk``'s driver-side query matrix cannot apply.

    Shape (IVF blocking, never all-pairs): k-means centroids fit on a
    seeded sample of RIGHT → broadcast once via ``ray.put``; one
    ``map_batches`` pass per side assigns RIGHT rows to their nearest
    centroid and replicates each LEFT row to its ``nprobe`` nearest
    centroids; ONE hash exchange co-locates each cluster's left and
    right rows (`grouped.partitioned_group_apply`); each partition runs
    one BLAS matmul + vectorized local top-k PER CLUSTER; a second tiny
    exchange (≤ nprobe·k candidate rows per query) merges global top-k.
    Vectors cross the exchange as explicit ``binary`` (tensor-extension
    columns do not survive map_groups' pandas conversion — ROUND_NOTES
    r4 gotcha).

    ``nprobe = n_clusters`` probes everything: exact brute force through
    the distributed machinery regardless of what the seeded k-means
    converged to (q188's hash-oracle regime); smaller ``nprobe`` trades
    recall for a ∝ nprobe/n_clusters cut in matmul + shuffle volume.
    Partitioning assumption: one cluster's (left + right) rows fit in a
    worker heap — raise ``n_clusters`` as corpus size grows (the IVF
    knob), and keep E[cluster size]² bounded.

    Returns one row per (query, rank): ``(query_id, neighbor_id, score,
    rank)`` with rank 1..k by (score desc, neighbor_id asc) — queries
    whose probed clusters hold fewer than k right rows return fewer.
    """
    from .grouped import partitioned_group_apply

    if nprobe > n_clusters:
        raise ValueError(f"nprobe={nprobe} exceeds n_clusters={n_clusters}")
    C = _fit_ivf_centers(right, n_clusters, vec_col, sample_rows, seed)
    c_ref = ray.put(C)

    def _tag(batch: pd.DataFrame, id_col: str, side: int,
             probes: int) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8()),
                             "rid": pa.array([], pa.int64()),
                             "vecb": pa.array([], pa.binary())})
        Cb = ray.get(c_ref)
        X = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = X @ Cb.T                               # (n, n_clusters)
        if probes == 1:
            cl = sims.argmax(axis=1)[:, None]
        else:
            cl = np.argpartition(-sims, probes - 1, axis=1)[:, :probes]
        n, p = cl.shape
        ids = np.repeat(batch[id_col].to_numpy().astype(np.int64), p)
        vecb = [x.tobytes() for x in X]
        return pa.table({
            "cluster": pa.array(cl.ravel().astype(np.int64)),
            "side": pa.array(np.full(n * p, side, dtype=np.int8)),
            "rid": pa.array(ids),
            "vecb": pa.array(np.repeat(np.array(vecb, dtype=object), p)
                             .tolist(), pa.binary())})

    lt = left.select_columns([left_id_col, vec_col]).map_batches(
        lambda b: _tag(b, left_id_col, 1, nprobe),
        batch_format="pandas", batch_size=batch_size)
    rt = right.select_columns([right_id_col, vec_col]).map_batches(
        lambda b: _tag(b, right_id_col, 0, 1),
        batch_format="pandas", batch_size=batch_size)

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("cluster", sort=False):
            L = grp[grp["side"] == 1]
            R = grp[grp["side"] == 0]
            if len(L) == 0 or len(R) == 0:
                continue
            XL = np.stack([np.frombuffer(b, dtype=np.float64)
                           for b in L["vecb"]])
            XR = np.stack([np.frombuffer(b, dtype=np.float64)
                           for b in R["vecb"]])
            sims = XL @ XR.T                          # (l, r)
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            outs.append(pd.DataFrame({
                "query_id": np.repeat(L["rid"].to_numpy(), kk),
                "neighbor_id": R["rid"].to_numpy()[idx].ravel(),
                "score": np.take_along_axis(sims, idx, axis=1).ravel()}))
        if not outs:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    cands = partitioned_group_apply(
        lt.union(rt), ["cluster"], per_cluster,
        num_partitions=min(num_partitions, max(n_clusters, 1)))

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df["rank"] = pd.Series([], dtype="int64")
            return df
        # a query probed into p clusters holds ≤ p·k candidate rows here;
        # exact duplicates (same neighbor reached via two probes) cannot
        # occur because a right row lives in exactly one cluster
        df = (df.sort_values(["query_id", "score", "neighbor_id"],
                             ascending=[True, False, True], kind="stable")
              .groupby("query_id", sort=False).head(k)
              .reset_index(drop=True))
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    return partitioned_group_apply(cands, ["query_id"], merge_topk,
                                   num_partitions=num_partitions)
