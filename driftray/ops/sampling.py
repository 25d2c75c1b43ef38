"""Deterministic hash-based sampling and dataset splitting.

At 100 TB a sample cannot come from a stateful RNG: it must be
(a) **reproducible** across re-runs and resumed partitions, (b)
**consistent** — the same key always lands in the same split, even when
the corpus grows — and (c) **coordination-free**, computable per batch
with no shared state.  Hashing the key gives all three: every operator
here is a stateless ``map_batches`` filter/labeler, so the Dataset
streams and nothing shuffles.

Two hash backends, same semantics:

* ``method="md5"`` — cross-engine verifiable: DuckDB's ``md5()``
  produces byte-identical digests, so samples/splits are checkable by a
  SQL oracle (see q37–q39 in ``pipelines/queries.py``).  ~1 M keys/s per
  core (per-row C hashlib call — the price of a standard digest).
* ``method="fast"`` — vectorized splitmix64 over int64 keys (numpy
  only, ~100 M keys/s per core) for production scale.  Same API and
  statistical behavior, not SQL-verifiable.

The sampling *decision* uses the first 8 hex chars (32 bits) of the
digest compared against a fixed-width hex threshold — lexicographic
comparison of fixed-width lowercase hex equals numeric comparison, and
DuckDB's ``substr(md5(..), 1, 8) < '<hex>'`` evaluates the identical
predicate (reference parity anchor: the reference selects per-source
subsets by fixed caps, ``/root/reference/src/data_sources/web/news.py:26``;
deterministic fractions are the scale generalization).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

_HEX_BITS = 32  # sampling decisions use the first 8 hex chars


def fraction_to_hex(fraction: float) -> str:
    """The 8-char lowercase hex threshold t such that
    P[digest[:8] < t] == fraction (up to 2**-32 quantization).  Embed the
    SAME literal in the SQL oracle so both engines evaluate one predicate."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(round(fraction * (1 << _HEX_BITS))),
                      (1 << _HEX_BITS) - 1), "08x")


def md5_hex(keys, seed: int = 42) -> np.ndarray:
    """Lowercase 32-char md5 hexdigests of ``f"{seed}:{key}"`` — identical
    to DuckDB's ``md5(CAST(seed AS VARCHAR) || ':' || CAST(key AS VARCHAR))``."""
    pre = f"{seed}:".encode()
    return np.array([hashlib.md5(pre + str(k).encode()).hexdigest()
                     for k in keys], dtype=object)


def _splitmix64(keys: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants) → uint64."""
    z = keys.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _unit_hash(keys, seed: int, method: str) -> np.ndarray:
    """Map keys to floats uniform on [0, 1) — shared by both backends."""
    if method == "md5":
        h = md5_hex(keys, seed)
        vals = np.array([int(d[:8], 16) for d in h], dtype=np.uint64)
        return vals / float(1 << _HEX_BITS)
    if method == "fast":
        k = np.asarray(keys)
        if k.dtype.kind not in "iu":
            raise TypeError("method='fast' needs integer keys; use 'md5' "
                            "for strings or pre-hash them")
        return _splitmix64(k, seed) / float(1 << 64)
    raise ValueError(f"unknown method {method!r} (want 'md5' or 'fast')")


def hash_sample(ds: rd.Dataset, key_col: str, fraction: float,
                seed: int = 42, method: str = "md5") -> rd.Dataset:
    """Keep rows whose key hashes below ``fraction`` — a deterministic,
    resume-stable Bernoulli(fraction) sample.  Pure streaming filter:
    no shuffle, no driver state, safe on any corpus size."""
    thr = fraction  # compare in unit space; md5 path quantizes identically
    if method == "md5":
        thr = int(fraction_to_hex(fraction), 16) / float(1 << _HEX_BITS)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        u = _unit_hash(b[key_col].to_numpy(), seed, method)
        return b[u < thr]

    return ds.map_batches(fn, batch_format="pandas")


def hash_split(ds: rd.Dataset, key_col: str, weights: dict[str, float],
               seed: int = 42, method: str = "md5") -> rd.Dataset:
    """Label every row with a split name (``train``/``val``/``test``…)
    by cumulative hash buckets.  Deterministic and growth-consistent: a
    key keeps its split when new data arrives.  Streaming labeler — one
    vectorized ``searchsorted`` per batch, no shuffle."""
    total = sum(weights.values())
    if not np.isclose(total, 1.0):
        raise ValueError(f"weights must sum to 1, got {total}")
    names = list(weights)
    cum = np.cumsum([weights[n] for n in names])
    if method == "md5":
        # quantize cut points exactly as the SQL oracle's hex literals do
        cum = np.array([int(fraction_to_hex(c), 16) / float(1 << _HEX_BITS)
                        for c in cum])
    cum[-1] = 1.0 + 1e-9  # the last bucket owns the top edge

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            b = b.copy()
            b["split"] = pd.Series([], dtype=str)
            return b
        u = _unit_hash(b[key_col].to_numpy(), seed, method)
        idx = np.searchsorted(cum, u, side="right")
        b = b.copy()
        b["split"] = np.array(names, dtype=object)[idx]
        return b

    return ds.map_batches(fn, batch_format="pandas")


def weighted_sample(ds: rd.Dataset, key_col: str, weight_col: str, k: int,
                    seed: int = 42, method: str = "md5",
                    columns: list[str] | None = None) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res),
    deterministic: each row gets priority ``u^(1/w)`` where ``u`` is the
    key's unit hash, and the k largest priorities win — exactly the
    classic reservoir scheme with the RNG replaced by the hash, so the
    sample is reproducible, resume-stable, and verifiable by a SQL
    oracle recomputing the identical priority (q81).

    Distributed as a streaming partial top-k: every batch keeps only its
    own k best rows (numpy argpartition — no sort, no shuffle), the
    driver merges ≤ k × n_batches tiny rows.  Inclusion probability is
    proportional to weight (per A-Res); rows with weight ≤ 0 never
    selected."""
    cols = columns or [key_col, weight_col]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = b[cols].copy()
            out["__pri"] = pd.Series([], dtype=np.float64)
            return out
        u = _unit_hash(b[key_col].to_numpy(), seed, method)
        w = b[weight_col].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
        kk = min(k, len(b))
        idx = np.argpartition(-pri, kk - 1)[:kk]
        out = b.iloc[idx][cols].copy()
        out["__pri"] = pri[idx]
        return out

    partial = ds.select_columns(cols).map_batches(
        local, batch_format="pandas").to_pandas()
    partial = partial[partial["__pri"] >= 0]
    out = (partial.sort_values(["__pri", key_col],
                               ascending=[False, True], kind="mergesort")
           .head(k).drop(columns=["__pri"]).reset_index(drop=True))
    return out


def stratified_sample_n(ds: rd.Dataset, group_col: str, key_col: str,
                        n: int, seed: int = 42,
                        columns: list[str] | None = None) -> pd.DataFrame:
    """Exactly-n-per-group deterministic sample: the n keys with the
    SMALLEST md5 digests within each group.  Rides ``grouped_top_k``'s
    partial-top-k kernel — every batch reduces to ≤ n rows per group it
    contains, so no worker materializes a group and hot groups cannot
    straggle.  The full 32-char digest orders (collision odds ~2**-128),
    making the result unique and SQL-checkable via
    ``row_number() OVER (PARTITION BY g ORDER BY md5(..), key)``."""
    from .grouped import grouped_top_k

    cols = columns or [group_col, key_col]

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy()
        b["_h"] = md5_hex(b[key_col].to_numpy(), seed)
        return b

    hashed = ds.select_columns(cols).map_batches(add_hash,
                                                 batch_format="pandas")
    out = grouped_top_k(hashed, [group_col], "_h", n, descending=False,
                        columns=cols + ["_h"])
    return out.drop(columns=["_h"]).reset_index(drop=True)


def diverse_sample(ds: rd.Dataset, id_col: str, vec_col: str,
                   n_per_cluster: int, n_clusters: int = 16,
                   seed: int = 42,
                   columns: list[str] | None = None) -> pd.DataFrame:
    """Cluster-balanced (diversity-aware) sampling over an embedding
    column — the curation move that keeps coverage of ALL embedding
    regions instead of letting a dominant mode swamp a uniform sample.

    Composition, fully distributed: k-means centroids fit on a sample
    and broadcast once, every vector assigned by one vectorized cosine
    matmul per batch (``ann.build_ivf_index``), then the deterministic
    smallest-md5-per-group pick (``stratified_sample_n`` — partial-top-k
    kernel, no per-group materialization) takes exactly
    ``n_per_cluster`` rows per cluster (fewer if a cluster is smaller).
    Deterministic given (corpus, seed)."""
    from .ann import build_ivf_index

    _, assigned = build_ivf_index(ds, n_clusters, id_col=id_col,
                                  vec_col=vec_col, seed=seed)
    if columns is not None:
        out_cols = list(dict.fromkeys(["ivf_cluster", id_col] + columns))
        keep = assigned.select_columns(out_cols)
    else:
        # embeddings are the widest column and the sample doesn't need
        # them — drop before the shuffle-side top-k
        keep = assigned.drop_columns([vec_col])
        out_cols = [c for c in keep.schema().names]
    return stratified_sample_n(keep, "ivf_cluster", id_col,
                               n_per_cluster, seed=seed,
                               columns=out_cols)


def negative_pairs(ds: rd.Dataset, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int = 4, seed: int = 42,
                   num_partitions: int | None = None) -> rd.Dataset:
    """Deterministic contrastive NEGATIVE sampling — for every anchor
    row, ``k`` pseudo-random partner rows plus the anchor-partner cosine
    (the negative-pair mining step of contrastive embedding training,
    where negatives must be reproducible across re-runs/resumes and
    verifiable — so the pick is the md5 unit-hash convention above, not
    an RNG): partner ``j`` of anchor ``a`` is
    ``u32(md5(f"{seed}:{a}:{j}")) % N``, remapped to ``(raw+1) % N``
    when it lands on ``a`` itself.  A SQL oracle recomputes identical
    picks (q182).

    Requires ids dense ``0..N-1`` (validated via one count/min/max
    aggregate — O(1) driver state).  Distributed shape: anchors explode
    to ``k`` pair rows carrying the anchor vector PACKED AS BINARY
    (tensor-extension columns do not survive exchanges — ROUND_NOTES r4),
    partner vectors attach via ONE ``hash_shuffle_join`` on the partner
    id, cosine is a vectorized float64 kernel per joined batch (rounded
    4dp, the q15/q153 convention).  Cost: one exchange shipping
    k·N·d·8 bytes of anchor vectors + the partner side — ∝ output size,
    nothing driver-side.

    Returns ``(id_col, neg_rank, neg_id, cos_sim)``, k rows per anchor."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Max, Min

    from .relational import hash_shuffle_join

    agg = ds.aggregate(Count(), Min(id_col), Max(id_col))
    n = int(agg["count()"])
    if n < 2:
        raise ValueError("negative_pairs needs >= 2 rows")
    if int(agg[f"min({id_col})"]) != 0 or int(agg[f"max({id_col})"]) != n - 1:
        raise ValueError(
            f"{id_col} must be dense 0..N-1 (got min="
            f"{agg[f'min({id_col})']}, max={agg[f'max({id_col})']}, N={n})")

    def explode(batch: pd.DataFrame) -> pa.Table:
        a = batch[id_col].to_numpy(np.int64)
        vb = [np.asarray(v, dtype=np.float64).tobytes()
              for v in batch[vec_col].to_numpy()]
        anchors, ranks, negs, avecs = [], [], [], []
        for i, aid in enumerate(a):
            for j in range(k):
                h = hashlib.md5(f"{seed}:{aid}:{j}".encode()).hexdigest()
                raw = int(h[:8], 16) % n
                negs.append((raw + 1) % n if raw == aid else raw)
                anchors.append(aid)
                ranks.append(j)
                avecs.append(vb[i])
        return pa.table({
            id_col: pa.array(anchors, pa.int64()),
            "neg_rank": pa.array(ranks, pa.int64()),
            "neg_id": pa.array(negs, pa.int64()),
            "a_vec": pa.array(avecs, pa.binary())})

    pairs = ds.select_columns([id_col, vec_col]).map_batches(
        explode, batch_format="pandas")

    def pack_right(batch: pd.DataFrame) -> pa.Table:
        return pa.table({
            "neg_id": pa.array(batch[id_col].to_numpy(np.int64)),
            "n_vec": pa.array([np.asarray(v, dtype=np.float64).tobytes()
                               for v in batch[vec_col].to_numpy()],
                              pa.binary())})

    right = ds.select_columns([id_col, vec_col]).map_batches(
        pack_right, batch_format="pandas")
    joined = hash_shuffle_join(pairs, right, on=["neg_id"],
                               num_partitions=num_partitions)

    def cos(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "neg_rank": pa.array([], pa.int64()),
                             "neg_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        A = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in batch["a_vec"]])
        B = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in batch["n_vec"]])
        num = (A * B).sum(axis=1)
        den = np.maximum(np.linalg.norm(A, axis=1)
                         * np.linalg.norm(B, axis=1), 1e-12)
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(np.int64)),
            "neg_rank": pa.array(batch["neg_rank"].to_numpy(np.int64)),
            "neg_id": pa.array(batch["neg_id"].to_numpy(np.int64)),
            "cos_sim": pa.array(np.round(num / den, 4))})

    return joined.map_batches(cos, batch_format="pandas")
