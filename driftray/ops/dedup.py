"""Deduplication operators for training-data pipelines.

Five strategies over a text/embedding corpus, each Ray-Data-first:

* exact        — content-hash shuffle + keep-first (D2/D3 semantics).
* MinHash+LSH  — shingle → minhash signature → banded LSH buckets via
                 ``groupby``; candidate pairs verified by signature-estimated
                 Jaccard; clusters via driver union-find over the (small)
                 candidate-pair set.
* SimHash      — 64-bit weighted-bit-vote fingerprint; banded buckets;
                 Hamming-distance verification.
* n-gram Jaccard — exact character-n-gram Jaccard verification over LSH
                 candidates (the exact counterpart of the MinHash estimate).
* embedding cosine — random-hyperplane LSH buckets over normalized vectors;
                 within-bucket cosine verification.

Partitioning assumption (documented per task brief): candidate PAIRS are
rare relative to the corpus (bands/bits sized so buckets stay small), so
pair verification + union-find run on the driver over a set that is orders
of magnitude smaller than the input.  The heavy work — shingling, hashing,
signatures — is embarrassingly parallel in ``map_batches``; the only
shuffle is the bucket groupby, keyed on (band, band_hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..sketches import hash64

_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64)."""
    words = text.split()
    if len(words) < k:
        return hash64(np.array([" ".join(words)], dtype=object))
    sh = np.array([" ".join(words[i:i + k]) for i in range(len(words) - k + 1)],
                  dtype=object)
    return hash64(sh)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """map_batches stage: text → (doc_id, 128×uint64 signature).  Permutation
    params are built once per actor."""

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128,
                 shingle_k: int = 3, seed: int = 42):
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.k = shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text or "", self.k)
        # universal-hash family h_i(x) = a_i*x + b_i (mod 2^64), min per perm
        vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def _shingle_strings(self, text: str) -> list[str]:
        words = (text or "").split()
        if not words:
            return [""]
        if len(words) < self.k:
            return [" ".join(words)]
        return [" ".join(words[i:i + self.k]) for i in range(len(words) - self.k + 1)]

    def batch_signatures(self, texts) -> np.ndarray:
        """Vectorized path: ONE hash_array call over every shingle in the
        batch, then per-doc segment minima via ``np.minimum.reduceat`` —
        avoids the per-document Python/hash-call overhead that dominates
        small-doc corpora."""
        all_sh: list[str] = []
        offsets = [0]
        for t in texts:
            all_sh.extend(self._shingle_strings(t))
            offsets.append(len(all_sh))
        h = hash64(np.array(all_sh, dtype=object))
        n_docs, m = len(texts), self.num_perm
        sigs = np.empty((n_docs, m), dtype=np.uint64)
        starts = np.array(offsets[:-1])
        # chunk the (shingles × perms) product to bound memory at ~64 MB
        chunk = max(1, (8 << 20) // m)
        done = 0
        while done < n_docs:
            hi = done
            while hi < n_docs and offsets[hi + 1] - offsets[done] <= chunk:
                hi += 1
            hi = max(hi, done + 1)
            seg = h[offsets[done]:offsets[hi]]
            vals = seg[:, None] * self.a[None, :] + self.b[None, :]
            idx = starts[done:hi] - offsets[done]
            sigs[done:hi] = np.minimum.reduceat(vals, idx, axis=0)
            done = hi
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.batch_signatures(batch[self.text_col].tolist())
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy()})
        out["sig"] = list(sigs)
        return out


def _band_rows(sig_df: pd.DataFrame, id_col: str, num_bands: int) -> pd.DataFrame:
    """Explode signatures to (band, band_hash, id) rows for the LSH groupby."""
    sigs = np.stack(sig_df["sig"].to_numpy())
    n, m = sigs.shape
    r = m // num_bands
    rows = {"band": [], "band_hash": [], id_col: []}
    ids = sig_df[id_col].to_numpy()
    for b in range(num_bands):
        chunk = sigs[:, b * r:(b + 1) * r]
        # fold the band's r values into one uint64 bucket key
        h = np.zeros(n, dtype=np.uint64)
        for j in range(r):
            h = h * np.uint64(1099511628211) + chunk[:, j]
        rows["band"].extend([b] * n)
        rows["band_hash"].extend(h.tolist())
        rows[id_col].extend(ids.tolist())
    return pd.DataFrame({"band": np.array(rows["band"], dtype=np.int64),
                         "band_hash": np.array(rows["band_hash"], dtype=np.uint64).astype(np.int64),
                         id_col: rows[id_col]})


def _candidate_pairs_from_buckets(bucket_df: pd.DataFrame, id_col: str,
                                  max_bucket: int = 200) -> set[tuple]:
    """Pairs sharing any LSH bucket.

    Vectorized: lexsort on (band, band_hash), find equal-key runs, pair up
    only within runs of length ≥ 2 (rare by construction) — iterating every
    singleton bucket in Python would dominate the whole dedup at corpus
    scale.  Buckets larger than ``max_bucket`` are truncated (salt upstream
    if this ever triggers)."""
    band = bucket_df["band"].to_numpy()
    bh = bucket_df["band_hash"].to_numpy()
    ids = bucket_df[id_col].to_numpy()
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    new_run = np.empty(len(band), dtype=bool)
    new_run[0] = True
    new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(band))
    pairs: set[tuple] = set()
    multi = np.flatnonzero(ends - starts >= 2)   # only non-singleton buckets
    for ri in multi:
        s, e = starts[ri], ends[ri]
        members = np.unique(ids[s:e])[:max_bucket]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def _union_find_clusters(ids, pairs) -> dict:
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def minhash_lsh_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 128,
                      num_bands: int = 32, shingle_k: int = 3,
                      jaccard_threshold: float = 0.8,
                      batch_size: int = 2048) -> pa.Table:
    """Near-duplicate clustering: returns (id, cluster_id, is_duplicate).

    Pipeline: map_batches(MinHasher) → band explode → groupby buckets →
    candidate pairs → signature-Jaccard verification ≥ threshold →
    union-find → cluster table.  cluster_id = min id in the cluster;
    is_duplicate marks every member beyond the representative."""
    # stateless tasks (not an actor pool): the hasher's state is just the
    # 2 KB permutation table — tasks scale elastically with no pool ramp-up
    hasher = MinHasher(id_col, text_col, num_perm, shingle_k)
    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        hasher, batch_format="pandas", batch_size=batch_size)
    sig_df = sig_ds.to_pandas()  # (id, signature) — 1 KB/row, ≪ corpus
    band_df = _band_rows(sig_df, id_col, num_bands)
    pairs = _candidate_pairs_from_buckets(band_df, id_col)

    sigs = {i: s for i, s in zip(sig_df[id_col], sig_df["sig"])}
    verified = set()
    for a, b in pairs:
        est = float((sigs[a] == sigs[b]).mean())
        if est >= jaccard_threshold:
            verified.add((a, b))
    ids = sorted(sigs)
    clusters = _union_find_clusters(ids, verified)
    sizes: dict = {}
    for i in ids:
        sizes[clusters[i]] = sizes.get(clusters[i], 0) + 1
    return pa.table({
        id_col: pa.array(ids),
        "cluster_id": pa.array([clusters[i] for i in ids]),
        "is_duplicate": pa.array([clusters[i] != i for i in ids]),
        "cluster_size": pa.array([sizes[clusters[i]] for i in ids]),
    })


class SimHasher:
    """64-bit SimHash: token hashes vote per bit weighted by count."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col = id_col
        self.text_col = text_col
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words, counts = np.unique((text or "").split(), return_counts=True)
        if words.size == 0:
            return 0
        h = hash64(words.astype(object))
        bits = ((h[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (counts[:, None] * (2 * bits - 1)).sum(axis=0)
        return int(((votes > 0).astype(np.uint64) << self.bit_idx).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "simhash": np.array([self.simhash(t) for t in batch[self.text_col]],
                                dtype=np.uint64).astype(np.int64),
        })


def simhash_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, batch_size: int = 2048) -> pa.Table:
    """SimHash near-dup clustering: 4×16-bit band buckets guarantee that any
    pair within Hamming distance ≤ 3 shares ≥ 1 band (pigeonhole); verified
    by exact popcount, clustered by union-find."""
    sh = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher(id_col, text_col),
        batch_format="pandas", batch_size=batch_size).to_pandas()
    hashes = sh["simhash"].to_numpy().astype(np.uint64)
    ids = sh[id_col].to_numpy()
    rows = []
    for band in range(4):
        keys = (hashes >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        rows.append(pd.DataFrame({"band": band, "band_hash": keys.astype(np.int64),
                                  id_col: ids}))
    pairs = _candidate_pairs_from_buckets(pd.concat(rows), id_col)
    hmap = dict(zip(ids, hashes))
    verified = {(a, b) for a, b in pairs
                if bin(int(hmap[a]) ^ int(hmap[b])).count("1") <= max_hamming}
    clusters = _union_find_clusters(sorted(hmap), verified)
    out_ids = sorted(hmap)
    return pa.table({
        id_col: pa.array(out_ids),
        "cluster_id": pa.array([clusters[i] for i in out_ids]),
        "is_duplicate": pa.array([clusters[i] != i for i in out_ids]),
    })


def ngram_jaccard_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", ngram: int = 8,
                        threshold: float = 0.7, num_perm: int = 128,
                        num_bands: int = 16, batch_size: int = 2048) -> pa.Table:
    """Exact character-n-gram Jaccard dedup: MinHash-LSH proposes candidate
    pairs, then EXACT n-gram-set Jaccard verifies (only candidate texts are
    fetched — the full corpus never gathers to one place)."""

    class CharMinHasher(MinHasher):
        def _shingle_strings(self, text: str) -> list[str]:
            t = text or ""
            return ([t[i:i + ngram] for i in range(len(t) - ngram + 1)]
                    if len(t) >= ngram else [t])

    sig_df = ds.select_columns([id_col, text_col]).map_batches(
        CharMinHasher(id_col, text_col, num_perm),
        batch_format="pandas", batch_size=batch_size).to_pandas()
    band_df = _band_rows(sig_df, id_col, num_bands)
    pairs = _candidate_pairs_from_buckets(band_df, id_col)

    cand_ids = sorted({i for p in pairs for i in p})
    texts = {}
    if cand_ids:
        cand = ds.select_columns([id_col, text_col]).map_batches(
            lambda b, s=set(cand_ids): b[b[id_col].isin(s)],
            batch_format="pandas").to_pandas()
        texts = dict(zip(cand[id_col], cand[text_col]))

    def grams(t: str) -> set:
        return ({t[i:i + ngram] for i in range(len(t) - ngram + 1)}
                if len(t) >= ngram else {t})

    verified = set()
    gcache = {i: grams(texts[i] or "") for i in texts}
    for a, b in pairs:
        ga, gb = gcache[a], gcache[b]
        j = len(ga & gb) / max(1, len(ga | gb))
        if j >= threshold:
            verified.add((a, b))
    all_ids = sorted(sig_df[id_col])
    clusters = _union_find_clusters(all_ids, verified)
    return pa.table({
        id_col: pa.array(all_ids),
        "cluster_id": pa.array([clusters[i] for i in all_ids]),
        "is_duplicate": pa.array([clusters[i] != i for i in all_ids]),
    })


def embedding_cosine_dedup(ds: rd.Dataset, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95, n_planes: int = 12,
                           seed: int = 42, batch_size: int = 4096) -> pa.Table:
    """Embedding near-dup: random-hyperplane LSH buckets (sign bits of
    ``X @ P``) over L2-normalized vectors, within-bucket pairwise cosine
    ≥ threshold, union-find clusters.  ``n_planes`` trades recall (close
    pairs split by a plane) against bucket size."""

    class PlaneHasher:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((X.shape[1], n_planes))
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            bits = (Xn @ self.planes) > 0
            key = np.zeros(len(X), dtype=np.int64)
            for j in range(n_planes):
                key = key * 2 + bits[:, j]
            out = pd.DataFrame({id_col: batch[id_col].to_numpy(), "bucket": key})
            out["vec"] = list(Xn)
            return out

    hashed = ds.select_columns([id_col, vec_col]).map_batches(
        PlaneHasher(), batch_format="pandas", batch_size=batch_size).to_pandas()
    verified = set()
    for _, grp in hashed.groupby("bucket"):
        if len(grp) < 2:
            continue
        ids = grp[id_col].to_numpy()
        V = np.stack(grp["vec"].to_numpy())
        sims = V @ V.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        for a, b in zip(ids[ii], ids[jj]):
            verified.add((min(a, b), max(a, b)))
    all_ids = sorted(hashed[id_col])
    clusters = _union_find_clusters(all_ids, verified)
    return pa.table({
        id_col: pa.array(all_ids),
        "cluster_id": pa.array([clusters[i] for i in all_ids]),
        "is_duplicate": pa.array([clusters[i] != i for i in all_ids]),
    })
