"""Deduplication operators for training-data pipelines.

Five strategies over a text/embedding corpus, each Ray-Data-first:

* exact        — content-hash shuffle + keep-first (D2/D3 semantics,
                 ``relational.dedup_exact``).
* MinHash+LSH  — shingle → minhash signature → banded LSH bucket keys;
                 duplicate buckets found by a distributed sort +
                 adjacent-equal scan (8 B/row exchange), candidate pairs
                 verified by signature-estimated Jaccard; clusters via
                 union-find over the (small) verified-pair set.
* SimHash      — 64-bit weighted-bit-vote fingerprint; 4×16-bit band
                 buckets; Hamming-distance verification.
* n-gram Jaccard — exact character-n-gram Jaccard verification over LSH
                 candidates; candidate texts are joined IN-CLUSTER
                 (``Dataset.join``), never gathered to the driver.
* embedding cosine — random-hyperplane LSH buckets over normalized vectors;
                 within-bucket pairwise cosine computed in
                 ``groupby(bucket).map_groups`` — vectors stay in the
                 cluster.

Scale shape (the 100 TB contract): the driver only ever holds
 * the duplicate BUCKET KEYS (buckets with ≥2 members — rare by
   construction: bands/bits are sized so buckets stay small),
 * the candidate PAIRS and their verdicts,
 * the cluster-assignment map for docs in non-singleton clusters.
All of these are proportional to the near-duplicate density, not to the
corpus.  If even the pair set were too large for the driver (an extreme
dup-heavy crawl), ``connected_components`` is the fully-distributed
fallback: iterative min-label propagation over a pair Dataset.  Signatures, band rows and vectors live in the object store; the
only all-to-all exchanges are the bucket-key sort (8 B/row) and, for
the n-gram/embedding paths, the candidate-only join/groupby.  The output
is a lazy ``Dataset`` (id, cluster_id, is_duplicate[, cluster_size]) —
nothing row-scale materializes on the driver.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..sketches import hash64
from .pool import actor_pool

_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)

# adaptive spill sizing: the driver-side fallback (pandas candidate rows +
# pair set + union-find) costs roughly this many bytes per candidate row,
# measured conservative (8 B key + 8 B id + pandas block + pair/UF maps)
_SPILL_BYTES_PER_ROW = 128
_SPILL_HEADROOM_FRACTION = 0.10       # of MemAvailable
_SPILL_FLOOR = 200_000                 # never spill below this (fixed job
_SPILL_CEIL = 50_000_000               # cost dominates); never trust more


def _available_memory_bytes() -> int:
    """Driver-visible available memory: cgroup limit minus usage when a
    container bounds us below the host, else /proc/meminfo MemAvailable.
    Conservative fallback: 4 GiB."""
    try:  # cgroup v2
        with open("/sys/fs/cgroup/memory.max") as f:
            lim = f.read().strip()
        if lim != "max":
            with open("/sys/fs/cgroup/memory.current") as f:
                return max(0, int(lim) - int(f.read().strip()))
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 4 << 30


def _resolve_spill_threshold(explicit: int | None) -> int:
    """``spill_threshold=None`` → derive a candidate-row budget from the
    driver's actual memory headroom (10% of available / ~128 B per row,
    clamped to [200 k, 50 M]) so a constrained driver escalates to the
    distributed path earlier and a large one avoids needless spill jobs.
    An explicit integer always wins (tests force 0)."""
    if explicit is not None:
        return explicit
    budget = int(_available_memory_bytes() * _SPILL_HEADROOM_FRACTION
                 // _SPILL_BYTES_PER_ROW)
    return max(_SPILL_FLOOR, min(budget, _SPILL_CEIL))


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


def _band_keys(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """Fold each signature into ``num_bands`` int64 bucket keys (band index
    mixed into the fold so bands never share buckets).  Returns
    (n, num_bands) int64."""
    n, m = sigs.shape
    r = m // num_bands
    keys = np.empty((n, num_bands), dtype=np.uint64)
    for b in range(num_bands):
        chunk = sigs[:, b * r:(b + 1) * r]
        # band seed folded mod 2^64 in Python int space (no overflow warning)
        seed = np.uint64((b * int(_SEED_MIX) + 1) & 0xFFFFFFFFFFFFFFFF)
        h = np.full(n, seed, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(r):
                h = h * np.uint64(1099511628211) + chunk[:, j]
        keys[:, b] = h
    return keys.astype(np.int64)


class _BandExploder:
    """(id, sig) → (bh, id) rows: one bucket-key row per band."""

    def __init__(self, id_col: str, num_bands: int):
        self.id_col = id_col
        self.num_bands = num_bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:  # np.stack raises on zero arrays; empty blocks
            return pd.DataFrame({"bh": pd.Series([], dtype=np.int64),
                                 self.id_col: batch[self.id_col]})
        sigs = np.stack(batch["sig"].to_numpy())
        keys = _band_keys(sigs, self.num_bands)
        ids = batch[self.id_col].to_numpy()
        return pd.DataFrame({
            "bh": keys.ravel(),
            self.id_col: np.repeat(ids, self.num_bands),
        })


def _dup_bucket_keys(band_ds: rd.Dataset) -> set[int]:
    """Bucket keys appearing ≥2 times: distributed sort + vectorized
    adjacent-equal scan (8 B/row exchange; see
    ``relational.duplicate_values_sorted`` for why not groupby.count —
    Ray's per-group overhead melts on ~all-unique keys).  The result is
    EXACT (boundary runs are resolved by multiset count, tested in
    ``test_ops``) and its size is ∝ near-dup density."""
    from .relational import duplicate_values_sorted

    return set(duplicate_values_sorted(band_ds, "bh").tolist())


class _BucketFilter:
    """Keep rows whose ``bh`` is a duplicate bucket (broadcast set)."""

    def __init__(self, keys_ref):
        self.keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["bh"].isin(self.keys)]


def _pairs_from_bucket_rows(bh: np.ndarray, ids: np.ndarray,
                            max_bucket: int = 4096,
                            star_threshold: int = 128) -> set[tuple]:
    """Candidate pairs from (bucket, id) rows of DUPLICATE buckets only.

    Vectorized: sort by bucket, pair within equal-key runs.  Small buckets
    emit ALL pairs; buckets beyond ``star_threshold`` members emit a STAR
    to the min member PLUS the consecutive CHAIN (m_i, m_{i+1}) — 2·O(m)
    pairs, not O(m²).  A giant bucket is almost always one boilerplate/
    exact-dup cluster, where the star alone connects it like a clique;
    the chain edges keep a bucket whose members are only CHAIN-similar
    (A~B~C but A≁C) connected through verification instead of
    fragmenting around the one representative.

    Residual tradeoff (documented): chain edges follow id order, so a
    chain whose similarity order differs from id order can still
    fragment — raise ``star_threshold`` for full-clique verification if
    that matters more than pair-set size.  Buckets beyond ``max_bucket``
    members are truncated (salt upstream if a non-duplicate hot bucket
    ever gets that large)."""
    if len(bh) == 0:
        return set()
    order = np.lexsort((ids, bh))
    bh, ids = bh[order], ids[order]
    new_run = np.empty(len(bh), dtype=bool)
    new_run[0] = True
    new_run[1:] = bh[1:] != bh[:-1]
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(bh))
    pairs: set[tuple] = set()
    multi = np.flatnonzero(ends - starts >= 2)
    for ri in multi:
        s, e = starts[ri], ends[ri]
        members = np.unique(ids[s:e])[:max_bucket]
        if len(members) > star_threshold:
            rep = members[0]
            pairs.update((rep, m) for m in members[1:])
            pairs.update(zip(members[1:-1], members[2:]))  # chain edges
        else:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))
    return pairs


def connected_components(edges: rd.Dataset, src: str = "src",
                         dst: str = "dst", max_iters: int = 30,
                         num_partitions: int = 32) -> rd.Dataset:
    """Distributed connected components by MIN-LABEL PROPAGATION with
    POINTER DOUBLING over an EDGE Dataset — the fallback for when a
    candidate pair set outgrows the driver union-find
    (``_union_find_clusters``).

    Each round is ONE fused neighbor-min pass (two shuffles: forward,
    min), executed via ``ops.grouped.partitioned_group_apply`` (O(P)
    Python callbacks per step, NOT one per node — the forward step
    previously ran ``groupby(node).map_groups``, the exact per-group
    melt this engine benchmarked at 61 s / 640 k groups).  Pointer
    doubling is FUSED into the forward step instead of running as a
    third shuffle: the current label map contributes derived POINTER
    EDGES (v, label(v)) alongside the static edges, so the partition
    keyed by label(v) sends label(label(v)) back to v in the same merge
    that handles graph neighbors.  That collapses chains in
    O(log diameter) rounds (star pairing produces chain-shaped pair
    sets, so plain O(diameter) propagation is not enough) at 2 shuffles
    per round instead of the former forward/min/double 3.

    Labels are monotone non-increasing integers (label ≤ node id holds
    inductively), so convergence is detected EXACTLY by an unchanged
    global ``sum(label)`` — one cheap scalar aggregate per round, no
    per-node diff shuffle.  Raises ``RuntimeError`` if ``max_iters``
    rounds exhaust without convergence (silently-split components are
    worse than a loud failure).

    Returns a Dataset (node, label); label = min node id of the component."""
    from ray.data.aggregate import Min
    from .grouped import partitioned_group_apply

    def to_nodes(t: pa.Table) -> pa.Table:
        a = np.asarray(t[src].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t[dst].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"node": pa.array(np.concatenate([a, b]))})

    edges = edges.select_columns([src, dst]).map_batches(
        lambda t: pa.table({src: pc.cast(t[src], pa.int64()),
                            dst: pc.cast(t[dst], pa.int64())}),
        batch_format="pyarrow").materialize()
    labels = (edges.map_batches(to_nodes, batch_format="pyarrow")
              .groupby("node").aggregate(Min("node", alias_name="label"))
              .materialize())

    # Row kinds share one schema with NO nulls: a nullable int64 column
    # would go through Arrow->pandas as float64 inside
    # partitioned_group_apply, silently corrupting node ids above 2^53 —
    # exactly the hash-derived ids _require_int_ids steers callers to.
    # kind 0 = label row (lab valid), kind 1 = edge row (partner valid).
    def lab_rows_of(lab_ds: rd.Dataset) -> rd.Dataset:
        return lab_ds.map_batches(
            lambda t: pa.table({"key": t["node"],
                                "partner": pa.array(
                                    np.zeros(t.num_rows, np.int64)),
                                "lab": t["label"],
                                "kind": pa.array(
                                    np.zeros(t.num_rows, np.int8))}),
            batch_format="pyarrow")

    def edge_rows_fn(t: pa.Table) -> pa.Table:
        a = np.asarray(t[src].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t[dst].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"key": pa.array(np.concatenate([a, b])),
                         "partner": pa.array(np.concatenate([b, a])),
                         "lab": pa.array(np.zeros(2 * t.num_rows, np.int64)),
                         "kind": pa.array(np.ones(2 * t.num_rows, np.int8))})

    def forward_partition(g: pd.DataFrame) -> pd.DataFrame:
        """All keys of one partition: one merge + concat, no per-key loop."""
        kind = g["kind"].to_numpy()
        labmap = g.loc[kind == 0, ["key", "lab"]]
        partners = g.loc[kind == 1, ["key", "partner"]]
        msgs = partners.merge(labmap, on="key", how="inner")
        node = np.concatenate([labmap["key"].to_numpy(dtype=np.int64),
                               msgs["partner"].to_numpy(dtype=np.int64)])
        cand = np.concatenate([labmap["lab"].to_numpy(dtype=np.int64),
                               msgs["lab"].to_numpy(dtype=np.int64)])
        return pd.DataFrame({"node": node, "cand": cand})

    def min_partition(g: pd.DataFrame) -> pd.DataFrame:
        res = (g.groupby("node", sort=False)["cand"].min()
               .rename("label").reset_index())
        return res

    def pointer_rows_fn(t: pa.Table) -> pa.Table:
        """Derived edges (v, label(v)) for label(v) != v — fuses pointer
        doubling into the forward step: the partition holding label(v)'s
        own label row answers with label(label(v)) in the same merge."""
        n = np.asarray(t["node"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        l = np.asarray(t["label"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        m = n != l
        n, l = n[m], l[m]
        return pa.table({"key": pa.array(np.concatenate([n, l])),
                         "partner": pa.array(np.concatenate([l, n])),
                         "lab": pa.array(np.zeros(2 * len(n), np.int64)),
                         "kind": pa.array(np.ones(2 * len(n), np.int8))})

    def label_sum(lab_ds: rd.Dataset) -> int:
        from ray.data.aggregate import Sum

        row = lab_ds.aggregate(Sum("label", alias_name="s"))
        return int(row["s"] or 0) if row else 0

    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iters):
        # fused neighbor-min + pointer doubling: label rows answer for
        # static edges AND derived pointer edges (v, label(v)) in one
        # forward/min pass — 2 shuffles per round
        msgs = partitioned_group_apply(
            lab_rows_of(labels).union(
                edges.map_batches(edge_rows_fn, batch_format="pyarrow"),
                labels.map_batches(pointer_rows_fn, batch_format="pyarrow")),
            ["key"], forward_partition, num_partitions=num_partitions)
        labels = partitioned_group_apply(
            msgs, ["node"], min_partition,
            num_partitions=num_partitions).materialize()

        s = label_sum(labels)
        if s == prev_sum:  # labels monotone non-increasing ⇒ exact test
            converged = True
            break
        prev_sum = s
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(component diameter too large even for pointer doubling — "
            f"raise max_iters)")
    return labels


def _union_find_clusters(pairs) -> tuple[dict, dict]:
    """Union-find over the VERIFIED pair set only (pairs ≪ corpus).

    Returns (cluster map {member_id: root_id} for non-singleton members,
    size map {root_id: cluster_size})."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {i: find(i) for i in parent}
    sizes: dict = {}
    for root in clusters.values():
        sizes[root] = sizes.get(root, 0) + 1
    return clusters, sizes


def _cluster_output(ids_ds: rd.Dataset, id_col: str, clusters: dict,
                    sizes: dict, with_size: bool = False) -> rd.Dataset:
    """Lazy output Dataset: broadcast the (small) cluster map and label every
    id per batch — the corpus-scale table never lands on the driver."""
    cmap_ref = ray.put(clusters)
    smap_ref = ray.put(sizes if with_size else None)

    class Label:
        def __init__(self):
            self.cmap = ray.get(cmap_ref)
            self.smap = ray.get(smap_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col]
            mapped = ids.map(self.cmap)
            cluster = mapped.where(mapped.notna(), ids)
            try:
                cluster = cluster.astype(ids.dtype)
            except (TypeError, ValueError):
                pass
            out = pd.DataFrame({id_col: ids.to_numpy(),
                                "cluster_id": cluster.to_numpy(),
                                "is_duplicate": (cluster != ids).to_numpy()})
            if self.smap is not None:
                sz = cluster.map(self.smap).fillna(1).astype(np.int64)
                out["cluster_size"] = sz.to_numpy()
            return out

    return ids_ds.select_columns([id_col]).map_batches(
        Label, batch_format="pandas", concurrency=actor_pool())


def _require_int_ids(ds: rd.Dataset, id_col: str) -> None:
    """The spill paths cluster via ``connected_components`` (int64 node
    labels) — reject non-integer ids loudly instead of corrupting them."""
    id_dtype = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    # pandas-block datasets report numpy dtypes / `object`, arrow blocks
    # report pa.DataType — accept integer under either representation
    if isinstance(id_dtype, pa.DataType):
        id_is_int = pa.types.is_integer(id_dtype)
    else:
        try:
            id_is_int = np.issubdtype(np.dtype(id_dtype), np.integer)
        except TypeError:
            id_is_int = False
    if not id_is_int:
        raise NotImplementedError(
            "spill path requires integer ids (connected_components labels "
            f"are int64); got {id_dtype} — pre-assign integer ids upstream")


def _pairs_partition_fn(id_col: str, max_bucket: int):
    """Per-PARTITION candidate-pair generation for the spill path: buckets
    are whole within a partition (hash-partitioned on ``bh``), so
    ``_pairs_from_bucket_rows`` runs vectorized on each partition's rows
    and the pair set never lands on the driver."""

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        prs = _pairs_from_bucket_rows(g["bh"].to_numpy(),
                                      g[id_col].to_numpy(), max_bucket)
        if not prs:
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64)})
        arr = np.array(sorted(prs), dtype=np.int64)
        return pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]})

    return pairs_partition


def _attach_value(pairs_ds: rd.Dataset, value_ds: rd.Dataset, id_col: str,
                  key: str, carry: dict[str, pa.DataType], val_col: str,
                  out_name: str, vtype: pa.DataType,
                  num_partitions: int, encode=None) -> rd.Dataset:
    """Attach each pair row's per-id value (signature / text / hash) for
    ``key`` via the sparse-safe union + hash-partition lookup
    (``Dataset.join`` raises ArrowInvalid on empty hash partitions when
    the key set is sparse — ROUND_NOTES).  The value table streams through
    the shuffle once; nothing broadcasts.

    Values travel as EXPLICIT Arrow columns of ``vtype`` (binary/string):
    tensor-extension columns do not survive a union whose empty/padded
    blocks degrade to null type, while explicit types pad cleanly.
    ``carry`` maps already-attached columns to their types; ``encode``
    converts a raw value to the Arrow scalar (e.g. ``sig.tobytes()``)."""
    from .grouped import partitioned_group_apply

    pad_of = {pa.binary(): b"", pa.string(): ""}

    def filler(typ, n):
        if typ in (pa.binary(), pa.string()):
            return pa.array([pad_of[typ]] * n, typ)
        return pa.array(np.full(n, -1, np.int64), typ)

    def pad_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__key": pc.cast(t[key], pa.int64())}
        for c, typ in carry.items():
            cols[c] = pc.cast(t[c], typ)
        cols["__val"] = filler(vtype, n)
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def pad_values(b: pd.DataFrame) -> pa.Table:
        n = len(b)
        cols = {"__key": pa.array(
            b[id_col].to_numpy().astype(np.int64), pa.int64())}
        for c, typ in carry.items():
            cols[c] = filler(typ, n)
        vals = b[val_col]
        cols["__val"] = pa.array(
            [encode(v) for v in vals] if encode else vals.tolist(), vtype)
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    unioned = pairs_ds.map_batches(pad_pairs, batch_format="pyarrow").union(
        value_ds.select_columns([id_col, val_col]).map_batches(
            pad_values, batch_format="pandas"))

    def resolve(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        side = df["__side"].to_numpy()
        smap = df.loc[side == 1].set_index("__key")["__val"]
        ask = df.loc[side == 0]
        cols = {key: pa.array(ask["__key"].to_numpy(dtype=np.int64),
                              pa.int64())}
        for c, typ in carry.items():
            cols[c] = pa.array(ask[c].tolist(), typ)
        cols[out_name] = pa.array(ask["__key"].map(smap).tolist(), vtype)
        return pa.table(cols)

    return partitioned_group_apply(unioned, ["__key"], resolve,
                                   num_partitions=num_partitions,
                                   batch_format="pyarrow")


def _bloom_prefilter_members(value_ds: rd.Dataset, id_col: str,
                             pairs_ds: rd.Dataset,
                             n_values: int | None = None) -> rd.Dataset:
    """Pre-filter the value table to (approximately) the pair members
    before an ``_attach_value`` shuffle: per-batch partial Bloom filters
    over pair endpoint ids, OR-merged on the driver (the bitmap is
    KB–MB, ∝ pair count), then one broadcast probe.  Bloom filters have
    NO false negatives, so every needed value survives — false positives
    just ride the shuffle harmlessly.  Cuts the attach exchange from
    corpus-scale (every signature/text) to ∝ duplicate density.

    Only pays when pair members are SPARSE relative to the corpus: the
    bloom build + probe add ~2 fixed passes, so when a dup-heavy corpus
    has most ids in pairs (the common forced-spill regime) the filter is
    skipped and the attach streams the full table (measured single-box:
    2 M docs / 2 k pairs ran 92 s without vs 120 s with an unconditional
    prefilter — the sparse guard keeps the win for the network-bound
    multi-node case without taxing the dense case)."""
    import pickle

    from ..bloom import BloomFilter

    n_pairs = pairs_ds.count()  # pairs_ds is materialized by callers
    if n_pairs == 0:
        # attach has no askers — return an EMPTY value table (keeping
        # the value schema; returning pairs_ds here would hand the
        # wrong schema to _attach_value's select_columns)
        return value_ds.limit(0)
    # callers pass n_values only when it is cheaply known (materialized)
    if n_values is not None and 8 * n_pairs >= n_values:
        return value_ds  # members ~dense in corpus: prefilter can't pay
    capacity = max(64, 2 * n_pairs)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(capacity, fpr=1e-3)
        ids = np.unique(np.concatenate([b["src"].to_numpy(dtype=np.int64),
                                        b["dst"].to_numpy(dtype=np.int64)]))
        bf.add(ids)
        return pd.DataFrame({"blob": [pickle.dumps(bf)]})

    blobs = pairs_ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged: BloomFilter | None = None
    for blob in blobs["blob"]:
        bf = pickle.loads(blob)
        merged = bf if merged is None else merged.merge(bf)
    ref = ray.put(merged)

    class Probe:
        def __init__(self):
            self.bf = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b[self.bf.contains(b[id_col].to_numpy())]

    # materialized: the filtered table is ∝ dup density (small), and BOTH
    # attach passes read it — lazy would re-run the corpus probe scan twice
    return value_ds.map_batches(Probe, batch_format="pandas",
                                concurrency=actor_pool()).materialize()


def _spill_cluster_output(ids_ds: rd.Dataset, id_col: str,
                          labels_ds: rd.Dataset,
                          num_partitions: int) -> rd.Dataset:
    """Fully-distributed cluster labeling: attach CC labels and cluster
    sizes to every corpus id via two sparse-safe hash-partition lookups —
    the Dataset-scale twin of ``_cluster_output`` (which broadcasts a
    driver-held dict).  Output schema matches the driver path:
    (id, cluster_id, is_duplicate, cluster_size)."""
    from .grouped import partitioned_group_apply

    labels_ds = labels_ds.materialize()

    # 1. cluster sizes: count members per label (one partitioned C pass)
    def size_partition(g: pd.DataFrame) -> pd.DataFrame:
        res = (g.groupby("label", sort=False).size()
               .rename("cluster_size").reset_index())
        return res

    sizes = partitioned_group_apply(labels_ds, ["label"], size_partition,
                                    num_partitions=num_partitions)

    # 2. attach labels to corpus ids (nodes absent from labels are
    #    singletons: cluster_id = own id)
    id_rows = ids_ds.select_columns([id_col]).map_batches(
        lambda b: pd.DataFrame({"__key": b[id_col].astype(np.int64),
                                "__lab": np.full(len(b), -1, np.int64),
                                "__side": np.zeros(len(b), np.int8)}),
        batch_format="pandas")
    lab_rows = labels_ds.map_batches(
        lambda b: pd.DataFrame({"__key": b["node"].astype(np.int64),
                                "__lab": b["label"].astype(np.int64),
                                "__side": np.ones(len(b), np.int8)}),
        batch_format="pandas")

    def label_partition(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side"].to_numpy()
        lmap = g.loc[side == 1].set_index("__key")["__lab"]
        ids = g.loc[side == 0, "__key"]
        lab = ids.map(lmap).fillna(ids).astype(np.int64)
        return pd.DataFrame({id_col: ids.to_numpy(),
                             "cluster_id": lab.to_numpy(),
                             "is_duplicate": (lab.to_numpy()
                                              != ids.to_numpy())})

    labeled = partitioned_group_apply(id_rows.union(lab_rows), ["__key"],
                                      label_partition,
                                      num_partitions=num_partitions)

    # 3. attach sizes keyed on cluster_id (singletons → 1)
    lab_side = labeled.map_batches(
        lambda b: pd.DataFrame({"__key": b["cluster_id"].to_numpy(),
                                "__id": b[id_col].to_numpy(),
                                "__dup": b["is_duplicate"].to_numpy(),
                                "__sz": np.full(len(b), -1, np.int64),
                                "__side": np.zeros(len(b), np.int8)}),
        batch_format="pandas")
    size_side = sizes.map_batches(
        lambda b: pd.DataFrame({"__key": b["label"].to_numpy(),
                                "__id": np.full(len(b), -1, np.int64),
                                "__dup": np.zeros(len(b), dtype=bool),
                                "__sz": b["cluster_size"].astype(np.int64),
                                "__side": np.ones(len(b), np.int8)}),
        batch_format="pandas")

    def size_attach(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side"].to_numpy()
        smap = g.loc[side == 1].set_index("__key")["__sz"]
        rows = g.loc[side == 0]
        sz = rows["__key"].map(smap).fillna(1).astype(np.int64)
        return pd.DataFrame({id_col: rows["__id"].to_numpy(),
                             "cluster_id": rows["__key"].to_numpy(),
                             "is_duplicate": rows["__dup"].to_numpy(),
                             "cluster_size": sz.to_numpy()})

    return partitioned_group_apply(lab_side.union(size_side), ["__key"],
                                   size_attach,
                                   num_partitions=num_partitions)


def minhash_lsh_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 128,
                      num_bands: int = 32, shingle_k: int = 3,
                      jaccard_threshold: float = 0.8,
                      batch_size: int = 2048,
                      max_bucket: int = 4096,
                      spill_threshold: int | None = None,
                      spill_partitions: int = 64) -> rd.Dataset:
    """Near-duplicate clustering: (id, cluster_id, is_duplicate, cluster_size).

    Distributed pipeline (nothing corpus-scale on the driver):
      1. ``map_batches(MinHasher)`` → (id, signature), materialized in the
         object store (1 KB/doc, spillable);
      2. band explode → (bucket_key, id); DUPLICATE buckets found by a
         distributed sort + adjacent-equal scan over the 8-byte bucket
         keys (``duplicate_values_sorted`` — exact, hash-only exchange);
      3. rows of duplicate buckets (∝ dup density) → candidate pairs;
      4. signatures of candidate ids fetched via broadcast-filtered pass,
         pairs verified by signature-estimated Jaccard ≥ threshold;
      5. union-find over verified pairs; cluster labels broadcast and
         applied per batch → lazy output Dataset.
    cluster_id = min id in the cluster; is_duplicate marks every member
    beyond the representative.

    Spill escalation: if the candidate (bucket, id) row count exceeds
    ``spill_threshold`` — a dup-heavy crawl where even the pair set would
    hurt the driver — the ENTIRE tail of the pipeline escalates to the
    distributed path automatically: pair generation per hash partition,
    signature verification via two sparse-safe lookups, clustering via
    ``connected_components``, and labeling via partitioned joins.  The
    driver then never holds pairs, signatures, or cluster maps (requires
    integer ids; forced-spill equivalence is tested)."""
    # stateless tasks (not an actor pool): the hasher's state is just the
    # 2 KB permutation table — tasks scale elastically with no pool ramp-up
    hasher = MinHasher(id_col, text_col, num_perm, shingle_k)
    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        hasher, batch_format="pandas", batch_size=batch_size).materialize()
    band_ds = sig_ds.map_batches(_BandExploder(id_col, num_bands),
                                 batch_format="pandas")
    dup_bh = _dup_bucket_keys(band_ds)
    if not dup_bh:
        return _cluster_output(sig_ds, id_col, {}, {}, with_size=True)

    keys_ref = ray.put(dup_bh)
    cand_ds = band_ds.map_batches(
        _BucketFilter, fn_constructor_args=(keys_ref,),
        batch_format="pandas", concurrency=actor_pool()).materialize()
    spill_threshold = _resolve_spill_threshold(spill_threshold)
    if cand_ds.count() > spill_threshold:
        return _minhash_spill(sig_ds, cand_ds, id_col, jaccard_threshold,
                              max_bucket, spill_partitions)

    cand_rows = cand_ds.to_pandas()
    pairs = _pairs_from_bucket_rows(cand_rows["bh"].to_numpy(),
                                    cand_rows[id_col].to_numpy(), max_bucket)
    verified: set[tuple] = set()
    if pairs:
        cand_ids = {i for p in pairs for i in p}
        cid_ref = ray.put(cand_ids)
        cand_sig = sig_ds.map_batches(
            lambda b, r=cid_ref: b[b[id_col].isin(ray.get(r))],
            batch_format="pandas").to_pandas()
        sigs = {i: s for i, s in zip(cand_sig[id_col], cand_sig["sig"])}
        for a, b in pairs:
            if float((sigs[a] == sigs[b]).mean()) >= jaccard_threshold:
                verified.add((a, b))
    clusters, sizes = _union_find_clusters(verified)
    return _cluster_output(sig_ds, id_col, clusters, sizes, with_size=True)


def _minhash_spill(sig_ds: rd.Dataset, cand_ds: rd.Dataset, id_col: str,
                   jaccard_threshold: float, max_bucket: int,
                   num_partitions: int) -> rd.Dataset:
    """The dup-heavy-crawl escalation of ``minhash_lsh_dedup``: everything
    downstream of candidate detection runs as Dataset transforms — the
    driver holds only per-round scalars.  One partitioned pass generates
    pairs per whole bucket, two sparse-safe lookups attach both
    signatures, a vectorized batch filter verifies estimated Jaccard, and
    ``connected_components`` + ``_spill_cluster_output`` produce the same
    (id, cluster_id, is_duplicate, cluster_size) schema as the driver
    path."""
    from .grouped import partitioned_group_apply

    _require_int_ids(sig_ds, id_col)

    pairs_ds = partitioned_group_apply(
        cand_ds, ["bh"], _pairs_partition_fn(id_col, max_bucket),
        num_partitions=num_partitions).materialize()
    cand_sigs = _bloom_prefilter_members(sig_ds, id_col, pairs_ds,
                                         n_values=sig_ds.count())

    def enc(s) -> bytes:
        return np.asarray(s, dtype=np.uint64).tobytes()

    with_a = _attach_value(pairs_ds, cand_sigs, id_col, "src",
                           {"dst": pa.int64()}, "sig", "sig_a",
                           pa.binary(), num_partitions, encode=enc)
    with_b = _attach_value(with_a, cand_sigs, id_col, "dst",
                           {"src": pa.int64(), "sig_a": pa.binary()},
                           "sig", "sig_b", pa.binary(), num_partitions,
                           encode=enc)

    thresh = jaccard_threshold

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64)})
        A = np.stack([np.frombuffer(x, dtype=np.uint64) for x in b["sig_a"]])
        B = np.stack([np.frombuffer(x, dtype=np.uint64) for x in b["sig_b"]])
        frac = (A == B).mean(axis=1)
        return b.loc[frac >= thresh, ["src", "dst"]]

    verified_ds = with_b.map_batches(verify, batch_format="pandas")
    labels = connected_components(verified_ds, "src", "dst",
                                  num_partitions=num_partitions)
    return _spill_cluster_output(sig_ds, id_col, labels, num_partitions)


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


def _simhash_band_rows(batch: pd.DataFrame, id_col: str,
                       num_bands: int = 4) -> pd.DataFrame:
    """(id, simhash) → num_bands × (bh, id, simhash) rows: (64/num_bands)-bit
    bands mixed with the band index into disjoint key ranges (pigeonhole:
    Hamming < num_bands ⇒ ≥1 shared band).  4×16-bit covers the SimHash
    default (Hamming ≤ 3); 8×8-bit covers pHash-style thresholds ≤ 7."""
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)
    hashes = batch["simhash"].to_numpy().astype(np.uint64)
    n = len(hashes)
    out_bh = np.empty(num_bands * n, dtype=np.int64)
    for band in range(num_bands):
        keys = (hashes >> np.uint64(band * width)) & mask
        out_bh[band * n:(band + 1) * n] = (
            keys + np.uint64(band + 1) * np.uint64(1 << width)).astype(np.int64)
    return pd.DataFrame({"bh": out_bh,
                         id_col: np.tile(batch[id_col].to_numpy(), num_bands),
                         "simhash": np.tile(hashes.astype(np.int64), num_bands)})


def _simhash_verified_pairs_fn(id_col: str, max_bucket: int,
                               max_hamming: int):
    """Per-PARTITION pair generation + popcount verification in ONE step:
    the band rows carry each member's fingerprint, so a partition has
    everything needed — no value-attach passes (unlike the minhash
    spill, whose signatures are too wide to ride the band rows)."""

    def verified_pairs(g: pd.DataFrame) -> pd.DataFrame:
        prs = _pairs_from_bucket_rows(g["bh"].to_numpy(),
                                      g[id_col].to_numpy(), max_bucket)
        empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                              "dst": pd.Series([], dtype=np.int64)})
        if not prs:
            return empty
        hmap = dict(zip(g[id_col], g["simhash"].astype(np.uint64)))
        keep = [(a, b) for a, b in prs
                if bin(int(hmap[a]) ^ int(hmap[b])).count("1") <= max_hamming]
        if not keep:
            return empty
        arr = np.array(sorted(keep), dtype=np.int64)
        return pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]})

    return verified_pairs


def _hamming_band_cluster(sim_ds: rd.Dataset, id_col: str,
                          max_hamming: int, num_bands: int,
                          max_bucket: int,
                          spill_threshold: int | None,
                          spill_partitions: int) -> rd.Dataset:
    """Shared tail of the 64-bit-fingerprint dedup family (``simhash_dedup``,
    ``hamming64_dedup``/pHash): ``sim_ds`` is (id, simhash:int64); band
    rows carry the 8-byte fingerprint, so the (small) duplicate-bucket
    fetch already contains everything needed for exact popcount
    verification — no second corpus pass.  Past ``spill_threshold``
    candidate rows, pair generation + verification run per hash partition
    and clustering escalates to ``connected_components`` (driver holds
    only scalars)."""
    band_ds = sim_ds.map_batches(
        lambda b: _simhash_band_rows(b, id_col, num_bands),
        batch_format="pandas")
    dup_bh = _dup_bucket_keys(band_ds)
    if not dup_bh:
        return _cluster_output(sim_ds, id_col, {}, {})
    keys_ref = ray.put(dup_bh)
    cand_ds = band_ds.map_batches(
        _BucketFilter, fn_constructor_args=(keys_ref,),
        batch_format="pandas", concurrency=actor_pool()).materialize()

    spill_threshold = _resolve_spill_threshold(spill_threshold)
    if cand_ds.count() > spill_threshold:
        from .grouped import partitioned_group_apply

        _require_int_ids(sim_ds, id_col)
        pairs_ds = partitioned_group_apply(
            cand_ds, ["bh"],
            _simhash_verified_pairs_fn(id_col, max_bucket, max_hamming),
            num_partitions=spill_partitions)
        labels = connected_components(pairs_ds, "src", "dst",
                                      num_partitions=spill_partitions)
        out = _spill_cluster_output(sim_ds, id_col, labels, spill_partitions)
        return out.drop_columns(["cluster_size"])

    cand = cand_ds.to_pandas()
    pairs = _pairs_from_bucket_rows(cand["bh"].to_numpy(),
                                    cand[id_col].to_numpy(), max_bucket)
    hmap = dict(zip(cand[id_col], cand["simhash"].astype(np.uint64)))
    verified = {(a, b) for a, b in pairs
                if bin(int(hmap[a]) ^ int(hmap[b])).count("1") <= max_hamming}
    clusters, sizes = _union_find_clusters(verified)
    return _cluster_output(sim_ds, id_col, clusters, sizes)


def simhash_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, batch_size: int = 2048,
                  max_bucket: int = 4096,
                  spill_threshold: int | None = None,
                  spill_partitions: int = 64) -> rd.Dataset:
    """SimHash near-dup clustering, distributed like ``minhash_lsh_dedup``
    (see ``_hamming_band_cluster`` for the banding/verify/spill shape)."""
    sim_ds = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher(id_col, text_col),
        batch_format="pandas", batch_size=batch_size).materialize()
    return _hamming_band_cluster(sim_ds, id_col, max_hamming, 4, max_bucket,
                                 spill_threshold, spill_partitions)


def hamming64_dedup(ds: rd.Dataset, id_col: str, hash_col: str,
                    max_hamming: int = 6, num_bands: int = 8,
                    max_bucket: int = 4096,
                    spill_threshold: int | None = None,
                    spill_partitions: int = 64) -> rd.Dataset:
    """Near-dup clustering over a PRECOMPUTED 64-bit fingerprint column
    (pHash, audio fingerprint, any locality-preserving 64-bit code):
    Hamming ≤ ``max_hamming`` pairs cluster via the same banded-pigeonhole
    machinery as ``simhash_dedup``.

    Completeness requires ``max_hamming < num_bands`` (a pair differing in
    h bits shares ≥1 of the 64/num_bands-bit bands only when h < num_bands)
    — violating it silently misses pairs, so it raises.  Returns the usual
    (id, cluster_id, is_duplicate) lazy Dataset."""
    if 64 % num_bands:
        raise ValueError(f"num_bands must divide 64, got {num_bands}")
    if max_hamming >= num_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs num_bands > max_hamming "
            f"(got {num_bands}): the pigeonhole guarantee breaks and pairs "
            "would be silently missed")

    def to_sim(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "simhash": b[hash_col].to_numpy().astype(np.int64)})

    sim_ds = ds.select_columns([id_col, hash_col]).map_batches(
        to_sim, batch_format="pandas").materialize()
    return _hamming_band_cluster(sim_ds, id_col, max_hamming, num_bands,
                                 max_bucket, spill_threshold,
                                 spill_partitions)


def ngram_jaccard_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", ngram: int = 8,
                        threshold: float = 0.7, num_perm: int = 128,
                        num_bands: int = 16, batch_size: int = 2048,
                        max_bucket: int = 4096,
                        verify_partitions: int = 8,
                        spill_threshold: int | None = None,
                        spill_partitions: int = 64) -> rd.Dataset:
    """Exact character-n-gram Jaccard dedup: MinHash-LSH proposes candidate
    pairs; verification joins each pair with its two texts IN-CLUSTER
    (two ``Dataset.join`` hash joins over the candidate-filtered corpus)
    and computes exact n-gram Jaccard vectorized per batch — candidate
    texts never gather on the driver.  Past ``spill_threshold`` candidate
    rows, the whole tail (pair generation, text attach, verification,
    clustering, labeling) escalates to Dataset transforms + CC."""

    class CharMinHasher(MinHasher):
        def _shingle_strings(self, text: str) -> list[str]:
            t = text or ""
            return ([t[i:i + ngram] for i in range(len(t) - ngram + 1)]
                    if len(t) >= ngram else [t])

    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        CharMinHasher(id_col, text_col, num_perm),
        batch_format="pandas", batch_size=batch_size).materialize()
    band_ds = sig_ds.map_batches(_BandExploder(id_col, num_bands),
                                 batch_format="pandas")
    dup_bh = _dup_bucket_keys(band_ds)
    if not dup_bh:
        return _cluster_output(sig_ds, id_col, {}, {})
    keys_ref = ray.put(dup_bh)
    cand_ds = band_ds.map_batches(
        _BucketFilter, fn_constructor_args=(keys_ref,),
        batch_format="pandas", concurrency=actor_pool()).materialize()

    def grams_jaccard_ok(ta: str, tb: str) -> bool:
        def grams(t: str) -> set:
            return ({t[i:i + ngram] for i in range(len(t) - ngram + 1)}
                    if len(t) >= ngram else {t})

        ga, gb = grams(ta or ""), grams(tb or "")
        return len(ga & gb) / max(1, len(ga | gb)) >= threshold

    spill_threshold = _resolve_spill_threshold(spill_threshold)
    if cand_ds.count() > spill_threshold:
        # full escalation: pairs per partition, texts attached via the
        # sparse-safe lookup (the corpus text streams through the shuffle
        # once per side — linear, never broadcast), exact verification per
        # batch, CC clustering, partitioned labeling
        from .grouped import partitioned_group_apply

        _require_int_ids(sig_ds, id_col)
        pairs_ds = partitioned_group_apply(
            cand_ds, ["bh"], _pairs_partition_fn(id_col, max_bucket),
            num_partitions=spill_partitions).materialize()
        texts = _bloom_prefilter_members(
            ds.select_columns([id_col, text_col]), id_col, pairs_ds)
        with_a = _attach_value(pairs_ds, texts, id_col, "src",
                               {"dst": pa.int64()}, text_col, "text_a",
                               pa.string(), spill_partitions)
        with_b = _attach_value(with_a, texts, id_col, "dst",
                               {"src": pa.int64(), "text_a": pa.string()},
                               text_col, "text_b", pa.string(),
                               spill_partitions)

        def verify_batch(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                     "dst": pd.Series([], dtype=np.int64)})
            ok = [grams_jaccard_ok(ta, tb)
                  for ta, tb in zip(b["text_a"], b["text_b"])]
            return b.loc[ok, ["src", "dst"]]

        ver = with_b.map_batches(verify_batch, batch_format="pandas")
        labels = connected_components(ver, "src", "dst",
                                      num_partitions=spill_partitions)
        out = _spill_cluster_output(sig_ds, id_col, labels, spill_partitions)
        return out.drop_columns(["cluster_size"])

    cand_rows = cand_ds.to_pandas()
    pairs = _pairs_from_bucket_rows(cand_rows["bh"].to_numpy(),
                                    cand_rows[id_col].to_numpy(), max_bucket)

    verified: set[tuple] = set()
    if pairs:
        cand_ids = {i for p in pairs for i in p}
        cid_ref = ray.put(cand_ids)

        def cand_texts(side: str) -> rd.Dataset:
            # filter + rename in ONE pandas stage (a separate Dataset-level
            # rename would fuse a pyarrow Project onto the pandas batch)
            cols = {id_col: f"p{side}_", text_col: f"t{side}_"}
            return ds.select_columns([id_col, text_col]).map_batches(
                lambda b, r=cid_ref, c=cols: (
                    b[b[id_col].isin(ray.get(r))].rename(columns=c)),
                batch_format="pandas")

        pair_list = sorted(pairs)
        pairs_ds = rd.from_pandas(pd.DataFrame(
            {"pa_": [p[0] for p in pair_list], "pb_": [p[1] for p in pair_list]}))
        # two small hash joins attach text_a / text_b to every pair row
        left = pairs_ds.join(cand_texts("a"), join_type="inner",
                             num_partitions=verify_partitions, on=("pa_",))
        both = left.join(cand_texts("b"), join_type="inner",
                         num_partitions=verify_partitions, on=("pb_",))

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            def grams(t: str) -> set:
                return ({t[i:i + ngram] for i in range(len(t) - ngram + 1)}
                        if len(t) >= ngram else {t})

            ok = []
            for ta, tb in zip(batch["ta_"], batch["tb_"]):
                ga, gb = grams(ta or ""), grams(tb or "")
                ok.append(len(ga & gb) / max(1, len(ga | gb)) >= threshold)
            return batch.loc[ok, ["pa_", "pb_"]]

        vdf = both.map_batches(verify, batch_format="pandas").to_pandas()
        verified = ({(a, b) for a, b in zip(vdf["pa_"], vdf["pb_"])}
                    if len(vdf) and "pa_" in vdf.columns else set())
    clusters, sizes = _union_find_clusters(verified)
    return _cluster_output(sig_ds, id_col, clusters, sizes)


def embedding_cosine_dedup(ds: rd.Dataset, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95, n_planes: int = 12,
                           seed: int = 42, batch_size: int = 4096,
                           max_bucket: int = 2000,
                           spill_pairs_threshold: int | None = None,
                           spill_partitions: int = 64) -> rd.Dataset:
    """Embedding near-dup: random-hyperplane LSH buckets (sign bits of
    ``X @ P``) over L2-normalized vectors; within-bucket pairwise cosine is
    computed IN-CLUSTER via ``groupby(bucket).map_groups`` (≤ 2^n_planes
    groups), so the driver never holds the vector matrix — only the
    verified pairs.  ``n_planes`` trades recall (close pairs split by a
    plane) against bucket size; buckets beyond ``max_bucket`` are truncated
    (raise n_planes if that binds)."""

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
        PlaneHasher(), batch_format="pandas", batch_size=batch_size).materialize()

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) < 2:
            return pd.DataFrame({"pa_": pd.Series([], dtype=grp[id_col].dtype),
                                 "pb_": pd.Series([], dtype=grp[id_col].dtype)})
        grp = grp.iloc[:max_bucket]
        ids = grp[id_col].to_numpy()
        V = np.stack(grp["vec"].to_numpy())
        sims = V @ V.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"pa_": a, "pb_": b})

    pairs_ds = hashed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas").materialize()
    spill_pairs_threshold = _resolve_spill_threshold(spill_pairs_threshold)
    if pairs_ds.count() > spill_pairs_threshold:
        # verification already ran in-cluster; only clustering + labeling
        # escalate: CC over the pair Dataset, partitioned label join
        _require_int_ids(hashed, id_col)
        labels = connected_components(pairs_ds, "pa_", "pb_",
                                      num_partitions=spill_partitions)
        out = _spill_cluster_output(hashed, id_col, labels, spill_partitions)
        return out.drop_columns(["cluster_size"])
    vdf = pairs_ds.to_pandas()
    verified = ({(a, b) for a, b in zip(vdf["pa_"], vdf["pb_"])}
                if len(vdf) and "pa_" in vdf.columns else set())
    clusters, sizes = _union_find_clusters(verified)
    return _cluster_output(hashed, id_col, clusters, sizes)


def _flat_segments(df: pd.DataFrame, id_col: str, text_col: str, sep: str,
                   hash_fn=None):
    """Vectorized doc→segment explode for ``dedup_segments``: one
    ``.str.split`` + ``explode`` + one flat ``hash64`` per BATCH (no
    per-document Python loop).  Returns (ids, counts, doc_flat, pack,
    segs_flat, stripped_flat, hashes) — all flat numpy arrays aligned on
    the exploded segment axis.  ``hash_fn`` is injectable so collision
    tests can force equal primary hashes on distinct texts (monkeypatching
    the module global would not reach Ray worker processes)."""
    ids = df[id_col].to_numpy(dtype=np.int64)
    texts = df[text_col].fillna("").astype(str)
    split = texts.str.split(sep, regex=False)
    counts = split.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        z = np.array([], dtype=np.int64)
        o = np.array([], dtype=object)
        return ids, counts, z, z, o, o, z
    ex = split.explode()
    segs = ex.to_numpy(dtype=object)
    stripped = ex.str.strip().to_numpy(dtype=object)
    h = np.asarray((hash_fn or hash64)(stripped)).view(np.int64)
    doc_flat = np.repeat(ids, counts)
    start = np.repeat(np.cumsum(counts) - counts, counts)
    idx_flat = np.arange(total, dtype=np.int64) - start
    pack = (doc_flat << np.int64(20)) + idx_flat
    return ids, counts, doc_flat, pack, segs, stripped, h


def _hash2(values: np.ndarray) -> np.ndarray:
    """Secondary 64-bit string hash, INDEPENDENT of ``hash64`` (different
    16-byte hash key) — the exact-verify tier of ``dedup_segments`` groups
    candidates by (h, h2) so two distinct segments whose primary hashes
    collide land in different groups and both survive."""
    from pandas.util import hash_array

    arr = np.asarray(values, dtype=object)
    return hash_array(arr, hash_key="driftraysegverif",
                      categorize=False).view(np.int64)


def dedup_segments(ds: rd.Dataset, id_col: str, text_col: str,
                   sep: str = "\n\n", verify: bool = True,
                   _hash_fn=None) -> rd.Dataset:
    """Corpus-level duplicated-SEGMENT removal (the CCNet/C4-style
    "drop every repeated paragraph except its first occurrence" pass):
    each document's text is split on ``sep``; any segment whose
    normalized hash occurs more than once ANYWHERE in the corpus is
    removed from all but the globally-first position (min ``(id_col,
    segment index)``) — including repeats inside one document.

    Scale shape (two-tier, mirrors ``relational.dedup_exact``):

    1. one flat pass emits 8-byte segment hashes ONLY (never text);
       duplicated hashes come from the distributed sort +
       adjacent-equal scan (``duplicate_values_sorted``);
    2. candidate positions of duplicated hashes (∝ duplicate density)
       reduce to a winner per hash via a #dup-hash-sized groupby-min of
       the packed (doc, idx) position, broadcast via ``ray.put``;
    3. one streaming rebuild pass re-splits each doc, keeps segments
       whose hash is unduplicated or whose position IS the winner, and
       rejoins with ``sep``.

    ``verify=True`` (default) is the exact-verify tier: candidates
    carry a SECOND independent 64-bit hash of the stripped text and the
    winner groupby keys on (h, h2), so a primary-hash collision between
    two DISTINCT segments puts them in different groups and both survive
    (over-drop odds fall from ~n²/2⁶⁴ to ~n²/2¹²⁸ — effectively exact,
    without ever shipping segment text).  ``verify=False`` skips the
    second hash pass (the MinHash-banding tradeoff).  ``id_col`` must be
    int64 and segment index < 2²⁰ per doc (packed ordering).

    Both corpus-scale passes are fully vectorized (``_flat_segments``:
    one ``.str.split`` + ``explode`` + one flat ``hash64`` per batch —
    no per-document Python loop); the rebuild keeps segments via one
    flat mask + a per-doc groupby join, the same shape as
    ``dedup_spans``' rebuild below.

    Output: ``id_col``, cleaned ``text_col``, ``n_kept``, ``n_dropped``.
    """
    from .relational import duplicate_values_sorted

    hfn = _hash_fn or hash64
    keys = ["h", "h2"] if verify else ["h"]

    def hashes_only(df: pd.DataFrame) -> pa.Table:
        h = _flat_segments(df, id_col, text_col, sep, hfn)[6]
        return pa.table({"h": pa.array(h)})

    proj = ds.select_columns([id_col, text_col]).materialize()
    dup_h = duplicate_values_sorted(
        proj.map_batches(hashes_only, batch_format="pandas"), "h")
    if len(dup_h) == 0:
        win_ref = ray.put(None)
    else:
        dup_sorted = np.sort(dup_h.astype(np.int64))
        dup_ref = ray.put(dup_sorted)

        def candidates(df: pd.DataFrame) -> pa.Table:
            f = _flat_segments(df, id_col, text_col, sep, hfn)
            _, _, _, pack, _, stripped, h = f
            m = np.isin(h, ray.get(dup_ref))
            out = {"h": pa.array(h[m]), "pack": pa.array(pack[m])}
            if verify:
                out["h2"] = pa.array(_hash2(stripped[m]))
            return pa.table(out)

        win_df = (proj.map_batches(candidates, batch_format="pandas")
                  .groupby(keys).min("pack").to_pandas())
        win = {k: win_df[k].to_numpy(np.int64) for k in keys}
        win["win"] = win_df["min(pack)"].to_numpy(np.int64)
        win_ref = ray.put((dup_sorted, win))

    def rebuild(df: pd.DataFrame) -> pa.Table:
        ids, counts, doc_flat, pack, segs, stripped, h = \
            _flat_segments(df, id_col, text_col, sep, hfn)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64()),
                             "n_dropped": pa.array([], pa.int64())})
        payload = ray.get(win_ref)
        keep = np.ones(len(h), dtype=bool)
        if payload is not None:
            dup_sorted, win = payload
            m = np.isin(h, dup_sorted)
            if m.any():
                cols = {"h": h[m], "pack": pack[m]}
                if verify:
                    cols["h2"] = _hash2(stripped[m])
                cf = pd.DataFrame(cols)
                wf = pd.DataFrame({k: win[k] for k in keys})
                wf["win"] = win["win"]
                merged = cf.merge(wf, on=keys, how="left")
                # every candidate's group has a winner row by construction
                keep[np.flatnonzero(m)] = (
                    merged["win"].to_numpy(np.int64)
                    == cf["pack"].to_numpy())
        starts = np.cumsum(counts) - counts
        n_kept = np.add.reduceat(keep.astype(np.int64), starts)
        joined = (pd.Series(segs[keep], dtype=object)
                  .groupby(doc_flat[keep], sort=False).agg(sep.join))
        cleaned = (joined.reindex(ids).fillna("")
                   .to_numpy(dtype=object))
        return pa.table({id_col: pa.array(ids),
                         text_col: pa.array(cleaned, pa.string()),
                         "n_kept": pa.array(n_kept),
                         "n_dropped": pa.array(counts - n_kept)})

    return proj.map_batches(rebuild, batch_format="pandas")


# -- exact duplicate-SPAN removal (substring dedup, token-window form) --------

_SPAN_BASE = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def dedup_spans(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text", window: int = 8,
                out_col: str = "clean_text",
                num_partitions: int = 64) -> rd.Dataset:
    """EXACT duplicate-span removal across the whole corpus — the
    substring-dedup pass of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), simplified from suffix arrays to
    fixed-length TOKEN windows: any ``window``-token span whose rolling
    hash occurs ≥ 2 times in the corpus (across documents or repeated
    within one) is removed everywhere EXCEPT its first occurrence
    (lexicographic min (doc_id, position)).

    Fully distributed, three exchanges, nothing driver-sized:

    1. per batch, VECTORIZED window hashes: tokens explode once
       (whitespace split, empties dropped), per-token ``hash64``; each
       window hash is a uint64 polynomial over ``sliding_window_view``
       (wrap-around arithmetic) — (h, ord, doc, pos) rows, ~32 B/token
       exchange weight, same order as Lee et al.'s suffix-array pass;
    2. ONE hash-partition by h (``partitioned_group_apply``): within a
       partition a pandas groupby finds hashes with count ≥ 2 and emits
       the NON-winner occurrences (doc, pos) — output ∝ duplicate
       density;
    3. masked positions union-tagged with the original docs and
       hash-partitioned by doc id: per partition, tokens re-explode,
       span coverage expands vectorized (repeat + tile), an anti-merge
       drops covered tokens and a groupby-join rebuilds each doc's text.

    ord packs (doc_id, pos) into one int64 (doc < 2^31, pos < 2^32 —
    checked).  64-bit window hashes mean ~2^-64 per-pair collision odds;
    at corpora ≥ 2^32 windows add an exact-verify join on the masked
    spans (the n-gram dedup path shows the shape).

    Returns (id_col, out_col, n_tokens, n_removed) — every input doc,
    cleaned text with surviving tokens joined by single spaces.
    """
    from .text import _explode_tokens

    if window < 2:
        raise ValueError("window must be >= 2")
    _require_int_ids(ds, id_col)
    powers = _SPAN_BASE ** np.arange(window, dtype=np.uint64)

    def window_rows(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"h": pd.Series([], dtype="int64"),
                              "ord": pd.Series([], dtype="int64"),
                              "doc": pd.Series([], dtype="int64"),
                              "pos": pd.Series([], dtype="int64")})
        if len(batch) == 0:
            return empty
        doc_ids, toks = _explode_tokens(batch, id_col, text_col)
        n = len(toks)
        if n < window:
            return empty
        if doc_ids.max() >= 2 ** 31:
            raise ValueError("doc ids must fit in int32 for span packing")
        th = hash64(toks)
        # position within doc (tokens are in row order, docs contiguous)
        change = np.ones(n, dtype=bool)
        change[1:] = doc_ids[1:] != doc_ids[:-1]
        run_start = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        pos = np.arange(n, dtype=np.int64) - run_start[run_id]
        # windows fully inside one doc
        valid = np.zeros(n - window + 1, dtype=bool)
        valid[:] = doc_ids[: n - window + 1] == doc_ids[window - 1:]
        if not valid.any():
            return empty
        from numpy.lib.stride_tricks import sliding_window_view

        wh = (sliding_window_view(th, window) * powers).sum(axis=1)
        wh = wh[valid].view(np.int64) if wh.flags.writeable else \
            wh[valid].copy().view(np.int64)
        d = doc_ids[: n - window + 1][valid].astype(np.int64)
        p = pos[: n - window + 1][valid]
        return pd.DataFrame({"h": wh, "ord": (d << np.int64(32)) + p,
                             "doc": d, "pos": p})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        window_rows, batch_format="pandas")

    def find_masked(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        grp = df.groupby("h", sort=False)["ord"]
        cnt = grp.transform("size").to_numpy()
        winner = grp.transform("min").to_numpy()
        bad = df.loc[(cnt >= 2) & (df["ord"].to_numpy() != winner),
                     ["doc", "pos"]]
        return bad.reset_index(drop=True)

    from .grouped import partitioned_group_apply

    masked = partitioned_group_apply(rows, ["h"], find_masked,
                                     num_partitions=num_partitions)

    # union-tag docs (kind 0) and masked spans (kind 1); rebuild per doc
    def tag_docs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": b[id_col].to_numpy(dtype=np.int64),
            "kind": np.zeros(len(b), dtype=np.int64),
            "txt": b[text_col].fillna("").to_numpy(dtype=object),
            "pos": np.full(len(b), -1, dtype=np.int64)})

    def tag_spans(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": b["doc"].to_numpy(dtype=np.int64),
            "kind": np.ones(len(b), dtype=np.int64),
            "txt": np.full(len(b), "", dtype=object),
            "pos": b["pos"].to_numpy(dtype=np.int64)})

    tagged = (ds.select_columns([id_col, text_col])
              .map_batches(tag_docs, batch_format="pandas")
              .union(masked.map_batches(tag_spans, batch_format="pandas")))

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            out_col: pd.Series([], dtype="object"),
            "n_tokens": pd.Series([], dtype="int64"),
            "n_removed": pd.Series([], dtype="int64")})
        texts = df[df["kind"] == 0]
        if len(texts) == 0:
            return empty
        spans = df[df["kind"] == 1]
        split = texts["txt"].str.split(" ")
        lens = split.map(len).to_numpy(dtype=np.int64)
        tok_doc = np.repeat(texts["doc"].to_numpy(), lens)
        toks = (np.concatenate([np.asarray(t, dtype=object) for t in split])
                if lens.sum() else np.array([], dtype=object))
        keep = toks != ""
        tok_doc, toks = tok_doc[keep], toks[keep]
        n = len(toks)
        change = np.ones(n, dtype=bool)
        if n:
            change[1:] = tok_doc[1:] != tok_doc[:-1]
        run_start = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        tok_pos = (np.arange(n, dtype=np.int64) - run_start[run_id]
                   if n else np.array([], dtype=np.int64))
        tok_df = pd.DataFrame({"doc": tok_doc, "pos": tok_pos, "tok": toks})
        if len(spans):
            cov_doc = np.repeat(spans["doc"].to_numpy(), window)
            cov_pos = (np.repeat(spans["pos"].to_numpy(), window)
                       + np.tile(np.arange(window, dtype=np.int64),
                                 len(spans)))
            cov = pd.DataFrame({"doc": cov_doc,
                                "pos": cov_pos}).drop_duplicates()
            merged = tok_df.merge(cov, on=["doc", "pos"], how="left",
                                  indicator=True)
            keep_mask = (merged["_merge"] == "left_only").to_numpy()
        else:
            merged = tok_df
            keep_mask = np.ones(len(tok_df), dtype=bool)
        kept = merged.loc[keep_mask, ["doc", "tok"]]
        joined = kept.groupby("doc", sort=False)["tok"].agg(" ".join)
        doc_index = texts["doc"].to_numpy()
        total = tok_df.groupby("doc", sort=False).size()
        out_text = (joined.reindex(doc_index).fillna("")
                    .to_numpy(dtype=object))
        n_tok = (total.reindex(doc_index).fillna(0)
                 .to_numpy(dtype=np.int64))
        kept_cnt = kept.groupby("doc", sort=False).size()
        n_keep = (kept_cnt.reindex(doc_index).fillna(0)
                  .to_numpy(dtype=np.int64))
        return pd.DataFrame({id_col: doc_index, out_col: out_text,
                             "n_tokens": n_tok,
                             "n_removed": n_tok - n_keep})

    return partitioned_group_apply(tagged, ["doc"], rebuild,
                                   num_partitions=num_partitions)


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Classic two-row Levenshtein DP with a band cap: returns the exact
    distance when ≤ cap, else cap+1.  O(len(a)·len(b)) per pair — the
    verify step for SHORT strings (names/titles), never documents."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cj = b[j - 1]
        cur = [j] + [0] * la
        lo = cap + 1
        for i in range(1, la + 1):
            c = min(prev[i] + 1, cur[i - 1] + 1,
                    prev[i - 1] + (a[i - 1] != cj))
            cur[i] = c
            if c < lo:
                lo = c
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[la] if prev[la] <= cap else cap + 1


def _deletion_key_hashes(s: str, d: int) -> np.ndarray:
    """64-bit blake2b hashes of every string reachable from ``s`` by
    deleting up to ``d`` characters (the SymSpell symmetric-delete
    neighborhood).  Guarantee: if levenshtein(a, b) ≤ d then a and b
    share at least one neighborhood string — every true pair collides.
    Size grows O(len^d); callers must keep keys short."""
    seen = {s}
    frontier = [s]
    for _ in range(d):
        nxt = []
        for t in frontier:
            for i in range(len(t)):
                u = t[:i] + t[i + 1:]
                if u not in seen:
                    seen.add(u)
                    nxt.append(u)
        frontier = nxt
    out = np.empty(len(seen), dtype=np.uint64)
    for i, t in enumerate(seen):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
    return out.view(np.int64)


def fuzzy_dedup_pairs(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", max_dist: int = 1,
                      max_bucket: int = 256,
                      num_partitions: int = 64) -> rd.Dataset:
    """EXACT edit-distance near-duplicate pairs over a SHORT string
    column: every unordered pair (id_a < id_b) with
    ``levenshtein ≤ max_dist``, plus the distance.

    Symmetric-delete (SymSpell) blocking, fully distributed:

    1. explode — each row emits one (key, id, text) row per
       delete-≤``max_dist`` neighborhood string (64-bit hashed).  The
       only stage that scales with len^max_dist: intended for names /
       titles / prefixes, never document bodies (raise on long keys).
    2. candidate pairs — keys hash-partition
       (``partitioned_group_apply``); within a partition one vectorized
       sort + run-boundary scan pairs ids sharing a key, verifying
       ``_levenshtein_capped`` right there (texts ride the explode, so
       no attach shuffle), emitting (id_a, id_b, dist) for true pairs
       only.  Hash collisions only ADD candidates (verification removes
       them); no true pair can be lost.
    3. distinct — pairs found under several shared keys collapse via one
       tiny groupby-min on the verified pair set (∝ dup density).

    Completeness is the SymSpell guarantee, so the result equals the SQL
    cross-join oracle ``levenshtein(a,b) <= d`` (q80).  ``max_bucket``
    bounds per-key pair blowup (a key shared by B rows yields B² work);
    exceeding it raises rather than silently dropping pairs.
    """
    from ray.data.aggregate import Min

    from .grouped import partitioned_group_apply

    _require_int_ids(ds, id_col)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        keys, ids, texts = [], [], []
        for i, t in zip(b[id_col].to_numpy(), b[text_col].to_numpy()):
            t = "" if t is None else str(t)
            if len(t) > 64:
                raise ValueError(
                    "fuzzy_dedup_pairs is a short-string operator "
                    f"(≤64 chars); got len {len(t)} — block on a prefix "
                    "or use minhash_lsh_dedup for documents")
            kh = _deletion_key_hashes(t, max_dist)
            keys.append(kh)
            ids.append(np.full(len(kh), i, dtype=np.int64))
            texts.extend([t] * len(kh))
        if not keys:
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 id_col: pd.Series([], dtype=np.int64),
                                 text_col: pd.Series([], dtype=object)})
        return pd.DataFrame({"key": np.concatenate(keys),
                             id_col: np.concatenate(ids),
                             text_col: np.array(texts, dtype=object)})

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas")

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["key", id_col], kind="mergesort",
                          ignore_index=True)
        keys = g["key"].to_numpy()
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy()
        bounds = np.flatnonzero(np.diff(keys) != 0) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(g)]))
        found: dict[tuple[int, int], int] = {}
        rejected: set[tuple[int, int]] = set()
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > max_bucket:
                raise RuntimeError(
                    f"fuzzy_dedup_pairs: {n} rows share one deletion key "
                    f"(max_bucket={max_bucket}) — key column too "
                    "low-entropy for symmetric-delete blocking")
            for x in range(s, e):
                for y in range(x + 1, e):
                    if ids[x] == ids[y]:
                        continue
                    a, b = ((x, y) if ids[x] < ids[y] else (y, x))
                    pk = (ids[a], ids[b])
                    if pk in found or pk in rejected:
                        continue
                    dv = _levenshtein_capped(texts[a], texts[b], max_dist)
                    if dv <= max_dist:
                        found[pk] = dv
                    else:
                        rejected.add(pk)
        items = sorted(found.items())
        return pd.DataFrame(
            {"id_a": np.array([p[0] for p, _ in items], dtype=np.int64),
             "id_b": np.array([p[1] for p, _ in items], dtype=np.int64),
             "dist": np.array([d for _, d in items], dtype=np.int64)})

    pairs = partitioned_group_apply(exploded, ["key"], verify_partition,
                                    num_partitions=num_partitions)
    # a pair found under several shared keys (possibly in different
    # partitions) collapses here; dist is a pure function of the pair, so
    # Min is just "pick the one value"
    return (pairs.groupby(["id_a", "id_b"])
            .aggregate(Min("dist", alias_name="dist")))


def semdedup(ds: rd.Dataset, id_col: str = "vec_id",
             vec_col: str = "embedding", n_clusters: int = 16,
             threshold: float = 0.95, iters: int = 10, seed: int = 42,
             num_partitions: int = 64) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means cluster the
    embedding space, then WITHIN each cluster drop semantic
    near-duplicates — rows whose cosine similarity to another cluster
    member is ≥ ``threshold`` — keeping each near-dup group's lowest id.
    The paper's key scale observation carries over verbatim: clustering
    first makes the pairwise step O(Σ c_i²) instead of O(N²), and
    clusters are independent so the quadratic work distributes.

    Distributed shape: ``kmeans_fit`` (streaming Lloyd passes, k×(d+1)
    partials) → broadcast centroids → ``kmeans_assign`` → ONE hash
    exchange by cluster id (``partitioned_group_apply``): each partition
    normalizes its clusters' vectors, runs a per-cluster Gram matmul and
    a greedy keep-first scan in id order — a row is kept iff no KEPT
    lower-id row in the same cluster is ≥ threshold similar (lowest-id
    is the deterministic representative).  Greedy, not transitive
    closure: in a chain a~b, b~c with a≁c, b drops but c survives
    (c is only compared against the kept set {a}).

    For cluster sizes where c² blocks matter (≫10⁵ rows per cluster at
    100 TB) raise ``n_clusters`` so E[c] stays bounded — the knob the
    paper itself scales with (50 k clusters for LAION).  Returns
    ``(id_col, cluster, keep)`` for every input row."""
    from .grouped import partitioned_group_apply
    from .embedding import kmeans_assign, kmeans_fit

    centers, _, _ = kmeans_fit(ds, n_clusters, vec_col=vec_col,
                               iters=iters, seed=seed)
    assigned = kmeans_assign(ds.select_columns([id_col, vec_col]),
                             centers, vec_col=vec_col)

    def pack(batch: pd.DataFrame) -> pa.Table:
        # Ship vectors as explicit binary through the exchange: tensor-
        # extension columns do not survive map_groups' pandas conversion
        # on some block layouts (ROUND_NOTES r4 gotcha).
        vb = [np.asarray(v, dtype=np.float64).tobytes()
              for v in batch[vec_col].to_numpy()]
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(np.int64)),
            "cluster": pa.array(batch["cluster"].to_numpy(np.int64)),
            "__vb": pa.array(vb, pa.binary())})

    assigned = assigned.map_batches(pack, batch_format="pandas")

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 "keep": pd.Series([], dtype="int64")})
        outs = []
        for cid, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            X = np.stack([np.frombuffer(b, dtype=np.float64)
                          for b in g["__vb"].to_numpy()[order]])
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            Xn = X / norms[:, None]
            sim = Xn @ Xn.T
            # keep iff no kept lower-id row is >= threshold similar;
            # greedy lower-triangular scan: row i drops iff some KEPT
            # lower-id row is >= threshold similar (dropped rows do not
            # themselves suppress later rows)
            n = len(ids)
            keep = np.ones(n, dtype=bool)
            for i in range(1, n):
                if (sim[i, :i][keep[:i]] >= threshold).any():
                    keep[i] = False
            outs.append(pd.DataFrame({
                id_col: ids,
                "cluster": np.full(n, cid, dtype=np.int64),
                "keep": keep.astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)

    return partitioned_group_apply(assigned, ["cluster"], per_cluster,
                                   num_partitions=num_partitions)


def incremental_minhash_dedup(ds: rd.Dataset, state_dir: str,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              num_perm: int = 128, num_bands: int = 16,
                              num_partitions: int = 64) -> rd.Dataset:
    """Cross-scan near-dup detection: the MinHash-LSH analogue of the
    exact ``SeenKeysStore`` (T2/D4) — a persisted seen-BUCKET store so a
    continuously-crawled corpus can flag each new scan's near-duplicates
    against everything previously scanned without ever re-reading old
    text.

    Per scan, two key-hash exchanges and one state append:

    1. signatures + band bucket keys in one actor-pool map chain
       (``MinHasher`` → ``_BandExploder``, the ``minhash_lsh_dedup``
       kernels — signatures never cross an exchange);
    2. old state (``state_dir/buckets_*.parquet``, bucket keys only,
       8 B/row) unions with the scan's ``(bh, id)`` rows tagged
       ``id = -1``; ONE hash exchange by ``bh`` co-locates each bucket,
       where a scan row is flagged ``dup_of_state`` if its bucket holds
       a state row and ``dup_in_scan`` if a LOWER-id scan row shares the
       bucket (first-wins, the ``minhash_lsh_dedup`` convention);
    3. per-doc OR across bands = one ``groupby(id).max`` exchange;
    4. the scan's bucket keys append as a NEW state part file
       (per-batch-distinct, duplicates across batches tolerated — the
       state is a membership multiset, so parts stay append-only and
       crash-safe; compaction can dedupe offline).  The part is written
       only AFTER the flag computation has fully executed (the returned
       Dataset is materialized first), so a crashed or retried scan
       never finds its own buckets already in state and mis-flags the
       whole rerun as duplicate.

    Bucket collision (not verified Jaccard) is the flag criterion — the
    standard streaming-dedup approximation; run ``minhash_lsh_dedup``
    within a scan when exact-verified pairs are needed.  State grows
    ∝ scanned docs × num_bands × 8 B.  Returns ``(id_col,
    dup_of_state, dup_in_scan, is_dup)`` for every scan row."""
    import glob as _glob

    from ray.data.aggregate import Max

    from .grouped import partitioned_group_apply

    _require_int_ids(ds, id_col)
    old_parts = sorted(_glob.glob(os.path.join(state_dir, "buckets_*.parquet")))

    def to_bh_doc(b: pd.DataFrame) -> pa.Table:
        doc = b[id_col].to_numpy(np.int64)
        if (doc < 0).any():
            # -1 tags state rows in the bucket exchange below; a negative
            # scan id would silently vanish from the output and poison
            # every bucket it touches as "seen in state"
            raise ValueError(
                f"incremental_minhash_dedup: {id_col} must be >= 0 "
                f"(got min {int(doc.min())})")
        return pa.table({"bh": pa.array(b["bh"].to_numpy(np.int64)),
                         "doc": pa.array(doc)})

    band = (ds.select_columns([id_col, text_col])
            .map_batches(MinHasher, fn_constructor_args=(id_col, text_col),
                         fn_constructor_kwargs={"num_perm": num_perm},
                         batch_format="pandas", concurrency=actor_pool())
            .map_batches(_BandExploder,
                         fn_constructor_args=(id_col, num_bands),
                         batch_format="pandas", concurrency=actor_pool())
            .map_batches(to_bh_doc, batch_format="pandas")
            .materialize())

    tagged = band
    if old_parts:
        state = rd.read_parquet(old_parts).map_batches(
            lambda t: pa.table({
                "bh": pc.cast(t["bh"], pa.int64()),
                "doc": pa.array(np.full(len(t), -1, dtype=np.int64))}),
            batch_format="pyarrow")
        tagged = band.union(state)

    big = np.iinfo(np.int64).max

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "s_state": pd.Series([], dtype="int64"),
                                 "s_scan": pd.Series([], dtype="int64")})
        doc = df["doc"].to_numpy(np.int64)
        mn_all = df.groupby("bh", sort=False)["doc"].transform("min").to_numpy()
        scan_doc = np.where(doc >= 0, doc, big)
        mn_scan = (pd.Series(scan_doc).groupby(df["bh"].to_numpy(), sort=False)
                   .transform("min").to_numpy())
        m = doc >= 0
        return pd.DataFrame({
            id_col: doc[m],
            "s_state": (mn_all[m] == -1).astype(np.int64),
            "s_scan": (doc[m] > mn_scan[m]).astype(np.int64)})

    flags = partitioned_group_apply(tagged, ["bh"], per_bucket,
                                    num_partitions=num_partitions)
    out = flags.groupby(id_col).aggregate(
        Max("s_state", alias_name="dup_of_state"),
        Max("s_scan", alias_name="dup_in_scan"))

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column("is_dup", pc.max_element_wise(
            t["dup_of_state"], t["dup_in_scan"]))

    # execute the flag computation BEFORE committing this scan's buckets
    # to state: state advances iff the flags exist, so a failed scan can
    # simply re-run (an eager append here would make the rerun see its
    # own buckets and flag the entire scan dup_of_state)
    result = out.map_batches(finish, batch_format="pyarrow").materialize()

    os.makedirs(state_dir, exist_ok=True)
    new_part = os.path.join(state_dir, f"buckets_{len(old_parts):05d}.parquet")
    bucket_tbl = pa.table({"bh": pa.concat_arrays(
        [pa.array(np.unique(t["bh"].to_numpy()))
         for t in band.select_columns(["bh"]).iter_batches(
             batch_format="pyarrow", batch_size=1 << 20)] or
        [pa.array([], pa.int64())])})
    pq.write_table(bucket_tbl, new_part)
    return result
