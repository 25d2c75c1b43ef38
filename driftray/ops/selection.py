"""Distributed EXACT order statistics — kth smallest / quantiles with no
global sort and no driver materialization.

``Dataset.sort`` is an all-to-all exchange of every row; a t-digest
(``sketches``) is tiny but approximate.  This module fills the gap between
them: the classic iterative histogram-narrowing selection algorithm
(distributed quickselect).  Each round is ONE ``map_batches`` pass over
the (column-pruned) input emitting a ``n_buckets``-long count vector per
batch; the driver merges a few KB of counts, picks the bucket containing
the target rank, and narrows the candidate interval ~``n_buckets``× —
so even 10^12 rows resolve in ~4 rounds plus one final candidate fetch of
at most ``fetch_threshold`` rows.  Nothing row-scale ever reaches the
driver, and there is no shuffle at all: every round is embarrassingly
parallel map + tiny reduce.

Scale shape at 100 TB: rounds × (pruned column scan).  When the input is
re-read from Parquet each round the scan cost dominates; callers looping
many quantiles over the same data should ``materialize()`` the single
projected column once (∝ 8 bytes/row in the object store) and pass that.

Engine extension beyond the reference (which has no order statistics —
/root/reference/DESIGN.md profiles mean/min/max only); the exact median
query (q85) oracle-checks it against a DuckDB window-function rank.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _valid_values(t: pa.Table, col: str) -> np.ndarray:
    """Column values as a numpy array with nulls and NaNs removed."""
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.drop_null().to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.floating):
        v = v[~np.isnan(v)]
    return v


def _interval_mask(v: np.ndarray, lo, hi, hi_incl: bool) -> np.ndarray:
    return (v >= lo) & ((v <= hi) if hi_incl else (v < hi))


def exact_kth(ds: rd.Dataset, col: str, k: int, n_buckets: int = 512,
              fetch_threshold: int = 65536, max_iters: int = 64):
    """EXACT kth-smallest (1-based) value of a numeric column.

    Iterative histogram narrowing: maintain a candidate interval known to
    contain the answer plus the target's rank *within* that interval;
    each round histograms the interval into ``n_buckets`` equal-width
    buckets (one vectorized ``np.bincount`` per batch, driver merges KB
    of counts), steps into the bucket containing the rank, and repeats
    until the bucket holds ≤ ``fetch_threshold`` rows — those candidates
    (and only those) are fetched and resolved with ``np.partition``.

    Exactness: integer columns use pure integer bucket math (no float
    round-trip — correct above 2^53); float columns carry an explicit
    half-open/closed interval so every value is counted in exactly one
    bucket per round and boundary values can never be double-counted or
    lost.  Nulls and NaNs are excluded; ``k`` ranks the remaining rows.
    Duplicate-heavy columns converge too: an interval that collapses to a
    single value IS the answer (no fetch needed).
    """
    if k < 1:
        raise ValueError("k must be >= 1 (1-based rank)")
    proj = ds.select_columns([col])

    def stats(t: pa.Table) -> pa.Table:
        # Integer min/max ride int64 columns end to end (consumed via
        # take_all -> Python int, never pandas/float64) so int64 order
        # columns with |v| > 2^53 keep exact bounds.
        v = _valid_values(t, col)
        none_i = pa.array([None], pa.int64())
        none_f = pa.array([None], pa.float64())
        if len(v) == 0:
            return pa.table({"ilo": none_i, "ihi": none_i,
                             "flo": none_f, "fhi": none_f,
                             "n": pa.array([0], pa.int64()),
                             "is_int": pa.array([True])})
        if np.issubdtype(v.dtype, np.integer):
            return pa.table({"ilo": pa.array([int(v.min())], pa.int64()),
                             "ihi": pa.array([int(v.max())], pa.int64()),
                             "flo": none_f, "fhi": none_f,
                             "n": pa.array([len(v)], pa.int64()),
                             "is_int": pa.array([True])})
        return pa.table({"ilo": none_i, "ihi": none_i,
                         "flo": pa.array([float(v.min())], pa.float64()),
                         "fhi": pa.array([float(v.max())], pa.float64()),
                         "n": pa.array([len(v)], pa.int64()),
                         "is_int": pa.array([False])})

    rows = proj.map_batches(stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if k > n:
        raise ValueError(f"k={k} exceeds non-null row count {n}")
    valid = [r for r in rows if r["n"] > 0]
    is_int = all(r["is_int"] for r in valid)
    if is_int:
        lo = min(int(r["ilo"]) for r in valid)
        hi = max(int(r["ihi"]) for r in valid)
    else:
        lo = min(float(r["flo"] if r["flo"] is not None else r["ilo"])
                 for r in valid)
        hi = max(float(r["fhi"] if r["fhi"] is not None else r["ihi"])
                 for r in valid)
    hi_incl = True
    k_rem = k

    def fetch(flo, fhi, fincl) -> np.ndarray:
        def grab(t: pa.Table) -> pa.Table:
            v = _valid_values(t, col)
            return pa.table({col: v[_interval_mask(v, flo, fhi, fincl)]})

        return proj.map_batches(grab,
                                batch_format="pyarrow").to_pandas()[col].to_numpy()

    for _ in range(max_iters):
        if lo == hi:
            return lo
        if is_int:
            span = hi - lo + 1                        # exact Python int
            width = -(-span // n_buckets)            # ceil
            nb = -(-span // width)
            edges = None
        else:
            width = (hi - lo) / n_buckets
            nb = n_buckets
            if width == 0.0:                          # denormal-tight range
                vals = fetch(lo, hi, hi_incl)
                return np.partition(vals, k_rem - 1)[k_rem - 1]
            # Bucket membership AND next-round interval bounds both come
            # from this one edges array (searchsorted on workers, indexing
            # on the driver), so IEEE rounding can never count a value in
            # bucket j yet exclude it from round j+1's [edges[j], edges[j+1])
            # mask (ADVICE r3 boundary-drift finding).
            edges = lo + np.arange(nb + 1, dtype=np.float64) * width
            np.minimum(edges, hi, out=edges)   # keep monotone if width rounds up
            edges[0], edges[-1] = lo, hi

        cur = (lo, hi, hi_incl, width, nb, edges)

        def hist(t: pa.Table, _c=cur) -> pa.Table:
            clo, chi, cincl, cw, cnb, ce = _c
            v = _valid_values(t, col)
            v = v[_interval_mask(v, clo, chi, cincl)]
            if is_int:
                # uint64 wraparound offset is exact for the full int64
                # range (v >= clo so 0 <= v-clo < 2^64), no float round-trip
                # and no int64 overflow when hi-lo spans > int64 max.
                off = (v.astype(np.int64).astype(np.uint64)
                       - np.uint64(int(clo) & 0xFFFFFFFFFFFFFFFF))
                idx = (off // np.uint64(cw)).astype(np.int64)
            else:
                idx = np.searchsorted(ce, v, side="right") - 1
                idx = np.clip(idx, 0, cnb - 1)
            return pa.table({"b": pa.array(np.arange(cnb, dtype=np.int64)),
                             "n": pa.array(np.bincount(idx, minlength=cnb)
                                           .astype(np.int64))})

        hdf = proj.map_batches(hist, batch_format="pyarrow").to_pandas()
        counts = np.zeros(nb, dtype=np.int64)
        np.add.at(counts, hdf["b"].to_numpy(), hdf["n"].to_numpy())
        cum = np.cumsum(counts)
        j = int(np.searchsorted(cum, k_rem, side="left"))
        k_rem -= int(cum[j - 1]) if j > 0 else 0
        if is_int:
            blo = lo + j * width
            bhi = min(lo + (j + 1) * width - 1, hi)
            bincl = True
        else:
            blo = float(edges[j])
            if j == nb - 1:
                bhi, bincl = hi, hi_incl
            else:
                bhi, bincl = float(edges[j + 1]), False
        if counts[j] <= fetch_threshold:
            vals = fetch(blo, bhi, bincl)
            return np.partition(vals, k_rem - 1)[k_rem - 1]
        if (blo, bhi, bincl) == (lo, hi, hi_incl):
            vals = fetch(blo, bhi, bincl)    # cannot narrow further
            return np.partition(vals, k_rem - 1)[k_rem - 1]
        lo, hi, hi_incl = blo, bhi, bincl
    raise RuntimeError(f"exact_kth did not converge in {max_iters} rounds")


def exact_quantile(ds: rd.Dataset, col: str, q: float,
                   n_buckets: int = 512, fetch_threshold: int = 65536):
    """EXACT q-quantile with LOWER interpolation — the value at 0-based
    sorted position ``floor(q * (n - 1))`` — i.e. always an actual data
    value, matching the SQL window-rank oracle
    ``rn = (n - 1) * q + 1`` with integer arithmetic (q85).

    Two distributed passes more than :func:`exact_kth` needs nothing:
    the count rides the first stats pass inside ``exact_kth``'s driver
    bookkeeping, so this is a thin rank adapter."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    cnt = ds.select_columns([col]).map_batches(
        lambda t: pa.table({"n": pa.array([len(_valid_values(t, col))],
                                          pa.int64())}),
        batch_format="pyarrow").sum("n")
    n = int(cnt)
    if n == 0:
        raise ValueError(f"no non-null values in {col}")
    k = int(np.floor(q * (n - 1))) + 1
    return exact_kth(ds, col, k, n_buckets=n_buckets,
                     fetch_threshold=fetch_threshold)
