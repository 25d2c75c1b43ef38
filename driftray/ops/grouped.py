"""Vectorized multi-group execution — the antidote to per-key ``map_groups``.

Ray's ``groupby(key).map_groups(fn)`` invokes one Python callback per KEY;
with high-cardinality keys (users, nodes, documents) the per-group overhead
melts wall-time (measured 61 s for 640 k groups vs 0.8 s for a sorted scan,
ROUND_NOTES r1).  The pattern here instead:

1. hash-PARTITION by key — ``__part = hash(key) % P`` with small P
   (default 64, size ~2-4× cluster cores at scale);
2. ``groupby(__part).map_groups`` — ONE callback per partition, so the
   per-group overhead is O(P), not O(#keys);
3. inside the callback, process ALL of the partition's keys in a single
   vectorized pass (pandas groupby C kernels / run-boundary numpy), never
   a Python loop per key.

Partitioning contract (document at every call site): one PARTITION —
i.e. the combined rows of ~#keys/P keys — must fit in a worker's heap.
Raise ``num_partitions`` as data grows; hash partitioning keeps them
balanced unless one single key dominates (salt that key upstream).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..checks import hash_keys

PART_COL = "__part"


def with_partition_column(ds: rd.Dataset, key_cols: list[str],
                          num_partitions: int = 64) -> rd.Dataset:
    """Append ``__part = hash(key_cols) % num_partitions`` (null-stable
    64-bit key hash from ``checks.hash_keys`` — 8 bytes/row of added
    shuffle weight, never the raw key)."""

    def add(t: pa.Table) -> pa.Table:
        part = (hash_keys(t, key_cols) % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column(PART_COL, pa.array(part))

    return ds.map_batches(add, batch_format="pyarrow")


def partitioned_group_apply(ds: rd.Dataset, key_cols: list[str],
                            fn: Callable[[pd.DataFrame], pd.DataFrame],
                            num_partitions: int = 64,
                            batch_format: str = "pandas") -> rd.Dataset:
    """Apply ``fn`` once per hash PARTITION of the keys (not per key).

    ``fn`` receives every row of its partition (the ``__part`` helper
    column already dropped) and must handle ALL keys present — vectorized
    (``df.groupby(...)`` C kernels, run-boundary numpy), never a Python
    loop over keys.  Because partitions are disjoint by key hash, any
    per-key computation inside a partition is globally correct.

    The input block count is bounded (shuffle-free coalesce) before the
    ``groupby`` shuffle: Ray's sort-based exchange emits O(n_blocks²)
    pieces, and thousands of small input blocks otherwise flood the
    driver's in-process object store with sub-100 KB objects
    (ROUND_NOTES r2 — measured 4.9 GB driver RSS; the same bound
    ``duplicate_values_sorted`` applies before its sort).
    """
    parted = with_partition_column(ds, key_cols, num_partitions)
    parted = parted.repartition(max(num_partitions, 16))

    if batch_format == "pandas":
        # Emit ARROW blocks even though fn works in pandas: Ray's
        # sort-based exchange (any later groupby/sort over this output)
        # is ~14x slower on pandas blocks than on arrow blocks
        # (measured 27s vs 1.9s for a 292k-row 64-block groupby,
        # ROUND_NOTES r4) — the conversion here is one cheap pass.
        def wrapper(g: pd.DataFrame) -> pa.Table:
            out = fn(g.drop(columns=[PART_COL]))
            if isinstance(out, pd.DataFrame):
                return pa.Table.from_pandas(out, preserve_index=False)
            return out
    else:
        def wrapper(g: pa.Table) -> pa.Table:
            return fn(g.drop_columns([PART_COL]))

    return parted.groupby(PART_COL).map_groups(wrapper,
                                               batch_format=batch_format)


def grouped_quantile(ds: rd.Dataset, key_cols: list[str], value_col: str,
                     q: float = 0.5, out_col: str | None = None,
                     num_partitions: int = 64) -> rd.Dataset:
    """Exact per-group quantile via one pandas C-kernel pass per hash
    partition (all groups of a partition in one ``df.groupby().quantile()``).

    Partitioning assumption: one partition's rows fit in a worker.  For
    quantiles over truly giant single groups use the t-digest sketch path
    (``sketches.TDigest`` + merge) and accept its tolerance instead."""
    out_col = out_col or f"q{int(q * 100)}_{value_col}"

    def part_quantile(g: pd.DataFrame) -> pd.DataFrame:
        res = (g.groupby(key_cols, sort=False, observed=True)[value_col]
               .quantile(q).reset_index())
        return res.rename(columns={value_col: out_col})

    return partitioned_group_apply(
        ds.select_columns(key_cols + [value_col]), key_cols, part_quantile,
        num_partitions=num_partitions)


def grouped_quantile_digest(ds: rd.Dataset, key_cols: list[str],
                            value_col: str, q: float = 0.5,
                            out_col: str | None = None,
                            num_partitions: int = 64,
                            delta: int = 200) -> rd.Dataset:
    """Per-group quantile via t-digest PARTIAL AGGREGATION — the true
    100 TB path for A4 quantiles: each batch reduces to one digest per key
    it contains (KB-scale), digests merge per key in a partitioned pass,
    and no worker ever holds a group's raw column (``grouped_quantile``'s
    partitioning assumption disappears).  Tolerance: t-digest accuracy
    (tails tightest; tolerance-tested vs exact in the suite)."""
    from .. import sketches

    out_col = out_col or f"q{int(q * 100)}_{value_col}"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows_k, rows_b = [], []
        for k, grp in b.groupby(key_cols[0] if len(key_cols) == 1
                                else key_cols, sort=False, observed=True):
            d = sketches.TDigest(delta)
            d.update(grp[value_col].to_numpy(dtype=np.float64))
            rows_k.append(k)
            rows_b.append(sketches.dumps(d))
        if len(key_cols) == 1:
            out = pd.DataFrame({key_cols[0]: rows_k})
        else:
            out = pd.DataFrame(rows_k, columns=key_cols)
        out["__dig"] = rows_b
        return out

    partials = ds.select_columns(key_cols + [value_col]).map_batches(
        partial, batch_format="pandas")

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        out_keys, out_q = [], []
        for k, grp in g.groupby(key_cols[0] if len(key_cols) == 1
                                else key_cols, sort=False, observed=True):
            merged = None
            for blob in grp["__dig"]:
                d = sketches.loads(blob)
                merged = d if merged is None else merged.merge(d)
            out_keys.append(k)
            out_q.append(merged.quantile(q))
        if len(key_cols) == 1:
            out = pd.DataFrame({key_cols[0]: out_keys})
        else:
            out = pd.DataFrame(out_keys, columns=key_cols)
        out[out_col] = np.array(out_q, dtype=np.float64)
        return out

    return partitioned_group_apply(partials, key_cols, merge_partition,
                                   num_partitions=num_partitions)


def grouped_top_k(ds: rd.Dataset, key_cols: list[str], order_col: str,
                  k: int, descending: bool = True,
                  columns: list[str] | None = None,
                  tie_cols: list[str] | None = None) -> pd.DataFrame:
    """Per-group top-k WITHOUT materializing any group in one worker:
    every batch reduces to ≤ k rows per key it contains (pandas C sort +
    ``groupby.head``), then the surviving ≤ blocks×keys×k rows merge
    exactly on the driver.  The hot-group straggler of
    ``groupby(key).map_groups(head_k)`` disappears — no worker ever holds
    more than batch_size rows.

    ``tie_cols`` (always ascending) break order_col ties so the rank-k
    boundary is deterministic — include them whenever ties are possible.

    Returns a small pandas DataFrame (rows ≤ #keys × k)."""
    cols = columns or [c for c in ds.schema().names]
    sort_cols = [order_col] + (tie_cols or [])
    ascending = [not descending] + [True] * len(tie_cols or [])
    # tie columns must survive the projection up to the final merge
    # (dropped at the end if the caller didn't ask for them)
    carry = cols + [c for c in sort_cols if c not in cols]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b[carry]
        return (b.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort")
                .groupby(key_cols, sort=False, observed=True)
                .head(k)[carry])

    partial = ds.select_columns(carry).map_batches(
        local, batch_format="pandas").to_pandas()
    if len(partial) == 0:
        return partial[cols] if len(partial.columns) else partial
    return (partial.sort_values(sort_cols, ascending=ascending,
                                kind="mergesort")
            .groupby(key_cols, sort=False, observed=True)
            .head(k).reset_index(drop=True)[cols])

def grouped_corr(ds: rd.Dataset, key_cols: list[str], x_col: str,
                 y_col: str, out_col: str = "corr") -> rd.Dataset:
    """Pearson correlation of ``x_col`` vs ``y_col`` per key, in ONE
    distributed pass.

    Per-batch partial moment sums (n, Σx, Σy, Σx², Σy², Σxy) combine
    inside ``map_batches`` — the shuffle carries #keys × 6 doubles, never
    row data — then a keys-sized groupby-sum and the closed-form
    correlation on the merged moments (sample/population normalization
    cancels, so this equals SQL ``CORR``).  Keys with fewer than 2 rows
    or zero variance yield null, matching DuckDB.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[x_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        y = np.asarray(t[y_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        pdf = pd.DataFrame({k: t[k].to_pandas() for k in key_cols})
        pdf["__n"] = np.float64(1.0)
        pdf["__sx"], pdf["__sy"] = x, y
        pdf["__sxx"], pdf["__syy"], pdf["__sxy"] = x * x, y * y, x * y
        g = pdf.groupby(key_cols, as_index=False, sort=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_cols)
            .aggregate(Sum("__n", alias_name="n"),
                       Sum("__sx", alias_name="sx"),
                       Sum("__sy", alias_name="sy"),
                       Sum("__sxx", alias_name="sxx"),
                       Sum("__syy", alias_name="syy"),
                       Sum("__sxy", alias_name="sxy")))

    def final(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False))
        sx = np.asarray(t["sx"].to_numpy(zero_copy_only=False))
        sy = np.asarray(t["sy"].to_numpy(zero_copy_only=False))
        sxx = np.asarray(t["sxx"].to_numpy(zero_copy_only=False))
        syy = np.asarray(t["syy"].to_numpy(zero_copy_only=False))
        sxy = np.asarray(t["sxy"].to_numpy(zero_copy_only=False))
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            r = cov / np.sqrt(vx * vy)
        ok = (n >= 2) & (vx > 0) & (vy > 0)
        out = pa.table({k: t[k] for k in key_cols})
        return out.append_column(
            out_col, pa.array(np.where(ok, r, np.nan), pa.float64(),
                              mask=~ok))

    return sums.map_batches(final, batch_format="pyarrow")

def grouped_concat(ds: rd.Dataset, key_cols: list[str],
                   order_cols: list[str], value_col: str, sep: str,
                   out_col: str = "concat",
                   num_partitions: int = 64) -> rd.Dataset:
    """Ordered per-key string concatenation — SQL
    ``STRING_AGG(value, sep ORDER BY order_cols)``.

    Hash-partitioned: one callback per partition sorts ALL its keys once
    (mergesort) and joins per key with pandas' grouped agg — no per-key
    Ray tasks, no global sort.  ``order_cols`` must totally order rows
    within a key.  Partitioning contract: one partition's rows and its
    output strings fit in a worker's heap — raise ``num_partitions``
    with data size; a pathological hot key (giant output string) should
    be capped or salted upstream."""

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df[key_cols].copy()
            out[out_col] = pd.Series([], dtype=object)
            return out
        df = df.sort_values(key_cols + order_cols, kind="mergesort",
                            ignore_index=True)
        g = (df.groupby(key_cols, sort=False)[value_col]
             .agg(sep.join).reset_index())
        return g.rename(columns={value_col: out_col})

    return partitioned_group_apply(ds, key_cols, per_partition,
                                   num_partitions=num_partitions)


def grouped_winsorize_stats(ds: rd.Dataset, key_cols: list[str],
                            value_col: str, q_lo: float = 0.05,
                            q_hi: float = 0.95,
                            num_partitions: int = 64) -> rd.Dataset:
    """Per-group winsorization against EXACT order-statistic bounds: the
    bound for quantile q is the ceil(q·n)-th smallest value (SQL
    ``quantile_disc`` semantics — a real data value, so engine and oracle
    agree bit-for-bit; no interpolation float drift).

    Returns one row per group: ``n, lo, hi, n_below, n_above, wins_sum``
    where ``n_below``/``n_above`` count STRICT outliers and ``wins_sum``
    is the sum after clipping to [lo, hi] — exact int64 for integer
    inputs (pre-scale floats to cents upstream).

    One hash exchange; per partition the kernel sorts all its groups once
    and reads every bound by index arithmetic over run boundaries — no
    per-group Python.
    """
    if not (0.0 < q_lo <= q_hi < 1.0):
        raise ValueError("need 0 < q_lo <= q_hi < 1")

    def per_partition(df: pd.DataFrame) -> pa.Table:
        cols = key_cols + ["n", "lo", "hi", "n_below", "n_above", "wins_sum"]
        if len(df) == 0:
            return pa.Table.from_pandas(pd.DataFrame(columns=cols),
                                        preserve_index=False)
        df = df.sort_values(key_cols + [value_col], kind="mergesort",
                            ignore_index=True)
        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"grouped_winsorize_stats needs an integer value column "
                f"for exactness; got {v.dtype} — pre-scale floats upstream")
        m = len(df)
        key_change = np.zeros(m, dtype=bool)
        key_change[0] = True
        for k in key_cols:
            kv = df[k].to_numpy()
            key_change[1:] |= kv[1:] != kv[:-1]
        run_id = np.cumsum(key_change) - 1
        run_start = np.flatnonzero(key_change)
        n = np.diff(np.append(run_start, m))
        # ceil(q*n)-th smallest, 1-indexed → offset ceil(q*n)-1 in the run
        k_lo = np.maximum(np.ceil(q_lo * n).astype(np.int64), 1) - 1
        k_hi = np.maximum(np.ceil(q_hi * n).astype(np.int64), 1) - 1
        lo = v[run_start + k_lo]
        hi = v[run_start + k_hi]
        below = v < lo[run_id]
        above = v > hi[run_id]
        clipped = np.clip(v, lo[run_id], hi[run_id]).astype(np.int64)
        out = df.iloc[run_start][key_cols].reset_index(drop=True)
        out["n"] = n.astype(np.int64)
        out["lo"] = lo.astype(np.int64)
        out["hi"] = hi.astype(np.int64)
        out["n_below"] = np.add.reduceat(below.astype(np.int64), run_start)
        out["n_above"] = np.add.reduceat(above.astype(np.int64), run_start)
        # exactness guard (same contract as anomaly.rolling_zscore): the
        # per-group Σ|clipped| must fit int64 or reduceat wraps SILENTLY
        # where the SQL BIGINT oracle would raise — reject loudly.  The
        # bound is PER GROUP (that group's max magnitude × that group's
        # size): a partition-wide cmax×nmax cross product would reject a
        # small group of huge values coexisting with a huge group of
        # small values, both of which sum fine.
        if m:
            gmax = np.maximum.reduceat(np.abs(clipped), run_start)
            over = gmax.astype(object) * n.astype(object) >= 2**63
            if over.any():
                j = int(np.flatnonzero(over)[0])
                raise OverflowError(
                    f"grouped_winsorize_stats: group of {int(n[j])} values "
                    f"with magnitude up to {int(gmax[j])} can overflow the "
                    "exact int64 wins_sum — rescale the value column "
                    "upstream")
        out["wins_sum"] = np.add.reduceat(clipped, run_start)
        return pa.Table.from_pandas(out, preserve_index=False)

    return partitioned_group_apply(
        ds.select_columns(key_cols + [value_col]), key_cols, per_partition,
        num_partitions=num_partitions)
