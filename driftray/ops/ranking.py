"""Exact global ranking / NTILE without a single-node sort.

``ROW_NUMBER() OVER (ORDER BY ...)`` with NO ``PARTITION BY`` is the
classic distributed-window hard case: the order is GLOBAL, so a naive
implementation funnels every row through one worker (exactly what
``row_number_by_key`` with a constant key would do).  The shape here is
the two-tier prefix sum already used across this repo
(``curation.prefix_sum_by_group``, ``curation.token_budget_select``):

1. one Min/Max pass fixes an equal-width bucket grid over the order
   column (integer-exact math for integer columns — no float round-trip);
2. one tiny groupby counts rows per bucket; the driver prefix-sums the
   ``n_buckets`` counts into per-bucket GLOBAL offsets (KB of state);
3. one partitioned pass ranks every bucket's rows locally — all buckets
   of a hash partition sorted + run-boundary indexed in one vectorized
   kernel (``ops/grouped.partitioned_group_apply``) — and adds the
   bucket's offset.  Equal order values always share a bucket, so the
   ``tiebreak_col`` total order is resolved entirely inside one kernel
   call.

No all-to-all over full rows beyond the single hash-partition exchange,
no global sort, nothing row-scale on the driver.  Partitioning
assumption: one hash partition (~``n_buckets / num_partitions`` buckets'
rows) must fit in a worker's heap — raise ``n_buckets`` for skewed value
distributions.  A single dominant VALUE still lands in one bucket by
construction (its ties must be broken in one place); that is inherent to
exact global ranking, not an implementation shortcut.

Engine extension beyond the reference (no window functions there —
/root/reference/DESIGN.md profiles only); oracle-checked vs DuckDB
``NTILE`` / window rank (q87).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .grouped import partitioned_group_apply

_B = "__rbkt"


def _grid(ds: rd.Dataset, order_col: str, n_buckets: int):
    """One pass: (lo, width, nb, is_int, n_rows) for the bucket grid."""
    proj = ds.select_columns([order_col])

    def stats(t: pa.Table) -> pa.Table:
        col = t[order_col]
        if col.null_count:
            raise ValueError(f"global_rank: {order_col} must be non-null")
        if (pa.types.is_floating(col.type)
                and pc.any(pc.is_nan(col)).as_py()):
            raise ValueError(f"global_rank: {order_col} must be NaN-free "
                             "(NaN has no total order)")
        none_i = pa.array([None], pa.int64())
        none_f = pa.array([None], pa.float64())
        if len(col) == 0:
            return pa.table({"ilo": none_i, "ihi": none_i,
                             "flo": none_f, "fhi": none_f,
                             "n": pa.array([0], pa.int64())})
        mm = pc.min_max(col)
        if pa.types.is_integer(col.type):
            # int64 bounds ride int64 columns (consumed via take_all ->
            # Python int) — exact above 2^53, shared fix with selection.py
            return pa.table({"ilo": pa.array([mm["min"].as_py()], pa.int64()),
                             "ihi": pa.array([mm["max"].as_py()], pa.int64()),
                             "flo": none_f, "fhi": none_f,
                             "n": pa.array([len(col)], pa.int64())})
        return pa.table({"ilo": none_i, "ihi": none_i,
                         "flo": pa.array([float(mm["min"].as_py())]),
                         "fhi": pa.array([float(mm["max"].as_py())]),
                         "n": pa.array([len(col)], pa.int64())})

    rows = proj.map_batches(stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return None
    valid = [r for r in rows if r["n"] > 0]
    # Dataset.schema() types are pa.DataType for arrow blocks but numpy
    # dtypes for pandas blocks (ROUND_NOTES gotcha) — accept both
    sch = ds.schema()
    typ = sch.types[list(sch.names).index(order_col)]
    is_int = (pa.types.is_integer(typ) if isinstance(typ, pa.DataType)
              else np.issubdtype(typ, np.integer))
    if is_int:
        lo = min(int(r["ilo"]) for r in valid)
        hi = max(int(r["ihi"]) for r in valid)
        span = hi - lo + 1
        width = -(-span // n_buckets)                      # ceil
        nb = -(-span // width)
    else:
        lo = min(float(r["flo"] if r["flo"] is not None else r["ilo"])
                 for r in valid)
        hi = max(float(r["fhi"] if r["fhi"] is not None else r["ihi"])
                 for r in valid)
        width = (hi - lo) / n_buckets or 1.0               # lo==hi → 1 bucket
        nb = n_buckets
    return lo, width, nb, is_int, n


def _with_bucket(ds: rd.Dataset, order_col: str, lo, width, nb,
                 is_int: bool) -> rd.Dataset:
    def add(t: pa.Table) -> pa.Table:
        v = t[order_col].to_numpy(zero_copy_only=False)
        if is_int:
            # exact uint64 wraparound offset (v >= lo so 0 <= v-lo < 2^64);
            # no float round-trip, no overflow on full-range int64 spans
            off = (v.astype(np.int64).astype(np.uint64)
                   - np.uint64(int(lo) & 0xFFFFFFFFFFFFFFFF))
            b = (off // np.uint64(width)).astype(np.int64)
        else:
            b = ((v - lo) / width).astype(np.int64)
        # clip keeps the bucket map monotone while guarding the offset
        # array against float-precision edge effects near lo/hi — rank
        # correctness needs monotone + consistent buckets, not exact ones
        b = np.clip(b, 0, nb - 1)
        return t.append_column(_B, pa.array(b.astype(np.int64)))

    return ds.map_batches(add, batch_format="pyarrow")


def global_rank(ds: rd.Dataset, order_col: str, tiebreak_cols: list[str],
                out_col: str = "rank", n_buckets: int = 1024,
                num_partitions: int = 64, materialize_input: bool = True,
                _grid_info=None) -> rd.Dataset:
    """Append the exact 1-based GLOBAL rank under
    ``ORDER BY order_col, *tiebreak_cols`` (all ascending).

    ``order_col`` must be numeric and non-null; ``tiebreak_cols`` must
    complete a total order (include a unique id) or equal rows get an
    arbitrary-but-consistent order within their tie group.  Output: all
    input columns plus int64 ``out_col``.

    The input is consumed three times (grid, bucket counts, rank pass);
    with ``materialize_input`` (default) it is pinned to the object
    store ONCE so a lazy upstream pipeline is not re-executed per pass —
    essential when chaining rank calls (each lazy re-execution would
    multiply).  Pass ``False`` only when the input is a cheap pruned
    parquet read you'd rather re-scan than spill.
    """
    if materialize_input:
        ds = ds.materialize()
    g = _grid_info if _grid_info is not None else _grid(ds, order_col,
                                                        n_buckets)
    if g is None:
        def tag_empty(t: pa.Table) -> pa.Table:
            return t.append_column(out_col, pa.array([], pa.int64()))
        return ds.map_batches(tag_empty, batch_format="pyarrow")
    lo, width, nb, is_int, _n = g
    bds = _with_bucket(ds, order_col, lo, width, nb, is_int)

    # count over a PRUNED re-attach, not bds: the select_columns below
    # cannot push through map_batches, so counting on bds would stream
    # every input column through the bucket stage a second time —
    # recomputing the (one subtract + divide) bucket on the narrow
    # projection is far cheaper than shipping the full width
    counts = (_with_bucket(ds.select_columns([order_col]), order_col,
                           lo, width, nb, is_int)
              .select_columns([_B]).groupby(_B).count().to_pandas())
    offsets = np.zeros(nb, dtype=np.int64)
    offsets[counts[_B].to_numpy()] = counts["count()"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))   # exclusive

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.drop(columns=[_B])
            out[out_col] = pd.Series([], dtype="int64")
            return out
        df = df.sort_values([_B, order_col] + tiebreak_cols,
                            kind="mergesort", ignore_index=True)
        b = df[_B].to_numpy()
        change = np.ones(len(df), dtype=bool)
        change[1:] = b[1:] != b[:-1]
        run_start = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        idx = np.arange(len(df), dtype=np.int64)
        rank = offsets[b] + (idx - run_start[run_id]) + 1
        out = df.drop(columns=[_B])
        out[out_col] = rank
        return out

    return partitioned_group_apply(bds, [_B], per_partition,
                                   num_partitions=num_partitions)


def grouped_rank(ds: rd.Dataset, group_cols: list[str], order_col: str,
                 out_col: str = "rank", method: str = "min",
                 n_buckets: int = 256, num_partitions: int = 64,
                 materialize_input: bool = True) -> rd.Dataset:
    """SQL ``RANK() OVER (PARTITION BY group ORDER BY order_col)`` for a
    FEW HOT groups — the case ``row_number_by_key`` cannot handle, because
    hash-partitioning by group puts each giant group in ONE worker.

    Here rows hash-partition by (group, value-bucket) instead, so a hot
    group spreads across ``n_buckets`` buckets; the driver holds only the
    groups × buckets count matrix (prefix-summed per group into bucket
    offsets).  Equal values always share a bucket, so tie semantics are
    resolved locally: ``method='min'`` is SQL RANK, ``method='max'``
    gives the numerator of CUME_DIST.

    Use :func:`row_number_by_key`/``rank`` for HIGH-cardinality groups
    (many small groups — per-group state there is the partition itself);
    use this for LOW-cardinality groups with giant membership (driver
    state is ``n_groups × n_buckets`` int64 — keep that product small).

    ``order_col`` must be numeric and non-null.  Output: input columns
    plus int64 ``out_col`` (1-based rank within the row's group);
    ``method='minmax'`` emits BOTH as ``{out_col}_min`` / ``{out_col}_max``
    from one pass (RANK and the CUME_DIST numerator share the grid,
    counts and partition exchange — computing them separately would
    double every stage).
    ``materialize_input`` as in :func:`global_rank` — the input is
    consumed three times, and chained lazy rank calls would otherwise
    re-execute upstream multiplicatively.
    """
    if method not in ("min", "max", "minmax"):
        raise ValueError("method must be 'min', 'max' or 'minmax'")
    if materialize_input:
        ds = ds.materialize()
    g = _grid(ds, order_col, n_buckets)
    if g is None:
        def tag_empty(t: pa.Table) -> pa.Table:
            return t.append_column(out_col, pa.array([], pa.int64()))
        return ds.map_batches(tag_empty, batch_format="pyarrow")
    lo, width, nb, is_int, _n = g
    bds = _with_bucket(ds, order_col, lo, width, nb, is_int)

    # pruned re-attach for the count pass (see global_rank) — only the
    # final partition pass streams the full input width
    counts = (_with_bucket(
                  ds.select_columns(
                      list(dict.fromkeys(group_cols + [order_col]))),
                  order_col, lo, width, nb, is_int)
              .select_columns(group_cols + [_B])
              .groupby(group_cols + [_B]).count().to_pandas())
    # per-group exclusive prefix over bucket counts → (group, bucket) → offset
    counts = counts.sort_values(group_cols + [_B])
    counts["__off"] = (counts.groupby(group_cols, sort=False)["count()"]
                       .cumsum() - counts["count()"])
    off_df = counts[group_cols + [_B, "__off"]].reset_index(drop=True)

    out_cols = ([out_col] if method != "minmax"
                else [f"{out_col}_min", f"{out_col}_max"])
    methods = [method] if method != "minmax" else ["min", "max"]

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.drop(columns=[_B])
            for c in out_cols:
                out[c] = pd.Series([], dtype="int64")
            return out
        gb = df.groupby(group_cols + [_B], sort=False,
                        observed=True)[order_col]
        offs = (df[group_cols + [_B]]
                .merge(off_df, on=group_cols + [_B], how="left")["__off"]
                .to_numpy())
        out = df.drop(columns=[_B])
        for c, m in zip(out_cols, methods):
            out[c] = offs + gb.rank(method=m).astype(np.int64).to_numpy()
        return out

    return partitioned_group_apply(bds, group_cols + [_B], per_partition,
                                   num_partitions=num_partitions)


def ntile(ds: rd.Dataset, order_col: str, tiebreak_cols: list[str],
          tiles: int, out_col: str = "tile", n_buckets: int = 1024,
          num_partitions: int = 64) -> rd.Dataset:
    """SQL ``NTILE(tiles) OVER (ORDER BY order_col, *tiebreak_cols)``:
    buckets differ in size by at most one row, larger buckets first —
    the standard (DuckDB/Postgres) tile assignment, derived from
    :func:`global_rank` plus the total row count the grid pass already
    produced."""
    if tiles < 1:
        raise ValueError("tiles must be >= 1")
    ds = ds.materialize()        # consumed 4× (grid + rank's 3 passes)
    g = _grid(ds, order_col, n_buckets)
    n = g[4] if g is not None else 0
    ranked = global_rank(ds, order_col, tiebreak_cols, out_col="__gr",
                         n_buckets=n_buckets, num_partitions=num_partitions,
                         materialize_input=False,
                         _grid_info=g if g is not None else None)
    q, r = divmod(n, tiles)

    def to_tile(t: pa.Table) -> pa.Table:
        rank = t["__gr"].to_numpy(zero_copy_only=False)
        big = r * (q + 1)                     # rows covered by size-(q+1) tiles
        if q == 0:                            # more tiles than rows
            tile = rank
        else:
            tile = np.where(rank <= big, (rank - 1) // (q + 1) + 1,
                            r + (rank - big - 1) // q + 1)
        return (t.drop_columns(["__gr"])
                .append_column(out_col, pa.array(tile.astype(np.int64))))

    return ranked.map_batches(to_tile, batch_format="pyarrow")
