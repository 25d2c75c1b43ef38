"""Curation operators for training-data pipelines beyond dedup/quality.

``token_budget_select`` — per-group token-budget selection ("data
mixing"): keep each group's rows, in a deterministic order, until the
group's running token sum exceeds its budget.  The pretraining-mix
primitive: cap each language/source at N tokens.

Distributed shape (no global sort, nothing corpus-scale on the driver):
  1. one tiny aggregate finds the order-column range → fixed-width order
     BUCKETS (the prefix-sum granularity);
  2. ``groupby(group, bucket).sum(tokens)`` — output is groups×buckets
     rows (small, collected);
  3. the driver prefix-sums each group's bucket series and finds the
     CUTOFF bucket (first bucket whose cumulative sum crosses the
     budget) + the remaining budget entering it;
  4. rows of cutoff buckets only (∝ 1/n_buckets of the input) are
     fetched and resolved exactly (within-bucket cumsum per group);
  5. one streaming filter keeps rows below the cutoff bucket, plus the
     exact winners inside it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def token_budget_select(ds: rd.Dataset, group_col: str, token_col: str,
                        order_col: str, budget: int,
                        n_buckets: int = 256) -> rd.Dataset:
    """Keep each group's first rows by ``order_col`` whose running
    ``token_col`` sum stays ≤ ``budget`` (SQL:
    ``SUM(tok) OVER (PARTITION BY group ORDER BY ord) <= budget``).

    ``order_col`` must be numeric and unique per row (a doc id).  The
    partitioning assumption is only that ONE bucket's rows per group fit
    on the driver for the exact boundary resolution — raise
    ``n_buckets`` if a single bucket could be large."""
    from ray.data.aggregate import Max, Min, Sum

    # the planning passes (range, bucket sums, cutoff fetch) touch only
    # these three columns — materialize the pruned projection ONCE so a
    # lazy upstream (e.g. a tokenizer stage) is not re-executed per pass
    meta = ds.select_columns(
        list(dict.fromkeys([group_col, order_col, token_col]))).materialize()

    rng = meta.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi"))
    if rng is None or rng.get("lo") is None:
        return ds  # empty input → nothing to budget
    lo, hi = int(rng["lo"]), int(rng["hi"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.subtract(
            pc.cast(t[order_col], pa.int64()), lo), width)), pa.int64())
        return pa.table({group_col: t[group_col], "__b": b,
                         token_col: t[token_col]})

    per_bucket = (meta.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby([group_col, "__b"])
                  .aggregate(Sum(token_col, alias_name="tok")).to_pandas())

    cutoff: dict = {}    # group -> (cutoff bucket, remaining budget before it)
    full_below: dict = {}  # group -> first bucket NOT fully kept
    for g, grp in per_bucket.groupby(group_col):
        grp = grp.sort_values("__b")
        cum = grp["tok"].cumsum()
        over = cum > budget
        if not over.any():
            full_below[g] = int(grp["__b"].max()) + 1  # keep everything
            continue
        i = int(np.argmax(over.to_numpy()))
        cb = int(grp["__b"].iloc[i])
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        full_below[g] = cb
        cutoff[g] = (cb, budget - before)

    cut_ref = ray.put({g: cb for g, (cb, _) in cutoff.items()})
    below_ref = ray.put(full_below)

    # exact boundary: fetch cutoff-bucket rows only, cumsum per group
    boundary: dict = {}  # group -> max order value kept inside cutoff bucket
    if cutoff:
        class FetchCutoff:
            def __init__(self):
                self.cut = ray.get(cut_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ordv = np.asarray(pc.cast(t[order_col], pa.int64()).to_numpy(
                    zero_copy_only=False))
                b = pd.Series((ordv - lo) // width)
                gs = t[group_col].to_pandas().reset_index(drop=True)
                want = (b == gs.map(self.cut)).fillna(False)
                return t.filter(pa.array(want.to_numpy(dtype=bool)))

        cand = (meta.map_batches(FetchCutoff, batch_format="pyarrow",
                                 concurrency=(1, 4)).to_pandas())
        for g, grp in cand.groupby(group_col):
            grp = grp.sort_values(order_col)
            keep = grp[token_col].cumsum() <= cutoff[g][1]
            if keep.any():
                boundary[g] = int(grp.loc[keep, order_col].max())

    bnd_ref = ray.put(boundary)

    class KeepWithinBudget:
        def __init__(self):
            self.below = ray.get(below_ref)
            self.cut = ray.get(cut_ref)
            self.bnd = ray.get(bnd_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ordv = np.asarray(pc.cast(t[order_col], pa.int64()).to_numpy(
                zero_copy_only=False))
            b = pd.Series((ordv - lo) // width)
            gs = t[group_col].to_pandas().reset_index(drop=True)
            below = gs.map(self.below)
            cutb = gs.map(self.cut)
            bnd = gs.map(self.bnd)
            keep = ((b < below).fillna(False)
                    | ((b == cutb) & (pd.Series(ordv) <= bnd)).fillna(False))
            return t.filter(pa.array(keep.to_numpy(dtype=bool)))

    # if the caller's dataset carries nothing beyond the three planning
    # columns, filter the MATERIALIZED projection instead of re-executing
    # the (possibly expensive, e.g. tokenizer) upstream a second time
    src = meta if set(ds.schema().names) <= {group_col, order_col,
                                             token_col} else ds
    return src.map_batches(KeepWithinBudget, batch_format="pyarrow",
                           concurrency=(1, 4))
