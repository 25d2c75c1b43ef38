"""Snapshot mutation operators: CDC changeset apply (MERGE INTO) and
SCD Type-2 history construction.

`ops/reconcile.table_diff` answers "what changed between two snapshots";
these are the other direction — given a snapshot and a changeset, produce
the next snapshot (`apply_changes`, the lakehouse MERGE a bronze→silver
promotion runs per micro-batch, generalizing the reference's append-only
window sink at `/root/reference/DESIGN.md:331-392`), and given a change
LOG, produce the validity-interval history table (`scd2_intervals`, the
classic slowly-changing-dimension build).

Scale shape (both): ONE hash exchange on the key via
``partitioned_group_apply``; within a partition every key is resolved in
a single vectorized pandas pass (stable sort + ``drop_duplicates`` /
``groupby().shift()`` C kernels) — no per-key Python, no driver
materialization.  Partitioning contract: one hash partition of the
combined rows must fit in a worker's heap (raise ``num_partitions`` as
data grows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .grouped import partitioned_group_apply

__all__ = ["apply_changes", "scd2_intervals"]


def apply_changes(snapshot: rd.Dataset, changes: rd.Dataset,
                  key_cols: list[str], value_cols: list[str],
                  op_col: str = "op", seq_col: str | None = None,
                  num_partitions: int = 64) -> rd.Dataset:
    """MERGE a CDC changeset into a keyed snapshot.

    ``changes`` rows carry ``op_col`` ∈ {``"upsert"``, ``"delete"``}; the
    LAST change per key wins (ordered by ``seq_col`` if given, else by
    any stable order — pass ``seq_col`` whenever a key can appear more
    than once in the changeset).  Output: snapshot rows untouched by any
    change, plus the final upserted values; keys whose final change is a
    delete disappear.  Upserts REPLACE the whole value tuple (no partial
    column patch — model partial updates by joining the old values into
    the changeset upstream).

    One key-hash exchange over snapshot ∪ changes; per-partition
    resolution is one stable sort + ``drop_duplicates(keep="last")``.
    """
    UPSERT, DELETE = "upsert", "delete"

    def tag_snapshot(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in key_cols + value_cols}
        n = t.num_rows
        cols["__op"] = pa.array([UPSERT] * n, pa.string())
        cols["__pri"] = pa.array(np.zeros(n, dtype=np.int8))
        cols["__seq"] = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(cols)

    def tag_changes(t: pa.Table) -> pa.Table:
        ops = t[op_col]
        bad = [o for o in ops.unique().to_pylist()
               if o not in (UPSERT, DELETE)]
        if bad:
            raise ValueError(f"unknown {op_col!r} values {bad!r}; "
                             f"expected {UPSERT!r} or {DELETE!r}")
        cols = {c: t[c] for c in key_cols + value_cols}
        n = t.num_rows
        cols["__op"] = ops
        cols["__pri"] = pa.array(np.ones(n, dtype=np.int8))
        cols["__seq"] = (t[seq_col] if seq_col is not None
                         else pa.array(np.zeros(n, dtype=np.int64)))
        return pa.table(cols)

    s = (snapshot.select_columns(key_cols + value_cols)
         .map_batches(tag_snapshot, batch_format="pyarrow"))
    ch_cols = key_cols + value_cols + [op_col] + (
        [seq_col] if seq_col else [])
    c = (changes.select_columns(ch_cols)
         .map_batches(tag_changes, batch_format="pyarrow"))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__pri", "__seq"], kind="mergesort")
        last = g.drop_duplicates(subset=key_cols, keep="last")
        live = last[last["__op"] != DELETE]
        return live[key_cols + value_cols]

    return partitioned_group_apply(s.union(c), key_cols, resolve,
                                   num_partitions=num_partitions)


def scd2_intervals(log: rd.Dataset, key_cols: list[str], ts_col: str,
                   attr_cols: list[str], tie_cols: list[str] | None = None,
                   collapse: bool = True,
                   from_col: str = "valid_from", to_col: str = "valid_to",
                   num_partitions: int = 64) -> rd.Dataset:
    """Build a Type-2 slowly-changing-dimension history from a change log.

    For each key, order the log by ``(ts_col, *tie_cols)`` and emit one
    row per attribute version with ``[valid_from, valid_to)`` — the next
    version's timestamp closes the interval; the current version's
    ``valid_to`` is null.  ``collapse=True`` (default) first drops log
    rows whose ``attr_cols`` equal the key's previous row (idempotent
    re-writes don't open a new version — standard SCD2 semantics).

    Per partition: one stable sort, ``groupby(key).shift()`` comparisons
    for the collapse, one more shift for the closing timestamp — all
    pandas C kernels over every key in the partition at once.
    """
    tie = list(tie_cols or [])
    cols = key_cols + [ts_col] + attr_cols + tie

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col] + tie, kind="mergesort")
        gb = g.groupby(key_cols, sort=False, observed=True)
        if collapse:
            same = pd.Series(np.ones(len(g), dtype=bool), index=g.index)
            for a in attr_cols:
                prev = gb[a].shift()  # NaN at each key's first row
                same &= (g[a] == prev) | (g[a].isna() & prev.isna())
            # a row survives if it is its key's first row or any attr
            # differs (null-aware) from the key's previous row
            first = gb.cumcount() == 0
            g = g[first | ~same]
            gb = g.groupby(key_cols, sort=False, observed=True)
        out = g[key_cols + attr_cols].copy()
        out[from_col] = g[ts_col]
        out[to_col] = gb[ts_col].shift(-1)
        return out

    return partitioned_group_apply(log.select_columns(cols), key_cols,
                                   build, num_partitions=num_partitions)
