"""Whole-table auto-profiler: one pass, every column, mergeable sketches.

The reference profiles hand-picked numeric columns (``DESIGN.md:539-551``
reference distributions); a production validation engine first needs the
Deequ/GE-style *table* profile — every column's counts, null rates,
cardinality, value/length distribution and top values — computed in ONE
streaming pass so a 100 TB table is read once.

Scale shape: each ``map_batches`` task emits one partial row per column
(count scalars + serialized Moments/HLL/Misra-Gries blobs, KBs each); the
partials hash-partition BY COLUMN NAME and merge per column
(``partitioned_group_apply``), so the driver only ever sees |columns|
finished rows.  Nothing here depends on row count.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .. import sketches
from ..sketches import HLL, MisraGries, Moments, hash64
from .grouped import partitioned_group_apply


def _kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_floating(t) \
            or pa.types.is_decimal(t) or pa.types.is_boolean(t):
        return "num"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "ts"
    return "other"


def _stat_values(col: pa.ChunkedArray | pa.Array, kind: str) -> np.ndarray:
    """Non-null float64 values the distribution stats run over: the value
    itself for numerics, utf8 length for strings, epoch-µs for timestamps."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    valid = col.drop_null()
    if kind == "num":
        return np.asarray(pc.cast(valid, pa.float64())
                          .to_numpy(zero_copy_only=False), dtype=np.float64)
    if kind == "str":
        return np.asarray(pc.cast(pc.utf8_length(valid), pa.int64())
                          .to_numpy(zero_copy_only=False), dtype=np.float64)
    if kind == "ts":
        return np.asarray(pc.cast(valid, pa.int64())
                          .to_numpy(zero_copy_only=False), dtype=np.float64)
    return np.empty(0, dtype=np.float64)


def profile_table(ds: rd.Dataset, columns: list[str] | None = None,
                  hll_p: int = 12, topk: int = 8,
                  num_partitions: int = 16) -> pd.DataFrame:
    """Profile every (or the given) column in one streaming pass.

    Returns one row per column: ``col, kind, n, n_null, approx_distinct,
    vmin, vmax, vsum, mean, std, top_values`` where the distribution stats
    are over values (numeric), utf8 lengths (string) or epoch-µs
    (timestamp).  ``vmin/vmax/vsum`` are exact int64 when every observed
    value is integral (so they hash-match a SQL oracle); ``approx_distinct``
    is a HyperLogLog estimate; ``top_values`` is a JSON list of
    (value, lower-bound count) from a Misra-Gries summary (string columns).
    """

    def partial(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {"col": [], "kind": [], "n": [], "n_null": [],
                                 "vsum": [], "vsum_ok": [], "moments": [],
                                 "hll": [], "mg": []}
        names = columns or t.column_names
        for name in names:
            if name not in t.column_names:
                continue
            col = t[name]
            kind = _kind(col.type)
            vals = _stat_values(col, kind)
            mom = Moments().update(vals)
            hll = HLL(p=hll_p)
            valid = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                     else col).drop_null()
            if len(valid) and kind != "other":
                hll.update(np.asarray(valid.to_numpy(zero_copy_only=False)))
            mg = MisraGries(k=max(topk * 4, 16))
            if kind == "str" and len(valid):
                mg.update(np.asarray(valid.to_numpy(zero_copy_only=False),
                                     dtype=object))
            # exact integer sum when values are integral (lengths always
            # are) AND the partial sum stays float64-exact (< 2^53); ts
            # epoch sums blow both bounds, so they opt out.  An empty
            # partial stays summable (0) so other partials decide.
            integral = (kind != "ts"
                        and (vals.size == 0
                             or (bool(np.all(vals == np.floor(vals)))
                                 and abs(float(vals.sum())) < 2.0 ** 53)))
            rows["col"].append(name)
            rows["kind"].append(kind)
            rows["n"].append(t.num_rows)
            rows["n_null"].append(col.null_count)
            rows["vsum"].append(int(vals.sum()) if integral else 0)
            rows["vsum_ok"].append(integral)
            rows["moments"].append(sketches.dumps(mom))
            rows["hll"].append(sketches.dumps(hll))
            rows["mg"].append(sketches.dumps(mg))
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "vsum": pa.array(rows["vsum"], pa.int64()),
            "vsum_ok": pa.array(rows["vsum_ok"], pa.bool_()),
            "moments": pa.array(rows["moments"], pa.binary()),
            "hll": pa.array(rows["hll"], pa.binary()),
            "mg": pa.array(rows["mg"], pa.binary()),
        })

    if columns:
        # prune at the source: without this the pass streams EVERY column
        # of the table through the workers to profile a subset
        ds = ds.select_columns(list(columns))
    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_col(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for col_name, g in df.groupby("col", sort=False):
            mom = sketches.merge_all(sketches.loads(b) for b in g["moments"])
            hll = sketches.merge_all(sketches.loads(b) for b in g["hll"])
            mg = sketches.merge_all(sketches.loads(b) for b in g["mg"])
            vsum = (int(g["vsum"].sum()) if bool(g["vsum_ok"].all())
                    else None)
            kind = g["kind"].iloc[0]
            top = (json.dumps([[str(v), int(c)] for v, c in mg.items()[:topk]])
                   if kind == "str" else "[]")
            out.append({
                "col": col_name, "kind": kind,
                "n": int(g["n"].sum()), "n_null": int(g["n_null"].sum()),
                "approx_distinct": int(round(hll.estimate())) if mom.n else 0,
                "vmin": mom.min if mom.n else None,
                "vmax": mom.max if mom.n else None,
                "vsum": vsum,
                "mean": mom.mean if mom.n else None,
                "std": mom.std if mom.n else None,
                "top_values": top,
            })
        return pd.DataFrame(out)

    res = partitioned_group_apply(parts, ["col"], reduce_col,
                                  num_partitions=num_partitions).to_pandas()
    return res.sort_values("col", ignore_index=True)
