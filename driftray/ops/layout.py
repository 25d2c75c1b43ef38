"""Data-layout operators: multi-column z-order clustering.

Zone-map pruning (`ops/zonemap.py`) is only as good as the LAYOUT: a
table sorted on one column prunes range scans on that column and nothing
else.  Z-ordering (bit-interleaved Morton keys) clusters rows so that
EVERY participating column's values are locally banded per row group —
the standard lakehouse answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) to
"we filter this 100 TB table by user AND by time".

Scale shape: one Min/Max aggregate pass per call (all columns in a
single ``aggregate``), one vectorized Morton-key map, one distributed
range sort on the 8-byte key (the only exchange — key weight, not row
weight, dominates the shuffle).  Writing the sorted Dataset to Parquet
then yields row groups whose per-column footer ranges are tight on every
z-ordered column; `parquet_zone_map` + `pruned_read` exploit them.

Quantization note: values are scaled to ``bits``-wide integers through
float64.  That is correct-by-construction for LAYOUT (a coarser or even
skewed bucket map only weakens clustering, never query answers — scans
always re-filter exactly), so the float round-trip that would be a bug
in `ops/selection.exact_kth` is acceptable here by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["morton_key", "zorder_sort", "pruning_fraction"]


def morton_key(columns: list[np.ndarray], los: list[float],
               his: list[float], bits: int) -> np.ndarray:
    """Interleave ``bits`` top bits of each column (scaled to
    [lo, hi] → [0, 2^bits)) into one int64 Morton key, vectorized.
    ``bits * len(columns)`` must be ≤ 63.  NaNs map to bucket 0 (they
    sort first; scans re-filter exactly so placement is a layout choice).
    """
    k = len(columns)
    if bits * k > 63:
        raise ValueError(f"bits={bits} × {k} columns exceeds int64")
    z = np.zeros(len(columns[0]), dtype=np.uint64)
    top = np.uint64((1 << bits) - 1)
    for i, (v, lo, hi) in enumerate(zip(columns, los, his)):
        v = np.asarray(v, dtype=np.float64)
        span = (hi - lo) or 1.0
        q = np.clip((v - lo) / span, 0.0, 1.0)
        q = np.nan_to_num(q, nan=0.0)
        b = np.minimum((q * (1 << bits)).astype(np.uint64), top)
        for j in range(bits):
            z |= ((b >> np.uint64(j)) & np.uint64(1)) << np.uint64(j * k + i)
    return z.view(np.int64)


def zorder_sort(ds: rd.Dataset, cols: list[str], bits: int = 16,
                key_col: str = "__zorder") -> rd.Dataset:
    """Sort ``ds`` by the Morton key of ``cols`` (ascending) and drop the
    key: the clustered layout to feed ``write_parquet`` so row-group zone
    maps become tight on EVERY listed column.

    One Min/Max stats pass (single aggregate job, scalar result), one
    map to attach the 8-byte key, one distributed range sort."""
    from ray.data.aggregate import Max, Min

    aggs = [a for c in cols for a in (Min(c), Max(c))]
    stats = ds.aggregate(*aggs)
    los = [float(stats[f"min({c})"]) for c in cols]
    his = [float(stats[f"max({c})"]) for c in cols]

    def attach(t: pa.Table) -> pa.Table:
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        return t.append_column(key_col,
                               pa.array(morton_key(arrs, los, his, bits)))

    keyed = ds.map_batches(attach, batch_format="pyarrow")
    return keyed.sort(key_col).drop_columns([key_col])


def pruning_fraction(paths: list[str], col: str, lo, hi) -> pd.DataFrame:
    """Layout-quality metric: the fraction of row groups a range scan
    ``lo <= col <= hi`` can SKIP given the files' zone maps (and the row
    fraction those groups hold).  Metadata-only — compare before/after a
    ``zorder_sort`` rewrite to quantify the layout's benefit."""
    from .zonemap import parquet_zone_map

    zm = parquet_zone_map(paths, col).to_pandas()
    prunable = zm["vmin"].notna() & ((zm["vmax"] < lo) | (zm["vmin"] > hi))
    total = len(zm)
    return pd.DataFrame({
        "n_row_groups": [total],
        "n_pruned": [int(prunable.sum())],
        "frac_groups_pruned": [prunable.mean() if total else 0.0],
        "frac_rows_pruned": [zm.loc[prunable, "n_rows"].sum()
                             / max(zm["n_rows"].sum(), 1)],
    })


def compact_partitions(in_dir: str, out_dir: str,
                       target_mb: int = 128,
                       partition_col: str | None = None) -> pd.DataFrame:
    """Small-file compaction (the lakehouse ``OPTIMIZE`` maintenance op):
    rewrite a directory of parquet files into ~``target_mb`` outputs.

    Streaming-ingest sinks leave thousands of KB-scale files; every later
    scan then pays per-file open/footer cost and tiny row groups defeat
    zone-map pruning.  Compaction is a read → repartition(target-size) →
    write pipeline per PARTITION (hive subdirectory when
    ``partition_col`` is given, else the whole directory), so each
    partition compacts independently — a failed run just re-runs the
    partitions without an output ``_DONE``.

    Returns one row per partition: files/bytes before and after.  Sizing
    uses the input's bytes-per-row (parquet-encoded) to pick the output
    block count — exact enough for maintenance purposes.
    """
    import os

    import pyarrow.parquet as pq

    # Refuse in-place / nested output: the debris cleanup below deletes
    # *.parquet in the destination, which would destroy the source data
    # before it is ever read if out_dir overlaps in_dir.
    src_real = os.path.realpath(in_dir)
    dst_real = os.path.realpath(out_dir)
    if (dst_real == src_real
            or dst_real.startswith(src_real + os.sep)
            or src_real.startswith(dst_real + os.sep)):
        raise ValueError(
            "compact_partitions requires a destination disjoint from the "
            f"input (got in_dir={in_dir!r}, out_dir={out_dir!r}); "
            "in-place compaction is not supported")

    def subdirs() -> list[tuple[str, str]]:
        if partition_col is None:
            return [("", in_dir)]
        out = []
        for name in sorted(os.listdir(in_dir)):
            p = os.path.join(in_dir, name)
            if os.path.isdir(p) and name.startswith(f"{partition_col}="):
                out.append((name, p))
        return out

    rows = []
    for name, src in subdirs():
        files = [os.path.join(src, f) for f in sorted(os.listdir(src))
                 if f.endswith(".parquet")]
        if not files:
            continue
        bytes_in = sum(os.path.getsize(f) for f in files)
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        dst = os.path.join(out_dir, name) if name else out_dir
        done = os.path.join(dst, "_DONE")
        if not os.path.exists(done):
            # a previous attempt may have died mid-write: without _DONE the
            # partition's outputs are partial debris — clear them, or the
            # rewrite would APPEND uniquely-named files next to them and
            # duplicate rows
            if os.path.isdir(dst):
                for f in os.listdir(dst):
                    if f.endswith(".parquet"):
                        os.remove(os.path.join(dst, f))
            n_out = max(1, round(bytes_in / (target_mb * (1 << 20))))
            ds = rd.read_parquet(files)
            ds.repartition(n_out).write_parquet(dst)
            with open(done, "w") as fh:
                fh.write("ok\n")
        files_out = [os.path.join(dst, f) for f in sorted(os.listdir(dst))
                     if f.endswith(".parquet")]
        rows.append({"partition": name or ".",
                     "files_in": len(files), "bytes_in": bytes_in,
                     "rows": n_rows, "files_out": len(files_out),
                     "bytes_out": sum(os.path.getsize(f)
                                      for f in files_out)})
    return pd.DataFrame(rows)
