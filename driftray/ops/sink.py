"""Resumable partitioned Parquet sink.

The brief's output contract at 100 TB: write one directory per partition
value so a failed run can SKIP finished partitions instead of redoing
the job — generalizing the `pipeline.py` window-chunk layout
(`out/window=N/.../_DONE`) into a reusable operator for any Dataset.

Layout: ``out_dir/<col>=<value>/*.parquet`` + an empty ``_DONE`` marker
per completed partition directory.  Chunked passes: each pass filters
the stream to ``group_size`` pending partition values and writes them in
one ``write_parquet`` job, then drops the markers — so a crash loses at
most one pass's work, and a restart re-runs only the unmarked
partitions.  Fewer, larger passes amortize the per-pass input scan;
``group_size`` trades scan count against blast radius exactly like
``run_validation``'s ``windows_per_pass``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _part_dir(out_dir: str, col: str, value) -> str:
    return os.path.join(out_dir, f"{col}={value}")


def write_partitioned_resumable(ds: rd.Dataset, out_dir: str,
                                partition_col: str,
                                group_size: int = 32) -> dict:
    """Write ``ds`` as hive-partitioned Parquet with per-partition
    ``_DONE`` markers; partitions already marked are skipped entirely.

    Returns ``{"written": [...], "skipped": [...]}`` (partition values).
    The distinct-value set is collected (partition cardinality must be
    driver-small — the same contract as every hive layout); row data
    only ever streams."""
    from .relational import distinct

    vals = sorted(
        distinct(ds.select_columns([partition_col]), [partition_col])
        .to_pandas()[partition_col].tolist())
    skipped = [v for v in vals
               if os.path.exists(os.path.join(_part_dir(out_dir,
                                                        partition_col, v),
                                              "_DONE"))]
    pending = [v for v in vals if v not in set(skipped)]
    os.makedirs(out_dir, exist_ok=True)

    for i in range(0, len(pending), group_size):
        chunk = pending[i:i + group_size]
        chunk_ref = ray.put(set(chunk))

        def keep_chunk(t: pa.Table) -> pa.Table:
            want = ray.get(chunk_ref)
            col = t[partition_col].to_pylist()
            mask = np.fromiter((v in want for v in col), dtype=bool,
                               count=t.num_rows)
            return t.filter(pa.array(mask))

        sub = ds.map_batches(keep_chunk, batch_format="pyarrow")
        sub.write_parquet(out_dir, partition_cols=[partition_col])
        for v in chunk:
            d = _part_dir(out_dir, partition_col, v)
            os.makedirs(d, exist_ok=True)  # empty partitions still complete
            open(os.path.join(d, "_DONE"), "w").close()

    return {"written": pending, "skipped": skipped}
