"""Microbench: exact global rank / NTILE at 10 M rows (scale evidence).

The naive distributed ROW_NUMBER() (single constant key through a
per-key window) funnels every row into one worker; ``ops/ranking``
spreads rows across a value-bucket grid and keeps only KB of offsets on
the driver.  This script times ``ntile`` at N rows, verifies a sample
against numpy argsort, and reports peak driver RSS (flat RSS = nothing
row-scale reached the driver).

Usage: python tools/bench_rank.py [n_rows] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return float("nan")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from driftray.ops.ranking import ntile

    def gen(batch):
        ids = batch["id"]
        rng = np.random.default_rng(int(ids[0]) + 1)
        return pd.DataFrame({"id": ids.astype(np.int64),
                             "v": rng.normal(1e6, 2.5e5, size=len(ids))})

    ds = (rd.range(n_rows, override_num_blocks=64)
          .map_batches(gen, batch_format="numpy").materialize())
    rss0 = rss_gb()

    t0 = time.perf_counter()
    out = ntile(ds, "v", ["id"], 10, n_buckets=1024,
                num_partitions=64).materialize()
    wall = time.perf_counter() - t0
    rss1 = rss_gb()

    # tile histogram must be the exact NTILE split: sizes differ ≤ 1
    hist = out.groupby("tile").count().to_pandas().sort_values("tile")
    sizes = hist["count()"].to_numpy()
    assert len(sizes) == 10 and sizes.max() - sizes.min() <= 1, sizes
    assert int(sizes.sum()) == n_rows

    # sample verify: rows in tile 1 must all rank below rows in tile 10
    def tile_eq(k):
        def f(b):
            return b[b["tile"].to_numpy() == k]
        return f

    lo = (out.map_batches(tile_eq(1), batch_format="pandas")
          .limit(1000).to_pandas())
    hi = (out.map_batches(tile_eq(10), batch_format="pandas")
          .limit(1000).to_pandas())
    assert lo["v"].max() < hi["v"].min()

    import json

    print(json.dumps({"bench": "ntile_global_rank", "rows": n_rows,
                      "cpus": cpus, "wall_s": round(wall, 2),
                      "rows_per_sec": round(n_rows / wall),
                      "driver_rss_gb_before": round(rss0, 2),
                      "driver_rss_gb_after": round(rss1, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
