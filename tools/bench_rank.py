"""Microbench: exact global rank / NTILE at 10 M rows (scale evidence).

The naive distributed ROW_NUMBER() (single constant key through a
per-key window) funnels every row into one worker; ``ops/ranking``
spreads rows across a value-bucket grid and keeps only KB of offsets on
the driver.  This script times ``ntile`` at N rows, verifies a sample
against numpy argsort, and reports peak driver RSS (flat RSS = nothing
row-scale reached the driver).

Usage: python tools/bench_rank.py [n_rows] [cpus] [--grouped]

``--grouped`` benches ``grouped_rank`` instead: 5 giant groups (the
PARTITION BY event_type class where hash-partitioning by group would
put ~n/5 rows in ONE worker) ranked via the value-bucket spread.
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


def bench_grouped(n_rows: int, cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from driftray.ops.ranking import grouped_rank

    def gen(batch):
        ids = batch["id"]
        rng = np.random.default_rng(int(ids[0]) + 7)
        return pd.DataFrame({
            "id": ids.astype(np.int64),
            "g": rng.integers(0, 5, size=len(ids)).astype(np.int64),
            "v": rng.normal(0.0, 1.0, size=len(ids))})

    ds = (rd.range(n_rows, override_num_blocks=64)
          .map_batches(gen, batch_format="numpy").materialize())
    rss0 = rss_gb()
    import time as _t

    t0 = _t.perf_counter()
    out = grouped_rank(ds, ["g"], "v", out_col="r", n_buckets=512,
                       num_partitions=64,
                       materialize_input=False).materialize()
    wall = _t.perf_counter() - t0
    rss1 = rss_gb()

    # exactness: per-group max rank == group size (continuous values →
    # the top value is untied, so its min-rank is the group size).
    # Checked via per-batch partials — a groupby shuffle here would
    # dominate the bench itself.
    def partials(b):
        g = b.groupby("g")["r"].agg(["count", "max"]).reset_index()
        return g

    pf = out.map_batches(partials, batch_format="pandas").to_pandas()
    sizes = pf.groupby("g")["count"].sum()
    tops = pf.groupby("g")["max"].max()
    assert (sizes.sort_index().to_numpy()
            == tops.sort_index().to_numpy()).all()

    import json

    print(json.dumps({"bench": "grouped_rank_hot_groups", "rows": n_rows,
                      "groups": 5, "cpus": cpus, "wall_s": round(wall, 2),
                      "rows_per_sec": round(n_rows / wall),
                      "driver_rss_gb_before": round(rss0, 2),
                      "driver_rss_gb_after": round(rss1, 2)}))
    ray.shutdown()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if "--grouped" in sys.argv:
        bench_grouped(n_rows, cpus)
        return

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
