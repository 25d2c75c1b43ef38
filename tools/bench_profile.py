"""Microbench: profile_table at multi-million-row scale.

Evidence for BASELINE.md that the whole-table auto-profiler's driver
footprint is |columns|-bounded: generates N rows of a 5-column mixed
table in parallel, profiles every column in one streaming pass, and
reports wall time + driver RSS before/after.

Usage: python tools/bench_profile.py [rows] [cpus]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    def gen(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        rng = np.random.default_rng(int(ids[0]) + 1)
        n = len(ids)
        return pa.table({
            "id": pa.array(ids),
            "x": pa.array(rng.normal(100, 15, n)),
            "k": pa.array(ids % 1000),
            "s": pa.array(np.char.add("item_", (ids % 50_000).astype(str))),
            "flag": pa.array((ids % 7 == 0)),
        })

    ds = (rd.range(rows, override_num_blocks=max(cpus * 4, 64))
          .map_batches(gen, batch_format="numpy", batch_size=100_000))

    from driftray.ops.profile import profile_table

    r0 = rss_gb()
    t0 = time.perf_counter()
    prof = profile_table(ds)
    wall = time.perf_counter() - t0
    r1 = rss_gb()

    by = prof.set_index("col")
    assert int(by.loc["id", "n"]) == rows
    assert int(by.loc["id", "vsum"]) == rows * (rows - 1) // 2, "exact sum"
    err = abs(by.loc["k", "approx_distinct"] - 1000) / 1000
    print({"rows": rows, "cpus": cpus, "wall_s": round(wall, 2),
           "rows_per_sec": round(rows / wall),
           "driver_rss_gb_before": round(r0, 2),
           "driver_rss_gb_after": round(r1, 2),
           "k_distinct_rel_err": round(float(err), 4),
           "profiled_cols": len(prof)})
    ray.shutdown()


if __name__ == "__main__":
    main()
