"""Microbench: as-of join at high key cardinality (the r2 melt scenario).

ROUND_NOTES r1 measured 61 s for 640 k groups through per-key
``groupby(key).map_groups``; the r3 ``asof_join`` replaces that with the
hash-partitioned multi-group kernel (one ``pd.merge_asof`` per partition).
This script times the join at N keys × L left rows × R right rows and
verifies a sample against pandas merge_asof directly.

Usage: python tools/bench_asof.py [n_keys] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from driftray.ops.relational import asof_join

    rng = np.random.default_rng(42)
    L, R = 3, 2  # rows per key per side
    base = pd.Timestamp("2024-01-01").value // 1000
    left = pd.DataFrame({
        "k": np.repeat(np.arange(n_keys, dtype=np.int64), L),
        "ts": pd.to_datetime(base + rng.integers(0, 1_000_000, n_keys * L),
                             unit="us"),
    })
    right = pd.DataFrame({
        "k": np.repeat(np.arange(n_keys, dtype=np.int64), R),
        "rts": pd.to_datetime(base + rng.integers(0, 1_000_000, n_keys * R),
                              unit="us"),
        "val": rng.normal(size=n_keys * R),
    })
    lds = rd.from_pandas(left).repartition(32).materialize()
    rds = rd.from_pandas(right).repartition(32).materialize()

    t0 = time.perf_counter()
    out = asof_join(lds, rds, ["k"], "ts", "rts", ["val"],
                    num_partitions=64).materialize()
    wall = time.perf_counter() - t0
    n_out = out.count()

    # verify a sample of keys against pandas merge_asof on the raw frames
    sample_keys = rng.choice(n_keys, size=200, replace=False)
    lx = left[left["k"].isin(sample_keys)].sort_values("ts")
    rx = right[right["k"].isin(sample_keys)].sort_values("rts")
    expect = pd.merge_asof(lx, rx.rename(columns={"rts": "ts"}), on="ts",
                           by="k", direction="backward",
                           allow_exact_matches=False)
    skeys = np.sort(sample_keys)
    got = (out.map_batches(lambda b: b[np.isin(b["k"].to_numpy(), skeys)],
                           batch_format="pandas")
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    exp = expect.sort_values(["k", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    l_nan = got["val_asof"].isna().to_numpy()
    e_nan = exp["val"].isna().to_numpy()
    assert (l_nan == e_nan).all()
    assert np.allclose(got.loc[~l_nan, "val_asof"], exp.loc[~e_nan, "val"])

    import json

    print(json.dumps({"bench": "asof_join", "n_keys": n_keys,
                      "left_rows": len(left), "right_rows": len(right),
                      "out_rows": n_out, "cpus": cpus,
                      "wall_s": round(wall, 2),
                      "rows_per_sec": round(len(left) / wall)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
