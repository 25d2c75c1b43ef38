"""Microbench: dedup_segments at ≥ 1 M docs (scale evidence).

Round-3 `dedup_segments` ran two per-document Python loops over
`to_pylist()` rows on the hottest text path; round 4 vectorizes both
corpus passes (`_flat_segments`: one .str.split + explode + one flat
hash64 per batch) and adds the (h, h2) exact-verify tier.  This script
generates n docs × ~5 paragraphs with a planted boilerplate paragraph in
1/3 of docs, times the full op, verifies planted-dup accounting, and
reports peak driver RSS.

Usage: python tools/bench_segdedup.py [n_docs] [cpus] [--no-verify]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return float("nan")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    verify = "--no-verify" not in sys.argv

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from driftray.ops.dedup import dedup_segments

    boiler = "subscribe to our newsletter for more updates"

    def gen(batch):
        ids = batch["id"].to_numpy(dtype=np.int64)
        rng = np.random.default_rng(ids[0] if len(ids) else 0)
        words = rng.integers(0, 50_000, size=(len(ids), 5, 6))
        texts = []
        for d, w in zip(ids, words):
            paras = [" ".join(f"w{int(x)}" for x in row) + f" u{d}_{i}"
                     for i, row in enumerate(w)]
            if d % 3 == 0:
                paras.insert(1, boiler)
            texts.append("\n\n".join(paras))
        import pandas as pd

        return pd.DataFrame({"doc_id": ids, "text": texts})

    base = rd.range(n_docs).map_batches(
        lambda b: b.rename(columns={"id": "id"}), batch_format="pandas"
    ).map_batches(gen, batch_format="pandas").materialize()

    t0 = time.time()
    out = dedup_segments(base, "doc_id", "text", verify=verify)
    agg = out.map_batches(
        lambda df: __import__("pandas").DataFrame(
            {"kept": [int(df["n_kept"].sum())],
             "dropped": [int(df["n_dropped"].sum())]}),
        batch_format="pandas").to_pandas()
    wall = time.time() - t0
    kept, dropped = int(agg["kept"].sum()), int(agg["dropped"].sum())
    planted = (n_docs + 2) // 3 - 1          # boilerplate copies minus winner
    ok = dropped == planted
    print(f"n_docs={n_docs} cpus={cpus} verify={verify} wall={wall:.1f}s "
          f"docs/s={n_docs / wall:,.0f} kept={kept} dropped={dropped} "
          f"planted={planted} match={ok} rss={rss_gb():.2f}GB")
    if not ok:
        raise SystemExit("planted-duplicate accounting mismatch")
    ray.shutdown()


if __name__ == "__main__":
    main()
