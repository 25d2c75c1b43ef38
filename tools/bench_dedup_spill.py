"""Evidence run: forced-spill minhash dedup with driver-RSS tracking.

Generates N synthetic docs (with planted exact dups), runs
``minhash_lsh_dedup`` with ``spill_threshold=0`` so the ENTIRE tail
(pair generation, verification, clustering, labeling) executes as Dataset
transforms via ``connected_components``, and reports wall time, dup
recall, and driver maxrss before/after — the r3 companion to the r2
10 M-doc driver-path evidence in BASELINE.md.

Usage: python tools/bench_dedup_spill.py [n_docs] [cpus] [spill_threshold]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spill = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    dup_rate = 0.001

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from driftray.ops.dedup import minhash_lsh_dedup

    n_templates = 10
    n_dups = int(n_docs * dup_rate)

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(ids[0])
        texts = []
        for i in ids:
            if i < n_dups:  # planted dup: copy of template (i % n_templates)
                t = i % n_templates
                rng_t = np.random.default_rng(10_000_000 + t)
                words = [f"w{rng_t.integers(0, 30000)}" for _ in range(60)]
            else:
                words = [f"w{rng.integers(0, 30000)}" for _ in range(60)]
            texts.append(" ".join(words))
        return pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (rd.range(n_docs).map_batches(
        lambda b: pd.DataFrame({"id": b["id"]}), batch_format="pandas")
        .map_batches(gen, batch_format="pandas", batch_size=4096)
        .materialize())

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.perf_counter()
    labels = minhash_lsh_dedup(docs, jaccard_threshold=0.8,
                               spill_threshold=spill)
    n_dup_found = int(labels.map_batches(
        lambda b: pd.DataFrame({"n": [int(b["is_duplicate"].sum())]}),
        batch_format="pandas").to_pandas()["n"].sum())
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    # each template's planted copies are one cluster; expected duplicates =
    # planted copies minus one representative per template
    expected = n_dups - n_templates
    print(json.dumps({
        "bench": "minhash_spill", "n_docs": n_docs, "cpus": cpus,
        "spill_threshold": spill, "wall_s": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "dups_found": n_dup_found, "dups_expected_min": expected,
        "driver_rss_gb_before": round(rss0, 3),
        "driver_rss_gb_after": round(rss1, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
