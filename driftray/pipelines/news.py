"""The news-monitor pipeline shape (SURVEY.md §3.2), Ray-Data-first.

Reference flow (``/root/reference/src/data_sources/web/news.py:476-602``):
per-source fetch (≤20 each) → per-source ``title|url`` dedup → cross-source
``title|source`` dedup → location substring filter → incremental seen-set
filter (first scan passes everything) → sort newest-first (string compare
on ``published_date`` with '' fallback for NULLs, ``news.py:583-592``).

Engine differences, pinned and documented:
* dedup is FIRST-wins by the explicit ``seq`` arrival-order column on BOTH
  dedup keys — the reference is internally inconsistent (first-wins at
  ``news.py:74-82``, last-wins dict overwrite at ``news.py:349-356``);
  SURVEY.md D3 pins first-wins by sorted order.
* the seen-set is a checkpointed ``SeenKeysStore`` (key-hash Parquet +
  Bloom), not an unbounded in-process set lost on restart (W5 fix).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..checks import hash_keys
from ..ops.relational import dedup_exact
from ..state import SeenKeysStore
from ..ops.pool import actor_pool


def per_source_limit(ds: rd.Dataset, source_col: str = "source",
                     order_col: str = "seq", limit: int = 20) -> rd.Dataset:
    """Keep each source's first ``limit`` rows by arrival order
    (``news.py:26,105`` MAX_RESULTS_PER_SEARCH).

    Built on ``grouped_top_k`` (per-batch partial top-k + tiny exact
    merge): no per-source ``map_groups`` callback and no worker ever
    materializes a whole source's rows — a hot source at corpus scale
    stays a per-batch reduction, not a straggler.  The merged result is
    ≤ sources × limit rows, re-wrapped as a Dataset for the downstream
    dedup/filter stages."""
    from ..ops.grouped import grouped_top_k

    out = grouped_top_k(ds, [source_col], order_col, limit,
                        descending=False)
    if len(out) == 0:
        return ds.limit(0)            # preserve the input schema lazily
    return rd.from_pandas(out)


def location_filter(ds: rd.Dataset, location: str) -> rd.Dataset:
    """Lowercase substring match on title OR description (``news.py:400-413``)."""
    loc = location.lower()

    def fn(t: pa.Table) -> pa.Table:
        title = pc.utf8_lower(pc.fill_null(t["title"], ""))
        desc = pc.utf8_lower(pc.fill_null(t["description"], ""))
        keep = pc.or_(pc.match_substring(title, loc), pc.match_substring(desc, loc))
        return t.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def unseen_filter(ds: rd.Dataset, store: SeenKeysStore,
                  key_cols=("title", "url"), first_scan: bool = False) -> rd.Dataset:
    """Incremental filter vs the persisted seen-key store
    (``news.py:560-573``; first scan passes all, ``news.py:529,568``)."""
    if first_scan or len(store) == 0:
        return ds
    ref = ray.put(store)

    class Probe:
        def __init__(self):
            self.store = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            kh = hash_keys(t, list(key_cols))
            return t.filter(pa.array(~self.store.contains(kh)))

    return ds.map_batches(Probe, batch_format="pyarrow", concurrency=actor_pool())


def sort_newest_first(ds: rd.Dataset) -> rd.Dataset:
    """String-compare sort desc on published_date, NULL → '' (sorts last),
    matching ``news.py:583-592``."""

    def fill(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("published_date"),
                            "published_date",
                            pc.fill_null(t["published_date"], ""))

    return ds.map_batches(fill, batch_format="pyarrow").sort(
        "published_date", descending=True)


def news_scan(ds_scan: rd.Dataset, store: SeenKeysStore, *,
              location: str | None = None, first_scan: bool = False,
              per_source: int = 20) -> tuple[pa.Table, SeenKeysStore]:
    """One micro-batch scan end-to-end; returns (fresh headlines table,
    updated store).  The caller persists the store between scans
    (``store.save(path)``) — that is the engine's checkpointed version of
    the reference's in-memory monitoring loop."""
    ds = per_source_limit(ds_scan, limit=per_source)
    ds = dedup_exact(ds, ["title", "url"], "seq")
    ds = dedup_exact(ds, ["title", "source"], "seq")
    if location:
        ds = location_filter(ds, location)
    ds = unseen_filter(ds, store, first_scan=first_scan)
    out_parts = [t for t in ray.get(sort_newest_first(ds).to_arrow_refs())
                 if t.num_rows]
    if out_parts:
        out = pa.concat_tables(out_parts)
    else:
        sch = ds_scan.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            arrow_schema = base
        else:
            fields = []
            for n, t in zip(sch.names, sch.types):
                if isinstance(t, pa.DataType):
                    fields.append((n, t))
                else:
                    try:
                        fields.append((n, pa.from_numpy_dtype(np.dtype(t))))
                    except (TypeError, pa.ArrowNotImplementedError):
                        fields.append((n, pa.string()))
            arrow_schema = pa.schema(fields)
        out = arrow_schema.empty_table()
    if out.num_rows:
        store.add(hash_keys(out, ["title", "url"]))
    return out, store


def run_monitor(headlines_ds: rd.Dataset, *, scans: list[int],
                state_path: str | None = None,
                location: str | None = None) -> list[pa.Table]:
    """Replay of the monitoring loop over a multi-scan fixture: one
    ``news_scan`` per scan_id, seen-state checkpointed between scans."""
    store = SeenKeysStore.load(state_path) if state_path else SeenKeysStore()
    results = []
    for i, scan in enumerate(scans):
        ds = headlines_ds.filter(
            lambda r, s=scan: r["scan_id"] == s)
        out, store = news_scan(ds, store, location=location,
                               first_scan=(i == 0 and len(store) == 0))
        if state_path:
            store.save(state_path)
        results.append(out)
    return results
