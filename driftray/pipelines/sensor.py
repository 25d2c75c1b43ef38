"""The sensor drift pipeline (SURVEY.md §3.1) — the reference's only
executable detector, re-expressed over Ray Data.

Reference: ``/root/reference/src/data_sources/iot/sensor.py:160-194`` —
single-threaded loop, count-based window of 50, trigger when
``unusual_count / window_size > 0.10`` (constant divisor), reset only on
drift.  Engine shape: ``read → normalize (map_batches: ISO-string →
timestamp, M6) → derive/collect the 1-bit unusual column per ordered
partition → replay the exact trigger math over that tiny column``.

Partitioning note: the detector is inherently sequential within a stream,
so the engine parallelizes ACROSS partitions (e.g. per sensor type or per
zip shard) and runs the O(n) trigger replay on ONE BOOLEAN COLUMN per
partition — 1 bit/row leaves the cluster, never the payload.  Conformance
vs the reference loop is proven row-for-row in tests/test_sensor.py.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..drift import UnusualRatioReplay, WindowVerdict


def normalize_timestamps(ds: rd.Dataset, raw_col: str = "timestamp_raw",
                         out_col: str = "ts") -> rd.Dataset:
    """Parse ISO-8601 strings to ``timestamp[us]`` (M6 / ``sensor.py:12``,
    ``security.py:43``), vectorized via Arrow cast."""

    def fn(t: pa.Table) -> pa.Table:
        parsed = pc.cast(t[raw_col], pa.timestamp("us"))
        return t.append_column(out_col, parsed)

    return ds.map_batches(fn, batch_format="pyarrow")


def collect_flags(ds: rd.Dataset, order_col: str, flag_col: str,
                  group_col: str | None = None) -> dict[str, pd.DataFrame]:
    """Project + collect the (order, flag[, group]) columns — kept for
    small-data callers who want the frames; ``detect_stream`` no longer
    goes through it (it streams the sorted flags instead)."""
    cols = [order_col, flag_col] + ([group_col] if group_col else [])

    def prj(t: pa.Table) -> pa.Table:
        return t.select([c for c in cols if c in t.column_names])

    pdf = ds.map_batches(prj, batch_format="pyarrow").to_pandas()
    pdf[flag_col] = pdf[flag_col].fillna(False).astype(bool)
    pdf = pdf.sort_values(order_col, kind="stable")
    if group_col:
        return {str(g): grp for g, grp in pdf.groupby(group_col)}
    return {"": pdf}


def detect_stream(ds: rd.Dataset, *, order_col: str = "timestamp",
                  flag_col: str = "unusual", group_col: str | None = None,
                  window_size: int = 50, threshold: float = 0.10,
                  batch_size: int = 65536) -> dict[str, list[WindowVerdict]]:
    """Run the reference detector per ordered partition; returns
    {partition → verdicts}.  ``group_col=None`` = one global stream
    (exactly the reference's semantics).

    Scale shape: the (order, flag[, group]) projection is range-SORTED by
    Ray (distributed, spillable) and then STREAMED through the driver in
    batches — the driver holds only the current batch plus one tiny
    ``UnusualRatioReplay`` state per group (rows-seen/start/count/index),
    never the corpus.  This replaced the collect-then-pandas-sort path,
    which pinned O(corpus) rows in driver memory.  Rows tying on
    ``order_col`` may replay in either order across the distributed sort
    (the reference's fixtures carry unique timestamps); a tie inside one
    window is order-insensitive anyway since only the count enters the
    trigger."""
    cols = [order_col, flag_col] + ([group_col] if group_col else [])
    proj = ds.select_columns(cols).sort(order_col)
    states: dict[str, UnusualRatioReplay] = {}

    def state(g: str) -> UnusualRatioReplay:
        if g not in states:
            states[g] = UnusualRatioReplay(window_size=window_size,
                                           threshold=threshold)
        return states[g]

    for batch in proj.iter_batches(batch_format="pandas",
                                   batch_size=batch_size):
        flags = batch[flag_col].fillna(False).to_numpy(dtype=bool)
        if group_col is None:
            state("").feed(flags)
            continue
        codes, uniques = pd.factorize(batch[group_col], sort=False)
        for gi, g in enumerate(uniques):
            state(str(g)).feed(flags[codes == gi])
    if group_col is None and not states:
        state("")  # empty input still yields the global-stream key
    return {g: st.finish() for g, st in states.items()}


def verdicts_table(per_group: dict[str, list[WindowVerdict]]) -> pa.Table:
    rows = {k: [] for k in ["partition", "window_index", "start_row", "end_row",
                            "n_rows", "unusual_count", "unusual_ratio", "drift"]}
    for g, vs in sorted(per_group.items()):
        for v in vs:
            rows["partition"].append(g)
            rows["window_index"].append(v.window_index)
            rows["start_row"].append(v.start_row)
            rows["end_row"].append(v.end_row)
            rows["n_rows"].append(v.n_rows)
            rows["unusual_count"].append(v.unusual_count)
            rows["unusual_ratio"].append(round(v.unusual_ratio, 6))
            rows["drift"].append(v.drift)
    return pa.Table.from_pydict(rows)
