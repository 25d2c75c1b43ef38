"""Parquet zone maps: footer-only row-group statistics and pruned reads.

At 100 TB the cheapest scan is the one you never schedule: Parquet footers
already carry per-row-group min/max/count for every column, so an engine
can answer range predicates' *scheduling* question — which row groups can
possibly match — by reading a few KB of metadata per file instead of the
data itself.  `read_parquet(filter=...)` does this implicitly inside Ray;
these ops expose the mechanism as a first-class, testable surface:

* :func:`parquet_zone_map` — the zone-map TABLE itself (one row per
  row group: file, row_group, n_rows, vmin, vmax), built by a distributed
  map over FILES that opens footers only.  Useful on its own for data
  layout audits (is the table clustered on this column? what fraction of
  row groups would a given predicate prune?).
* :func:`pruned_read` — a range scan that consults the zone map first and
  schedules read tasks ONLY for overlapping row groups.  The zone map is
  metadata-scale (rows = row groups, not data rows), so collecting it on
  the driver is the correct move — it is the same size as the task list
  any scheduler must hold.

Engine extension beyond the reference (which reads whole CSV/JSON feeds —
/root/reference/DESIGN.md has no columnar source); oracle-checked by
q117 (zone map vs DuckDB per-file aggregates) and q118 (pruned range scan
vs a plain SQL filter), plus a planted multi-row-group pruning test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

__all__ = ["parquet_zone_map", "pruned_read", "build_bloom_index",
           "bloom_pruned_read"]


def parquet_zone_map(paths: list[str], col: str) -> rd.Dataset:
    """Zone map of ``col`` across ``paths``: one row per row group with
    ``file, row_group, n_rows, vmin, vmax`` — computed from Parquet
    FOOTERS only (no data pages are read).

    Distributed over files (one map task per path batch); min/max carry
    the column's natural Arrow type.  Row groups written without
    statistics surface as null vmin/vmax (callers must treat null as
    "cannot prune")."""
    items = [{"path": p} for p in sorted(paths)]

    def footer_stats(t: pa.Table) -> pa.Table:
        files, rgs, ns, mins, maxs = [], [], [], [], []
        for path in t["path"].to_pylist():
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(i).name: i
                     for i in range(md.num_columns)}
            ci = names[col]
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                st = rg.column(ci).statistics
                files.append(path)
                rgs.append(g)
                ns.append(rg.num_rows)
                has = st is not None and st.has_min_max
                mins.append(st.min if has else None)
                maxs.append(st.max if has else None)
        return pa.table({"file": pa.array(files, pa.string()),
                         "row_group": pa.array(rgs, pa.int64()),
                         "n_rows": pa.array(ns, pa.int64()),
                         "vmin": pa.array(mins),
                         "vmax": pa.array(maxs)})

    return rd.from_items(items).map_batches(footer_stats,
                                            batch_format="pyarrow")


def pruned_read(paths: list[str], col: str, lo, hi,
                columns: list[str] | None = None,
                exact: bool = True,
                zone_map: "pd.DataFrame | None" = None,
                value_set=None,
                concurrency: int | None = None) -> rd.Dataset:
    """Range scan ``lo <= col <= hi`` that schedules read tasks ONLY for
    row groups whose footer [vmin, vmax] overlaps the predicate.

    Two phases: (1) the zone map (metadata-scale) is computed distributed
    and collected — it IS the task list, one row per row group; (2) each
    surviving (file, row_group) becomes one read item, fetched with
    ``ParquetFile.read_row_group`` inside ``map_batches`` and, with
    ``exact`` (default), filtered to the predicate (zone maps prove
    *possible* overlap, not row-level membership).  Statistics-less row
    groups are conservatively kept.

    ``zone_map`` accepts a precomputed ``parquet_zone_map(...).to_pandas()``
    frame so a caller issuing many pruned reads over the same directory
    (run_validation's chunked window passes) walks the footers once.
    ``value_set`` narrows ``exact`` filtering to an explicit member list
    (e.g. a non-contiguous pending-window chunk inside [lo, hi]);
    ``concurrency`` caps the read tasks (parquet decode is
    memory-bandwidth-bound — see bench.py DECODE_CAP).

    The unpruned fallback is exactly ``read_parquet(filter=...)``; this
    op exists to make the pruning observable (q118's test asserts
    non-overlapping row groups are never opened)."""
    zm = (parquet_zone_map(paths, col).to_pandas()
          if zone_map is None else zone_map)
    keep = zm["vmin"].isna() | ~((zm["vmax"] < lo) | (zm["vmin"] > hi))
    tasks = zm.loc[keep, ["file", "row_group"]]
    if len(tasks) == 0:
        schema = pq.read_schema(sorted(paths)[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    items = [{"file": f, "row_group": int(g)}
             for f, g in tasks.itertuples(index=False)]
    members = list(value_set) if value_set is not None else None

    def read_groups(t: pa.Table) -> pa.Table:
        parts = []
        for f, g in zip(t["file"].to_pylist(), t["row_group"].to_pylist()):
            tbl = pq.ParquetFile(f).read_row_group(g, columns=columns)
            if exact:
                import pyarrow.compute as pc

                v = tbl[col] if col in tbl.schema.names else None
                if v is None:
                    full = pq.ParquetFile(f).read_row_group(g,
                                                            columns=[col])
                    v = full[col]
                if members is not None:
                    mask = pc.is_in(v, value_set=pa.array(members))
                else:
                    mask = pc.and_(pc.greater_equal(v, lo),
                                   pc.less_equal(v, hi))
                tbl = tbl.filter(pc.fill_null(mask, False))
            parts.append(tbl)
        return pa.concat_tables(parts)

    # one row-group per read task: block size == row-group size, the
    # parquet-native parallel grain
    return (rd.from_items(items, override_num_blocks=len(items))
            .map_batches(read_groups, batch_format="pyarrow",
                         batch_size=1, concurrency=concurrency))


def build_bloom_index(paths: list[str], col: str,
                      fpr: float = 1e-3) -> rd.Dataset:
    """Per-FILE Bloom index over ``col`` — the point-lookup complement of
    the zone map.  Footer min/max cannot prune an UNSORTED
    high-cardinality column (every file's [min, max] spans the domain);
    a per-file Bloom filter answers "could value v be in this file?"
    with no false negatives at ~10 bits/row for 1e-3 FPR — the same
    data-skipping move as Parquet's own optional bloom pages / Iceberg
    puffin blobs, surfaced as a first-class testable op.

    One map task per file (reads ONLY ``col``), each sized to its own
    row count.  Returns the index TABLE: ``(file, n_rows, n_bits, k,
    bits)`` — metadata-scale (one row per file), so collecting it on the
    driver is the correct move, exactly like the zone map."""
    from ..bloom import BloomFilter

    items = [{"path": p} for p in sorted(paths)]

    def per_file(t: pa.Table) -> pa.Table:
        files, ns, nb, ks, bits = [], [], [], [], []
        for path in t["path"].to_pylist():
            vals = pq.read_table(path, columns=[col])[col]
            arr = vals.to_numpy(zero_copy_only=False)
            bf = BloomFilter(max(len(arr), 1), fpr=fpr).add(arr)
            files.append(path)
            ns.append(len(arr))
            nb.append(bf.n_bits)
            ks.append(bf.k)
            bits.append(bf.bits.tobytes())
        return pa.table({"file": pa.array(files, pa.string()),
                         "n_rows": pa.array(ns, pa.int64()),
                         "n_bits": pa.array(nb, pa.int64()),
                         "k": pa.array(ks, pa.int64()),
                         "bits": pa.array(bits, pa.binary())})

    return (rd.from_items(items, override_num_blocks=max(len(items), 1))
            .map_batches(per_file, batch_format="pyarrow"))


def _bloom_keep_files(index: pd.DataFrame, values) -> list[str]:
    """Files whose Bloom filter reports ANY of ``values`` as maybe
    present (no false negatives: a file absent from this list provably
    holds none of the probed values)."""
    from ..bloom import BloomFilter

    vals = np.asarray(values)
    keep = []
    for row in index.itertuples(index=False):
        bf = BloomFilter.from_state(row.n_bits, row.k, row.bits)
        if bool(bf.contains(vals).any()):
            keep.append(row.file)
    return sorted(keep)


def bloom_pruned_read(paths: list[str], col: str, values,
                      columns: list[str] | None = None,
                      exact: bool = True,
                      index: "pd.DataFrame | None" = None,
                      fpr: float = 1e-3,
                      concurrency: int | None = None) -> rd.Dataset:
    """Point lookup ``col IN values`` that schedules read tasks ONLY for
    files whose Bloom index might contain one of the probed values.

    ``index`` accepts a precomputed ``build_bloom_index(...).to_pandas()``
    frame so repeated lookups over the same directory build the filters
    once (amortized like the zone map in run_validation).  With ``exact``
    (default) surviving files are filtered row-level — Bloom false
    positives never reach the result, so output equals the unpruned
    ``read_parquet + is_in`` scan bit-for-bit (q189's oracle).
    """
    import pyarrow.compute as pc

    idx = (build_bloom_index(paths, col, fpr=fpr).to_pandas()
           if index is None else index)
    keep = _bloom_keep_files(idx, values)
    if not keep:
        schema = pq.read_schema(sorted(paths)[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    member_arr = pa.array(list(values))
    read_cols = (None if columns is None
                 else list(dict.fromkeys(list(columns) + [col])))

    def filter_rows(t: pa.Table) -> pa.Table:
        if not exact:
            return t if columns is None else t.select(columns)
        mask = pc.fill_null(pc.is_in(t[col], value_set=member_arr), False)
        out = t.filter(mask)
        return out if columns is None else out.select(columns)

    return rd.read_parquet(keep, columns=read_cols,
                           concurrency=concurrency).map_batches(
        filter_rows, batch_format="pyarrow")
