"""Snapshot-versioned tables: atomic commits + time travel (iceberg-lite).

The lakehouse ops already mutate data (CDC ``apply_changes``, SCD2,
compaction, z-order rewrite) but each rewrite is destructive: yesterday's
table is gone.  At 100 TB the standard answer is a MANIFEST layer — a
table is a log of immutable snapshot manifests, each listing the data
files that make up one version, committed atomically.  Readers pin a
version; writers never touch existing files; a crashed writer leaves a
temp manifest that no reader ever sees.

Layout (all under the table dir)::

    <table>/data/<content-hash>.parquet     immutable data files
    <table>/_snapshots/v000001.json         manifest: files + schema + op
    <table>/_snapshots/v000002.json

Commit protocol: write manifest to ``v{N}.json.tmp.<pid>``, then
``os.rename`` onto ``v{N}.json``.  Rename is atomic on POSIX; two racing
writers produce two manifests and the LOWER version number wins (the
second ``rename`` onto an existing name is detected by pre-checking
existence and retrying with N+1 — optimistic concurrency, the Iceberg
model).  On real object stores the rename becomes a conditional PUT;
the protocol shape is identical.

Scale notes: manifests are metadata (file paths + row counts), never row
data — a snapshot of a 100 TB table is a KB-scale JSON.  ``read_version``
hands the pinned file list straight to ``ray.data.read_parquet`` so the
read itself has normal file/row-group parallelism and column pruning.
Only ``overwrite``/``append`` move row data, and they stream through a
distributed content-hash-named parquet sink (idempotent under retry,
same contract as ``sources.write_orc``).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa

import ray.data as rd

_SNAP_DIR = "_snapshots"


def _snap_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAP_DIR, f"v{version:06d}.json")


def _write_data_files(ds: rd.Dataset, data_dir: str) -> list[dict]:
    """Stream ``ds`` into immutable content-hash-named parquet files;
    returns manifest entries (path relative to the table dir, rows)."""
    import pyarrow.parquet as pq

    os.makedirs(data_dir, exist_ok=True)

    def write_shard(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        col = t.column(0)
        probe = f"{t.num_rows}|{col[0]}|{col[-1]}|{t.schema}"
        h = hashlib.md5(probe.encode()).hexdigest()[:20]
        p = os.path.join(data_dir, f"{h}.parquet")
        pq.write_table(t, p)
        return pa.table({"file": [os.path.basename(p)],
                         "rows": [t.num_rows]})

    man = ds.map_batches(write_shard, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if "file" not in man.columns:        # 0-row to_pandas drops columns
        return []
    return [{"file": f, "rows": int(r)}
            for f, r in sorted(zip(man["file"], man["rows"]))]


def latest_version(table_dir: str) -> int:
    """Highest committed version, 0 if the table has no snapshots."""
    d = os.path.join(table_dir, _SNAP_DIR)
    if not os.path.isdir(d):
        return 0
    vs = [int(n[1:7]) for n in os.listdir(d)
          if n.startswith("v") and n.endswith(".json")]
    return max(vs, default=0)


def _load_manifest(table_dir: str, version: int) -> dict:
    p = _snap_path(table_dir, version)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no snapshot v{version} in {table_dir} "
            f"(latest is v{latest_version(table_dir)})")
    with open(p) as f:
        return json.load(f)


def _commit(table_dir: str, files: list[dict], op: str,
            parent: int, schema_str: str) -> int:
    """Atomically publish a manifest; optimistic retry on version races."""
    os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
    version = parent + 1
    body = None
    while True:
        target = _snap_path(table_dir, version)
        if os.path.exists(target):      # lost the race: retry at N+1
            version += 1
            continue
        if body is None or body["version"] != version:
            body = {"version": version, "parent": parent, "op": op,
                    "committed_at": time.time(), "schema": schema_str,
                    "files": files,
                    "total_rows": sum(f["rows"] for f in files)}
        tmp = f"{target}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(body, f, indent=1)
        try:
            # exclusive link-then-rename: fails if target appeared since
            # the existence check, instead of silently replacing it
            os.link(tmp, target)
        except FileExistsError:
            os.remove(tmp)
            version += 1
            continue
        os.remove(tmp)
        return version


def snapshot_append(table_dir: str, ds: rd.Dataset) -> int:
    """Commit a new version = parent's files + ``ds``'s rows."""
    parent = latest_version(table_dir)
    base = _load_manifest(table_dir, parent)["files"] if parent else []
    new = _write_data_files(ds, os.path.join(table_dir, "data"))
    schema = str(ds.schema())
    return _commit(table_dir, base + new, "append", parent, schema)


def snapshot_overwrite(table_dir: str, ds: rd.Dataset) -> int:
    """Commit a new version consisting of only ``ds``'s rows.  Old
    versions stay readable — no data file is ever deleted here (see
    ``expire_snapshots``)."""
    parent = latest_version(table_dir)
    new = _write_data_files(ds, os.path.join(table_dir, "data"))
    return _commit(table_dir, new, "overwrite", parent, str(ds.schema()))


def snapshot_delete_where(table_dir: str, predicate) -> int:
    """Commit a new version with rows matching ``predicate`` removed.
    Copy-on-write at FILE granularity: files are rewritten only if they
    contain any matching row (checked streaming); untouched files are
    carried into the new manifest by reference — the 100 TB cost model
    is ∝ affected files, not table size.

    ``predicate(table) -> BooleanArray`` marks rows to DELETE."""
    import pyarrow.compute as pc

    parent = latest_version(table_dir)
    man = _load_manifest(table_dir, parent)
    data_dir = os.path.join(table_dir, "data")

    # which files contain a match? decided IN TASKS (one read per file),
    # the driver only sees the per-file boolean — ∝ files, not rows
    def probe(batch) -> "pa.Table":
        import pyarrow.parquet as pq
        names, hit = [], []
        for name in batch["file"]:
            pf = pq.ParquetFile(os.path.join(data_dir, str(name)))
            match = False
            for rg in range(pf.num_row_groups):   # early exit per group
                if pc.any(predicate(pf.read_row_group(rg))).as_py():
                    match = True
                    break
            names.append(str(name))
            hit.append(match)
        return pa.table({"file": pa.array(names, pa.string()),
                         "hit": pa.array(hit, pa.bool_())})

    flags = (rd.from_items([{"file": e["file"]} for e in man["files"]])
             .map_batches(probe, batch_format="numpy").to_pandas()
             if man["files"] else None)
    hits = set(flags[flags["hit"]]["file"]) if flags is not None else set()
    keep = [e for e in man["files"] if e["file"] not in hits]
    rewrite = [os.path.join(data_dir, f) for f in sorted(hits)]
    if rewrite:
        survivors = (rd.read_parquet(rewrite)
                     .map_batches(lambda t: t.filter(
                         pc.invert(predicate(t))),
                         batch_format="pyarrow"))
        keep += _write_data_files(survivors, data_dir)
    return _commit(table_dir, keep, "delete", parent, man["schema"])


def read_version(table_dir: str, version: int | None = None,
                 columns=None) -> rd.Dataset:
    """Dataset pinned to one snapshot (default: latest)."""
    if version is None:
        version = latest_version(table_dir)
    man = _load_manifest(table_dir, version)
    data_dir = os.path.join(table_dir, "data")
    paths = [os.path.join(data_dir, f["file"]) for f in man["files"]]
    if not paths:
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths, columns=columns)


def snapshot_log(table_dir: str) -> list[dict]:
    """Commit history, oldest first: version/op/total_rows/file count."""
    out = []
    for v in range(1, latest_version(table_dir) + 1):
        m = _load_manifest(table_dir, v)
        out.append({"version": m["version"], "op": m["op"],
                    "parent": m["parent"], "n_files": len(m["files"]),
                    "total_rows": m["total_rows"]})
    return out


def snapshot_compact(table_dir: str,
                     target_mb: int = 128) -> tuple[int, dict]:
    """Rewrite SMALL data files into ~``target_mb`` outputs and commit
    the result as a new snapshot (op="compact") — the OPTIMIZE that
    keeps time travel: every prior version still reads its original
    files (nothing is deleted here; ``expire_snapshots`` reclaims).
    Files already ≥ half the target are carried by reference, so the
    rewrite cost is ∝ small-file bytes, not table size."""
    parent = latest_version(table_dir)
    man = _load_manifest(table_dir, parent)
    data_dir = os.path.join(table_dir, "data")
    target = target_mb * 1024 * 1024

    keep, small = [], []
    for e in man["files"]:
        p = os.path.join(data_dir, e["file"])
        (small if os.path.getsize(p) < target // 2 else keep).append(e)
    if len(small) < 2:      # nothing to gain: still commit for lineage
        version = _commit(table_dir, man["files"], "compact", parent,
                          man["schema"])
        return version, {"rewritten": 0, "carried": len(man["files"])}

    paths = [os.path.join(data_dir, e["file"]) for e in small]
    total = sum(os.path.getsize(p) for p in paths)
    blocks = max(1, total // target + (1 if total % target else 0))
    merged = rd.read_parquet(paths).repartition(int(blocks))
    new = _write_data_files(merged, data_dir)
    version = _commit(table_dir, keep + new, "compact", parent,
                      man["schema"])
    return version, {"rewritten": len(small), "carried": len(keep),
                     "new_files": len(new)}


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Drop manifests older than the newest ``keep_last`` and delete
    data files no surviving snapshot references (the maintenance op
    that actually reclaims space).  Returns counts."""
    last = latest_version(table_dir)
    cutoff = max(1, last - keep_last + 1)
    live: set[str] = set()
    for v in range(cutoff, last + 1):
        live.update(f["file"] for f in _load_manifest(table_dir, v)["files"])
    dropped_files = 0
    data_dir = os.path.join(table_dir, "data")
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            if name.endswith(".parquet") and name not in live:
                os.remove(os.path.join(data_dir, name))
                dropped_files += 1
    dropped_manifests = 0
    for v in range(1, cutoff):
        p = _snap_path(table_dir, v)
        if os.path.exists(p):
            os.remove(p)
            dropped_manifests += 1
    return {"dropped_manifests": dropped_manifests,
            "dropped_files": dropped_files,
            "live_files": len(live), "latest": last}
