"""Window validation pipeline: the engine's flagship end-to-end flow.

ingest window → validate (constraint kernels, single pass) → profile
(mergeable sketches) → drift (vs stored baseline) → verdict + violations +
lineage → partitioned Parquet — the realization of the reference's
conceptual lifecycle (``/root/reference/DESIGN.md:7-24,324-330,516-524``)
over Ray Data (SURVEY.md §3.4).

Scale notes
-----------
* The raw input is read ONCE per window; the kernel's findings output
  (violations capped per batch + KB-sized sketches) is the only thing
  materialized.
* Referential membership is broadcast via ``ray.put`` (sets at test scale,
  Bloom filters at 100 TB scale) and probed inside the same kernel pass —
  no shuffle join.
* Exact key-uniqueness is the one shuffle-shaped check; it reads ONLY the
  key columns (column-pruned second scan) and shuffles just those.
* Windows are independent → embarrassingly parallel across the cluster;
  a killed run resumes by skipping windows whose ``_DONE`` marker exists.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

try:
    # Ray's path resolution re-attempts `from fsspec.implementations.http
    # import HTTPFileSystem` on EVERY read; with aiohttp absent the import
    # fails each time, and two driver threads (the concurrent uniqueness
    # pass + the chunk pass) racing that failing import can observe a
    # partially-initialized module → uncaught ImportError.  Install a
    # sentinel module once: imports then succeed deterministically and the
    # isinstance check is False for every real filesystem.
    import fsspec.implementations.http  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover - aiohttp absent in sandbox
    import sys as _sys
    import types as _types

    _m = _types.ModuleType("fsspec.implementations.http")

    class _NoHTTPFileSystem:  # sentinel: local/S3 filesystems never match
        pass

    _m.HTTPFileSystem = _NoHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _m

from . import sketches
from .bloom import BloomFilter
from .checks import ValidationKernel, join_key
from .drift import js_divergence, ks_from_digests, mean_difference, psi, _kolmogorov_sf
from .sketches import Histogram, Moments, TDigest, merge_all
from .spec import TableSpec
from .ops.pool import actor_pool

# ---------------------------------------------------------------------------
# profiles
# ---------------------------------------------------------------------------

SKETCH_KINDS = ("moments", "tdigest", "hist")


@dataclass
class ColumnProfile:
    """Merged per-(group, column) profile — the engine's version of the
    reference's feature distribution (``DESIGN.md:539-551``)."""

    column: str
    group: str
    moments: Moments
    tdigest: TDigest
    hist: Histogram

    def to_row(self) -> dict:
        d = self.moments.to_dict()
        return {
            "column": self.column,
            "group": self.group,
            "count": d["count"],
            "mean": d["mean"],
            "std": d["std"],
            "min": d["min"],
            "max": d["max"],
            "median": self.tdigest.quantile(0.5),
            "p25": self.tdigest.quantile(0.25),
            "p75": self.tdigest.quantile(0.75),
        }


@dataclass
class WindowResult:
    window_id: int
    n_rows: int
    counters: dict            # check|column → violation count (exact)
    violations: pa.Table      # sampled violation rows (capped per batch)
    profiles: dict            # (group, column) → ColumnProfile
    key_hll_estimate: float | None
    drift_rows: list = field(default_factory=list)
    drift_detected: bool = False
    wall_s: float = 0.0

    @property
    def total_violations(self) -> int:
        return sum(v for k, v in self.counters.items() if not k.startswith("rows"))

    @property
    def quality_score(self) -> float:
        """DESIGN.md:386-391: scalar from error rates — 1 - violations/rows."""
        if not self.n_rows:
            return 1.0
        return max(0.0, 1.0 - self.total_violations / self.n_rows)

    @property
    def passed(self) -> bool:
        return self.total_violations == 0 and not self.drift_detected

    def verdict_row(self) -> dict:
        return {
            "window_id": self.window_id,
            "n_rows": self.n_rows,
            "n_violations": self.total_violations,
            "quality_score": round(self.quality_score, 6),
            "drift_detected": self.drift_detected,
            "passed": self.passed,
            "counters": dict(self.counters),
            "wall_s": round(self.wall_s, 3),
        }


def build_membership(dim_ds: rd.Dataset | pa.Table, columns, *, use_bloom: bool = False,
                     capacity_hint: int | None = None, fpr: float = 1e-4):
    """Collect the dimension-side key set (exact) or Bloom filter (scale path).

    The dimension side is small relative to the fact table (repos, commit
    pairs) — it is aggregated to a single object and broadcast with
    ``ray.put``; probes happen inside the fact kernel (no shuffle).

    Keys are stored as uint64 HASHES of the joined key columns (matching
    ``checks.hash_keys``), so fact-side probes never build per-row key
    strings.  A hash collision can only mask a violation (never invent
    one) with probability ~n_dim/2^64 per probed row — negligible next to
    the Bloom FPR this degrades to at scale anyway."""
    from .checks import hash_keys

    if isinstance(dim_ds, pa.Table):
        batches = [dim_ds]
    else:
        batches = dim_ds.select_columns(list(columns)).iter_batches(
            batch_size=65536, batch_format="pyarrow")
    arrays = [hash_keys(pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b,
                        columns) for b in batches]
    all_keys = np.concatenate(arrays) if arrays else np.array([], dtype=np.uint64)
    if use_bloom:
        bf = BloomFilter(capacity_hint or max(len(all_keys), 1), fpr)
        bf.add(all_keys)
        bf.hashed = True
        return bf
    return set(int(k) for k in all_keys)


def build_membership_distributed(dim_ds: rd.Dataset, columns, *,
                                 capacity: int, fpr: float = 1e-4) -> BloomFilter:
    """Scale path for BIG dimension sides (e.g. 10^10 commit pairs): each
    block builds a partial Bloom over its key hashes in ``map_batches``;
    partials OR-merge on the driver (bit arrays, order-insensitive).  The
    driver never sees raw keys — only ``n_blocks`` bit arrays of the final
    filter's size."""
    from .checks import hash_keys

    proto = BloomFilter(capacity, fpr)
    n_bits, k = proto.n_bits, proto.k

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fpr)
        assert bf.n_bits == n_bits and bf.k == k
        bf.add(hash_keys(t, columns))
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    parts = dim_ds.select_columns(list(columns)).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    for raw in parts["bits"]:
        np.bitwise_or(proto.bits, np.frombuffer(raw, dtype=np.uint64),
                      out=proto.bits)
    proto.hashed = True
    return proto


def merge_findings(findings: pa.Table) -> tuple[dict, pa.Table, dict, float | None]:
    """Split + reduce a materialized findings table (tiny vs the input).

    Returns (counters, violations, profiles, key_hll_estimate)."""
    kinds = np.asarray(findings["kind"].to_pandas(), dtype=object)

    counter_mask = kinds == "counter"
    cdf = findings.filter(pa.array(counter_mask)).select(["check", "column", "n"]).to_pandas()
    counters = (
        cdf.groupby(["check", "column"])["n"].sum()
        .reset_index()
        .assign(key=lambda d: np.where(d["column"] == "", d["check"], d["check"] + "|" + d["column"]))
        .set_index("key")["n"].to_dict()
    )

    violations = findings.filter(pa.array(kinds == "violation")).select(
        ["check", "column", "row_ref", "detail"])

    sk = findings.filter(pa.array(kinds == "sketch")).to_pandas()
    profiles: dict[tuple[str, str], ColumnProfile] = {}
    key_hll = None
    prof = sk[sk["check"] == "profile"]
    for (group, column), grp in prof.groupby(["group", "column"]):
        parts = {}
        for kind in SKETCH_KINDS:
            blobs = grp[grp["detail"] == kind]["blob"]
            parts[kind] = merge_all(sketches.loads(b) for b in blobs)
        profiles[(group, column)] = ColumnProfile(column, group, parts["moments"],
                                                  parts["tdigest"], parts["hist"])
    uniq = sk[sk["check"] == "uniqueness"]
    if len(uniq):
        key_hll = merge_all(sketches.loads(b) for b in uniq["blob"]).estimate()
    return counters, violations, profiles, key_hll


# ---------------------------------------------------------------------------
# exact key uniqueness (the one shuffle-shaped check)
# ---------------------------------------------------------------------------


def uniqueness_violations(ds: rd.Dataset | str, spec: TableSpec,
                          read_filter=None) -> tuple[pa.Table, int, pa.Table | None]:
    """Duplicate-key detection (the one shuffle-shaped check), two-tier:

    1. Shuffle 8-byte key HASHES, not key strings: per-batch vectorized
       ``hash_keys`` → ``groupby(hash).count()`` — the exchange carries
       one uint64 per row instead of a ~100-byte composite key.
    2. Hash-level duplicates (a tiny candidate set: real dups + ~n²/2⁶⁴
       collisions) are verified EXACTLY: candidate rows are re-read with a
       broadcast hash filter and grouped on their full key strings.

    Returns ``(violations, extra, winners)``: one violation row per
    duplicated key (detail = occurrence count), the exact count of EXTRA
    rows beyond the kept-first (first-wins by ``spec.order_column``, the
    pinned resolution of the reference's first-wins/last-wins
    inconsistency, ``news.py:74-82`` vs ``news.py:349-356``; SURVEY.md
    D2/D3), and — when the spec has an order column — a small winners
    table (key, win_order) so downstream consumers (``materialize_silver``)
    can KEEP the documented winner instead of dropping every copy."""
    from .checks import hash_keys

    key_cols = list(spec.unique_key or ())
    order_col = spec.order_column
    empty = pa.table({"check": pa.array([], pa.string()),
                      "column": pa.array([], pa.string()),
                      "row_ref": pa.array([], pa.string()),
                      "detail": pa.array([], pa.string())})
    if not key_cols:
        return empty, 0, None

    def keys_ds(with_order: bool = False) -> rd.Dataset:
        # a string input gets a fresh COLUMN-PRUNED read per pass (reading
        # 3 key columns, not the multi-KB content rows)
        cols = key_cols + ([order_col] if with_order and order_col
                           and order_col not in key_cols else [])
        if isinstance(ds, str):
            return rd.read_parquet(ds, columns=cols, filter=read_filter)
        return ds.select_columns(cols)

    from .ops.relational import duplicate_values_sorted

    hashed = keys_ds().map_batches(
        lambda b: pa.table({"kh": pa.array(hash_keys(b, key_cols).astype(np.int64))}),
        batch_format="pyarrow")
    # sort + adjacent-equal scan, NOT groupby.count: the aggregate's
    # per-group overhead melts on ~all-unique keys (the common case here);
    # the scan returns a tight superset (batch-boundary values included)
    # and the second pass verifies exactly anyway
    dup_h = duplicate_values_sorted(hashed, "kh")
    if len(dup_h) == 0:
        return empty, 0, None

    cand_ref = ray.put(np.sort(dup_h.astype(np.int64)))

    class FetchCandidates:
        def __init__(self):
            self.cand = ray.get(cand_ref)  # sorted int64 array

        def __call__(self, b: pa.Table) -> pa.Table:
            kh = hash_keys(b, key_cols).astype(np.int64)
            # vectorized membership probe (np.isin against the sorted
            # candidate array) — a per-row Python set probe costs ~1 µs/row
            # and dominates at 10^6+ rows
            mask = pa.array(np.isin(kh, self.cand))
            sub = b.filter(mask)
            out = {"key": pa.array(join_key(sub, key_cols))}
            if order_col and order_col in sub.column_names:
                out["ord"] = sub[order_col]
            return pa.table(out)

    cand = keys_ds(with_order=True).map_batches(
        FetchCandidates, batch_format="pyarrow", concurrency=actor_pool()).to_pandas()
    vc = cand["key"].value_counts()
    vc = vc[vc > 1]
    if len(vc) == 0:
        return empty, 0, None
    extra = int((vc - 1).sum())
    colname = "|".join(key_cols)
    winners = None
    if order_col and "ord" in cand.columns:
        win = (cand[cand["key"].isin(set(vc.index))]
               .groupby("key")["ord"].min().reset_index())
        winners = pa.table({"key": pa.array(win["key"].astype(str)),
                            "win_order": pa.Array.from_pandas(win["ord"])})
    violations = pa.table({
        "check": pa.array(["uniqueness"] * len(vc)),
        "column": pa.array([colname] * len(vc)),
        "row_ref": pa.array(vc.index.astype(str).tolist(), pa.string()),
        "detail": pa.array([f"{int(c)} occurrences (kept first by order)" for c in vc],
                           pa.string()),
    })
    return violations, extra, winners


# ---------------------------------------------------------------------------
# baseline store + drift scoring
# ---------------------------------------------------------------------------


class Baseline:
    """Persisted per-(group, column) sketch table — the engine's version of
    ``DriftDetector.reference_data`` (``DESIGN.md:533-551``), stored as
    Parquet so every node can load it (W6 'baseline promote' = rewrite)."""

    def __init__(self, profiles: dict[tuple[str, str], ColumnProfile]):
        self.profiles = profiles

    def save(self, path: str) -> None:
        rows = {"group": [], "column": [], "moments": [], "tdigest": [], "hist": []}
        for (g, c), p in self.profiles.items():
            rows["group"].append(g)
            rows["column"].append(c)
            rows["moments"].append(sketches.dumps(p.moments))
            rows["tdigest"].append(sketches.dumps(p.tdigest))
            rows["hist"].append(sketches.dumps(p.hist))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pq.write_table(pa.table({
            "group": pa.array(rows["group"], pa.string()),
            "column": pa.array(rows["column"], pa.string()),
            "moments": pa.array(rows["moments"], pa.binary()),
            "tdigest": pa.array(rows["tdigest"], pa.binary()),
            "hist": pa.array(rows["hist"], pa.binary()),
        }), path)

    @classmethod
    def load(cls, path: str) -> "Baseline":
        t = pq.read_table(path).to_pandas()
        profiles = {}
        for _, r in t.iterrows():
            profiles[(r["group"], r["column"])] = ColumnProfile(
                r["column"], r["group"], sketches.loads(r["moments"]),
                sketches.loads(r["tdigest"]), sketches.loads(r["hist"]))
        return cls(profiles)


def drift_report(baseline: "Baseline", profiles: dict, spec: TableSpec) -> list[dict]:
    """KS + PSI + JS + mean-difference per (group, column) vs the baseline
    (``DESIGN.md:556-580`` report shape), plus one categorical-drift row per
    profile column over the GROUP SHARES (e.g. the lang mix), PSI over group
    row-count frequencies.

    KS statistic comes from the two t-digest ECDFs (scale path, no raw
    rows); its p-value uses the asymptotic Kolmogorov distribution with the
    sketch counts.  The numeric gate requires BOTH significance
    (p < ks_p_threshold) and effect size (stat > ks_stat_threshold, above
    the sketch approximation error) — or a PSI/JS threshold breach."""
    rows = []
    d = spec.drift
    for (g, c), cur in sorted(profiles.items()):
        ref = baseline.profiles.get((g, c))
        if ref is None or ref.moments.n == 0 or cur.moments.n == 0:
            continue
        ks_stat = ks_from_digests(ref.tdigest, cur.tdigest)
        n1, n2 = ref.moments.n, cur.moments.n
        en = (n1 * n2 / (n1 + n2)) ** 0.5
        ks_p = _kolmogorov_sf((en + 0.12 + 0.11 / en) * ks_stat)
        psi_v = psi(ref.hist, cur.hist)
        js_v = js_divergence(ref.hist, cur.hist)
        md = mean_difference(ref.moments.mean, ref.moments.std, cur.moments.mean)
        drifted = bool(
            (ks_p < d.ks_p_threshold and ks_stat > d.ks_stat_threshold)
            or psi_v > d.psi_threshold
            or js_v > d.js_threshold
        )
        # small groups are advisory only: PSI/KS on a few hundred rows is
        # dominated by sampling noise (gate tested in tests/test_drift.py)
        if g != "" and (n1 < d.min_group_count or n2 < d.min_group_count):
            drifted = False
        rows.append({
            "kind": "numeric", "group": g, "column": c,
            "ks_stat": round(ks_stat, 6), "ks_p": ks_p,
            "psi": round(psi_v, 6), "js": round(js_v, 6),
            "mean_difference": round(md, 6),
            "ref_count": int(n1), "cur_count": int(n2),
            "drift_detected": drifted,
        })
    # categorical drift: PSI over group-share frequencies per profile column
    for col in {c for (_, c) in profiles}:
        ref_counts, cur_counts = [], []
        groups = sorted({g for (g, c2) in set(profiles) | set(baseline.profiles)
                         if c2 == col and g != ""})
        if len(groups) < 2:
            continue
        for g in groups:
            r = baseline.profiles.get((g, col))
            c2 = profiles.get((g, col))
            ref_counts.append(r.moments.n if r else 0)
            cur_counts.append(c2.moments.n if c2 else 0)
        from .drift import psi_from_counts

        cat_psi = psi_from_counts(np.asarray(ref_counts, dtype=np.float64),
                                  np.asarray(cur_counts, dtype=np.float64))
        rows.append({
            "kind": "categorical", "group": "*", "column": spec.group_column or col,
            "psi": round(cat_psi, 6),
            "drift_detected": bool(cat_psi > d.categorical_psi_threshold),
        })
    return rows



# ---------------------------------------------------------------------------
# window validation + run orchestration (resumable)
# ---------------------------------------------------------------------------


def infer_hist_edges(input_path: str, spec: TableSpec, nbins: int = 32) -> dict[str, np.ndarray]:
    """Column-pruned min/max pre-pass fixing histogram bin edges.

    Edges must be identical across windows so histogram partials merge and
    PSI/JS compare.  Heavy-tailed positive columns (hi/lo > 1000, e.g.
    content length) get log-spaced edges so the mass doesn't collapse into
    one linear bin."""
    from ray.data.aggregate import Max, Min

    cols = list(spec.profile_columns)
    if not cols:
        return {}
    ds = rd.read_parquet(input_path, columns=cols)
    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"min_{c}"), Max(c, alias_name=f"max_{c}")]
    row = ds.aggregate(*aggs)
    edges: dict[str, np.ndarray] = {}
    for c in cols:
        lo, hi = float(row[f"min_{c}"]), float(row[f"max_{c}"])
        if not (hi > lo):
            hi = lo + 1.0
        if lo > 0 and hi / lo > 1000.0:
            edges[c] = np.geomspace(lo, hi, nbins + 1)
        else:
            edges[c] = np.linspace(lo, hi, nbins + 1)
    return edges


def _findings_to_results(table: pa.Table, spec: TableSpec) -> dict[int, WindowResult]:
    """Group a findings table by window and reduce each to a WindowResult."""
    results: dict[int, WindowResult] = {}
    windows = table["window"].to_pandas()
    for w in sorted(windows.unique()):
        sub = table.filter(pa.array((windows == w).to_numpy()))
        counters, violations, profiles, key_hll = merge_findings(sub)
        results[int(w)] = WindowResult(int(w), int(counters.get("rows", 0)),
                                       counters, violations, profiles, key_hll)
    return results


def validate_dataset(
    ds: rd.Dataset,
    spec: TableSpec,
    *,
    window_column: str | None = None,
    membership: dict[int, object] | None = None,
    baseline: Baseline | None = None,
    hist_edges: dict[str, np.ndarray] | None = None,
    check_uniqueness: bool = True,
    batch_size: int | None = None,
    kernel_concurrency=None,
    uniqueness_input: str | None = None,
    uniqueness_filter=None,
) -> dict[int, WindowResult]:
    """ONE streaming pass over the dataset validating every window in it.

    The kernel tags findings rows with the window id, so N windows cost one
    read + one (tiny) materialized findings table — per-window pipelines
    would pay N read/launch overheads.  Key uniqueness is table-GLOBAL
    (a key may not repeat across windows): when the input spans multiple
    windows it is reported on a DEDICATED window -1 result (never silently
    folded into the first window's quality score); a single-window input
    reports it on that window."""
    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor

    from .checks import FINDINGS_SCHEMA

    kernel = ValidationKernel(spec, hist_edges=hist_edges, membership=membership,
                              window_column=window_column)
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size,
                    "zero_copy_batch": True}
    if kernel_concurrency:
        kwargs["concurrency"] = kernel_concurrency

    # the uniqueness shuffle runs CONCURRENTLY with the kernel pass (its own
    # Ray Data execution from a second driver thread) — the two pipelines
    # interleave under the streaming executor instead of serializing
    uniq_future = None
    pool = ThreadPoolExecutor(1)
    if check_uniqueness and spec.unique_key:
        uniq_future = pool.submit(uniqueness_violations, uniqueness_input or ds,
                                  spec, uniqueness_filter)

    findings = ds.map_batches(kernel, **kwargs).materialize()
    parts = [t for t in ray.get(findings.to_arrow_refs()) if t.num_rows]
    table = (pa.concat_tables([t.cast(FINDINGS_SCHEMA) for t in parts])
             if parts else FINDINGS_SCHEMA.empty_table())
    results = _findings_to_results(table, spec)
    if not results:
        results = {-1: WindowResult(-1, 0, {}, FINDINGS_SCHEMA.empty_table().select(
            ["check", "column", "row_ref", "detail"]), {}, None)}

    if uniq_future is not None:
        dup, extra, _winners = uniq_future.result()
        if len(results) == 1:
            res = results[min(results)]  # single-window input → that window
        else:
            # multi-window input: table-global check gets its own window -1
            # result so no data window's quality score absorbs table-wide
            # duplicates
            res = results.setdefault(-1, WindowResult(
                -1, 0, {}, FINDINGS_SCHEMA.empty_table().select(
                    ["check", "column", "row_ref", "detail"]), {}, None))
        res.counters["uniqueness|" + "|".join(spec.unique_key)] = extra
        res.violations = pa.concat_tables([res.violations, dup])
    pool.shutdown(wait=False)

    wall = time.perf_counter() - t0
    for res in results.values():
        res.wall_s = wall / max(len(results), 1)
        if baseline is not None:
            res.drift_rows = drift_report(baseline, res.profiles, spec)
            res.drift_detected = any(r["drift_detected"] for r in res.drift_rows)
    return results


def validate_window(
    ds: rd.Dataset,
    spec: TableSpec,
    *,
    window_id: int = 0,
    membership: dict[int, object] | None = None,
    baseline: Baseline | None = None,
    hist_edges: dict[str, np.ndarray] | None = None,
    check_uniqueness: bool = True,
) -> WindowResult:
    """One window through the full constraint + profile + drift pass."""
    results = validate_dataset(ds, spec, membership=membership, baseline=baseline,
                               hist_edges=hist_edges, check_uniqueness=check_uniqueness)
    res = results.popitem()[1]
    res.window_id = window_id
    return res


def _window_dir(out_dir: str, window_id: int) -> str:
    return os.path.join(out_dir, f"window={window_id}")


def window_done(out_dir: str, window_id: int) -> bool:
    return os.path.exists(os.path.join(_window_dir(out_dir, window_id), "_DONE"))


def write_window_result(out_dir: str, res: WindowResult) -> None:
    """Resumable output layout (SURVEY.md §4.2): violations parquet +
    profile-sketch sidecar + lineage json, then the ``_DONE`` marker LAST so
    a kill mid-write leaves the window rerunnable, never half-trusted."""
    wdir = _window_dir(out_dir, res.window_id)
    os.makedirs(wdir, exist_ok=True)
    pq.write_table(res.violations, os.path.join(wdir, "violations.parquet"))
    if res.profiles:
        Baseline(res.profiles).save(os.path.join(wdir, "profiles.parquet"))
    lineage = res.verdict_row()
    lineage["profiles"] = [p.to_row() for p in res.profiles.values()]
    lineage["drift"] = res.drift_rows
    lineage["key_hll_estimate"] = res.key_hll_estimate
    with open(os.path.join(wdir, "lineage.json"), "w") as f:
        json.dump(lineage, f, default=float)
    with open(os.path.join(wdir, "_DONE"), "w") as f:
        f.write("ok\n")


def aggregate_profiles(out_dir: str,
                       windows: list[int] | None = None) -> "Baseline":
    """TABLE-level profiles by MERGING the per-window sketch sidecars —
    no rescan of the data, ever.  Because every sketch the kernel emits
    (Welford moments, t-digest, histogram) is order-insensitively
    mergeable, the table profile of N validated windows is a driver-side
    fold over N tiny ``profiles.parquet`` files; adding window N+1 later
    costs one more merge, not a recompute.  This is the incremental-
    aggregation half of the lakehouse story (S8): bronze windows →
    silver verdicts → GOLD table profiles, each derivable from the layer
    below without touching raw bytes again.

    ``windows=None`` merges every ``_DONE`` window under ``out_dir``."""
    import glob as _glob
    import re as _re

    if windows is None:
        windows = sorted(
            int(_re.search(r"window=(\d+)", d).group(1))
            for d in _glob.glob(os.path.join(out_dir, "window=*"))
            if os.path.exists(os.path.join(d, "_DONE")))
    merged: dict[tuple[str, str], ColumnProfile] = {}
    for w in windows:
        b = Baseline.load(os.path.join(_window_dir(out_dir, w),
                                       "profiles.parquet"))
        for key, p in b.profiles.items():
            if key not in merged:
                merged[key] = p
            else:
                m = merged[key]
                merged[key] = ColumnProfile(
                    p.column, p.group, m.moments.merge(p.moments),
                    m.tdigest.merge(p.tdigest), m.hist.merge(p.hist))
    return Baseline(merged)


def load_lineage(out_dir: str, window_id: int) -> dict:
    with open(os.path.join(_window_dir(out_dir, window_id), "lineage.json")) as f:
        return json.load(f)


def baseline_file(baseline_path: str, table: str | None = None) -> str:
    """Resolve the baseline location.  With ``table`` set, ``baseline_path``
    is a DIRECTORY holding one parquet per table
    (``<baseline_path>/<table>.parquet``) so specs sharing an out_dir
    promote independently instead of clobbering one shared file."""
    if table is None:
        return baseline_path
    return os.path.join(baseline_path, f"{table}.parquet")


def promote_baseline(out_dir: str, window_id: int, baseline_path: str,
                     table: str | None = None) -> None:
    """W6 / DESIGN.md:582-585 ``update_reference``: adopt a completed
    window's profile sketches as the new baseline.  Pass ``table``
    (usually ``spec.name``) to namespace the store per table — see
    ``baseline_file``."""
    src = os.path.join(_window_dir(out_dir, window_id), "profiles.parquet")
    Baseline.load(src).save(baseline_file(baseline_path, table))


def run_validation(
    input_path: str,
    out_dir: str,
    spec: TableSpec,
    *,
    window_column: str = "window_id",
    windows: list[int] | None = None,
    dim_paths: dict[str, str] | None = None,
    baseline_path: str | None = None,
    use_bloom: bool = False,
    hist_edges: dict[str, np.ndarray] | None = None,
    check_uniqueness: bool = True,
    batch_size: int | None = None,
    windows_per_pass: int = 4,
    read_concurrency: int | None = None,
    strict_schema: bool = False,
) -> list[WindowResult]:
    """Validate every window of a partitioned Parquet table, resumably.

    * dimension keys are collected ONCE and broadcast via ``ray.put``
      (exact sets at test scale, Bloom filters with ``use_bloom=True``);
    * pending windows run in CHUNKED streaming passes of
      ``windows_per_pass`` (window-tagged findings), each chunk writing
      per-window outputs + ``_DONE`` markers — a killed run loses at most
      one chunk and resumes past everything marked done (north_rule);
    * key uniqueness is a TABLE-level check (global across windows),
      checkpointed once under ``out_dir/table/`` with its own marker."""
    os.makedirs(out_dir, exist_ok=True)
    t_run0 = time.perf_counter()
    stage_s: dict[str, float] = {}

    def _mark(name: str, t0: float) -> None:
        stage_s[name] = round(stage_s.get(name, 0.0) + time.perf_counter() - t0, 3)

    # schema preflight: metadata-only snapshot + drift vs the previous
    # run's snapshot (footer read — costs nothing at any scale); with
    # strict_schema the run aborts before any scan is scheduled.  The
    # baseline snapshot is NOT advanced here — only after the run
    # completes — so a crashed run's retry still reports the drift.
    t0 = time.perf_counter()
    from .schema_drift import persist_snapshot, record_and_diff
    from .sources import footer_schema_groups, read_parquet_evolving

    # ONE footer walk per run: the grouping feeds the schema snapshot,
    # the drift diff AND every evolving read below (a 50k-file directory
    # on object storage pays the serial footer-open loop exactly once)
    _fgroups = footer_schema_groups(input_path)
    schema_report = record_and_diff(out_dir, input_path, spec,
                                    strict=strict_schema, persist=False,
                                    groups=_fgroups)
    # mixed footer schemas ⇒ the table evolved mid-directory: route every
    # data read through the schema-group union reader (typed null padding
    # per version) instead of a naive read that binds the first
    # fragment's schema.
    n_schema_groups = len(_fgroups)

    def _common(columns) -> bool:
        # a column set present with ONE type in every schema group needs
        # no union-by-name — the plain pruned read is both correct and
        # cheaper (the union path adds a per-group read + padding stage)
        return all(
            c in sch.names for sch, _ in _fgroups.values() for c in columns
        ) and all(
            len({str(sch.field(c).type) for sch, _ in _fgroups.values()}) == 1
            for c in columns)

    def _read(columns=None, **kw) -> rd.Dataset:
        if n_schema_groups > 1 and not (columns and _common(columns)):
            return read_parquet_evolving(input_path, columns=columns,
                                         groups=_fgroups, **kw)
        return rd.read_parquet(input_path, columns=columns, **kw)

    # window zone map (metadata-only, ONE footer-stats pass per run):
    # each chunked validation pass reads ONLY the row groups whose
    # [vmin, vmax] overlaps its windows.  read_parquet(filter=...) does
    # NOT prune row groups — measured: every chunk re-scanned the whole
    # table AND paid a slower filtered-read path (2x read amplification
    # at 2 chunks; on a resume with 1% pending it would be 100x).  Files
    # lacking the window column (or stats) fall back to the filter read.
    def _window_zone_maps():
        from .ops.zonemap import parquet_zone_map

        try:
            maps = {}
            for key, (sch, fs) in _fgroups.items():
                if window_column not in sch.names:
                    return None
                maps[key] = parquet_zone_map(fs, window_column).to_pandas()
            return maps
        except Exception:
            return None  # stats missing/odd layout: correctness via filter

    _zmaps = _window_zone_maps()

    def _read_chunk(chunk: list[int], concurrency=None) -> rd.Dataset:
        if _zmaps is None:
            return _read(filter=pc.field(window_column).isin(chunk),
                         concurrency=concurrency)
        from .ops.relational import union_by_name
        from .ops.zonemap import pruned_read

        lo_w, hi_w = min(chunk), max(chunk)
        parts = []
        for key in sorted(_fgroups):
            zm = _zmaps[key]
            hit = zm["vmin"].isna() | ~((zm["vmax"] < lo_w)
                                        | (zm["vmin"] > hi_w))
            if not hit.any():
                continue  # whole schema group outside the chunk
            parts.append(pruned_read(
                _fgroups[key][1], window_column, lo_w, hi_w,
                zone_map=zm, value_set=chunk, concurrency=concurrency))
        if not parts:
            return _read(filter=pc.field(window_column).isin(chunk),
                         concurrency=concurrency)
        return parts[0] if len(parts) == 1 else union_by_name(parts)

    _mark("schema_preflight", t0)

    t0 = time.perf_counter()
    membership: dict[int, object] = {}
    if dim_paths:
        for i, fk in enumerate(spec.foreign_keys):
            path = dim_paths.get(fk.dim_table)
            if path is None:
                continue
            dim = rd.read_parquet(path, columns=list(fk.dim_columns))
            m = build_membership(dim, fk.dim_columns, use_bloom=use_bloom)
            membership[i] = ray.put(m)

    _mark("membership", t0)
    t0 = time.perf_counter()
    if windows is None:
        wvals = _read(columns=[window_column]).unique(window_column)
        windows = sorted(int(w) for w in wvals)
    pending = [w for w in windows if not window_done(out_dir, w)]
    _mark("window_discovery", t0)
    t0 = time.perf_counter()

    # table-level uniqueness: GLOBAL across all windows, checkpointed under
    # out_dir/table/ with its own _DONE (a key may not repeat anywhere in
    # the table, so this check cannot be chunked per window).  It runs
    # CONCURRENTLY with the window chunk passes from a second driver
    # thread — its pruned key-column read + sort interleaves with the
    # kernel pass under the streaming executor instead of serializing.
    from concurrent.futures import ThreadPoolExecutor

    tdir = os.path.join(out_dir, "table")
    uniq_future = None
    uniq_pool = None
    uniq_t0 = time.perf_counter()
    if check_uniqueness and spec.unique_key and             not os.path.exists(os.path.join(tdir, "_DONE")):
        uniq_pool = ThreadPoolExecutor(1)
        uniq_future = uniq_pool.submit(uniqueness_violations, input_path, spec)

    uniq_done = [False]

    def finish_uniqueness() -> None:
        if uniq_future is None or uniq_done[0]:
            return
        uniq_done[0] = True
        dup, extra, winners = uniq_future.result()
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(dup, os.path.join(tdir, "uniqueness_violations.parquet"))
        if winners is not None:
            # lineage artifact: first-by-order winner per duplicated key.
            # (materialize_silver re-resolves winners from the raw rows —
            # it additionally tie-breaks on the full row when the order
            # value is part of the key and ties.)
            pq.write_table(winners, os.path.join(tdir, "uniqueness_winners.parquet"))
        with open(os.path.join(tdir, "lineage.json"), "w") as f:
            json.dump({"check": "uniqueness",
                       "key": "|".join(spec.unique_key),
                       "extra_rows": int(extra),
                       "duplicate_keys": dup.num_rows}, f)
        with open(os.path.join(tdir, "_DONE"), "w") as f:
            f.write("ok\n")
        uniq_pool.shutdown(wait=False)
        # overlapped wall (submit → result); runs alongside the chunks
        stage_s["uniqueness_overlapped"] = round(time.perf_counter() - uniq_t0, 3)

    if not pending:
        finish_uniqueness()
        return []

    t0 = time.perf_counter()
    if hist_edges is None:
        hist_edges = infer_hist_edges(input_path, spec)
    _mark("hist_edges", t0)
    # per-table namespacing: a directory baseline store resolves to this
    # spec's file; a missing per-table file simply means no baseline yet
    bpath = (baseline_file(baseline_path, spec.name)
             if baseline_path and os.path.isdir(baseline_path)
             else baseline_path)
    baseline = (Baseline.load(bpath)
                if bpath and os.path.exists(bpath) else None)

    # chunked passes: a killed run loses at most windows_per_pass windows
    # of work — everything behind a _DONE marker is skipped on resume.
    # If a chunk raises, the concurrent uniqueness result is still
    # checkpointed best-effort so the resumed run does not repay the most
    # expensive table-global check.
    out = []
    try:
        for lo in range(0, len(pending), windows_per_pass):
            chunk = pending[lo: lo + windows_per_pass]
            # read_concurrency caps concurrent parquet-decode tasks: decode
            # is memory-bandwidth-bound, and beyond ~a dozen concurrent
            # decoders per memory domain added workers CONTEND rather than
            # scale (see BASELINE.md §scaling); the kernel stage is uncapped
            ds = _read_chunk(chunk, concurrency=read_concurrency)
            results = validate_dataset(ds, spec, window_column=window_column,
                                       membership=membership, baseline=baseline,
                                       hist_edges=hist_edges,
                                       check_uniqueness=False,
                                       batch_size=batch_size)
            for w in chunk:
                res = results.get(w)
                if res is None:
                    res = WindowResult(w, 0, {}, pa.table(
                        {"check": pa.array([], pa.string()),
                         "column": pa.array([], pa.string()),
                         "row_ref": pa.array([], pa.string()),
                         "detail": pa.array([], pa.string())}), {}, None)
                write_window_result(out_dir, res)
                out.append(res)
    except BaseException:
        try:
            finish_uniqueness()
        except Exception:
            pass  # surface the chunk failure, not the cleanup's
        raise

    finish_uniqueness()

    # threshold alerting over the fresh verdicts (T5, DESIGN.md:674-747);
    # history appends under out_dir/alerts/.  Schema drift is RUN-level
    # state, so it rides as one synthetic verdict row (window_id = -1)
    # with an integer schema_drift metric the default rule fires on.
    from .alerts import AlertManager

    verdict_rows = [r.verdict_row() for r in out]
    drift_info = schema_report["drift"]
    verdict_rows.append({
        "window_id": -1,
        "schema_drift": int(bool(drift_info and drift_info["drifted"])),
        "schema_violations": len(schema_report["spec_violations"]),
    })
    AlertManager(history_path=os.path.join(out_dir, "alerts")).evaluate(
        verdict_rows)

    # run-level stage metrics (A8: per-stage wall time + rows/s) — appended
    # per submission so resumed runs keep their history ("uniqueness_
    # overlapped" runs concurrently with the chunks, so it is excluded
    # from the serial-stage residual)
    stage_s["validate_chunks"] = round(
        time.perf_counter() - t_run0
        - sum(v for k, v in stage_s.items() if k != "uniqueness_overlapped"),
        3)
    run_lineage = {
        "windows_validated": [r.window_id for r in out],
        "rows": int(sum(r.n_rows for r in out)),
        "total_s": round(time.perf_counter() - t_run0, 3),
        "stages_s": stage_s,
        "schema_drift": schema_report["drift"],
        "schema_violations": schema_report["spec_violations"],
        "schema_groups": n_schema_groups,
    }
    run_lineage["rows_per_sec"] = round(
        run_lineage["rows"] / max(run_lineage["total_s"], 1e-9), 1)
    hist_file = os.path.join(out_dir, "run_lineage.jsonl")
    with open(hist_file, "a") as f:
        f.write(json.dumps(run_lineage) + "\n")
    # the run succeeded — NOW advance the schema baseline for the next run
    persist_snapshot(out_dir, schema_report["schema"])
    return out


def load_table_report(out_dir: str) -> dict:
    """Table-level (cross-window) check lineage — currently uniqueness."""
    path = os.path.join(out_dir, "table", "lineage.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def materialize_silver(
    input_path: str,
    out_dir: str,
    spec: TableSpec,
    *,
    window_column: str = "window_id",
    silver_dir: str | None = None,
) -> int:
    """Lakehouse "silver" layer (S8, ``DESIGN.md:394-433``): rows that
    passed every per-row check, written as Parquet partitioned by window.

    The violating row set is tiny (counters prove it), so it broadcasts as
    a set of row-key hashes; one streaming filter pass writes the clean
    rows — bronze (raw input) is never rewritten, gold is the per-window
    lineage/profile layer already emitted by ``run_validation``.

    For keys flagged by the table-global uniqueness check, the FIRST
    occurrence by ``spec.order_column`` is KEPT (the pinned first-wins
    semantics) — only the extra copies are dropped.  If any window's
    violation sample was truncated by the kernel's per-batch cap (counters
    record exact totals; emitted rows may be fewer), this raises instead of
    silently letting violating rows into silver.

    Returns the number of silver rows written."""
    import glob as _glob

    silver_dir = silver_dir or os.path.join(out_dir, "silver")
    bad_refs: list[str] = []
    expected_violations = 0
    for wdir in sorted(_glob.glob(os.path.join(out_dir, "window=*"))):
        vf = os.path.join(wdir, "violations.parquet")
        if not os.path.exists(vf):
            continue
        t = pq.read_table(vf, columns=["row_ref"])
        bad_refs.extend(t["row_ref"].to_pylist())
        lin_path = os.path.join(wdir, "lineage.json")
        if os.path.exists(lin_path):
            with open(lin_path) as f:
                counters = json.load(f).get("counters", {})
            expected_violations += sum(
                int(v) for k, v in counters.items()
                if not k.startswith("rows") and not k.startswith("uniqueness"))
    # missing-column first: it records n_rows in its counter but only one
    # '*' violation row per batch, which would otherwise masquerade as a
    # (mis-diagnosed, unfixable-by-raising-the-cap) truncated sample
    if "*" in set(bad_refs):
        raise ValueError("a required column is missing entirely; silver layer "
                         "cannot be materialized for this input")
    if expected_violations > len(bad_refs):
        raise ValueError(
            f"violation sample truncated: counters record {expected_violations} "
            f"violations but only {len(bad_refs)} violation rows were emitted "
            "(max_violations_per_batch cap bound) — rerun validation with a "
            "higher cap before materializing silver")

    key_cols = list(spec.unique_key or ())
    order_col = spec.order_column

    # uniqueness: the streaming pass drops EVERY copy of a duplicated key;
    # the (rare) duplicated rows are then re-fetched, one winner per key is
    # chosen deterministically (min order_column, full-row lexicographic
    # tiebreak — order may be part of the key and tie), and the winners are
    # appended to silver.  Dup rows ≪ corpus, so the fetch is tiny.
    tdir = os.path.join(out_dir, "table")
    uniq_path = os.path.join(tdir, "uniqueness_violations.parquet")
    dup_keys: set[str] = set()
    if os.path.exists(uniq_path):
        dup_keys = set(pq.read_table(uniq_path,
                                     columns=["row_ref"])["row_ref"].to_pylist())

    # violating rows are addressed by their key-ref string; hash both sides
    from .checks import join_key
    from .sketches import hash64

    bad_hashes = (np.sort(hash64(np.array(bad_refs, dtype=object)))
                  if bad_refs else np.array([], dtype=np.uint64))
    ref = ray.put(bad_hashes)
    dup_ref = ray.put(dup_keys)

    class DropViolating:
        def __init__(self):
            self.bad = ray.get(ref)  # sorted uint64 array
            self.dup = ray.get(dup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pandas as pd

            keep = np.ones(t.num_rows, dtype=bool)
            if len(self.bad) and key_cols:
                from .checks import row_refs

                refs = row_refs(t, spec)
                kh = hash64(refs)
                keep &= ~np.isin(kh, self.bad)
            if self.dup and key_cols:
                keys = join_key(t, key_cols)
                keep &= ~pd.Series(keys).isin(self.dup).to_numpy()
            if keep.all():
                return t
            return t.filter(pa.array(keep))

    ds = rd.read_parquet(input_path)
    clean = ds.map_batches(DropViolating, batch_format="pyarrow",
                           concurrency=actor_pool())
    clean.write_parquet(silver_dir, partition_cols=[window_column])

    if dup_keys:
        # winners: first-by-order copy of each duplicated key, minus any that
        # also violate a per-row check
        class FetchDups:
            def __init__(self):
                self.dup = ray.get(dup_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                import pandas as pd

                keys = join_key(t, key_cols)
                mask = pd.Series(keys).isin(self.dup).to_numpy()
                return t.filter(pa.array(mask))

        dup_rows = rd.read_parquet(input_path).map_batches(
            FetchDups, batch_format="pyarrow", concurrency=actor_pool()).to_pandas()
        if len(dup_rows):
            sort_cols = ([order_col] if order_col else []) + [
                c for c in dup_rows.columns if c != order_col]
            dup_rows["__key"] = join_key(
                pa.Table.from_pandas(dup_rows, preserve_index=False), key_cols)
            winners_df = (dup_rows.sort_values(sort_cols, kind="mergesort")
                          .groupby("__key", sort=False).head(1)
                          .drop(columns="__key"))
            if len(bad_hashes):
                from .checks import row_refs

                wrefs = row_refs(pa.Table.from_pandas(winners_df,
                                                      preserve_index=False), spec)
                ok = ~np.isin(hash64(wrefs), bad_hashes)
                winners_df = winners_df[ok]
            if len(winners_df):
                rd.from_pandas(winners_df).write_parquet(
                    silver_dir, partition_cols=[window_column])

    # metadata-only row count (never re-decode the written data)
    import pyarrow.dataset as pads

    n = pads.dataset(silver_dir, format="parquet", partitioning="hive").count_rows()
    return int(n)
