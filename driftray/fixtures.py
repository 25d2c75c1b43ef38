"""Deterministic synthetic fixtures (FIXTURES.md).

Everything derives from the row id through stable 64-bit hashing — no
wall-clock, no global RNG state — so any two generations are identical and
generation parallelizes over arbitrary row-id blocks (the bench-scale path
is ``ray.data.range(n).map_batches`` over the same pure batch function).

Tables:
* ``repo_files(repo, path, commit, lang, content, content_len,
  content_sha256, window_id)`` — the flagship input (BASELINE.json
  input_hint) with planted violations and drifted windows.
* ``repos(repo)`` / ``commits(repo, commit)`` — referential dimensions.
* ``sensor_readings`` — replay of the reference's simulator semantics
  (``/root/reference/src/data_sources/iot/sensor.py:24-143``) for the
  row-for-row conformance test.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .checks import sha256_hex
from .sketches import hash64

LANGS = ["py", "js", "go", "rs", "java", "md", "yaml"]
EXTS = {"py": "py", "js": "js", "go": "go", "rs": "rs", "java": "java", "md": "md", "yaml": "yaml"}

_TOKENS = (
    "def class return import for while if else try except lambda yield "
    "fn let const var func struct impl trait pub mod use package type "
    "interface extends public static void int float string bool map list "
    "async await self this new delete match case break continue pass raise"
).split()


def _stream(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic uint64 hash stream per row id."""
    return hash64(ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(seed * 1000003 + stream))


def _uniform(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return (_stream(ids, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


@dataclass
class RepoFilesConfig:
    seed: int = 42
    n_repos: int = 200
    n_orgs: int = 7
    zipf_a: float = 1.3
    commits_per_repo: int = 50
    window_rows: int = 10_000                   # rows per window partition
    drifted_windows: tuple[int, ...] = ()       # windows with shifted length/lang dists
    content_median: int = 2048                  # bytes, log-normal
    content_sigma: float = 1.0
    content_max: int = 262_144
    p_null_path: float = 0.002
    p_dup_key: float = 0.005
    p_orphan_repo: float = 0.003
    p_bad_commit: float = 0.003
    p_bad_sha: float = 0.001
    p_bad_lang: float = 0.002       # lang outside the accepted set
    p_bad_path_fmt: float = 0.002   # path with a space (format violation)
    lang_weights: tuple[float, ...] = (0.30, 0.20, 0.12, 0.10, 0.13, 0.10, 0.05)
    # drifted windows: content length ×1.5 and lang re-weighted toward "md"
    drift_len_scale: float = 1.5
    drift_lang_weights: tuple[float, ...] = (0.10, 0.10, 0.05, 0.05, 0.05, 0.60, 0.05)
    _blob: str = field(default="", repr=False)

    def repo_names(self) -> list[str]:
        return [f"org{i % self.n_orgs}/repo{i}" for i in range(self.n_repos)]

    def zipf_probs(self) -> np.ndarray:
        ranks = np.arange(1, self.n_repos + 1, dtype=np.float64)
        p = ranks ** (-self.zipf_a)
        return p / p.sum()

    def blob(self) -> str:
        """4 MiB of deterministic pseudo-code; contents are slices of it."""
        if not self._blob:
            rng = np.random.default_rng(self.seed)
            words = rng.choice(_TOKENS, size=700_000)
            lines, line = [], []
            for w in words:
                line.append(w)
                if len(line) >= int(rng.integers(3, 9)):
                    lines.append("    " * int(rng.integers(0, 3)) + " ".join(line))
                    line = []
            object.__setattr__(self, "_blob", "\n".join(lines))
        return self._blob


def repo_files_batch(ids: np.ndarray, cfg: RepoFilesConfig) -> pa.Table:
    """Pure deterministic generator for arbitrary row-id blocks."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    s = cfg.seed
    window_id = ids // cfg.window_rows
    drifted = np.isin(window_id, np.asarray(cfg.drifted_windows, dtype=np.int64))

    # repo: Zipf over n_repos (rank 0 is the giant repo, ~30% of rows)
    probs = cfg.zipf_probs()
    cum = np.cumsum(probs)
    repo_idx = np.searchsorted(cum, _uniform(ids, 1, s), side="right")
    repo_idx = np.clip(repo_idx, 0, cfg.n_repos - 1)
    repo_names = np.array(cfg.repo_names(), dtype=object)
    repo = repo_names[repo_idx]

    # lang: per-window weights (drifted windows re-weighted)
    lw = np.array(cfg.lang_weights)
    dw = np.array(cfg.drift_lang_weights)
    u_lang = _uniform(ids, 2, s)
    lang_idx = np.where(
        drifted,
        np.searchsorted(np.cumsum(dw), u_lang, side="right"),
        np.searchsorted(np.cumsum(lw), u_lang, side="right"),
    )
    lang_idx = np.clip(lang_idx, 0, len(LANGS) - 1)
    lang = np.array(LANGS, dtype=object)[lang_idx]

    # path: deterministic tree
    d1 = _stream(ids, 3, s) % np.uint64(16)
    d2 = _stream(ids, 4, s) % np.uint64(64)
    k = _stream(ids, 5, s) % np.uint64(100_000)
    path = np.array(
        [f"src/m{a}/u{b}/file_{c}.{EXTS[l]}" for a, b, c, l in zip(d1, d2, k, lang)],
        dtype=object,
    )

    # commit: sha-like hex from (repo, commit slot)
    slot = _stream(ids, 6, s) % np.uint64(cfg.commits_per_repo)
    commit = np.array(
        [hashlib.sha1(f"{r}|{sl}".encode()).hexdigest() for r, sl in zip(repo, slot)],
        dtype=object,
    )

    # content: log-normal length slice of the blob (drifted windows ×1.5)
    z = np.sqrt(-2.0 * np.log(np.clip(_uniform(ids, 7, s), 1e-12, 1))) * np.cos(
        2 * np.pi * _uniform(ids, 8, s)
    )
    length = (cfg.content_median * np.exp(cfg.content_sigma * z)).astype(np.int64)
    length = np.clip(length, 16, cfg.content_max)
    length = np.where(drifted, (length * cfg.drift_len_scale).astype(np.int64), length)
    blob = cfg.blob()
    off = (_stream(ids, 9, s) % np.uint64(max(1, len(blob) - cfg.content_max * 2))).astype(np.int64)
    content = np.array([blob[o: o + ln] for o, ln in zip(off, length)], dtype=object)

    # planted violations -----------------------------------------------------
    u_null = _uniform(ids, 10, s) < cfg.p_null_path
    u_dup = _uniform(ids, 11, s) < cfg.p_dup_key
    u_orph = _uniform(ids, 12, s) < cfg.p_orphan_repo
    u_badc = _uniform(ids, 13, s) < cfg.p_bad_commit
    u_bads = _uniform(ids, 14, s) < cfg.p_bad_sha
    u_badl = _uniform(ids, 17, s) < cfg.p_bad_lang
    u_badp = _uniform(ids, 18, s) < cfg.p_bad_path_fmt
    # null-path and dup-key planting OVERWRITE the path below — mask the
    # format tag out of those rows so the ground-truth sidecar matches
    # the data exactly (the overlap is ~p·p but nonzero at bench scale)
    u_badp &= ~(u_null | u_dup)

    lang = np.where(u_badl, "xx", lang)
    path = np.where(u_badp,
                    np.array([f"src dir/file {int(i) % 1000}.tmp"
                              for i in _stream(ids, 19, s)], dtype=object),
                    path)
    path = np.where(u_null & (_uniform(ids, 15, s) < 0.5), "", path)
    path[u_null & ~(_uniform(ids, 15, s) < 0.5)] = None
    # duplicates: copy the key of row id-1 (same window in practice)
    if u_dup.any():
        src = np.clip(ids - 1, 0, None)
        dup_tbl = repo_files_key_of(src[u_dup], cfg)
        repo[u_dup] = dup_tbl["repo"]
        path[u_dup] = dup_tbl["path"]
        commit[u_dup] = dup_tbl["commit"]
    repo = np.where(u_orph, np.array([f"ghost/org{int(i) % 97}" for i in _stream(ids, 16, s)], dtype=object), repo)
    commit = np.where(
        u_badc,
        np.array([hashlib.sha1(f"bad|{i}".encode()).hexdigest() for i in ids], dtype=object),
        commit,
    )

    sha = np.array(sha256_hex(list(content)), dtype=object)
    sha = np.where(u_bads, np.array([hashlib.sha256(f"corrupt|{i}".encode()).hexdigest() for i in ids], dtype=object), sha)

    return pa.table(
        {
            "row_id": pa.array(ids, pa.int64()),
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.string()),
            "content_len": pa.array(length, pa.int64()),
            "content_sha256": pa.array(sha, pa.string()),
            "window_id": pa.array(window_id, pa.int64()),
            # ground-truth tags (sidecar columns; dropped from the engine input)
            "_null_path": pa.array(u_null), "_dup_key": pa.array(u_dup),
            "_orphan_repo": pa.array(u_orph), "_bad_commit": pa.array(u_badc),
            "_bad_sha": pa.array(u_bads), "_bad_lang": pa.array(u_badl),
            "_bad_path_fmt": pa.array(u_badp),
        }
    )


def repo_files_key_of(ids: np.ndarray, cfg: RepoFilesConfig) -> dict[str, np.ndarray]:
    """(repo, path, commit) of given row ids BEFORE violation planting —
    used to plant duplicate keys without re-generating content."""
    ids = np.asarray(ids, dtype=np.int64)
    s = cfg.seed
    probs = cfg.zipf_probs()
    cum = np.cumsum(probs)
    repo_idx = np.clip(np.searchsorted(cum, _uniform(ids, 1, s), side="right"), 0, cfg.n_repos - 1)
    repo = np.array(cfg.repo_names(), dtype=object)[repo_idx]
    window_id = ids // cfg.window_rows
    drifted = np.isin(window_id, np.asarray(cfg.drifted_windows, dtype=np.int64))
    lw, dw = np.array(cfg.lang_weights), np.array(cfg.drift_lang_weights)
    u_lang = _uniform(ids, 2, s)
    lang_idx = np.clip(
        np.where(drifted, np.searchsorted(np.cumsum(dw), u_lang, side="right"),
                 np.searchsorted(np.cumsum(lw), u_lang, side="right")),
        0, len(LANGS) - 1)
    lang = np.array(LANGS, dtype=object)[lang_idx]
    d1 = _stream(ids, 3, s) % np.uint64(16)
    d2 = _stream(ids, 4, s) % np.uint64(64)
    k = _stream(ids, 5, s) % np.uint64(100_000)
    path = np.array([f"src/m{a}/u{b}/file_{c}.{EXTS[l]}" for a, b, c, l in zip(d1, d2, k, lang)], dtype=object)
    slot = _stream(ids, 6, s) % np.uint64(cfg.commits_per_repo)
    commit = np.array([hashlib.sha1(f"{r}|{sl}".encode()).hexdigest() for r, sl in zip(repo, slot)], dtype=object)
    return {"repo": repo, "path": path, "commit": commit}


def dimensions(cfg: RepoFilesConfig) -> tuple[pa.Table, pa.Table]:
    """repos + commits dimension tables (all valid membership pairs)."""
    repos = cfg.repo_names()
    commit_rows = {"repo": [], "commit": []}
    for r in repos:
        for sl in range(cfg.commits_per_repo):
            commit_rows["repo"].append(r)
            commit_rows["commit"].append(hashlib.sha1(f"{r}|{sl}".encode()).hexdigest())
    return (
        pa.table({"repo": pa.array(repos, pa.string())}),
        pa.table({k: pa.array(v, pa.string()) for k, v in commit_rows.items()}),
    )


def write_repo_files(out_dir: str, n_rows: int, cfg: RepoFilesConfig | None = None,
                     batch: int = 50_000) -> RepoFilesConfig:
    """Small/medium-scale direct writer (tests).  Bench scale goes through
    ``ray.data.range(n).map_batches(repo_files_batch)`` instead."""
    import os
    import pyarrow.parquet as pq

    cfg = cfg or RepoFilesConfig()
    os.makedirs(out_dir, exist_ok=True)
    tables = [repo_files_batch(np.arange(i, min(i + batch, n_rows)), cfg)
              for i in range(0, n_rows, batch)]
    full = pa.concat_tables(tables)
    engine_cols = [c for c in full.column_names if not c.startswith("_")]
    pq.write_table(full.select(engine_cols), os.path.join(out_dir, "repo_files.parquet"))
    pq.write_table(full.select(["row_id", "window_id", "_null_path", "_dup_key",
                                "_orphan_repo", "_bad_commit", "_bad_sha",
                                "_bad_lang", "_bad_path_fmt"]),
                   os.path.join(out_dir, "repo_files_expected.parquet"))
    repos, commits = dimensions(cfg)
    pq.write_table(repos, os.path.join(out_dir, "repos.parquet"))
    pq.write_table(commits, os.path.join(out_dir, "commits.parquet"))
    return cfg


# ---------------------------------------------------------------------------
# sensor_readings — reference simulator replay (sensor.py:24-143 semantics)
# ---------------------------------------------------------------------------

SENSOR_TYPES = ["traffic", "environment", "utility", "water"]
VEHICLE_TYPES = ["car", "truck", "bus", "motorcycle", "bicycle"]
_NUMERIC_FIELDS = {
    "traffic": ["vehicle_count", "avg_speed"],
    "environment": ["temperature", "humidity", "air_quality_index"],
    "utility": ["consumption", "voltage", "current"],
    "water": ["pH", "turbidity", "contaminant_level"],
}


def sensor_readings(n: int, seed: int = 42, unusual_probability: float = 0.05) -> pa.Table:
    """Row-equivalent replay of ``simulate_sensor_reading`` +
    ``maybe_introduce_unusual_data`` (sensor.py:104-143), seeded.

    One wide union schema; measurements of other types are NULL
    (SURVEY.md §1.2).  The ``unusual`` column is the injected tag the
    reference detector consumes (null ⇒ normal).
    """
    rng = np.random.default_rng(seed)
    cols: dict[str, list] = {k: [] for k in [
        "sensor_id", "type", "timestamp", "timestamp_raw", "zip",
        "vehicle_count", "avg_speed", "vehicle_distribution",
        "temperature", "humidity", "air_quality_index", "consumption",
        "voltage", "current", "pH", "turbidity", "contaminant_level", "unusual"]}
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    for i in range(n):
        typ = SENSOR_TYPES[int(rng.integers(0, 4))]
        row: dict[str, object] = {k: None for k in cols}
        row["type"] = typ
        row["sensor_id"] = f"{typ}_{int(rng.integers(1, 101))}"
        ts = base_ts + np.timedelta64(i, "s")
        row["timestamp"] = ts
        # reference emits ISO-8601 strings (sensor.py:12); the raw variant
        # exercises the engine's parse/normalize stage (M6)
        row["timestamp_raw"] = str(ts)
        row["zip"] = f"{int(rng.integers(1, 101)):03d}"
        if typ == "traffic":
            # nested map column (sensor.py:41-43): vehicle_count is the SUM
            # of the per-type distribution — an invariant tests can check
            dist = [(v, int(rng.integers(0, 101))) for v in VEHICLE_TYPES]
            row["vehicle_distribution"] = dist
            row["vehicle_count"] = sum(c for _, c in dist)
            row["avg_speed"] = round(float(rng.uniform(20, 80)), 2)
        elif typ == "environment":
            row["temperature"] = round(float(rng.uniform(-10, 40)), 2)
            row["humidity"] = int(rng.integers(20, 101))
            row["air_quality_index"] = int(rng.integers(0, 501))
        elif typ == "utility":
            row["consumption"] = round(float(rng.uniform(0, 100)), 2)
            row["voltage"] = round(float(rng.uniform(210, 250)), 2)
            row["current"] = round(float(rng.uniform(0, 50)), 2)
        else:
            row["pH"] = round(float(rng.uniform(5, 9)), 2)
            row["turbidity"] = round(float(rng.uniform(0, 10)), 2)
            row["contaminant_level"] = int(rng.integers(0, 101))
        if rng.random() < unusual_probability:  # sensor.py:116
            f = _NUMERIC_FIELDS[typ][int(rng.integers(0, len(_NUMERIC_FIELDS[typ])))]
            mult = float(rng.uniform(2, 5))     # sensor.py:127
            v = row[f]
            row[f] = int(v * mult) if isinstance(v, int) else round(v * mult, 2)
            row["unusual"] = True               # sensor.py:131
        for k in cols:
            cols[k].append(row[k])
    schema = pa.schema([
        ("sensor_id", pa.string()), ("type", pa.string()),
        ("timestamp", pa.timestamp("us")), ("timestamp_raw", pa.string()),
        ("zip", pa.string()),
        ("vehicle_count", pa.int64()), ("avg_speed", pa.float64()),
        ("vehicle_distribution", pa.map_(pa.string(), pa.int64())),
        ("temperature", pa.float64()), ("humidity", pa.int64()),
        ("air_quality_index", pa.int64()), ("consumption", pa.float64()),
        ("voltage", pa.float64()), ("current", pa.float64()),
        ("pH", pa.float64()), ("turbidity", pa.float64()),
        ("contaminant_level", pa.int64()), ("unusual", pa.bool_()),
    ])
    return pa.Table.from_pydict(cols, schema=schema)


# ---------------------------------------------------------------------------
# headlines — dedup / filter / sort semantics fixture (news.py; FIXTURES.md §3)
# ---------------------------------------------------------------------------

_HEADLINE_TEMPLATES = [
    "Breaking news about {} today",
    "Officials announce {} development",
    "New report on {} released",
    "Experts discuss the future of {}",
    "Local community reacts to {}",
]
_TOPICS = ["economy", "transit", "weather", "technology", "health", "sports"]
_SOURCES = ["DemoWire", "CityPress", "GlobalNews", "MetroDaily", "TheLocal"]
_LOCATIONS = ["springfield", "rivertown", "lakeside", None]


def headlines(n_scans: int = 5, per_scan: int = 80, seed: int = 42) -> pa.Table:
    """Deterministic multi-scan headline stream mirroring the demo generator
    (``news.py:415-474``) with PLANTED duplicates: exact ``title|url`` dups
    within a scan, ``title|source`` dups across sources, and repeats of
    earlier scans' keys in later scans (for incremental-dedup tests,
    ``news.py:560-573``)."""
    rng = np.random.default_rng(seed)
    cols = {k: [] for k in ["seq", "scan_id", "title", "source", "url",
                            "published_date", "description", "category", "location"]}
    history: list[tuple] = []
    for scan in range(n_scans):
        for i in range(per_scan):
            r = rng.random()
            if r < 0.10 and history:        # repeat an earlier scan's row
                t, s, u, loc = history[int(rng.integers(0, len(history)))]
            else:
                topic = _TOPICS[int(rng.integers(0, len(_TOPICS)))]
                tmpl = _HEADLINE_TEMPLATES[int(rng.integers(0, len(_HEADLINE_TEMPLATES)))]
                t = tmpl.format(topic)
                s = _SOURCES[int(rng.integers(0, len(_SOURCES)))]
                u = f"https://example.com/{scan}/{i}/{int(rng.integers(0, 1 << 30)):x}"
                loc = _LOCATIONS[int(rng.integers(0, len(_LOCATIONS)))]
                if rng.random() < 0.08 and cols["title"]:   # same-scan dup (title|url)
                    j = len(cols["title"]) - 1
                    t, u = cols["title"][j], cols["url"][j]
                    s = _SOURCES[int(rng.integers(0, len(_SOURCES)))]
            history.append((t, s, u, loc))
            day = 1 + int(rng.integers(0, 28))
            date = (f"2025-03-{day:02d}T{int(rng.integers(0, 24)):02d}:00:00"
                    if rng.random() > 0.05 else None)   # some NULL dates
            desc = (f"story from {loc} about things" if loc and rng.random() > 0.3
                    else "a story without location mention")
            cols["seq"].append(scan * per_scan + i)   # arrival order
            cols["scan_id"].append(scan)
            cols["title"].append(t)
            cols["source"].append(s)
            cols["url"].append(u)
            cols["published_date"].append(date)
            cols["description"].append(desc if rng.random() > 0.05 else None)
            cols["category"].append(_TOPICS[int(rng.integers(0, len(_TOPICS)))])
            cols["location"].append(loc)
    schema = pa.schema([
        ("seq", pa.int64()),
        ("scan_id", pa.int64()), ("title", pa.string()), ("source", pa.string()),
        ("url", pa.string()), ("published_date", pa.string()),
        ("description", pa.string()), ("category", pa.string()),
        ("location", pa.string()),
    ])
    return pa.Table.from_pydict(cols, schema=schema)
