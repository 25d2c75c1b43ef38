"""Vectorized per-batch check kernels (the map_batches hot path).

One pass over each Arrow batch produces a single narrow "findings" table
mixing three kinds of rows — violations, counters, and pickled sketch
partials — so the raw input is read exactly once per window.  Downstream
stages split by ``kind``; everything after the kernel is tiny relative to
the input (violations are rare, sketches are KB-sized).

Semantics sources:
* completeness — null OR empty-string for strings, null OR NaN for floats
  (``/root/reference/DESIGN.md:344-357``).
* range — inclusive bounds with optional row-condition, per-type conditions
  (``DESIGN.md:366-380``).
* sha256 invariant — hex sha256(content) == content_sha256 per row
  (BASELINE.json input_hint; SURVEY.md M11).
* profiles — mean/std/min/max/median/10-bin histogram per numeric column
  (``DESIGN.md:539-551``) via mergeable sketches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import sketches
from .sketches import HLL, Histogram, Moments, TDigest
from .spec import TableSpec

FINDINGS_SCHEMA = pa.schema(
    [
        ("window", pa.int64()),     # window id (-1 = whole input / table-level)
        ("kind", pa.string()),      # violation | counter | sketch
        ("check", pa.string()),     # completeness | range | sha256 | rows | profile | ...
        ("column", pa.string()),
        ("group", pa.string()),     # group value for grouped sketches, '' = table-level
        ("row_ref", pa.string()),   # key of the violating row
        ("detail", pa.string()),    # human reason / sketch kind
        ("n", pa.int64()),          # counter value
        ("blob", pa.binary()),      # pickled sketch partial
    ]
)


def _empty_findings() -> dict[str, list]:
    return {name: [] for name in FINDINGS_SCHEMA.names if name != "window"}


def _append(out: dict, kind: str, check: str, column: str = "", group: str = "",
            row_ref: str = "", detail: str = "", n: int = 0, blob: bytes | None = None) -> None:
    out["kind"].append(kind)
    out["check"].append(check)
    out["column"].append(column)
    out["group"].append(group)
    out["row_ref"].append(row_ref)
    out["detail"].append(detail)
    out["n"].append(n)
    out["blob"].append(blob)


def findings_table(out: dict, window: int = -1) -> pa.Table:
    n = len(out["kind"])
    out = {"window": [int(window)] * n, **out}
    return pa.Table.from_pydict(out, schema=FINDINGS_SCHEMA)


def row_refs(batch: pa.Table, spec: TableSpec) -> np.ndarray:
    """Stable per-row reference string from the table's key columns."""
    key_cols = list(spec.unique_key or ())
    if not key_cols and spec.order_column:
        key_cols = [spec.order_column]
    if not key_cols:
        key_cols = [batch.column_names[0]]
    parts = [pc.fill_null(pc.cast(batch[c], pa.string()), "<null>")
             for c in key_cols if c in batch.column_names]
    if not parts:
        return np.array([""] * batch.num_rows, dtype=object)
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "|")
    return np.asarray(joined.to_pandas(), dtype=object)


def join_key(batch: pa.Table, columns) -> np.ndarray:
    """'|'-joined string key over ``columns`` (vectorized).

    Nulls are filled PER COMPONENT (sentinel "<null>") so two rows that
    differ only in a non-null component keep distinct keys — matching SQL
    GROUP BY null semantics column-wise."""
    parts = [pc.fill_null(pc.cast(batch[c], pa.string()), "<null>") for c in columns]
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "|")
    return np.asarray(joined.to_pandas(), dtype=object)


# fixed sentinel hash for null values — chosen once so a null hashes the
# same in every batch and on both sides of a membership build/probe
_NULL_HASH = np.uint64(0x9E3779B97F4A7C15)


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Null-STABLE vectorized uint64 hash of one Arrow column.

    Non-null values must hash identically whether or not the batch happens
    to contain nulls: the naive ``to_pandas()`` path promotes an int64
    column with any null to float64, silently changing every hash in that
    batch (missed duplicates, skewed HLLs, false referential violations).
    Here each type hashes from a fill_null'ed typed numpy array, then null
    positions are overwritten with a fixed sentinel."""
    from .sketches import hash64

    typ = col.type
    nulls = np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False), dtype=bool)
    has_nulls = bool(nulls.any())
    if pa.types.is_integer(typ) or pa.types.is_temporal(typ):
        vals = pc.fill_null(pc.cast(col, pa.int64()), 0)
        h = hash64(np.asarray(vals.to_numpy(zero_copy_only=False), dtype=np.int64))
    elif pa.types.is_floating(typ):
        vals = pc.fill_null(pc.cast(col, pa.float64()), 0.0)
        h = hash64(np.asarray(vals.to_numpy(zero_copy_only=False), dtype=np.float64))
    elif pa.types.is_boolean(typ):
        vals = pc.fill_null(col, False)
        h = hash64(np.asarray(vals.to_numpy(zero_copy_only=False), dtype=bool))
    else:
        s = pc.fill_null(pc.cast(col, pa.string()), "")
        h = hash64(np.asarray(s.to_pandas(), dtype=object))
    if has_nulls:
        if not h.flags.writeable:
            h = h.copy()
        h[nulls] = _NULL_HASH
    return h


def hash_keys(batch: pa.Table, columns) -> np.ndarray:
    """Combined uint64 hash over key columns WITHOUT building row strings —
    per-column null-stable vectorized hashing (``_hash_column``) folded
    with an FNV-style mix.  This is what shuffles in place of the raw key
    at scale (8 bytes/row)."""
    h = np.full(batch.num_rows, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    for c in columns:
        h = (h * np.uint64(1099511628211)) ^ _hash_column(batch[c])
    return h


def _null_or_empty_mask(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """DESIGN.md:344-357 completeness semantics, vectorized."""
    mask = pc.is_null(col)
    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        mask = pc.or_kleene(mask, pc.equal(col, ""))
    elif pa.types.is_floating(typ):
        mask = pc.or_kleene(mask, pc.is_nan(col))
    mask = pc.fill_null(mask, True)
    return np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool)



def sha256_hex(values: list[str]) -> list[str]:
    """Row-wise sha256 hex.  hashlib is C-speed; the Python loop only pays
    per-row call overhead (~0.5 us) vs ~us-scale hashing of KB contents."""
    out = []
    for s in values:
        if s is None:
            out.append(None)
        else:
            out.append(hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest())
    return out


def sha256_hex_arrow(col: pa.ChunkedArray | pa.Array) -> list[str]:
    """sha256 hex straight from the Arrow string buffers — hashes UTF-8
    bytes via zero-copy memoryview slices, never materializing Python str
    objects (the content column is the widest thing in the table; skipping
    the str round-trip halves the kernel's memory traffic)."""
    out: list = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        if chunk.null_count:
            # rare path: fall back per-chunk when nulls are present
            out.extend(sha256_hex(chunk.to_pylist()))
            continue
        if pa.types.is_large_string(chunk.type):
            odt, width = np.int64, 8
        else:
            odt, width = np.int32, 4
        bufs = chunk.buffers()
        offsets = np.frombuffer(bufs[1], dtype=odt, count=len(chunk) + 1,
                                offset=chunk.offset * width)
        data = memoryview(bufs[2])
        sha = hashlib.sha256
        out.extend(sha(data[offsets[i]:offsets[i + 1]]).hexdigest()
                   for i in range(len(chunk)))
    return out


class ValidationKernel:
    """Callable-class kernel for ``map_batches`` (actor pool or tasks).

    Spec interpretation is precompiled in ``__init__`` (once per actor,
    SURVEY.md §2.10 / T-stages); ``__call__`` is fully vectorized per batch
    except the sha256 row loop (hashlib, C-speed).

    ``hist_bounds`` maps profile column → (lo, hi); bounds must be identical
    across windows so histogram partials stay mergeable and PSI-comparable.
    ``max_violations_per_batch`` caps emitted violation rows (counters always
    carry exact totals) so a pathological window cannot blow up the findings
    table at 100 TB scale.
    """

    def __init__(self, spec: TableSpec, hist_edges: dict | None = None,
                 nbins: int = 10, max_violations_per_batch: int = 10_000,
                 membership: dict[int, object] | None = None,
                 window_column: str | None = None) -> None:
        self.spec = spec
        # hist_edges: profile column -> np.ndarray of bin edges (identical
        # across windows so partials merge and PSI/JS compare)
        self.hist_edges = hist_edges or {}
        self.nbins = nbins
        self.cap = max_violations_per_batch
        self.window_column = window_column
        # membership[i] = key set / BloomFilter / ray.ObjectRef of either, for
        # spec.foreign_keys[i] — broadcast ONCE (ray.put on the driver), the
        # ray.get here runs once per actor/task, not per batch (T4/J2).
        self.membership: dict[int, object] = {}
        if membership:
            import ray

            for i, m in membership.items():
                self.membership[i] = ray.get(m) if isinstance(m, ray.ObjectRef) else m

    def __call__(self, batch: pa.Table) -> pa.Table:
        wc = self.window_column
        if wc is None or wc not in batch.column_names:
            return self._process(batch, -1)
        # split by window value (input is window-ordered, so batches rarely
        # straddle more than one boundary; this loop is 1-2 iterations)
        wvals = batch[wc].to_pandas()
        parts = []
        for w in wvals.unique():
            mask = pa.array((wvals == w).to_numpy())
            parts.append(self._process(batch.filter(mask), int(w)))
        return pa.concat_tables(parts)

    def _process(self, batch: pa.Table, window: int) -> pa.Table:
        spec = self.spec
        out = _empty_findings()
        n_rows = batch.num_rows
        _append(out, "counter", "rows", n=n_rows)
        if n_rows == 0:
            return findings_table(out, window)
        budget = [self.cap]
        refs_cache: list = [None]

        def refs_at(idx: np.ndarray) -> np.ndarray:
            # row refs built LAZILY and only for violating rows — avoids a
            # per-batch object-string materialization on the clean path
            if refs_cache[0] is None:
                refs_cache[0] = row_refs(batch, spec)
            return refs_cache[0][idx]

        def emit_violations(mask: np.ndarray, check: str, column: str, detail: str) -> None:
            cnt = int(mask.sum())
            _append(out, "counter", check, column=column, n=cnt)
            if cnt == 0 or budget[0] <= 0:
                return
            idx = np.flatnonzero(mask)[: budget[0]]
            budget[0] -= idx.size
            for r in refs_at(idx):
                _append(out, "violation", check, column=column,
                        row_ref=str(r), detail=detail)

        # -- completeness (M7) ------------------------------------------------
        for cs in spec.required_columns:
            if cs.name not in batch.column_names:
                _append(out, "counter", "completeness", column=cs.name, n=n_rows)
                _append(out, "violation", "completeness", column=cs.name,
                        row_ref="*", detail="column missing from batch")
                continue
            mask = _null_or_empty_mask(batch[cs.name])
            emit_violations(mask, "completeness", cs.name, "null/empty/NaN")

        # -- range expectations (M8) ------------------------------------------
        for cs in spec.range_columns:
            if cs.name not in batch.column_names:
                continue
            col = batch[cs.name]
            viol = pa.array(np.zeros(n_rows, dtype=bool))
            if cs.min_value is not None:
                viol = pc.or_kleene(viol, pc.less(col, cs.min_value))
            if cs.max_value is not None:
                viol = pc.or_kleene(viol, pc.greater(col, cs.max_value))
            viol = pc.fill_null(viol, False)  # nulls are completeness's business
            mask = np.asarray(viol.to_pandas(), dtype=bool)
            if cs.when is not None and cs.when[0] in batch.column_names:
                cond = pc.fill_null(pc.equal(batch[cs.when[0]], cs.when[1]), False)
                mask &= np.asarray(cond.to_pandas(), dtype=bool)
            emit_violations(mask, "range", cs.name,
                            f"outside [{cs.min_value}, {cs.max_value}]")

        # -- sha256 content invariant (M11) -----------------------------------
        hi = spec.hash_invariant
        if hi is not None and hi.content_column in batch.column_names \
                and hi.hash_column in batch.column_names:
            actual = sha256_hex_arrow(batch[hi.content_column])
            expected = batch[hi.hash_column].to_pylist()
            mask = np.fromiter((a != e for a, e in zip(actual, expected)),
                               dtype=bool, count=len(actual))
            emit_violations(mask, "sha256", hi.content_column, "content hash mismatch")

        # -- referential integrity (J2): probe broadcast membership -----------
        for i, fk in enumerate(spec.foreign_keys):
            member = self.membership.get(i)
            if member is None or not all(c in batch.column_names for c in fk.columns):
                continue
            if getattr(member, "hashed", False) or (
                    isinstance(member, (set, frozenset)) and member
                    and isinstance(next(iter(member)), (int, np.integer))):
                # hashed membership (scale path): probe 8-byte key hashes,
                # never building per-row key strings
                keys = hash_keys(batch, fk.columns)
            else:
                keys = join_key(batch, fk.columns)
            if hasattr(member, "contains"):  # BloomFilter: no false negatives
                present = member.contains(keys)
            else:
                kl = keys.tolist()
                present = np.fromiter((k in member for k in kl), dtype=bool,
                                      count=len(kl))
            emit_violations(~present, "referential", "|".join(fk.columns),
                            f"not in {fk.dim_table}({','.join(fk.dim_columns)})")

        # -- profile sketch partials (A4/A7) ----------------------------------
        for col_name in spec.profile_columns:
            if col_name not in batch.column_names:
                continue
            values = np.asarray(
                pc.cast(batch[col_name], pa.float64()).to_numpy(zero_copy_only=False),
                dtype=np.float64)
            self._emit_sketches(out, col_name, "", values)
            if spec.group_column and spec.group_column in batch.column_names:
                # dictionary-encode once: per-group masks become int compares
                dic = pc.dictionary_encode(
                    batch[spec.group_column].combine_chunks()
                    if isinstance(batch[spec.group_column], pa.ChunkedArray)
                    else batch[spec.group_column])
                if isinstance(dic, pa.ChunkedArray):
                    dic = dic.combine_chunks()
                codes = np.asarray(dic.indices.to_numpy(zero_copy_only=False))
                labels = dic.dictionary.to_pylist()
                for code in np.argsort(np.array(labels, dtype=object)):
                    g = labels[code]
                    if g is None:
                        continue
                    self._emit_sketches(out, col_name, str(g),
                                        values[codes == code])

        # -- approximate key uniqueness (A7: HLL over the unique key) ---------
        if spec.unique_key and all(c in batch.column_names for c in spec.unique_key):
            hll = HLL().update(hash_keys(batch, spec.unique_key))
            _append(out, "sketch", "uniqueness", column="|".join(spec.unique_key),
                    detail="hll", blob=sketches.dumps(hll))

        return findings_table(out, window)

    def _emit_sketches(self, out: dict, column: str, group: str, values: np.ndarray) -> None:
        mom = Moments().update(values)
        _append(out, "sketch", "profile", column=column, group=group,
                detail="moments", blob=sketches.dumps(mom))
        td = TDigest().update(values)
        _append(out, "sketch", "profile", column=column, group=group,
                detail="tdigest", blob=sketches.dumps(td))
        edges = self.hist_edges.get(column)
        hist = (Histogram.from_edges(edges) if edges is not None
                else Histogram(0.0, 1.0, self.nbins)).update(values)
        _append(out, "sketch", "profile", column=column, group=group,
                detail="hist", blob=sketches.dumps(hist))
