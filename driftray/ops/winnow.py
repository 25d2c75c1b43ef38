"""Winnowing fingerprints — cross-document duplicate-SPAN detection.

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003, the MOSS algorithm): hash every k-token
gram, then keep each w-window's minimum hash.  The winnowing guarantee:
any two documents sharing a contiguous span of at least ``t = k + w - 1``
tokens select at least one IDENTICAL fingerprint VALUE — regardless of
where the span sits in either document.  That position-robustness is
what segment/paragraph dedup (exact split boundaries) and MinHash (whole
-document similarity) both lack: a 100-token boilerplate block pasted at
different offsets into two otherwise-unrelated documents is invisible to
both, and guaranteed-visible here.

Distributed shape: fingerprinting is a per-batch numpy kernel (flat
split + one ``hash64`` + strided rolling ops, no per-token Python);
selected fingerprints are ~2/(w+1) of grams, and only (fp, doc_id)
PAIRS — 16 B/row — ever cross an exchange (one sort-based duplicate-key
scan, the ``_dup_bucket_keys`` machinery shared with MinHash/pHash).
Marked-doc stats come back via one broadcast set.  Detection flags and
span fractions are the output; exact span EXCISION needs a pairwise
text-verify tier (same escalation as ``ngram_jaccard_dedup``) and is out
of scope here — corpus curation acts on the per-doc dup fraction.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..sketches import hash64
from .pool import actor_pool

_B = np.uint64(1099511628211)          # FNV prime as the k-gram base


def _gram_hashes(tok_h: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial hash of every k-gram: H[i] = Σ_j t[i+j]·B^j
    (mod 2^64 via natural uint64 wraparound).  k strided adds, no loop
    over positions."""
    n = len(tok_h) - k + 1
    if n <= 0:
        return np.array([], dtype=np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    p = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc += tok_h[j:j + n] * p
            p *= _B
    return acc


def _group_arange(n: np.ndarray) -> np.ndarray:
    """Concatenated ``[0..n_i)`` ranges, one per group — flat, no loop."""
    total = int(n.sum())
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(np.concatenate([[0], np.cumsum(n)[:-1]]), n)
    return out


def winnow(tok_h: np.ndarray, k: int = 8, w: int = 8) -> np.ndarray:
    """Selected fingerprint VALUES for one document's token hashes:
    per-w-window minimum k-gram hash, deduplicated.  Shorter-than-k docs
    fingerprint as their single whole-text gram."""
    g = _gram_hashes(np.asarray(tok_h, dtype=np.uint64), k)
    if len(g) == 0:
        return (np.unique(np.asarray(tok_h, dtype=np.uint64))
                if len(tok_h) else np.array([], dtype=np.uint64))
    if len(g) <= w:
        return np.unique(g.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(g, w)
    return np.unique(win.min(axis=1))


class WinnowFingerprinter:
    """Batch kernel: (id, text) rows → per-doc-distinct (bh, id) winnowed
    fingerprint rows.  FLAT across the whole batch — no per-doc Python:
    one token split + one ``hash64``, one strided gram-hash accumulation
    over the concatenated token stream, ONE ``sliding_window_view`` min
    over the flat gram array, then a doc-id/fingerprint lexsort +
    adjacent-diff for the per-doc dedup.  Grams and windows that would
    cross a document boundary are dropped by slicing each doc's valid
    range out of the flat result (vectorized repeat/arange index build).
    A doc is whole within its row, so per-doc dedup here IS global
    per-doc dedup.  Short docs (< k tokens, or < w windows) fall back to
    the per-doc :func:`winnow` on just those rows — the guarantee's edge
    cases, a vanishing fraction of a real corpus."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 8, w: int = 8):
        self.id_col, self.text_col, self.k, self.w = id_col, text_col, k, w

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        k, w = self.k, self.w
        ids = df[self.id_col].to_numpy(dtype=np.int64)
        split = df[self.text_col].fillna("").astype(str).str.split()
        counts = split.str.len().to_numpy(dtype=np.int64)
        empty = pd.DataFrame({"bh": pd.Series([], dtype="int64"),
                              self.id_col: pd.Series([], dtype="int64"),
                              "n_fps": pd.Series([], dtype="int64")})
        if int(counts.sum()) == 0:
            return empty
        tok_arr = split.explode().to_numpy(dtype=object)
        if (counts == 0).any():
            # pandas explode emits one NaN ROW per empty list — drop
            # them or every later doc's flat offset shifts by one
            tok_arr = tok_arr[np.repeat(counts > 0,
                                        np.maximum(counts, 1))]
        flat = hash64(tok_arr)
        offs = np.concatenate([[0], np.cumsum(counts)])

        parts_f, parts_d = [], []

        # vectorized main path: docs with >= k + w - 1 tokens have
        # n_win = n_tok - k - w + 2 >= 1 full windows
        n_win = counts - k - w + 2
        big = n_win >= 1
        if big.any():
            g = _gram_hashes(flat, k)        # flat; boundary grams junk
            win = np.lib.stride_tricks.sliding_window_view(g, w)
            mins = win.min(axis=1)           # flat window minima
            # valid window positions for doc i: [offs[i], offs[i]+n_win[i])
            nw = n_win[big]
            starts = offs[:-1][big]
            idx = np.repeat(starts, nw) + _group_arange(nw)
            doc_ix = np.repeat(np.flatnonzero(big), nw)
            fp = mins[idx]
            order = np.lexsort((fp, doc_ix))
            doc_ix, fp = doc_ix[order], fp[order]
            keep = np.ones(len(fp), dtype=bool)
            keep[1:] = (doc_ix[1:] != doc_ix[:-1]) | (fp[1:] != fp[:-1])
            parts_d.append(ids[doc_ix[keep]])
            parts_f.append(fp[keep].view(np.int64))

        # edge cases per doc (rare): shorter than one full window
        for i in np.flatnonzero(~big & (counts > 0)):
            fps = winnow(flat[offs[i]:offs[i + 1]], k, w)
            parts_f.append(fps.view(np.int64))
            parts_d.append(np.full(len(fps), ids[i], dtype=np.int64))

        if not parts_f:
            return empty
        bh = np.concatenate(parts_f)
        did = np.concatenate(parts_d)
        # n_fps per output row = its doc's distinct-fingerprint count
        ud, inv, cnt = np.unique(did, return_inverse=True,
                                 return_counts=True)
        return pd.DataFrame({"bh": bh, self.id_col: did,
                             "n_fps": cnt[inv]})


def duplicate_span_stats(ds: rd.Dataset, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 8, w: int = 8,
                         batch_size: int = 2048,
                         concurrency: int | None = None) -> rd.Dataset:
    """Per-document cross-duplicate span statistics.  Any doc sharing a
    ≥ ``k + w - 1``-token contiguous span with ANY other doc is
    guaranteed ``has_cross_dup=1`` (winnowing guarantee);
    ``shared_frac`` = fraction of the doc's fingerprints that appear in
    some other doc — the curation knob (drop/keep thresholds à la
    boilerplate-heavy page filtering).

    Exchanges: one sort-based duplicate-fingerprint scan over (fp, id)
    rows, one broadcast of the (small) duplicated-fp set, one streaming
    stats pass.  Returns (id, n_fps, n_shared_fps, shared_frac,
    has_cross_dup)."""
    from .dedup import _dup_bucket_keys

    texts = ds.select_columns([id_col, text_col])
    fp_ds = texts.map_batches(
        WinnowFingerprinter, fn_constructor_args=(id_col, text_col, k, w),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency or actor_pool())
    dup = _dup_bucket_keys(fp_ds)
    ref = ray.put(frozenset(dup))

    class Stats:
        """Second fingerprint pass over the DOCS (a doc is whole within
        its batch row, so per-doc counts here are global by construction
        — no doc-id exchange, and no reliance on how Ray blocks the
        fingerprint rows)."""

        def __init__(self):
            self.dup = ray.get(ref)
            self.fp = WinnowFingerprinter(id_col, text_col, k, w)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows = self.fp(batch)
            shared = rows["bh"].isin(self.dup).to_numpy(dtype=np.int64)
            g = (pd.DataFrame({id_col: rows[id_col].to_numpy(),
                               "n_fps": rows["n_fps"].to_numpy(),
                               "s": shared})
                 .groupby([id_col, "n_fps"], sort=False,
                          as_index=False)["s"].sum())
            n_fps = g["n_fps"].to_numpy(dtype=np.int64)
            n_shared = g["s"].to_numpy(dtype=np.int64)
            all_ids = batch[id_col].to_numpy(dtype=np.int64)
            out = pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                                "n_fps": n_fps,
                                "n_shared_fps": n_shared})
            missing = np.setdiff1d(all_ids, out[id_col].to_numpy())
            if len(missing):            # empty docs emit no fp rows
                out = pd.concat([out, pd.DataFrame({
                    id_col: missing,
                    "n_fps": np.zeros(len(missing), dtype=np.int64),
                    "n_shared_fps": np.zeros(len(missing),
                                             dtype=np.int64)})],
                    ignore_index=True)
            out["shared_frac"] = np.where(
                out["n_fps"] > 0, out["n_shared_fps"] / out["n_fps"], 0.0)
            out["has_cross_dup"] = (out["n_shared_fps"] > 0).astype(
                np.int64)
            return out

    return texts.map_batches(Stats, batch_format="pandas",
                             batch_size=batch_size,
                             concurrency=actor_pool())


def filter_cross_duplicates(ds: rd.Dataset, id_col: str = "doc_id",
                            text_col: str = "text",
                            max_shared_frac: float = 0.5,
                            k: int = 8, w: int = 8,
                            batch_size: int = 2048) -> rd.Dataset:
    """Drop documents whose winnowed shared-fingerprint fraction exceeds
    ``max_shared_frac`` — keep the rest with ``shared_frac`` attached.

    JOIN-FREE: a doc is whole within its batch row, so the per-doc
    shared fraction is computable INSIDE the filter pass itself — one
    fingerprint exchange (for the duplicated-fp set), then one streaming
    map that fingerprints, scores and filters each batch in place.  The
    document text never crosses an exchange."""
    from .pool import actor_pool

    fp_ds = (ds.select_columns([id_col, text_col]).map_batches(
        WinnowFingerprinter, fn_constructor_args=(id_col, text_col, k, w),
        batch_format="pandas", batch_size=batch_size,
        concurrency=actor_pool()))
    from .dedup import _dup_bucket_keys

    ref = ray.put(frozenset(_dup_bucket_keys(fp_ds)))

    class ScoreAndFilter:
        def __init__(self):
            self.dup = ray.get(ref)
            self.fp = WinnowFingerprinter(id_col, text_col, k, w)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows = self.fp(batch[[id_col, text_col]])
            shared = rows["bh"].isin(self.dup).to_numpy(dtype=np.int64)
            g = (pd.DataFrame({id_col: rows[id_col].to_numpy(),
                               "n": rows["n_fps"].to_numpy(),
                               "s": shared})
                 .groupby(id_col, sort=False)
                 .agg(n=("n", "first"), s=("s", "sum")))
            frac = (batch[id_col].map(g["s"] / g["n"].clip(lower=1))
                    .fillna(0.0))
            out = batch[frac <= max_shared_frac].copy()
            out["shared_frac"] = frac[frac <= max_shared_frac]
            return out

    return ds.map_batches(ScoreAndFilter, batch_format="pandas",
                          batch_size=batch_size,
                          concurrency=actor_pool())
