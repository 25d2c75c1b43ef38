"""URL curation — host extraction, normalization, per-domain policies.

Crawled-corpus pipelines gate on URL structure before any text op runs:
normalize (case, default ports, fragments, tracking params), aggregate
per host, cap documents per domain (C4/RefinedWeb-style de-biasing), and
drop blocklisted hosts.  All hot paths here are pandas C string/regex
kernels over batches — no per-row Python in the extraction or filters;
the only exchange is the (small) per-host aggregate.

Reference scope: the reference's sources emit records with provenance
strings but ship no URL handling; this extends the ingestion/curation
surface alongside ops/html.py.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

# scheme://[userinfo@]host[:port][path][?query][#fragment]
_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?:[^@/?#]*@)?"
           r"(?P<host>[^/:?#]*)(?::(?P<port>\d*))?"
           r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$")
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                  "wss": "443"}


def parse_urls(urls: pd.Series) -> pd.DataFrame:
    """Vectorized URL split → (scheme, host, port, path, query); scheme
    and host lowercased, non-matching rows all-empty.  One C regex pass."""
    parts = urls.fillna("").astype(str).str.extract(_URL_RE)
    parts["scheme"] = parts["scheme"].fillna("").str.lower()
    parts["host"] = parts["host"].fillna("").str.lower()
    for c in ("port", "path", "query"):
        parts[c] = parts[c].fillna("")
    return parts


def _normalize_query(q: str) -> str:
    """Drop tracking params (utm_*, fbclid, gclid), sort the rest —
    param ORDER never distinguishes resources in practice, and sorting
    makes equal resources string-equal for exact dedup."""
    if not q:
        return ""
    keep = sorted(p for p in q.split("&")
                  if p and not p.split("=", 1)[0].lower().startswith("utm_")
                  and p.split("=", 1)[0].lower() not in ("fbclid", "gclid"))
    return "&".join(keep)


def normalize_urls(urls: pd.Series) -> pd.Series:
    """Canonical form: lowercase scheme+host, default port stripped,
    fragment dropped, tracking params removed, query params sorted,
    empty path → '/'.  Split and reassembly are vectorized; only the
    (rare, short) query-param sort is per value."""
    p = parse_urls(urls)
    default = p["scheme"].map(_DEFAULT_PORTS).fillna("")
    port = np.where((p["port"] == "") | (p["port"] == default),
                    "", ":" + p["port"])
    path = p["path"].where(p["path"] != "", "/")
    query = p["query"].map(_normalize_query)
    out = (p["scheme"] + "://" + p["host"] + port + path
           + np.where(query != "", "?" + query, ""))
    return out.where(p["host"] != "", urls.fillna("").astype(str))


def add_url_columns(ds: rd.Dataset, url_col: str = "url",
                    host_col: str = "host",
                    norm_col: str = "url_norm") -> rd.Dataset:
    """Attach lowercased host + normalized URL columns (one C-regex
    map_batches pass, no exchange)."""

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out[host_col] = parse_urls(batch[url_col])["host"]
        out[norm_col] = normalize_urls(batch[url_col])
        return out

    return ds.map_batches(attach, batch_format="pandas")


def host_counts(ds: rd.Dataset, url_col: str = "url") -> rd.Dataset:
    """Docs per host: per-batch pandas value_counts partials, then ONE
    small groupby-sum exchange over (host, partial) rows — the corpus
    never shuffles, only ≤ blocks×hosts count rows do."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = parse_urls(batch[url_col])["host"].value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(dtype=object),
                             "n_docs": vc.to_numpy(dtype=np.int64)})

    return (ds.select_columns([url_col])
            .map_batches(partial, batch_format="pandas")
            .groupby("host").aggregate(Sum("n_docs", alias_name="n_docs")))


def domain_cap(ds: rd.Dataset, url_col: str = "url", cap: int = 1000,
               order_col: str = "doc_id",
               columns: list[str] | None = None) -> pd.DataFrame:
    """Keep at most ``cap`` docs per host, lowest ``order_col`` first
    (deterministic, resume-stable) — the C4/RefinedWeb per-domain
    de-biasing step.  Rides ``grouped_top_k``: every batch reduces to
    ≤ cap rows per host it contains, so no worker ever holds a hot
    domain whole."""
    from .grouped import grouped_top_k

    with_host = add_url_columns(ds, url_col)
    cols = (columns or [c for c in ds.schema().names]) + ["host"]
    return grouped_top_k(with_host, ["host"], order_col, cap,
                         descending=False,
                         columns=list(dict.fromkeys(cols)))


def host_filter(ds: rd.Dataset, hosts: set[str], url_col: str = "url",
                mode: str = "block") -> rd.Dataset:
    """Drop (``mode='block'``) or keep (``'allow'``) rows whose host is
    in ``hosts``.  The set ships ONCE via ``ray.put`` and each batch
    tests membership with a vectorized ``isin`` — never re-serialized
    per batch, never a join."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    ref = ray.put(frozenset(h.lower() for h in hosts))

    class Filter:
        def __init__(self):
            self.hosts = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            hit = parse_urls(batch[url_col])["host"].isin(self.hosts)
            return batch[hit if mode == "allow" else ~hit]

    from .pool import actor_pool

    return ds.map_batches(Filter, batch_format="pandas",
                          concurrency=actor_pool())
