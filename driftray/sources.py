"""Source registry: pluggable per-format readers (SURVEY.md §2.10).

The reference fans out over whatever sources are configured
(``/root/reference/src/data_sources/web/news.py:321-336``; "make it modular
so that we could add redundant/fallback sources", ``DESIGN.md:135-137``).
The engine's version: a format → reader registry producing
``ray.data.Dataset``s, plus a ``read_any`` that dispatches on extension.
Adding a format = one ``@register_source`` function.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import ray.data as rd

_READERS: dict[str, Callable[..., rd.Dataset]] = {}


def register_source(fmt: str):
    def deco(fn):
        _READERS[fmt] = fn
        return fn
    return deco


@register_source("parquet")
def read_parquet(path: str, columns=None, **kw) -> rd.Dataset:
    return rd.read_parquet(path, columns=columns, **kw)


@register_source("csv")
def read_csv(path: str, columns=None, **kw) -> rd.Dataset:
    ds = rd.read_csv(path, **kw)
    return ds.select_columns(columns) if columns else ds


@register_source("json")
def read_json(path: str, columns=None, **kw) -> rd.Dataset:
    ds = rd.read_json(path, **kw)
    return ds.select_columns(columns) if columns else ds


@register_source("text")
def read_text(path: str, columns=None, **kw) -> rd.Dataset:
    return rd.read_text(path, **kw)


@register_source("binary")
def read_binary(path: str, columns=None, **kw) -> rd.Dataset:
    return rd.read_binary_files(path, include_paths=True, **kw)


def formats() -> list[str]:
    return sorted(_READERS)


def read_any(path: str, fmt: str | None = None, **kw) -> rd.Dataset:
    """Dispatch on explicit format or file extension."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet", "jsonl": "json", "txt": "text"}.get(ext, ext)
    if fmt not in _READERS:
        raise ValueError(f"no reader for format {fmt!r}; known: {formats()}")
    return _READERS[fmt](path, **kw)


def union_sources(datasets: list[rd.Dataset], limit_per_source: int | None = None) -> rd.Dataset:
    """Fan-in over redundant sources (D1: ``news.py:321-347``), optional
    per-source limit (O2) applied BEFORE the union."""
    if limit_per_source:
        datasets = [d.limit(limit_per_source) for d in datasets]
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def footer_schema_groups(path: str) -> dict[str, tuple[object, list[str]]]:
    """Group a parquet file/directory's files by their exact footer
    schema: ``{schema_key: (arrow_schema, [files])}``.  Footer reads
    only — no data scanned, same cost at any table size.  One entry
    means a schema-stable table; more means the table evolved."""
    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            files.extend(os.path.join(root, n) for n in sorted(names)
                         if n.endswith(".parquet"))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    out: dict[str, tuple[object, list[str]]] = {}
    for f in files:
        sch = pq.ParquetFile(f).schema_arrow
        key = sch.to_string()
        if key in out:
            out[key][1].append(f)
        else:
            out[key] = (sch, [f])
    return out


def read_parquet_evolving(path: str, columns=None, groups=None,
                          **kw) -> rd.Dataset:
    """Read a directory whose parquet files were written across SCHEMA
    VERSIONS (columns added/removed over time) — the case a naive
    ``read_parquet`` breaks on or silently mis-aligns.

    Footer-only planning (:func:`footer_schema_groups`): each schema
    group reads as its own Dataset, and the groups combine with
    ``relational.union_by_name`` (typed null padding for columns a
    version lacks; conflicting types for the SAME column name raise
    loudly rather than coerce).  Optional ``columns`` prunes each group
    to the requested subset it actually has.  ``groups`` accepts a
    precomputed :func:`footer_schema_groups` result so a caller issuing
    many reads over the same directory (run_validation's chunked window
    passes) walks the footers once, not once per read.
    """
    from .ops.relational import union_by_name

    grouped = footer_schema_groups(path) if groups is None else groups
    groups = {k: fs for k, (_, fs) in grouped.items()}
    schemas = {k: sch for k, (sch, _) in grouped.items()}
    parts = []
    for key, fs in sorted(groups.items()):
        cols = ([c for c in columns if c in schemas[key].names]
                if columns else None)
        if cols is not None and not cols:
            # a group with NONE of the requested columns must still
            # contribute its rows (null-padded by union_by_name) — read
            # one anchor column to keep the row count; a zero-column
            # read would emit empty blocks that bypass the padding UDF
            cols = [schemas[key].names[0]]
        parts.append(rd.read_parquet(fs, columns=cols, **kw))
    out = parts[0] if len(parts) == 1 else union_by_name(parts)
    if columns:
        have = out.schema().names
        missing = [c for c in columns if c not in have]
        if missing:
            raise KeyError(f"columns {missing} in no schema group")
        out = out.select_columns(list(columns))
    return out
