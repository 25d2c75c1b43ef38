"""HTML main-text extraction — the web-corpus ingestion front door.

A 100 TB training-data pipeline's documents mostly start life as crawled
HTML; the first transform is boilerplate removal (WET-style extraction:
jusText, Kohlschütter et al. "Boilerplate Detection Using Shallow Text
Features", trafilatura).  This module implements the deterministic core
of that family with the stdlib parser only — no lxml/bs4 in this
container — as a vectorizable-per-batch actor-pool stage:

* tag-level pruning: ``script``/``style``/``nav``/``header``/``footer``
  etc. subtrees never emit text;
* block segmentation: block-level tags delimit candidate text blocks,
  whitespace is normalized inside each block;
* shallow-feature filtering: blocks whose LINK DENSITY (fraction of
  characters inside ``<a>``) exceeds a threshold are dropped as
  boilerplate (menus/breadcrumbs that hide in plain ``div`` soup), the
  single most effective feature in the Kohlschütter study.

Scale shape: extraction is embarrassingly per-document (an actor-pool
``map_batches`` stage, parser state per call, no exchange); downstream
stats are plain Arrow columns.  Reference scope: the reference engine
ingests pre-extracted text (sources only emit clean strings) — this op
extends the ingestion surface the way its DESIGN.md's "pluggable
sources" section promises.
"""
from __future__ import annotations

import re
from html.parser import HTMLParser

import numpy as np
import pandas as pd
import ray.data as rd

# subtrees that never contribute main text
_SKIP_TAGS = frozenset(
    "script style noscript template svg head nav header footer aside "
    "iframe form button select option".split())
# tags that delimit text blocks (close the current candidate block)
_BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table td th section article "
    "main blockquote pre dd dt figure figcaption hr".split())
# void elements never pushed on the skip stack (they cannot nest content)
_VOID_TAGS = frozenset("br hr img input meta link area base col wbr".split())

_WS = re.compile(r"\s+")


class _MainTextParser(HTMLParser):
    """One-document parser: accumulates (text, link_chars) per block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []   # (raw text, link chars)
        self._buf: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._a_depth = 0
        self.n_links = 0

    def _flush(self) -> None:
        raw = "".join(self._buf)
        if raw.strip():
            self.blocks.append((raw, self._link_chars))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth += 1
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            # tolerate stray closers (real-web HTML is never well formed)
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _VOID_TAGS and tag in _BLOCK_TAGS:
            if not self._skip_depth:
                self._flush()
            return
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(_WS.sub(" ", data).strip()) or 0


def extract_blocks(html: str,
                   max_link_density: float = 0.5) -> list[str]:
    """Whitespace-normalized main-text blocks of ``html``; blocks whose
    link density exceeds ``max_link_density`` are dropped as boilerplate."""
    p = _MainTextParser()
    p.feed(html or "")
    p.close()
    p._flush()
    out = []
    for raw, link_chars in p.blocks:
        norm = _WS.sub(" ", raw).strip()
        if not norm:
            continue
        if link_chars / len(norm) > max_link_density:
            continue
        out.append(norm)
    return out


def extract_text(html: str, max_link_density: float = 0.5,
                 sep: str = "\n") -> str:
    """Main text of an HTML document (blocks joined by ``sep``)."""
    return sep.join(extract_blocks(html, max_link_density))


def html_stats(html: str, max_link_density: float = 0.5) -> dict:
    """Shallow extraction features for one document."""
    p = _MainTextParser()
    p.feed(html or "")
    p.close()
    p._flush()
    kept_chars = kept_blocks = dropped = total_link = total_chars = 0
    for raw, link_chars in p.blocks:
        norm = _WS.sub(" ", raw).strip()
        if not norm:
            continue
        total_chars += len(norm)
        total_link += min(link_chars, len(norm))
        if link_chars / len(norm) > max_link_density:
            dropped += 1
        else:
            kept_blocks += 1
            kept_chars += len(norm)
    return {"n_chars_main": kept_chars, "n_blocks": kept_blocks,
            "n_blocks_dropped": dropped, "n_links": p.n_links,
            "link_density": (total_link / total_chars
                             if total_chars else 0.0)}


class HtmlExtractor:
    """Actor-pool stage: HTML column → main text + shallow features.
    Parsing is inherently per-document (stateful SAX scan), the same
    per-row shape as the media decoders; everything downstream is
    column-vectorized."""

    def __init__(self, html_col: str = "html", id_col: str = "doc_id",
                 max_link_density: float = 0.5):
        self.html_col = html_col
        self.id_col = id_col
        self.mld = max_link_density

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        texts = np.empty(n, dtype=object)
        chars = np.empty(n, dtype=np.int64)
        blocks = np.empty(n, dtype=np.int64)
        dropped = np.empty(n, dtype=np.int64)
        links = np.empty(n, dtype=np.int64)
        for i, h in enumerate(batch[self.html_col]):
            bl = extract_blocks(h, self.mld)
            st = html_stats(h, self.mld)
            texts[i] = "\n".join(bl)
            chars[i] = st["n_chars_main"]
            blocks[i] = st["n_blocks"]
            dropped[i] = st["n_blocks_dropped"]
            links[i] = st["n_links"]
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "text": texts, "n_chars_main": chars, "n_blocks": blocks,
            "n_blocks_dropped": dropped, "n_links": links})


def extract_html(ds: rd.Dataset, html_col: str = "html",
                 id_col: str = "doc_id", max_link_density: float = 0.5,
                 batch_size: int = 256,
                 concurrency: int = 4) -> rd.Dataset:
    """Dataset-level extraction: (id, html) → (id, text, n_chars_main,
    n_blocks, n_blocks_dropped, n_links).  HTML bytes never leave this
    stage — downstream sees only extracted text."""
    return ds.select_columns([id_col, html_col]).map_batches(
        HtmlExtractor, fn_constructor_args=(html_col, id_col,
                                            max_link_density),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)
