"""HTML main-text extraction (ops/html.py) tests."""
import html as html_mod

import pandas as pd
import pytest
import ray.data as rd

from driftray.ops.html import (HtmlExtractor, extract_blocks, extract_html,
                               extract_text, html_stats)

PAGE = """<html><head><title>T</title><script>var x = "nav text";</script>
<style>.a { color: red }</style></head><body>
<nav><a href="/">Home</a> <a href="/b">Blog</a></nav>
<header><h1>Site</h1></header>
<div id="menu"><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>
<p>First   paragraph
with  collapsed    whitespace.</p>
<div>Second block with a <a href="/x">single link</a> inside prose text
that is long enough to keep.</div>
<footer>&copy; 2026 Boiler Co</footer>
<noscript>enable js</noscript>
</body></html>"""


def test_extract_drops_boilerplate_keeps_prose():
    blocks = extract_blocks(PAGE)
    assert blocks == [
        "First paragraph with collapsed whitespace.",
        "Second block with a single link inside prose text "
        "that is long enough to keep."]
    txt = extract_text(PAGE)
    assert "var x" not in txt and "color: red" not in txt
    assert "Home" not in txt and "Boiler" not in txt
    assert "enable js" not in txt


def test_link_density_block_drop():
    # the bare-div menu has link density 1.0 > 0.5 -> dropped even though
    # div is not a skip tag; raising the threshold keeps it
    assert "one two three" not in extract_text(PAGE)
    assert "one two three" in extract_text(PAGE, max_link_density=1.1)


def test_entity_roundtrip():
    raw = 'a < b & "c" > d'
    page = f"<p>{html_mod.escape(raw)}</p>"
    assert extract_text(page) == raw


def test_stats():
    st = html_stats(PAGE)
    assert st["n_blocks"] == 2
    assert st["n_blocks_dropped"] == 1          # the menu div
    # nav is a skip tag -> its 2 <a> never reach the counter; the menu
    # div's 3 + the prose block's 1 do
    assert st["n_links"] == 4
    assert st["n_chars_main"] == sum(len(b) for b in extract_blocks(PAGE))
    assert 0 < st["link_density"] < 1


def test_degenerate_inputs():
    assert extract_text("") == ""
    assert extract_text(None) == ""
    assert extract_text("just bare text, no tags") == \
        "just bare text, no tags"
    assert extract_text("<p></p><div>   </div>") == ""
    # stray closers and unclosed tags must not raise
    assert "kept" in extract_text("</nav></div><p>kept")


def test_malformed_skip_nesting():
    # nested skip subtrees: inner close must not unskip the outer
    page = "<nav><footer>deep</footer>still nav</nav><p>out</p>"
    assert extract_text(page) == "out"


def test_extract_html_dataset(ray_session):
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "html": [PAGE, "<p>tiny</p>", "<nav>only chrome</nav>"]})
    out = (extract_html(rd.from_pandas(rows), concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.columns) == ["doc_id", "text", "n_chars_main",
                                 "n_blocks", "n_blocks_dropped", "n_links"]
    assert out.loc[0, "n_blocks"] == 2
    assert out.loc[1, "text"] == "tiny"
    assert out.loc[2, "text"] == "" and out.loc[2, "n_chars_main"] == 0
    assert out.loc[0, "n_chars_main"] == len(out.loc[0, "text"]) - 1  # \n sep


def test_extractor_batch_kernel_matches_scalar():
    batch = pd.DataFrame({"doc_id": [7], "html": [PAGE]})
    out = HtmlExtractor()(batch)
    assert out.loc[0, "text"] == extract_text(PAGE)
    st = html_stats(PAGE)
    for k in ("n_chars_main", "n_blocks", "n_blocks_dropped", "n_links"):
        assert out.loc[0, k] == st[k]
