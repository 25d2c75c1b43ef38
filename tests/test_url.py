"""URL curation (ops/url.py) tests."""
import numpy as np
import pandas as pd
import ray.data as rd

from driftray.ops.url import (add_url_columns, domain_cap, host_counts,
                              host_filter, normalize_urls, parse_urls)


def test_parse_urls_vectorized():
    s = pd.Series([
        "https://WWW.Example.COM:8080/A/b?x=1#frag",
        "http://user:pw@site.org/path",
        "ftp://files.net",
        "not a url",
        None])
    p = parse_urls(s)
    assert list(p["host"]) == ["www.example.com", "site.org",
                               "files.net", "", ""]
    assert list(p["scheme"]) == ["https", "http", "ftp", "", ""]
    assert p.loc[0, "port"] == "8080"
    assert p.loc[0, "path"] == "/A/b" and p.loc[0, "query"] == "x=1"


def test_normalize_urls():
    s = pd.Series([
        "HTTPS://Host.Com:443/p?utm_source=x&b=2&a=1#frag",
        "http://h.com:80/",
        "http://h.com:8080/p",
        "https://h.com",                      # empty path -> /
        "https://h.com/p?fbclid=z&gclid=y",   # tracking-only query drops
        "plain text",                         # unparseable passes through
    ])
    out = list(normalize_urls(s))
    assert out == [
        "https://host.com/p?a=1&b=2",
        "http://h.com/",
        "http://h.com:8080/p",
        "https://h.com/",
        "https://h.com/p",
        "plain text"]


def test_normalize_idempotent():
    s = pd.Series(["HTTPS://A.b:443/x?utm_c=1&z=2&y=3#f"])
    once = normalize_urls(s)
    assert list(normalize_urls(once)) == list(once)


def _doc_ds(n=30):
    hosts = ["a.com", "b.com", "c.com"]
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "url": [f"https://{hosts[i % 3]}/d/{i}?utm_x=1" for i in range(n)]}))


def test_add_url_columns(ray_session):
    out = (add_url_columns(_doc_ds(6)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert out.loc[0, "host"] == "a.com"
    assert out.loc[0, "url_norm"] == "https://a.com/d/0"


def test_host_counts(ray_session):
    out = (host_counts(_doc_ds(30)).to_pandas()
           .sort_values("host", ignore_index=True))
    assert list(out["host"]) == ["a.com", "b.com", "c.com"]
    assert list(out["n_docs"]) == [10, 10, 10]


def test_domain_cap(ray_session):
    out = domain_cap(_doc_ds(30), cap=3, columns=["doc_id"])
    assert len(out) == 9
    # lowest doc_ids per host kept: host a.com has ids 0,3,6,...
    kept = set(out["doc_id"])
    assert kept == {0, 3, 6, 1, 4, 7, 2, 5, 8}


def test_host_filter_block_and_allow(ray_session):
    ds = _doc_ds(30)
    blocked = host_filter(ds, {"B.COM"}, mode="block").to_pandas()
    assert len(blocked) == 20 and not (blocked["doc_id"] % 3 == 1).any()
    allowed = host_filter(ds, {"b.com"}, mode="allow").to_pandas()
    assert len(allowed) == 10 and (allowed["doc_id"] % 3 == 1).all()
    try:
        host_filter(ds, set(), mode="nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
