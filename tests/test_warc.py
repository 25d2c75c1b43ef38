"""WARC source: record framing, gzip members, HTTP splitting, read_any
dispatch (SURVEY §2.10 source registry; CommonCrawl shard conventions)."""

import gzip
import os

import numpy as np
import pytest

from driftray.sources import (parse_warc_bytes, read_any, read_warc,
                              warc_record_bytes, write_warc)


def _http_payload(body: bytes, status: int = 200) -> bytes:
    return (f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def _records():
    return [
        dict(warc_type="request", payload=b"GET / HTTP/1.1\r\n\r\n",
             target_uri="http://a.example/"),
        dict(warc_type="response",
             payload=_http_payload(b"<html>hello WARC/1.0 inside</html>"),
             target_uri="http://a.example/", warc_lang="en",
             content_type="application/http; msgtype=response"),
        dict(warc_type="metadata", payload=b"via: crawler"),
        dict(warc_type="response",
             payload=_http_payload("<p>café</p>".encode(), 404),
             target_uri="http://b.example/x", warc_lang="fr",
             content_type="application/http; msgtype=response"),
    ]


class TestParse:
    def test_roundtrip_all_types(self):
        raw = b"".join(warc_record_bytes(**r) for r in _records())
        got = parse_warc_bytes(raw)
        assert [g["warc_type"] for g in got] == ["request", "response",
                                                 "metadata", "response"]
        # payload containing the record-header magic must not re-frame
        assert got[1]["payload"] == b"<html>hello WARC/1.0 inside</html>"
        assert got[1]["http_status"] == 200
        assert got[3]["http_status"] == 404
        assert got[3]["payload"].decode() == "<p>café</p>"
        assert got[2]["http_status"] is None        # no HTTP envelope
        assert got[1]["warc_lang"] == "en"

    def test_malformed_raises(self):
        with pytest.raises(ValueError, match="no record header"):
            parse_warc_bytes(b"not a warc")


class TestReadWarc:
    def test_plain_and_gz_members(self, ray_session, tmp_path):
        plain = os.path.join(tmp_path, "shard-0.warc")
        gz = os.path.join(tmp_path, "shard-1.warc.gz")
        write_warc(plain, _records())
        write_warc(gz, _records(), gzip_members=True)
        for path in (plain, gz):
            df = read_warc(path).to_pandas()
            assert len(df) == 2                     # responses only
            assert set(df["http_status"]) == {200, 404}
            assert df["payload"].map(lambda b: bytes(b)[:1] == b"<").all()
        both = read_any(os.fspath(tmp_path), fmt="warc").to_pandas()
        assert len(both) == 4

    def test_read_any_gz_extension(self, ray_session, tmp_path):
        gz = os.path.join(tmp_path, "s.warc.gz")
        write_warc(gz, _records(), gzip_members=True)
        assert read_any(gz).count() == 2

    def test_type_filter_off(self, ray_session, tmp_path):
        p = os.path.join(tmp_path, "s.warc")
        write_warc(p, _records())
        assert read_warc(p, warc_types=()).count() == 4
        assert (read_warc(p, warc_types=("request",), columns=["warc_type"])
                .to_pandas()["warc_type"] == "request").all()
