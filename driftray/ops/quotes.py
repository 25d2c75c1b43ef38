"""Market-quote normalization (SURVEY.md §3.3 / M6, S3).

The reference's market source serializes arbitrary quote objects via
``__dict__`` → JSON with ISO timestamps and logs them one at a time
(``/root/reference/src/data_sources/market/security.py:20-49``).  The
engine treats each polling window of quotes as a micro-batch Dataset and
normalizes in one vectorized pass:

* ``parse_quotes`` — JSON payload column → typed columns (symbol, bid/ask
  prices + sizes, ``timestamp[us]`` from ISO strings);
* ``serialize_quotes`` — the inverse, for sink parity with the reference's
  JSON output (``security.py:41-44``).

No live WebSocket: the stream boundary is the window directory (S3 → S6
micro-batch model, SURVEY.md §2.1).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

QUOTE_SCHEMA = pa.schema([
    ("symbol", pa.string()),
    ("bid_price", pa.float64()),
    ("bid_size", pa.int64()),
    ("ask_price", pa.float64()),
    ("ask_size", pa.int64()),
    ("timestamp", pa.timestamp("us")),
])


def parse_quotes(ds: rd.Dataset, payload_col: str = "payload") -> rd.Dataset:
    """JSON quote payloads → typed Arrow columns."""

    def fn(t: pa.Table) -> pa.Table:
        rows = {f.name: [] for f in QUOTE_SCHEMA}
        for raw in t[payload_col].to_pylist():
            d = json.loads(raw) if raw else {}
            rows["symbol"].append(d.get("symbol"))
            rows["bid_price"].append(d.get("bid_price"))
            rows["bid_size"].append(d.get("bid_size"))
            rows["ask_price"].append(d.get("ask_price"))
            rows["ask_size"].append(d.get("ask_size"))
            ts = d.get("timestamp")
            rows["timestamp"].append(np.datetime64(ts, "us") if ts else None)
        return pa.Table.from_pydict(rows, schema=QUOTE_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")


def serialize_quotes(ds: rd.Dataset) -> rd.Dataset:
    """Typed columns → one JSON string per quote with ISO timestamps
    (``security.py:20-28`` DateTimeEncoder semantics)."""

    def fn(t: pa.Table) -> pa.Table:
        iso = pc.strftime(t["timestamp"], format="%Y-%m-%dT%H:%M:%S.%f")
        # columnar to_pylist per column (one C call each), then a zip loop —
        # halves the Python overhead vs per-cell .as_py() chunked access
        cols = [t["symbol"].to_pylist(), t["bid_price"].to_pylist(),
                t["bid_size"].to_pylist(), t["ask_price"].to_pylist(),
                t["ask_size"].to_pylist(), iso.to_pylist()]
        payloads = [json.dumps({
            "symbol": s, "bid_price": bp, "bid_size": bs,
            "ask_price": ap, "ask_size": asz, "timestamp": ts,
        }, sort_keys=True) for s, bp, bs, ap, asz, ts in zip(*cols)]
        return pa.table({"payload": pa.array(payloads, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def synth_quote_payloads(n: int, seed: int = 42) -> pa.Table:
    """Deterministic JSON quote fixture (SPY-style, ``security.py:68-77``)."""
    rng = np.random.default_rng(seed)
    payloads = []
    base = np.datetime64("2025-02-03T09:30:00", "us")
    for i in range(n):
        mid = 500 + float(rng.normal(0, 2))
        payloads.append(json.dumps({
            "symbol": "SPY",
            "bid_price": round(mid - 0.01, 2),
            "bid_size": int(rng.integers(1, 50)),
            "ask_price": round(mid + 0.01, 2),
            "ask_size": int(rng.integers(1, 50)),
            "timestamp": str(base + np.timedelta64(i, "s")),
        }))
    return pa.table({"payload": pa.array(payloads, pa.string())})
