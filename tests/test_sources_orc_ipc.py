"""ORC + Arrow IPC sources/sinks (`driftray/sources.py`).

Covers: roundtrip equality, column pruning, stripe/record-batch-level
read parallelism (one giant file must still split into many read units),
extension dispatch through ``read_any``, and idempotent shard naming.
"""

import os

import pyarrow as pa
import pytest

import ray.data as rd

from driftray.sources import (read_any, read_ipc, read_orc, write_ipc,
                              write_orc)


@pytest.fixture()
def docs_ds():
    ids = list(range(2000))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in ids]),
        "n_chars": pa.array([(i * 37) % 999 for i in ids], pa.int64()),
    }))


def _sorted_pdf(ds):
    return ds.to_pandas().sort_values("doc_id", ignore_index=True)


def test_orc_roundtrip_and_pruning(docs_ds, tmp_path):
    out = str(tmp_path / "orc")
    shards = write_orc(docs_ds, out)
    assert shards and all(p.endswith(".orc") for p in shards)
    back = read_orc(out)
    a, b = _sorted_pdf(docs_ds), _sorted_pdf(back)
    assert a.equals(b[a.columns.tolist()])
    pruned = read_orc(out, columns=["doc_id", "n_chars"])
    pdf = _sorted_pdf(pruned)
    assert pdf.columns.tolist() == ["doc_id", "n_chars"]
    assert (pdf["n_chars"].values == a["n_chars"].values).all()


def test_ipc_roundtrip_and_dispatch(docs_ds, tmp_path):
    out = str(tmp_path / "ipc")
    shards = write_ipc(docs_ds, out, max_chunk_rows=256)
    assert shards and all(p.endswith(".arrow") for p in shards)
    back = read_any(out, fmt="ipc")
    assert _sorted_pdf(docs_ds).equals(
        _sorted_pdf(back)[["doc_id", "lang", "n_chars"]])
    # extension dispatch on a single file path
    one = read_any(shards[0], columns=["doc_id"])
    assert one.to_pandas().columns.tolist() == ["doc_id"]


def test_single_big_file_splits_into_many_read_units(tmp_path):
    """A lone 200k-row file must parallelize INSIDE the file: many ORC
    stripes / IPC record batches -> many blocks out of the read."""
    n = 200_000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "v": pa.array([i % 7 for i in range(n)], pa.int64())})
    from pyarrow import orc as porc

    orc_path = str(tmp_path / "big.orc")
    porc.write_table(t, orc_path, stripe_size=64 * 1024)
    assert porc.ORCFile(orc_path).nstripes > 4
    # target_unit_bytes small enough that this test file counts as "big"
    ds = read_orc(orc_path, target_unit_bytes=32 * 1024)
    assert ds.count() == n
    assert ds.materialize().num_blocks() > 4

    ipc_path = str(tmp_path / "big.arrow")
    with pa.OSFile(ipc_path, "wb") as f, pa.ipc.new_file(f, t.schema) as w:
        for b in t.to_batches(max_chunksize=20_000):
            w.write_batch(b)
    ds2 = read_ipc(ipc_path, target_unit_bytes=256 * 1024)
    assert ds2.count() == n
    assert ds2.materialize().num_blocks() > 4
    # default coalescing: a small file collapses to few read tasks
    assert read_ipc(ipc_path).materialize().num_blocks() <= 2


def test_shard_names_deterministic(docs_ds, tmp_path):
    """Content-hash shard names: rewriting the same data into the same
    dir must not grow the file count (idempotent under task retry)."""
    out = str(tmp_path / "orc2")
    first = set(write_orc(docs_ds, out))
    second = set(write_orc(docs_ds, out))
    assert first == second
    assert {os.path.basename(p) for p in first} == \
           {e.name for e in os.scandir(out)}


def test_empty_dataset_writes_no_shards(tmp_path):
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert write_ipc(empty, str(tmp_path / "e")) == []
