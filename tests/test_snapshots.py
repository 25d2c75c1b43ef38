"""Snapshot-versioned tables (`driftray/ops/snapshots.py`).

Covers: append/overwrite/delete commit chain, time-travel reads pinned
to old versions, copy-on-write file granularity (untouched files carried
by reference), optimistic-concurrency version bumps, and snapshot
expiry reclaiming only unreferenced data files.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from driftray.ops.snapshots import (expire_snapshots, latest_version,
                                    read_version, snapshot_append,
                                    snapshot_delete_where, snapshot_log,
                                    snapshot_overwrite, _commit)


def _ds(ids, vals):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(vals, pa.int64())}))


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_append_chain_and_time_travel(table):
    v1 = snapshot_append(table, _ds([1, 2], [10, 20]))
    v2 = snapshot_append(table, _ds([3], [30]))
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2
    assert read_version(table, 1).count() == 2
    assert read_version(table).count() == 3
    assert sorted(read_version(table, 2).to_pandas()["doc_id"]) == [1, 2, 3]


def test_overwrite_keeps_old_versions_readable(table):
    snapshot_append(table, _ds([1, 2], [10, 20]))
    snapshot_overwrite(table, _ds([9], [90]))
    assert read_version(table, 1).count() == 2
    assert read_version(table, 2).to_pandas()["doc_id"].tolist() == [9]
    log = snapshot_log(table)
    assert [e["op"] for e in log] == ["append", "overwrite"]
    assert [e["total_rows"] for e in log] == [2, 1]


def test_delete_where_is_file_granular(table):
    # two appends -> two separate data files
    snapshot_append(table, _ds([1, 2], [10, 20]))
    snapshot_append(table, _ds([3, 4], [30, 40]))
    files_v2 = {e["file"] for e in __import__("json").load(
        open(os.path.join(table, "_snapshots", "v000002.json")))["files"]}
    v3 = snapshot_delete_where(
        table, lambda t: pc.equal(t["doc_id"], pa.scalar(4)))
    got = read_version(table, v3).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [1, 2, 3]
    # the file holding only ids 1,2 must be carried over BY REFERENCE
    import json
    files_v3 = {e["file"] for e in json.load(
        open(os.path.join(table, "_snapshots", "v000003.json")))["files"]}
    assert len(files_v2 & files_v3) == 1
    # old version still has all 4 rows
    assert read_version(table, 2).count() == 4


def test_delete_where_no_match_rewrites_nothing(table):
    snapshot_append(table, _ds([1], [10]))
    import json
    f1 = json.load(open(os.path.join(table, "_snapshots",
                                     "v000001.json")))["files"]
    v2 = snapshot_delete_where(
        table, lambda t: pc.equal(t["doc_id"], pa.scalar(999)))
    f2 = json.load(open(os.path.join(table, "_snapshots",
                                     "v000002.json")))["files"]
    assert f1 == f2 and v2 == 2


def test_commit_race_bumps_version(table):
    snapshot_append(table, _ds([1], [10]))
    # two writers both observed parent=1; the second to land gets v3
    a = _commit(table, [], "overwrite", parent=1, schema_str="s")
    b = _commit(table, [], "overwrite", parent=1, schema_str="s")
    assert (a, b) == (2, 3)


def test_expire_snapshots_reclaims_only_dead_files(table):
    snapshot_append(table, _ds([1, 2], [10, 20]))
    snapshot_overwrite(table, _ds([9], [90]))
    data = os.path.join(table, "data")
    n_before = len(os.listdir(data))
    out = expire_snapshots(table, keep_last=1)
    assert out["dropped_manifests"] == 1
    assert len(os.listdir(data)) == n_before - out["dropped_files"]
    # latest still fully readable; v1 gone
    assert read_version(table).to_pandas()["doc_id"].tolist() == [9]
    with pytest.raises(FileNotFoundError):
        read_version(table, 1)


def test_snapshot_compact_merges_small_files(table):
    for i in range(4):
        snapshot_append(table, _ds([i * 2, i * 2 + 1], [1, 2]))
    from driftray.ops.snapshots import snapshot_compact
    v, rep = snapshot_compact(table, target_mb=128)
    assert v == 5 and rep["rewritten"] == 4 and rep["new_files"] == 1
    assert read_version(table, v).count() == 8
    # pre-compaction versions untouched
    assert read_version(table, 2).count() == 4
    log = snapshot_log(table)
    assert log[-1]["op"] == "compact" and log[-1]["n_files"] == 1


def test_snapshot_cli(table, capsys):
    snapshot_append(table, _ds([1, 2], [10, 20]))
    snapshot_overwrite(table, _ds([9], [90]))
    from driftray.__main__ import main
    import json as _json
    assert main(["snapshot", "log", "--table", table]) == 0
    lines = [_json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [e["version"] for e in lines] == [1, 2]
    assert main(["snapshot", "head", "--table", table]) == 0
    head = _json.loads(capsys.readouterr().out)
    assert head["rows"] == 1
    assert main(["snapshot", "expire", "--table", table,
                 "--keep-last", "1"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["dropped_manifests"] == 1
