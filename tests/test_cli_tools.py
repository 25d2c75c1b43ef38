"""CLI profile / compact subcommands (python -m driftray ...)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from driftray.__main__ import main


def _write_table(path, n=2000):
    t = pa.table({
        "a": pa.array(np.arange(n), pa.int64()),
        "b": pa.array([f"v{i % 7}" for i in range(n)]),
    })
    pq.write_table(t, path)


class TestProfileCLI:
    def test_profiles_all_columns(self, ray_session, tmp_path, capsys):
        p = str(tmp_path / "t.parquet")
        _write_table(p)
        assert main(["profile", "--input", p]) == 0
        rows = [json.loads(line) for line in
                capsys.readouterr().out.strip().splitlines()]
        by = {r["col"]: r for r in rows}
        assert set(by) == {"a", "b"}
        assert by["a"]["n"] == 2000 and by["a"]["vsum"] == 2000 * 1999 // 2
        assert by["b"]["kind"] == "str"

    def test_column_subset(self, ray_session, tmp_path, capsys):
        p = str(tmp_path / "t.parquet")
        _write_table(p)
        assert main(["profile", "--input", p, "--columns", "a"]) == 0
        rows = [json.loads(line) for line in
                capsys.readouterr().out.strip().splitlines()]
        assert [r["col"] for r in rows] == ["a"]


class TestCompactCLI:
    def test_compacts(self, ray_session, tmp_path, capsys):
        src = tmp_path / "in" / "k=0"
        src.mkdir(parents=True)
        for i in range(5):
            _write_table(str(src / f"f{i}.parquet"), n=200)
        out = str(tmp_path / "out")
        assert main(["compact", "--input", str(tmp_path / "in"),
                     "--out", out, "--partition-col", "k"]) == 0
        rep = [json.loads(line) for line in
               capsys.readouterr().out.strip().splitlines()]
        assert rep[0]["files_in"] == 5 and rep[0]["files_out"] == 1
        assert rep[0]["rows"] == 1000
        assert os.path.exists(os.path.join(out, "k=0", "_DONE"))
