"""Schema evolution through the FLAGSHIP path: a repo_files directory
written across two schema versions (v2 adds a column) must validate end
to end — union-by-name read, drift surfaced in the snapshot diff, the
critical schema_drift alert fired, and every window still checked."""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _engine_cols(t: pa.Table) -> pa.Table:
    return t.select([c for c in t.column_names if not c.startswith("_")])


@pytest.fixture()
def evolved_dirs(tmp_path):
    from driftray.fixtures import RepoFilesConfig, dimensions, repo_files_batch

    cfg = RepoFilesConfig(window_rows=2000)
    data = tmp_path / "data"
    os.makedirs(data)
    # v1: windows 0-1, the declared five-column schema
    v1 = _engine_cols(repo_files_batch(np.arange(0, 4000), cfg))
    pq.write_table(v1, str(data / "part-v1.parquet"))
    repos, commits = dimensions(cfg)
    pq.write_table(repos, str(tmp_path / "repos.parquet"))
    pq.write_table(commits, str(tmp_path / "commits.parquet"))
    return cfg, data, tmp_path


def _dims(tmp_path):
    return {"repos": str(tmp_path / "repos.parquet"),
            "commits": str(tmp_path / "commits.parquet")}


def test_added_column_validates_and_alerts(ray_session, evolved_dirs,
                                           tmp_path):
    from driftray.alerts import AlertManager
    from driftray.pipeline import run_validation
    from driftray.spec import repo_files_spec

    cfg, data, root = evolved_dirs
    out = str(tmp_path / "out")
    spec = repo_files_spec()

    # run 1: schema-stable v1 — persists the baseline snapshot
    res1 = run_validation(str(data), out, spec, dim_paths=_dims(root))
    assert sorted(r.window_id for r in res1) == [0, 1]

    # v2 lands: windows 2-3 with an ADDED column
    from driftray.fixtures import repo_files_batch

    v2 = _engine_cols(repo_files_batch(np.arange(4000, 8000), cfg))
    v2 = v2.append_column("stars", pa.array(
        np.arange(v2.num_rows) % 7, pa.int64()))
    pq.write_table(v2, str(data / "part-v2.parquet"))

    # run 2: mixed-schema directory — pending windows validate through
    # the union-by-name read; drift diffs against the persisted snapshot
    # resume semantics: windows 0-1 are checkpointed _DONE, so only the
    # new v2 windows run (and they run through the evolving read)
    res2 = run_validation(str(data), out, spec, dim_paths=_dims(root))
    assert sorted(r.window_id for r in res2) == [2, 3]
    assert all(r.n_rows == 2000 for r in res2)

    import json

    lineage = [json.loads(l) for l in
               open(os.path.join(out, "run_lineage.jsonl"))]
    assert lineage[-1]["schema_groups"] == 2
    assert lineage[-1]["schema_drift"]["added"] == ["stars"]

    hist = AlertManager(history_path=os.path.join(out, "alerts")).history()
    fired = hist.to_pylist()
    assert any(a["rule"] == "schema_drift" and a["severity"] == "critical"
               for a in fired), fired


def test_retyped_column_surfaces_in_diff(ray_session, evolved_dirs,
                                         tmp_path):
    from driftray.pipeline import run_validation
    from driftray.schema_drift import snapshot_schema
    from driftray.spec import repo_files_spec

    cfg, data, root = evolved_dirs
    out = str(tmp_path / "out2")
    run_validation(str(data), out, repo_files_spec(), dim_paths=_dims(root))

    # v2 retypes lang string -> large_string (a representation change the
    # first-fragment snapshot would have hidden entirely)
    from driftray.fixtures import repo_files_batch

    v2 = _engine_cols(repo_files_batch(np.arange(4000, 6000), cfg))
    i = v2.schema.get_field_index("lang")
    v2 = v2.set_column(i, "lang", v2["lang"].cast(pa.large_string()))
    pq.write_table(v2, str(data / "part-v2.parquet"))

    snap = snapshot_schema(str(data))
    assert snap["lang"] == "large_string|string"
