import numpy as np, pandas as pd, os
import pytest
import ray.data as rd

def test_write_partitioned_resumable(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from driftray.ops.sink import write_partitioned_resumable

    df = pd.DataFrame({"g": np.repeat(["a", "b", "c"], 20),
                       "v": np.arange(60, dtype=np.int64)})
    out = str(tmp_path / "out")
    r1 = write_partitioned_resumable(rd.from_pandas(df), out, "g", group_size=2)
    assert sorted(r1["written"]) == ["a", "b", "c"] and r1["skipped"] == []
    for g in "abc":
        assert os.path.exists(f"{out}/g={g}/_DONE")

    # resume: mark mtimes, rerun — nothing rewritten
    mtimes = {g: os.path.getmtime(f"{out}/g={g}/_DONE") for g in "abc"}
    r2 = write_partitioned_resumable(rd.from_pandas(df), out, "g", group_size=2)
    assert r2["written"] == [] and sorted(r2["skipped"]) == ["a", "b", "c"]

    # partial resume: delete one marker+dir, rerun writes only it
    import shutil; shutil.rmtree(f"{out}/g=b")
    r3 = write_partitioned_resumable(rd.from_pandas(df), out, "g", group_size=2)
    assert r3["written"] == ["b"] and sorted(r3["skipped"]) == ["a", "c"]

    # data correct across all partitions
    back = pq.read_table(out).to_pandas()
    assert len(back) == 60
    assert sorted(back["v"]) == list(range(60))
