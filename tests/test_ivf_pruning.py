"""IVF probe pruning: unprobed clusters must produce zero scored rows
(in-memory fused path) and zero read tasks (persisted / write-through
path).  Closes the 'in-memory IVF probe is a post-hoc full-scan filter'
gap (ops/ann.py)."""
import glob
import os

import numpy as np
import pandas as pd
import pytest

import driftray.ops.ann as ann


@pytest.fixture(scope="module")
def rds(ray_session):
    import ray.data as rd

    return rd


def _two_blob_frame(n_per=100, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.normal([10] + [0] * (dim - 1), 0.05, size=(n_per, dim))
    b = rng.normal([0] * (dim - 1) + [10], 0.05, size=(n_per, dim))
    V = np.vstack([a, b])
    return pd.DataFrame({"vec_id": np.arange(2 * n_per),
                         "embedding": list(V)}), V


def test_inmemory_ivf_scores_only_probed_clusters(rds, monkeypatch):
    """With nprobe=1 on two well-separated blobs, the scorer must receive
    ONLY the probed blob's rows — the other cluster's rows are dropped
    inside the assign pass, not post-hoc filtered downstream."""
    df, V = _two_blob_frame()
    seen = {}
    real = ann.brute_force_topk

    def spy(ds, *a, **kw):
        mat = ds.materialize()
        seen["rows"] = mat.count()
        seen["clusters"] = set(
            r["ivf_cluster"] for r in mat.select_columns(["ivf_cluster"]).take_all())
        return real(mat, *a, **kw)

    monkeypatch.setattr(ann, "brute_force_topk", spy)
    out = ann.ivf_topk(rds.from_pandas(df), V[3], k=5, n_clusters=2,
                       nprobe=1, seed=42).to_pandas()
    # zero rows from the unprobed cluster reached scoring
    assert len(seen["clusters"]) == 1
    assert seen["rows"] <= 100            # only blob A's cluster
    assert seen["rows"] >= 5
    # and the answer is still right: all hits are blob-A ids, incl. vec 3
    assert set(out["vec_id"]) <= set(range(100))
    assert 3 in set(out["vec_id"])


def test_writethrough_ivf_reads_only_probed_partitions(rds, monkeypatch, tmp_path):
    """index_dir= write-through: the probe's read_parquet call must list
    ONLY files under the probed ivf_cluster= directories — unprobed
    partitions produce zero read tasks."""
    df, V = _two_blob_frame()
    idx = str(tmp_path / "ivf")
    captured = {}
    real_read = ann.rd.read_parquet

    def spy(paths, *a, **kw):
        captured["paths"] = list(paths) if isinstance(paths, list) else [paths]
        return real_read(paths, *a, **kw)

    monkeypatch.setattr(ann.rd, "read_parquet", spy)
    out = ann.ivf_topk(rds.from_pandas(df), V[150], k=5, n_clusters=2,
                       nprobe=1, seed=42, index_dir=idx).to_pandas()

    all_dirs = {os.path.basename(d) for d in glob.glob(f"{idx}/ivf_cluster=*")}
    read_dirs = {os.path.basename(os.path.dirname(p)) for p in captured["paths"]}
    assert len(all_dirs) == 2
    assert len(read_dirs) == 1            # exactly the probed partition
    unprobed = all_dirs - read_dirs
    for d in unprobed:                    # zero read tasks for unprobed dirs
        assert not any(d in p for p in captured["paths"])
    assert set(out["vec_id"]) <= set(range(100, 200))
    assert 150 in set(out["vec_id"])

    # index reuse: a second probe must NOT rebuild (centroids file mtime
    # unchanged, no assignment scan) and still answer from the other blob
    cfile = os.path.join(idx, "_centroids.npy")
    mtime = os.path.getmtime(cfile)
    out2 = ann.ivf_topk(rds.from_pandas(df.iloc[:0]), V[3], k=5,
                        n_clusters=2, nprobe=1, seed=42,
                        index_dir=idx).to_pandas()
    assert os.path.getmtime(cfile) == mtime
    assert 3 in set(out2["vec_id"])


def test_inmemory_ivf_empty_batch_assign(rds):
    """keep_clusters pruning must survive empty pandas batches emitted by
    upstream filters."""
    df, V = _two_blob_frame(n_per=30)
    ds = rds.from_pandas(df).filter(lambda r: r["vec_id"] != 10)
    out = ann.ivf_topk(ds, V[3], k=3, n_clusters=2, nprobe=1,
                       seed=42).to_pandas()
    assert 3 in set(out["vec_id"])
