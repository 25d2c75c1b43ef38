"""kNN join (`ops/ann.knn_join`): exact equality to brute force when
every cluster is probed, high recall under real blocking, and the
planted-orthogonal closed form (q188's oracle regime)."""
import numpy as np
import pandas as pd
import ray.data as rd


def _brute_topk(L: np.ndarray, R: np.ndarray, k: int) -> pd.DataFrame:
    Ln = L / np.linalg.norm(L, axis=1, keepdims=True)
    Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    sims = Ln @ Rn.T
    rows = []
    for q in range(len(L)):
        order = sorted(range(len(R)), key=lambda j: (-sims[q, j], j))[:k]
        for r, j in enumerate(order, 1):
            rows.append((q, j, sims[q, j], r))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                       "score", "rank"])


def test_knn_join_full_probe_matches_brute(ray_session):
    from driftray.ops.ann import knn_join

    rng = np.random.default_rng(11)
    L = rng.normal(size=(25, 12))
    R = rng.normal(size=(120, 12))
    ld = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(25, dtype=np.int64), "embedding": list(L)}))
    rds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64), "embedding": list(R)}))
    out = (knn_join(ld, rds, k=4, n_clusters=5, nprobe=5,
                    num_partitions=4)
           .to_pandas().sort_values(["query_id", "rank"],
                                    ignore_index=True))
    exp = _brute_topk(L, R, 4)
    assert out["neighbor_id"].tolist() == exp["neighbor_id"].tolist()
    assert np.allclose(out["score"], exp["score"])
    assert out["rank"].tolist() == exp["rank"].tolist()


def test_knn_join_blocked_recall(ray_session):
    from driftray.ops.ann import knn_join

    rng = np.random.default_rng(3)
    # clustered data: blocking with nprobe=2 of 6 must still find most
    # true neighbors because true neighbors share the query's cluster
    centers = rng.normal(size=(6, 10)) * 5
    R = np.repeat(centers, 40, axis=0) + rng.normal(size=(240, 10)) * 0.3
    L = centers + rng.normal(size=(6, 10)) * 0.2
    ld = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(6, dtype=np.int64), "embedding": list(L)}))
    rds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(240, dtype=np.int64), "embedding": list(R)}))
    out = knn_join(ld, rds, k=10, n_clusters=6, nprobe=2,
                   num_partitions=4).to_pandas()
    exp = _brute_topk(L, R, 10)
    hits = 0
    for q in range(6):
        got = set(out.loc[out["query_id"] == q, "neighbor_id"])
        true = set(exp.loc[exp["query_id"] == q, "neighbor_id"])
        hits += len(got & true)
    assert hits / 60 >= 0.9


def test_knn_join_nprobe_validation(ray_session):
    import pytest

    from driftray.ops.ann import knn_join

    ld = rd.from_pandas(pd.DataFrame(
        {"vec_id": [0], "embedding": [np.ones(4)]}))
    with pytest.raises(ValueError):
        knn_join(ld, ld, k=1, n_clusters=2, nprobe=3)
