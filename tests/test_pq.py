"""Product-quantization ANN: recall vs brute force, code compactness."""

import numpy as np
import pandas as pd

import ray.data as rd

from driftray.ops.ann import (brute_force_topk, pq_encode, pq_topk,
                              pq_topk_rerank, pq_train)


def _clustered(n=1500, d=32, n_clusters=10, seed=4):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3
    X = centers[rng.integers(0, n_clusters, n)] + rng.normal(size=(n, d)) * 0.3
    return X.astype(np.float32)


def _ds(X):
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": list(X)})).repartition(4)


class TestPQ:
    def test_codes_are_m_bytes(self, ray_session):
        X = _clustered(n=300)
        model = pq_train(_ds(X), m=8, n_codes=16, sample_rows=300)
        codes = pq_encode(_ds(X), model).to_pandas()
        assert len(codes) == 300
        assert all(len(c) == 8 for c in codes["pq_code"])

    def test_recall_vs_brute_force(self, ray_session):
        # coarse 8-byte codes can't resolve fine within-cluster ordering
        # (a pure-numpy PQ reference gives the same ~0.26 on this data);
        # the production path is ADC + exact rerank, which must recover
        # near-exact recall — that's the asserted contract.
        X = _clustered()
        ds = _ds(X)
        Q = X[:5].astype(np.float64)
        exact = brute_force_topk(ds, Q, k=10).to_pandas()
        model = pq_train(ds, m=8, n_codes=32, sample_rows=1500)
        codes = pq_encode(ds, model).materialize()

        approx = pq_topk(codes, model, Q, k=10).to_pandas()
        rr = pq_topk_rerank(ds, codes, model, Q, k=10,
                            rerank=150).to_pandas()
        coarse_rec, rerank_rec = [], []
        for qi in range(5):
            e = set(exact[exact.query_id == qi]["vec_id"])
            coarse_rec.append(
                len(e & set(approx[approx.query_id == qi]["vec_id"])) / 10)
            rerank_rec.append(
                len(e & set(rr[rr.query_id == qi]["vec_id"])) / 10)
        assert np.mean(coarse_rec) >= 0.15, coarse_rec
        assert np.mean(rerank_rec) >= 0.9, rerank_rec

    def test_deterministic(self, ray_session):
        X = _clustered(n=400)
        m1 = pq_train(_ds(X), m=4, n_codes=16, sample_rows=400)
        m2 = pq_train(_ds(X), m=4, n_codes=16, sample_rows=400)
        assert np.array_equal(m1["codebooks"], m2["codebooks"])

    def test_dim_not_divisible_raises(self, ray_session):
        import pytest
        X = _clustered(d=30)
        with pytest.raises(ValueError):
            pq_train(_ds(X), m=8, sample_rows=100)
