"""Round-6 operator batch: exact edit-distance fuzzy dedup, A-Res
weighted sampling, GROUP BY CUBE, random-hyperplane LSH ANN.  Unit
checks against in-process references (the DuckDB oracle sweep lives in
tools/check_queries.py: q80-q83, nq_lsh_ann)."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ds(d) -> rd.Dataset:
    if isinstance(d, pd.DataFrame):
        return rd.from_pandas(d)
    return rd.from_arrow(pa.table(d))


# --- fuzzy (edit-distance) dedup ---------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1,
                           prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[len(a)]


def _brute_pairs(texts: dict[int, str], d: int) -> set:
    return {(a, b) for a, b in itertools.combinations(sorted(texts), 2)
            if _lev(texts[a], texts[b]) <= d}


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_dedup_matches_brute_force(ray_session, max_dist):
    from driftray.ops.dedup import fuzzy_dedup_pairs

    rng = np.random.default_rng(7)
    base = ["gradient", "descent", "transformer", "attention", "latent",
            "diffusion", "sampler", "encoder"]
    texts = {}
    i = 0
    for w in base:
        texts[i] = w; i += 1
        # planted typos: delete, substitute, insert, double edit
        texts[i] = w[1:]; i += 1
        texts[i] = "x" + w[1:]; i += 1
        texts[i] = w + "s"; i += 1
        texts[i] = "x" + w[1:-1] + "y"; i += 1
    # noise rows far from everything
    for _ in range(20):
        texts[i] = "".join(rng.choice(list("qwertyuiop"), size=12)); i += 1

    ds = _ds(pd.DataFrame({"doc_id": list(texts),
                           "text": [texts[k] for k in texts]})).repartition(4)
    out = fuzzy_dedup_pairs(ds, max_dist=max_dist,
                            num_partitions=8).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    want = _brute_pairs(texts, max_dist)
    assert got == want
    # distances are exact, not just <= max_dist
    for _, r in out.iterrows():
        assert r["dist"] == _lev(texts[r["id_a"]], texts[r["id_b"]])


def test_fuzzy_dedup_rejects_long_keys(ray_session):
    from driftray.ops.dedup import fuzzy_dedup_pairs

    ds = _ds({"doc_id": [1], "text": ["y" * 100]})
    with pytest.raises(Exception, match="short-string"):
        fuzzy_dedup_pairs(ds).to_pandas()


# --- weighted sampling (A-Res) ------------------------------------------

def _ares_oracle(keys, weights, k, seed=42):
    from driftray.ops.sampling import _unit_hash

    u = _unit_hash(np.asarray(keys), seed, "md5")
    w = np.asarray(weights, dtype=np.float64)
    pri = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
    order = sorted(range(len(keys)), key=lambda i: (-pri[i], keys[i]))
    return [keys[i] for i in order[:k] if pri[i] >= 0]


def test_weighted_sample_matches_oracle(ray_session):
    from driftray.ops.sampling import weighted_sample

    rng = np.random.default_rng(3)
    n = 500
    keys = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 100, size=n).astype(np.float64)
    w[::7] = 0.0          # never selected
    ds = _ds(pd.DataFrame({"k": keys, "w": w})).repartition(5)
    out = weighted_sample(ds, "k", "w", k=40)
    assert out["k"].tolist() == _ares_oracle(keys.tolist(), w, 40)
    assert not set(out["k"]) & set(keys[::7])


def test_weighted_sample_k_exceeds_positive_rows(ray_session):
    from driftray.ops.sampling import weighted_sample

    ds = _ds({"k": [1, 2, 3], "w": [1.0, 0.0, 2.0]})
    out = weighted_sample(ds, "k", "w", k=10)
    assert set(out["k"]) == {1, 3}


def test_weighted_sample_heavier_more_likely(ray_session):
    """Statistical sanity: across seeds, weight-100 keys beat weight-1."""
    from driftray.ops.sampling import weighted_sample

    n = 200
    keys = np.arange(n, dtype=np.int64)
    w = np.where(keys < 20, 100.0, 1.0)
    ds = _ds(pd.DataFrame({"k": keys, "w": w}))
    heavy = 0
    for seed in range(5):
        out = weighted_sample(ds, "k", "w", k=20, seed=seed)
        heavy += int((out["k"] < 20).sum())
    assert heavy / (5 * 20) > 0.5      # heavy 10% of keys win most slots


# --- GROUP BY CUBE -------------------------------------------------------

def test_cube_aggregate_matches_pandas(ray_session):
    from driftray.ops.relational import cube_aggregate

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], 300),
                       "b": rng.choice(["p", "q"], 300),
                       "v": rng.normal(size=300)})
    out = (cube_aggregate(_ds(df).repartition(4), ["a", "b"], "v", "s")
           .to_pandas())
    assert len(out) == 3 * 2 + 3 + 2 + 1

    def expect(sub):
        if sub:
            return df.groupby(list(sub))["v"].sum()
        return df["v"].sum()

    fine = out[(out["a"] != "ALL") & (out["b"] != "ALL")]
    for _, r in fine.iterrows():
        assert np.isclose(r["s"], expect(["a", "b"])[(r["a"], r["b"])])
    for _, r in out[(out["a"] != "ALL") & (out["b"] == "ALL")].iterrows():
        assert np.isclose(r["s"], expect(["a"])[r["a"]])
    for _, r in out[(out["a"] == "ALL") & (out["b"] != "ALL")].iterrows():
        assert np.isclose(r["s"], expect(["b"])[r["b"]])
    grand = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert len(grand) == 1 and np.isclose(grand["s"].iloc[0], expect(()))


# --- LSH ANN --------------------------------------------------------------

def test_lsh_topk_recall_vs_brute(ray_session):
    from driftray.ops.ann import brute_force_topk, lsh_topk

    rng = np.random.default_rng(5)
    dim, n = 16, 2000
    # clustered data so neighbors are meaningful
    centers = rng.normal(size=(10, dim)) * 3
    X = centers[rng.integers(0, 10, n)] + rng.normal(size=(n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X.astype(np.float32))})
    ds = _ds(df).repartition(4)
    Q = X[:5]
    exact = brute_force_topk(ds, Q, k=10).to_pandas()
    approx = lsh_topk(ds, Q, k=10, n_tables=24, n_bits=6).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7, recalls


def test_lsh_topk_self_hit(ray_session):
    """A query identical to an indexed vector always collides with it
    (identical bucket bits in every table) and scores ~1.0 first."""
    from driftray.ops.ann import lsh_topk

    rng = np.random.default_rng(9)
    X = rng.normal(size=(300, 8))
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                       "embedding": list(X.astype(np.float32))})
    out = lsh_topk(_ds(df), X[7:8].astype(np.float32), k=3,
                   n_tables=8, n_bits=6).to_pandas()
    assert out.iloc[0]["vec_id"] == 7
    assert out.iloc[0]["score"] > 0.999
