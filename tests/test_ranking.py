"""Unit oracles for ops/ranking (global_rank / ntile) — also
oracle-checked end-to-end vs DuckDB NTILE by q87."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _vals(n=5000, seed=7, dupes=True):
    rng = np.random.default_rng(seed)
    v = rng.normal(1000.0, 250.0, size=n)
    if dupes:                       # force tie groups across bucket math
        v[rng.integers(0, n, size=n // 10)] = 777.25
    return pd.DataFrame({"id": np.arange(n, dtype=np.int64), "v": v})


def _expected_rank(df):
    exp = df.sort_values(["v", "id"], ignore_index=True)
    exp["rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)
    return exp.sort_values("id").reset_index(drop=True)


def test_global_rank_matches_argsort(ray_session):
    from driftray.ops.ranking import global_rank

    df = _vals()
    out = (global_rank(rd.from_pandas(df), "v", ["id"], n_buckets=64,
                       num_partitions=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = _expected_rank(df)
    np.testing.assert_array_equal(out["rank"].to_numpy(),
                                  exp["rank"].to_numpy())


def test_global_rank_integer_column_exact(ray_session):
    from driftray.ops.ranking import global_rank

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": np.arange(3000, dtype=np.int64),
                       "v": rng.integers(-50, 50, size=3000)})
    out = (global_rank(rd.from_pandas(df), "v", ["id"], n_buckets=16,
                       num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = _expected_rank(df)
    np.testing.assert_array_equal(out["rank"].to_numpy(),
                                  exp["rank"].to_numpy())


def test_global_rank_single_value_column(ray_session):
    """lo == hi: everything in one bucket — ranks are the tiebreak order."""
    from driftray.ops.ranking import global_rank

    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "v": np.full(100, 3.5)})
    out = (global_rank(rd.from_pandas(df), "v", ["id"], n_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    np.testing.assert_array_equal(out["rank"].to_numpy(),
                                  np.arange(1, 101, dtype=np.int64))


@pytest.mark.parametrize("n,tiles", [(10, 4), (12, 4), (3, 5), (1000, 7)])
def test_ntile_matches_sql_semantics(ray_session, n, tiles):
    """Standard NTILE: sizes differ by ≤1, larger tiles first."""
    from driftray.ops.ranking import ntile

    rng = np.random.default_rng(n * 31 + tiles)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "v": rng.normal(size=n)})
    out = (ntile(rd.from_pandas(df), "v", ["id"], tiles, n_buckets=16,
                 num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.sort_values(["v", "id"], ignore_index=True)
    q, r = divmod(n, tiles)
    sizes = [q + 1] * r + [q] * (tiles - r)
    tile_seq = np.repeat(np.arange(1, tiles + 1), sizes)[:n]
    exp["tile"] = tile_seq
    exp = exp.sort_values("id").reset_index(drop=True)
    np.testing.assert_array_equal(out["tile"].to_numpy(),
                                  exp["tile"].to_numpy())


def test_global_rank_rejects_nulls(ray_session):
    from driftray.ops.ranking import global_rank

    df = pd.DataFrame({"id": [1, 2, 3], "v": [1.0, None, 3.0]})
    with pytest.raises(Exception, match="non-null"):
        global_rank(rd.from_pandas(df), "v", ["id"]).materialize()


def test_grouped_top_k_tie_cols_deterministic(ray_session):
    from driftray.ops.grouped import grouped_top_k

    # every row ties on v — without tie_cols the k-boundary is arbitrary
    df = pd.DataFrame({"k": np.repeat(np.arange(5), 20).astype(np.int64),
                       "id": np.arange(100, dtype=np.int64),
                       "v": np.ones(100)})
    out = grouped_top_k(rd.from_pandas(df), ["k"], "v", 3, tie_cols=["id"])
    exp = (df.sort_values(["v", "id"], ascending=[False, True])
           .groupby("k", sort=False).head(3))
    assert sorted(out["id"].tolist()) == sorted(exp["id"].tolist())


def test_grouped_rank_matches_pandas(ray_session):
    """Hot-group rank: few giant groups, ties included — min and max."""
    from driftray.ops.ranking import grouped_rank

    rng = np.random.default_rng(23)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], size=n),
        "v": np.round(rng.normal(10, 3, size=n), 1),   # forces ties
    })
    for method in ("min", "max"):
        out = (grouped_rank(rd.from_pandas(df), ["g"], "v",
                            out_col="r", method=method, n_buckets=32,
                            num_partitions=8)
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = df.groupby("g")["v"].rank(method=method).astype(np.int64)
        np.testing.assert_array_equal(out["r"].to_numpy(), exp.to_numpy())


def test_grouped_rank_integer_values(ray_session):
    from driftray.ops.ranking import grouped_rank

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.choice([0, 1], size=1000).astype(np.int64),
                       "v": rng.integers(0, 20, size=1000)})
    out = grouped_rank(rd.from_pandas(df), ["g"], "v", out_col="r",
                       n_buckets=4, num_partitions=4).to_pandas()
    exp = (out.groupby("g")["v"].rank(method="min").astype(np.int64))
    np.testing.assert_array_equal(out["r"].to_numpy(), exp.to_numpy())


def test_global_rank_rejects_nan(ray_session):
    from driftray.ops.ranking import global_rank

    import pyarrow as pa

    # pandas NaN arrives as Arrow null (null branch); an Arrow-native
    # float NaN (e.g. straight from parquet) hits the NaN branch
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([1.0, float("nan"), 3.0], pa.float64())})
    with pytest.raises(Exception, match="NaN-free"):
        global_rank(rd.from_arrow(t), "v", ["id"]).materialize()
    df = pd.DataFrame({"id": [1, 2], "v": [1.0, None]})
    with pytest.raises(Exception, match="non-null"):
        global_rank(rd.from_pandas(df), "v", ["id"]).materialize()


def test_grouped_rank_minmax_single_pass(ray_session):
    from driftray.ops.ranking import grouped_rank

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"g": rng.choice(["x", "y"], size=800),
                       "v": np.round(rng.normal(size=800), 1)})
    out = grouped_rank(rd.from_pandas(df), ["g"], "v", out_col="r",
                       method="minmax", n_buckets=16,
                       num_partitions=4).to_pandas()
    exp_min = out.groupby("g")["v"].rank(method="min").astype(np.int64)
    exp_max = out.groupby("g")["v"].rank(method="max").astype(np.int64)
    np.testing.assert_array_equal(out["r_min"].to_numpy(), exp_min.to_numpy())
    np.testing.assert_array_equal(out["r_max"].to_numpy(), exp_max.to_numpy())
