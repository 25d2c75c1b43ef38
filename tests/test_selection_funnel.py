"""Unit checks for distributed exact selection (ops/selection) and the
ordered conversion funnel (ops/windowing.funnel_counts).  The DuckDB
oracle sweep covers q84-q86 at sf0.01; here we verify against in-process
references on adversarial inputs (duplicates, tiny fetch thresholds that
force many narrowing rounds, ints above 2^53, unordered event streams)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ds(d) -> rd.Dataset:
    if isinstance(d, pd.DataFrame):
        return rd.from_pandas(d)
    return rd.from_arrow(pa.table(d))


# --- exact_kth / exact_quantile -------------------------------------------

@pytest.mark.parametrize("dtype", [np.int64, np.float64])
def test_exact_kth_matches_sort(ray_session, dtype):
    from driftray.ops.selection import exact_kth

    rng = np.random.default_rng(1)
    v = rng.integers(-1000, 1000, size=5000).astype(dtype)
    if dtype is np.float64:
        v = v / 7.0
    ds = _ds(pd.DataFrame({"v": v})).repartition(6)
    sv = np.sort(v)
    # tiny fetch threshold forces multiple narrowing rounds
    for k in [1, 2, 137, 2500, 4999, 5000]:
        got = exact_kth(ds, "v", k, n_buckets=16, fetch_threshold=8)
        assert got == sv[k - 1], (k, got, sv[k - 1])


def test_exact_kth_duplicate_heavy(ray_session):
    """A value repeated more than fetch_threshold times: the interval
    collapses to that value and is returned without a fetch."""
    from driftray.ops.selection import exact_kth

    v = np.concatenate([np.full(3000, 42, dtype=np.int64),
                        np.arange(100, dtype=np.int64)])
    ds = _ds(pd.DataFrame({"v": v})).repartition(4)
    sv = np.sort(v)
    for k in [1, 100, 101, 1500, 3100]:
        assert exact_kth(ds, "v", k, n_buckets=8,
                         fetch_threshold=16) == sv[k - 1]


def test_exact_kth_big_int64(ray_session):
    """Integer bucket math stays exact above 2^53 (float64 would round)."""
    from driftray.ops.selection import exact_kth

    base = 1 << 60
    v = base + np.arange(0, 4000, dtype=np.int64) * 3 + 1
    rng = np.random.default_rng(2)
    rng.shuffle(v)
    ds = _ds(pd.DataFrame({"v": v})).repartition(3)
    sv = np.sort(v)
    for k in [1, 777, 4000]:
        got = exact_kth(ds, "v", k, n_buckets=32, fetch_threshold=64)
        assert got == sv[k - 1]


def test_exact_kth_nulls_and_nans_excluded(ray_session):
    from driftray.ops.selection import exact_kth

    v = pd.Series([5.0, None, 1.0, np.nan, 3.0, 2.0, 4.0])
    ds = _ds(pd.DataFrame({"v": v}))
    assert exact_kth(ds, "v", 1) == 1.0
    assert exact_kth(ds, "v", 5) == 5.0
    with pytest.raises(ValueError, match="exceeds"):
        exact_kth(ds, "v", 6)


def test_exact_quantile_lower_interpolation(ray_session):
    from driftray.ops.selection import exact_quantile

    rng = np.random.default_rng(3)
    v = rng.normal(size=1001)
    ds = _ds(pd.DataFrame({"v": v})).repartition(4)
    sv = np.sort(v)
    for q in [0.0, 0.25, 0.5, 0.9, 1.0]:
        k0 = int(np.floor(q * (len(v) - 1)))
        assert exact_quantile(ds, "v", q, fetch_threshold=32) == sv[k0]


# --- funnel_counts ----------------------------------------------------------

def _funnel_oracle(df, stages, strict=True):
    counts = []
    reached = None
    for s in stages:
        rows = df[df["event_type"] == s]
        if reached is not None:
            rows = rows.merge(reached.rename("__p"), left_on="user_id",
                              right_index=True, how="inner")
            rows = rows[rows["ts"] > rows["__p"] if strict
                        else rows["ts"] >= rows["__p"]]
        reached = rows.groupby("user_id")["ts"].min()
        counts.append(len(reached))
    return counts


def test_funnel_counts_ordering_enforced(ray_session):
    from driftray.ops.windowing import funnel_counts

    ts = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: full ordered funnel
        (1, ts + 0 * s, "view"), (1, ts + 1 * s, "click"),
        (1, ts + 2 * s, "purchase"),
        # user 2: purchase BEFORE click — stops at click? no: view@0,
        # purchase@1, click@2 -> click after view counts, but no purchase
        # after click
        (2, ts + 0 * s, "view"), (2, ts + 1 * s, "purchase"),
        (2, ts + 2 * s, "click"),
        # user 3: only view
        (3, ts + 0 * s, "view"),
        # user 4: click without view — never enters
        (4, ts + 0 * s, "click"), (4, ts + 1 * s, "purchase"),
        # user 5: simultaneous view/click (strict > drops the click)
        (5, ts + 0 * s, "view"), (5, ts + 0 * s, "click"),
        (5, ts + 1 * s, "purchase"),
        # noise event types
        (1, ts + 5 * s, "error"), (2, ts, "signup"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    stages = ["view", "click", "purchase"]
    out = (funnel_counts(_ds(df).repartition(3), "user_id", "ts",
                         "event_type", stages, num_partitions=8)
           .to_pandas().sort_values("stage_idx"))
    assert out["stage"].tolist() == stages
    assert out["n_keys"].tolist() == [4, 2, 1]
    assert out["n_keys"].tolist() == _funnel_oracle(df, stages)


def test_funnel_counts_random_matches_oracle(ray_session):
    from driftray.ops.windowing import funnel_counts

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase", "error"], n),
    })
    stages = ["view", "click", "purchase"]
    out = (funnel_counts(_ds(df).repartition(5), "user_id", "ts",
                         "event_type", stages, num_partitions=8)
           .to_pandas().sort_values("stage_idx"))
    assert out["n_keys"].tolist() == _funnel_oracle(df, stages)


def test_funnel_counts_non_strict(ray_session):
    from driftray.ops.windowing import funnel_counts

    ts = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({"user_id": [1, 1], "ts": [ts, ts],
                       "event_type": ["view", "click"]})
    strict = funnel_counts(_ds(df), "user_id", "ts", "event_type",
                           ["view", "click"]).to_pandas()
    loose = funnel_counts(_ds(df), "user_id", "ts", "event_type",
                          ["view", "click"], strict=False).to_pandas()
    assert strict.sort_values("stage_idx")["n_keys"].tolist() == [1, 0]
    assert loose.sort_values("stage_idx")["n_keys"].tolist() == [1, 1]


# --- top_k tie-break --------------------------------------------------------

def test_top_k_tie_break_deterministic(ray_session):
    from driftray.ops.relational import top_k

    # many rows tied at the k boundary: tie_keys must pick the smallest ids
    df = pd.DataFrame({"score": [5.0] * 10 + [9.0, 8.0],
                       "id": list(range(10)) + [100, 101]})
    out = top_k(_ds(df).repartition(4), "score", 5,
                tie_keys=[("id", "ascending")]).to_pandas()
    assert out["id"].tolist() == [100, 101, 0, 1, 2]
