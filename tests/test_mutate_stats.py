"""Unit oracles for the round-4 mutation / layout / stats batch:
apply_changes (MERGE), scd2_intervals, morton_key / zorder_sort /
pruning_fraction, grouped_ols, mutual_information (q120-q124 twins)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_apply_changes_upsert_delete(ray_session):
    from driftray.ops.mutate import apply_changes

    snap = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    ch = pd.DataFrame({"k": [2, 3, 5], "v": [21, 0, 50],
                       "op": ["upsert", "delete", "upsert"]})
    out = (apply_changes(rd.from_pandas(snap), rd.from_pandas(ch),
                         ["k"], ["v"], num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert dict(zip(out["k"], out["v"])) == {1: 10, 2: 21, 4: 40, 5: 50}


def test_apply_changes_seq_last_wins(ray_session):
    from driftray.ops.mutate import apply_changes

    snap = pd.DataFrame({"k": [1], "v": [1]})
    ch = pd.DataFrame({"k": [1, 1, 1], "v": [5, 7, 9],
                       "op": ["upsert", "delete", "upsert"],
                       "seq": [3, 1, 2]})  # seq 3 (v=5) is last
    out = apply_changes(rd.from_pandas(snap), rd.from_pandas(ch),
                        ["k"], ["v"], seq_col="seq",
                        num_partitions=2).to_pandas()
    assert out["v"].tolist() == [5]
    # ... and a delete as the max seq removes the key
    ch2 = ch.assign(seq=[1, 3, 2])
    out2 = apply_changes(rd.from_pandas(snap), rd.from_pandas(ch2),
                         ["k"], ["v"], seq_col="seq",
                         num_partitions=2).to_pandas()
    assert len(out2) == 0


def test_apply_changes_rejects_bad_op(ray_session):
    import ray.exceptions

    from driftray.ops.mutate import apply_changes

    snap = pd.DataFrame({"k": [1], "v": [1]})
    ch = pd.DataFrame({"k": [1], "v": [2], "op": ["merge"]})
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        apply_changes(rd.from_pandas(snap), rd.from_pandas(ch),
                      ["k"], ["v"], num_partitions=2).materialize()


def test_scd2_intervals_collapse(ray_session):
    from driftray.ops.mutate import scd2_intervals

    ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                         "2024-01-04", "2024-01-05"])
    log = pd.DataFrame({"k": [1] * 5, "attr": ["a", "a", "b", "b", "a"],
                        "ts": ts, "i": range(5)})
    out = (scd2_intervals(rd.from_pandas(log), ["k"], "ts", ["attr"],
                          tie_cols=["i"], num_partitions=2)
           .to_pandas().sort_values("valid_from").reset_index(drop=True))
    assert out["attr"].tolist() == ["a", "b", "a"]
    assert out["valid_from"].tolist() == [ts[0], ts[2], ts[4]]
    assert out["valid_to"].tolist()[:2] == [ts[2], ts[4]]
    assert pd.isna(out["valid_to"][2])


def test_scd2_no_collapse_keeps_every_row(ray_session):
    from driftray.ops.mutate import scd2_intervals

    ts = pd.to_datetime(["2024-01-01", "2024-01-02"])
    log = pd.DataFrame({"k": [7, 7], "attr": ["x", "x"], "ts": ts})
    out = scd2_intervals(rd.from_pandas(log), ["k"], "ts", ["attr"],
                         collapse=False, num_partitions=2).to_pandas()
    assert len(out) == 2


def test_morton_key_interleaves_bits():
    from driftray.ops.layout import morton_key

    # 2 bits/col, 2 cols: (x=3, y=0) -> 0b0101, (x=0, y=3) -> 0b1010
    x = np.array([3.0, 0.0])
    y = np.array([0.0, 3.0])
    z = morton_key([x, y], [0, 0], [3, 3], bits=2)
    assert z.tolist() == [0b0101, 0b1010]
    with pytest.raises(ValueError, match="exceeds int64"):
        morton_key([x, y], [0, 0], [3, 3], bits=32)


def test_zorder_improves_pruning_on_both_columns(ray_session, tmp_path):
    from driftray.ops.layout import pruning_fraction, zorder_sort

    rng = np.random.default_rng(23)
    n = 40_000
    df = pd.DataFrame({"a": rng.integers(0, 10_000, n).astype(np.int64),
                       "b": rng.integers(0, 10_000, n).astype(np.int64)})
    base = str(tmp_path / "base.parquet")
    pq.write_table(pa.Table.from_pandas(df), base, row_group_size=2500)

    zdf = (zorder_sort(rd.from_pandas(df), ["a", "b"], bits=12)
           .to_pandas())
    zpath = str(tmp_path / "z.parquet")
    pq.write_table(pa.Table.from_pandas(zdf), zpath, row_group_size=2500)

    for col in ("a", "b"):
        before = pruning_fraction([base], col, 1000, 1999)
        after = pruning_fraction([zpath], col, 1000, 1999)
        # random layout prunes ~nothing; z-order must prune most groups
        assert before["frac_groups_pruned"][0] <= 0.2
        assert after["frac_groups_pruned"][0] >= 0.5, col
    # layout never changes answers
    assert sorted(zdf["a"] * 100_000 + zdf["b"]) == \
        sorted(df["a"] * 100_000 + df["b"])


def test_grouped_ols_matches_numpy(ray_session):
    from driftray.ops.stats import grouped_ols

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r"], n),
        "x": rng.normal(10, 3, n),
    })
    df["y"] = 2.5 * df["x"] + rng.normal(0, 1, n) \
        + df["g"].map({"p": 0, "q": 5, "r": -2})
    out = (grouped_ols(rd.from_pandas(df), "g", "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for i, g in enumerate(["p", "q", "r"]):
        sub = df[df["g"] == g]
        slope, icept = np.polyfit(sub["x"], sub["y"], 1)
        r = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert out["n"][i] == len(sub)
        assert abs(out["slope"][i] - slope) < 1e-8
        assert abs(out["intercept"][i] - icept) < 1e-8
        assert abs(out["r2"][i] - r * r) < 1e-8


def test_grouped_ols_degenerate_group_nulls(ray_session):
    from driftray.ops.stats import grouped_ols

    df = pd.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 1.0, 2.0],
                       "y": [3.0, 4.0, 5.0]})
    out = (grouped_ols(rd.from_pandas(df), "g", "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert np.isnan(out["slope"][0]) and np.isnan(out["r2"][0])


def test_mutual_information_matches_manual(ray_session):
    from driftray.ops.stats import mutual_information

    rng = np.random.default_rng(41)
    n = 5000
    a = rng.integers(0, 4, n)
    b = np.where(rng.random(n) < 0.7, a % 3, rng.integers(0, 3, n))
    df = pd.DataFrame({"a": [f"a{v}" for v in a],
                       "b": [f"b{v}" for v in b]})
    out = mutual_information(rd.from_pandas(df), "a", "b")
    joint = df.groupby(["a", "b"]).size()
    pa_ = df["a"].value_counts() / n
    pb_ = df["b"].value_counts() / n
    mi = sum((c / n) * np.log2((c / n) / (pa_[ka] * pb_[kb]))
             for (ka, kb), c in joint.items())
    assert out["n"][0] == n
    assert abs(out["mi_bits"][0] - mi) < 1e-9
    # independent columns -> MI ~ 0
    df2 = pd.DataFrame({"a": [f"a{v}" for v in rng.integers(0, 3, n)],
                        "b": [f"b{v}" for v in rng.integers(0, 3, n)]})
    out2 = mutual_information(rd.from_pandas(df2), "a", "b")
    assert out2["mi_bits"][0] < 0.01


def test_grouped_mad_outliers_matches_numpy(ray_session):
    from driftray.ops.stats import grouped_mad_outliers

    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b", "c"], size=400)
    v = rng.integers(100, 200, size=400).astype("int64")
    # plant gross outliers in group a
    idx = np.flatnonzero(g == "a")[:5]
    v[idx] = 10_000
    df = pd.DataFrame({"g": g, "v": v})
    out = (grouped_mad_outliers(rd.from_pandas(df), "g", "v", k=3.0,
                                num_partitions=4)
           .to_pandas().sort_values("g").reset_index(drop=True))

    for _, row in out.iterrows():
        vals = df.loc[df["g"] == row["g"], "v"].to_numpy(dtype=np.float64)
        med = np.median(vals)
        dev = np.abs(vals - med)
        mad = np.median(dev)
        assert row["n"] == len(vals)
        assert row["n_outliers"] == int((dev > 3.0 * mad).sum())
        assert row["median"] == med
        assert row["mad"] == mad
    # the planted spikes are caught
    a = out.loc[out["g"] == "a"].iloc[0]
    assert a["n_outliers"] >= 5


def test_grouped_mad_outliers_nulls_excluded(ray_session):
    from driftray.ops.stats import grouped_mad_outliers

    df = pd.DataFrame({"g": ["x"] * 6,
                       "v": [1.0, 2.0, 3.0, np.nan, 2.0, 100.0]})
    out = grouped_mad_outliers(rd.from_pandas(df), "g", "v", k=3.0,
                               num_partitions=2).to_pandas()
    assert out.iloc[0]["n"] == 5  # NaN row excluded
    assert out.iloc[0]["n_outliers"] == 1  # the 100.0
