"""Unit oracles for the round-4 reconciliation / windowing batch:
table_diff, partition_fingerprints, windowed_dedup,
grouping_sets_aggregate, asof_join(tolerance_us=), dense top-N-with-ties
(each also oracle-checked end-to-end by q108-q114 in
tools/check_queries.py)."""
import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_table_diff_statuses(ray_session):
    from driftray.ops.reconcile import table_diff

    old = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, None]})
    new = pd.DataFrame({"k": [2, 3, 5, 4], "v": [20, 31, 50, None]})
    out = (table_diff(rd.from_pandas(old), rd.from_pandas(new), ["k"], ["v"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    got = dict(zip(out["k"], out["status"]))
    # k=1 deleted, k=3 changed (30->31), k=5 inserted; k=2 unchanged
    # suppressed; k=4 null==null -> unchanged suppressed
    assert got == {1: "deleted", 3: "changed", 5: "inserted"}


def test_table_diff_null_transitions(ray_session):
    from driftray.ops.reconcile import table_diff

    old = pd.DataFrame({"k": [1, 2], "v": [None, 7.0]})
    new = pd.DataFrame({"k": [1, 2], "v": [7.0, None]})
    out = table_diff(rd.from_pandas(old), rd.from_pandas(new),
                     ["k"], ["v"]).to_pandas()
    assert set(out["status"]) == {"changed"} and len(out) == 2


def test_table_diff_include_unchanged(ray_session):
    from driftray.ops.reconcile import table_diff

    old = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    out = table_diff(rd.from_pandas(old), rd.from_pandas(old), ["k"], ["v"],
                     include_unchanged=True).to_pandas()
    assert set(out["status"]) == {"unchanged"} and len(out) == 2


def test_partition_fingerprints_match_hashlib(ray_session):
    from driftray.ops.reconcile import partition_fingerprints

    df = pd.DataFrame({"id": np.arange(40, dtype=np.int64),
                       "txt": [f"doc {i % 7}" for i in range(40)]})
    out = (partition_fingerprints(rd.from_pandas(df), "id", "txt",
                                  n_buckets=4)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    df["b"] = df["id"] % 4
    df["sha"] = [hashlib.sha256(s.encode()).hexdigest() for s in df["txt"]]
    exp = df.groupby("b").agg(n_rows=("sha", "size"),
                              n_distinct=("sha", "nunique"),
                              min_sha=("sha", "min"),
                              max_sha=("sha", "max")).reset_index()
    assert out["n_rows"].tolist() == exp["n_rows"].tolist()
    assert out["n_distinct"].tolist() == exp["n_distinct"].tolist()
    assert out["min_sha"].tolist() == exp["min_sha"].tolist()
    assert out["max_sha"].tolist() == exp["max_sha"].tolist()


def test_windowed_dedup_first_per_day(ray_session):
    from driftray.ops.windowing import windowed_dedup

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, 20, size=n).astype(np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10 * 86400, size=n), unit="s"),
    })
    out = (windowed_dedup(rd.from_pandas(df), ["u"], "ts",
                          window="day", tie_cols=["id"], num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = (df.assign(d=df["ts"].dt.floor("D"))
           .sort_values(["ts", "id"], kind="mergesort")
           .drop_duplicates(["u", "d"], keep="first")
           .sort_values("id").reset_index(drop=True))
    np.testing.assert_array_equal(out["id"].to_numpy(),
                                  exp["id"].to_numpy())


def test_windowed_dedup_rejects_bad_window(ray_session):
    from driftray.ops.windowing import windowed_dedup

    with pytest.raises(ValueError, match="unsupported window"):
        windowed_dedup(rd.from_items([{"u": 1}]), ["u"], "ts",
                       window="week")


def test_grouping_sets_matches_pandas(ray_session):
    from driftray.ops.relational import grouping_sets_aggregate

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), 500),
        "b": rng.choice(list("pq"), 500),
        "v": rng.integers(0, 100, 500).astype(np.int64),
    })
    out = (grouping_sets_aggregate(rd.from_pandas(df),
                                   [["a"], ["b"], [], ["a", "b"]],
                                   "v", "s")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    rows = []
    for kept in (["a"], ["b"], [], ["a", "b"]):
        if kept:
            g = df.groupby(kept)["v"].sum().reset_index(name="s")
        else:
            g = pd.DataFrame({"s": [df["v"].sum()]})
        for c in ("a", "b"):
            if c not in g:
                g[c] = "ALL"
        rows.append(g[["a", "b", "s"]])
    exp = (pd.concat(rows, ignore_index=True)
           .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["a", "b", "s"]], exp,
                                  check_dtype=False)


def test_asof_tolerance_matches_merge_asof(ray_session):
    from driftray.ops.relational import asof_join

    rng = np.random.default_rng(7)
    nl, nr = 800, 300
    left = pd.DataFrame({
        "k": rng.integers(0, 12, nl).astype(np.int64),
        "lts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="s"),
        "lid": np.arange(nl, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 12, nr).astype(np.int64),
        "rts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, nr), unit="s"),
        "val": rng.normal(size=nr),
    })
    right = right.drop_duplicates(["k", "rts"])
    tol_us = 86_400 * 1_000_000
    out = (asof_join(rd.from_pandas(left), rd.from_pandas(right), ["k"],
                     "lts", "rts", ["val"], suffix="", strict=False,
                     tolerance_us=tol_us, num_partitions=4)
           .to_pandas().sort_values("lid").reset_index(drop=True))
    exp = pd.merge_asof(left.sort_values("lts"), right.sort_values("rts"),
                        left_on="lts", right_on="rts", by="k",
                        tolerance=pd.Timedelta(microseconds=tol_us),
                        direction="backward", allow_exact_matches=True
                        ).sort_values("lid").reset_index(drop=True)
    lhs, rhs = out["val"].to_numpy(), exp["val"].to_numpy()
    assert np.array_equal(np.isnan(lhs), np.isnan(rhs))
    np.testing.assert_allclose(lhs[~np.isnan(lhs)], rhs[~np.isnan(rhs)],
                               rtol=0, atol=0)


def test_dense_topk_query_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from driftray.pipelines.queries import q114_dense_topk

    sf = "/root/testdata/sf0.001"
    out = (q114_dense_topk(sf).to_pandas()
           .sort_values(["p_brand", "p_retailprice", "p_partkey"])
           .reset_index(drop=True))
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT p_partkey, p_brand, p_retailprice,
               CAST(DENSE_RANK() OVER (PARTITION BY p_brand
                   ORDER BY p_retailprice DESC) AS BIGINT) AS p_rank
        FROM read_parquet('{sf}/part.parquet')
        QUALIFY p_rank <= 3
        ORDER BY p_brand, p_retailprice, p_partkey""").df()
    pd.testing.assert_frame_equal(
        out[["p_partkey", "p_brand", "p_retailprice", "p_rank"]], exp,
        check_dtype=False)
