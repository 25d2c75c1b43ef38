"""Round-3 regression tests: ADVICE fixes + vectorized multi-group kernel."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# -- ADVICE: date32/time32 hash regression ------------------------------------

def test_hash_keys_date32_time32():
    from driftray.checks import hash_keys

    t = pa.table({
        "d": pa.array([datetime.date(2020, 1, 1), None,
                       datetime.date(2021, 6, 15)], type=pa.date32()),
        "t32": pa.array([3600, None, 7200], type=pa.time32("s")),
        "d64": pa.array([datetime.date(2020, 1, 1), datetime.date(2020, 1, 2),
                         None], type=pa.date64()),
    })
    h = hash_keys(t, ["d", "t32", "d64"])
    assert h.dtype == np.uint64 and len(h) == 3
    # null-stability: the non-null rows hash identically without the nulls
    t2 = pa.table({c: t[c].take(pa.array([0])) for c in t.column_names})
    h2 = hash_keys(t2, ["d", "t32", "d64"])
    assert h2[0] == h[0]


def test_hash_keys_date32_in_dedup_exact():
    from driftray.ops.relational import dedup_exact

    df = pd.DataFrame({
        "day": pd.to_datetime(["2020-01-01", "2020-01-01", "2020-01-02"]).date,
        "v": [1, 2, 3],
        "ord": [10, 5, 1],
    })
    t = pa.table({"day": pa.array(df["day"], type=pa.date32()),
                  "v": pa.array(df["v"]), "ord": pa.array(df["ord"])})
    out = dedup_exact(rd.from_arrow(t), ["day"], "ord").to_pandas()
    assert len(out) == 2
    assert set(out.loc[out["day"] == datetime.date(2020, 1, 1), "v"]) == {2}


# -- ADVICE: empty-batch band exploder ----------------------------------------

def test_band_exploder_empty_batch():
    from driftray.ops.dedup import _BandExploder

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "sig": pd.Series([], dtype=object)})
    out = _BandExploder("doc_id", 8)(empty)
    assert len(out) == 0 and list(out.columns) == ["bh", "doc_id"]


def test_minhash_after_selective_filter():
    """The nq_curation shape: a quality filter can empty some blocks."""
    from driftray.ops.dedup import minhash_lsh_dedup

    texts = [f"doc {i} " + " ".join(f"w{j}" for j in range(30)) for i in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40), "text": texts,
                       "keep": [i % 2 == 0 for i in range(40)]})
    ds = (rd.from_pandas(df).repartition(8)
          .map_batches(lambda b: b[b["keep"]], batch_format="pandas"))
    out = minhash_lsh_dedup(ds, jaccard_threshold=0.8).to_pandas()
    assert len(out) == 20


# -- CC: vectorized forward + pointer doubling + convergence ------------------

def test_connected_components_chain():
    """A chain graph (the star-pairing shape) must converge via pointer
    doubling and produce one component labeled by its min node."""
    from driftray.ops.dedup import connected_components

    n = 64
    edges = pd.DataFrame({"src": np.arange(n - 1), "dst": np.arange(1, n)})
    labels = connected_components(rd.from_pandas(edges), num_partitions=4,
                                  max_iters=10).to_pandas()
    assert len(labels) == n
    assert set(labels["label"]) == {0}


def test_connected_components_matches_union_find():
    from driftray.ops.dedup import _union_find_clusters, connected_components

    rng = np.random.default_rng(7)
    edges = pd.DataFrame({"src": rng.integers(0, 40, 60),
                          "dst": rng.integers(0, 40, 60)})
    labels = connected_components(rd.from_pandas(edges), num_partitions=4
                                  ).to_pandas()
    clusters, _ = _union_find_clusters(
        list(zip(edges["src"].tolist(), edges["dst"].tolist())))
    # same partition of nodes into components
    got = labels.set_index("node")["label"].to_dict()
    for a in got:
        for b in got:
            same_uf = (clusters.get(a, a) == clusters.get(b, b))
            assert (got[a] == got[b]) == same_uf, (a, b)


def test_connected_components_nonconvergence_raises():
    from driftray.ops.dedup import connected_components

    n = 40  # chain needs >1 round even with doubling
    edges = pd.DataFrame({"src": np.arange(n - 1), "dst": np.arange(1, n)})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(edges), num_partitions=4,
                             max_iters=1)


# -- grouped kernel -----------------------------------------------------------

def test_partitioned_group_apply_disjoint_and_complete():
    from driftray.ops.grouped import partitioned_group_apply

    df = pd.DataFrame({"k": np.arange(1000) % 97, "v": np.arange(1000)})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["v"].sum().reset_index()

    out = partitioned_group_apply(rd.from_pandas(df).repartition(6), ["k"],
                                  per_part, num_partitions=8).to_pandas()
    expect = df.groupby("k")["v"].sum().reset_index()
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect.sort_values("k").reset_index(drop=True))


def test_grouped_quantile_exact():
    from driftray.ops.grouped import grouped_quantile

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 50, 5000),
                       "x": rng.normal(size=5000)})
    out = grouped_quantile(rd.from_pandas(df).repartition(4), ["g"], "x",
                           q=0.5, out_col="med", num_partitions=8).to_pandas()
    expect = df.groupby("g")["x"].median()
    got = out.set_index("g")["med"].sort_index()
    assert np.allclose(got.to_numpy(), expect.sort_index().to_numpy())


def test_grouped_top_k_hot_group():
    from driftray.ops.grouped import grouped_top_k

    # one hot key with 10k rows + many small keys: no single worker should
    # need the hot group whole (behavioral check is exactness of the result)
    df = pd.DataFrame({"s": ["hot"] * 10000 + [f"k{i}" for i in range(50)],
                       "o": np.concatenate([np.arange(10000), np.arange(50)])})
    out = grouped_top_k(rd.from_pandas(df).repartition(8), ["s"], "o", k=3)
    expect = (df.sort_values("o", ascending=False).groupby("s").head(3))
    assert len(out) == len(expect)
    got = out.sort_values(["s", "o"]).reset_index(drop=True)
    exp = expect.sort_values(["s", "o"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_asof_join_big_int64_values_exact():
    """ADVICE: int64 right values above 2^53 must survive the unmatched-null
    path bit-exact (no float64 round-trip)."""
    from driftray.ops.relational import asof_join

    big = (1 << 60) + 12345
    left = pd.DataFrame({"k": [1, 1, 2], "ts": pd.to_datetime(
        ["2020-01-01 00:00:05", "2020-01-01 00:00:01", "2020-01-01 00:00:05"])})
    right = pd.DataFrame({"k": [1], "rts": pd.to_datetime(
        ["2020-01-01 00:00:02"]), "val": np.array([big], dtype=np.int64)})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right), ["k"],
                    "ts", "rts", ["val"]).to_pandas()
    m = out.set_index(["k", "ts"])["val_asof"]
    assert m[(1, pd.Timestamp("2020-01-01 00:00:05"))] == big
    assert pd.isna(m[(1, pd.Timestamp("2020-01-01 00:00:01"))])
    assert pd.isna(m[(2, pd.Timestamp("2020-01-01 00:00:05"))])


# -- CC auto-wiring: forced spill path ---------------------------------------

def _dup_corpus(n=60, n_dups=12):
    rng = np.random.default_rng(11)
    texts = []
    for i in range(n):
        words = [f"w{rng.integers(0, 500)}" for _ in range(40)]
        texts.append(" ".join(words))
    for i in range(n_dups):  # plant near-dups of doc i as doc n+i
        texts.append(texts[i] + " tail")
    return pd.DataFrame({"doc_id": np.arange(n + n_dups),
                         "text": texts})


def test_minhash_spill_path_matches_driver_path():
    from driftray.ops.dedup import minhash_lsh_dedup

    df = _dup_corpus()
    ds = rd.from_pandas(df).repartition(4)
    driver = (minhash_lsh_dedup(ds, jaccard_threshold=0.8)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    spilled = (minhash_lsh_dedup(ds, jaccard_threshold=0.8,
                                 spill_threshold=0, spill_partitions=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert driver["is_duplicate"].sum() > 0  # the fixture plants dups
    pd.testing.assert_frame_equal(
        driver[["doc_id", "cluster_id", "is_duplicate", "cluster_size"]],
        spilled[["doc_id", "cluster_id", "is_duplicate", "cluster_size"]],
        check_dtype=False)


def test_minhash_spill_requires_int_ids():
    from driftray.ops.dedup import minhash_lsh_dedup

    df = _dup_corpus(10, 2)
    df["doc_id"] = df["doc_id"].astype(str)
    ds = rd.from_pandas(df)
    with pytest.raises(NotImplementedError, match="integer ids"):
        minhash_lsh_dedup(ds, spill_threshold=0)
