"""Deterministic hash sampling/splitting: reproducibility, growth
consistency, per-group exactness, and md5↔DuckDB predicate parity."""

import hashlib

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rds(ray_session):
    import ray.data as rd

    return rd


def _docs(n=1000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], size=n),
    })


class TestHashSample:
    def test_deterministic_and_fraction(self, rds):
        from driftray.ops.sampling import hash_sample

        df = _docs(4000)
        a = hash_sample(rds.from_pandas(df), "doc_id", 0.25).to_pandas()
        b = hash_sample(rds.from_pandas(df), "doc_id", 0.25).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        # Bernoulli(0.25) over 4000 keys: ±5 sigma band
        assert abs(len(a) - 1000) < 5 * np.sqrt(4000 * 0.25 * 0.75)

    def test_nested_fractions(self, rds):
        """A 10% sample is a subset of the 30% sample — same hash, higher
        threshold (the property that makes progressive sampling cheap)."""
        from driftray.ops.sampling import hash_sample

        df = _docs(2000)
        small = set(hash_sample(rds.from_pandas(df), "doc_id",
                                0.1).to_pandas()["doc_id"])
        big = set(hash_sample(rds.from_pandas(df), "doc_id",
                              0.3).to_pandas()["doc_id"])
        assert small <= big

    def test_matches_duckdb_predicate(self, rds):
        import duckdb

        from driftray.ops.sampling import fraction_to_hex, hash_sample

        df = _docs(500)
        ours = sorted(hash_sample(rds.from_pandas(df), "doc_id",
                                  0.2, seed=42).to_pandas()["doc_id"])
        thr = fraction_to_hex(0.2)
        con = duckdb.connect()
        con.register("d", df)
        theirs = [r[0] for r in con.sql(
            "SELECT doc_id FROM d WHERE "
            f"SUBSTR(MD5('42:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{thr}' "
            "ORDER BY doc_id").fetchall()]
        assert ours == theirs

    def test_fast_method(self, rds):
        from driftray.ops.sampling import hash_sample

        df = _docs(4000)
        out = hash_sample(rds.from_pandas(df), "doc_id", 0.5,
                          method="fast").to_pandas()
        assert abs(len(out) - 2000) < 5 * np.sqrt(4000 * 0.25)
        again = hash_sample(rds.from_pandas(df), "doc_id", 0.5,
                            method="fast").to_pandas()
        assert sorted(out["doc_id"]) == sorted(again["doc_id"])

    def test_fast_rejects_string_keys(self, rds):
        from driftray.ops.sampling import hash_sample

        ds = rds.from_pandas(pd.DataFrame({"k": ["a", "b"]}))
        with pytest.raises(Exception):
            hash_sample(ds, "k", 0.5, method="fast").to_pandas()


class TestHashSplit:
    def test_weights_and_determinism(self, rds):
        from driftray.ops.sampling import hash_split

        df = _docs(6000)
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = hash_split(rds.from_pandas(df), "doc_id", w).to_pandas()
        assert len(out) == len(df)
        frac = out["split"].value_counts(normalize=True)
        for name, target in w.items():
            assert abs(frac[name] - target) < 0.02
        # every key appears exactly once with exactly one label
        assert out["doc_id"].is_unique

    def test_growth_consistency(self, rds):
        """Keys keep their split when the corpus doubles — the property a
        stateful RNG split cannot give."""
        from driftray.ops.sampling import hash_split

        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        small = hash_split(rds.from_pandas(_docs(1000)), "doc_id",
                           w).to_pandas().set_index("doc_id")["split"]
        grown = hash_split(rds.from_pandas(_docs(2000)), "doc_id",
                           w).to_pandas().set_index("doc_id")["split"]
        assert (grown.loc[small.index] == small).all()

    def test_bad_weights_raise(self, rds):
        from driftray.ops.sampling import hash_split

        with pytest.raises(ValueError):
            hash_split(rds.from_pandas(_docs(10)), "doc_id",
                       {"a": 0.5, "b": 0.4})


class TestStratifiedSampleN:
    def test_exact_n_per_group(self, rds):
        from driftray.ops.sampling import stratified_sample_n

        df = _docs(900)
        out = stratified_sample_n(rds.from_pandas(df), "lang", "doc_id", 5)
        assert (out.groupby("lang").size() == 5).all()
        assert set(out["lang"]) == set(df["lang"])

    def test_matches_row_number_oracle(self, rds):
        from driftray.ops.sampling import stratified_sample_n

        df = _docs(300)
        out = stratified_sample_n(rds.from_pandas(df), "lang", "doc_id", 4)
        # oracle: smallest full-md5 digests per group, computed in pandas
        h = df["doc_id"].map(
            lambda k: hashlib.md5(f"42:{k}".encode()).hexdigest())
        exp = (df.assign(_h=h).sort_values(["_h", "doc_id"])
               .groupby("lang").head(4))
        assert (set(map(tuple, out[["lang", "doc_id"]].to_numpy()))
                == set(map(tuple, exp[["lang", "doc_id"]].to_numpy())))

    def test_small_group_returns_all(self, rds):
        from driftray.ops.sampling import stratified_sample_n

        df = pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["en", "en", "de"]})
        out = stratified_sample_n(rds.from_pandas(df), "lang", "doc_id", 10)
        assert len(out) == 3


class TestAdaptiveSpillThreshold:
    def test_explicit_wins(self):
        from driftray.ops.dedup import _resolve_spill_threshold

        assert _resolve_spill_threshold(0) == 0
        assert _resolve_spill_threshold(123) == 123

    def test_adaptive_scales_with_headroom(self, monkeypatch):
        import driftray.ops.dedup as dd

        monkeypatch.setattr(dd, "_available_memory_bytes",
                            lambda: 1 << 30)          # 1 GiB headroom
        small = dd._resolve_spill_threshold(None)
        monkeypatch.setattr(dd, "_available_memory_bytes",
                            lambda: 64 << 30)         # 64 GiB headroom
        big = dd._resolve_spill_threshold(None)
        assert small < big
        assert dd._SPILL_FLOOR <= small <= dd._SPILL_CEIL
        assert dd._SPILL_FLOOR <= big <= dd._SPILL_CEIL
        # 1 GiB * 10% / 128 B = 838,860 rows
        assert small == 838_860

    def test_tiny_headroom_clamps_to_floor(self, monkeypatch):
        import driftray.ops.dedup as dd

        monkeypatch.setattr(dd, "_available_memory_bytes",
                            lambda: 64 << 20)         # 64 MiB
        assert dd._resolve_spill_threshold(None) == dd._SPILL_FLOOR


class TestNegativePairs:
    def _emb(self, n=40, d=8, seed=3):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v for v in rng.normal(size=(n, d))]})

    def test_shape_determinism_no_self(self, ray_session):
        import ray.data as rd

        from driftray.ops.sampling import negative_pairs

        df = self._emb()
        out = (negative_pairs(rd.from_pandas(df).repartition(4), k=3,
                              seed=11).to_pandas()
               .sort_values(["vec_id", "neg_rank"], ignore_index=True))
        assert len(out) == 40 * 3
        assert (out.groupby("vec_id").size() == 3).all()
        assert (out["vec_id"] != out["neg_id"]).all()
        out2 = (negative_pairs(rd.from_pandas(df), k=3, seed=11)
                .to_pandas()
                .sort_values(["vec_id", "neg_rank"], ignore_index=True))
        pd.testing.assert_frame_equal(out, out2)

    def test_cosine_matches_numpy(self, ray_session):
        import ray.data as rd

        from driftray.ops.sampling import negative_pairs

        df = self._emb(n=20)
        X = np.stack(df["embedding"].to_numpy())
        out = negative_pairs(rd.from_pandas(df), k=2, seed=5).to_pandas()
        for _, r in out.iterrows():
            a, b = X[int(r["vec_id"])], X[int(r["neg_id"])]
            exp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(r["cos_sim"] - round(exp, 4)) < 1e-12

    def test_rejects_sparse_ids(self, ray_session):
        import pytest
        import ray.data as rd

        from driftray.ops.sampling import negative_pairs

        df = self._emb(n=10)
        df["vec_id"] = df["vec_id"] * 2      # holes
        with pytest.raises(ValueError, match="dense"):
            negative_pairs(rd.from_pandas(df), k=2)
