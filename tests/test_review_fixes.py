"""Regression tests for the round-2 self-review findings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from driftray.checks import hash_keys


@pytest.fixture(scope="module")
def rds(ray_session):
    import ray.data as rd

    return rd


class TestDedupExactNullBlock:
    def test_int_key_with_null_in_block_still_dedups(self, rds):
        """A pandas batch roundtrip would promote the null-bearing block's
        int64 keys to float64 and silently keep its duplicates."""
        from driftray.ops.relational import dedup_exact

        t1 = pa.table({"key": pa.array([42, 7], pa.int64()),
                       "ord": pa.array([1, 2], pa.int64())})
        t2 = pa.table({"key": pa.array([42, None], pa.int64()),
                       "ord": pa.array([3, 4], pa.int64())})
        out = dedup_exact(rds.from_arrow([t1, t2]), ["key"], "ord").to_pandas()
        k42 = out[out["key"] == 42]
        assert len(k42) == 1 and int(k42["ord"].iloc[0]) == 1


class TestUint64Keys:
    def test_high_bit_uint64_hashes(self):
        t = pa.table({"k": pa.array([2**63 + 5, 1, None], pa.uint64())})
        h = hash_keys(t, ["k"])
        assert len(h) == 3
        clean = pa.table({"k": pa.array([2**63 + 5], pa.uint64())})
        assert hash_keys(clean, ["k"])[0] == h[0]  # null-stable too


class TestDuplicateValuesSortedExact:
    def test_all_unique_returns_empty(self, rds):
        from driftray.ops.relational import duplicate_values_sorted

        df = pd.DataFrame({"v": np.arange(5000, dtype=np.int64)})
        out = duplicate_values_sorted(rds.from_pandas(df), "v",
                                      sort_partitions=8)
        assert len(out) == 0  # exact: no boundary false-positives

    def test_cross_partition_duplicates_found(self, rds):
        from driftray.ops.relational import duplicate_values_sorted

        rng = np.random.default_rng(33)
        v = np.arange(10000, dtype=np.int64)
        v[7777] = v[11]   # duplicate far apart in input order
        v[123] = v[9999]
        rng.shuffle(v)
        out = set(duplicate_values_sorted(
            rds.from_pandas(pd.DataFrame({"v": v})), "v",
            sort_partitions=16).tolist())
        assert out == {11, 9999}


class TestTokenBudgetEmptyInput:
    def test_empty_dataset_returns_empty(self, rds):
        from driftray.ops.curation import token_budget_select

        df = pd.DataFrame({"g": pd.Series([], dtype="object"),
                           "oid": pd.Series([], dtype="int64"),
                           "tok": pd.Series([], dtype="int64")})
        out = token_budget_select(rds.from_pandas(df), "g", "tok", "oid",
                                  budget=100)
        assert out.count() == 0


# --- round-4 self-review fixes (code-review over 9b32d28..HEAD) ------------


class TestCompactionResume:
    def test_partial_debris_cleared(self, ray_session, tmp_path):
        """A crashed attempt's stray files (no _DONE) must not duplicate
        rows on re-run."""
        import os
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import duckdb
        from driftray.ops.layout import compact_partitions
        src = tmp_path / "in" / "k=0"
        src.mkdir(parents=True)
        t = pa.table({"v": pa.array(np.arange(1000), pa.int64())})
        pq.write_table(t, str(src / "a.parquet"))
        # simulate a dead mid-write attempt: partial output, NO _DONE
        dst = tmp_path / "out" / "k=0"
        dst.mkdir(parents=True)
        pq.write_table(t.slice(0, 100), str(dst / "stale_partial.parquet"))
        compact_partitions(str(tmp_path / "in"), str(tmp_path / "out"),
                           partition_col="k")
        con = duckdb.connect()
        n, sv = con.sql(
            f"SELECT count(*), sum(v) FROM '{dst}/*.parquet'").fetchone()
        assert (n, sv) == (1000, 999 * 1000 // 2)


class TestZscoreOverflowGuard:
    def test_large_values_raise(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import pytest
        import ray.data as rd
        from driftray.ops.anomaly import rolling_zscore
        # window=20 × (4e9)² > 2^63 → must raise, not wrap silently
        ds = rd.from_arrow(pa.table({
            "u": ["a"] * 6, "o": pa.array(np.arange(6), pa.int64()),
            "v": pa.array([4_000_000_000] * 6, pa.int64())}))
        with pytest.raises(Exception, match="int64|rescale|Overflow"):
            rolling_zscore(ds, ["u"], ["o"], "v", window=20,
                           num_partitions=4).to_pandas()

    def test_safe_magnitudes_still_pass(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from driftray.ops.anomaly import rolling_zscore
        ds = rd.from_arrow(pa.table({
            "u": ["a"] * 8, "o": pa.array(np.arange(8), pa.int64()),
            "v": pa.array([600_000_000] * 8, pa.int64())}))
        out = rolling_zscore(ds, ["u"], ["o"], "v", window=20,
                             num_partitions=4).to_pandas()
        assert out["is_anomaly"].sum() == 0


class TestEvolvingColumnsSubset:
    def test_rows_kept_when_group_lacks_column(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from driftray.sources import read_parquet_evolving
        d = tmp_path / "evo"
        d.mkdir()
        pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64()),
                                 "b": pa.array(["x", "y"])}),
                       str(d / "v1.parquet"))
        pq.write_table(pa.table({"a": pa.array([3], pa.int64()),
                                 "c": pa.array([9.5], pa.float64())}),
                       str(d / "v2.parquet"))
        df = read_parquet_evolving(str(d), columns=["c"]).to_pandas()
        # v1's rows must survive with c = NULL, not vanish
        assert len(df) == 3
        assert df["c"].isna().sum() == 2
        assert list(df.columns) == ["c"]


class TestRangeConditionalLabels:
    def test_two_rules_same_column_do_not_merge(self, ray_session):
        import pyarrow as pa
        from driftray.checks import ValidationKernel
        from driftray.spec import ColumnSpec, TableSpec
        spec = TableSpec(name="t", columns=[
            ColumnSpec("v", min_value=0),
            ColumnSpec("v", min_value=100, when=("t", "strict")),
        ])
        t = pa.table({"v": pa.array([50, -1, 50], pa.int64()),
                      "t": ["strict", "lax", "lax"]})
        f = ValidationKernel(spec)(t).to_pandas()
        c = {(r.check, r.column): r.n for r in
             f[f.kind == "counter"].itertuples()}
        assert c[("range", "v")] == 1               # only the -1
        assert c[("range", "v?t=strict")] == 1      # only the strict 50


class TestBadPathTagConsistency:
    def test_no_overlap_with_null_or_dup(self, ray_session):
        import numpy as np
        from driftray.fixtures import RepoFilesConfig, repo_files_batch
        cfg = RepoFilesConfig(p_bad_path_fmt=0.2, p_null_path=0.2,
                              p_dup_key=0.2)
        df = repo_files_batch(np.arange(5000), cfg).to_pandas()
        bad = df[df._bad_path_fmt]
        assert len(bad) > 0
        # every tagged row still carries the planted bad-format path
        assert bad["path"].str.contains(" ").all()
        assert not (df._bad_path_fmt & (df._null_path | df._dup_key)).any()
