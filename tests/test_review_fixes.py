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
