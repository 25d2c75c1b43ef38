"""Regression tests for the round-1 advisor findings (ADVICE.md r1):

* null-stable key hashing across batches (int64-with-null promotion bug),
* salted mean with null values (SQL AVG semantics),
* silver layer keeps the first-wins copy of duplicated keys,
* truncated violation samples fail loudly instead of leaking into silver,
* table-global uniqueness reported on a dedicated window -1,
* mean_difference returns 0 (not inf) for a zero-std baseline.
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from driftray.checks import hash_keys
from driftray.spec import ColumnSpec, TableSpec


def _dup_spec() -> TableSpec:
    return TableSpec(
        name="t",
        columns=[ColumnSpec("k", required=True)],
        unique_key=("k",),
        order_column="ord",
    )


class TestNullStableHashing:
    def test_int_column_hash_unaffected_by_null_in_batch(self):
        clean = pa.table({"k": pa.array([42, 7], pa.int64())})
        with_null = pa.table({"k": pa.array([42, None], pa.int64())})
        h_clean = hash_keys(clean, ["k"])
        h_null = hash_keys(with_null, ["k"])
        assert h_clean[0] == h_null[0]  # 42 hashes identically in both
        assert h_clean[1] != h_null[1]

    def test_nulls_hash_to_stable_sentinel(self):
        a = pa.table({"k": pa.array([None, 1], pa.int64())})
        b = pa.table({"k": pa.array([2, None], pa.int64())})
        assert hash_keys(a, ["k"])[0] == hash_keys(b, ["k"])[1]

    def test_float_and_string_and_ts_stable(self):
        for arr in (pa.array([1.5, None], pa.float64()),
                    pa.array(["x", None], pa.string()),
                    pa.array([pd.Timestamp("2024-01-01"), None])):
            clean = pa.table({"k": arr.take(pa.array([0]))})
            mixed = pa.table({"k": arr})
            assert hash_keys(clean, ["k"])[0] == hash_keys(mixed, ["k"])[0]

    def test_duplicate_across_null_and_clean_blocks_found(self, ray_session, tmp_path):
        """The advisor's repro: dup key 42 spans a clean block and a block
        containing one null — must be reported as a duplicate."""
        import ray.data as rd

        from driftray.pipeline import uniqueness_violations

        t1 = pa.table({"k": pa.array([42, 1, 2], pa.int64()),
                       "ord": pa.array([10, 11, 12], pa.int64())})
        t2 = pa.table({"k": pa.array([42, None, 3], pa.int64()),
                       "ord": pa.array([20, 21, 22], pa.int64())})
        ds = rd.from_arrow([t1, t2])
        dup, extra, winners = uniqueness_violations(ds, _dup_spec())
        assert extra == 1
        refs = dup["row_ref"].to_pylist()
        assert refs == ["42"]
        assert winners is not None
        w = winners.to_pandas()
        assert list(w["key"]) == ["42"] and int(w["win_order"].iloc[0]) == 10


class TestSaltedMeanNulls:
    def test_mean_skips_nulls_like_sql_avg(self, ray_session):
        import ray.data as rd

        from driftray.ops.relational import salted_groupby_agg

        df = pd.DataFrame({
            "g": ["a"] * 4 + ["b"] * 3,
            "v": [1.0, None, 3.0, None, 10.0, 20.0, None],
        })
        out = salted_groupby_agg(rd.from_pandas(df), ["g"], {"v": "mean"},
                                 n_salts=4).to_pandas().set_index("g")
        assert out.loc["a", "mean_v"] == pytest.approx(2.0)   # (1+3)/2, not /4
        assert out.loc["b", "mean_v"] == pytest.approx(15.0)  # (10+20)/2, not /3


class TestMeanDifferenceZeroStd:
    def test_returns_zero_not_inf(self):
        from driftray.drift import mean_difference

        assert mean_difference(5.0, 0.0, 9.0) == 0.0
        assert mean_difference(5.0, float("nan"), 9.0) == 0.0
        assert mean_difference(5.0, 2.0, 9.0) == pytest.approx(2.0)


class TestSilverFirstWins:
    @pytest.fixture()
    def dup_run(self, ray_session, tmp_path):
        from driftray.pipeline import run_validation

        # k=5 duplicated (winner ord=50), k=7 triplicated (winner ord=70)
        rows = pd.DataFrame({
            "k": [1, 2, 3, 5, 5, 7, 7, 7, 9],
            "ord": [101, 102, 103, 50, 55, 70, 71, 72, 109],
            "window_id": [0] * 9,
            "payload": list("abcdefghi"),
        })
        inp = str(tmp_path / "in.parquet")
        pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), inp)
        out = str(tmp_path / "out")
        run_validation(inp, out, _dup_spec())
        return inp, out

    def test_silver_keeps_exactly_one_winner_per_dup_key(self, dup_run, tmp_path):
        import ray.data as rd

        from driftray.pipeline import materialize_silver

        inp, out = dup_run
        n = materialize_silver(inp, out, _dup_spec(),
                               silver_dir=str(tmp_path / "silver"))
        silver = rd.read_parquet(str(tmp_path / "silver")).to_pandas()
        assert n == len(silver) == 6  # 9 rows - 1 extra k=5 - 2 extra k=7
        counts = silver["k"].value_counts()
        assert (counts == 1).all()
        assert int(silver.loc[silver["k"] == 5, "ord"].iloc[0]) == 50
        assert int(silver.loc[silver["k"] == 7, "ord"].iloc[0]) == 70

    def test_truncated_violation_sample_raises(self, dup_run, tmp_path):
        from driftray.pipeline import materialize_silver

        inp, out = dup_run
        # simulate a cap-bound window: counters claim more violations than
        # were emitted as rows
        wdir = os.path.join(out, "window=0")
        with open(os.path.join(wdir, "lineage.json")) as f:
            lin = json.load(f)
        lin["counters"]["completeness|k"] = 999
        with open(os.path.join(wdir, "lineage.json"), "w") as f:
            json.dump(lin, f)
        with pytest.raises(ValueError, match="truncated"):
            materialize_silver(inp, out, _dup_spec(),
                               silver_dir=str(tmp_path / "silver2"))


class TestUniquenessWindowAttribution:
    def test_multi_window_reports_on_dedicated_minus1(self, ray_session):
        import ray.data as rd

        from driftray.pipeline import validate_dataset

        # key 42 repeats ACROSS windows 0 and 1
        t = pa.table({
            "k": pa.array([42, 1, 42, 2], pa.int64()),
            "ord": pa.array([1, 2, 3, 4], pa.int64()),
            "window_id": pa.array([0, 0, 1, 1], pa.int64()),
        })
        results = validate_dataset(rd.from_arrow(t), _dup_spec(),
                                   window_column="window_id",
                                   check_uniqueness=True)
        assert set(results) == {-1, 0, 1}
        assert results[-1].counters.get("uniqueness|k") == 1
        for w in (0, 1):
            assert "uniqueness|k" not in results[w].counters
            assert results[w].quality_score == 1.0
