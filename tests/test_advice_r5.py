"""Regression tests for the round-4 ADVICE.md findings (fixed in round 5).

1. layout.compact_partitions — in-place / overlapping output must be
   refused BEFORE any destination cleanup (the debris pass deletes
   *.parquet in dst; dst==src would destroy the source data).
2. ann.pq_train — code ids are stored uint8, so n_codes > 256 must raise
   instead of silently wrapping code ids.
3. grouped.grouped_winsorize_stats — wins_sum is contract-exact int64;
   a group whose clipped sum could wrap must raise OverflowError loudly
   (same contract as anomaly.rolling_zscore).
4. checks._when_mask — a `when` gate column missing from the batch emits
   a distinct config finding instead of silently disabling the rule.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


class TestCompactGuards:
    def _frag(self, tmp_path):
        from driftray.ops.sink import write_partitioned_resumable

        src = tmp_path / "in"
        df = pd.DataFrame({"k": ["a"] * 50 + ["b"] * 50,
                           "v": np.arange(100)})
        write_partitioned_resumable(rd.from_pandas(df).repartition(4),
                                    str(src), "k")
        return src

    def test_same_dir_refused(self, ray_session, tmp_path):
        from driftray.ops.layout import compact_partitions

        src = self._frag(tmp_path)
        n_before = sum(len(fs) for _, _, fs in os.walk(src))
        with pytest.raises(ValueError, match="disjoint"):
            compact_partitions(str(src), str(src), partition_col="k")
        # nothing deleted — the guard fires before any cleanup
        assert sum(len(fs) for _, _, fs in os.walk(src)) == n_before

    def test_nested_output_refused(self, ray_session, tmp_path):
        from driftray.ops.layout import compact_partitions

        src = self._frag(tmp_path)
        with pytest.raises(ValueError, match="disjoint"):
            compact_partitions(str(src), str(src / "compacted"),
                               partition_col="k")
        with pytest.raises(ValueError, match="disjoint"):
            # output CONTAINING the input is just as destructive
            compact_partitions(str(src), str(tmp_path), partition_col="k")

    def test_disjoint_still_works(self, ray_session, tmp_path):
        from driftray.ops.layout import compact_partitions

        src = self._frag(tmp_path)
        rep = compact_partitions(str(src), str(tmp_path / "out"),
                                 partition_col="k")
        assert (rep["files_out"] <= rep["files_in"]).all()
        assert rep["rows"].sum() == 100


class TestPqTrainBounds:
    def test_n_codes_over_256_raises(self, ray_session):
        from driftray.ops.ann import pq_train

        X = np.random.default_rng(0).normal(size=(64, 8))
        ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, x))}
                            for i, x in enumerate(X)])
        with pytest.raises(ValueError, match="n_codes"):
            pq_train(ds, m=4, n_codes=512, sample_rows=64)
        with pytest.raises(ValueError, match="n_codes"):
            pq_train(ds, m=4, n_codes=0, sample_rows=64)

    def test_n_codes_256_ok(self, ray_session):
        from driftray.ops.ann import pq_train

        X = np.random.default_rng(0).normal(size=(64, 8))
        ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, x))}
                            for i, x in enumerate(X)])
        model = pq_train(ds, m=4, n_codes=256, sample_rows=64)
        assert model["codebooks"].shape == (4, 256, 2)


class TestWinsorizeOverflowGuard:
    def test_wrapping_sum_raises(self, ray_session):
        from driftray.ops.grouped import grouped_winsorize_stats

        big = 2**62
        df = pd.DataFrame({"g": ["a"] * 8, "v": [big] * 8})
        with pytest.raises(OverflowError, match="wins_sum"):
            grouped_winsorize_stats(rd.from_pandas(df), ["g"], "v",
                                    q_lo=0.1, q_hi=0.9,
                                    num_partitions=1).to_pandas()

    def test_safe_sum_unaffected(self, ray_session):
        from driftray.ops.grouped import grouped_winsorize_stats

        df = pd.DataFrame({"g": ["a"] * 10, "v": list(range(10))})
        out = grouped_winsorize_stats(rd.from_pandas(df), ["g"], "v",
                                      q_lo=0.2, q_hi=0.8,
                                      num_partitions=1).to_pandas()
        assert len(out) == 1 and out["n"].iloc[0] == 10


class TestWhenColumnMissing:
    def _run(self, batch: pa.Table, spec):
        from driftray.checks import CheckContext, RangeCheck, _empty_findings

        out = _empty_findings()
        ctx = CheckContext(batch, 0, spec, out, budget=100)
        RangeCheck(spec).process(ctx)
        return out

    def test_missing_gate_emits_config_finding(self):
        from driftray.spec import ColumnSpec, TableSpec

        spec = TableSpec(
            name="t",
            columns=[ColumnSpec("v", min_value=0, max_value=10,
                                when=("no_such_col", "x"))])
        batch = pa.table({"v": [5, 50]})
        out = self._run(batch, spec)
        assert "config" in out["check"], out
        i = out["check"].index("config")
        assert "no_such_col" in out["detail"][i] or out["kind"][i] == "counter"
        details = [d for k, d in zip(out["check"], out["detail"])
                   if k == "config" and d]
        assert any("no_such_col" in d for d in details)
        # rule itself reports 0 violations (gate can't evaluate) but is
        # no longer silent about why
        rng = [n for k, kd, n in zip(out["check"], out["kind"], out["n"])
               if k == "range" and kd == "counter"]
        assert rng == [0]

    def test_present_gate_no_config_finding(self):
        from driftray.spec import ColumnSpec, TableSpec

        spec = TableSpec(
            name="t",
            columns=[ColumnSpec("v", min_value=0, max_value=10,
                                when=("g", "x"))])
        batch = pa.table({"v": [5, 50, 50], "g": ["x", "x", "y"]})
        out = self._run(batch, spec)
        assert "config" not in out["check"]
        i = out["check"].index("range")
        assert out["n"][i] == 1  # only the gated row 50/g=x violates
