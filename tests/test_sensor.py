"""Sensor-pipeline conformance over the sensor_readings fixture
(SURVEY.md §5.2 #1): engine verdicts vs a literal replay of the reference
streaming loop, plus timestamp normalization (M6)."""

import numpy as np
import pandas as pd
import pytest

from driftray.fixtures import sensor_readings
from tests.test_drift import reference_loop_oracle


@pytest.fixture(scope="module")
def sensor_ds(ray_session):
    import ray.data as rd

    table = sensor_readings(2000, seed=7, unusual_probability=0.08)
    return rd.from_arrow(table), table.to_pandas()


class TestSensorPipeline:
    def test_conformance_global_stream(self, sensor_ds):
        from driftray.pipelines.sensor import detect_stream

        ds, pdf = sensor_ds
        got = detect_stream(ds)[""]
        flags = pdf.sort_values("timestamp")["unusual"].fillna(False).tolist()
        oracle = reference_loop_oracle(flags)
        drift_got = [v for v in got if v.drift]
        assert len(drift_got) == len(oracle)
        for v, (i, cnt, ratio) in zip(drift_got, oracle):
            assert (v.end_row, v.unusual_count) == (i, cnt)
            assert v.unusual_ratio == pytest.approx(ratio)

    def test_per_type_partitions(self, sensor_ds):
        from driftray.pipelines.sensor import detect_stream, verdicts_table

        ds, pdf = sensor_ds
        per = detect_stream(ds, group_col="type")
        assert set(per) == set(pdf["type"].unique())
        for typ, verdicts in per.items():
            flags = (pdf[pdf["type"] == typ].sort_values("timestamp")
                     ["unusual"].fillna(False).tolist())
            oracle = reference_loop_oracle(flags)
            assert len([v for v in verdicts if v.drift]) == len(oracle)
        t = verdicts_table(per)
        assert t.num_rows == sum(len(v) for v in per.values())

    def test_timestamp_normalize_roundtrip(self, sensor_ds):
        from driftray.pipelines.sensor import normalize_timestamps

        ds, pdf = sensor_ds
        out = normalize_timestamps(ds).to_pandas()
        pd.testing.assert_series_equal(out["ts"], out["timestamp"],
                                       check_names=False)

    def test_window_trigger_math_pinned(self, ray_session):
        """Synthetic stream hitting the constant-divisor quirk: 5 unusual in
        the first 50 (ratio exactly 0.10 → NO drift), a 6th at row 60 →
        fires with ratio 0.12 over a 61-row window (sensor.py:188-193)."""
        import ray.data as rd

        from driftray.pipelines.sensor import detect_stream

        n = 200
        flags = np.zeros(n, dtype=bool)
        flags[:5] = True
        flags[60] = True
        pdf = pd.DataFrame({"timestamp": np.arange(n), "unusual": flags})
        got = detect_stream(rd.from_pandas(pdf))[""]
        fired = [v for v in got if v.drift]
        assert len(fired) == 1
        assert fired[0].end_row == 60
        assert fired[0].unusual_ratio == pytest.approx(0.12)
        assert fired[0].n_rows == 61
