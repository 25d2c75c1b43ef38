"""Data-quality anomaly signals beyond fixed constraints.

The reference's detector family is threshold rules over windows
(``/root/reference/src/data_sources/iot/sensor.py:160-194`` ratio trigger,
``DESIGN.md:674-747`` AlertManager thresholds).  These operators add the
statistical anomaly signals a validation engine needs at corpus scale:

- :func:`rolling_zscore` — per-key trailing-window outlier flags with the
  anomaly DECISION made in exact int64 arithmetic (no float threshold
  flicker between hosts / vs SQL oracles).
- :func:`benford_digit_counts` — first-significant-digit distribution per
  group (fabricated-data / corruption screen).
- :func:`freshness_lag` — per-group staleness vs the dataset watermark.
- :func:`window_count_anomaly` — per-window row-count outliers vs the
  median window (feed drop / double-ingest detector).

All four reduce to integer counters or tiny per-group tables: partials
combine inside ``map_batches`` and the shuffles carry KBs, so each works
unchanged at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .grouped import partitioned_group_apply


def rolling_zscore(ds: rd.Dataset, key_cols: list[str],
                   order_cols: list[str], value_col: str,
                   window: int, min_periods: int = 5,
                   z_threshold: float = 3.0,
                   num_partitions: int = 64) -> rd.Dataset:
    """Trailing-window outlier flags per key: for each row, compare its
    value against the mean/std of the PREVIOUS ``window`` rows (current row
    excluded — a spike must not dilute its own baseline), ordered by
    ``order_cols`` within the key.

    ``value_col`` must be int64 (pre-scale floats to cents upstream, the
    :func:`rolling_sum_by_key` convention).  The anomaly decision
    ``|v - mean| > z * std``  is evaluated as the cross-multiplied integer
    inequality ``(n·v - S)² · (n-1) > z² · n · (n·S2 - S²)`` — the
    squares ride object ints, and value magnitudes whose WINDOW sum of
    squares could exceed int64 are rejected loudly up front (two's-
    complement cumsum differences are exact below that bound), so Ray and
    a SQL oracle agree bit-for-bit at the threshold boundary.

    Output: input columns + ``n_prev`` (trailing-window row count) +
    ``is_anomaly`` (int64 0/1; rows with fewer than ``min_periods``
    predecessors are never anomalies).  One hash exchange on the key.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    z2_num, z2_den = _as_ratio(z_threshold)

    def per_partition(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.Table.from_pandas(
                df.assign(n_prev=pd.Series([], dtype="int64"),
                          is_anomaly=pd.Series([], dtype="int64")),
                preserve_index=False)
        df = df.sort_values(key_cols + order_cols, kind="mergesort",
                            ignore_index=True)
        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"rolling_zscore needs an integer value column for "
                f"exactness; got {v.dtype} — pre-scale floats upstream")
        n_rows = len(df)
        key_change = np.zeros(n_rows, dtype=bool)
        key_change[0] = True
        for k in key_cols:
            kv = df[k].to_numpy()
            key_change[1:] |= kv[1:] != kv[:-1]
        run_id = np.cumsum(key_change) - 1
        run_start = np.flatnonzero(key_change)
        idx = np.arange(n_rows, dtype=np.int64)
        pos = idx - run_start[run_id]

        v64 = v.astype(np.int64)
        # exactness guard: the windowed Σv² must fit int64 or the
        # vectorized prefix sums wrap SILENTLY (numpy) where a SQL
        # BIGINT oracle raises — reject loudly instead (pre-scale less
        # aggressively upstream; e.g. window=20 allows |v| ≤ ~6.8e8)
        vmax = int(np.abs(v64).max()) if n_rows else 0
        if vmax and vmax * vmax * window >= 2**63:
            raise OverflowError(
                f"rolling_zscore: window={window} sum of squares of values "
                f"up to {vmax} can exceed int64 — rescale the value column")
        cs = np.concatenate(([0], np.cumsum(v64)))          # exclusive
        cs2 = np.concatenate(([0], np.cumsum(v64 * v64)))
        lo = np.maximum(idx - window, run_start[run_id])    # frame [lo, idx)
        n = idx - lo
        s = cs[idx] - cs[lo]
        s2 = cs2[idx] - cs2[lo]

        # exact integer inequality via object ints (n·v can square past 2^63)
        no, vo = n.astype(object), v64.astype(object)
        so, s2o = s.astype(object), s2.astype(object)
        lhs = (no * vo - so) ** 2 * (no - 1) * z2_den
        rhs = z2_num * no * (no * s2o - so * so)
        flag = np.where((n >= min_periods) & (lhs > rhs), 1, 0).astype(np.int64)
        out = df.copy()
        out["n_prev"] = n
        out["is_anomaly"] = flag
        return pa.Table.from_pandas(out, preserve_index=False)

    return partitioned_group_apply(ds, key_cols, per_partition,
                                   num_partitions=num_partitions)


def _as_ratio(x: float, max_den: int = 10_000) -> tuple[int, int]:
    """x² as an exact integer ratio (x is a config constant like 3.0)."""
    from fractions import Fraction

    f = Fraction(x).limit_denominator(max_den) ** 2
    return int(f.numerator), int(f.denominator)


def benford_digit_counts(ds: rd.Dataset, value_col: str,
                         group_cols: list[str] | None = None) -> rd.Dataset:
    """First-significant-digit counts per group (Benford screen for
    fabricated / corrupted numeric feeds).  Only rows with value >= 1 are
    counted; the digit is the first character of the integer part (exact —
    no log10 float boundary).  Per-batch partial counts, then a
    digit×group-sized groupby-sum: shuffle ∝ 9 × |groups|."""
    from ray.data.aggregate import Sum

    group_cols = list(group_cols or [])

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        keep = pc.fill_null(pc.greater_equal(v, 1.0), False)
        t = t.filter(keep)
        ints = pc.cast(pc.floor(pc.cast(t[value_col], pa.float64())),
                       pa.int64())
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(ints, pa.string()), 0, 1), pa.int64())
        cols = {c: t[c] for c in group_cols}
        cols["digit"] = digit
        g = (pa.table(cols).to_pandas()
             .groupby(group_cols + ["digit"], sort=False)
             .size().rename("n").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.select_columns(group_cols + [value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(group_cols + ["digit"])
            .aggregate(Sum("n", alias_name="n")))


def freshness_lag(ds: rd.Dataset, group_col: str, ts_col: str) -> pd.DataFrame:
    """Per-group staleness: microseconds between each group's newest row and
    the dataset watermark (global max ``ts_col``) — µs integers, so the lag
    is exact on both the engine and a SQL oracle.  The freshness SLA check a
    feed monitor runs per source/partition; one Max aggregate, KB result."""
    from ray.data.aggregate import Max

    per = (ds.select_columns([group_col, ts_col])
           .groupby(group_col).aggregate(Max(ts_col, alias_name="max_ts"))
           .to_pandas())
    watermark = per["max_ts"].max()
    out = per.sort_values(group_col, ignore_index=True)
    lag = (watermark - out["max_ts"]).astype("timedelta64[us]")
    out["lag_us"] = lag.to_numpy().astype("timedelta64[us]").astype(np.int64)
    return out


def window_count_anomaly(ds: rd.Dataset, ts_col: str,
                         low_pct: int = 80, high_pct: int = 120) -> pd.DataFrame:
    """Per-day row counts flagged against the median day: anomalous iff
    ``n·100 < low_pct·median`` or ``n·100 > high_pct·median`` (the feed
    drop / double-ingest detector).  The reduce is one per-day Count — the
    driver sees |days| rows, never the corpus."""
    from ray.data.aggregate import Count

    def day_of(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.floor_temporal(t[ts_col], unit="day")})

    per = (ds.select_columns([ts_col])
           .map_batches(day_of, batch_format="pyarrow")
           .groupby("day").aggregate(Count(alias_name="n")).to_pandas())
    per = per.sort_values("day", ignore_index=True)
    c = np.sort(per["n"].to_numpy(dtype=np.int64))
    k = len(c) // 2
    med2 = int(2 * c[k]) if len(c) % 2 else int(c[k - 1] + c[k])  # 2×median, exact
    n100 = per["n"].to_numpy(dtype=np.int64) * 200
    per["is_anomaly"] = ((n100 < low_pct * med2) |
                         (n100 > high_pct * med2)).astype(np.int64)
    return per


def cusum_changepoints(ds: rd.Dataset, ts_col: str, value_col: str,
                       k_sigma: float = 0.5, h_sigma: float = 5.0,
                       baseline_days: int | None = None,
                       day_col: str = "day") -> pd.DataFrame:
    """Two-sided CUSUM change-point detection over the DAILY MEAN series
    (Page's test — the level-shift detector threshold rules miss).

    Scale shape: the corpus reduces to one (day, sum, count) row per day
    via per-batch partials + a |days|-sized groupby; the CUSUM recursion
    (inherently sequential, O(|days|)) runs on the driver over that tiny
    series.  Days, not rows, bound the driver work.

    ``baseline_days``: estimate the in-control mean/σ from the FIRST that
    many days (the standard Page formulation — a detector standardized on
    the whole series sees a mean pulled toward the post-shift level and
    alarms on the in-control side too).  None = whole series (drift
    screening over a window believed mostly in-control).

    Returns per-day rows: ``day, mean, cusum_hi, cusum_lo, alarm`` where
    the statistics are in σ units of the daily-mean series and ``alarm``
    flags |CUSUM| > h_sigma.  k_sigma is the slack per step.
    """
    from ray.data.aggregate import Count, Sum

    def day_rows(t: pa.Table) -> pa.Table:
        return pa.table({day_col: pc.floor_temporal(t[ts_col], unit="day"),
                         "__v": pc.cast(t[value_col], pa.float64())})

    per = (ds.select_columns([ts_col, value_col])
           .map_batches(day_rows, batch_format="pyarrow")
           .groupby(day_col)
           .aggregate(Sum("__v", alias_name="__s"),
                      Count(alias_name="__n"))
           .to_pandas().sort_values(day_col, ignore_index=True))
    means = per["__s"].to_numpy() / per["__n"].to_numpy()
    base = means[:baseline_days] if baseline_days else means
    mu, sd = float(base.mean()), float(base.std(ddof=0) or 1.0)
    z = (means - mu) / (sd if sd > 0 else 1.0)

    hi = np.zeros(len(z))
    lo = np.zeros(len(z))
    h_prev = l_prev = 0.0
    for i, zi in enumerate(z):          # O(|days|) — driver-side by design
        h_prev = max(0.0, h_prev + zi - k_sigma)
        l_prev = min(0.0, l_prev + zi + k_sigma)
        hi[i], lo[i] = h_prev, l_prev

    return pd.DataFrame({day_col: per[day_col], "mean": means,
                         "cusum_hi": hi, "cusum_lo": lo,
                         "alarm": ((hi > h_sigma) | (-lo > h_sigma))
                         .astype(np.int64)})
