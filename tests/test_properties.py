"""Property tests (hypothesis): merge-order invariance of every sketch
partial and salting-free correctness guarantees (SURVEY.md §5.2 #7)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from driftray.drift import unusual_ratio_verdicts
from driftray.sketches import HLL, Histogram, Moments, TDigest, merge_all
from tests.test_drift import reference_loop_oracle

floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=1, max_size=300)
chunked = st.lists(floats, min_size=1, max_size=5)


@settings(max_examples=40, deadline=None)
@given(chunked)
def test_moments_merge_order_invariant(chunks):
    arrs = [np.asarray(c) for c in chunks]
    fwd = merge_all(Moments().update(a) for a in arrs)
    rev = merge_all(Moments().update(a) for a in reversed(arrs))
    whole = Moments().update(np.concatenate(arrs))
    assert fwd.n == rev.n == whole.n
    assert np.isclose(fwd.mean, whole.mean, rtol=1e-9, atol=1e-6)
    assert np.isclose(rev.mean, whole.mean, rtol=1e-9, atol=1e-6)
    assert np.isclose(fwd.m2, whole.m2, rtol=1e-6, atol=1e-3)
    assert fwd.min == whole.min and fwd.max == whole.max


@settings(max_examples=25, deadline=None)
@given(chunked)
def test_histogram_merge_equals_single_pass(chunks):
    arrs = [np.asarray(c) for c in chunks]
    lo, hi = -1e6, 1e6
    parts = [Histogram(lo, hi, 16).update(a) for a in arrs]
    merged = merge_all(parts)
    whole = Histogram(lo, hi, 16).update(np.concatenate(arrs))
    assert (merged.counts == whole.counts).all()
    assert merged.under == whole.under and merged.over == whole.over


@settings(max_examples=20, deadline=None)
@given(chunked)
def test_tdigest_total_weight_preserved(chunks):
    arrs = [np.asarray(c) for c in chunks]
    merged = merge_all(TDigest(delta=50).update(a) for a in arrs)
    total = sum(a.size for a in arrs)
    assert merged.n == total
    # quantiles bounded by global min/max
    allv = np.concatenate(arrs)
    assert allv.min() - 1e-9 <= merged.quantile(0.5) <= allv.max() + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=500),
       st.integers(min_value=2, max_value=5))
def test_hll_merge_order_invariant(values, nsplit):
    arr = np.asarray(values)
    parts = [HLL(p=10).update(c) for c in np.array_split(arr, nsplit)]
    a = merge_all(parts)
    b = HLL(p=10)
    for p in reversed([HLL(p=10).update(c) for c in np.array_split(arr, nsplit)]):
        b.merge(p)
    assert (a.registers == b.registers).all()
    assert a.estimate() == b.estimate()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=400),
       st.integers(min_value=2, max_value=60),
       st.floats(min_value=0.01, max_value=0.5))
def test_detector_always_matches_reference_loop(flags, window, threshold):
    got = [v for v in unusual_ratio_verdicts(np.asarray(flags, dtype=bool),
                                             window_size=window,
                                             threshold=threshold) if v.drift]
    want = reference_loop_oracle(flags, window_size=window, threshold=threshold)
    assert [(v.end_row, v.unusual_count) for v in got] == \
        [(i, c) for i, c, _ in want]
