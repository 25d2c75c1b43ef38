"""UnusualRatioReplay chunked == one-shot == reference loop, under random
flag streams and random chunkings (incl. empty chunks and chunk boundaries
landing mid-window / exactly on a trigger row)."""
import numpy as np
import pytest

from driftray.drift import UnusualRatioReplay, unusual_ratio_verdicts


def _reference_loop(u, window_size=50, threshold=0.10):
    """Direct transliteration of the reference trigger (sensor.py:160-194)."""
    verdicts = []
    start = count = widx = 0
    for i in range(len(u)):
        count += bool(u[i])
        if i - start + 1 >= window_size:
            ratio = count / window_size
            if ratio > threshold:
                verdicts.append((widx, start, i, i - start + 1, count, ratio, True))
                widx += 1
                start = i + 1
                count = 0
    if start < len(u):
        c = int(np.asarray(u[start:]).sum())
        verdicts.append((widx, start, len(u) - 1, len(u) - start, c,
                         c / window_size, False))
    return verdicts


def _astuples(vs):
    return [(v.window_index, v.start_row, v.end_row, v.n_rows,
             v.unusual_count, v.unusual_ratio, v.drift) for v in vs]


@pytest.mark.parametrize("seed", range(8))
def test_chunked_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 1200))
    u = rng.random(n) < rng.uniform(0.02, 0.4)

    assert _astuples(unusual_ratio_verdicts(u)) == _reference_loop(u)

    # random chunking, including empty chunks
    replay = UnusualRatioReplay()
    i = 0
    while i < n:
        step = int(rng.integers(0, 130))
        replay.feed(u[i:i + step])
        i += step
    replay.feed(u[i:])
    assert _astuples(replay.finish()) == _reference_loop(u)


def test_chunk_boundary_on_trigger_row():
    # window fills at row 49; 6 unusuals → trips exactly there; split the
    # stream right at/around the trigger row
    u = np.zeros(120, dtype=bool)
    u[:6] = True
    u[60:70] = True  # second window accumulates and trips later
    ref = _reference_loop(u)
    for cut in (48, 49, 50, 51):
        r = UnusualRatioReplay()
        r.feed(u[:cut])
        r.feed(u[cut:])
        assert _astuples(r.finish()) == ref


def test_threshold_float_boundary():
    # count/w == t exactly must NOT trip (strict >) — 5/50 == 0.10
    u = np.zeros(50, dtype=bool)
    u[:5] = True
    vs = unusual_ratio_verdicts(u)
    assert len(vs) == 1 and not vs[0].drift
    # 6/50 trips at the first evaluable row
    u[5] = True
    vs = unusual_ratio_verdicts(u)
    assert vs[0].drift and vs[0].end_row == 49 and vs[0].unusual_count == 6


def test_empty_and_short_streams():
    assert unusual_ratio_verdicts(np.array([], dtype=bool)) == []
    vs = unusual_ratio_verdicts(np.array([True, False]))
    assert len(vs) == 1 and not vs[0].drift and vs[0].n_rows == 2
