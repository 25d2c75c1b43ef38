"""Audio spectral-fingerprint near-dup tests (real WAV bytes end-to-end)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from driftray.ops.multimodal import (MEDIA_SCHEMA, audio_dedup,
                                     audio_fingerprint64, audio_fingerprints,
                                     encode_wav)


def tone_clip(seed: int, n: int = 8000, sr: int = 16000) -> np.ndarray:
    """Amplitude-modulated tone mixture — non-stationary, audio-like."""
    r = np.random.default_rng(seed)
    t = np.arange(n) / sr
    s = sum(r.uniform(500, 4000)
            * np.sin(2 * np.pi * r.uniform(100, 6000) * t + r.uniform(0, 6))
            * np.clip(np.sin(2 * np.pi * r.uniform(0.3, 2) * t
                             + r.uniform(0, 6)), 0, None)
            for _ in range(6))
    return (s / np.abs(s).max() * 20000).astype(np.int16)


def regain_noise(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Near-dup perturbation: gain 0.7 + 1%-of-peak white noise."""
    rng = np.random.default_rng(seed)
    return (x * 0.7 + rng.normal(0, 200, len(x))).astype(np.int16)


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_fingerprint_robust_and_separating():
    for seed in range(10):
        base = tone_clip(seed)
        near = hamming(audio_fingerprint64(base),
                       audio_fingerprint64(regain_noise(base, seed)))
        far = hamming(audio_fingerprint64(base),
                      audio_fingerprint64(tone_clip(seed + 300)))
        assert near <= 7, f"seed {seed}: near-dup distance {near}"
        assert far > 12, f"seed {seed}: distinct distance {far}"


def test_fingerprint_gain_invariance():
    base = tone_clip(1)
    half = (base * 0.5).astype(np.int16)
    assert hamming(audio_fingerprint64(base), audio_fingerprint64(half)) <= 2


def test_fingerprint_short_and_silent_clips():
    assert audio_fingerprint64(np.zeros(10, np.int16)) == \
        audio_fingerprint64(np.zeros(500, np.int16))
    assert isinstance(audio_fingerprint64(np.array([5, -3], np.int16)), int)


def _media_table(n_base: int) -> pa.Table:
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_base):
        base = tone_clip(i)
        for j, x in enumerate([base, regain_noise(base, i)]):
            rows["media_id"].append(2 * i + j)
            rows["kind"].append("audio")
            rows["format"].append("wav")
            rows["payload"].append(encode_wav(x))
            rows["width"].append(0)
            rows["height"].append(0)
            rows["sample_rate"].append(16000)
            rows["duration_ms"].append(500)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def test_audio_fingerprints_stage(ray_session):
    media = rd.from_arrow(_media_table(4))
    out = audio_fingerprints(media, concurrency=2).to_pandas()
    assert len(out) == 8 and set(out.columns) == {"media_id", "afp"}
    fp = dict(zip(out["media_id"], out["afp"].astype(np.uint64)))
    for i in range(4):
        assert hamming(int(fp[2 * i]), int(fp[2 * i + 1])) <= 7


def test_audio_dedup_end_to_end(ray_session):
    media = rd.from_arrow(_media_table(6))
    out = audio_dedup(media, concurrency=2).to_pandas()
    assert len(out) == 12
    cl = dict(zip(out["media_id"], out["cluster_id"]))
    for i in range(6):
        assert cl[2 * i] == cl[2 * i + 1] == 2 * i
    assert int(out["is_duplicate"].sum()) == 6
