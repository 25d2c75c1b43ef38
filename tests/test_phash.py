"""Perceptual-hash (pHash) image near-dup tests.

The hash is the standard DCT construction (32×32 area-average grayscale →
2-D DCT → 8×8 low block → median threshold); clustering reuses the
banded-pigeonhole Hamming machinery shared with SimHash.  All images here
are REAL PNG bytes through the dependency-free ops/png.py codec — the
decode → hash → band → cluster path is exercised end-to-end, not stubbed.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from driftray.ops.multimodal import (MEDIA_SCHEMA, phash64, phash_images,
                                     phash_image_dedup)


def smooth_image(seed: int, h: int = 96, w: int = 128) -> np.ndarray:
    """Low-frequency 'photo-like' RGB image: sum of a few random 2-D
    sinusoids (pure noise images have no perceptual structure for the
    hash to latch onto)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w))
    for _ in range(5):
        fy, fx = rng.uniform(0.5, 3, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        img += (rng.uniform(20, 60)
                * np.sin(2 * np.pi * fy * y / h + ph[0])
                * np.sin(2 * np.pi * fx * x / w + ph[1]))
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return np.repeat(img[:, :, None], 3, 2).astype(np.uint8)


def perturb(img: np.ndarray, seed: int = 0, brightness: int = 10,
            noise: int = 4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = img.astype(np.int16) + brightness + rng.integers(
        -noise, noise + 1, img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_robust_to_noise_and_brightness():
    for seed in range(8):
        base = smooth_image(seed)
        assert hamming(phash64(base), phash64(perturb(base, seed))) <= 6


def test_phash_separates_distinct_images():
    for seed in range(8):
        d = hamming(phash64(smooth_image(seed)),
                    phash64(smooth_image(seed + 500)))
        assert d > 10, f"distinct images too close: {d}"


def test_phash_resize_invariance():
    # downscale by 2 in each axis (area content preserved)
    base = smooth_image(3, 128, 128)
    small = base.reshape(64, 2, 64, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert hamming(phash64(base), phash64(small)) <= 6


def test_phash_small_image_upscale_path():
    # smaller than the 32x32 DCT grid → pixel-replication path
    tiny = smooth_image(4, 12, 9)
    assert isinstance(phash64(tiny), int)
    assert hamming(phash64(tiny), phash64(tiny)) == 0


def _media_table(n_base: int, dup_every: int = 1) -> pa.Table:
    """n_base smooth PNGs; each gets one perturbed near-dup variant.
    Ids: base i ↔ 2i, variant ↔ 2i+1."""
    from driftray.ops.png import encode_png

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_base):
        base = smooth_image(i)
        for j, img in enumerate([base, perturb(base, i)]):
            rows["media_id"].append(2 * i + j)
            rows["kind"].append("image")
            rows["format"].append("png")
            rows["payload"].append(encode_png(img))
            rows["width"].append(img.shape[1])
            rows["height"].append(img.shape[0])
            rows["sample_rate"].append(0)
            rows["duration_ms"].append(0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def test_phash_images_stage(ray_session):
    media = rd.from_arrow(_media_table(4))
    out = phash_images(media, decoder="png", concurrency=2).to_pandas()
    assert len(out) == 8
    assert set(out.columns) == {"media_id", "phash"}
    hm = dict(zip(out["media_id"], out["phash"].astype(np.uint64)))
    for i in range(4):
        assert hamming(int(hm[2 * i]), int(hm[2 * i + 1])) <= 6


def _check_clusters(out: pd.DataFrame, n_base: int):
    cl = dict(zip(out["media_id"], out["cluster_id"]))
    for i in range(n_base):
        assert cl[2 * i] == cl[2 * i + 1], f"pair {i} not clustered"
    roots = {cl[2 * i] for i in range(n_base)}
    assert len(roots) == n_base, "distinct base images merged"


def test_phash_image_dedup_end_to_end(ray_session):
    media = rd.from_arrow(_media_table(6))
    out = phash_image_dedup(media, decoder="png",
                            concurrency=2).to_pandas()
    assert len(out) == 12
    _check_clusters(out, 6)
    assert int(out["is_duplicate"].sum()) == 6  # one variant per base


def test_phash_image_dedup_spill_path(ray_session):
    media = rd.from_arrow(_media_table(6))
    out = phash_image_dedup(media, decoder="png", concurrency=2,
                            spill_threshold=0,
                            spill_partitions=4).to_pandas()
    assert len(out) == 12
    _check_clusters(out, 6)


def test_hamming64_dedup_generic(ray_session):
    from driftray.ops.dedup import hamming64_dedup

    h0 = 0x0123456789ABCDEF
    rows = pd.DataFrame({
        "vid": np.arange(5, dtype=np.int64),
        "h": np.array([h0,                 # 0: base
                       h0 ^ 0b111,         # 1: Hamming 3 from 0 → dup
                       h0 ^ (0b11 << 40),  # 2: Hamming 2 from 0 → dup
                       ~h0 & (2**64 - 1),  # 3: Hamming 64 → solo
                       # 4: 7 flipped bits spread one per band — Hamming 7
                       # from 0, 8 from 1, 7 from 2: all > max_hamming → solo
                       h0 ^ sum(1 << b for b in range(0, 56, 8)),
                       ], dtype=np.uint64).astype(np.int64)})
    out = hamming64_dedup(rd.from_pandas(rows), "vid", "h",
                          max_hamming=6, num_bands=8).to_pandas()
    cl = dict(zip(out["vid"], out["cluster_id"]))
    assert cl[0] == cl[1] == cl[2] == 0
    assert cl[3] == 3 and cl[4] == 4


def test_hamming64_dedup_rejects_bad_bands():
    from driftray.ops.dedup import hamming64_dedup

    ds = rd.from_pandas(pd.DataFrame({"vid": [1], "h": [0]}))
    with pytest.raises(ValueError, match="divide 64"):
        hamming64_dedup(ds, "vid", "h", num_bands=7)
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming64_dedup(ds, "vid", "h", max_hamming=8, num_bands=8)
