"""Video fingerprint (majority pHash over sampled frames) near-dup tests.

Clips here are REAL GIF bytes through the dependency-free ops/gif.py codec
(the in-container video path), so decode → per-frame pHash → majority
combine → Hamming-band cluster runs end-to-end unstubbed.
"""
import numpy as np
import pyarrow as pa
import ray.data as rd

from driftray.ops.gif import encode_gif
from driftray.ops.multimodal import (MEDIA_SCHEMA, video_dedup,
                                     video_phash64)
from tests.test_phash import hamming, perturb, smooth_image


def clip_frames(seed: int, n_frames: int = 6, h: int = 64,
                w: int = 64) -> list[np.ndarray]:
    """Photo-like clip: each frame a distinct smooth image derived from
    the clip seed (a real video's frames differ but share content)."""
    return [smooth_image(seed * 1000 + f, h, w) for f in range(n_frames)]


def perturb_clip(frames: list[np.ndarray], seed: int) -> list[np.ndarray]:
    return [perturb(f, seed + i, brightness=8, noise=3)
            for i, f in enumerate(frames)]


def test_video_phash_robust_and_separating():
    for seed in range(6):
        base = clip_frames(seed)
        near = hamming(video_phash64(base),
                       video_phash64(perturb_clip(base, seed)))
        far = hamming(video_phash64(base),
                      video_phash64(clip_frames(seed + 50)))
        assert near <= 6, f"re-encode drifted {near} bits"
        assert far > 10, f"distinct clips too close: {far}"


def test_video_phash_single_frame_drop_tolerated():
    # majority vote: replacing one of 6 frames with unrelated content
    # must not flip the fingerprint far (concat/XOR schemes fail this)
    base = clip_frames(1)
    damaged = list(base)
    damaged[3] = smooth_image(999)
    assert hamming(video_phash64(base), video_phash64(damaged)) <= 10


def _video_table(n_base: int) -> pa.Table:
    """n_base GIF clips; each gets one perturbed near-dup re-encode.
    Ids: base i ↔ 2i, variant ↔ 2i+1 (same layout as the image tests)."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_base):
        base = clip_frames(i)
        for j, frames in enumerate([base, perturb_clip(base, i)]):
            rows["media_id"].append(2 * i + j)
            rows["kind"].append("video")
            rows["format"].append("gif")
            rows["payload"].append(encode_gif(frames))
            rows["width"].append(frames[0].shape[1])
            rows["height"].append(frames[0].shape[0])
            rows["sample_rate"].append(0)
            rows["duration_ms"].append(len(frames) * 40)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def _check_clusters(out, n_base: int):
    cl = dict(zip(out["media_id"], out["cluster_id"]))
    for i in range(n_base):
        assert cl[2 * i] == cl[2 * i + 1], f"pair {i} not clustered"
    assert len({cl[2 * i] for i in range(n_base)}) == n_base, \
        "distinct clips merged"


def test_video_dedup_end_to_end(ray_session):
    media = rd.from_arrow(_video_table(5))
    # GIF palette quantization adds a few bits of drift on top of the
    # pixel perturbation (measured: near-dups <= 9, distinct >= 28), so
    # widen to 16x4-bit bands (pigeonhole guarantee up to 15 bits)
    out = video_dedup(media, decoder="gif", concurrency=2,
                      max_hamming=10, num_bands=16).to_pandas()
    assert len(out) == 10
    _check_clusters(out, 5)
    assert int(out["is_duplicate"].sum()) == 5


def test_video_dedup_spill_path(ray_session):
    media = rd.from_arrow(_video_table(4))
    out = video_dedup(media, decoder="gif", concurrency=2,
                      max_hamming=10, num_bands=16,
                      spill_threshold=0, spill_partitions=4).to_pandas()
    assert len(out) == 8
    _check_clusters(out, 4)


def test_video_dedup_fake_decoder_deterministic(ray_session):
    # container formats without an in-container codec route through the
    # deterministic stub; identical payloads must still cluster together
    tbl = _video_table(2)
    media = rd.from_arrow(pa.concat_tables([tbl, tbl.set_column(
        0, "media_id", pa.array([100, 101, 102, 103], pa.int64()))]))
    out = video_dedup(media, decoder="fake", max_hamming=0,
                      concurrency=2).to_pandas()
    cl = dict(zip(out["media_id"], out["cluster_id"]))
    for a, b in [(0, 100), (1, 101), (2, 102), (3, 103)]:
        assert cl[a] == cl[b], f"identical payloads {a}/{b} split"
