"""Baseline-JPEG codec (ops/jpeg.py, zero external deps) tests.

The decoder honors the stream's own DQT/DHT segments, chroma subsampling
and restart markers; the encoder can emit 4:4:4 or 4:2:0 with optional
DRI/RSTn — so the round-trips here exercise the decoder's real-world
paths (interleaved MCUs, subsampled chroma, restart resync), not just a
single happy path.
"""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from driftray.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _structured_rgb(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("kwargs,min_psnr", [
    (dict(), 45.0),
    (dict(subsample="420"), 40.0),
    (dict(restart_interval=4), 45.0),
    (dict(subsample="420", restart_interval=3), 40.0),
    (dict(quality=30), 30.0),
])
def test_jpeg_rgb_roundtrip(kwargs, min_psnr):
    # 41x53 is deliberately NOT a multiple of 8 (or 16 for 4:2:0) so the
    # edge-padded partial MCUs are exercised too.
    img = _structured_rgb(41, 53)
    data = encode_jpeg(img, **kwargs)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(out, img) >= min_psnr, kwargs


def test_jpeg_grayscale_roundtrip():
    y, x = np.mgrid[0:30, 0:17]
    gray = ((x * 7 + y * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray))
    assert out.shape == gray.shape
    assert _psnr(out, gray) >= 35.0


def test_jpeg_deterministic():
    img = _structured_rgb(24, 24)
    assert encode_jpeg(img) == encode_jpeg(img)


def test_jpeg_restart_marker_bytes_present():
    img = _structured_rgb(40, 40)   # 5x5 MCUs at 4:4:4
    data = encode_jpeg(img, restart_interval=2)
    # DRI segment present and at least one RST marker in the scan
    assert b"\xff\xdd" in data
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


def test_jpeg_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8), subsample="422")


def test_real_jpeg_through_decode_actor_pool(ray_session):
    """decoder="jpeg" decodes REAL baseline-JPEG bytes in the actor pool —
    lossy, so features are compared with a tolerance."""
    from driftray.ops.multimodal import MEDIA_SCHEMA, decode_images

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    imgs = []
    for i in range(6):
        img = _structured_rgb(16 + i, 24 - i)
        imgs.append(img)
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["format"].append("jpeg")
        rows["payload"].append(
            encode_jpeg(img, subsample="420" if i % 2 else "444"))
        rows["width"].append(img.shape[1])
        rows["height"].append(img.shape[0])
        rows["sample_rate"].append(0)
        rows["duration_ms"].append(0)
    t = pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
    out = (decode_images(rd.from_arrow(t), decoder="jpeg", concurrency=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    for i, img in enumerate(imgs):
        np.testing.assert_allclose(out.loc[i, "mean_rgb"],
                                   img.mean(axis=(0, 1)), atol=3.0)
