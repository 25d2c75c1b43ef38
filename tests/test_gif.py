"""GIF89a codec (ops/gif.py, zero external deps) + real frame-sampling
path tests.  The hand-crafted stream test drives the decoder's
real-world compositing paths (sub-rectangle frames, disposal 2,
transparency) that our full-frame encoder never emits."""
import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from driftray.ops.gif import (_lzw_encode, _sub_blocks, decode_gif,
                              encode_gif)


def _limited_frames(n=5, h=23, w=31, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, size=(h, w, 3)).astype(np.uint8) * 64
    frames = []
    for f in range(n):
        fr = base.copy()
        fr[(f * 3):(f * 3 + 4), :, 0] = 224
        frames.append(fr)
    return frames


def test_gif_animated_exact_roundtrip():
    frames = _limited_frames()
    data = encode_gif(frames, delay_ms=120)
    out, delays = decode_gif(data)
    assert out.shape == (5, 23, 31, 3)
    assert delays == [120] * 5
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(out[i], f)


def test_gif_interlaced_roundtrip():
    f = _limited_frames(n=1)[0]
    out, _ = decode_gif(encode_gif(f, interlace=True))
    np.testing.assert_array_equal(out[0], f)


def test_gif_quantizer_bounded_error():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(20, 20, 3)).astype(np.uint8)
    out, _ = decode_gif(encode_gif(img))
    err = np.abs(out[0].astype(int) - img.astype(int)).max()
    assert err <= 26          # half a 6/7-level uniform cell


def test_gif_deterministic():
    frames = _limited_frames(n=2)
    assert encode_gif(frames) == encode_gif(frames)


def test_gif_subrect_disposal_transparency():
    """Hand-built stream: full first frame, then a transparent-holed
    patch at an offset with disposal 2 (restore to background), then a
    final full frame — checks compositing semantics the encoder never
    produces."""
    w = h = 8
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # 4-entry GCT, bg 0
    out += pal.tobytes()

    def image_block(idx, fx, fy):
        fh, fw = idx.shape
        blk = b"\x2c" + struct.pack("<HHHHB", fx, fy, fw, fh, 0)
        return blk + bytes([2]) + _sub_blocks(_lzw_encode(idx.reshape(-1), 2))

    def gce(disposal=0, delay_cs=5, transparent=None):
        gflags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        return b"\x21\xf9" + struct.pack("<BBHBB", 4, gflags, delay_cs,
                                         transparent or 0, 0)

    full1 = np.full((h, w), 1, dtype=np.uint8)          # all red
    patch = np.full((3, 3), 2, dtype=np.uint8)          # green 3x3 ...
    patch[1, 1] = 3                                     # ... transparent hole
    full3 = np.full((h, w), 2, dtype=np.uint8)          # all green

    out += gce() + image_block(full1, 0, 0)
    out += gce(disposal=2, transparent=3) + image_block(patch, 2, 4)
    out += gce() + image_block(full3, 0, 0)
    out += b"\x3b"

    frames, delays = decode_gif(bytes(out))
    assert frames.shape == (3, h, w, 3)
    assert delays == [50, 50, 50]
    # frame 1: all red
    np.testing.assert_array_equal(frames[0],
                                  np.broadcast_to(pal[1], (h, w, 3)))
    # frame 2: red canvas + green patch at (4,2) with the hole kept red
    exp = np.broadcast_to(pal[1], (h, w, 3)).copy()
    exp[4:7, 2:5] = pal[2]
    exp[5, 3] = pal[1]                                  # transparent pixel
    np.testing.assert_array_equal(frames[1], exp)
    # frame 3: disposal 2 restored the patch area to bg before drawing,
    # then full green overwrote everything
    np.testing.assert_array_equal(frames[2],
                                  np.broadcast_to(pal[2], (h, w, 3)))


def test_gif_lzw_table_reset():
    """>4096 LZW codes forces a mid-stream clear; a large noisy frame
    exercises it."""
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 4, size=(80, 80, 3)) * 64).astype(np.uint8)
    out, _ = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(out[0], img)


def test_real_gif_through_frame_sampler(ray_session):
    from driftray.ops.multimodal import MEDIA_SCHEMA, sample_frames

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    expected = {}
    for i in range(5):
        frames = _limited_frames(n=6, seed=20 + i)
        expected[i] = frames
        rows["media_id"].append(i)
        rows["kind"].append("video")
        rows["format"].append("gif")
        rows["payload"].append(encode_gif(frames, delay_ms=100))
        rows["width"].append(31)
        rows["height"].append(23)
        rows["sample_rate"].append(0)
        rows["duration_ms"].append(600)
    t = pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
    out = (sample_frames(rd.from_arrow(t), n_frames=3, decoder="gif",
                         concurrency=2)
           .to_pandas().sort_values(["media_id", "frame_idx"])
           .reset_index(drop=True))
    assert len(out) == 15
    for _, row in out.iterrows():
        src = [0, 2, 5][row["frame_idx"]]     # linspace(0,5,3) -> 0, 2.5→2, 5
        exp_mean = expected[row["media_id"]][src].mean(axis=(0, 1))
        np.testing.assert_allclose(row["mean_rgb"], exp_mean, rtol=1e-5)
        assert row["frame_ms"] == src * 100


def test_gif_first_frame_through_image_decoder(ray_session):
    from driftray.ops.multimodal import ImageDecoder

    frames = _limited_frames(n=3)
    dec = ImageDecoder(decoder="gif")
    img = dec.decode(encode_gif(frames), 23, 31)
    np.testing.assert_array_equal(img, frames[0])


def test_gif_rejects_bad_input():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG....")
    with pytest.raises(ValueError, match="uint8"):
        encode_gif(np.zeros((4, 4, 3), dtype=np.float32))


def test_pyav_decoder_guard_or_roundtrip():
    """decoder='pyav' is import-guarded: a clear NotImplementedError when
    the av package is absent (this container), a real mp4 decode when it
    is present (runs wherever PyAV is installed)."""
    import pandas as pd
    import pytest

    from driftray.ops.multimodal import FrameSampler

    try:
        import av  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="PyAV"):
            FrameSampler(n_frames=3, decoder="pyav")
        return

    # real path: encode 6 solid frames to an in-memory mp4, sample 3
    import io

    frames = [np.full((32, 32, 3), v, dtype=np.uint8)
              for v in (0, 50, 100, 150, 200, 250)]
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("libx264", rate=10)
        stream.width, stream.height = 32, 32
        stream.pix_fmt = "yuv420p"
        for img in frames:
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            container.mux(stream.encode(frame))
        container.mux(stream.encode())
    batch = pd.DataFrame({"media_id": [1], "payload": [buf.getvalue()],
                          "duration_ms": [600]})
    out = FrameSampler(n_frames=3, decoder="pyav")(batch)
    assert list(out["frame_idx"]) == [0, 1, 2]
    assert len(out["mean_rgb"].iloc[0]) == 3
    # first sampled frame is the darkest, last the brightest (lossy codec
    # => loose ordering check, not exact values)
    means = [m.mean() for m in out["mean_rgb"]]
    assert means[0] < means[1] < means[2]
