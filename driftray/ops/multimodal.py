"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
(format, width/height or sample rate, duration).  Decode / resize /
feature-extract / frame-sample are actor-pool ``map_batches`` stages.
Codec paths, most capable first:

* ``decoder="pillow"`` — PIL when importable (any format); raises
  ``NotImplementedError`` otherwise (PIL is absent in this container);
* ``decoder="png"`` — REAL baseline-PNG decode via the dependency-free
  ``ops/png.py`` codec (stdlib zlib), round-trip tested on real bytes;
* ``decoder="jpeg"`` — REAL baseline-JPEG (``ops/jpeg.py``: stream's own
  DQT/DHT, 4:2:0, restart markers);
* ``decoder="gif"`` — REAL GIF89a incl. animation (``ops/gif.py``: LZW,
  disposal, transparency, interlace) — also the real
  ``FrameSampler(decoder="gif")`` video path;
* ``AudioDecoder`` — REAL WAV decode via stdlib ``wave``;
* ``decoder="fake"`` — deterministic hash-seeded stand-in for container
  formats that genuinely need an absent library (mp4, webm, ...).

Scale notes: binary payloads are large → small ``batch_size`` (64-256) and
``num_cpus`` sized so decode pools don't starve the read stage; outputs
carry fixed-size numpy arrays (Arrow tensor-like lists), never Python
objects.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("format", pa.string()),         # png | jpeg | wav | mp4 | ...
    ("payload", pa.binary()),
    ("width", pa.int32()),           # images/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),     # audio
    ("duration_ms", pa.int32()),     # audio/video
])


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes) matching
    MEDIA_SCHEMA — the test/bench stand-in for real blobs."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["format"].append("png" if kind == "image" else "wav")
        size = int(rng.integers(256, 4096))
        rows["payload"].append(hashlib.sha256(f"{seed}|{i}".encode()).digest() * (size // 32 + 1))
        rows["width"].append(int(rng.integers(16, 256)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 256)) if kind != "audio" else 0)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 5000)))
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def _as_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize a decoded image to HxWx3 (grayscale broadcast, alpha drop)."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    return img[:, :, :3]


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decoder: payload hash seeds a tiny image."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(max(h, 1), max(w, 1), 3), dtype=np.uint8)


def make_image_decoder(decoder: str):
    """Codec selection shared by every image stage (``ImageDecoder``,
    ``PHasher``): returns ``(payload, h, w) -> HxWx3 uint8``.  Selection
    happens once per ACTOR (callers invoke this in ``__init__``), so the
    per-payload path is a bound callable with no dispatch."""
    if decoder == "fake":
        return _fake_decode
    if decoder == "png":
        # REAL codec, zero external deps: baseline-PNG via stdlib zlib
        # (ops/png.py) — decodes actual image bytes in this container
        from .png import decode_png

        return lambda payload, h, w: _as_rgb(decode_png(payload))
    if decoder == "jpeg":
        # REAL codec, zero external deps: baseline-sequential JPEG
        # (ops/jpeg.py) — honors the stream's own DQT/DHT, chroma
        # subsampling, and restart intervals
        from .jpeg import decode_jpeg

        return lambda payload, h, w: _as_rgb(decode_jpeg(payload))
    if decoder == "gif":
        # REAL codec, zero external deps (ops/gif.py) — first frame
        from .gif import decode_gif

        return lambda payload, h, w: _as_rgb(decode_gif(payload)[0][0])
    if decoder == "pillow":
        try:
            import PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                "decoder='pillow' needs PIL, which is not importable "
                "here; decoder='png' is the dependency-free real-codec "
                "path, decoder='fake' the deterministic stub") from e
        import io

        def _pil_decode(payload: bytes, h: int, w: int) -> np.ndarray:
            img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)

        return _pil_decode
    raise ValueError(f"unknown decoder {decoder!r} "
                     "(expected fake|png|jpeg|gif|pillow)")


class ImageDecoder:
    """Actor-pool stage: binary payload → decoded pixels → mean-channel
    features + optional thumbnail.  Real plumbing, stubbed codec."""

    def __init__(self, decoder: str = "fake", thumb: int = 8):
        self.thumb = thumb
        self.decode = make_image_decoder(decoder)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, thumbs = [], []
        for payload, h, w in zip(batch["payload"], batch["height"], batch["width"]):
            img = self.decode(payload, int(h), int(w))
            feats.append(img.mean(axis=(0, 1)).astype(np.float32))
            # nearest-neighbour resize to thumb×thumb — pure numpy
            ys = np.linspace(0, img.shape[0] - 1, self.thumb).astype(int)
            xs = np.linspace(0, img.shape[1] - 1, self.thumb).astype(int)
            thumbs.append(img[np.ix_(ys, xs)].ravel())
        out = batch[["media_id", "kind", "format"]].copy()
        out["mean_rgb"] = feats
        out["thumbnail"] = thumbs
        return out


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n×n): row k = sqrt(2/n)·cos(π(2j+1)k/2n),
    row 0 scaled to sqrt(1/n).  ``D @ g @ D.T`` is the 2-D DCT."""
    j = np.arange(n)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * j[None, :] + 1)
                                  * j[:, None] / (2 * n))
    d[0] = np.sqrt(1.0 / n)
    return d


def _area_resize_gray(img: np.ndarray, n: int = 32) -> np.ndarray:
    """HxWx3 (or HxW) → n×n float grayscale by AREA AVERAGING (integral
    image), the anti-aliased reduction pHash needs — nearest-neighbour
    sampling would alias high-frequency content straight into the DCT's
    low bins and break near-dup invariance.  Images smaller than n×n are
    first pixel-replicated up (replication adds no frequency content)."""
    g = (img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
         if img.ndim == 3 else img.astype(np.float64))
    if g.shape[0] < n:
        g = np.repeat(g, -(-n // g.shape[0]), axis=0)
    if g.shape[1] < n:
        g = np.repeat(g, -(-n // g.shape[1]), axis=1)
    h, w = g.shape
    integ = np.zeros((h + 1, w + 1))
    integ[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
    # bin edges strictly increase because the linspace step is >= 1 here
    ye = np.round(np.linspace(0, h, n + 1)).astype(np.int64)
    xe = np.round(np.linspace(0, w, n + 1)).astype(np.int64)
    sums = (integ[ye[1:], :][:, xe[1:]] - integ[ye[:-1], :][:, xe[1:]]
            - integ[ye[1:], :][:, xe[:-1]] + integ[ye[:-1], :][:, xe[:-1]])
    areas = np.outer(ye[1:] - ye[:-1], xe[1:] - xe[:-1])
    return sums / areas


_PHASH_DCT = _dct_matrix(32)
_PHASH_BITS = np.arange(64, dtype=np.uint64)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash (standard pHash construction): area-resize
    to 32×32 grayscale, 2-D DCT, keep the top-left 8×8 low-frequency block,
    threshold each coefficient against the block's median.  Robust to
    re-encoding, mild noise, brightness shifts and resizing; Hamming
    distance ≤ ~6-10 of 64 flags a near-duplicate."""
    low = (_PHASH_DCT @ _area_resize_gray(img, 32) @ _PHASH_DCT.T)[:8, :8]
    bits = (low > np.median(low)).ravel()
    return int((bits.astype(np.uint64) << _PHASH_BITS).sum())


class PHasher:
    """Actor-pool stage: binary image payload → 64-bit perceptual hash.
    Codec bound once per actor; emits (id, phash:int64) — 8 bytes/row into
    any downstream exchange, the image bytes never leave this stage."""

    def __init__(self, decoder: str = "png", id_col: str = "media_id"):
        self.decode = make_image_decoder(decoder)
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hashes = np.empty(len(batch), dtype=np.uint64)
        for i, (payload, h, w) in enumerate(zip(
                batch["payload"], batch["height"], batch["width"])):
            hashes[i] = phash64(self.decode(payload, int(h), int(w)))
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "phash": hashes.astype(np.int64)})


def phash_images(ds: rd.Dataset, decoder: str = "png",
                 id_col: str = "media_id", batch_size: int = 128,
                 concurrency: int = 4) -> rd.Dataset:
    """Perceptual-hash pipeline: small batches (binary payloads are wide),
    actor pool so the codec initializes once per actor."""
    return ds.select_columns([id_col, "payload", "width", "height"]) \
        .map_batches(PHasher, fn_constructor_args=(decoder, id_col),
                     batch_format="pandas", batch_size=batch_size,
                     concurrency=concurrency)


def phash_image_dedup(ds: rd.Dataset, decoder: str = "png",
                      id_col: str = "media_id", max_hamming: int = 6,
                      num_bands: int = 8, batch_size: int = 128,
                      concurrency: int = 4,
                      spill_threshold: int | None = None,
                      spill_partitions: int = 64) -> rd.Dataset:
    """Image near-duplicate clustering: decode + pHash per actor batch,
    then the banded-pigeonhole Hamming dedup (``dedup.hamming64_dedup``,
    8×8-bit bands cover Hamming ≤ 7).  The only cross-stage data is the
    8-byte hash per image — decode stays where the bytes are, the
    exchange is fingerprint-sized, and clustering spills to distributed
    connected components exactly like the text dedup family."""
    from .dedup import hamming64_dedup

    hashes = phash_images(ds, decoder=decoder, id_col=id_col,
                          batch_size=batch_size, concurrency=concurrency)
    return hamming64_dedup(hashes, id_col, "phash", max_hamming=max_hamming,
                           num_bands=num_bands,
                           spill_threshold=spill_threshold,
                           spill_partitions=spill_partitions)


class FrameSampler:
    """Video frame-sampling stage: emits ``n_frames`` frame features per
    clip (flat_map-shaped: one row per sampled frame).

    ``decoder="gif"`` decodes REAL animated-GIF payloads with the
    dependency-free ``ops/gif.py`` codec (LZW, disposal, transparency,
    interlace) — frames are sampled evenly across the clip's actual
    frame list and ``frame_ms`` is the frame's true start time from the
    stream's own delays.  ``decoder="pyav"`` decodes real container
    formats (mp4/webm/mkv) through PyAV/ffmpeg when the ``av`` package
    is importable — import-guarded because this container does not ship
    it; the decode happens once per clip in ``__call__`` while the
    import cost is paid once per ACTOR in ``__init__``.
    ``decoder="fake"`` is the deterministic stand-in when neither real
    path applies."""

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        self.n = n_frames
        self.mode = decoder
        if decoder == "gif":
            from .gif import decode_gif

            self._decode = decode_gif
        elif decoder == "pyav":
            try:
                import av
            except ImportError as e:
                raise NotImplementedError(
                    "decoder='pyav' needs the 'av' (PyAV/ffmpeg) package, "
                    "which is not importable here; decoder='gif' is the "
                    "dependency-free real-codec path, decoder='fake' the "
                    "deterministic stub") from e
            self._av = av
        elif decoder != "fake":
            raise NotImplementedError(
                "decoder must be 'gif' (real, dependency-free), 'pyav' "
                "(real mp4/webm via PyAV when installed) or 'fake'")

    def _pyav_frames(self, payload: bytes):
        """Decode every video frame of a container payload → (frames,
        start_ms list).  Frames decode sequentially (containers are not
        random-access without an index); sampling picks evenly after."""
        import io

        with self._av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            tb = float(stream.time_base) if stream.time_base else 0.0
            frames, starts = [], []
            for frame in container.decode(stream):
                frames.append(frame.to_ndarray(format="rgb24"))
                pts = frame.pts if frame.pts is not None else len(starts)
                starts.append(int(pts * tb * 1000.0) if tb else 0)
        return frames, starts

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"media_id": [], "frame_idx": [], "frame_ms": [], "mean_rgb": []}
        for mid, payload, dur in zip(batch["media_id"], batch["payload"],
                                     batch["duration_ms"]):
            if self.mode in ("gif", "pyav"):
                if self.mode == "gif":
                    frames, delays = self._decode(payload)
                    starts = np.concatenate([[0], np.cumsum(delays[:-1])])
                else:
                    frames, starts = self._pyav_frames(payload)
                picks = np.linspace(0, len(frames) - 1,
                                    self.n).round().astype(int)
                for f, src in enumerate(picks):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["frame_ms"].append(int(starts[src]))
                    out["mean_rgb"].append(
                        frames[src].mean(axis=(0, 1)).astype(np.float32))
                continue
            for f in range(self.n):
                ms = int(dur) * f // max(self.n - 1, 1)
                img = _fake_decode(payload + f.to_bytes(2, "little"), 16, 16)
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["frame_ms"].append(ms)
                out["mean_rgb"].append(img.mean(axis=(0, 1)).astype(np.float32))
        return pd.DataFrame(out)


def decode_images(ds: rd.Dataset, decoder: str = "fake",
                  batch_size: int = 128, concurrency: int = 4) -> rd.Dataset:
    """Image decode pipeline: small batches (binary payloads are wide),
    actor pool so any real codec initializes once per actor."""
    return ds.map_batches(ImageDecoder, fn_constructor_args=(decoder,),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds: rd.Dataset, n_frames: int = 4, decoder: str = "fake",
                  batch_size: int = 64, concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(FrameSampler,
                          fn_constructor_args=(n_frames, decoder),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def video_phash64(frames, n_sample: int = 8) -> int:
    """64-bit video fingerprint: pHash of ``n_sample`` evenly-spaced frames,
    combined per-bit by MAJORITY vote.  Majority (not concat/XOR) makes the
    code robust to any single frame's perturbation while keeping the
    8-byte footprint the Hamming-band clusterer expects; the cost is
    insensitivity to frame ORDER, which content-level near-dup detection
    wants anyway (a re-encode never reorders frames)."""
    picks = np.linspace(0, len(frames) - 1, n_sample).round().astype(int)
    hs = np.array([phash64(frames[i]) for i in picks], dtype=np.uint64)
    bits = (hs[:, None] >> _PHASH_BITS[None, :]) & np.uint64(1)
    maj = (bits.sum(axis=0) * 2 > len(hs)).astype(np.uint64)
    return int((maj << _PHASH_BITS).sum())


class VideoHasher:
    """Actor-pool stage: video payload → 64-bit majority pHash.
    ``decoder='gif'`` is the real in-container path (ops/gif.py decodes
    every frame); ``'fake'`` hash-seeds deterministic frames for container
    formats whose codec is absent."""

    def __init__(self, decoder: str = "gif", id_col: str = "media_id",
                 n_sample: int = 8):
        self.mode = decoder
        self.id_col = id_col
        self.n = n_sample
        if decoder == "gif":
            from .gif import decode_gif

            self._decode = decode_gif
        elif decoder != "fake":
            raise NotImplementedError(
                "decoder must be 'gif' (real, dependency-free) or 'fake'")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(batch), dtype=np.uint64)
        for i, payload in enumerate(batch["payload"]):
            if self.mode == "gif":
                frames, _delays = self._decode(payload)
                frames = list(frames)
            else:
                frames = [_fake_decode(payload + f.to_bytes(2, "little"),
                                       16, 16) for f in range(self.n)]
            fps[i] = video_phash64(frames, self.n)
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "vfp": fps.astype(np.int64)})


def video_dedup(ds: rd.Dataset, decoder: str = "gif",
                id_col: str = "media_id", max_hamming: int = 7,
                num_bands: int = 8, n_sample: int = 8,
                batch_size: int = 64, concurrency: int = 4,
                spill_threshold: int | None = None,
                spill_partitions: int = 64) -> rd.Dataset:
    """Video near-duplicate clustering: decode + majority pHash per actor
    batch, then the shared banded-pigeonhole Hamming dedup — same
    8-bytes-per-clip exchange shape as ``phash_image_dedup``."""
    from .dedup import hamming64_dedup

    fps = ds.select_columns([id_col, "payload"]).map_batches(
        VideoHasher, fn_constructor_args=(decoder, id_col, n_sample),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)
    return hamming64_dedup(fps, id_col, "vfp", max_hamming=max_hamming,
                           num_bands=num_bands,
                           spill_threshold=spill_threshold,
                           spill_partitions=spill_partitions)


_FP_DCT64 = _dct_matrix(64)
_FP_DCT32 = _dct_matrix(32)


def _resize1d(v: np.ndarray, n: int) -> np.ndarray:
    """1-D area-average resample to n bins (cumsum form of the integral
    image used by ``_area_resize_gray``); shorter-than-n inputs are
    replicated up first."""
    m = len(v)
    if m < n:
        v = np.repeat(v, -(-n // m))
        m = len(v)
    cs = np.concatenate([[0.0], np.cumsum(v)])
    e = np.round(np.linspace(0, m, n + 1)).astype(np.int64)
    return (cs[e[1:]] - cs[e[:-1]]) / (e[1:] - e[:-1])


def audio_fingerprint64(samples: np.ndarray, nwin: int = 256,
                        hop: int = 128, floor_db: float = -30.0,
                        deadband: float = 0.02) -> int:
    """64-bit spectral fingerprint of a clip: 48 bits from the DCT of the
    time-averaged dB spectrum + 16 bits from the DCT of the per-frame
    energy envelope, each thresholded at median + ``deadband``·spread.

    Design notes (each knob earns its keep):
    * dB relative to the clip's PEAK bin → gain-invariant;
    * ``floor_db`` clamp → a near-dup's added noise floor lands below the
      clamp on both sides instead of reshaping every spectral valley;
    * the freq/time SPLIT (not a 2-D DCT of the spectrogram) → a
      stationary clip (constant spectrogram rows) still yields 48
      informative frequency bits, where a square 8×8 2-D block collapses
      to ~7 sign-of-epsilon bits;
    * ``deadband`` → coefficients near the median (pure numeric noise on
      quiet content) emit a stable 0 instead of a coin flip.

    Hamming ≤ ~7 of 64 flags a re-encoded / re-gained / mildly noisy copy;
    distinct content measures ≥ ~20 (tested over tone-mixture corpora)."""
    x = np.asarray(samples, np.float64)
    if len(x) < nwin:
        x = np.pad(x, (0, nwin - len(x)))
    nf = 1 + (len(x) - nwin) // hop
    idx = np.arange(nwin)[None, :] + hop * np.arange(nf)[:, None]
    frames = x[idx] * np.hanning(nwin)
    p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    ref = p.max() or 1.0
    g = np.maximum(10 * np.log10(np.maximum(p / ref, 1e-12)), floor_db)

    def bits_of(coefs: np.ndarray, k: int) -> np.ndarray:
        med = np.median(coefs)
        spread = np.ptp(coefs) or 1.0
        return (coefs > med + deadband * spread)[:k]

    fb = bits_of((_FP_DCT64 @ _resize1d(g.mean(axis=0), 64))[1:], 48)
    tb = bits_of((_FP_DCT32 @ _resize1d(g.mean(axis=1), 32))[1:], 16)
    bits = np.concatenate([fb, tb]).astype(np.uint64)
    return int((bits << _PHASH_BITS).sum())


class AudioFingerprinter:
    """Actor-pool stage: WAV payload → 64-bit spectral fingerprint.
    Real stdlib decode (``AudioDecoder._decode``); emits (id, afp:int64) —
    8 bytes/row downstream, audio bytes never leave the stage."""

    def __init__(self, id_col: str = "media_id"):
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(batch), dtype=np.uint64)
        for i, payload in enumerate(batch["payload"]):
            x, _rate = AudioDecoder._decode(payload)
            fps[i] = audio_fingerprint64(x)
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "afp": fps.astype(np.int64)})


def audio_fingerprints(ds: rd.Dataset, id_col: str = "media_id",
                       batch_size: int = 128,
                       concurrency: int = 4) -> rd.Dataset:
    return ds.select_columns([id_col, "payload"]).map_batches(
        AudioFingerprinter, fn_constructor_args=(id_col,),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)


def audio_dedup(ds: rd.Dataset, id_col: str = "media_id",
                max_hamming: int = 7, num_bands: int = 8,
                batch_size: int = 128, concurrency: int = 4,
                spill_threshold: int | None = None,
                spill_partitions: int = 64) -> rd.Dataset:
    """Audio near-duplicate clustering: decode + fingerprint per actor
    batch, then the shared banded-pigeonhole Hamming dedup — the same
    fingerprint-sized-exchange shape as ``phash_image_dedup``."""
    from .dedup import hamming64_dedup

    fps = audio_fingerprints(ds, id_col=id_col, batch_size=batch_size,
                             concurrency=concurrency)
    return hamming64_dedup(fps, id_col, "afp", max_hamming=max_hamming,
                           num_bands=num_bands,
                           spill_threshold=spill_threshold,
                           spill_partitions=spill_partitions)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


class AudioDecoder:
    """Actor-pool stage decoding REAL WAV payloads with stdlib ``wave`` —
    no external audio library needed.  Emits per-clip features (rms,
    peak, duration) the curation pipeline filters on."""

    def __init__(self, decoder: str = "wav"):
        if decoder != "wav":
            raise NotImplementedError(
                "only stdlib WAV decode ships in this container; "
                "compressed formats need pyav/soundfile")

    @staticmethod
    def _decode(payload: bytes) -> tuple[np.ndarray, int]:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            n = f.getnframes()
            raw = f.readframes(n)
            width = f.getsampwidth()
        if width == 1:
            # 8-bit WAV PCM is UNSIGNED with silence at 128 — center it
            return (np.frombuffer(raw, dtype=np.uint8)
                    .astype(np.int16) - 128), rate
        if width == 3:
            # 24-bit little-endian: assemble and sign-extend
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            v = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            return np.where(v >= 1 << 23, v - (1 << 24), v), rate
        dtype = {2: np.int16, 4: np.int32}.get(width)
        if dtype is None:
            raise NotImplementedError(f"WAV sample width {width}")
        return np.frombuffer(raw, dtype=dtype), rate

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rms, peak, dur, rates = [], [], [], []
        for payload in batch["payload"]:
            x, rate = self._decode(payload)
            xf = x.astype(np.float64)
            rms.append(float(np.sqrt(np.mean(xf ** 2))) if len(x) else 0.0)
            peak.append(int(np.abs(x).max()) if len(x) else 0)
            dur.append(int(len(x) * 1000 / rate))
            rates.append(rate)
        out = batch[["media_id", "kind", "format"]].copy()
        out["rms"] = np.array(rms, dtype=np.float64)
        out["peak"] = np.array(peak, dtype=np.int64)
        out["decoded_ms"] = np.array(dur, dtype=np.int64)
        out["sample_rate"] = np.array(rates, dtype=np.int64)
        return out


def decode_audio(ds: rd.Dataset, batch_size: int = 128,
                 concurrency: int = 4) -> rd.Dataset:
    """WAV decode pipeline over binary payload columns (real codec)."""
    return ds.map_batches(AudioDecoder, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
