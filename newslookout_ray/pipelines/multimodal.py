"""Multimodal (binary-payload) column handling with REAL decode.

Images/audio/video are opaque ``binary`` columns with typed metadata
(driver brief). No media libraries exist in this sandbox, so the decode
kernels are dependency-free implementations of self-describing formats:

  - image: uncompressed 24-bit BMP (struct-parsed headers, bottom-up
    BGR rows with 4-byte padding)
  - audio: PCM16 WAV via the stdlib ``wave`` module
  - video: a tiny deterministic frame container ("NLV1" magic + frame
    count/length + concatenated BMP frames) standing in for a real
    container; each frame decodes through the BMP path

``synth_media_dataset`` emits genuine payloads in those formats, and
``MediaFeatureStage`` computes features from DECODED pixels/samples by
default (``decode="fake"`` keeps the hash featurizer for opaque bytes;
a PIL/ffmpeg-backed decoder would replace the three ``decode_*``
functions without touching the Ray plumbing).

Batch-size note (scale): binary payloads dominate block size — the
stage is used with a small ``batch_size`` and ``batch_format="pyarrow"``
so payloads stay in Arrow buffers end-to-end (no pandas object-dtype
copies).
"""

from __future__ import annotations

import io
import struct
import wave
from hashlib import blake2b

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

_KINDS = ["image", "audio", "video"]

AUDIO_RATE = 8000
VIDEO_FPS = 4
_VIDEO_MAGIC = b"NLV1"


def _h(seed: int, i: int, tag: bytes) -> int:
    key = seed.to_bytes(8, "big") + i.to_bytes(8, "big") + tag
    return int.from_bytes(blake2b(key, digest_size=8).digest(), "big")


# ---------------------------------------------------------------------------
# encoders (synthesis) — real formats, deterministic content
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (3 * w + 3) & ~3
    pixel_bytes = row_size * h
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up rows, BGR channel order
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    return header + info + rows.tobytes()


def encode_wav(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """int16 mono samples → PCM16 WAV bytes (stdlib wave writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def encode_video(frames: list) -> bytes:
    """List of equal-shape (h, w, 3) uint8 frames → NLV1 container."""
    blobs = [encode_bmp(f) for f in frames]
    assert all(len(b) == len(blobs[0]) for b in blobs)
    return (
        _VIDEO_MAGIC
        + struct.pack("<II", len(blobs), len(blobs[0]) if blobs else 0)
        + b"".join(blobs)
    )


# ---------------------------------------------------------------------------
# decoders — dependency-free real parsing
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=row_size * h, offset=off).reshape(
        h, row_size
    )
    bgr = rows[:, : 3 * w].reshape(h, w, 3)[::-1]
    return bgr[:, :, ::-1]


def decode_wav(payload: bytes) -> tuple:
    """PCM16 WAV bytes → (int16 samples ndarray, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as fh:
        rate = fh.getframerate()
        raw = fh.readframes(fh.getnframes())
    return np.frombuffer(raw, dtype="<i2"), rate


def decode_video(payload: bytes) -> list:
    """NLV1 container bytes → list of (h, w, 3) uint8 RGB frames."""
    if payload[:4] != _VIDEO_MAGIC:
        raise ValueError("not an NLV1 payload")
    n, frame_len = struct.unpack_from("<II", payload, 4)
    out = []
    off = 12
    for _ in range(n):
        out.append(decode_bmp(payload[off : off + frame_len]))
        off += frame_len
    return out


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------


def synth_media_dataset(n: int, seed: int = 42):
    """Deterministic REAL-format media rows: BMP images, PCM16 WAV audio,
    NLV1 (BMP-frame) video. width/height/duration metadata columns match
    the decoded payloads exactly."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in MEDIA_SCHEMA.names}
        for i in batch["id"].to_pylist():
            kind = _KINDS[_h(seed, i, b"kind") % 3]
            rng = np.random.RandomState((seed * 1_000_003 + i) % (2**31))
            if kind == "image":
                w = 8 + _h(seed, i, b"w") % 56
                h = 8 + _h(seed, i, b"h") % 56
                payload = encode_bmp(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
                dur = 0
            elif kind == "audio":
                n_samp = AUDIO_RATE // 4 + int(_h(seed, i, b"d") % AUDIO_RATE)  # 0.25–1.25 s
                t = np.arange(n_samp)
                freq = 100 + _h(seed, i, b"f") % 1900
                samples = (np.sin(2 * np.pi * freq * t / AUDIO_RATE) * 12000).astype(np.int16)
                payload = encode_wav(samples)
                w = h = 0
                dur = int(n_samp * 1000 / AUDIO_RATE)
            else:
                w = 8 + _h(seed, i, b"w") % 24
                h = 8 + _h(seed, i, b"h") % 24
                n_frames = 2 + _h(seed, i, b"nf") % 6
                frames = [
                    rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                    for _ in range(n_frames)
                ]
                payload = encode_video(frames)
                dur = int(n_frames * 1000 / VIDEO_FPS)
            rows["media_id"].append(i)
            rows["kind"].append(kind)
            rows["payload"].append(payload)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(dur)
        return pa.table(
            {n_: pa.array(rows[n_], MEDIA_SCHEMA.field(n_).type) for n_ in MEDIA_SCHEMA.names}
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow", batch_size=512)


# ---------------------------------------------------------------------------
# featurize / resize / frame-sample stages
# ---------------------------------------------------------------------------


class MediaFeatureStage:
    """Actor-pool featurizer: payload → fixed 8-dim float vector computed
    from DECODED content (default). Feature layout:

      image: [mean_r, mean_g, mean_b, gray_std, w, h, aspect, 0] (/255
             for the channel stats; dims raw)
      audio: [rms, peak, zero_cross_rate, n_samples, rate, dur_s, mean, 0]
             (rms/peak/mean normalized to [-1, 1] int16 full scale)
      video: [n_frames, mean_r, mean_g, mean_b, gray_std, w, h, 0]

    ``decode="fake"`` keeps the hash featurizer for opaque payloads.
    """

    def __init__(self, dim: int = 8, decode: str = "real"):
        self.dim = dim
        self.decode = decode

    def _features(self, payload: bytes, kind: str) -> np.ndarray:
        if self.decode == "fake":
            digest = blake2b(payload, digest_size=self.dim).digest()
            return np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        out = np.zeros(self.dim, dtype=np.float64)
        if kind == "image":
            px = decode_bmp(payload).astype(np.float64)
            h, w, _ = px.shape
            gray = px.mean(axis=2)
            out[:7] = [
                px[:, :, 0].mean() / 255.0,
                px[:, :, 1].mean() / 255.0,
                px[:, :, 2].mean() / 255.0,
                gray.std() / 255.0,
                w,
                h,
                w / h,
            ]
        elif kind == "audio":
            samples, rate = decode_wav(payload)
            x = samples.astype(np.float64) / 32768.0
            zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if len(x) > 1 else 0
            out[:7] = [
                float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                float(np.abs(x).max()) if len(x) else 0.0,
                zc / max(1, len(x) - 1),
                len(x),
                rate,
                len(x) / rate,
                float(x.mean()) if len(x) else 0.0,
            ]
        elif kind == "video":
            frames = decode_video(payload)
            stack = np.stack(frames).astype(np.float64)  # (n, h, w, 3)
            gray = stack.mean(axis=3)
            out[:7] = [
                len(frames),
                stack[..., 0].mean() / 255.0,
                stack[..., 1].mean() / 255.0,
                stack[..., 2].mean() / 255.0,
                gray.std() / 255.0,
                stack.shape[2],
                stack.shape[1],
            ]
        else:
            raise ValueError(f"unknown media kind {kind!r}")
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(p, k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


def resize_images(batch: pa.Table, width: int = 32, height: int = 32) -> pa.Table:
    """REAL image resize: decode BMP → nearest-neighbor resample with
    numpy index maps → re-encode BMP. Non-image rows pass through."""
    payloads = batch["payload"].to_pylist()
    kinds = batch["kind"].to_pylist()
    out_payloads, out_w, out_h = [], [], []
    for p, k, w0, h0 in zip(
        payloads, kinds, batch["width"].to_pylist(), batch["height"].to_pylist()
    ):
        if k != "image":
            out_payloads.append(p)
            out_w.append(w0)
            out_h.append(h0)
            continue
        px = decode_bmp(p)
        ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
        xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
        out_payloads.append(encode_bmp(px[ys][:, xs]))
        out_w.append(width)
        out_h.append(height)
    idx = batch.schema.get_field_index
    batch = batch.set_column(idx("payload"), "payload", pa.array(out_payloads, pa.large_binary()))
    batch = batch.set_column(idx("width"), "width", pa.array(out_w, pa.int32()))
    return batch.set_column(idx("height"), "height", pa.array(out_h, pa.int32()))


def sample_frames(batch: pa.Table, every: int = 2) -> pa.Table:
    """REAL video frame sampling: decode the container and emit one row
    per sampled frame with its decoded mean intensity."""
    ids, fidx, ts, means = [], [], [], []
    for mid, kind, payload in zip(
        batch["media_id"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["payload"].to_pylist(),
    ):
        if kind != "video":
            continue
        frames = decode_video(payload)
        for j in range(0, len(frames), every):
            ids.append(mid)
            fidx.append(j)
            ts.append(int(j * 1000 / VIDEO_FPS))
            means.append(float(frames[j].mean()))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_ts_ms": pa.array(ts, pa.int32()),
            "frame_mean": pa.array(means, pa.float64()),
        }
    )


def media_features(n: int = 1000, seed: int = 42, concurrency: int = 2):
    """media synth → actor-pool featurize (small batches for binary rows)."""
    return synth_media_dataset(n, seed).map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
