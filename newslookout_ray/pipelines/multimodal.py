"""Multimodal (binary-payload) column handling.

Images/audio/video are opaque ``binary`` columns with typed metadata
(driver brief). The decode libraries are not in this container, so the
decode kernels are STUBS behind a clearly-marked switch — the Ray-side
plumbing (schema, actor signature, batch sizing for large binary rows,
output layout) is real and tested:

  - ``synth_media_dataset``       deterministic fake payloads + metadata
  - ``MediaFeatureStage``         actor pool: per-payload feature vector
    (deterministic fake featurizer by default; ``decode="real"`` raises
    NotImplementedError at the exact point a real decoder plugs in)
  - ``resize_stub`` / ``sample_frames_stub``   signature-complete stubs

Batch-size note (scale): binary payloads dominate block size — the
stage is used with a small ``batch_size`` and ``batch_format="pyarrow"``
so payloads stay in Arrow buffers end-to-end (no pandas object-dtype
copies).
"""

from __future__ import annotations

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


def _h(seed: int, i: int, tag: bytes) -> int:
    key = seed.to_bytes(8, "big") + i.to_bytes(8, "big") + tag
    return int.from_bytes(blake2b(key, digest_size=8).digest(), "big")


def synth_media_dataset(n: int, seed: int = 42, payload_bytes: int = 4096):
    """Deterministic fake media rows (payload = seeded bytes)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        rows = {name: [] for name in MEDIA_SCHEMA.names}
        for i in ids:
            kind = _KINDS[_h(seed, i, b"kind") % 3]
            body = blake2b(
                seed.to_bytes(8, "big") + i.to_bytes(8, "big"), digest_size=32
            ).digest()
            payload = (body * (payload_bytes // 32 + 1))[:payload_bytes]
            rows["media_id"].append(i)
            rows["kind"].append(kind)
            rows["payload"].append(payload)
            rows["width"].append(64 + _h(seed, i, b"w") % 1920 if kind != "audio" else 0)
            rows["height"].append(64 + _h(seed, i, b"h") % 1080 if kind != "audio" else 0)
            rows["duration_ms"].append(
                int(_h(seed, i, b"d") % 60000) if kind != "image" else 0
            )
        return pa.table(
            {n_: pa.array(rows[n_], MEDIA_SCHEMA.field(n_).type) for n_ in MEDIA_SCHEMA.names}
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow", batch_size=512)


class MediaFeatureStage:
    """Actor-pool featurizer: payload → fixed-dim float vector.

    ``decode="fake"`` (default): deterministic hash-derived features —
    the payload bytes ARE read (real data movement), no media lib needed.
    ``decode="real"``: raises NotImplementedError at the decoder slot —
    this is where PIL/ffmpeg/torchaudio plug in; everything around it
    (actor init, batch loop, output schema) is unchanged.
    """

    def __init__(self, dim: int = 8, decode: str = "fake"):
        self.dim = dim
        self.decode = decode

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this sandbox — plug PIL/ffmpeg here; the Ray plumbing is done"
        )

    def _features(self, payload: bytes, kind: str) -> np.ndarray:
        if self.decode == "real":
            self._decode_real(payload, kind)
        digest = blake2b(payload, digest_size=self.dim).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0

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


def resize_stub(batch: pa.Table, width: int = 224, height: int = 224) -> pa.Table:
    """Image-resize stage signature: passes payloads through and records
    the target geometry (decode+resample is the NotImplementedError slot
    in MediaFeatureStage; layout/columns are the real contract)."""
    n = batch.num_rows
    batch = batch.set_column(
        batch.schema.get_field_index("width"), "width", pa.array([width] * n, pa.int32())
    )
    return batch.set_column(
        batch.schema.get_field_index("height"), "height", pa.array([height] * n, pa.int32())
    )


def sample_frames_stub(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling stage: emits (media_id, frame_ts_ms) rows from
    the metadata (the frame decode itself is the stubbed slot)."""
    ids, ts = [], []
    for mid, kind, dur in zip(
        batch["media_id"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["duration_ms"].to_pylist(),
    ):
        if kind != "video":
            continue
        for t in range(0, int(dur), every_ms):
            ids.append(mid)
            ts.append(t)
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()), "frame_ts_ms": pa.array(ts, pa.int32())}
    )


def media_features(n: int = 1000, seed: int = 42, concurrency: int = 2):
    """media synth → actor-pool featurize (small batches for binary rows)."""
    return synth_media_dataset(n, seed).map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
