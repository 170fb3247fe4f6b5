"""Multimodal binary-column plumbing (stubbed decode)."""

from __future__ import annotations

import pytest

from newslookout_ray.pipelines import multimodal as mm


@pytest.mark.usefixtures("ray_session")
class TestMediaPipeline:
    def test_synth_schema_and_determinism(self):
        ds = mm.synth_media_dataset(50, seed=3)
        rows = sorted(ds.take_all(), key=lambda r: r["media_id"])
        assert len(rows) == 50
        assert set(r["kind"] for r in rows) == {"image", "audio", "video"}
        assert all(len(r["payload"]) == 4096 for r in rows)
        rows2 = sorted(mm.synth_media_dataset(50, seed=3).take_all(), key=lambda r: r["media_id"])
        assert rows == rows2

    def test_featurize(self):
        out = sorted(mm.media_features(30, seed=3).take_all(), key=lambda r: r["media_id"])
        assert len(out) == 30
        assert all(len(r["features"]) == 8 for r in out)
        assert all(0.0 <= v <= 1.0 for r in out for v in r["features"])

    def test_real_decode_is_stubbed(self):
        stage = mm.MediaFeatureStage(decode="real")
        import pyarrow as pa

        batch = pa.table(
            {"media_id": [1], "kind": ["image"], "payload": [b"x" * 16]}
        )
        with pytest.raises(NotImplementedError):
            stage(batch)

    def test_frame_sampling(self):
        ds = mm.synth_media_dataset(40, seed=3)
        frames = ds.map_batches(mm.sample_frames_stub, batch_format="pyarrow").take_all()
        assert frames  # some videos exist
        assert all(f["frame_ts_ms"] % 1000 == 0 for f in frames)

    def test_resize_stub(self):
        ds = mm.synth_media_dataset(10, seed=3)
        out = ds.map_batches(mm.resize_stub, batch_format="pyarrow").take_all()
        assert all(r["width"] == 224 and r["height"] == 224 for r in out)
