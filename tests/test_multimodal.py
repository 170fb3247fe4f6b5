"""Multimodal binary-column pipeline with REAL dependency-free decode
(BMP struct parsing, stdlib-wave PCM16, NLV1 frame container)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from newslookout_ray.pipelines import multimodal as mm


class TestCodecs:
    def test_bmp_roundtrip_exact(self):
        rng = np.random.RandomState(0)
        px = rng.randint(0, 256, size=(13, 7, 3), dtype=np.uint8)  # odd width → padding
        assert (mm.decode_bmp(mm.encode_bmp(px)) == px).all()

    def test_wav_roundtrip_exact(self):
        samples = (np.sin(np.arange(800) * 0.1) * 20000).astype(np.int16)
        got, rate = mm.decode_wav(mm.encode_wav(samples))
        assert rate == mm.AUDIO_RATE
        assert (got == samples).all()

    def test_video_roundtrip_exact(self):
        rng = np.random.RandomState(1)
        frames = [rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8) for _ in range(4)]
        got = mm.decode_video(mm.encode_video(frames))
        assert len(got) == 4
        for a, b in zip(got, frames):
            assert (a == b).all()


class TestFeatureValues:
    def test_image_features_known_values(self):
        """A solid-color image has exactly-known channel means, zero gray
        std, and the encoded dims."""
        px = np.zeros((4, 8, 3), dtype=np.uint8)
        px[:, :, 0] = 255  # pure red
        stage = mm.MediaFeatureStage()
        f = stage._features(mm.encode_bmp(px), "image")
        assert f[0] == 1.0 and f[1] == 0.0 and f[2] == 0.0  # R/G/B means
        assert f[3] == 0.0  # solid color → zero std
        assert (f[4], f[5], f[6]) == (8.0, 4.0, 2.0)  # w, h, aspect

    def test_audio_features_known_values(self):
        """A full-scale square wave has RMS == peak == 1 (within int16
        quantization) and alternating-sign zero crossings."""
        samples = np.tile([32767, -32767], 400).astype(np.int16)
        stage = mm.MediaFeatureStage()
        f = stage._features(mm.encode_wav(samples), "audio")
        assert abs(f[0] - 32767 / 32768) < 1e-9  # rms
        assert abs(f[1] - 32767 / 32768) < 1e-9  # peak
        assert f[2] == 1.0  # every step crosses zero
        assert f[3] == 800 and f[4] == mm.AUDIO_RATE
        assert abs(f[5] - 800 / mm.AUDIO_RATE) < 1e-9

    def test_video_features_known_values(self):
        white = np.full((3, 5, 3), 255, dtype=np.uint8)
        black = np.zeros((3, 5, 3), dtype=np.uint8)
        stage = mm.MediaFeatureStage()
        f = stage._features(mm.encode_video([white, black]), "video")
        assert f[0] == 2.0  # frames
        assert abs(f[1] - 0.5) < 1e-9  # half white half black
        assert (f[5], f[6]) == (5.0, 3.0)


@pytest.mark.usefixtures("ray_session")
class TestMediaPipeline:
    def test_synth_real_formats_and_determinism(self):
        ds = mm.synth_media_dataset(50, seed=3)
        rows = sorted(ds.take_all(), key=lambda r: r["media_id"])
        assert len(rows) == 50
        assert set(r["kind"] for r in rows) == {"image", "audio", "video"}
        for r in rows:
            if r["kind"] == "image":
                px = mm.decode_bmp(r["payload"])
                assert px.shape == (r["height"], r["width"], 3)
            elif r["kind"] == "audio":
                samples, rate = mm.decode_wav(r["payload"])
                assert r["duration_ms"] == int(len(samples) * 1000 / rate)
            else:
                frames = mm.decode_video(r["payload"])
                assert frames[0].shape == (r["height"], r["width"], 3)
        rows2 = sorted(mm.synth_media_dataset(50, seed=3).take_all(), key=lambda r: r["media_id"])
        assert rows == rows2

    def test_featurize_decodes_for_real(self):
        out = sorted(mm.media_features(30, seed=3).take_all(), key=lambda r: r["media_id"])
        assert len(out) == 30
        assert all(len(r["features"]) == 8 for r in out)
        # image features carry real pixel dims (>= 8 per the generator)
        imgs = [r for r in out if r["kind"] == "image"]
        assert imgs and all(r["features"][4] >= 8 and r["features"][5] >= 8 for r in imgs)
        # audio features carry the true sample rate
        auds = [r for r in out if r["kind"] == "audio"]
        assert auds and all(r["features"][4] == mm.AUDIO_RATE for r in auds)

    def test_fake_decode_path_for_opaque_bytes(self):
        stage = mm.MediaFeatureStage(decode="fake")
        batch = pa.table({"media_id": [1], "kind": ["image"], "payload": [b"x" * 16]})
        out = stage(batch)
        assert len(out["features"][0].as_py()) == 8

    def test_frame_sampling_real(self):
        ds = mm.synth_media_dataset(40, seed=3)
        frames = ds.map_batches(mm.sample_frames, batch_format="pyarrow").take_all()
        assert frames
        assert all(f["frame_idx"] % 2 == 0 for f in frames)
        assert all(0.0 <= f["frame_mean"] <= 255.0 for f in frames)

    def test_resize_real(self):
        ds = mm.synth_media_dataset(10, seed=3)
        out = ds.map_batches(
            lambda b: mm.resize_images(b, 16, 12), batch_format="pyarrow"
        ).take_all()
        for r in out:
            if r["kind"] == "image":
                assert (r["width"], r["height"]) == (16, 12)
                assert mm.decode_bmp(r["payload"]).shape == (12, 16, 3)
