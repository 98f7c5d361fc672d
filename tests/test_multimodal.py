"""Multimodal plumbing: Arrow batch shapes, deterministic fake decode,
fan-out frame sampling, import-gated real codec path."""

from __future__ import annotations

import hashlib

import pytest

from smart_contract_database_builder_spark.sources import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media_df(spark, n=30)


def test_corpus_is_deterministic(spark):
    a = {r["media_id"]: bytes(r["data"]) for r in mm.synth_media_df(spark, 12).collect()}
    b = {r["media_id"]: bytes(r["data"]) for r in mm.synth_media_df(spark, 12).collect()}
    assert a == b


def test_image_features_only_images_cross_boundary(media):
    feats = mm.extract_image_features(media).collect()
    n_images = media.filter(media.kind == "image").count()
    assert len(feats) == n_images > 0
    for r in feats:
        assert r["width"] and r["height"] and r["n_bytes"] > 0


def test_image_features_match_python_oracle(media):
    feats = {r["media_id"]: r for r in mm.extract_image_features(media).collect()}
    for row in media.filter(media.kind == "image").collect():
        data = bytes(row["data"])
        got = feats[row["media_id"]]
        assert got["content_hash"] == hashlib.md5(data).hexdigest()
        assert got["mean_byte"] == pytest.approx(sum(data) / len(data))


def test_audio_features_match_python_oracle(media):
    feats = {r["media_id"]: r for r in mm.extract_audio_features(media).collect()}
    audio_rows = media.filter(media.kind == "audio").collect()
    assert len(feats) == len(audio_rows) > 0
    for row in audio_rows:
        data = bytes(row["data"])
        windows = mm.fake_audio_windows(data)
        got = feats[row["media_id"]]
        assert got["sample_rate"] == 16000
        assert got["n_windows"] == len(windows)
        assert got["mean_amplitude"] == pytest.approx(sum(windows) / len(windows))
        assert got["peak_window"] == max(range(len(windows)), key=windows.__getitem__)


def test_resize_stage_contract(media):
    """Resize: images only, fixed output dims, payload sized w×h, and
    byte-for-byte deterministic across invocations."""
    a = {r["media_id"]: r for r in mm.resize_images(media, 16, 12).collect()}
    b = {r["media_id"]: bytes(r["data"]) for r in mm.resize_images(media, 16, 12).collect()}
    n_images = media.filter(media.kind == "image").count()
    assert len(a) == n_images > 0
    for mid, r in a.items():
        assert (r["width"], r["height"]) == (16, 12)
        assert r["src_width"] is not None and r["src_height"] is not None
        assert len(bytes(r["data"])) == 16 * 12
        assert bytes(r["data"]) == b[mid]


def test_frame_sampling_fan_out(media):
    frames = mm.sample_video_frames(media, every_ms=500).collect()
    videos = {r["media_id"]: r for r in media.filter(media.kind == "video").collect()}
    assert len(frames) > len(videos)  # 1→N fan-out happened
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    for mid, fs in by_media.items():
        duration = videos[mid]["meta"]["duration_ms"]
        assert len(fs) == len(range(0, duration, 500))
        assert sorted(f["frame_idx"] for f in fs) == list(range(len(fs)))


def test_real_decode_path_is_gated():
    if mm.Image is None:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"not-an-image")
