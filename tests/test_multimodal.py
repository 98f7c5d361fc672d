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


# ---------------------------------------------------------------------------
# sf-grounded corpus (r7 VERDICT item #3)
# ---------------------------------------------------------------------------

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def test_media_from_documents_matches_synth_goldens(spark):
    """media_from_documents must be byte-identical to synth_media_df for
    the same ids — the goldens above transfer to the sf-grounded corpus
    unchanged (payload hash-chain, kind, and metadata all pure
    functions of the id on both paths)."""
    a = {r["media_id"]: r for r in mm.synth_media_df(spark, 64).collect()}
    b = {
        r["media_id"]: r
        for r in mm.media_from_documents(spark, SF001)
        .filter("media_id < 64")
        .collect()
    }
    assert set(a) == set(b)
    for i, ra in a.items():
        rb = b[i]
        assert ra["kind"] == rb["kind"]
        assert bytes(ra["data"]) == bytes(rb["data"])
        assert ra["meta"] == rb["meta"]


def test_multimodal_queries_scale_with_sf(spark):
    """The registered queries must ride the driver testdata: row counts
    scale with the documents table (500 docs at sf0.001/sf0.01, 5000 at
    sf0.1) instead of a fixed 64-row synth corpus."""
    import os

    from smart_contract_database_builder_spark.plans.registry import QUERIES

    small = QUERIES["llm_multimodal_image_features"].fn(spark, SF001).count()
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        pytest.skip("sf0.1 testdata absent")
    big = QUERIES["llm_multimodal_image_features"].fn(spark, SF1).count()
    # one media row per document, kind = id % 3 → about a third each
    assert small == len([i for i in range(500) if i % 3 == 0])
    assert big == len([i for i in range(5000) if i % 3 == 0])
    assert big > 9 * small  # 1667 vs 167 — scales with the table


def test_media_corpus_roundtrips_binary_parquet_via_corpus_sink(spark, tmp_path):
    """End-to-end through a BINARY-column parquet written by the corpus
    sink: write the sf-grounded media corpus hive-partitioned by kind,
    read it back, run the image feature stage, and compare against the
    direct (no-parquet-hop) result — payload bytes, metadata struct,
    and partition layout must all survive the roundtrip."""
    from smart_contract_database_builder_spark.sinks.corpus import (
        write_partitioned_corpus,
    )

    media = mm.media_from_documents(spark, SF001)
    path = str(tmp_path / "media_corpus")
    write_partitioned_corpus(media, path, partition_cols=("kind",))

    # hive layout: one directory per kind
    import os

    kinds = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("kind=")
    )
    assert kinds == ["audio", "image", "video"]

    back = spark.read.parquet(path)
    direct = {
        r["media_id"]: r for r in mm.extract_image_features(media).collect()
    }
    hopped = {
        r["media_id"]: r for r in mm.extract_image_features(back).collect()
    }
    assert set(direct) == set(hopped) and len(direct) > 0
    for mid, rd in direct.items():
        rh = hopped[mid]
        assert (
            rd["content_hash"] == rh["content_hash"]
            and rd["n_bytes"] == rh["n_bytes"]
            and rd["mean_byte"] == rh["mean_byte"]
            and rd["width"] == rh["width"]
        )


def test_raw_byte_hash_twin_matches_hex_form(spark):
    """llm_media_payload_dedup_raw (sha2 on the BINARY column, the
    production key) must produce the IDENTICAL dedup report to the
    oracle-carrying hex form (md5 over lowercase hex) — hex encoding
    is a bijection, so the (kind, content_key) group memberships, and
    therefore every copies/bytes aggregate, are the same."""
    from smart_contract_database_builder_spark import plans

    sf = "/root/testdata/sf0.001"
    cols = ["kind", "n_payloads", "n_rows", "n_dup_rows",
            "bytes_total", "bytes_unique"]

    def report(name):
        rows = plans.QUERIES[name].fn(spark, sf).collect()
        out = {}
        for r in rows:
            out[r["kind"]] = tuple(r[c] for c in cols[1:]) + (
                round(r["savings_ratio"], 12),
            )
        return out

    hexed = report("llm_media_payload_dedup")
    raw = report("llm_media_payload_dedup_raw")
    assert hexed == raw
    assert raw and all(v[1] > 0 for v in raw.values())  # non-vacuous
