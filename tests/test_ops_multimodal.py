"""Multimodal plumbing tests: byte-header parsing, stubbed decode, batch
shape, errors-as-rows."""

from archvisier_spark.ops.multimodal import (
    build_simg,
    decode_image,
    image_features,
    media_table,
    parse_media_metadata,
)

import pytest


def test_simg_roundtrip_decode():
    blob = build_simg(64, 48, 3, seed=7)
    img = decode_image(blob)
    assert (img["width"], img["height"], img["channels"]) == (64, 48, 3)


def test_decode_real_media_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF-like jpeg header")


def test_metadata_parse_distributed(spark):
    meta = {r["media_id"]: r for r in parse_media_metadata(media_table(spark, 60)).collect()}
    assert len(meta) == 60
    imgs = [r for r in meta.values() if r["format"] == "simg"]
    wavs = [r for r in meta.values() if r["format"] == "wav"]
    junk = [r for r in meta.values() if r["format"] == "unknown"]
    assert len(imgs) == 20 and len(wavs) == 20 and len(junk) == 20
    assert all(r["width"] > 0 and r["channels"] in (1, 3) for r in imgs)
    # errors are rows, not failures
    assert all(r["status"] == "unrecognized container" for r in junk)


def test_image_features_batch_shape(spark):
    feats = image_features(media_table(spark, 30)).collect()
    assert len(feats) == 10  # one per image row
    ok = [r for r in feats if r["status"] == "ok"]
    assert ok, "fixture decode path must produce features"
    for r in ok:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalised histogram
        assert max(r["out_width"], r["out_height"]) <= 32


def test_video_frame_sampling(spark):
    from archvisier_spark.ops.multimodal import (
        build_svid,
        sample_video_frames,
        video_table,
    )
    import pandas as pd
    from pyspark.sql import types as T

    # deterministic single video: 24 fps, 17 frames, stride 5 → frames 0,5,10,15
    blob = build_svid(24, 17, 128, seed=3)
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ])
    df = spark.createDataFrame(pd.DataFrame([{"media_id": 1, "blob": blob}]), schema=schema)
    rows = sorted(sample_video_frames(df, stride=5).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 5, 10, 15]
    assert all(r["frame_bytes"] == 128 for r in rows)
    assert rows[1]["t_sec"] == 5 / 24
    # frame hashes are content-derived and distinct for distinct frames
    assert len({r["frame_hash"] for r in rows}) == 4
    # determinism
    rows2 = sorted(sample_video_frames(df, stride=5).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_hash"] for r in rows2] == [r["frame_hash"] for r in rows]

    # planted junk rows become error rows, never failures
    all_rows = sample_video_frames(video_table(spark, n=10), stride=5).collect()
    statuses = {r["media_id"]: r["status"] for r in all_rows if r["status"] != "ok"}
    assert statuses.get(4) == "not a video container"
    assert statuses.get(9) == "not a video container"
