"""Multimodal plumbing tests: metadata sniffing, feature-kernel batch
shape, frame sampling, decode stub gating."""

from __future__ import annotations

import pytest

from sea_express_customs_etl_spark.multimodal import (
    attach_binary_metadata,
    decode_images,
    fake_image_features,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 10),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 5),
        (3, b"RIFFxxxxWAVE"),
        (4, b"garbage-bytes"),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_binary_metadata(spark):
    got = {r.media_id: r for r in attach_binary_metadata(_media(spark)).collect()}
    assert got[1].media_format == "png"
    assert got[2].media_format == "jpeg"
    assert got[3].media_format == "wav"
    assert got[4].media_format == "unknown"
    assert got[1].media_length == 18
    assert len(got[1].media_digest) == 32


def test_fake_image_features_deterministic(spark):
    df = _media(spark)
    a = {r.media_id: r.features for r in fake_image_features(df, dim=8).collect()}
    b = {r.media_id: r.features for r in fake_image_features(df, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)
    assert a[1] != a[2]


def test_decode_images_is_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_images(_media(spark))


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, 25), (2, 5)], "media_id long, n_frames int")
    got = {}
    for r in sample_frames(df, every_n=10).collect():
        got.setdefault(r.media_id, []).append(r.frame_idx)
    assert sorted(got[1]) == [0, 10, 20]
    assert sorted(got[2]) == [0]
