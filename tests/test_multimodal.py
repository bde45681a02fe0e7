"""Multimodal plumbing tests: binary schema, mapInPandas batch shape,
stub decode kernels, null payloads."""

from __future__ import annotations

import pytest

from hive_udf_neologd_spark.operators.multimodal import (
    ASSET_SCHEMA,
    DECODED_SCHEMA,
    decode_assets,
    decode_payload,
    synthetic_assets,
)


def test_decode_payload_kinds():
    assert decode_payload(b"x" * 100, "image") == {
        "byte_len": 100, "width": 116, "height": 116, "n_frames": 1,
    }
    audio = decode_payload(b"x" * 2500, "audio")
    assert audio["n_frames"] == 1 + 2500 % 1000 and audio["width"] is None
    video = decode_payload(b"y" * 50, "video")
    assert video["n_frames"] == 51


def test_decode_payload_null():
    assert decode_payload(None, "image")["byte_len"] == 0


def test_decode_payload_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        decode_payload(b"x", "hologram")


def test_synthetic_assets_schema(spark, sf_dir):
    assets = synthetic_assets(spark, sf_dir)
    assert [f.name for f in assets.schema.fields] == [
        f.name for f in ASSET_SCHEMA.fields
    ]
    assert assets.schema["payload"].dataType.simpleString() == "binary"


def test_decode_assets_end_to_end(spark, sf_dir):
    assets = synthetic_assets(spark, sf_dir).limit(30)
    decoded = decode_assets(assets)
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["byte_len"] > 0
        if r["kind"] == "image":
            assert r["width"] == 16 + r["byte_len"] % 640 and r["n_frames"] == 1
        elif r["kind"] == "audio":
            assert r["width"] is None
