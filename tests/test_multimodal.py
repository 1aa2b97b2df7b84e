"""Multimodal plumbing tests: binary columns round-trip, feature
extraction shape/determinism, frame sampling fan-out, codec stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from net7_etl_bus_spark.operators import multimodal as mm

from .conftest import SF_SMALL


def test_media_table_schema_and_roundtrip(spark, tmp_path):
    media = mm.synthesize_media_from_documents(spark, SF_SMALL)
    assert dict(media.dtypes)["content"] == "binary"
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == media.count()
    assert back.schema["content"].dataType.typeName() == "binary"
    # metadata-only projection never touches the binary column
    assert back.select("media_id", "meta.width").count() == media.count()


def test_feature_extraction_deterministic(spark):
    media = mm.synthesize_media_from_documents(spark, SF_SMALL).limit(50)
    f1 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == mm.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)


def test_feature_matches_content_hash(spark):
    media = mm.synthesize_media_from_documents(spark, SF_SMALL).limit(5)
    rows = mm.extract_features(media).collect()
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(raw[r["media_id"]]).hexdigest()
        assert r["n_bytes"] == len(raw[r["media_id"]])


def test_null_content_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "image", None, None)], mm.MEDIA_SCHEMA
    )
    row = mm.extract_features(df).collect()[0]
    # null content propagates NULL metrics (engine-wide null posture;
    # was n_bytes == 0 before the fuzz-differential round)
    assert row["feature"] is None and row["n_bytes"] is None


def test_frame_sampling_fanout(spark):
    media = mm.synthesize_media_from_documents(spark, SF_SMALL)
    frames = mm.sample_frames(media, every_ms=1000)
    videos = media.filter(F.col("media_type") == "video").count()
    assert frames.count() >= videos  # >=1 frame per video
    assert frames.select("media_id").distinct().count() == videos
    # per-frame digests differ across frame_no
    one = frames.filter(F.col("media_id") == frames.first()["media_id"]).collect()
    assert len({r["frame_sha256"] for r in one}) == len(one)


def test_real_codec_path_is_explicitly_stubbed(spark):
    media = mm.synthesize_media_from_documents(spark, SF_SMALL).limit(1)
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, deterministic_fake=False).collect()
    assert "codec" in str(ei.value).lower() or "CodecsUnavailable" in str(ei.value)
