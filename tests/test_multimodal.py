"""Multimodal plumbing: decode / resize / frame-sample / feature-extract run
as real Arrow-batched mapInPandas jobs with typed schemas; codecs are stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_datapipeline_using_snowflake_spark.ops import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return M.attach_payload(docs).cache()


def test_decode_media_typed_metadata(spark, media):
    out = M.decode_media(media)
    rows = out.collect()
    assert len(rows) == media.count()
    by_type = {r["media_type"]: r for r in rows}
    assert set(by_type) <= {"image", "audio", "text", "video"}
    for r in rows:
        assert r["byte_len"] > 0 and len(r["fp"]) == 32
        if r["media_type"] in ("image", "video"):
            assert 64 <= r["width"] < 64 + 1024
            assert 64 <= r["height"] < 64 + 768
        else:
            assert r["width"] is None
        if r["media_type"] == "video":
            assert 1 <= r["n_frames"] <= 30
        else:
            assert r["n_frames"] is None


def test_decode_media_strict_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        M.decode_media(media, strict=True).collect()


def test_resize_media(spark, media):
    out = M.resize_media(media, 224, 224).collect()
    assert len(out) == media.count()
    for r in out:
        if r["media_type"] in ("image", "video"):
            assert (r["width"], r["height"]) == (224, 224)
        else:
            assert r["width"] is None
        assert len(r["payload"]) > 0  # payload passes through


def test_sample_frames_video_only(spark, media):
    frames = M.sample_frames(media, every_nth=5)
    rows = frames.collect()
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert len(rows) >= n_videos  # >=1 frame per video
    assert frames.filter(F.col("frame_idx") < 0).count() == 0
    # only videos contribute
    vid_ids = {r["doc_id"] for r in media.filter(F.col("media_type") == "video").collect()}
    assert {r["doc_id"] for r in rows} <= vid_ids
    # deterministic across runs
    again = {(r["doc_id"], r["frame_idx"]) for r in M.sample_frames(media, every_nth=5).collect()}
    assert {(r["doc_id"], r["frame_idx"]) for r in rows} == again


def test_extract_features_shape_and_determinism(spark, media):
    feats = M.extract_features(media)
    rows = feats.limit(50).collect()
    for r in rows:
        assert len(r["features"]) == M.FEATURE_DIM
        assert all(-1.0 <= v <= 1.0 for v in r["features"])
    # feeds ops.similarity: join back and compute a cosine without error
    from incremental_datapipeline_using_snowflake_spark.ops.similarity import cosine

    df = feats.limit(10).alias("a").crossJoin(feats.limit(10).alias("b"))
    cos = df.select(
        cosine(
            F.transform("a.features", lambda x: x.cast("double")),
            F.transform("b.features", lambda x: x.cast("double")),
        ).alias("c")
    )
    assert cos.filter(F.abs("c") > 1.0001).count() == 0
