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


# ---------------------------------------------------------------------------
# REAL codecs (ops.codecs): PPM images and WAV audio through the SAME
# mapInPandas plumbing — the plug-in contract exercised with actual bytes.
# ---------------------------------------------------------------------------


def _gradient_ppm(w, h):
    import numpy as np

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]  # R encodes column
    px[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]  # G encodes row
    px[:, :, 2] = 7
    return C.encode_ppm(px)


def test_ppm_codec_roundtrip_and_comments():
    import numpy as np

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    payload = _gradient_ppm(40, 24)
    w, h, maxval, px = C.decode_ppm(payload)
    assert (w, h, maxval) == (40, 24, 255)
    assert px[3, 9].tolist() == [9, 3, 7]
    # header comments (emitted by many tools) parse fine
    commented = payload.replace(b"P6\n", b"P6\n# made by a tool\n", 1)
    assert C.decode_ppm(commented)[:2] == (40, 24)
    # truncated body fails loudly, never mis-decodes
    import pytest as _pytest

    with _pytest.raises(ValueError, match="body"):
        C.decode_ppm(payload[:-10])
    assert np.array_equal(C.decode_ppm(C.encode_ppm(px))[3], px)


def test_wav_codec_parses_pcm_metadata():
    import numpy as np

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    t = np.arange(1600)
    tone = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype("int16")
    payload = C.encode_wav(tone, sample_rate=16000, channels=1)
    meta = C.decode_wav(payload)
    assert meta == {
        "channels": 1,
        "sample_rate": 16000,
        "bits_per_sample": 16,
        "n_samples": 1600,
        "duration_s": 0.1,
    }
    stereo = C.encode_wav(np.stack([tone, tone], axis=1), 8000, channels=2)
    assert C.decode_wav(stereo)["channels"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        C.decode_wav(b"not audio at all")


def test_decode_media_with_real_codec(spark):
    """decode_media(decoder=codecs.media_decoder): REAL pixel dims and
    sample counts flow through the Arrow mapInPandas path."""
    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    import numpy as np

    img = _gradient_ppm(64, 48)
    wav = C.encode_wav(np.zeros(3200, dtype="int16"), sample_rate=8000)
    media = spark.createDataFrame(
        [(1, "image", bytearray(img)), (2, "audio", bytearray(wav))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in M.decode_media(media, decoder=C.media_decoder).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (64, 48)
    assert rows[1]["n_frames"] is None
    assert rows[2]["n_frames"] == 3200  # true sample count, not an md5 fake
    assert rows[2]["width"] is None
    assert rows[1]["byte_len"] == len(img)


def test_resize_media_with_real_codec(spark):
    """resize_media(resizer=codecs.ppm_resizer): the output payload is a
    REAL resized image — re-decoding it yields the target dimensions and
    nearest-neighbor-sampled pixels; non-visual payloads pass through."""
    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    import numpy as np

    img = _gradient_ppm(64, 48)
    wav = C.encode_wav(np.zeros(160, dtype="int16"))
    media = spark.createDataFrame(
        [(1, "image", bytearray(img)), (2, "audio", bytearray(wav))],
        "doc_id long, media_type string, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in M.resize_media(media, 16, 12, resizer=C.ppm_resizer).collect()
    }
    w, h, _mv, px = C.decode_ppm(bytes(out[1]["payload"]))
    assert (w, h) == (16, 12) and (out[1]["width"], out[1]["height"]) == (16, 12)
    # pixel-center nearest-neighbor: output col j samples source col
    # floor((j+0.5)*64/16) -> R channel must equal that source column index
    expect_cols = [int((j + 0.5) * 64 / 16) for j in range(16)]
    assert px[0, :, 0].tolist() == expect_cols
    expect_rows = [int((i + 0.5) * 48 / 12) for i in range(12)]
    assert px[:, 0, 1].tolist() == expect_rows
    # audio untouched, byte-for-byte
    assert bytes(out[2]["payload"]) == wav


def test_real_codec_strict_contract():
    """media_decoder refuses types it has no codec for (fail loudly)."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    with _pytest.raises(NotImplementedError, match="video"):
        C.media_decoder(b"\x00\x01", "video")


def test_jpeg_codec_roundtrip_properties():
    """r06: dependency-free baseline JPEG (numpy Huffman+DCT). quant=1 is
    near-lossless — decode(encode(x)) within a few gray levels for color
    and grayscale, any dimensions (block padding cropped back); coarser
    quant stays bounded and compresses smaller; malformed/progressive
    payloads fail loudly."""
    import numpy as np
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    rng = np.random.default_rng(42)
    for shape in [(37, 53, 3), (8, 8, 3), (17, 9, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, nc, out = C.decode_jpeg(C.encode_jpeg(img, quant=1))
        assert (w, h, nc) == (shape[1], shape[0], 3)
        assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 3

    gray = rng.integers(0, 256, size=(24, 31), dtype=np.uint8)
    w, h, nc, out = C.decode_jpeg(C.encode_jpeg(gray, quant=1))
    assert (w, h, nc) == (31, 24, 1)
    assert int(np.max(np.abs(out[:, :, 0].astype(int) - gray.astype(int)))) <= 2

    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    fine, coarse = C.encode_jpeg(img, quant=1), C.encode_jpeg(img, quant=16)
    assert len(coarse) < len(fine)  # coarser quant compresses
    _, _, _, out16 = C.decode_jpeg(coarse)
    assert int(np.max(np.abs(out16.astype(int) - img.astype(int)))) <= 64

    with _pytest.raises(ValueError, match="SOI"):
        C.decode_jpeg(b"not a jpeg")
    # progressive frame marker (SOF2) refused loudly
    prog = bytearray(C.encode_jpeg(gray))
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with _pytest.raises(NotImplementedError, match="non-baseline"):
        C.decode_jpeg(bytes(prog))


def test_jpeg_through_spark_decode_and_resize(spark):
    """JPEG payloads flow through the SAME mapInPandas plumbing as PPM:
    media_decoder sniffs the SOI magic and reports true pixel dims;
    image_resizer re-encodes a genuinely resized JPEG."""
    import numpy as np

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    img = np.zeros((48, 64, 3), dtype=np.uint8)
    img[..., 0] = (np.arange(64) * 4)[None, :] % 256
    jpg = C.encode_jpeg(img, quant=1)
    ppm = C.encode_ppm(img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(jpg)), (2, "image", bytearray(ppm))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in M.decode_media(media, decoder=C.media_decoder).collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (64, 48)
    assert (rows[2]["width"], rows[2]["height"]) == (64, 48)

    out = {
        r["doc_id"]: r
        for r in M.resize_media(media, 16, 12, resizer=C.image_resizer).collect()
    }
    w, h, nc, px = C.decode_jpeg(bytes(out[1]["payload"]))
    assert (w, h, nc) == (16, 12, 3)
    assert (out[1]["width"], out[1]["height"]) == (16, 12)
    # both formats sample the same pixel-center grid -> same R channel
    w2, h2, _mv, px2 = C.decode_ppm(bytes(out[2]["payload"]))
    assert (w2, h2) == (16, 12)
    assert int(np.max(np.abs(px[..., 0].astype(int) - px2[..., 0].astype(int)))) <= 3


def test_png_codec_roundtrip_filters_and_refusals():
    """r08: the PNG decoder reconstructs every filter type exactly (the
    fixture encoder forward-filters row y with type y % 5), expands
    palettes, and refuses out-of-scope features loudly."""
    import zlib

    import numpy as np

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    rng = np.random.RandomState(7)
    for nc in (1, 2, 3, 4):
        px = rng.randint(0, 256, (11, 9, nc)).astype(np.uint8)
        arg = px[:, :, 0] if nc == 1 else px
        w, h, nc2, out = C.decode_png(C.encode_png(arg))
        assert (w, h, nc2) == (9, 11, nc)
        assert np.array_equal(out, px)

    def chunk(t, body):
        return (len(body).to_bytes(4, "big") + t + body
                + (zlib.crc32(t + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    # palette (color type 3) expands through PLTE to RGB
    idx = rng.randint(0, 3, (4, 6)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(4))
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    png3 = (C.PNG_SIG
            + chunk(b"IHDR", (6).to_bytes(4, "big") + (4).to_bytes(4, "big")
                    + bytes([8, 3, 0, 0, 0]))
            + chunk(b"PLTE", pal)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    w, h, nc2, out = C.decode_png(png3)
    assert (w, h, nc2) == (6, 4, 3)
    assert np.array_equal(out, np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx])

    hdr = (6).to_bytes(4, "big") + (4).to_bytes(4, "big")
    with pytest.raises(NotImplementedError, match="Adam7"):
        C.decode_png(C.PNG_SIG + chunk(b"IHDR", hdr + bytes([8, 2, 0, 0, 1]))
                     + chunk(b"IDAT", zlib.compress(b"\x00" * 76))
                     + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        C.decode_png(C.PNG_SIG + chunk(b"IHDR", hdr + bytes([16, 2, 0, 0, 0]))
                     + chunk(b"IDAT", zlib.compress(b"\x00" * 148))
                     + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="scanline payload size"):
        C.decode_png(C.PNG_SIG + chunk(b"IHDR", hdr + bytes([8, 2, 0, 0, 0]))
                     + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                     + chunk(b"IEND", b""))
    # deflate bomb: a plausible header whose IDAT inflates to ~50 MB must
    # raise at the bounded-inflate guard, never materialize the payload
    bomb = zlib.compress(b"\x00" * (50 << 20), 9)  # ~50 KB compressed
    with pytest.raises(ValueError, match="scanline payload size"):
        C.decode_png(C.PNG_SIG + chunk(b"IHDR", hdr + bytes([8, 2, 0, 0, 0]))
                     + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))


def test_png_through_spark_decode_and_resize(spark):
    """r08: real PNG bytes flow through the SAME mapInPandas plumbing as
    JPEG/PPM — media_decoder sniffs the PNG signature and reports true
    pixel dims; image_resizer re-encodes a genuinely resized PNG
    (lossless, so the nearest-neighbor grid matches PPM exactly)."""
    import numpy as np

    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    img = np.zeros((48, 64, 3), dtype=np.uint8)
    img[..., 0] = (np.arange(64) * 4)[None, :] % 256
    img[..., 1] = (np.arange(48) * 5)[:, None] % 256
    png = C.encode_png(img)
    ppm = C.encode_ppm(img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(ppm))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in M.decode_media(media, decoder=C.media_decoder).collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (64, 48)

    out = {
        r["doc_id"]: r
        for r in M.resize_media(media, 16, 12, resizer=C.image_resizer).collect()
    }
    w, h, nc, px = C.decode_png(bytes(out[1]["payload"]))
    assert (w, h, nc) == (16, 12, 3)
    assert (out[1]["width"], out[1]["height"]) == (16, 12)
    # PNG is lossless: the resized PNG equals the resized PPM byte-for-byte
    # in pixel space (identical nearest-neighbor grid)
    _w2, _h2, _mv, px2 = C.decode_ppm(bytes(out[2]["payload"]))
    assert np.array_equal(px, px2)


def test_avi_mjpeg_video_real_codec(spark):
    """r06: MJPEG-AVI closes the video modality with real bytes — container
    metadata decodes through decode_media, and sample_frames extracts
    standalone JPEG frames whose pixels match the encoded source."""
    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    import numpy as np

    rng = np.random.default_rng(6)
    frames = [
        (rng.integers(0, 255, size=(16, 24, 3)) // 16 * 16).astype(np.uint8)
        for _ in range(6)
    ]
    avi = C.encode_avi_mjpeg(frames, fps=10)
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi))],
        "doc_id long, media_type string, payload binary",
    )

    meta = M.decode_media(media, decoder=C.media_decoder).collect()[0]
    assert (meta["width"], meta["height"], meta["n_frames"]) == (24, 16, 6)

    out = M.sample_frames(media, every_nth=2, extractor=C.avi_frame_extractor).collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2]  # frames 0, 2, 4
    for r, src in zip(out, frames[::2]):
        w, h, nc, px = C.decode_jpeg(bytes(r["frame"]))
        assert (w, h, nc) == (24, 16, 3)
        assert np.abs(px.astype(int) - src.astype(int)).max() <= 4

    # truncated MP4 bytes (ftyp with no moov) still fail loudly
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(2, "video", bytearray(b"\x00\x00\x00\x18ftypmp42"))],
        "doc_id long, media_type string, payload binary",
    )
    with _pytest.raises(Exception):
        M.decode_media(bad, decoder=C.media_decoder).collect()


def test_mp4_mjpeg_video_real_codec(spark):
    """r07: Motion-JPEG MP4 closes the last stubbed container — ISO BMFF
    sample tables (stsd/stsz/stsc/stco with multi-sample chunks) locate
    real baseline-JPEG samples end-to-end through Spark, and H.264 sample
    entries refuse by codec name instead of a generic stub."""
    from incremental_datapipeline_using_snowflake_spark.ops import codecs as C

    import numpy as np

    rng = np.random.default_rng(7)
    frames = [
        (rng.integers(0, 255, size=(16, 24, 3)) // 16 * 16).astype(np.uint8)
        for _ in range(5)  # odd count -> trailing 1-sample chunk, 2 stsc runs
    ]
    mp4 = C.encode_mp4_mjpeg(frames, fps=10)
    media = spark.createDataFrame(
        [(1, "video", bytearray(mp4))],
        "doc_id long, media_type string, payload binary",
    )

    meta = M.decode_media(media, decoder=C.media_decoder).collect()[0]
    assert (meta["width"], meta["height"], meta["n_frames"]) == (24, 16, 5)

    out = M.sample_frames(
        media, every_nth=2, extractor=C.video_frame_extractor
    ).collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2]  # samples 0, 2, 4
    for r, src in zip(out, frames[::2]):
        w, h, nc, px = C.decode_jpeg(bytes(r["frame"]))
        assert (w, h, nc) == (24, 16, 3)
        assert np.abs(px.astype(int) - src.astype(int)).max() <= 4

    # an H.264 track refuses with the codec named, not a generic error
    import pytest as _pytest

    avc = spark.createDataFrame(
        [(2, "video", bytearray(mp4.replace(b"jpeg", b"avc1", 1)))],
        "doc_id long, media_type string, payload binary",
    )
    with _pytest.raises(Exception, match="avc1"):
        M.decode_media(avc, decoder=C.media_decoder).collect()
