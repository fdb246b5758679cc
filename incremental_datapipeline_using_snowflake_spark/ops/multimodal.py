"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a ``media_type`` tag and
runs decode / feature-extraction as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, batching, partitioning) is real and tested;
the actual codec step is STUBBED (this container has no image/audio
libraries): ``decode_media(..., decoder=None)`` uses a deterministic fake
decoder, and ``strict=True`` raises ``NotImplementedError`` where a real
codec (PIL / torchaudio / ffmpeg) would plug in.

The fake decoder derives width/height/frames from the payload md5 — the
same arithmetic as the oracle-checked ``multimodal_meta`` query, so the
distributed plumbing is verifiable end-to-end.

REAL codecs exist for three dependency-free formats: ``ops.codecs`` ships
a PPM (P6) image parser/encoder/nearest-neighbor-resizer, a WAV (RIFF
PCM) parser, and (r06) a full numpy baseline-JPEG decoder with a fixture
encoder; ``media_decoder`` / ``image_resizer`` plug straight into
``decode_media(decoder=)`` / ``resize_media(resizer=)`` — the mapInPandas
path is exercised with actual JPEG/PPM/WAV bytes in
``tests/test_multimodal.py``, not only the deterministic fake. Video is
real for Motion-JPEG in both mainstream containers (RIFF/AVI r06, ISO
BMFF/MP4 r07); only non-JPEG entropy coders (H.264/HEVC/AV1) remain
library-blocked, refusing by codec name.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ["image", "audio", "text", "video"]  # source number mod 4

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("fp", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, payload BINARY): the ingestion shape
    for a multimodal corpus (payload = utf-8 bytes of text as the stand-in)."""
    srcnum = F.regexp_extract("source", r"(\d+)", 1).cast("int") % 4
    mt = (
        F.when(srcnum == 0, "image")
        .when(srcnum == 1, "audio")
        .when(srcnum == 2, "text")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder (md5-derived dimensions)."""
    fp = hashlib.md5(payload).hexdigest()
    h60 = int(fp[:15], 16)
    return {
        "byte_len": len(payload),
        "fp": fp,
        "width": 64 + h60 % 1024 if media_type in ("image", "video") else None,
        "height": 64 + h60 % 768 if media_type in ("image", "video") else None,
        "n_frames": 1 + h60 % 30 if media_type == "video" else None,
    }


def real_decode(payload: bytes, media_type: str) -> dict:  # pragma: no cover
    """Plug-in point for actual codecs — unavailable in this container."""
    raise NotImplementedError(
        f"no codec library available for media_type={media_type!r}; "
        "install PIL/torchaudio/ffmpeg and pass decoder=real_decode"
    )


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes, str], dict] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched decode over (doc_id, media_type, payload).

    Scale shape: ``mapInPandas`` keeps the payload bytes inside each
    partition (no shuffle), streams Arrow batches into Python, and returns a
    typed metadata frame; repartition upstream by size if payloads skew.
    """
    fn = decoder or (real_decode if strict else fake_decode)

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                meta = fn(bytes(payload), mt)
                out.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "byte_len": meta["byte_len"],
                        "fp": meta["fp"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "n_frames": meta["n_frames"],
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(
    media: DataFrame,
    target_width: int,
    target_height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Resize image/video payloads to (target_width, target_height); other
    media types pass through untouched.

    Plumbing is real (Arrow batches, payload stays partition-local, typed
    output schema); the pixel work is STUBBED — the fake resizer returns the
    payload unchanged and only the metadata reflects the target size. Plug a
    real codec via ``resizer`` (or ``strict=True`` to fail loudly).
    """
    if strict and resizer is None:
        raise NotImplementedError(
            "no image library available in this container; pass resizer="
        )
    fn = resizer or (lambda payload, w, h: payload)

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                visual = mt in ("image", "video")
                out.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "payload": fn(bytes(payload), target_width, target_height)
                        if visual
                        else bytes(payload),
                        "width": target_width if visual else None,
                        "height": target_height if visual else None,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_nth: int = 10,
    extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Explode video payloads into sampled frames (one row per kept frame) —
    a 1->N ``mapInPandas`` (the Spark shape for frame extraction: output
    cardinality is decided inside the batch, no pre-explode needed).

    The fake extractor derives a deterministic frame count from the payload
    md5 (same arithmetic as ``fake_decode``) and emits byte-slices as frame
    stand-ins; a real ffmpeg-backed extractor plugs in via ``extractor``.
    """

    def fake_extract(payload: bytes, nth: int) -> list[bytes]:
        n_frames = 1 + int(hashlib.md5(payload).hexdigest()[:15], 16) % 30
        kept = range(0, n_frames, nth)
        return [payload[i::n_frames] or b"\x00" for i in kept]

    fn = extractor or fake_extract

    def frame_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
                    continue
                for idx, frame in enumerate(fn(bytes(payload), every_nth)):
                    out.append({"doc_id": doc_id, "frame_idx": idx, "frame": frame})
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    media: DataFrame,
    featurizer: Callable[[bytes, str], list[float]] | None = None,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Per-payload feature vector (``array<float>``) via Arrow batches — the
    embedding-extraction shape feeding ops.similarity. Fake featurizer:
    md5-seeded deterministic values in [-1, 1]; a real model (CLIP/wav2vec)
    plugs in via ``featurizer``.
    """

    def fake_features(payload: bytes, media_type: str) -> list[float]:
        h = hashlib.md5(payload).digest()
        return [
            ((int.from_bytes(h[(2 * i) % 16 : (2 * i) % 16 + 2], "big") % 2001) - 1000)
            / 1000.0
            for i in range(dim)
        ]

    fn = featurizer or fake_features

    def feature_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": [
                        fn(bytes(p), mt)
                        for p, mt in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return media.mapInPandas(feature_batches, schema=FEATURES_SCHEMA)
