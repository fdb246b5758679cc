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
