"""Dependency-free REAL codecs for the multimodal plug-in points.

``ops/multimodal.py`` keeps the Spark-side plumbing (Arrow batches, typed
schemas, partition-local payloads) real and stubs only the pixel/sample
work behind ``decoder=`` / ``resizer=`` plug-ins, because this container has
no PIL/ffmpeg. This module closes the loop for two uncompressed formats
whose codecs need nothing beyond the stdlib + numpy:

- **PPM (P6)** binary RGB images: parse, encode, nearest-neighbor resize.
- **WAV (RIFF PCM)** audio: parse the fmt/data chunks into sample-accurate
  metadata.

``media_decoder`` / ``ppm_resizer`` conform exactly to the
``decode_media(decoder=)`` / ``resize_media(resizer=)`` contracts, so the
``mapInPandas`` path runs REAL bytes end-to-end (tests decode and resize
actual images through Spark); richer formats (JPEG/MP4) plug in the same
way once their libraries exist in the environment.

All parsing is bounds-checked and raises ``ValueError`` on malformed
payloads — at 100 TB a corrupt payload must fail the row loudly (callers
wrap with try/except per-row if quarantine semantics are wanted), never
silently mis-decode.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6): the simplest real raster format — "P6\n<w> <h>\n<maxval>\n" header
# (with optional '#' comments) followed by w*h*3 raw bytes.
# ---------------------------------------------------------------------------


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens after the magic,
    skipping '#' comments; returns (tokens, offset past the single
    whitespace byte that terminates the header)."""
    toks: list[int] = []
    i = 2  # past 'P6'
    cur = b""
    while len(toks) < n:
        if i >= len(payload):
            raise ValueError("PPM: truncated header")
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError(f"PPM: unexpected byte {c!r} in header")
        i += 1
    return toks, i


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """P6 payload -> (width, height, maxval, HxWx3 uint8 array)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"PPM: bad dimensions {w}x{h} maxval={maxval}")
    if maxval > 255:
        raise ValueError("PPM: 16-bit samples not supported")
    need = w * h * 3
    raw = payload[off : off + need]
    if len(raw) < need:
        raise ValueError(f"PPM: body has {len(raw)} bytes, need {need}")
    return w, h, maxval, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """HxWx3 uint8 array -> P6 payload."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"PPM: expected HxWx3, got {pixels.shape}")
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n{maxval}\n".encode() + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def resize_ppm(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize of a P6 payload (pixel-center sampling —
    the same grid PIL's NEAREST uses), returning a new P6 payload.

    Vectorized: two index arrays + one fancy-index, no Python pixel loop —
    inside ``mapInPandas`` this keeps the per-batch cost numpy-bound.
    """
    w, h, maxval, px = decode_ppm(payload)
    rows = np.minimum((np.arange(target_h) + 0.5) * h / target_h, h - 1).astype(int)
    cols = np.minimum((np.arange(target_w) + 0.5) * w / target_w, w - 1).astype(int)
    return encode_ppm(px[rows][:, cols], maxval)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM): chunked container — walk chunks for 'fmt ' and 'data'.
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE payload -> {channels, sample_rate, bits_per_sample,
    n_samples, duration_s}."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data_len = None
    i = 12
    while i + 8 <= len(payload):
        cid, clen = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV: fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_len = len(body)
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, channels, sample_rate, _brate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"WAV: only PCM supported (format={audio_format})")
    if block_align == 0 or channels == 0:
        raise ValueError("WAV: zero channels/block_align")
    n_samples = data_len // block_align
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_s": n_samples / sample_rate if sample_rate else 0.0,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """int16 sample array (frames,) or (frames, channels) -> PCM WAV payload
    (test-fixture generator; also the write half of the codec)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if channels != s.shape[1]:
        raise ValueError(f"channels={channels} but samples have {s.shape[1]}")
    data = s.tobytes()
    block_align = 2 * channels
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


# ---------------------------------------------------------------------------
# Plug-in adapters: the exact callables decode_media/resize_media accept.
# ---------------------------------------------------------------------------


def media_decoder(payload: bytes, media_type: str) -> dict:
    """REAL ``decode_media(decoder=)`` plug-in for PPM images and WAV audio.

    Emits the same metadata contract as ``fake_decode`` (byte_len, fp,
    width, height, n_frames): images report true pixel dimensions, audio
    reports sample count as ``n_frames``. Media types without a
    dependency-free codec raise — the ``strict`` contract, fail loudly.
    """
    out = {
        "byte_len": len(payload),
        "fp": hashlib.md5(payload).hexdigest(),
        "width": None,
        "height": None,
        "n_frames": None,
    }
    if media_type == "image":
        w, h, _maxval, _px = decode_ppm(payload)
        out["width"], out["height"] = w, h
    elif media_type == "audio":
        out["n_frames"] = decode_wav(payload)["n_samples"]
    else:
        raise NotImplementedError(
            f"no dependency-free codec for media_type={media_type!r} "
            "(PPM images and WAV audio are supported)"
        )
    return out


def ppm_resizer(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL ``resize_media(resizer=)`` plug-in (nearest-neighbor PPM)."""
    return resize_ppm(payload, target_w, target_h)
