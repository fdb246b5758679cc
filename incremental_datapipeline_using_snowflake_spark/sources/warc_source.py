"""WARC / WET corpus ingestion — the raw-crawl input format of LLM data
pipelines (ISO 28500; what Common Crawl publishes: WARC for raw captures,
WET for extracted plain text).

The reference is CSV-centric (SURVEY.md S5/S7); JSONL (r06) covered the
interchange format, this covers the UPSTREAM one — the files a curation
pipeline ingests before :func:`ops.curation.curate_append` ever runs.

Scale posture: WET files are gzip-compressed whole-file (NOT splittable),
so the unit of parallelism is the FILE — exactly how production crawls
shard (Common Crawl: ~90k files/crawl, ~150 MB each; 1000 executors chew
a crawl file-per-task with zero coordination). The plan is Spark's
``binaryFile`` datasource (distributed file listing, one content blob per
row, ``pathGlobFilter`` pushdown) feeding an Arrow-batched ``mapInPandas``
record parser — stdlib ``gzip`` + byte scanning, no external libs, no
row-at-a-time Python. Record parsing is strictly linear in file bytes
(``Content-Length`` jumps, never regex over the payload).

Malformed records follow the JSONL quarantine contract
(``jsonl_source.quarantine_split``): tolerant mode emits the record with
``parse_error`` set and payload fields NULL (no silent drops — a 100 TB
ingest must account for every record); ``strict=True`` fails the task
loudly for validated stages.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, warc_date string, "
    "content_length long, text string, source_file string, parse_error string"
)

_MAX_HEADER_BYTES = 64 * 1024  # a sane WARC header block is < 1 KB


def parse_warc_records(
    data: bytes, source_file: str = "", strict: bool = False
) -> Iterator[dict]:
    """Yield one dict per WARC record in ``data`` (already decompressed).

    Linear scan: version line → header lines until the empty line →
    ``Content-Length`` payload bytes → the mandatory CRLF CRLF record
    separator. Recovery in tolerant mode re-syncs on the next ``WARC/``
    version line so one corrupt record never poisons the rest of the file.
    """

    def bad(pos: int, why: str) -> dict:
        if strict:
            raise ValueError(f"WARC parse error in {source_file!r} @ {pos}: {why}")
        return {
            "record_id": None,
            "warc_type": None,
            "target_uri": None,
            "warc_date": None,
            "content_length": None,
            "text": None,
            "source_file": source_file,
            "parse_error": f"@{pos}: {why}",
        }

    i, n = 0, len(data)
    while i < n:
        # skip inter-record padding
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            return
        if not data.startswith(b"WARC/", i):
            yield bad(i, "expected WARC/ version line")
            nxt = data.find(b"\nWARC/", i)
            if nxt < 0:
                return
            i = nxt + 1
            continue
        hdr_end = data.find(b"\r\n\r\n", i, i + _MAX_HEADER_BYTES)
        sep = 4
        if hdr_end < 0:  # lenient: bare-LF producers exist
            hdr_end = data.find(b"\n\n", i, i + _MAX_HEADER_BYTES)
            sep = 2
        if hdr_end < 0:
            yield bad(i, "unterminated header block")
            return
        headers: dict[str, str] = {}
        lines = data[i:hdr_end].decode("utf-8", errors="replace").splitlines()
        for line in lines[1:]:  # lines[0] is the WARC/x.y version
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        body_at = hdr_end + sep
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield bad(i, "missing or invalid Content-Length")
            nxt = data.find(b"\nWARC/", body_at)
            if nxt < 0:
                return
            i = nxt + 1
            continue
        if body_at + clen > n:
            yield bad(i, f"truncated payload (want {clen} bytes)")
            return
        payload = data[body_at : body_at + clen]
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": clen,
            "text": payload.decode("utf-8", errors="replace"),
            "source_file": source_file,
            "parse_error": None,
        }
        i = body_at + clen


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    glob: str = "*.{warc,wet,warc.gz,wet.gz}",
    strict: bool = False,
    warc_types: tuple[str, ...] | None = ("conversion",),
) -> DataFrame:
    """Read WARC/WET files under ``path`` into :data:`WARC_SCHEMA` rows.

    ``warc_types`` filters records post-parse (WET text lives in
    ``conversion`` records; pass ``None`` to keep every type including
    ``warcinfo`` preambles). Malformed records surface with
    ``parse_error`` set (tolerant default) or abort the task
    (``strict=True``). Gzip members are decompressed whole-file —
    per-record gzip members (the Common Crawl layout) concatenate
    transparently because stdlib gzip consumes multi-member streams.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if fpath.endswith(".gz"):
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                for rec in parse_warc_records(data, fpath, strict=strict):
                    if (
                        warc_types is None
                        or rec["parse_error"] is not None
                        or (rec["warc_type"] or "").lower() in warc_types
                    ):
                        rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id", "warc_type", "target_uri", "warc_date",
                    "content_length", "text", "source_file", "parse_error",
                ],
            )

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — the ingest gate, same contract as
    ``jsonl_source.quarantine_split``: clean rows flow on to curation,
    malformed records land in a review table with position + reason."""
    from pyspark.sql import functions as F

    bad = df.filter(F.col("parse_error").isNotNull()).select(
        "source_file", "parse_error"
    )
    good = df.filter(F.col("parse_error").isNull()).drop("parse_error")
    return good, bad


def encode_wet(records: list[dict], compress: bool = False) -> bytes:
    """Build valid WET bytes from ``[{uri, date, text}, ...]`` — the
    fixture encoder (the ``codecs.py`` encoder discipline: tests
    round-trip REAL bytes, never mock the parser). Export of curated
    corpora stays JSONL (`jsonl_source`) — WET is an ingest format."""
    out = bytearray()
    for k, r in enumerate(records):
        payload = r["text"].encode("utf-8")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:{k:08d}-0000-0000-0000-000000000000>\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        out += hdr + payload + b"\r\n\r\n"
    return gzip.compress(bytes(out)) if compress else bytes(out)


def encode_warc_responses(records: list[dict], compress: bool = False) -> bytes:
    """Build valid WARC ``response`` bytes from ``[{uri, date, html}, ...]``
    — raw-crawl fixture encoder (r08). The record payload is a full HTTP
    response (status line + headers + blank line + HTML body), exactly the
    Common Crawl response-record layout :func:`warc_html_to_documents`
    must strip."""
    out = bytearray()
    for k, r in enumerate(records):
        body = r["html"].encode("utf-8")
        http = (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=UTF-8\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode("utf-8")
        payload = http + body
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{k:08d}-0000-0000-0000-00000000resp>\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        out += hdr + payload + b"\r\n\r\n"
    return gzip.compress(bytes(out)) if compress else bytes(out)


def warc_html_to_documents(
    df: DataFrame, main_content: bool = False, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Raw-crawl twin of :func:`warc_to_documents` (r08): map clean WARC
    ``response`` records — whose payload is a full HTTP response carrying
    HTML — into the documents shape. Two strips, both row-local Column
    expressions: the HTTP status line + headers up to the first blank line
    (absent-header payloads pass through unchanged), then
    :func:`ops.html.html_to_text` over the body — or, with
    ``main_content=True`` (r09), :func:`ops.html.extract_main_content`,
    which additionally drops nav/sidebar/footer boilerplate blocks before
    the text reaches the quality gates (the production crawl default; the
    conservative form keeps every visible block). Same deterministic
    ``doc_id`` contract as the WET path, so re-ingested files resolve as
    pure corpus dups in curation. Use with
    ``read_warc(..., warc_types=("response",))`` or
    ``format("warc").option("warcTypes", "response")``."""
    from pyspark.sql import functions as F

    from ..ops.html import extract_main_content, html_to_text

    body = F.regexp_replace(
        F.col("text"), r"(?s)^HTTP/[^\r\n]*\r\n.*?\r\n\r\n", ""
    )
    txt = extract_main_content(body) if main_content else html_to_text(body)
    # keep_cols (r14): pass-through source columns (e.g. parse_error) so a
    # caller can run the parse + extraction ONCE over the unsplit record
    # stream and derive its quarantine branch as a filter over the same
    # relation, instead of re-parsing every WARC byte for a count
    return df.select(
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        txt.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.coalesce("target_uri", F.lit("warc")).alias("source"),
        F.length(txt).cast("long").alias("n_chars"),
        *[F.col(c) for c in keep_cols],
    )


def warc_to_documents(df: DataFrame) -> DataFrame:
    """Map clean WET rows into the documents shape curation consumes
    (``doc_id, text, lang, source, n_chars``): ``doc_id`` is the xxhash64
    of (record_id, target_uri) — deterministic across re-reads, so a
    re-ingested WET file produces the SAME ids and
    :func:`ops.curation.curate_append` resolves it as pure corpus dups
    (the idempotent-replay contract). Two records sharing (record_id, uri)
    inside one batch collide by design — they ARE the same capture — and
    curate_append's unique-id guard surfaces the malformed case loudly."""
    from pyspark.sql import functions as F

    return df.select(
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.coalesce("target_uri", F.lit("warc")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
