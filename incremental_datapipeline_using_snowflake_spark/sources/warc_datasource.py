"""Spark 4 Python Data Source API form of the WARC/WET reader — the crawl
ingest as a first-class format, batch and streaming:

    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").option("path", d).load()
    spark.readStream.format("warc").option("path", d).load()

Batch: ONE InputPartition per file — the scale-correct unit for
non-splittable ``.wet.gz`` (``sources/warc_source.py`` rationale); a
1000-executor cluster chews a crawl file-per-task with zero coordination.

Streaming: the offset is a lexicographic FILENAME WATERMARK — each
micro-batch ingests files named strictly above the committed watermark.
That keeps the offset O(1) (never a file list) and is replayable
(``readBetweenOffsets`` re-lists the exact name range), at the price of
one documented assumption: shards arrive with lexicographically
increasing names — exactly how crawl dumps are published
(``...-00001.wet.gz``, ``-00002`` ...). A late-arriving lower name after
a commit is skipped by design; route backfills through the batch reader.

Record parsing is ``warc_source.parse_warc_records`` verbatim (tolerant
rows carry ``parse_error``; no silent drops), so the two entry points
cannot diverge.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .warc_source import WARC_SCHEMA, parse_warc_records

_SUFFIXES = (".warc", ".wet", ".warc.gz", ".wet.gz")
_COLS = (
    "record_id", "warc_type", "target_uri", "warc_date",
    "content_length", "text", "source_file", "parse_error",
)


def _list_warc_files(root: str) -> list[str]:
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(_SUFFIXES):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _parse_types(options: dict) -> tuple[str, ...] | None:
    raw = options.get("types", "conversion").strip()
    if raw == "*":
        return None
    return tuple(t.strip().lower() for t in raw.split(",") if t.strip())


def _file_rows(path: str, types: tuple[str, ...] | None):
    with open(path, "rb") as f:
        data = f.read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    for rec in parse_warc_records(data, path):
        if (
            types is None
            or rec["parse_error"] is not None
            or (rec["warc_type"] or "").lower() in types
        ):
            yield tuple(rec[c] for c in _COLS)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option 'path' (a directory)")
        self.types = _parse_types(options)

    def partitions(self):
        files = _list_warc_files(self.path)
        if not files:
            return [_WarcFilePartition("")]
        return [_WarcFilePartition(p) for p in files]

    def read(self, partition: _WarcFilePartition):
        if not partition.path:
            return
        yield from _file_rows(partition.path, self.types)


class WarcStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("streaming warc source requires option 'path'")
        self.types = _parse_types(options)

    def initialOffset(self) -> dict:
        return {"watermark": ""}

    def read(self, start: dict):
        new = [f for f in _list_warc_files(self.path) if f > start["watermark"]]
        end = {"watermark": new[-1]} if new else dict(start)
        # a LIST iterator, not a generator: SimpleDataSourceStreamReader
        # caches the batch for replay via copy.copy, which cannot pickle
        # generators. Memory = one micro-batch of records (a handful of
        # newly-arrived shards), released after the batch commits.
        rows = [r for f in new for r in _file_rows(f, self.types)]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = [
            f
            for f in _list_warc_files(self.path)
            if start["watermark"] < f <= end["watermark"]
        ]
        for f in files:
            yield from _file_rows(f, self.types)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def simpleStreamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)
