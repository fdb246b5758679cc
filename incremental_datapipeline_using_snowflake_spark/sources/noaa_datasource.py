"""Spark 4 Python Data Source API form of the NOAA feed reader.

The reference ingests the feed imperatively inside a stored procedure
(S1-S3); `sources/noaa_feed.py` re-expresses that as DataFrame parsing.
This module additionally exposes the SAME parser through the modern
`pyspark.sql.datasource` API, so the feed is a first-class format:

    spark.dataSource.register(NoaaFeedDataSource)
    spark.read.format("noaa_feed").option("path", p).load()
    spark.read.format("noaa_feed").option("numPartitions", 8).load()

Semantics parity: blank/``#`` lines skipped, whitespace-split, >= 5
fields, tolerant typed coercion (bad numerics -> NULL) — pinned equal to
``parse_feed_text`` by ``tests/test_datasource.py``.

Scale shape: ``numPartitions`` line-striding (partition i parses lines
``i::n``). Each task re-reads the (small) feed file and touches only its
stride — the right trade for a feed measured in tens of KB; a TB-scale
text format would carry byte-range splits in its InputPartitions instead.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FEED_SCHEMA = (
    "YEAR int, MONTH int, DAY int, DECIMAL_DATE double, CO2_PPM double"
)


def _to_int(s: str) -> int | None:
    try:
        return int(s)
    except (TypeError, ValueError):
        return None


def _to_float(s: str) -> float | None:
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


def parse_feed_line(line: str) -> tuple | None:
    """Pure-Python twin of the S2 line parser + S4 tolerant coercion."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    parts = line.split()
    if len(parts) < 5:
        return None
    return (
        _to_int(parts[0]),
        _to_int(parts[1]),
        _to_int(parts[2]),
        _to_float(parts[3]),
        _to_float(parts[4]),
    )


class _StridePartition(InputPartition):
    def __init__(self, index: int, stride: int):
        self.index = index
        self.stride = stride


class NoaaFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.text = options.get("text")
        if not self.path and self.text is None:
            raise ValueError("noaa_feed requires option 'path' or 'text'")
        self.n = int(options.get("numPartitions", "1"))

    def partitions(self):
        return [_StridePartition(i, self.n) for i in range(self.n)]

    def read(self, partition: _StridePartition):
        if self.text is not None:
            lines = self.text.splitlines()
        else:
            with open(self.path, encoding="utf-8") as f:
                lines = f.read().splitlines()
        for i in range(partition.index, len(lines), partition.stride):
            row = parse_feed_line(lines[i])
            if row is not None:
                yield row


class NoaaFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each micro-batch parses the lines APPENDED to the
    feed file since the committed offset (offset = line count) — the
    incremental-feed shape of the reference pipeline as a first-class
    streaming source. Replayability: ``readBetweenOffsets`` re-reads an
    exact line range, so checkpoint recovery replays identical batches.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("streaming noaa_feed requires option 'path'")

    def _lines(self) -> list[str]:
        try:
            with open(self.path, encoding="utf-8") as f:
                return f.read().splitlines()
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        return {"line": 0}

    def read(self, start: dict):
        lines = self._lines()
        end = {"line": len(lines)}
        rows = [
            r
            for ln in lines[start["line"] :]
            if (r := parse_feed_line(ln)) is not None
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        lines = self._lines()
        return iter(
            r
            for ln in lines[start["line"] : end["line"]]
            if (r := parse_feed_line(ln)) is not None
        )


class NoaaFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "noaa_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> NoaaFeedReader:
        return NoaaFeedReader(self.options)

    def simpleStreamReader(self, schema) -> NoaaFeedStreamReader:
        return NoaaFeedStreamReader(self.options)
