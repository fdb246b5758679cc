from .noaa_feed import parse_feed_text, fetch_feed
from .csv_source import read_co2_csv, CO2_CSV_SCHEMA
from .jsonl_source import (
    DOCUMENTS_JSONL_SCHEMA,
    quarantine_split,
    read_jsonl,
    write_jsonl,
)

__all__ = [
    "parse_feed_text",
    "fetch_feed",
    "read_co2_csv",
    "CO2_CSV_SCHEMA",
    "DOCUMENTS_JSONL_SCHEMA",
    "read_jsonl",
    "write_jsonl",
    "quarantine_split",
]
