from .noaa_feed import parse_feed_text, fetch_feed
from .csv_source import read_co2_csv, CO2_CSV_SCHEMA

__all__ = ["parse_feed_text", "fetch_feed", "read_co2_csv", "CO2_CSV_SCHEMA"]
