"""Declared queries for the sketch family (ops/sketches.py).

Oracle pattern: the exact value is engine-agnostic and hash-compared; the
sketch estimate is checked Spark-side against its documented error envelope
and emitted as a boolean the oracle pins to TRUE — so the gate fails if the
sketch drifts, without requiring two engines to agree on HLL internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ops import sketches as SK
from .util import load


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return SK.approx_distinct_check(ev, "event_type", "user_id").orderBy("event_type")


HLL_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_distinct,
       TRUE AS approx_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return SK.mergeable_daily_hll(ev, "ts", "event_type", "user_id").orderBy(
        "event_type"
    )


HLL_MERGE_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_distinct,
       TRUE AS merged_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


def quantile_sketch_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return SK.quantile_check(ev, "event_type", "value").orderBy("event_type")


QUANTILE_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS exact_q,
       TRUE AS approx_q_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES: dict = {
    "hll_distinct_users": (hll_distinct_users, HLL_DISTINCT_SQL),
    "hll_mergeable_rollup": (hll_mergeable_rollup, HLL_MERGE_SQL),
    "quantile_sketch_value": (quantile_sketch_value, QUANTILE_SQL),
}
