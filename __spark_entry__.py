"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes the declared operator inventory (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL per query (omitted entries
get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incremental_datapipeline_using_snowflake_spark.queries import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = all_queries()["q1_pricing_summary"]
    return fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (None -> rows-only check)."""
    return {
        name: sql for name, (_fn, sql) in all_queries().items() if sql is not None
    }
