"""Shared helpers for the declared query inventory."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which vanilla Spark 4
        # rejects with PARQUET_TYPE_ILLEGAL. The conf is runtime-settable,
        # so set it here instead of relying on session.py having built the
        # session — harnesses that construct their own SparkSession (the
        # correctness driver) would otherwise fail before the bigint
        # fallback below can run.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long; truncate to micros — identical to
        # DuckDB's nanos->micros conversion of the same file.
        # integer `div` — double division would lose precision at ~1.7e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def dsum(col: Column | str, prec: str = "decimal(30,8)") -> Column:
    """Exact (decimal-routed) sum of a double column, returned as double.

    Parallel double summation is order-dependent, so Spark and DuckDB can
    disagree in the last ULPs; summing decimals is exact and engine-agnostic.
    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(prec)).cast("double")


def davg(col: Column | str, prec: str = "decimal(30,8)") -> Column:
    """Exact decimal-routed mean as double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE) / COUNT(x)``.
    (COUNT of the column, not *, so NULLs divide out identically.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(prec)).cast("double") / F.count(c)


def md5_long(col: Column | str) -> Column:
    """Portable 60-bit numeric hash: first 15 hex digits of md5 as BIGINT.

    Oracle twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


ORACLE_MD5_LONG = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
