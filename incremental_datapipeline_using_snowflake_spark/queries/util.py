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
    # Queries must behave identically under a harness-built SparkSession,
    # not just session.py's. Pin the result-affecting confs at runtime
    # (all three are runtime-settable):
    # - UTC so TIMESTAMP_LTZ renderings match the (naive) DuckDB oracle,
    # - ANSI off so casts coerce bad values to NULL (reference semantics),
    # - nanosAsLong so a TIMESTAMP(NANOS) events file reads as bigint
    #   instead of throwing PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long; truncate to micros — identical
            # to DuckDB's nanos->micros conversion of the same file. Integer
            # `div`: double division loses precision at ~1.7e18 ns.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        elif ts_type == "timestamp":
            # Adjusted-to-UTC parquet timestamps read as LTZ; normalize to
            # NTZ (session tz is UTC, so the wall-clock value is unchanged)
            # to match DuckDB's naive TIMESTAMP for the value-hash compare.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        # timestamp_ntz (the current testdata: plain timestamp[us]) passes
        # through untouched.
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


def seg_sql(x: str) -> str:
    """DuckDB twin of ``ops.text.segment_text`` — the SAME two capture-
    group patterns (built from the same constants; RE2-safe, no
    lookarounds), RE2 ``\\1`` replacement syntax instead of Java ``$1``,
    explicit 'g' flag instead of Java's replace-all default. Identity on
    text with no whitespace-free-script characters."""
    from ..ops.text import SEG_P1, SEG_P2

    return (
        f"regexp_replace(regexp_replace(replace({x}, chr(12288), ' '), "
        f"'{SEG_P1}', ' \\1', 'g'), '{SEG_P2}', '\\1 \\2', 'g')"
    )


def seg_words_sql(x: str) -> str:
    """DuckDB twin of ``ops.text.words_col``: script-aware segmentation,
    then the \\s+ split."""
    return f"string_split_regex(trim({seg_sql(x)}), '\\s+')"
