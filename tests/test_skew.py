"""Skew utilities: salted join and two-phase aggregation must reproduce the
plain results exactly while fanning hot keys out over salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_datapipeline_using_snowflake_spark.operators import salted_join, two_phase_agg


def _skewed(spark):
    # key 7 carries 90% of rows (the hot key)
    hot = spark.range(0, 9000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    rest = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(rest)


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = big.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"), F.sum("v").alias("sv")
    ).first()
    salted = salted_join(big, small, on="k", salt_buckets=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"), F.sum("v").alias("sv")
    ).first()
    assert (plain["n"], plain["sw"], plain["sv"]) == (salted["n"], salted["sw"], salted["sv"])


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"])
        for r in two_phase_agg(
            df, ["k"], {"s": F.sum("v"), "c": F.count("v")}, salt_buckets=8
        ).collect()
    }
    assert plain == salted
