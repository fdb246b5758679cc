"""Spark 4 Python Data Source API: the noaa_feed format must parse
identically to the DataFrame-based parser (S2/S4 parity) and distribute
across partitions losslessly."""

from __future__ import annotations

FEED = """# NOAA-style comment header
# more commentary
2022 1 1 2022.001 417.12
2022 1 2 2022.004 417.43

2022 1 3 2022.007 bad_value
short line
2022 1 4 2022.010 418.02
"""


def test_noaa_datasource_matches_dataframe_parser(spark, tmp_path):
    from incremental_datapipeline_using_snowflake_spark.sources.noaa_datasource import (
        NoaaFeedDataSource,
    )
    from incremental_datapipeline_using_snowflake_spark.sources.noaa_feed import (
        parse_feed_text,
    )

    spark.dataSource.register(NoaaFeedDataSource)
    p = tmp_path / "feed.txt"
    p.write_text(FEED)

    via_ds = sorted(
        map(tuple, spark.read.format("noaa_feed").option("path", str(p)).load().collect())
    )
    via_df = sorted(map(tuple, parse_feed_text(spark, FEED).collect()))
    assert via_ds == via_df
    assert len(via_ds) == 4
    # tolerant coercion: bad_value -> NULL, row kept
    assert any(r[4] is None for r in via_ds)

    # striding across 3 partitions is lossless and order-insensitive
    via_3 = sorted(
        map(
            tuple,
            spark.read.format("noaa_feed")
            .option("path", str(p))
            .option("numPartitions", 3)
            .load()
            .collect(),
        )
    )
    assert via_3 == via_ds


def test_noaa_datasource_text_option(spark):
    from incremental_datapipeline_using_snowflake_spark.sources.noaa_datasource import (
        NoaaFeedDataSource,
    )

    spark.dataSource.register(NoaaFeedDataSource)
    out = spark.read.format("noaa_feed").option("text", FEED).load()
    assert out.count() == 4
    assert out.columns == ["YEAR", "MONTH", "DAY", "DECIMAL_DATE", "CO2_PPM"]
