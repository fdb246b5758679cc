"""PySpark-native incremental analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo
``BigDataTeam5/Incremental_DataPipeline_using_Snowflake`` (an incremental CDC
ELT pipeline on Snowflake: RAW -> stream -> MERGE -> HARMONIZED -> ANALYTICS),
re-expressed with the DataFrame / Spark SQL / Structured Streaming APIs.

Layout
------
- ``session``    : SparkSession factory tuned for deterministic, scale-aware runs
- ``functions``  : scalar kernels (pct-change, volatility, min-max normalize)
                   as native Column expressions + SQL-registered UDF surface
- ``operators``  : MERGE/upsert rewrite, changelog (CDC stream) emulation
- ``sources``    : NOAA text-feed parser, tolerant CSV ingest, pandas bridge
- ``plans``      : pipeline stages (load_raw / harmonize / analytics) + orchestrator
- ``streaming``  : Structured Streaming variant of the pipeline (foreachBatch)
- ``ops``        : large-scale data-pipeline operators (dedup, similarity
                   search, text analysis, multimodal plumbing)
"""

__version__ = "0.1.0"
