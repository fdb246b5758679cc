"""JSONL corpus ingestion & export — the interchange format of
training-data pipelines (one JSON document per line; what every public
corpus release and annotation tool produces/consumes).

The reference is CSV-centric (SURVEY.md S5/S7); this extends the source
surface to the format an LLM-data user actually moves documents in. Both
directions stay on Spark's native JSON datasource — distributed,
predicate-pushdown-aware line scans, no Python in the loop:

- **read**: explicit schema (no inference pass over 100 TB), tolerant
  PERMISSIVE parsing with the bad line preserved in
  ``_corrupt_record`` (the CSV path's ON_ERROR=CONTINUE analogue) or
  strict FAILFAST for validated stages;
- **write**: one file per partition in parallel; optional gzip/zstd codec
  (decompression is splittable-free for gzip — prefer zstd for re-read
  paths) and date-derived directory partitioning for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Export a corpus as JSONL part files (one JSON object per line,
    written in parallel — never a driver-side to_json loop)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    strict: bool = False,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema.

    ``strict=True`` → FAILFAST (a malformed line aborts the read — the
    validated-stage contract). Default PERMISSIVE nulls the malformed
    line's columns; with ``keep_corrupt=True`` the raw line is retained in
    ``_corrupt_record`` for quarantine flows (the CSV path's
    ON_ERROR=CONTINUE analogue, SURVEY S5).
    """
    sch = schema
    if keep_corrupt and not strict:
        sch = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(sch)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``keep_corrupt`` read into (clean, quarantined) — the
    standard ingest gate: clean rows continue, bad lines land in a review
    table with the raw payload intact.

    The parsed result is cached first: Spark disallows queries that
    reference ONLY ``_corrupt_record`` over a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the column
    exists only while the parser runs, so the quarantine side must read a
    materialized parse. At warehouse scale, write the parsed frame to a
    staging table and split from there (same contract, durable).
    """
    df = df.cache()
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad
