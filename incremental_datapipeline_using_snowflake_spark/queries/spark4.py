"""Spark 4-native surfaces, each hash-checked against the DuckDB oracle:

- ``recursive_cte`` — ``WITH RECURSIVE`` (new in Spark 4): the SAME SQL
  text runs on both engines.
- ``lateral_join`` — ``DataFrame.lateralJoin`` with a correlated
  ``.outer()`` reference (top-k-per-group as a lateral subquery instead
  of a window).
- ``variant_extract`` — the VARIANT type: ``parse_json`` +
  ``variant_get`` path extraction (the open-format semi-structured path;
  Catalyst shreds variant access instead of re-parsing strings).
- ``udtf_chunk`` — a Python UDTF (table function) invoked via SQL
  ``LATERAL``, emitting token chunks per document. Row-at-a-time Python
  is the SLOW path kept as API-surface parity — the vectorized form of
  the same operation is ``ops.textprep.chunk_documents`` (pure Column
  expressions), which `doc_chunking` hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import load

# ---------------------------------------------------------------------------
# recursive_cte — ancestor chain over the implicit binary tree id -> id >> 1;
# root_depth = floor(log2(id)) + 1. One SQL text, two engines.
# ---------------------------------------------------------------------------
RECURSIVE_CTE_SQL = """
WITH RECURSIVE up(id, anc, depth) AS (
  SELECT doc_id, doc_id >> 1, 1 FROM documents WHERE doc_id BETWEEN 1 AND 255
  UNION ALL
  SELECT id, anc >> 1, depth + 1 FROM up WHERE anc > 0
)
SELECT id, max(depth) AS root_depth
FROM up
GROUP BY id
ORDER BY id
"""


def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(RECURSIVE_CTE_SQL)


# ---------------------------------------------------------------------------
# lateral_join — top-2 orders per customer through a correlated lateral
# subquery (the Catalyst plan decorrelates to a ranked join; contrast with
# the window-function form in window_family).
# ---------------------------------------------------------------------------
LATERAL_MAX_CUST = 200


def lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < LATERAL_MAX_CUST)
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders")
    top2 = (
        orders.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(2)
        .select("o_orderkey", "o_totalprice")
    )
    return cust.lateralJoin(top2).orderBy("c_custkey", "o_orderkey")


LATERAL_JOIN_SQL = f"""
SELECT c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c_custkey < {LATERAL_MAX_CUST}
ORDER BY c_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# variant_extract — VARIANT ingestion + typed path extraction.
# ---------------------------------------------------------------------------
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return (
        ev.select(
            "event_id",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
            F.expr("variant_get(parse_json(props), '$.missing') IS NULL").alias(
                "missing_is_null"
            ),
        )
        .orderBy("event_id")
    )


VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       json_extract(props, '$.missing') IS NULL AS missing_is_null
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# udtf_chunk — Python UDTF via SQL LATERAL. API-surface demo (row-at-a-time
# Python); the production chunker is the vectorized ops.textprep form.
# ---------------------------------------------------------------------------
UDTF_CHUNK_TOKENS = 10
UDTF_MAX_DOC = 300


def udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            words = (text or "").split()
            for i in range(0, len(words), UDTF_CHUNK_TOKENS):
                chunk = words[i : i + UDTF_CHUNK_TOKENS]
                yield (i // UDTF_CHUNK_TOKENS, " ".join(chunk), len(chunk))

    spark.udtf.register("chunk_doc", ChunkDoc)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents d, LATERAL chunk_doc(d.text) c
        WHERE d.doc_id < {UDTF_MAX_DOC}
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


UDTF_CHUNK_SQL = f"""
WITH sp AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE doc_id < {UDTF_MAX_DOC}
    -- empty/whitespace-only docs: ''.split() on the Python side yields no
    -- chunks, but string_split_regex(trim('')) is [''] (len 1) — filter
    -- them so both engines emit zero chunks
    AND len(trim(text)) > 0
),
chunks AS (
  SELECT doc_id,
         CAST(i AS INTEGER) AS chunk_idx,
         array_to_string(list_slice(w, i * {UDTF_CHUNK_TOKENS} + 1,
                                    (i + 1) * {UDTF_CHUNK_TOKENS}), ' ') AS chunk_text,
         CAST(len(list_slice(w, i * {UDTF_CHUNK_TOKENS} + 1,
                             (i + 1) * {UDTF_CHUNK_TOKENS})) AS INTEGER) AS n_tokens
  FROM sp, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(w) / {UDTF_CHUNK_TOKENS}.0) AS BIGINT))) AS i
  ) u
)
SELECT doc_id, chunk_idx, chunk_text, n_tokens
FROM chunks
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# collation_ops — Spark 4 string collations: case-insensitive equality and
# grouping through UTF8_LCASE, without rewriting expressions to lower().
# Mixed-case input is synthesized deterministically (odd keys lowercase);
# the oracle replays the same semantics via lower() normalization.
# ---------------------------------------------------------------------------
def collation_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 1, F.lower("c_mktsegment")
    ).otherwise(F.col("c_mktsegment"))
    ci = F.collate(mixed, "UTF8_LCASE")
    return (
        cust.select(F.col("c_custkey"), ci.alias("seg_ci"))
        .groupBy(F.lower("seg_ci").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("seg_ci") == F.lit("building")).cast("long")).alias(
                "eq_building_ci"
            ),
        )
        .orderBy("segment")
    )


COLLATION_SQL = """
WITH mixed AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 1 THEN lower(c_mktsegment)
              ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT lower(seg) AS segment,
       count(*) AS n,
       CAST(sum(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END) AS BIGINT)
         AS eq_building_ci
FROM mixed
GROUP BY lower(seg)
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# snowflake_dialect_qualify — the Snowflake-dialect entry point
# (functions/sql_script.translate_snowflake_sql): the SAME Snowflake-style
# statement text (QUALIFY + if()) runs on BOTH engines — DuckDB executes
# QUALIFY natively, Spark through the dialect shim's subquery rewrite — so
# the oracle checks the translation itself, not a hand-written twin.
# Reference parity: the reference's users write Snowflake SQL
# (udfs_and_spoc/*.sql, orchestrate_tasks.sql.j2); this is the migration
# path for their QUALIFY/IFF/DATEADD scripts.
# ---------------------------------------------------------------------------
SNOWFLAKE_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       if(o_totalprice > 250000, 'big', 'small') AS size_class
FROM {orders}
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) = 1
ORDER BY o_custkey
"""


def snowflake_dialect_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sql_script import run_sql_script

    load(spark, sf_dir, "orders").createOrReplaceTempView("sfq_orders")
    return run_sql_script(
        spark, SNOWFLAKE_QUALIFY_SQL.format(orders="sfq_orders"), dialect="snowflake"
    )


# Nested QUALIFY (r06): a depth-1 QUALIFY inside a derived table (top-3
# orders per customer) feeding an aggregation, plus a depth-0 QUALIFY over
# the aggregate (top-50 customers by their top-3 spend). DuckDB executes the
# Snowflake-ish text natively; Spark goes through the shim's deepest-first
# scope rewrite — the oracle checks the nested translation itself.
SNOWFLAKE_QUALIFY_NESTED_SQL = """
SELECT o_custkey, n_top, top_value
FROM (
  SELECT o_custkey, count(*) AS n_top,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS top_value
  FROM (
    SELECT o_custkey, o_totalprice
    FROM {orders}
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
  ) top3
  GROUP BY o_custkey
) agg
QUALIFY ROW_NUMBER() OVER (ORDER BY top_value DESC, o_custkey) <= 50
ORDER BY top_value DESC, o_custkey
"""


def snowflake_dialect_qualify_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sql_script import run_sql_script

    load(spark, sf_dir, "orders").createOrReplaceTempView("sfqn_orders")
    return run_sql_script(
        spark,
        SNOWFLAKE_QUALIFY_NESTED_SQL.format(orders="sfqn_orders"),
        dialect="snowflake",
    )


# Datetime dialect surface (r06): TO_VARCHAR/TO_DATE/TO_TIMESTAMP with
# Snowflake format strings, DATEADD/DATEDIFF — run through the shim on
# Spark; the oracle is hand-written DuckDB (strftime/interval arithmetic),
# so it pins the TRANSLATION SEMANTICS, not just the spelling.
SNOWFLAKE_DATETIME_SQL = """
SELECT o_orderkey,
       TO_VARCHAR(o_orderdate, 'YYYY-MM-DD') AS od_str,
       TO_VARCHAR(o_orderdate, 'DD Mon YYYY') AS od_pretty,
       TO_DATE(TO_VARCHAR(o_orderdate, 'YYYY-MM-DD'), 'YYYY-MM-DD') AS od_roundtrip,
       TO_TIMESTAMP(TO_VARCHAR(o_orderdate, 'YYYY-MM-DD HH24:MI:SS'),
                    'YYYY-MM-DD HH24:MI:SS') AS ts_roundtrip,
       DATEADD(day, 7, o_orderdate) AS due,
       DATEDIFF(day, TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
FROM {orders}
WHERE o_orderkey % 100 = 0
ORDER BY o_orderkey
"""


def snowflake_dialect_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sql_script import run_sql_script

    load(spark, sf_dir, "orders").createOrReplaceTempView("sfdt_orders")
    return run_sql_script(
        spark, SNOWFLAKE_DATETIME_SQL.format(orders="sfdt_orders"), dialect="snowflake"
    )


SNOWFLAKE_DATETIME_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS od_str,
       strftime(o_orderdate, '%d %b %Y') AS od_pretty,
       CAST(o_orderdate AS DATE) AS od_roundtrip,
       o_orderdate AS ts_roundtrip,
       o_orderdate + INTERVAL 7 DAY AS due,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
FROM orders
WHERE o_orderkey % 100 = 0
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# snowflake_dialect_misc (r07) — the NVL-family / LISTAGG / TRY_TO_NUMBER
# surface a Snowflake-SQL user hits immediately. NVL/NVL2/ZEROIFNULL and
# LISTAGG (incl. WITHIN GROUP + DISTINCT) are NATIVE in Spark 4 and must
# pass through the shim untouched; TRY_TO_NUMBER is translated (bare ->
# try_cast DECIMAL(38,0), (p,s) -> try_cast DECIMAL(p,s)) because Spark's
# try_to_number demands a format string. The oracle executes the
# hand-rewritten standard SQL (string_agg / COALESCE / CASE / TRY_CAST).
# ---------------------------------------------------------------------------
SNOWFLAKE_MISC_SQL = """
SELECT c_mktsegment,
       LISTAGG(DISTINCT TO_VARCHAR(c_nationkey), ',')
         WITHIN GROUP (ORDER BY TO_VARCHAR(c_nationkey)) AS nations,
       CAST(SUM(ZEROIFNULL(TRY_TO_NUMBER(SUBSTR(c_name, 10, 9)))) AS BIGINT) AS custkey_sum,
       CAST(SUM(ZEROIFNULL(TRY_TO_NUMBER(SUBSTR(c_name, 1, 4)))) AS BIGINT) AS alpha_sum,
       NVL(MIN(NULLIF(c_mktsegment, c_mktsegment)), 'none') AS nvl_default,
       NVL2(MAX(c_name), 'has_name', 'no_name') AS nvl2_flag,
       CAST(TRY_TO_NUMBER(MIN(c_name), 4, 1) AS DOUBLE) AS try_prec
FROM {customer}
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def snowflake_dialect_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sql_script import run_sql_script

    load(spark, sf_dir, "customer").createOrReplaceTempView("sfm_customer")
    return run_sql_script(
        spark, SNOWFLAKE_MISC_SQL.format(customer="sfm_customer"),
        dialect="snowflake",
    )


SNOWFLAKE_MISC_ORACLE = """
SELECT c_mktsegment,
       string_agg(DISTINCT CAST(c_nationkey AS VARCHAR), ','
                  ORDER BY CAST(c_nationkey AS VARCHAR)) AS nations,
       CAST(SUM(COALESCE(TRY_CAST(substr(c_name, 10, 9) AS DECIMAL(38, 0)), 0)) AS BIGINT) AS custkey_sum,
       CAST(SUM(COALESCE(TRY_CAST(substr(c_name, 1, 4) AS DECIMAL(38, 0)), 0)) AS BIGINT) AS alpha_sum,
       COALESCE(MIN(NULLIF(c_mktsegment, c_mktsegment)), 'none') AS nvl_default,
       CASE WHEN MAX(c_name) IS NOT NULL THEN 'has_name' ELSE 'no_name' END AS nvl2_flag,
       CAST(TRY_CAST(MIN(c_name) AS DECIMAL(4, 1)) AS DOUBLE) AS try_prec
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# snowflake_dialect_flatten (r08) — the LATERAL FLATTEN / OBJECT_CONSTRUCT /
# GET_PATH semi-structured surface, the single most common Snowflake idiom
# not previously translated. The Snowflake-dialect text goes through the
# shim (FLATTEN -> LATERAL variant_explode with (index, key, value);
# OBJECT_CONSTRUCT -> null-dropping VARIANT object; GET_PATH ->
# variant_get); the oracle executes the hand-rewritten standard SQL
# (DuckDB zipped unnests + direct column access), so it pins the
# TRANSLATION SEMANTICS — indices, element order, object path access.
# Fixture: a deterministic JSON tag array per document (lang/source
# variants), flattened back out with ordinals.
# ---------------------------------------------------------------------------
SNOWFLAKE_FLATTEN_SQL = """
SELECT d.doc_id,
       CAST(f.index AS BIGINT) AS idx,
       CAST(f.value AS STRING) AS tok,
       CAST(GET_PATH(OBJECT_CONSTRUCT('lang', d.lang, 'n', d.n_chars), 'n')
            AS BIGINT) AS n_meta
FROM {docs} d, LATERAL FLATTEN(INPUT => parse_json(d.tags)) f
WHERE d.doc_id < 3000
ORDER BY d.doc_id, idx
"""


def snowflake_dialect_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sql_script import run_sql_script

    docs = load(spark, sf_dir, "documents")
    docs.select(
        "doc_id", "lang", "n_chars",
        F.to_json(
            F.array("lang", "source", F.concat_ws("-", "lang", "source"))
        ).alias("tags"),
    ).createOrReplaceTempView("sff_docs")
    return run_sql_script(
        spark, SNOWFLAKE_FLATTEN_SQL.format(docs="sff_docs"), dialect="snowflake"
    )


SNOWFLAKE_FLATTEN_ORACLE = """
WITH d AS (
  SELECT doc_id, n_chars,
         [lang, source, lang || '-' || source] AS tags
  FROM documents
  WHERE doc_id < 3000
)
SELECT doc_id,
       CAST(unnest(range(3)) AS BIGINT) AS idx,
       unnest(tags) AS tok,
       CAST(n_chars AS BIGINT) AS n_meta
FROM d
ORDER BY doc_id, idx
"""


# ---------------------------------------------------------------------------
# sql_session_variables — Spark 4 session variables + EXECUTE IMMEDIATE:
# the Snowflake-scripting parity surface (the reference's procedures build
# SQL strings and bind parameters; Snowflake scripting uses variables —
# DECLARE/SET VARIABLE + EXECUTE IMMEDIATE is the engine-native analogue).
# The statement text is BUILT as a string and executed dynamically with the
# threshold bound via a session variable; the oracle replays the semantics
# with the literal inlined (it checks results, not API spelling).
# ---------------------------------------------------------------------------
SQLVAR_BIG_CUT = 400000.0


def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("sv_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sv_big_cut DOUBLE")
    spark.sql(f"SET VARIABLE sv_big_cut = {SQLVAR_BIG_CUT}")
    report = (
        "SELECT o_orderpriority, count(*) AS n_big, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS big_value "
        "FROM sv_orders WHERE o_totalprice > sv_big_cut "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    return spark.sql("EXECUTE IMMEDIATE :stmt", args={"stmt": report})


SQLVAR_SQL = f"""
SELECT o_orderpriority, count(*) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS big_value
FROM orders WHERE o_totalprice > {SQLVAR_BIG_CUT}
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES: dict = {
    "recursive_cte": (recursive_cte, RECURSIVE_CTE_SQL),
    "lateral_join": (lateral_join, LATERAL_JOIN_SQL),
    "variant_extract": (variant_extract, VARIANT_SQL),
    "udtf_chunk": (udtf_chunk, UDTF_CHUNK_SQL),
    "collation_ops": (collation_ops, COLLATION_SQL),
    "sql_session_variables": (sql_session_variables, SQLVAR_SQL),
    "snowflake_dialect_qualify": (
        snowflake_dialect_qualify,
        SNOWFLAKE_QUALIFY_SQL.format(orders="orders"),
    ),
    "snowflake_dialect_qualify_nested": (
        snowflake_dialect_qualify_nested,
        SNOWFLAKE_QUALIFY_NESTED_SQL.format(orders="orders"),
    ),
    "snowflake_dialect_datetime": (
        snowflake_dialect_datetime,
        SNOWFLAKE_DATETIME_ORACLE,
    ),
    "snowflake_dialect_misc": (snowflake_dialect_misc, SNOWFLAKE_MISC_ORACLE),
    "snowflake_dialect_flatten": (
        snowflake_dialect_flatten,
        SNOWFLAKE_FLATTEN_ORACLE,
    ),
}
