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


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return SK.cms_heavy_hitters(docs)


def _cms_sql() -> str:
    from .util import ORACLE_MD5_LONG

    cell = lambda j: (  # noqa: E731
        ORACLE_MD5_LONG.format(x=f"('cms{j}:' || tok)") + f" % {SK.CMS_W}"
    )
    cells = ", ".join(f"{cell(j)} AS c{j}" for j in range(SK.CMS_D))
    unpivot = " UNION ALL ".join(
        f"SELECT tok, exact_cnt, {j} AS j, c{j} AS cell FROM cand" for j in range(SK.CMS_D)
    )
    sk_unpivot = " UNION ALL ".join(
        f"SELECT {j} AS j, c{j} AS cell FROM tok_cells" for j in range(SK.CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
tok_cells AS (SELECT tok, {cells} FROM toks),
sketch AS (
  SELECT j, cell, count(*) AS cnt FROM ({sk_unpivot}) GROUP BY j, cell
),
exact AS (SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY tok),
n AS (SELECT CAST(sum(exact_cnt) AS BIGINT) AS n_tokens FROM exact),
cand AS (
  SELECT tok, exact_cnt, {cells}
  FROM (SELECT e.tok, e.exact_cnt FROM exact e ORDER BY exact_cnt DESC, tok LIMIT 10) c
),
est AS (
  SELECT tok, exact_cnt, min(cnt) AS cms_est
  FROM ({unpivot}) u JOIN sketch USING (j, cell)
  GROUP BY tok, exact_cnt
)
SELECT tok, exact_cnt, cms_est,
       ((cms_est - exact_cnt) * {SK.CMS_W} <= 2 * (SELECT n_tokens FROM n)) AS bound_ok
FROM est ORDER BY exact_cnt DESC, tok
"""


# ---------------------------------------------------------------------------
# cms_grouped_hitters — per-language heavy hitters from PER-GROUP count-min
# sketches (one d*w counter grid per lang, one pass): the trending-per-
# category shape. Estimates replay bit-exactly in the oracle (portable md5
# cells); the overcount bound uses each group's own token total, and no
# scalar collect exists anywhere in the plan (per-group totals ride a
# broadcast join).
# ---------------------------------------------------------------------------
def cms_grouped_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    return SK.cms_heavy_hitters_grouped(docs, group_col="lang", top_k=5)


def _cms_grouped_sql() -> str:
    from .util import ORACLE_MD5_LONG

    cell = lambda j: (  # noqa: E731
        ORACLE_MD5_LONG.format(x=f"('cms{j}:' || tok)") + f" % {SK.CMS_W}"
    )
    cells = ", ".join(f"{cell(j)} AS c{j}" for j in range(SK.CMS_D))
    unpivot = " UNION ALL ".join(
        f"SELECT lang, tok, exact_cnt, rk, {j} AS j, c{j} AS cell FROM cand"
        for j in range(SK.CMS_D)
    )
    sk_unpivot = " UNION ALL ".join(
        f"SELECT lang, {j} AS j, c{j} AS cell FROM tok_cells" for j in range(SK.CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
tok_cells AS (SELECT lang, tok, {cells} FROM toks),
sketch AS (
  SELECT lang, j, cell, count(*) AS cnt FROM ({sk_unpivot}) GROUP BY lang, j, cell
),
exact AS (SELECT lang, tok, count(*) AS exact_cnt FROM toks GROUP BY lang, tok),
totals AS (SELECT lang, CAST(sum(exact_cnt) AS BIGINT) AS grp_tokens FROM exact GROUP BY lang),
cand AS (
  SELECT lang, tok, exact_cnt, rk, {cells} FROM (
    SELECT lang, tok, exact_cnt,
           row_number() OVER (PARTITION BY lang ORDER BY exact_cnt DESC, tok) AS rk
    FROM exact
  ) WHERE rk <= 5
),
est AS (
  SELECT lang, tok, exact_cnt, rk, min(cnt) AS cms_est
  FROM ({unpivot}) u JOIN sketch USING (lang, j, cell)
  GROUP BY lang, tok, exact_cnt, rk
)
SELECT lang, rk, tok, exact_cnt, cms_est,
       ((cms_est - exact_cnt) * {SK.CMS_W} <= 2 * t.grp_tokens) AS bound_ok
FROM est JOIN totals t USING (lang)
ORDER BY lang, rk
"""


# hll_audience_overlap (r06) — sketch set-algebra: pairwise |A ∩ B| via
# inclusion-exclusion over merged HLL sketches, checked against the exact
# intersection. The oracle computes the exact side and asserts the same
# envelope the Spark side emits (the estimate is deterministic for a given
# input, but only the envelope is the portable contract).
def hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return SK.hll_overlap_check(ev, "event_type", "user_id").orderBy(
        "type_a", "type_b"
    )


HLL_OVERLAP_SQL = """
WITH d AS (
  SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS v FROM events
),
grp AS (
  SELECT g FROM d GROUP BY g
),
ex AS (
  SELECT x.g AS a, y.g AS b, CAST(count(*) AS BIGINT) AS c
  FROM d x JOIN d y ON x.v = y.v AND x.g < y.g
  GROUP BY x.g, y.g
)
SELECT ga.g AS type_a, gb.g AS type_b,
       COALESCE(ex.c, 0) AS exact_overlap,
       TRUE AS overlap_ok
FROM grp ga
JOIN grp gb ON ga.g < gb.g
LEFT JOIN ex ON ex.a = ga.g AND ex.b = gb.g
ORDER BY type_a, type_b
"""


QUERIES: dict = {
    "hll_distinct_users": (hll_distinct_users, HLL_DISTINCT_SQL),
    "hll_audience_overlap": (hll_audience_overlap, HLL_OVERLAP_SQL),
    "hll_mergeable_rollup": (hll_mergeable_rollup, HLL_MERGE_SQL),
    "quantile_sketch_value": (quantile_sketch_value, QUANTILE_SQL),
    "cms_heavy_hitters": (cms_heavy_hitters, _cms_sql()),
    "cms_grouped_hitters": (cms_grouped_hitters, _cms_grouped_sql()),
}
