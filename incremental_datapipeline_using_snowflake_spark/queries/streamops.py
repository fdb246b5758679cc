"""Event-time window queries over the ``events`` table — the streaming
extension surface (streaming/windows.py) exercised in batch form so the
DuckDB oracle can hash-check the semantics.

The reference has no event-time windows (SURVEY.md §2.7); these extend it
with the standard streaming-analytics family. Spark's ``F.window`` aligns
tumbling/sliding buckets to the Unix epoch, which the oracle reproduces with
epoch arithmetic; sessions use the gaps-and-islands rewrite on both engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import session_stats_batch, sliding_window_agg, tumbling_window_agg
from .util import dsum, load


def event_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows × event_type: count + exact value sum."""
    ev = load(spark, sf_dir, "events")
    out = tumbling_window_agg(
        ev,
        "ts",
        "6 hours",
        [F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")],
        group_cols=["event_type"],
    )
    return out.orderBy("window_start", "event_type")


EVENT_WINDOW_AGG_SQL = """
SELECT to_timestamp(floor(epoch(ts) / 21600) * 21600)::TIMESTAMP AS window_start,
       to_timestamp(floor(epoch(ts) / 21600) * 21600 + 21600)::TIMESTAMP AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def event_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows advancing hourly (each event in 2 windows)."""
    ev = load(spark, sf_dir, "events")
    out = sliding_window_agg(
        ev,
        "ts",
        "2 hours",
        "1 hour",
        [F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")],
    )
    return out.orderBy("window_start")


EVENT_SLIDING_WINDOW_SQL = """
WITH assigned AS (
  SELECT to_timestamp(floor(epoch(ts) / 3600) * 3600 - off.i * 3600)::TIMESTAMP AS window_start,
         value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) AS off
)
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY window_start
ORDER BY window_start
"""


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-based sessions (30-min gap): bounds, counts, value sum.

    Gaps-and-islands rewrite (streaming/windows.py:sessionize_batch) —
    shuffles once on user_id; identical SQL shape runs on the oracle.
    """
    ev = load(spark, sf_dir, "events")
    out = session_stats_batch(ev, "ts", "user_id", 1800, value_col="value")
    return out.orderBy("user_id", "session_id")


EVENT_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS _new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessioned AS (
  -- BIGINT: DuckDB's integer SUM is HUGEINT -> float64 in pandas, which
  -- the driver's canonicalizer hashes differently from Spark's int64.
  SELECT user_id, ts, value,
         CAST(sum(_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
FROM sessioned
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def event_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract ``props.k`` (JSON) per event and
    aggregate — the engine's VARIANT-ish surface (SURVEY.md §1.3 notes the
    reference only gestures at VARIANT; JSON columns are the Spark-native
    equivalent). ``get_json_object`` stays JVM-side (no UDF)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENT_JSON_PROPS_SQL = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# pandas_udf_normalize — the Arrow-vectorized scalar-UDF surface as a
# first-class declared query: min-max normalization through a @pandas_udf
# (batch Arrow transfer, NumPy vector math — the blessed form when an
# expression genuinely can't stay JVM-side), scalar-cached bounds as
# closure literals, oracle twin in plain SQL.
# ---------------------------------------------------------------------------
def pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    ev = load(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("value"), F.max("value")).first()  # A2 scalar cache

    @pandas_udf("double")
    def nrm(s):
        # float64 Series arithmetic — bit-identical to the oracle's double
        # expression because both are IEEE double ops on the same literals
        return (s - mn) / (mx - mn)

    return (
        ev.filter(F.col("event_id") < 2000)
        .select("event_id", F.round(nrm(F.col("value")), 6).alias("norm_value"))
        .orderBy("event_id")
    )


PANDAS_UDF_NORM_SQL = """
WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
SELECT event_id, round((value - mn) / (mx - mn), 6) AS norm_value
FROM events, b
WHERE event_id < 2000
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# pandas_udaf_quartiles — the GROUPED_AGG pandas_udf surface (custom
# aggregate / UDAF): per-event-type median and interquartile range through
# an Arrow-batched aggregate UDF. Completes the Arrow API family (scalar
# pandas_udf, mapInPandas, grouped-map, cogrouped-map, stateful — and now
# grouped-agg). Determinism: values are quantized to int64 cents BEFORE
# aggregation and the UDF sorts internally, so linear-interpolated
# quantiles are the same IEEE doubles as DuckDB's quantile_cont
# regardless of row arrival order. Scale shape: partial Arrow batches per
# group feed one reducer per key — a full-group aggregate, so groups must
# fit an executor (true of any percentile-exact aggregate; the
# sketch-based GK form in ops.sketches is the unbounded-cardinality path).
# ---------------------------------------------------------------------------
def pandas_udaf_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_cents(s: pd.Series) -> float:
        v = np.sort(s.to_numpy(dtype="int64"))
        return float(np.percentile(v, 50, method="linear"))

    @pandas_udf("double")
    def iqr_cents(s: pd.Series) -> float:
        v = np.sort(s.to_numpy(dtype="int64"))
        return float(
            np.percentile(v, 75, method="linear")
            - np.percentile(v, 25, method="linear")
        )

    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        # grouped-agg UDFs cannot mix with built-in aggregates in one agg
        # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a UDAF too
        return len(s)

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            median_cents("cents").alias("median_cents"),
            iqr_cents("cents").alias("iqr_cents"),
            n_rows("cents").alias("n"),
        )
        .orderBy("event_type")
    )


PANDAS_UDAF_SQL = """
SELECT event_type,
       quantile_cont(cents, 0.5) AS median_cents,
       quantile_cont(cents, 0.75) - quantile_cont(cents, 0.25) AS iqr_cents,
       count(*) AS n
FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# grouped_scale_pandas — grouped-map applyInPandas surface (one Arrow batch
# stream per group): per-language integer min-max scaling of n_chars. The
# arithmetic is exact int64 (numpy // == Spark div == DuckDB //), so the
# Python-worker path is hash-gated against a window-function rewrite.
# ---------------------------------------------------------------------------
def grouped_scale_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.arrowops import grouped_minmax_scale

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return grouped_minmax_scale(docs, "lang", "n_chars").orderBy("doc_id")


GROUPED_SCALE_SQL = """
SELECT doc_id, lang, n_chars,
       ((n_chars - mn) * 1000) // (mx - mn + 1) AS scaled
FROM (
  SELECT doc_id, lang, n_chars,
         min(n_chars) OVER (PARTITION BY lang) AS mn,
         max(n_chars) OVER (PARTITION BY lang) AS mx
  FROM documents
)
ORDER BY doc_id
"""


# event_funnel / event_cohort_retention (r06): the two classic
# product-analytics shapes over the events table. Funnel = ordered
# view→click→purchase reach (strictly increasing timestamps per user);
# retention = weekly cohorts by first-seen week. Ratios are
# parts-per-million ints (int-grid idiom — raw rounded doubles are
# engine-fragile).
FUNNEL_STEPS = ["view", "click", "purchase"]


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.temporal import funnel_conversion

    ev = load(spark, sf_dir, "events")
    return funnel_conversion(ev, FUNNEL_STEPS).orderBy("step_idx")


EVENT_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
),
c AS (
  SELECT (SELECT count(*) FROM s1) AS c1,
         (SELECT count(*) FROM s2) AS c2,
         (SELECT count(*) FROM s3) AS c3
)
SELECT 1 AS step_idx, 'view' AS step, CAST(c1 AS BIGINT) AS users,
       CAST(NULL AS BIGINT) AS conv_ppm FROM c
UNION ALL
SELECT 2, 'click', CAST(c2 AS BIGINT),
       CAST(floor(c2 / c1 * 1000000 + 0.5) AS BIGINT) FROM c
UNION ALL
SELECT 3, 'purchase', CAST(c3 AS BIGINT),
       CAST(floor(c3 / c2 * 1000000 + 0.5) AS BIGINT) FROM c
ORDER BY step_idx
"""


def event_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.temporal import cohort_retention

    ev = load(spark, sf_dir, "events")
    return cohort_retention(ev, max_weeks=8).orderBy("cohort_week", "week_offset")


EVENT_COHORT_SQL = """
WITH wk AS (
  SELECT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS w FROM events
),
first AS (
  SELECT u, min(w) AS cohort_week FROM wk GROUP BY 1
),
active AS (
  SELECT DISTINCT u, w FROM wk
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_users FROM first GROUP BY 1
),
offs AS (
  SELECT f.cohort_week, CAST((a.w - f.cohort_week) // 7 AS INT) AS week_offset,
         count(*) AS active_users
  FROM active a JOIN first f ON a.u = f.u
  WHERE (a.w - f.cohort_week) // 7 BETWEEN 0 AND 8
  GROUP BY 1, 2
)
SELECT o.cohort_week, o.week_offset, CAST(o.active_users AS BIGINT) AS active_users,
       CAST(floor(o.active_users / s.cohort_users * 1000000 + 0.5) AS BIGINT) AS retention_ppm
FROM offs o JOIN sizes s ON o.cohort_week = s.cohort_week
ORDER BY o.cohort_week, o.week_offset
"""


QUERIES: dict = {
    "event_window_agg": (event_window_agg, EVENT_WINDOW_AGG_SQL),
    "event_funnel": (event_funnel, EVENT_FUNNEL_SQL),
    "event_cohort_retention": (event_cohort_retention, EVENT_COHORT_SQL),
    "grouped_scale_pandas": (grouped_scale_pandas, GROUPED_SCALE_SQL),
    "event_sliding_window": (event_sliding_window, EVENT_SLIDING_WINDOW_SQL),
    "event_sessions": (event_sessions, EVENT_SESSIONS_SQL),
    "event_json_props": (event_json_props, EVENT_JSON_PROPS_SQL),
    "pandas_udf_normalize": (pandas_udf_normalize, PANDAS_UDF_NORM_SQL),
    "pandas_udaf_quartiles": (pandas_udaf_quartiles, PANDAS_UDAF_SQL),
}
