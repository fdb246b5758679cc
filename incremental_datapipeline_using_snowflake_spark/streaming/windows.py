"""Event-time window operators — the streaming-analytics extension surface.

The reference has no event-time windows (SURVEY.md §2.7: "No event-time
windows ... exist in the reference"); these are the Spark-native extensions a
large-scale event pipeline needs. Every operator here is expressed with
built-in functions so it runs identically over a batch DataFrame (for the
DuckDB oracle) and a streaming DataFrame (with ``with_watermark`` wired in):

- tumbling / sliding windows: ``F.window`` — map-side partial aggregation,
  shuffle keyed on (window, keys); window assignment is a scalar expression,
  so no blow-up beyond the slide factor.
- session windows (gap-based): for BATCH we use the classic gaps-and-islands
  rewrite (lag + cumulative sum) because it is oracle-checkable in ANSI SQL;
  for STREAMING, ``F.session_window`` with a watermark is the idiomatic form
  (state-store backed, merges adjacent gaps across micro-batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound for streaming aggregation state eviction. No-op
    semantics on batch DataFrames (Spark ignores watermarks in batch)."""
    return df.withWatermark(ts_col, delay)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    agg_exprs: list[Column],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width event-time buckets. Emits ``window_start``/``window_end``
    as plain timestamps (stable column names for the oracle compare)."""
    win = F.window(F.col(ts_col), duration)
    keys = [win] + [F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(*agg_exprs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    agg_exprs: list[Column],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    win = F.window(F.col(ts_col), duration, slide)
    keys = [win] + [F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(*agg_exprs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sessionize_batch(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Gap-based sessions via gaps-and-islands (batch/oracle form).

    Per user: order by ts, a new session starts where the gap from the
    previous event exceeds ``gap_seconds``; the session id is the cumulative
    count of session starts. Partitioned window — shuffles once on user_col,
    no global sort (scales with the number of users, not events).
    """
    w = W.partitionBy(user_col).orderBy(ts_col)
    ts = F.col(ts_col)
    prev = F.lag(ts, 1).over(w)
    # Interval comparison, not epoch arithmetic: works identically for
    # TIMESTAMP, TIMESTAMP_NTZ (the testdata's type), and is independent of
    # the session timezone — `ts - prev` is a day-time interval.
    gap = F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND")
    is_new = F.when(prev.isNull() | ((ts - prev) > gap), 1).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id",
        F.sum("_new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).drop("_new_session")


def session_stats_batch(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_seconds: int,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: bounds, event count, optional value sum."""
    sess = sessionize_batch(df, ts_col, user_col, gap_seconds)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(30,8)")).cast("double").alias("sum_value")
        )
    return sess.groupBy(user_col, "session_id").agg(*aggs)


def session_window_streaming(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str,
    agg_exprs: list[Column],
) -> DataFrame:
    """Streaming-native session windows (``F.session_window`` + state store).
    Caller must have applied :func:`with_watermark` first. Also valid on
    batch frames — used to cross-check the gaps-and-islands rewrite."""
    out = df.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col)).agg(
        *agg_exprs
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def watermarked_dedup(
    df: DataFrame, key_cols: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Cross-micro-batch dedup with BOUNDED state.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps each key in the
    state store only until the watermark passes it — the at-scale form of
    streaming dedup (plain ``dropDuplicates`` on a stream retains every
    key ever seen and OOMs a long-running job; within-watermark state is
    evicted). A duplicate arriving within ``delay`` of the first sighting
    is dropped; one arriving after the horizon is treated as new — the
    documented trade of bounded state.

    Batch frames take the exact-semantics path (``dropDuplicates``), so
    the operator is oracle-checkable and batch/stream twins share a call
    site.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag_seconds: int,
    watermark: str,
) -> DataFrame:
    """Stream-stream inner equi-join bounded by an event-time interval:
    a right-side event joins a left-side event with the same ``key`` when
    ``right_ts`` falls in ``[left_ts - max_lag_seconds, left_ts]``.

    Both sides are watermarked — mandatory for stream-stream joins, since
    the interval bound plus the watermark is what lets Spark evict join
    state (without it both sides buffer forever). State is keyed on the
    join key; shuffle is one exchange per side on ``key``. Valid on batch
    frames too (watermarks no-op), which is how the test cross-checks the
    streaming result against the batch twin.
    """
    lcols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
        if c != key
    ]
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {int(max_lag_seconds)} SECONDS"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond).select(*lcols, *rcols)
