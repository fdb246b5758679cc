"""Temporal join & time-series operators over event streams.

Operators the reference's warehouse lacks but any event/feature pipeline at
scale needs (the reference's only temporal op is the daily lag window,
``co2_analytical_sp/function.py:105-125``): as-of joins for point-in-time
feature lookup, interval (range) joins for window attribution, and rolling
event-time aggregates. All are built from one-shuffle DataFrame plans:

- **as-of join**: the classic union-tag rewrite — tag both sides, sort each
  key's rows by (ts, side) once, carry the latest right-side value forward
  with ``last(..., ignorenulls)``. ONE shuffle on the join key; never a
  per-row subquery, never a broadcast of either full side.
- **range join**: intervals are exploded into fixed-width time buckets and
  equi-joined against each point's single bucket — candidate pairs are
  bounded by interval_span/bucket_width per interval instead of |points|
  × |intervals| (the cross-join a naive inequality join degenerates to).
- **rolling aggregate**: a window with a RANGE frame over epoch seconds —
  map-side sortable, shuffles once on the partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _epoch_seconds(c: Column) -> Column:
    """Epoch seconds for TIMESTAMP or TIMESTAMP_NTZ order columns.

    NTZ casts straight to LTZ (wall-clock preserved — the engine pins the
    session to UTC, queries/util.py:load) and LTZ casts to double seconds;
    NTZ -> double directly is an illegal cast in Spark 4.
    """
    return c.cast("timestamp_ltz").cast("double").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (DuckDB/kdb ASOF JOIN
    semantics; ties at equal ts match).

    Union-tag plan: right rows sort before left rows at the same ts
    (``_side`` 0 < 1), and ``last(v, ignorenulls=True)`` over
    (key ORDER BY ts, _side) carries the most recent right value onto each
    left row. One hash-partition shuffle on ``key``; both sides stream
    through it — nothing is broadcast, so either side may be huge.
    """
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast("timestamp_ntz").alias("_r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(f"_r_{v}") for v in value_cols],
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (key, ts_col) else F.lit(None).cast(t).alias(c)
            for c, t in ((f.name, f.dataType.simpleString()) for f in left.schema.fields)
        ],
        F.lit(0).alias("_side"),
        F.col(ts_col).cast("timestamp_ntz").alias("_r_ts"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
    )
    w = (
        W.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *lcols,
        "_side",
        F.last("_r_ts", ignorenulls=True).over(w).alias(right_ts_alias),
        *[
            F.last(f"_r_{v}", ignorenulls=True).over(w).alias(v)
            for v in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Pairs (point, interval) with ``start <= point_ts < end`` via
    fixed-width time-bucket blocking.

    Each interval explodes into ``span/bucket_seconds`` bucket rows (2-3
    for typical short intervals); each point computes its single bucket.
    The equi-join on the bucket id is an ordinary hash join — shuffled or
    broadcast by AQE depending on which side is small — and the exact
    range predicate filters within the bucket-matched candidates. Work is
    O(|points| + |intervals| × span/bucket) instead of the naive
    |points| × |intervals| inequality cross-join.
    """
    s = _epoch_seconds(F.col(start_col))
    e = _epoch_seconds(F.col(end_col))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(s / bucket_seconds),
                # end is exclusive: a point at exactly `end` is not matched,
                # so the last candidate bucket is the one containing end-1s
                F.floor((e - 1) / bucket_seconds),
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", F.floor(_epoch_seconds(F.col(point_ts)) / bucket_seconds)
    )
    joined = pt.join(iv, on="_bucket", how="inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bucket")


def rolling_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_seconds: int,
    agg_cols: dict[str, Column],
) -> DataFrame:
    """Per key and row: aggregates over the trailing ``window_seconds``
    (inclusive of the current row) in event time.

    RANGE frame over epoch seconds — one shuffle on ``key``, per-partition
    sort, no self-join (the rolling-window self-join rewrite is quadratic
    in the window's row count). ``agg_cols`` maps output name -> BARE
    aggregate Column (no ``.over``, no post-aggregate ``.cast`` — Spark
    can only attach the frame to the outermost expression; cast in a
    select after this call).
    """
    w = (
        W.partitionBy(key)
        .orderBy(_epoch_seconds(F.col(ts_col)).alias("_ts_s"))
        .rangeBetween(-window_seconds, 0)
    )
    return df.select(
        *df.columns, *[c.over(w).alias(name) for name, c in agg_cols.items()]
    )


def calendar_gapfill(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str] | None = None,
    agg_exprs: list[Column] | None = None,
    fill: dict | None = None,
) -> DataFrame:
    """Resample an event stream to a dense daily calendar: one row per day
    in [min(ts), max(ts)] per group, gaps zero/NULL-filled.

    The standard time-series preparation step (gap-free inputs for lag/
    rolling windows — a lag over a sparse series silently compares
    non-adjacent days). Plan shape: the observed bounds come from one tiny
    aggregate (scalar-cache pattern A2, inlined as literals), the calendar
    is ``sequence()`` exploded from a 1-row relation — |days| rows total,
    NOT |groups|x|days| until the left join — and the join is
    calendar-left-join-aggregates keyed on (group, day). The daily
    aggregate shuffles once; the calendar side is literal-bounded and
    broadcast by AQE.

    ``fill`` maps output column -> fill value for empty days (default 0
    for counts; pass None to keep NULL).
    """
    group_cols = group_cols or []
    agg_exprs = agg_exprs or [F.count(F.lit(1)).alias("n_events")]
    day = F.col(ts_col).cast("date").alias("day")
    daily = df.groupBy(*(group_cols + [day])).agg(*agg_exprs)

    bounds = df.agg(
        F.min(F.col(ts_col).cast("date")).alias("lo"),
        F.max(F.col(ts_col).cast("date")).alias("hi"),
    ).first()
    spark = df.sparkSession
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(bounds["lo"]).cast("date"),
                F.lit(bounds["hi"]).cast("date"),
                F.expr("INTERVAL '1' DAY"),
            )
        ).alias("day")
    )
    if group_cols:
        groups = df.select(*group_cols).distinct()
        cal = cal.crossJoin(groups)  # dense frame: |days| x |groups| keys
    out = cal.join(daily, ["day"] + group_cols, "left")
    for col, v in (fill or {"n_events": 0}).items():
        if v is not None and col in out.columns:
            out = out.withColumn(col, F.coalesce(F.col(col), F.lit(v)))
    return out


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each step can
    be reached GIVEN the previous step happened strictly before it — the
    classic product-analytics sequence query (view → click → purchase).

    Plan: step 1 is a plain min-aggregate; each later step k is ONE
    user-keyed join of the step-k events against the step-(k-1) reach
    times followed by a conditional min — k-1 joins total, each shuffling
    only (user, ts) pairs for a single event type, with map-side partial
    mins. No per-user event arrays are ever materialized (the
    collect_list-and-fold alternative breaks on power-law users: one hot
    user's history must fit in one task).

    Returns ``user_col, t_1..t_N`` (timestamp per step, NULL where the
    funnel stalled).
    """
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("t"),
    )
    reach = (
        base.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            base.filter(F.col("et") == step)
            .join(reach.select("u", F.col(f"t_{k - 1}").alias("_prev")), "u")
            .filter(F.col("t") > F.col("_prev"))
            .groupBy("u")
            .agg(F.min("t").alias(f"t_{k}"))
        )
        reach = reach.join(nxt, "u", "left")
    return reach.withColumnRenamed("u", user_col)


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel rollup: users reaching each step (in order) + conversion
    from the previous step as parts-per-million (``floor(r·1e6 + 0.5)`` —
    the int-grid idiom; a rounded raw double would be engine-fragile).

    Output: ``step_idx, step, users, conv_ppm`` (conv_ppm NULL for step 1).
    """
    reach = funnel_steps(events, steps, user_col, type_col, ts_col)
    counts = reach.agg(
        *[
            F.count(F.col(f"t_{k}")).alias(f"c_{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for k, step in enumerate(steps, start=1):
        conv = (
            F.lit(None).cast("long")
            if k == 1
            else F.floor(
                F.col(f"c_{k}") / F.col(f"c_{k - 1}") * 1e6 + F.lit(0.5)
            ).cast("long")
        )
        one = counts.select(
            F.lit(k).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"c_{k}").alias("users"),
            conv.alias("conv_ppm"),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


def cohort_retention(
    events: DataFrame,
    max_weeks: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event; retention at offset k = fraction of the cohort active in
    cohort_week + k weeks.

    Plan: first-seen week is one user-keyed min-aggregate; activity is a
    distinct (user, week) projection; one join back on the user key, then
    a (cohort, offset)-keyed count — every exchange carries ids and week
    ints only. Ratios are parts-per-million ints (engine-portable).

    Output: ``cohort_week, week_offset, active_users, retention_ppm``.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    first = (
        events.select(F.col(user_col).alias("u"), wk.alias("w"))
        .groupBy("u")
        .agg(F.min("w").alias("cohort_week"))
    )
    active = events.select(
        F.col(user_col).alias("u"), wk.alias("w")
    ).distinct()
    sizes = first.groupBy("cohort_week").agg(F.count("u").alias("cohort_users"))
    offs = (
        active.join(first, "u")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7).cast("int"),
        )
        .filter((F.col("week_offset") >= 0) & (F.col("week_offset") <= max_weeks))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("u").alias("active_users"))
    )
    return offs.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        F.floor(
            F.col("active_users") / F.col("cohort_users") * 1e6 + F.lit(0.5)
        )
        .cast("long")
        .alias("retention_ppm"),
    )
