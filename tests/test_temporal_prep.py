"""Unit tests for ops/temporal.py and ops/textprep.py — edge semantics the
sf0.01 oracle queries don't pin down (ties, empty matches, boundary
inclusivity, straddling docs), plus plan-shape assertions for scale."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from incremental_datapipeline_using_snowflake_spark.ops.temporal import (
    asof_join,
    range_join_buckets,
    rolling_agg,
)
from incremental_datapipeline_using_snowflake_spark.ops.textprep import (
    chunk_documents,
    pack_sequences,
    redact_pii,
    tfidf_top_terms,
)


def ts(s: str):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00")),  # after r@09:00 -> 1.0
            (2, 10, ts("2024-01-01 12:00:00")),  # tie with r@12:00 -> 2.0
            (3, 10, ts("2024-01-01 08:00:00")),  # before any right -> NULL
            (4, 20, ts("2024-01-01 10:00:00")),  # user with no right rows
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01 09:00:00"), 1.0),
            (10, ts("2024-01-01 12:00:00"), 2.0),
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    return left, right


def test_asof_join_tie_and_missing(tiny):
    left, right = tiny
    out = {
        r["event_id"]: (r["value"], r["matched_ts"])
        for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()
    }
    assert out[1] == (1.0, ts("2024-01-01 09:00:00"))
    assert out[2] == (2.0, ts("2024-01-01 12:00:00"))  # equal ts matches
    assert out[3] == (None, None)  # nothing preceding
    assert out[4] == (None, None)  # key absent from right
    assert len(out) == 4  # right rows never leak into the output


def test_asof_join_plan_has_no_join_or_broadcast(tiny):
    left, right = tiny
    plan = (
        asof_join(left, right, "user_id", "ts", ["value"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union-tag rewrite: one shuffle on the key, no join operator at all —
    # the shape that scales with both sides huge
    assert "Join" not in plan
    assert "Broadcast" not in plan


def test_range_join_boundary_inclusivity(spark):
    iv = spark.createDataFrame(
        [(0, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))],
        "interval_id int, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    pts = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:59:59")),  # before -> out
            (2, ts("2024-01-01 10:00:00")),  # start inclusive -> in
            (3, ts("2024-01-01 11:59:59")),  # in (different bucket than start)
            (4, ts("2024-01-01 12:00:00")),  # end exclusive -> out
        ],
        "event_id int, ts timestamp_ntz",
    )
    got = sorted(
        r["event_id"]
        for r in range_join_buckets(pts, iv, "ts", "w_start", "w_end").collect()
    )
    assert got == [2, 3]


def test_rolling_agg_window_edges(spark):
    df = spark.createDataFrame(
        [
            (1, 5, ts("2024-01-01 10:00:00"), 1.0),
            (2, 5, ts("2024-01-01 10:30:00"), 2.0),
            (3, 5, ts("2024-01-01 11:00:00"), 4.0),  # 10:00 is 3600s back -> included
            (4, 5, ts("2024-01-01 12:30:00"), 8.0),  # everything else aged out
        ],
        "event_id int, user_id int, ts timestamp_ntz, value double",
    )
    out = {
        r["event_id"]: r["n"]
        for r in rolling_agg(
            df, "user_id", "ts", 3600, {"n": F.count(F.lit(1))}
        ).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3, 4: 1}


def test_chunking_overlap_and_short_doc(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(90))), (2, "a b c")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=50, stride=40).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_tokens"]))
    # 90 tokens, stride 40 -> starts 0, 40, 80 -> sizes 50, 50, 10
    assert sorted(by_doc[1]) == [(0, 50), (1, 50), (2, 10)]
    # short doc -> one chunk of its full length
    assert by_doc[2] == [(0, 3)]


def test_packing_fills_budget_per_shard(spark):
    # 6 docs x 100 tokens in one shard (ids all ≡ 0 mod 8): budget 250 ->
    # tokens_before = 0,100,200,300,400,500 -> bins 0,0,0,1,1,2
    docs = spark.createDataFrame(
        [(i * 8, " ".join("t" * 1 for _ in range(100))) for i in range(6)],
        "doc_id long, text string",
    )
    out = sorted(
        (r["id"], r["bin"]) for r in pack_sequences(docs, budget_tokens=250).collect()
    )
    assert [b for _, b in out] == [0, 0, 0, 1, 1, 2]


def test_redact_pii_counts(spark):
    docs = spark.createDataFrame(
        [(1, "mail a@b.co and c.d+x@e.org call +1-555-0100200 end")],
        "doc_id long, text string",
    )
    r = redact_pii(docs).collect()[0]
    assert r["n_emails"] == 2
    assert r["n_phones"] == 1


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (0, "common common zebra"),
            (1, "common yak"),
            (2, "common xylo"),
        ],
        "doc_id long, text string",
    )
    top = {
        r["id"]: r["term"]
        for r in tfidf_top_terms(docs, top_k=1).collect()
    }
    # 'common' appears in every doc (idf = ln(4/4) = 0); the rare term wins
    assert top == {0: "zebra", 1: "yak", 2: "xylo"}


def test_calendar_gapfill_fills_missing_days(spark):
    from incremental_datapipeline_using_snowflake_spark.ops.temporal import (
        calendar_gapfill,
    )

    rows = [
        ("2024-03-01 10:00:00", "a", 1.0),
        ("2024-03-01 11:00:00", "a", 2.0),
        ("2024-03-04 09:00:00", "a", 5.0),   # 2 missing days before this
        ("2024-03-02 09:00:00", "b", 7.0),   # b missing on 01, 03, 04
    ]
    df = spark.createDataFrame(rows, "ts_s string, event_type string, value double").select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    )
    out = calendar_gapfill(
        df, "ts", group_cols=["event_type"],
        agg_exprs=[F.count(F.lit(1)).alias("n_events")], fill={"n_events": 0},
    ).collect()
    got = {(str(r["day"]), r["event_type"]): r["n_events"] for r in out}
    assert len(got) == 4 * 2                       # dense: 4 days x 2 types
    assert got[("2024-03-01", "a")] == 2
    assert got[("2024-03-02", "a")] == 0           # gap filled with 0
    assert got[("2024-03-03", "b")] == 0
    assert got[("2024-03-04", "a")] == 1


def test_cogrouped_asof_matches_column_asof(spark):
    """The cogrouped-map (pd.merge_asof) as-of join must agree row-for-row
    with the union-tag Column-expression form, including ties at equal ts
    and keys with no right-side rows."""
    from pyspark.sql import functions as F

    from incremental_datapipeline_using_snowflake_spark.ops.arrowops import asof_join_cogrouped
    from incremental_datapipeline_using_snowflake_spark.ops.temporal import asof_join

    left = spark.createDataFrame(
        [(i, (i * 31) % 5, 100 + (i * 7) % 50) for i in range(60)],
        "row_id long, k long, t long",
    ).select("row_id", "k", F.timestamp_seconds("t").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        # key 4 has no right rows; key 0 has a tie at t=110
        [(k, t, k * 1000 + t) for k in range(4) for t in (100, 110, 125)],
        "k long, t long, v long",
    ).select("k", F.timestamp_seconds("t").cast("timestamp_ntz").alias("ts"), "v")

    a = {r["row_id"]: (r["matched_ts"], r["v"])
         for r in asof_join(left, right, "k", "ts", ["v"]).collect()}
    b = {r["row_id"]: (r["matched_ts"], r["v"])
         for r in asof_join_cogrouped(left, right, "k", "ts", ["v"]).collect()}
    assert a == b and len(a) == 60


def test_funnel_order_semantics(spark):
    """r06: funnel steps require STRICTLY increasing timestamps — a user
    who purchases before clicking does not convert; a straight-through
    user reaches every step."""
    from incremental_datapipeline_using_snowflake_spark.ops.temporal import (
        funnel_conversion,
        funnel_steps,
    )

    rows = [
        # user 1: view -> click -> purchase (converts fully)
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # user 2: purchase precedes the click, so step 3 never completes
        (2, "view", "2024-01-01 09:00:00"),
        (2, "purchase", "2024-01-01 09:30:00"),
        (2, "click", "2024-01-01 10:00:00"),
        # user 3: never views -> not even in the funnel
        (3, "click", "2024-01-01 08:00:00"),
        (3, "purchase", "2024-01-01 08:30:00"),
    ]
    ev = (
        spark.createDataFrame(rows, "user_id long, event_type string, ts_s string")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    steps = ["view", "click", "purchase"]
    reach = {r["user_id"]: r for r in funnel_steps(ev, steps).collect()}
    assert reach[1]["t_3"] is not None
    assert reach[2]["t_2"] is not None and reach[2]["t_3"] is None
    assert 3 not in reach
    conv = {r["step_idx"]: r for r in funnel_conversion(ev, steps).collect()}
    assert [conv[k]["users"] for k in (1, 2, 3)] == [2, 2, 1]
    assert conv[1]["conv_ppm"] is None
    assert conv[2]["conv_ppm"] == 1_000_000  # 2/2
    assert conv[3]["conv_ppm"] == 500_000  # 1/2


def test_cohort_retention_weekly(spark):
    """r06: cohorts key on the first-seen ISO week; retention counts a
    user at most once per week offset."""
    from incremental_datapipeline_using_snowflake_spark.ops.temporal import (
        cohort_retention,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # Monday, week W0
        (1, "2024-01-08 10:00:00"),  # W0+1
        (1, "2024-01-08 11:00:00"),  # same week, counted once
        (2, "2024-01-01 12:00:00"),  # W0 only
        (3, "2024-01-10 10:00:00"),  # cohort W1
    ]
    ev = (
        spark.createDataFrame(rows, "user_id long, ts_s string")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in cohort_retention(ev).collect()
    }
    w0 = ("2024-01-01", 0)
    assert out[w0]["active_users"] == 2 and out[w0]["retention_ppm"] == 1_000_000
    w01 = ("2024-01-01", 1)
    assert out[w01]["active_users"] == 1 and out[w01]["retention_ppm"] == 500_000
    w1 = ("2024-01-08", 0)
    assert out[w1]["active_users"] == 1 and out[w1]["retention_ppm"] == 1_000_000
