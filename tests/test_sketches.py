"""Unit tests for ops/sketches.py — envelope semantics on planted data."""

from __future__ import annotations

import datetime as dt

import pytest
from incremental_datapipeline_using_snowflake_spark.ops.sketches import (
    approx_distinct_check,
    mergeable_daily_hll,
    quantile_check,
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    base = dt.datetime(2024, 1, 1)
    for day in range(4):
        for u in range(200):
            # group 'a': users 0..199 every day (200 distinct overall);
            # group 'b': disjoint users per day (800 distinct overall) —
            # exercises the day->group sketch merge across disjoint sets
            rows.append((base + dt.timedelta(days=day), "a", u, float(u)))
            rows.append((base + dt.timedelta(days=day), "b", day * 1000 + u, float(u)))
    return spark.createDataFrame(
        rows, "ts timestamp_ntz, grp string, user_id long, value double"
    )


def test_approx_distinct_within_envelope(planted):
    out = {r["grp"]: r for r in approx_distinct_check(planted, "grp", "user_id").collect()}
    assert out["a"]["exact_distinct"] == 200
    assert out["b"]["exact_distinct"] == 800
    assert out["a"]["approx_ok"] and out["b"]["approx_ok"]


def test_mergeable_daily_hll_counts_union_not_sum(planted):
    out = {r["grp"]: r for r in mergeable_daily_hll(planted, "ts", "grp", "user_id").collect()}
    # group 'a' repeats the same users daily: a merge that double-counted
    # days (sum instead of union) would estimate ~800, far outside 10% of 200
    assert out["a"]["exact_distinct"] == 200
    assert out["a"]["merged_ok"]
    assert out["b"]["exact_distinct"] == 800
    assert out["b"]["merged_ok"]


def test_quantile_envelope(planted):
    out = {r["grp"]: r for r in quantile_check(planted, "grp", "value").collect()}
    # values are 0..199 repeated: exact continuous median = 99.5
    assert out["a"]["exact_q"] == pytest.approx(99.5)
    assert out["a"]["approx_q_ok"]


def test_cms_estimate_dominates_exact_and_finds_hitters(spark):
    """CMS never undercounts (min-of-counters >= true count), the top
    hitter is ranked first, and with w=16 the planted vocabulary (>16
    tokens) forces real collisions — est > exact for at least one token."""
    from incremental_datapipeline_using_snowflake_spark.ops.sketches import cms_heavy_hitters

    text = " ".join(["hot"] * 50 + [f"w{i}" for i in range(30)] * 2)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = cms_heavy_hitters(df, top_k=5).collect()
    assert rows[0]["tok"] == "hot" and rows[0]["exact_cnt"] == 50
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
    assert all(r["bound_ok"] for r in rows)


def test_cms_grouped_matches_per_group_exact(spark):
    """Grouped CMS: per-group top-k and estimates match a per-group exact
    count on a small planted corpus; the overcount bound holds per group."""
    from incremental_datapipeline_using_snowflake_spark.ops import sketches as SK

    rows = []
    for g, words in [("a", "x x x y z"), ("a", "x y y"), ("b", "q q r")]:
        rows.append((g, words))
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        (r["lang"], r["rk"]): r
        for r in SK.cms_heavy_hitters_grouped(df, group_col="lang", top_k=2).collect()
    }
    assert got[("a", 1)]["tok"] == "x" and got[("a", 1)]["exact_cnt"] == 4
    assert got[("a", 2)]["tok"] == "y" and got[("a", 2)]["exact_cnt"] == 3
    assert got[("b", 1)]["tok"] == "q" and got[("b", 1)]["exact_cnt"] == 2
    for r in got.values():
        assert r["cms_est"] >= r["exact_cnt"]  # CMS never undercounts
        assert r["bound_ok"]


def test_hll_overlap_inclusion_exclusion(spark):
    """r06 (+r07 ADVICE fix): sketch-algebra overlap — planted sets with
    known intersections stay inside the envelope, and DISJOINT pairs are
    now reported with exact_overlap=0 (full pair coverage, not dropped by
    an inner join); a healthy sketch passes via the absolute error floor."""
    from incremental_datapipeline_using_snowflake_spark.ops.sketches import (
        hll_overlap_check,
    )

    rows = (
        [("a", i) for i in range(1000)]
        + [("b", i) for i in range(500, 1500)]  # |a ∩ b| = 500
        + [("c", i) for i in range(5000, 6000)]  # disjoint from both
    )
    df = spark.createDataFrame(rows, "seg string, uid long")
    out = {(r["type_a"], r["type_b"]): r for r in hll_overlap_check(df, "seg", "uid").collect()}
    assert len(out) == 3  # every pair a<b, including disjoint ones
    assert out[("a", "b")]["exact_overlap"] == 500
    assert out[("a", "b")]["overlap_ok"]
    for pair in [("a", "c"), ("b", "c")]:
        assert out[pair]["exact_overlap"] == 0
        assert out[pair]["overlap_ok"]  # small estimate within abs floor
