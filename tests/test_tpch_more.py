"""Round-5 TPC-H-shape analogues: full Spark-vs-DuckDB tuple equality at
sf0.001 (the same comparison the driver's oracle gate runs at sf0.01),
plus plan-shape assertions for the decorrelation patterns they pin."""

from __future__ import annotations

import duckdb
import pytest

from incremental_datapipeline_using_snowflake_spark.queries import tpch_more

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch_more.QUERIES))
def test_matches_oracle_exactly(spark, sf_dir, oracle, name):
    fn, sql = tpch_more.QUERIES[name]
    sdf = fn(spark, sf_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    orows = sorted(tuple(r) for r in oracle.execute(sql).fetchall())
    assert len(srows) == len(orows) > 0, name
    assert [c.lower() for c in sdf.columns] == [
        d[0].lower() for d in oracle.execute(sql).description
    ], name
    assert srows == orows, f"{name}: first diff {next((a, b) for a, b in zip(srows, orows) if a != b)}"


def test_q4_plans_semi_join(spark, sf_dir):
    """The correlated EXISTS must decorrelate to ONE semi join — no
    per-row subquery re-execution shape in the plan."""
    plan = (
        tpch_more.q4_order_priority(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


def test_q17_per_part_average_broadcasts(spark, sf_dir):
    """The decorrelated per-part average (2k rows) must reach the fact scan
    as a broadcast, not a fact-sized shuffle."""
    plan = (
        tpch_more.q17_small_quantity(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_q18_hot_set_broadcasts(spark, sf_dir):
    """The HAVING-filtered big-order key set joins back by broadcast: the
    orders table is scanned once and never shuffled against lineitem."""
    plan = (
        tpch_more.q18_large_orders(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
