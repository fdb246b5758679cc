"""Round-6 TPC-H completion (q2/q8/q9/q11/q12/q13/q20/q21): full
Spark-vs-DuckDB tuple equality at sf0.001, plus plan-shape assertions for
the patterns each query exists to pin (correlated-min decorrelation, outer
join surviving the zero bucket, semi+anti against the same fact table)."""

from __future__ import annotations

import duckdb
import pytest

from incremental_datapipeline_using_snowflake_spark.queries import tpch22

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


@pytest.mark.parametrize("name", sorted(tpch22.QUERIES))
def test_matches_oracle_exactly(spark, sf_dir, oracle, name):
    fn, sql = tpch22.QUERIES[name]
    sdf = fn(spark, sf_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    orows = sorted(tuple(r) for r in oracle.execute(sql).fetchall())
    assert len(srows) == len(orows) > 0, name
    assert [c.lower() for c in sdf.columns] == [
        d[0].lower() for d in oracle.execute(sql).description
    ], name
    assert srows == orows, f"{name}: first diff {next((a, b) for a, b in zip(srows, orows) if a != b)}"


def test_q13_zero_bucket_survives(spark, sf_dir):
    """The LEFT OUTER + in-join-condition filter must keep customers with
    no qualifying orders: the distribution has a c_count=0 bucket iff any
    customer has only NOT-SPECIFIED (or zero) orders — and an INNER join
    rewrite would never produce it. Assert the total across buckets equals
    the customer count (every customer lands in exactly one bucket)."""
    import duckdb as _d

    dist = {r["c_count"]: r["custdist"]
            for r in tpch22.q13_customer_distribution(spark, sf_dir).collect()}
    n_cust = _d.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchone()[0]
    assert sum(dist.values()) == n_cust


def test_q21_plans_semi_and_anti(spark, sf_dir):
    """EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, both against the same
    fact table — no nested-loop re-scan shape."""
    plan = (
        tpch22.q21_waiting_suppliers(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q2_min_decorrelates_to_one_aggregate(spark, sf_dir):
    """The correlated per-part MIN must appear as ONE aggregate + a
    broadcast join back — not a per-part subquery."""
    plan = (
        tpch22.q2_min_cost_supplier(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
