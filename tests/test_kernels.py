"""Golden UDF cases transferred 1:1 from the reference tests (FIXTURES.md §2;
reference tests/test_daily_co2_changes.py, test_weekly_co2_changes.py,
test_volatility_co2ppm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_datapipeline_using_snowflake_spark.functions import (
    normalize_value,
    pct_change,
    register_all_udfs,
    volatility,
)


def _eval(spark, col, a, b, extra=None):
    row = [(a, b) if extra is None else (a, b, extra)]
    schema = "a double, b double" if extra is None else "a double, b double, c double"
    return spark.createDataFrame(row, schema=schema).select(col.alias("r")).first()["r"]


PCT_CASES = [
    (100.0, 110.0, 10.0),
    (110.0, 100.0, -9.090909090909092),
    (418.5, 420.23, 0.413858),
    (None, 100.0, 0.0),
    (100.0, None, 0.0),
    (0.0, 100.0, 0.0),
    (100.0, 0.0, -100.0),
    (1.0, 101.0, 10000.0),  # weekly-variant large-change case
]


@pytest.mark.parametrize("prev,curr,expected", PCT_CASES)
def test_pct_change(spark, prev, curr, expected):
    got = _eval(spark, pct_change(F.col("a"), F.col("b")), prev, curr)
    assert got == pytest.approx(expected, abs=0.002)


VOL_CASES = [
    (410.0, 400.0, 2.4691),
    (400.0, 410.0, 2.4691),  # symmetric
    (350.0, 350.0, 0.0),
    (410.5, 405.2, 1.2983),
    (500.0, 300.0, 50.0),
    (0.0, 400.0, None),
    (400.0, 0.0, None),
    (-5.0, 400.0, None),
    (None, 400.0, None),
    (400.0, None, None),
]


@pytest.mark.parametrize("curr,prev,expected", VOL_CASES)
def test_volatility(spark, curr, prev, expected):
    got = _eval(spark, volatility(F.col("a"), F.col("b")), curr, prev)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected, abs=0.002)


NORM_CASES = [
    (415.0, 400.0, 430.0, 0.5),
    (400.0, 400.0, 430.0, 0.0),
    (430.0, 400.0, 430.0, 1.0),
    (410.0, 400.0, 430.0, 0.333),  # ROUND to 3 dp
    (123.0, 400.0, 400.0, 0.5),    # degenerate range
]


@pytest.mark.parametrize("x,mn,mx,expected", NORM_CASES)
def test_normalize(spark, x, mn, mx, expected):
    got = _eval(spark, normalize_value(F.col("a"), F.col("b"), F.col("c")), x, mn, extra=mx)
    assert got == pytest.approx(expected, abs=1e-9)


def test_sql_registered_udfs(spark):
    """Reference registers these as SQL-callable names (SURVEY.md §2.8)."""
    register_all_udfs(spark)
    row = spark.sql(
        "SELECT CO2_DAILY_PERCENT_CHANGE(100.0, 110.0) AS a,"
        "       CO2_WEEKLY_PERCENT_CHANGE(1.0, 101.0) AS b,"
        "       CALCULATE_CO2_VOLATILITY(410.0, 400.0) AS c,"
        "       NORMALIZE_CO2_UDF(410.0, 400.0, 430.0) AS d,"
        "       CO2_DAILY_PERCENT_CHANGE('100', '110') AS e"  # string coercion
    ).first()
    assert row["a"] == pytest.approx(10.0)
    assert row["b"] == pytest.approx(10000.0)
    assert row["c"] == pytest.approx(2.4691, abs=0.002)
    assert row["d"] == pytest.approx(0.333)
    assert row["e"] == pytest.approx(10.0)


def test_sql_udf_uncastable_returns_zero(spark):
    register_all_udfs(spark)
    row = spark.sql("SELECT CO2_DAILY_PERCENT_CHANGE('abc', '100') AS r").first()
    assert row["r"] == 0.0


def test_split_sql_statements():
    from incremental_datapipeline_using_snowflake_spark.functions import split_sql_statements

    script = """
    -- a comment; with a semicolon
    CREATE TEMPORARY VIEW _s1 AS SELECT 'a;b' AS v;
    /* block; comment */
    SELECT v, 'it''s;fine' AS w FROM _s1;
    SELECT 1
    """
    stmts = split_sql_statements(script)
    assert len(stmts) == 3
    assert "'a;b'" in stmts[0]
    assert "'it''s;fine'" in stmts[1]
    assert stmts[2] == "SELECT 1"


def test_run_sql_script(spark, tmp_path):
    from incremental_datapipeline_using_snowflake_spark.functions import (
        run_sql_directory,
        run_sql_file,
        run_sql_script,
    )

    out = run_sql_script(
        spark,
        """
        CREATE OR REPLACE TEMPORARY VIEW _script_v AS
        SELECT id, id * 2 AS dbl FROM range(5);
        SELECT sum(dbl) AS s FROM _script_v;
        """,
    )
    assert out.first()["s"] == 20

    f = tmp_path / "01_setup.sql"
    f.write_text("SELECT count(*) AS n FROM _script_v;")
    assert run_sql_file(spark, str(f)).first()["n"] == 5
    assert run_sql_directory(spark, str(tmp_path)) == 1
