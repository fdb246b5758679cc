"""Scalar computation kernels.

The reference deploys four warehouse UDFs (SURVEY.md §2.8); here each is a
**native Column expression** (JVM-side, whole-stage-codegen friendly — UDFs are
the slow path) plus an optional SQL-callable registration for API parity.

Exact NULL/zero edge semantics (the likeliest oracle-mismatch sites):

- ``pct_change(prev, curr)`` -> ``(curr-prev)/prev*100``; any NULL input, an
  uncastable input, or ``prev == 0`` yields ``0.0`` (NOT NULL).
  Reference: ``udfs_and_spoc/daily_co2_changes/daily_changes/function.py:2-24``
  and ``weekly_co2_changes/weekly_changes/function.py:1-23`` (identical math).
- ``volatility(curr, prev)`` -> ``round(abs(c-p)/((c+p)/2)*100, 4)``; NULL or
  non-positive input on either side yields NULL.
  Reference: ``udfs_and_spoc/python_udf/co2_volatility/function.py:10-50``.
- ``normalize_value(x, mn, mx)`` -> ``round((x-mn)/(mx-mn), 3)``; degenerate
  range (``mx == mn``) yields ``0.5``; NULL x propagates NULL.
  Reference: ``udfs_and_spoc/normalize_co2.sql:1-13``.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pct_change(prev: Column | str, curr: Column | str) -> Column:
    """Percent change from ``prev`` to ``curr``; defensive edges -> 0.0."""
    p, c = _col(prev).cast("double"), _col(curr).cast("double")
    return (
        F.when(p.isNull() | c.isNull() | (p == F.lit(0.0)), F.lit(0.0))
        .otherwise((c - p) / p * F.lit(100.0))
        .cast("double")
    )


def volatility(curr: Column | str, prev: Column | str) -> Column:
    """Symmetric relative-difference volatility; invalid input -> NULL."""
    c, p = _col(curr).cast("double"), _col(prev).cast("double")
    invalid = c.isNull() | p.isNull() | (c <= F.lit(0.0)) | (p <= F.lit(0.0))
    return (
        F.when(invalid, F.lit(None).cast("double"))
        .otherwise(F.round(F.abs(c - p) / ((c + p) / F.lit(2.0)) * F.lit(100.0), 4))
        .cast("double")
    )


def normalize_value(x: Column | str, mn: Column | str, mx: Column | str) -> Column:
    """Min-max normalization rounded to 3 dp; degenerate range -> 0.5."""
    xx, lo, hi = _col(x).cast("double"), _col(mn).cast("double"), _col(mx).cast("double")
    return (
        F.when(hi == lo, F.lit(0.5))
        .otherwise(F.round((xx - lo) / (hi - lo), 3))
        .cast("double")
    )


# ---------------------------------------------------------------------------
# SQL-callable surface parity.
#
# The reference registers these as warehouse functions callable by name from
# SQL (``ANALYTICS_CO2.CO2_DAILY_PERCENT_CHANGE`` etc.). We mirror that with
# native SQL scalar functions (Catalyst-inlined) — used for the SQL-name
# surface; the pipeline hot path uses the Column expressions above.
# ---------------------------------------------------------------------------


def register_all_udfs(spark: SparkSession) -> None:
    """Register the reference's four UDF names as SQL-callable functions.

    Mirrors (reference names, SURVEY.md §2.8):
    - ``CO2_DAILY_PERCENT_CHANGE(prev, curr)``
    - ``CO2_WEEKLY_PERCENT_CHANGE(prev, curr)``  (same math; deployed twin)
    - ``CALCULATE_CO2_VOLATILITY(curr, prev)``
    - ``NORMALIZE_CO2_UDF(x, min, max)``

    Registered as SQL scalar functions (``CREATE FUNCTION ... RETURN
    expr``), so the name surface stays fully native: Catalyst inlines the
    body into the calling plan — no Python worker, no BatchEvalPython
    stage — with the reference UDFs' NULL/zero edge semantics (pinned by
    the goldens in tests/test_kernels.py against the native Column
    kernels; note SQL ``round`` is HALF_UP where Python's is HALF_EVEN,
    so the SQL form is the canonical one).
    """
    for name in ("CO2_DAILY_PERCENT_CHANGE", "CO2_WEEKLY_PERCENT_CHANGE"):
        spark.sql(
            f"""CREATE OR REPLACE TEMPORARY FUNCTION {name}(prev DOUBLE, curr DOUBLE)
RETURNS DOUBLE
RETURN CASE WHEN prev IS NULL OR curr IS NULL OR prev = 0.0D THEN 0.0D
            ELSE (curr - prev) / prev * 100.0D END"""
        )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION CALCULATE_CO2_VOLATILITY(curr DOUBLE, prev DOUBLE)
RETURNS DOUBLE
RETURN CASE WHEN curr IS NULL OR prev IS NULL OR curr <= 0.0D OR prev <= 0.0D THEN NULL
            ELSE round(abs(curr - prev) / ((curr + prev) / 2.0D) * 100.0D, 4) END"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION NORMALIZE_CO2_UDF(x DOUBLE, mn DOUBLE, mx DOUBLE)
RETURNS DOUBLE
RETURN CASE WHEN mn IS NULL OR mx IS NULL THEN NULL
            WHEN mx = mn THEN 0.5D
            WHEN x IS NULL THEN NULL
            ELSE round((x - mn) / (mx - mn), 3) END"""
    )
