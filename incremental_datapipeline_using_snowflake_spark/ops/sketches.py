"""Approximate sketches: HLL cardinality and quantile estimation.

At 100 TB exact COUNT(DISTINCT) and exact percentiles are shuffle-bound
(every distinct value must meet its duplicates); sketches replace them with
mergeable fixed-size state — the standard pre-aggregation pattern:

- **HLL**: ``hll_sketch_agg`` (Apache DataSketches, Spark 3.5+) builds a
  per-group binary sketch; ``hll_union_agg`` merges sketches across groups
  (days -> month, partitions -> global) WITHOUT re-reading raw data. The
  rollup never touches raw rows twice — the shape that scales.
- **quantiles**: ``percentile_approx`` (GK sketch) with a documented
  accuracy parameter.

Correctness gating: sketch estimates are engine-specific (DuckDB's
approx_count_distinct uses a different HLL seed), so equality-hashing the
estimate is meaningless. Instead each query emits the EXACT value (both
engines agree) plus a boolean ``*_ok`` that the estimate landed inside its
documented error envelope — the oracle emits the same exact value and a
constant TRUE, so a sketch drifting out of tolerance fails the hash gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rel_tol: float = 0.1,
) -> DataFrame:
    """Per group: exact distinct count + whether the HLL estimate is within
    ``rel_tol`` of it. Spark's default rsd is 5%, so a 10% envelope gives
    ~2 sigma headroom — a real sketch regression still trips it."""
    exact = F.count_distinct(F.col(value_col))
    approx = F.approx_count_distinct(F.col(value_col))
    return (
        df.groupBy(group_col)
        .agg(
            exact.alias("exact_distinct"),
            approx.alias("_approx"),
        )
        .select(
            group_col,
            "exact_distinct",
            (
                F.abs(F.col("_approx") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * rel_tol
            ).alias("approx_ok"),
        )
    )


def mergeable_daily_hll(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    value_col: str,
    rel_tol: float = 0.1,
) -> DataFrame:
    """The two-level mergeable-sketch rollup: day-level HLL sketches built
    once from raw data, then merged per group with ``hll_union_agg`` —
    raw rows are scanned exactly once, the second aggregation moves only
    kilobyte sketches. Emits per-group exact distinct + in-envelope flag
    for the merged estimate.

    This is the at-scale replacement for A1/A2-style global distincts: at
    100 TB the day->group merge shuffles |days|×|groups| sketch blobs
    instead of re-shuffling every raw value.
    """
    daily = df.groupBy(F.col(ts_col).cast("date").alias("_d"), group_col).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string")).alias("_sk")
    )
    merged = daily.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).alias("exact_distinct")
    )
    return (
        merged.join(exact, group_col)
        .select(
            group_col,
            "exact_distinct",
            (
                F.abs(F.col("_est") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * rel_tol
            ).alias("merged_ok"),
        )
    )


def quantile_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    lo: float = 0.45,
    hi: float = 0.55,
    round_dp: int = 6,
) -> DataFrame:
    """Per group: the exact continuous quantile at ``q`` (cross-engine
    comparable) + whether ``percentile_approx`` lands between the exact
    ``lo``/``hi`` quantiles — a rank-error envelope, the guarantee the GK
    sketch actually makes (rank accuracy, not value accuracy)."""
    v = F.col(value_col)
    return (
        df.groupBy(group_col)
        .agg(
            F.round(F.percentile(v, q), round_dp).alias("exact_q"),
            F.percentile_approx(v, F.lit(q), F.lit(10000)).alias("_aq"),
            F.percentile(v, lo).alias("_lo"),
            F.percentile(v, hi).alias("_hi"),
        )
        .select(
            group_col,
            "exact_q",
            ((F.col("_aq") >= F.col("_lo")) & (F.col("_aq") <= F.col("_hi"))).alias(
                "approx_q_ok"
            ),
        )
    )
