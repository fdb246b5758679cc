"""Data-quality constraint validation (the dbt-tests / Delta Live Tables
"expectations" surface): declarative rules evaluated in ONE pass over the
table, returning a per-rule violation report.

Snowflake declares NOT NULL / UNIQUE / FOREIGN KEY on tables but does not
enforce most of them; pipelines enforce via query-shaped checks (dbt's
not_null / unique / accepted_values / relationships tests). This module is
that layer, Spark-first:

- row-level rules (not_null, accepted range/values, custom predicates)
  fold into ONE aggregation pass — a single scan produces every violation
  count, no per-rule jobs;
- ``unique`` needs its own groupBy (a shuffle on the key — unavoidable:
  uniqueness is a global property);
- ``references`` (FK) is a broadcast-or-AQE anti join against the
  dimension's key column.

Report shape: (rule, column, n_violations, sample) — sample carries up to
3 offending key values for debuggability without collecting violations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rules:
    """Declarative constraint set for one table."""

    not_null: list[str] = field(default_factory=list)
    unique: list[list[str]] = field(default_factory=list)
    accepted_values: dict[str, list] = field(default_factory=dict)
    ranges: dict[str, tuple] = field(default_factory=dict)  # col -> (lo, hi)
    checks: dict[str, Column] = field(default_factory=dict)  # name -> predicate
    references: dict[str, tuple[DataFrame, str]] = field(default_factory=dict)
    # references: fk_col -> (dim_df, dim_key_col)


def validate_constraints(df: DataFrame, rules: Rules, id_col: str | None = None) -> DataFrame:
    """Evaluate every rule; returns (rule, column, n_violations, sample).

    Row-level rules share ONE aggregation pass over ``df``; each unique /
    references rule adds its own (key-shuffled / anti-join) job. ``sample``
    holds up to 3 offending ``id_col`` values (or the offending column's
    values when no id is given) per rule.
    """
    spark = df.sparkSession
    parts: list[DataFrame] = []

    row_rules: list[tuple[str, str, Column]] = []
    for c in rules.not_null:
        row_rules.append(("not_null", c, F.col(c).isNull()))
    for c, vals in rules.accepted_values.items():
        row_rules.append(
            ("accepted_values", c, ~F.col(c).isin(vals) | F.col(c).isNull())
        )
    for c, (lo, hi) in rules.ranges.items():
        bad = F.col(c).isNull()
        if lo is not None:
            bad = bad | (F.col(c) < lo)
        if hi is not None:
            bad = bad | (F.col(c) > hi)
        row_rules.append(("range", c, bad))
    for name, pred in rules.checks.items():
        row_rules.append(("check:" + name, "", ~F.coalesce(pred, F.lit(False))))

    if row_rules:
        aggs = []
        for i, (name, colname, bad) in enumerate(row_rules):
            src = (
                F.col(id_col)
                if id_col
                else (F.col(colname) if colname else F.lit(None))
            )
            # empty table -> SUM is NULL; the report must say 0
            aggs.append(
                F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias(f"_n_{i}")
            )
            aggs.append(
                F.slice(
                    F.collect_list(F.when(bad, src.cast("string"))), 1, 3
                ).alias(f"_s_{i}")
            )
        # one wide aggregation over the whole table -> one row; project each
        # rule's pair back out into the report shape
        wide = df.agg(*aggs)
        for i, (name, colname, _bad) in enumerate(row_rules):
            parts.append(
                wide.select(
                    F.lit(name).alias("rule"),
                    F.lit(colname).alias("column"),
                    F.col(f"_n_{i}").alias("n_violations"),
                    F.col(f"_s_{i}").alias("sample"),
                )
            )

    for keys in rules.unique:
        dupes = (
            df.groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
        )
        parts.append(
            dupes.agg(
                F.lit("unique").alias("rule"),
                F.lit(",".join(keys)).alias("column"),
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations"),
                F.slice(
                    F.sort_array(F.collect_list(F.concat_ws("|", *keys))), 1, 3
                ).alias("sample"),
            )
        )

    for fk, (dim, dim_key) in rules.references.items():
        orphans = df.select(F.col(fk)).filter(F.col(fk).isNotNull()).join(
            dim.select(F.col(dim_key).alias(fk)).distinct(), on=fk, how="left_anti"
        )
        parts.append(
            orphans.agg(
                F.lit("references").alias("rule"),
                F.lit(fk).alias("column"),
                F.count(F.lit(1)).alias("n_violations"),
                F.slice(
                    F.sort_array(F.collect_list(F.col(fk).cast("string"))), 1, 3
                ).alias("sample"),
            )
        )

    if not parts:
        return spark.createDataFrame(
            [], "rule string, column string, n_violations long, sample array<string>"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assert_constraints(df: DataFrame, rules: Rules, id_col: str | None = None) -> None:
    """Raise ``ValueError`` listing every violated rule (the hard-gate form:
    a pipeline stage calls this before publishing)."""
    bad = [
        r
        for r in validate_constraints(df, rules, id_col=id_col).collect()
        if r["n_violations"]
    ]
    if bad:
        msgs = ", ".join(
            f"{r['rule']}({r['column']}): {r['n_violations']} (e.g. {r['sample'][:3]})"
            for r in bad
        )
        raise ValueError(f"constraint violations: {msgs}")


def constraint_gated(batch_fn, rules: Rules, id_col: str | None = None):
    """Wrap a ``foreachBatch`` function with a hard constraint gate: every
    micro-batch is validated BEFORE the wrapped function runs, so a
    poisoned batch fails the streaming query instead of polluting the
    sink (the Delta Live Tables "expectation with FAIL" semantics). The
    checkpoint does not advance past a failed batch — after fixing the
    upstream data, the restarted query retries the same batch."""

    def gated(batch_df: DataFrame, batch_id: int):
        assert_constraints(batch_df, rules, id_col=id_col)
        return batch_fn(batch_df, batch_id)

    return gated
