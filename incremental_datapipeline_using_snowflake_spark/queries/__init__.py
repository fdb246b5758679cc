"""Declared query inventory — the correctness surface (SURVEY.md §2).

Each submodule exposes ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL for the DuckDB oracle (None -> rows-only check for
non-SQL-expressible ops).

Determinism discipline (SURVEY.md §7.3 + FIXTURES.md §3):
- every aggregate/computed column aliased identically in Spark and SQL;
- double sums routed through DECIMAL casts in BOTH engines (exact arithmetic,
  immune to parallel-summation order differences);
- kernel outputs rounded as specified (4 dp volatility, 3 dp normalize);
- no raw current_timestamp in compared output.
"""

from __future__ import annotations


def all_queries() -> dict:
    from . import (
        pipeline_queries,
        relational,
        relational2,
        similarity,
        sketches_q,
        spark4,
        streamops,
        temporal_prep,
        textops,
    )

    out: dict = {}
    for mod in (
        relational,
        relational2,
        pipeline_queries,
        streamops,
        textops,
        similarity,
        temporal_prep,
        sketches_q,
        spark4,
    ):
        out.update(mod.QUERIES)
    return out
