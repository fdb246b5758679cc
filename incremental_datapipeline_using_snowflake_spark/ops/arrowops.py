"""Grouped-map and cogrouped-map Arrow operators.

Completes the engine's Pandas-API family: scalar ``pandas_udf``
(`queries/streamops.py:pandas_udf_normalize`), ``mapInPandas``
(`ops/multimodal.py`), ``applyInPandasWithState`` / v2
(`streaming/stateful.py`) — plus, here, ``groupBy().applyInPandas``
(grouped map) and ``cogroup().applyInPandas`` (cogrouped map).

Both operators keep the cross-engine exactness discipline: the grouped
scaler is pure int64 arithmetic (numpy ``//`` == Spark ``div`` == DuckDB
``//`` for non-negative ints), and the cogrouped as-of join is
cross-checked row-for-row against the Column-expression
``ops.temporal.asof_join`` in tests.

Scale notes: ``applyInPandas`` shuffles once on the group key and streams
each group through a worker as Arrow batches — a group must fit in worker
memory, so key choice (here: language / join key) bounds group size. The
cogrouped form is the escape hatch for per-key merge logic Spark lacks
natively (``pd.merge_asof`` per key); the Column-expression union-tag
form in ops.temporal stays the default at scale because it never
materializes a whole group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_GRID = 1000  # per-group min-max scale: integer grid [0, SCALE_GRID)


def grouped_minmax_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group integer min-max scaling via grouped-map ``applyInPandas``:
    ``out = (v - min(group)) * SCALE_GRID // (max(group) - min(group) + 1)``.

    ``value_col`` must be a non-negative integer column; the arithmetic is
    exact int64, so the result is engine-reproducible (the window-function
    rewrite in the oracle computes the identical integers).
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} long"]
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("int64")
        mn, mx = v.min(), v.max()
        pdf[out_col] = (v - mn) * SCALE_GRID // (mx - mn + 1)
        return pdf

    return df.groupBy(group_col).applyInPandas(scale, schema=out_schema)


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """As-of join (latest right row with ``ts <= left.ts`` per key) via
    cogrouped-map ``applyInPandas`` + ``pd.merge_asof`` — the per-key
    merge-logic escape hatch. Tie semantics match
    :func:`ops.temporal.asof_join` (equal timestamps match); tests pin the
    two implementations row-for-row equal.

    Output: left columns + ``right_ts_alias`` + ``value_cols``.
    """
    right_types = dict(right.dtypes)
    # the matched-ts output type follows the right side's ts column (a
    # caller with plain `timestamp` would otherwise hit an Arrow schema
    # mismatch against a hardcoded timestamp_ntz)
    matched_ts_type = right.schema[ts_col].dataType.simpleString()
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{right_ts_alias} {matched_ts_type}"]
        + [f"{v} {right_types[v]}" for v in value_cols]
    )
    lcols = list(left.columns)
    # Rename the right's ts BEFORE cogrouping: Spark's cogroup resolves the
    # output schema's names against child attributes and prunes columns no
    # output name claims — a right-side column that shares the left's ts
    # name loses that resolution (the left wins) and silently vanishes
    # from the Arrow batch. With the rename, every output name maps 1:1 to
    # exactly one child attribute and nothing needed is pruned.
    right = right.withColumnRenamed(ts_col, right_ts_alias)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=lcols + [right_ts_alias] + value_cols)
        lp = lpdf.sort_values(ts_col, kind="mergesort")
        # guard BEFORE selecting columns: a group present only on the left
        # arrives with an empty right pdf that may carry no columns at all
        if rpdf.empty or right_ts_alias not in rpdf.columns:
            out = lp.copy()
            out[right_ts_alias] = pd.NaT
            for v in value_cols:
                out[v] = None
            return out[lcols + [right_ts_alias] + value_cols]
        rp = rpdf[[right_ts_alias, *value_cols]].sort_values(
            right_ts_alias, kind="mergesort"
        )
        out = pd.merge_asof(
            lp,
            rp,
            left_on=ts_col,
            right_on=right_ts_alias,
            direction="backward",
            allow_exact_matches=True,
        )
        return out[lcols + [right_ts_alias] + value_cols]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema=out_schema)
    )
