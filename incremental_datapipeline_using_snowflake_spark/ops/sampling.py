"""Deterministic dataset splitting & sampling for training-data pipelines.

Train/val/test assignment and stratified sampling are the last step of
every pre-training data pipeline. Both are expressed as pure Column
expressions over a portable 60-bit md5 hash of the row id — zero shuffle,
zero RNG state:

- **deterministic**: the split of a row depends only on (salt, id), so
  re-runs, retries, and incremental appends land every row in the same
  split — no split leakage when the corpus grows;
- **scale-free**: a narrow map at any corpus size; the assignment never
  needs a global count or a sort;
- **oracle-portable**: the same md5 arithmetic runs in any SQL engine
  (see ``split_bucket_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queries.util import ORACLE_MD5_LONG, md5_long

N_BUCKETS = 10_000  # split resolution: 0.01% granularity


def split_bucket(id_col: Column | str, salt: str = "split") -> Column:
    """Stable bucket in [0, N_BUCKETS) from the salted md5 of the id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(F.concat(F.lit(salt + ":"), c.cast("string"))) % N_BUCKETS


def split_bucket_sql(id_expr: str, salt: str = "split") -> str:
    """DuckDB twin of :func:`split_bucket`."""
    h = ORACLE_MD5_LONG.format(x=f"('{salt}:' || CAST({id_expr} AS VARCHAR))")
    return f"({h} % {N_BUCKETS})"


def split_column(
    id_col: Column | str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> Column:
    """Assign each row to a named split by hash-bucket ranges.

    ``weights`` maps split name -> fraction (must sum to <= 1; any
    remainder falls into the last split). Assignment is by cumulative
    bucket ranges in dict order, e.g. ``{"train": .9, "val": .05,
    "test": .05}`` -> buckets [0,9000) / [9000,9500) / [9500,10000).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = split_bucket(id_col, salt=salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * N_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(names[-1])


def split_column_sql(
    id_expr: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> str:
    """DuckDB twin of :func:`split_column` (same cumulative ranges)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = split_bucket_sql(id_expr, salt=salt)
    names = list(weights)
    parts = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        parts.append(f"WHEN {b} < {int(round(cum * N_BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose salted bucket
    falls under the threshold. Unlike ``df.sample`` the result is stable
    across runs/partitionings, and stratification is free — the hash is
    uniform within any stratum, so per-group rates concentrate on
    ``fraction`` without per-stratum state."""
    return df.filter(split_bucket(id_col, salt=salt) < int(round(fraction * N_BUCKETS)))


def stratified_exact_n(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "exact",
) -> DataFrame:
    """Exactly ``min(n, |group|)`` rows per group, deterministically.

    The per-group order is the salted md5 of the id (with the id itself as
    a total-order tiebreak), so the chosen sample is uniform within each
    stratum yet identical across runs, partitionings, and engines — the
    property ``df.sample`` and ``RAND()``-ordered picks both lack.

    Scale shape: ONE shuffle on the group key + a bounded per-group
    row_number; no global sort, no driver state. Groups are strata
    (languages, sources, label classes) — their cardinality is small and
    the per-group stream is cut off at n by the rank filter, so the window
    never materializes a whole stratum in memory beyond the sort spill any
    grouped operator needs. Output adds ``sample_rank`` (1-based).
    """
    from pyspark.sql import Window as W

    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )
