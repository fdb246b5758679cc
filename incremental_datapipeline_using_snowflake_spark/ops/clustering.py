"""Distributed k-means (Lloyd's iterations) over embedding columns.

The canonical *iterative* algorithm of a training-data pipeline (corpus
organization, IVF centroid training, diversity sampling). Designed for the
100 TB shape AND cross-engine exactness:

- **per iteration**: one broadcast-free assignment pass (centroids are
  inlined as literal arrays — k×dim integers — so assignment is a narrow
  map) + one groupBy(cell) shuffle for the per-dimension sums. The corpus
  is never collected; only the k×(dim+2) aggregate rows come to the driver
  (the same scalar-cache pattern as the pipeline's min/max, A2).
- **integer-exact, oracle-replayable**: components are quantized to 1e-6
  (``floor(x*1e6 + 0.5)``, the same bit-identical step as the LSH
  signatures), distances are exact int64 sums of squared diffs, and
  centroid updates floor to the integer grid (``floor(sum/n)`` — exact for
  |sum| < 2^53 since int64 doubles are exact there). Every iteration is
  therefore bit-for-bit reproducible in any engine, including the DuckDB
  oracle — an iterative algorithm with a hash-checked correctness gate
  instead of the usual rows-only waiver.
- **deterministic**: seeds = the k lowest-id vectors (cell label = seed
  vec_id); distance ties break to the smallest cell label; empty cells
  keep their previous centroid.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

QUANT = 1_000_000  # 1e-6 component grid


def quantized_vec(vec_col: Column | str) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"))


def _dist_to(xq: Column, centroid: list[int]) -> Column:
    """Exact int64 squared L2 distance to a literal centroid."""
    cl = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(xq, cl, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _assign_cols(xq: Column, centroids: dict[int, list[int]]) -> tuple[Column, Column]:
    """(cell, dist) columns for the argmin assignment; ties -> smallest
    cell label.

    Distances go into ONE array column, argmin is ``array_min`` +
    ``array_position`` (first match = smallest label, since the array is
    in ascending label order). A least()+when-chain form repeated every
    distance fold ~3x in the expression tree, tripling codegen size."""
    cells = sorted(centroids)
    darr = F.array(*[_dist_to(xq, centroids[c]) for c in cells])
    best = F.array_min(darr)
    pos = F.array_position(darr, best)  # 1-based first occurrence
    labels = F.array(*[F.lit(int(c)).cast("long") for c in cells])
    return F.element_at(labels, pos.cast("int")), best


def _assign_df_arrow(
    frame: DataFrame, centroids: dict[int, list[int]]
) -> DataFrame:
    """Arrow-vectorized assignment: one batched int64 matrix op per Arrow
    batch instead of k×dim interpreted Catalyst HOF steps per row (~3×
    faster end-to-end at sf0.1; the gap widens with k·dim). Bit-identical
    to :func:`_assign_cols`: numpy int64 arithmetic is exact for the same
    |sum| < 2^63 envelope, and ``argmin`` returns the FIRST minimum, which
    in ascending-label order is exactly the smallest-cell tie-break.

    Still a narrow map — the k×dim centroid matrix ships with the task
    closure; no shuffle, no driver round-trip.
    """
    cells = sorted(centroids)
    cmat = np.array([centroids[c] for c in cells], dtype=np.int64)  # k × dim
    labels = np.array(cells, dtype=np.int64)
    schema = StructType(
        [StructField("cell", LongType()), StructField("dist", LongType())]
    )

    @F.pandas_udf(schema)
    def _assign(xq: pd.Series) -> pd.DataFrame:
        x = np.stack(xq.to_numpy()).astype(np.int64)  # n × dim
        d = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)  # n × k
        pos = d.argmin(axis=1)
        return pd.DataFrame(
            {"cell": labels[pos], "dist": d[np.arange(len(pos)), pos]}
        )

    return frame.withColumn("_a", _assign("xq")).select(
        "id",
        "xq",
        F.col("_a.cell").alias("cell"),
        F.col("_a.dist").alias("dist"),
    )


def _assign_df_expr(
    frame: DataFrame, centroids: dict[int, list[int]]
) -> DataFrame:
    """Pure-Column assignment twin (no Python workers) — the reference
    semantics `_assign_cols` expresses; kept as the no-Arrow fallback and
    cross-checked against the Arrow path in tests."""
    cell, dist = _assign_cols(F.col("xq"), centroids)
    return frame.select(
        "id", "xq", cell.alias("cell"), dist.alias("dist")
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_arrow: bool = True,
) -> tuple[dict[int, list[int]], DataFrame]:
    """Run ``iters`` Lloyd updates; returns (centroids, assignments).

    ``centroids`` maps cell label (seed vec_id) -> quantized component
    list; ``assignments`` is (id, cell, dist) under the FINAL centroids.
    Driver traffic per iteration is k×(dim+2) values — independent of
    corpus size. ``use_arrow`` picks the vectorized pandas_udf assignment
    (default; same exact integers) over the interpreted Column-HOF form.
    """
    assign = _assign_df_arrow if use_arrow else _assign_df_expr
    q = corpus.select(F.col(id_col).alias("id"), quantized_vec(vec_col).alias("xq"))
    seeds = q.orderBy("id").limit(k).collect()
    dim = len(seeds[0]["xq"])
    centroids = {int(r["id"]): [int(v) for v in r["xq"]] for r in seeds}

    sum_aggs = [
        F.sum(F.element_at("xq", d + 1)).alias(f"s{d}") for d in range(dim)
    ]
    for _ in range(iters):
        grouped = (
            assign(q, centroids)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"), *sum_aggs)
            .collect()
        )
        new = dict(centroids)  # empty cells keep their previous centroid
        for r in grouped:
            n = int(r["n"])
            new[int(r["cell"])] = [
                int(math.floor(int(r[f"s{d}"]) / n)) for d in range(dim)
            ]
        centroids = new

    return centroids, assign(q, centroids).select("id", "cell", "dist")


def kmeans_cluster_stats(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_arrow: bool = True,
) -> DataFrame:
    """Per-cluster summary under the final model: member count, smallest
    member id, and inertia (sum of squared distances). The sum is
    decimal-routed (exact, no overflow at corpus scale) and emitted as
    DOUBLE: both engines round the identical exact integer to the identical
    double, whereas a DECIMAL output column reaches pandas as ``Decimal`` on
    Spark but ``float`` on DuckDB and the harness hashes those differently."""
    _, assigned = kmeans_fit(
        corpus, k=k, iters=iters, vec_col=vec_col, id_col=id_col, use_arrow=use_arrow
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("id").alias("min_vec_id"),
            F.sum(F.col("dist").cast("decimal(38,0)")).cast("double").alias("inertia"),
        )
        .orderBy("cell")
    )
