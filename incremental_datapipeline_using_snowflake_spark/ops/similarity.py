"""Similarity search over embedding columns (``array<float>``).

- ``bruteforce_topk``: exact cosine top-k — the correctness baseline. The
  query set is broadcast; the corpus is scanned once (no corpus shuffle),
  so cost is |corpus| × |queries| dot products, all JVM-side expressions.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH (signed
  projections onto deterministic md5-derived planes) buckets the corpus;
  only same-bucket pairs are scored. At 100 TB the bucket id becomes the
  shuffle/partition key and per-bucket scoring is embarrassingly parallel.

Planes are derived from md5 so the DuckDB oracle reproduces them bit-for-bit
(``w[p,d] = (md5_60bit(f"{p}_{d}") % 2001 - 1000) / 1000``).

Cosine parity note: Spark's sequential ``aggregate`` fold over double-cast
floats matches DuckDB's ``list_cosine_similarity(a::DOUBLE[], ...)`` to well
under 1e-6; compared outputs round to 6 dp.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

N_PLANES = 8


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _dvec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self), ranked on
    round(cosine, 6) with id tie-break for determinism.

    Norms are precomputed per vector (not per pair) — one fold per pair
    instead of three; identical values, ~3x less expression work.
    """
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), _dvec(vec_col).alias("cv")
    ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    scored = (
        c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(
                dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )


def plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1] — identical
    to the oracle's md5 expression."""
    h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def planes_df(spark: SparkSession, dim: int, n_planes: int = N_PLANES) -> DataFrame:
    rows = [(p, d + 1, plane_weight(p, d + 1)) for p in range(n_planes) for d in range(dim)]
    return spark.createDataFrame(rows, schema="p int, d int, w double")


def lsh_signatures(
    df: DataFrame, dim: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """8-bit random-hyperplane signature per vector.

    Computed as a fold over per-vector expressions (planes inlined as
    literals) — zero joins, zero shuffles for the signature itself.
    """
    v = _dvec(vec_col)
    sig = F.lit(0)
    for p in range(N_PLANES):
        w = F.array(*[F.lit(plane_weight(p, d + 1)) for d in range(dim)])
        proj = dot(v, w)
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def lsh_bucketed_topk(
    corpus: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates."""
    sigs = lsh_signatures(corpus, dim, vec_col, id_col)
    q = sigs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("bucket")
    )
    c = sigs.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cv"), "bucket")
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            "bucket",
            F.round(cosine(_dvec("cv"), _dvec("qv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "bucket", "cosine")
    )
