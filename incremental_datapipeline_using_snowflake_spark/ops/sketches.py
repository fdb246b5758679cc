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


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005).
# ---------------------------------------------------------------------------
CMS_D = 4    # hash rows
CMS_W = 16   # counters per row (deliberately small: collisions are the point)


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Top-k tokens with exact count, count-min estimate, and the CMS
    overcount bound check.

    Unlike the HLL queries (whose estimates are engine-seeded and need an
    error envelope), this sketch is built from the portable md5 hash — the
    DuckDB oracle replays every counter and every estimate BIT-EXACTLY, so
    the estimates themselves are hash-gated, not just an in-envelope flag.

    Scale shape: the sketch is one explode -> groupBy on (row, cell) —
    map-side partial aggregation collapses each partition to at most d*w
    counters before the shuffle, so the exchange moves kilobytes no matter
    the corpus size. The exact side (count per token + top-k) exists to
    verify the sketch; at 100 TB it is exactly the shuffle-bound pass the
    sketch replaces. Estimation joins the k candidates' d cells against
    the d*w-cell sketch — broadcast-trivial.

    ``bound_ok`` checks the classic guarantee est <= exact + 2N/w in exact
    integer arithmetic ((est - exact) * w <= 2N), avoiding float division.
    """
    from ..queries.util import md5_long

    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    cells_arr = F.array(
        *[
            (md5_long(F.concat(F.lit(f"cms{j}:"), F.col("tok"))) % w).alias(f"c{j}")
            for j in range(d)
        ]
    )
    sketch = (
        toks.select(F.posexplode(cells_arr).alias("j", "cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    n_tokens = exact.agg(F.sum("exact_cnt")).first()[0]  # scalar-cache (A2)
    cand = exact.orderBy(F.desc("exact_cnt"), F.asc("tok")).limit(top_k)
    # cells_arr is keyed on the same "tok" column name, so it re-resolves
    # against the candidate rows here.
    cand_cells = cand.select(
        "tok", "exact_cnt", F.posexplode(cells_arr).alias("j", "cell")
    )
    return (
        cand_cells.join(sketch, ["j", "cell"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "tok",
            "exact_cnt",
            "cms_est",
            (
                (F.col("cms_est") - F.col("exact_cnt")) * w <= 2 * int(n_tokens)
            ).alias("bound_ok"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("tok"))
    )


def cms_heavy_hitters_grouped(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_k: int = 5,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Per-group heavy hitters from per-group count-min sketches (the
    trending-per-category shape: one d*w counter grid PER GROUP, all built
    in the same pass).

    Same portable-md5 cells and exact-integer bound check as
    :func:`cms_heavy_hitters`; the group key simply joins the sketch key
    — partial aggregation still collapses each partition to at most
    groups*d*w counters before the shuffle, and per-group totals replace
    the global scalar (no driver-side collect at all in this form).

    Output: (group, rk, tok, exact_cnt, cms_est, bound_ok), rk = 1..top_k
    per group by (exact_cnt desc, tok).
    """
    from pyspark.sql import Window

    from ..queries.util import md5_long

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    cells_arr = F.array(
        *[
            (md5_long(F.concat(F.lit(f"cms{j}:"), F.col("tok"))) % w).alias(f"c{j}")
            for j in range(d)
        ]
    )
    sketch = (
        toks.select("grp", F.posexplode(cells_arr).alias("j", "cell"))
        .groupBy("grp", "j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    totals = exact.groupBy("grp").agg(F.sum("exact_cnt").alias("grp_tokens"))
    wnd = Window.partitionBy("grp").orderBy(F.desc("exact_cnt"), F.asc("tok"))
    cand = exact.withColumn("rk", F.row_number().over(wnd)).filter(
        F.col("rk") <= top_k
    )
    cand_cells = cand.select(
        "grp", "tok", "exact_cnt", "rk", F.posexplode(cells_arr).alias("j", "cell")
    )
    est = (
        cand_cells.join(sketch, ["grp", "j", "cell"])
        .groupBy("grp", "tok", "exact_cnt", "rk")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.join(F.broadcast(totals), "grp")
        .select(
            F.col("grp").alias(group_col),
            "rk",
            "tok",
            "exact_cnt",
            "cms_est",
            ((F.col("cms_est") - F.col("exact_cnt")) * w <= 2 * F.col("grp_tokens"))
            .alias("bound_ok"),
        )
        .orderBy(group_col, "rk")
    )


def hll_overlap_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rel_tol: float = 0.25,
) -> DataFrame:
    """Sketch set-algebra: pairwise audience overlap via inclusion-
    exclusion — ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` with
    ``hll_union`` merging the two group sketches.

    This is the 100 TB shape for "users doing both X and Y" across many
    segment pairs: raw rows are scanned ONCE to build one kB sketch per
    segment; every pairwise overlap then derives from sketch algebra on a
    |groups|-row relation — no per-pair raw-data joins. The subtraction
    compounds the per-sketch rsd (~5% default), so the acceptance envelope
    is wider than the single-estimate checks (25% of exact by default).

    Emits EVERY pair (a < b) — including pairs with ZERO exact overlap
    (the estimate side is a full pair cross of the |groups|-row sketch
    relation; the exact side left-joins onto it with a 0 fill). A
    disjoint pair whose sketch estimate is large is precisely the
    interesting failure, so it must be reportable. Because the envelope
    ``exact * rel_tol`` collapses to 0 there, the acceptance test adds an
    absolute floor derived from the sketch's design error: each HLL
    estimate at the default lgConfigK=12 has rsd ≈ 1.04/√4096 ≈ 1.6%,
    the inclusion-exclusion subtraction compounds three estimates of
    magnitude ≤ n_a + n_b, so |err| ≲ 6·rsd·(n_a+n_b) at ~3σ — a
    healthy sketch on a disjoint pair passes, a wild one is flagged.

    Exact overlap comes from one distinct self-join — the verification
    cost, not the production path.
    Output: ``type_a, type_b, exact_overlap, overlap_ok``.
    """
    HLL_RSD = 1.04 / (2.0**12) ** 0.5
    d = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("string").alias("v")
    ).distinct()
    sk = d.groupBy("g").agg(
        F.hll_sketch_agg("v").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    a = sk.select(
        F.col("g").alias("type_a"), F.col("sk").alias("sk_a"), F.col("n").alias("n_a")
    )
    b = sk.select(
        F.col("g").alias("type_b"), F.col("sk").alias("sk_b"), F.col("n").alias("n_b")
    )
    est = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            (
                F.hll_sketch_estimate("sk_a")
                + F.hll_sketch_estimate("sk_b")
                - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
            ).alias("_est"),
            (6.0 * HLL_RSD * (F.col("n_a") + F.col("n_b"))).alias("_abs_floor"),
        )
    )
    exact = (
        d.alias("x")
        .join(d.alias("y"), (F.col("x.v") == F.col("y.v")) & (F.col("x.g") < F.col("y.g")))
        .groupBy(F.col("x.g").alias("type_a"), F.col("y.g").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    # est has EVERY pair (cross of the sketch relation); left-join the
    # exact side onto it so zero-overlap pairs are reported, not dropped
    return (
        est.join(exact, ["type_a", "type_b"], "left")
        .withColumn("exact_overlap", F.coalesce("exact_overlap", F.lit(0)))
        .select(
            "type_a",
            "type_b",
            "exact_overlap",
            (
                F.abs(F.col("_est") - F.col("exact_overlap"))
                <= F.greatest(
                    F.col("exact_overlap") * rel_tol, F.col("_abs_floor")
                )
            ).alias("overlap_ok"),
        )
    )
