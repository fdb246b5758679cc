"""Skew-handling join utilities for the 100 TB target.

AQE's skew-join splitting (on in session.py) handles most runtime skew; this
module adds *explicit salting* for the pathological case AQE can't fix — a
single hot key whose rows exceed one executor's memory in a sort-merge or
hash build. Salting fans the hot side's key out into N sub-keys and
replicates the other side N times, so the hot partition splits into N
bounded ones.

Use when key-frequency stats (known a priori or sampled) identify hot keys;
pass everything else through the normal join.

MEASURED default (scripts/skew_stress.py, 1% of keys carrying 50% of 600k
rows, non-broadcastable dim, sf0.1 — table in SHUFFLE.md): AQE skew-join
split beats both alternatives — 0.60 s vs 1.44 s unmitigated vs 1.51 s
salted, and salting shuffles 1.44x the bytes (the replicated dim). So the
ENCODED DEFAULT is: leave joins unsalted and let AQE split (session.py
turns it on); reach for :func:`salted_join` only when a single key's build
side alone exceeds executor memory (AQE splits partitions, not keys) or
the engine runs without AQE. Same story for aggregation: plain
``groupBy`` map-side partial aggregation already de-skews algebraic aggs
(0.49 s / 0.16 MB vs two-phase 0.81 s / 2.73 MB) — :func:`two_phase_agg`
pays off only for holistic aggregates or when per-key partial groups are
themselves too wide (e.g. collect_list-bounded state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big gets a random-but-deterministic salt in [0, salt_buckets) derived
    from a sibling column hash (crc-free: pmod of a murmur hash of all
    columns — deterministic per row content); small is exploded once per
    bucket. Shuffle key becomes (on, _salt), splitting any hot key into
    salt_buckets partitions. Output drops the salt.

    For skewed AGGREGATION, prefer two-phase: groupBy(key, salt) partial,
    then groupBy(key) final — same fan-out idea, no replication needed.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: partial agg on (key, salt), final agg on key.

    Only algebraic aggregates decompose this way; supported here: sum and
    count (avg = sum/count at the call site). A hot key's rows spread over
    ``salt_buckets`` partial groups before the final (tiny) combine.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in agg_exprs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in agg_exprs]
    )
