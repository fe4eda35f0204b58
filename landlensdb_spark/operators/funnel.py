"""Ordered-funnel analysis — per entity, the earliest strictly-
increasing completion chain through a step sequence (view -> click ->
purchase): the conversion staple over event streams.

Semantics: ``t_1`` is the entity's earliest step-1 event; ``t_i`` is
the earliest step-i event with ``ts > t_{i-1}``; ``depth`` counts the
completed prefix. Greedy-earliest is COMPLETE, not just a heuristic:
if ANY strictly-increasing chain (a_1 < ... < a_n) exists, then
t_1 <= a_1, and inductively every a_i remains admissible after
t_{i-1} <= a_{i-1} < a_i — so the greedy chain reaches at least the
same depth, with the minimal timestamp at every step. NULL t_i beyond
the reached depth (a NULL t_{i-1} nulls the ``>`` comparison, so the
chain stops cleanly).

Scale shape: one shuffle — ``n_steps`` chained window aggregates over
the SAME entity partitioning (Catalyst chains the Window operators on
one exchange), then a map-side-combined groupBy on the same key. No
joins, no explode, no Python; per-entity state through the shuffle is
the event count. Ties on ``ts`` within an entity make "strictly after"
ambiguous only if a later step shares the exact timestamp — use
microsecond timestamps (collision-free in this corpus) or pre-dedupe.

Reference parity: the pandas groupby-apply funnel counting landlensdb
users run over per-source event logs; here it is a fixed-depth column
plan instead of a per-group Python pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: tuple[str, ...],
    entity: str = "user_id",
    ts: str = "t",
    event: str = "event_type",
) -> DataFrame:
    """``(entity, t_1..t_n, depth)`` — earliest-chain step timestamps
    (NULL past the reached depth) and the completed-prefix count.
    ``ts`` must be integral (epoch seconds/micros)."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    w = Window.partitionBy(entity)
    cur = df.select(entity, F.col(ts).alias("_ts"), F.col(event).alias("_ev"))
    names = []
    for i, s in enumerate(steps, 1):
        cond = F.col("_ev") == F.lit(s)
        if names:
            cond = cond & (F.col("_ts") > F.col(names[-1]))
        name = f"t_{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col("_ts"))).over(w))
        names.append(name)
    agg = cur.groupBy(entity).agg(*[F.min(n).alias(n) for n in names])
    depth = sum(
        (F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in names), F.lit(0)
    )
    return agg.select(entity, *names, depth.cast("long").alias("depth"))


def retention_cohorts(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "t",
    period_s: int = 604_800,
) -> DataFrame:
    """Cohort retention — ``(cohort, offset, n_users)``: entities grouped
    by the epoch-aligned period of their FIRST event (``cohort`` = that
    period's index, ``floor(first_ts / period_s)``), counted in every
    later period they were active in (``offset`` = periods since the
    cohort period; offset 0 is the cohort size itself). The
    retention-matrix staple next to :func:`funnel`.

    All arithmetic is integer (period index via ``pmod`` subtraction,
    never a double division), so counts are engine-exact. Scale shape:
    one min-per-entity aggregate, one equi-join back on the entity key,
    one distinct and one map-side-combined groupBy — per-entity state
    through every shuffle is O(1); no windows over the raw event
    stream."""
    if period_s <= 0:
        raise ValueError(f"period_s must be > 0, got {period_s}")
    p = F.lit(int(period_s))
    # (t - pmod(t, p)) is an EXACT multiple of p, and an exact-ratio
    # double division returns the integer quotient exactly (|t| < 2^53),
    # so the period index is floor(t / p) for any sign with no rounding
    per = ((F.col(ts) - F.pmod(F.col(ts), p)).cast("long") / p).cast("long")
    ev = df.select(F.col(entity).alias("_e"), per.alias("_p"))
    first = ev.groupBy("_e").agg(F.min("_p").alias("_c"))
    return (
        ev.join(first, "_e")
        .select("_e", "_c", (F.col("_p") - F.col("_c")).alias("_o"))
        .distinct()
        .groupBy(F.col("_c").alias("cohort"), F.col("_o").alias("offset"))
        .agg(F.count("*").alias("n_users"))
    )
