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
