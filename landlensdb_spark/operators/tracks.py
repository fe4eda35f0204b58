"""Trajectory resampling — positions at fixed epoch-aligned ticks by
linear interpolation between bracketing fixes (the regularization step
before trajectory featurization / map tiles of movement: irregular GPS
fixes -> one row per entity per Δt). Reference parity: the pandas
``resample``/``interpolate`` pass landlensdb users run on per-source
image timestamp series.

Semantics (deterministic): each consecutive-fix segment [t0, t1) of an
entity's time-ordered track emits every tick ``k * step_s`` with
``t0 <= k*step_s < t1`` (half-open — a tick on a fix timestamp belongs
to the segment STARTING there, so every tick is emitted exactly once);
position is the straight-line lerp ``p0 + (p1 - p0) * (tick - t0) /
(t1 - t0)``. Ticks are global epoch-aligned, so outputs from different
entities and different runs align to the same clock grid.

Exactness: tick arithmetic is pure int64; the lerp is ONE fixed IEEE
expression over integer-derived operands, so any engine evaluating the
same closed form produces bit-identical doubles (same discipline as
operators/stats.group_trend).

Scale shape: one window (lead over the per-entity time order) + a
``sequence`` explode with a LOUD runtime fan-out guard (a segment
spanning years at a 1 s step would otherwise explode the stage —
same ``raise_error`` discipline as operators/interval.py). No joins,
no Python stages; per-entity state through the shuffle is the fix
count, never the tick count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_tracks(
    df: DataFrame,
    entity: str = "user_id",
    t: str = "t",
    coords: tuple[str, ...] = ("lon", "lat"),
    step_s: int = 3600,
    max_ticks_per_segment: int = 4096,
) -> DataFrame:
    """``(entity, tick, <coords...>)`` — one row per entity per covered
    ``step_s``-aligned tick. ``t`` and ``step_s`` are unit-agnostic
    integral time (epoch seconds, milliseconds, microseconds — ticks are
    multiples of ``step_s`` in the same unit). Duplicate ``t`` values
    within an entity give NONDETERMINISTIC segment pairing (the window
    orders by ``t`` alone), so callers must de-duplicate fix timestamps
    first; a zero-length segment emits nothing and is dropped."""
    if step_s <= 0:
        raise ValueError(f"step_s must be > 0, got {step_s}")
    w = Window.partitionBy(entity).orderBy(t)
    seg = df.select(
        entity,
        F.col(t).alias("_t0"),
        F.lead(t).over(w).alias("_t1"),
        *[F.col(c).alias(f"_a_{c}") for c in coords],
        *[F.lead(c).over(w).alias(f"_b_{c}") for c in coords],
    ).filter(F.col("_t1") > F.col("_t0"))
    # pure-int ceil-to-multiple: no double division anywhere near the
    # 2^53 boundary (epoch-microsecond inputs)
    up = F.col("_t0") + F.lit(step_s - 1)
    first = up - F.pmod(up, F.lit(step_s))
    n_ticks = F.floor((F.col("_t1") - 1 - first) / F.lit(step_s)) + 1
    guarded = seg.select(
        entity,
        "_t0",
        *[f"_a_{c}" for c in coords],
        *[f"_b_{c}" for c in coords],
        first.alias("_f"),
        F.when(
            n_ticks <= F.lit(int(max_ticks_per_segment)), F.col("_t1")
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("resample_tracks: segment would emit "),
                    n_ticks.cast("string"),
                    F.lit(f" ticks (> {max_ticks_per_segment}); raise step_s"),
                )
            )
        )
        .alias("_t1"),
    )
    ticks = guarded.filter(F.col("_f") < F.col("_t1")).select(
        entity,
        "_t0",
        "_t1",
        *[f"_a_{c}" for c in coords],
        *[f"_b_{c}" for c in coords],
        F.explode(
            F.sequence(F.col("_f"), F.col("_t1") - 1, F.lit(int(step_s)))
        ).alias("tick"),
    )
    frac = (F.col("tick") - F.col("_t0")).cast("double") / (
        F.col("_t1") - F.col("_t0")
    ).cast("double")
    return ticks.select(
        entity,
        "tick",
        *[
            (F.col(f"_a_{c}") + (F.col(f"_b_{c}") - F.col(f"_a_{c}")) * frac).alias(c)
            for c in coords
        ],
    )


def od_matrix(
    df: DataFrame,
    entity: str = "user_id",
    t: str = "t",
    cell: str = "cell",
    drop_loops: bool = True,
) -> DataFrame:
    """Origin-destination flow matrix — ``(from_cell, to_cell, n_trips)``
    over every consecutive-fix transition of every entity's time-ordered
    track (the movement-analytics staple over cell-indexed trajectories;
    reference parity: the pandas shift+groupby OD counting run over
    geoimageframe tracks). ``drop_loops`` (default) excludes
    within-cell steps, keeping only actual moves.

    One lead window per entity + one map-side-combined groupBy on the
    (from, to) pair; per-entity shuffle state is the fix count and the
    matrix is bounded by occupied cell pairs, not rows. Ties on ``t``
    within an entity make the transition order ambiguous — use
    collision-free timestamps (epoch micros) or pre-dedupe, as with
    :func:`resample_tracks`."""
    w = Window.partitionBy(entity).orderBy(t)
    seg = df.select(
        F.col(cell).alias("from_cell"),
        F.lead(cell).over(w).alias("to_cell"),
    ).filter(F.col("to_cell").isNotNull())
    if drop_loops:
        seg = seg.filter(F.col("from_cell") != F.col("to_cell"))
    return seg.groupBy("from_cell", "to_cell").agg(
        F.count("*").alias("n_trips")
    )
