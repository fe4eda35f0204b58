"""Bucketized interval join — points matched to every interval that
contains them, without a range-join explosion.

A naive ``p BETWEEN s AND e`` join has no equi-key, so Spark plans it as
a broadcast-nested-loop (or cartesian) — O(|points| x |intervals|) work
that no cluster size survives. The classic fix: quantize the number line
into fixed-width buckets, explode each interval into the buckets it
overlaps (fan-out = length/width + 1, a small constant when the width is
chosen near the typical interval length), map each point to its single
bucket, hash-join on (key?, bucket), then refine with the exact
containment predicate. Every stage is an equi-join or a bounded explode;
the plan is shuffle-hash/sort-merge joinable, AQE-skew-splittable, and
scales linearly. (The same quantize-join-refine shape as the engine's
hex/tile spatial joins — this is its 1-D time/number-line sibling.)

The reference's temporal filtering is captured-at windows pushed into SQL
(/root/reference/landlensdb/handlers/db.py WHERE ranges); this is the
join form: billions of points against millions of windows.

Semantics: CLOSED interval ``s <= p <= e`` (ANSI ``BETWEEN``); rows with
``e < s`` match nothing; a point matching several intervals yields one
row per match. Columns: all point columns + all interval columns (names
must not collide — pre-rename). ``key`` adds an equi-condition (e.g.
user_id) to both the bucket join and the semantics.

Guard: an interval spanning more than ``max_fanout`` buckets raises AT
RUNTIME (executor-side ``raise_error``) instead of silently exploding a
year-long interval against a millisecond bucket width into 3e10 rows —
pick ``bucket_width`` near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    key: str | None = None,
    max_fanout: int = 4096,
) -> DataFrame:
    """Inner-join ``points`` to every ``intervals`` row whose
    ``[start_col, end_col]`` contains ``point_col`` (and whose ``key``
    matches, if given). Coordinate columns must be integral (cast
    timestamps to epoch seconds/micros upstream — exact in both
    engines)."""
    if bucket_width <= 0:
        raise ValueError(f"interval_join: bucket_width must be > 0, got {bucket_width}")
    overlap = set(points.columns) & set(intervals.columns) - ({key} if key else set())
    if overlap:
        raise ValueError(
            f"interval_join: colliding columns {sorted(overlap)} — rename first"
        )
    keys = [key] if key else []
    nb = (
        F.floor(F.col(end_col) / bucket_width)
        - F.floor(F.col(start_col) / bucket_width)
        + 1
    )
    guarded = F.when(
        nb > max_fanout,
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: an interval spans > {max_fanout} buckets "
                    f"of width {bucket_width} ("
                ),
                nb.cast("string"),
                F.lit(
                    ") — raise bucket_width toward the typical interval "
                    "length, or raise max_fanout deliberately"
                ),
            )
        ).cast("long"),
    ).otherwise(nb)
    iv = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn("_nb", guarded)
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / bucket_width),
                    F.floor(F.col(start_col) / bucket_width) + F.col("_nb") - 1,
                )
            ),
        )
        .drop("_nb")
    )
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / bucket_width))
    return (
        pt.join(iv, [*keys, "_bucket"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
