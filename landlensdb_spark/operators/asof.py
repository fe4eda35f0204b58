"""As-of (latest-earlier) join — each left row picks the most recent
right row with ``right_ts <= left_ts`` for the same key.

The reference resolves "state at a point in time" row-at-a-time through
the ORM (e.g. nearest-image lookups around a timestamp and upsert-latest
snapshots, /root/reference/landlensdb/handlers/db.py,
geoclasses/image.py); this is the distributed generalization: a
vectorized temporal join attaching the prevailing right-hand state
(last position fix, last crawl snapshot, last config) to billions of
left events without a range-join explosion.

Shape (default path): the classic union-and-carry plan — tag both sides,
union, one window per key ordered by ``(ts, side)`` carrying the last
non-null right-struct forward, keep left rows. ONE shuffle on the key,
no per-row Python, no range join, no driver loop. Right values travel as
a single STRUCT so all attached columns provably come from the SAME
right row (per-column ``last(ignorenulls)`` could mix rows when a right
column is legitimately null).

Equal timestamps match (``<=``): the right tag sorts before the left tag
at the same instant. Rows per (key, right_ts) must be unique for a
deterministic pick — enforce upstream or pre-aggregate; the events-table
driver query documents this contract.

Scale path (``slice_seconds``): a hot key (one device emitting years of
events) makes the per-key window a single sorted task. Slicing
partitions the window into ``(key, time_slice)`` cells and restores
correctness with a carry-in: per (key, slice) reduce the right side to
its last struct (map-side-combined ``max_by``), build the slice spine =
every (key, slice) either side touches, cumulative-carry the last struct
across earlier slices (a window over the TINY spine, one row per slice),
inject it as a synthetic right row at each slice start, then run the
same union window inside each (key, slice) cell. Every stage is bounded:
cells shrink with the slice, the spine is keys x slices, and the result
is row-identical to the default path (pinned by test and by the driver
oracle, which runs DuckDB's native ASOF JOIN — an independent
implementation, not a SQL transcription of this plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: union tags: carry-in rows sort first within a slice (they encode state
#: from STRICTLY earlier slices), then real right rows, then left rows —
#: so at equal timestamps right state is visible to left rows (<= match).
_SIDE_CARRY, _SIDE_RIGHT, _SIDE_LEFT = -1, 0, 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    values: list[str],
    slice_seconds: int | None = None,
) -> DataFrame:
    """All ``left`` columns plus, from the latest ``right`` row with
    ``right_ts <= left_ts`` per ``key``: ``right_ts`` (named as in
    ``right``) and each of ``values`` — all null when no such row exists.
    ``right_ts`` must not collide with a left column name; rows per
    (key, right_ts) must be unique."""
    overlap = {right_ts, *values} & set(left.columns)
    if overlap:
        raise ValueError(f"asof: right columns {sorted(overlap)} collide with left")
    reserved = {"_ts", "_side", "_slice", "_rv", "_cv", "_m"} & set(
        left.columns + right.columns
    )
    if reserved:
        raise ValueError(f"asof: reserved working columns in input: {sorted(reserved)}")
    rv = F.struct(F.col(right_ts), *[F.col(v) for v in values]).alias("_rv")
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(_SIDE_RIGHT).alias("_side"),
        rv,
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(_SIDE_LEFT).alias("_side"),
    )
    if slice_seconds is None:
        u = l.unionByName(r, allowMissingColumns=True)
        w = (
            Window.partitionBy(key)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        if slice_seconds <= 0:
            raise ValueError(f"asof: slice_seconds must be > 0, got {slice_seconds}")
        sl = lambda ts: F.floor(F.unix_timestamp(ts) / F.lit(slice_seconds))  # noqa: E731
        r = r.withColumn("_slice", sl(F.col("_ts")))
        l = l.withColumn("_slice", sl(F.col("_ts")))
        # last right struct per (key, slice): map-side-combined max_by on
        # the in-slice order (right_ts is unique per key by contract)
        rlast = r.groupBy(key, "_slice").agg(
            F.max_by("_rv", F.col("_ts")).alias("_rv")
        )
        # slice spine = every (key, slice) either side touches; carry-in =
        # last right struct from STRICTLY earlier slices (window over the
        # spine — one row per (key, slice), tiny next to the data)
        spine = (
            l.select(key, "_slice")
            .distinct()
            .unionByName(rlast.select(key, "_slice"))
            .distinct()
            .join(rlast, [key, "_slice"], "left")
        )
        wc = (
            Window.partitionBy(key)
            .orderBy("_slice")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            spine.withColumn("_cv", F.last("_rv", ignorenulls=True).over(wc))
            .filter(F.col("_cv").isNotNull())
            .select(
                key,
                "_slice",
                F.col("_cv").alias("_rv"),
                F.lit(_SIDE_CARRY).alias("_side"),
            )
            .withColumn("_ts", F.timestamp_seconds(F.col("_slice") * slice_seconds))
        )
        u = l.unionByName(r, allowMissingColumns=True).unionByName(
            carry, allowMissingColumns=True
        )
        w = (
            Window.partitionBy(key, "_slice")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    matched = F.last("_rv", ignorenulls=True).over(w)
    out_cols = [*left.columns]
    return (
        u.withColumn("_m", matched)
        .filter(F.col("_side") == _SIDE_LEFT)
        .select(
            *out_cols,
            F.col("_m")[right_ts].alias(right_ts),
            *[F.col("_m")[v].alias(v) for v in values],
        )
    )
