"""Skew handling: salted repartitioning on cell prefix + AQE knobs.

Dense urban cells are the geospatial skew case (the north rule calls it out
explicitly; the synthetic bench field puts 60% of points in 3 cells). Two
mechanisms, composable:

1. AQE skew-join splitting (enabled in session.py) — handles skewed *joins*
   automatically by splitting oversized shuffle partitions.
2. Deterministic salting for skewed *aggregations/repartitions*: the
   partition key becomes (cell_prefix, hash(stable_key) % n_salts) so one
   hot cell fans out across n_salts reducers. Salts derive from a stable row
   key — never nondeterministic randomness — so retries/resumes stay
   idempotent (SURVEY.md §7 nondeterminism rule).

Two-level aggregation (``salted_agg``) is the classic partial-combine
pattern: aggregate (cell, salt) first — map-side combine already shrinks hot
cells — then re-aggregate by cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_salt(key: Column | str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a stable row key."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key), F.lit(n_salts)).cast("int")


def salted_repartition(
    df: DataFrame,
    cell_col: str,
    stable_key: str,
    n_salts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (cell, salt) so a hot cell spreads over n_salts tasks."""
    salted = df.withColumn("_salt", stable_salt(stable_key, n_salts))
    if num_partitions:
        out = salted.repartition(num_partitions, F.col(cell_col), F.col("_salt"))
    else:
        out = salted.repartition(F.col(cell_col), F.col("_salt"))
    return out.drop("_salt")


def salted_count(
    df: DataFrame, group_col: str, stable_key: str, n_salts: int = 16
) -> DataFrame:
    """Two-level count: groupBy(cell, salt) -> groupBy(cell). The first
    shuffle is uniform even when one cell holds most rows."""
    return (
        df.withColumn("_salt", stable_salt(stable_key, n_salts))
        .groupBy(group_col, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(group_col)
        .agg(F.sum("_partial").alias("n"))
    )


def partition_spread(df: DataFrame) -> tuple[int, int, float]:
    """(min, max, max/mean) of partition row counts — the skew metric the
    tests bound after salting."""
    sizes = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    mean = sum(counts) / len(counts)
    return min(counts), max(counts), max(counts) / mean
