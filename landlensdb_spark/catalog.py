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


def compact_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dir into ~target-sized
    files. Returns the new file count.

    Long-running incremental pipelines (merge_by_key, streaming sinks)
    accrete many small files; at scan time each costs an open + footer
    read and caps split packing. Standard maintenance: size the rewrite
    from the ACTUAL on-disk bytes, rewrite, swap (tmp dir + rename
    locally; on an object store the same two-phase commit).

    ``cluster_by`` preserves a sorted/clustered layout through the
    rewrite (range partition + in-file sort on that column); it defaults
    to the ``cell`` column when present, so compacting a write_spatial
    table keeps the row-group-stats spatial index read_bbox depends on.

    Crash safety: the two renames are not jointly atomic on a local FS,
    so entry-time RECOVERY handles every crash window — a leftover
    ``.compact.old`` with no live dir is restored, stale ``.tmp``/``.old``
    dirs are removed — and repeated runs never wedge.
    """
    import math
    import os
    import shutil

    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crashed between the two renames: roll back
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(math.ceil(total / target_file_bytes), 1)
    df = spark.read.parquet(path)
    if cluster_by is None and "cell" in df.columns:
        cluster_by = "cell"
    if cluster_by is not None:
        out = df.repartitionByRange(n_files, F.col(cluster_by)).sortWithinPartitions(
            cluster_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def snapshot_write(
    df: DataFrame, path: str, note: str = ""
) -> int:
    """Append a new immutable snapshot version under ``path/v=N`` and
    update ``manifest.json`` — the mini-lakehouse layout behind the
    reference's local-store sync (every sync is a new consistent version;
    readers never see partial writes because the manifest is updated only
    after the version dir is complete). Returns the new version number.
    """
    import json
    import os

    os.makedirs(path, exist_ok=True)
    manifest_path = os.path.join(path, "manifest.json")
    manifest = {"versions": []}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    version = (manifest["versions"][-1]["version"] + 1) if manifest["versions"] else 1
    vdir = os.path.join(path, f"v={version:05d}")
    # overwrite, not errorifexists: a version dir NOT in the manifest is an
    # uncommitted leftover from a crashed write (the manifest swap below is
    # the commit point), and a retry must be able to reclaim it
    df.write.mode("overwrite").parquet(vdir)
    n_rows = df.sparkSession.read.parquet(vdir).count()
    manifest["versions"].append(
        {"version": version, "rows": n_rows, "note": note}
    )
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, manifest_path)  # atomic manifest swap = the commit
    return version


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot table at the latest (default) or an explicit
    version — time travel over the ``v=N`` layout."""
    import json
    import os

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    known = [v["version"] for v in manifest["versions"]]
    if not known:
        raise ValueError("snapshot table has no committed versions")
    v = version if version is not None else known[-1]
    if v not in known:
        raise ValueError(f"version {v} not in {known}")
    return spark.read.parquet(os.path.join(path, f"v={v:05d}"))


def snapshot_diff(
    spark: SparkSession,
    path: str,
    key: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental consumption between two snapshot versions: (key,
    change) rows with change in {'added', 'removed', 'changed'} —
    unchanged keys are omitted, so a downstream sync processes only the
    delta (the Iceberg incremental-read idea over the ``v=N`` layout; the
    reference re-downloads the full remote set every sync,
    /root/reference/landlensdb/handlers/cloud.py:430-447).

    Scale shape: each side is projected to (key, 8-byte row fingerprint)
    BEFORE the full-outer equi-join, so the shuffle carries 16 bytes/row
    instead of full rows no matter how wide the table. The fingerprint is
    xxhash64 over every non-key column INTERLEAVED with its isNull flag
    (xxhash64 skips null inputs, so without the flags a NULL column would
    be indistinguishable from an absent one)."""
    new = snapshot_read(spark, path, to_version)
    old = snapshot_read(spark, path, from_version)
    cols = [c for c in new.columns if c != key]
    # compare (name, type) pairs: a type change alone (int -> bigint)
    # hashes every value differently and would silently mark the whole
    # table 'changed' if only names were checked
    if [(c, t) for c, t in old.dtypes if c != key] != [
        (c, t) for c, t in new.dtypes if c != key
    ]:
        raise ValueError("snapshot schemas differ — diff is key-compatible only")

    def _fp(df: DataFrame, out: str) -> DataFrame:
        parts: list = []
        for c in cols:
            parts += [F.col(c), F.col(c).isNull()]
        return df.select(F.col(key), F.xxhash64(*parts).alias(out))

    j = _fp(old, "_ofp").join(_fp(new, "_nfp"), key, "full_outer")
    return (
        j.select(
            key,
            F.when(F.col("_ofp").isNull(), F.lit("added"))
            .when(F.col("_nfp").isNull(), F.lit("removed"))
            .when(F.col("_ofp") != F.col("_nfp"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def snapshot_upsert(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    key: str,
    conflict: str = "update",
    note: str = "",
) -> int:
    """Incremental sync as a NEW snapshot version: latest ∪ incoming by
    key (upsert semantics), committed via snapshot_write — the versioned
    twin of merge_by_key (old versions stay readable; time travel is the
    audit trail the reference's destructive local sync lacks)."""
    import os

    from landlensdb_spark.dsl import upsert

    if not os.path.exists(os.path.join(path, "manifest.json")):
        return snapshot_write(incoming, path, note)
    existing = snapshot_read(spark, path)
    return snapshot_write(upsert(existing, incoming, key, conflict), path, note)
