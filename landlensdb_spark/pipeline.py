"""End-to-end geo pipeline job: staged, checkpointed, idempotently resumable.

The north-star job shape — "every stage writes per-partition lineage +
row-count metrics to a checkpoint table so runs resume idempotently" — over
the engine's headline operators. The reference's equivalent is the resumable
downloader state machine (/root/reference/landlensdb/handlers/cloud.py:483-545:
status cache reloaded on start, done work skipped, per-batch persistence);
here the unit of resume is an input *bucket* (a deterministic hash range of
urls), so a re-run after a crash:

1. reads the checkpoint table, anti-joins completed buckets (zero recompute),
2. processes only pending buckets through extract -> PIP -> tile,
3. writes results partitioned BY BUCKET with dynamic partition overwrite
   (a re-run never duplicates rows: only this attempt's bucket directories
   are replaced, so even a bucket retried after a partial write + checkpoint
   miss lands exactly once),
4. logs (run_id, stage, unit, rows_in, rows_out) lineage per bucket.

Scale shape: buckets are hash ranges, so the work split is deterministic and
uniform; each attempt is one Spark job over only the pending fraction; the
checkpoint table stays tiny (O(buckets)) and the anti-join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landlensdb_spark.checkpoint import SUCCESS, CheckpointTable
from landlensdb_spark.operators.fused import extract_pip
from landlensdb_spark.operators.tiles import assign_tiles

STAGE = "extract_pip_tile"


def run_geo_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    polygons: DataFrame,
    out_path: str,
    ckpt: CheckpointTable,
    n_buckets: int = 16,
    run_id: str | None = None,
    fail_buckets: set[int] | None = None,
    zoom: int = 14,
    bucket_expr=None,
) -> dict:
    """Run (or resume) the headline pipeline; returns per-run metrics.

    ``fail_buckets`` injects a crash after those buckets would have been
    processed — the idempotency test kills a run mid-way and asserts the
    resumed run produces the identical final table with no duplicate work.
    ``bucket_expr`` overrides the default xxhash64 url bucketing with any
    deterministic int Column in [0, n_buckets) — e.g. a SQL-reproducible
    key for cross-engine lineage verification.
    """
    import uuid

    run_id = run_id or uuid.uuid4().hex[:12]
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets))
    bucketed = pages.withColumn("_bucket", bucket_expr.cast("int"))
    work = bucketed.select("_bucket").distinct().withColumnRenamed("_bucket", "unit")
    pending = [r.unit for r in ckpt.pending(work, STAGE, "unit").collect()]
    done: list[tuple] = []
    processed_rows = 0
    if pending:
        todo = sorted(pending)
        if fail_buckets:
            # simulate a crash: this attempt only reaches the allowed prefix
            todo = [b for b in todo if b not in fail_buckets]
        if todo:
            part = bucketed.filter(F.col("_bucket").isin([int(b) for b in todo]))
            joined = extract_pip(
                part, polygons, keep=["url", "lang", "_bucket"]
            )
            tiled = assign_tiles(joined, zoom=zoom)
            # dynamic partition overwrite: only the bucket directories in
            # THIS write are replaced, so a bucket retried after a partial
            # write + checkpoint miss lands exactly once (idempotent retry)
            (
                tiled.repartition("_bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_bucket")
                .parquet(out_path)
            )
            # per-bucket lineage: rows_in (pages) and rows_out (tile rows)
            rows_in = {
                r["_bucket"]: r["count"]
                for r in part.groupBy("_bucket").count().collect()
            }
            rows_out = {
                r["_bucket"]: r["count"]
                for r in spark.read.parquet(out_path)
                .filter(F.col("_bucket").isin([int(b) for b in todo]))
                .groupBy("_bucket")
                .count()
                .collect()
            }
            done = [
                (
                    run_id,
                    STAGE,
                    int(b),
                    int(b),
                    int(rows_in.get(b, 0)),
                    int(rows_out.get(b, 0)),
                    SUCCESS,
                )
                for b in todo
            ]
            ckpt.log(done)
            processed_rows = sum(rows_in.values())
    return {
        "run_id": run_id,
        "pending_before": len(pending),
        "processed_units": len(done),
        "processed_rows": processed_rows,
        "resumed": len(pending) < n_buckets,
    }
