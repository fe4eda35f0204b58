"""Idempotent per-partition checkpoint / lineage table.

Generalizes the reference's resumable downloader state
(/root/reference/landlensdb/handlers/cloud.py:483-545, :677-679): a JSON
status cache reloaded on start, permanently-failed ids never retried, and
per-batch persistence so a crash loses at most one batch. The Spark-native
shape (FIXTURES.md §5):

- a checkpoint table ``(run_id, stage, unit_id, partition_id, rows_in,
  rows_out, status, ts)`` written once per processed unit (Iceberg table when
  a catalog is configured; parquet append-dir otherwise — identical module
  interface);
- resume = ``left_anti`` join of the work list against units with
  ``status='success'`` (the anti-membership filters of cloud.py:531-542);
- ``failed_permanent`` units are excluded from retries forever
  (cloud.py:608-610: a 404 is permanent);
- metrics per stage = row-count aggregation over the same table (the
  reference's per-batch success-rate prints, cloud.py:677-691).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = (
    "run_id string, stage string, unit_id long, partition_id int, "
    "rows_in long, rows_out long, status string, ts double"
)

SUCCESS = "success"
FAILED_TEMPORARY = "failed_temporary"
FAILED_PERMANENT = "failed_permanent"


class CheckpointTable:
    """Parquet-append-backed checkpoint store (Iceberg-shaped interface)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)

    def log(self, rows: list[tuple]) -> None:
        """Append (run_id, stage, unit_id, partition_id, rows_in, rows_out,
        status) tuples; ts stamped here. One snapshot per call = the
        per-batch commit granularity of the reference."""
        ts = time.time()
        df = self.spark.createDataFrame(
            [(*r, ts) for r in rows], CHECKPOINT_SCHEMA
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    def completed_units(self, stage: str) -> DataFrame:
        """unit_ids already succeeded OR permanently failed — never re-run
        (cloud.py:531-542)."""
        return (
            self.read()
            .filter(
                (F.col("stage") == stage)
                & F.col("status").isin(SUCCESS, FAILED_PERMANENT)
            )
            .select("unit_id")
            .distinct()
        )

    def pending(self, work: DataFrame, stage: str, unit_col: str) -> DataFrame:
        """Resume filter: anti-join the work list against completed units."""
        done = self.completed_units(stage).withColumnRenamed("unit_id", unit_col)
        return work.join(F.broadcast(done), unit_col, "left_anti")

    def metrics(self, run_id: str | None = None) -> DataFrame:
        """Per-stage lineage metrics (rows in/out, unit status counts)."""
        df = self.read()
        if run_id is not None:
            df = df.filter(F.col("run_id") == run_id)
        return df.groupBy("stage", "status").agg(
            F.count("*").alias("units"),
            F.sum("rows_in").alias("rows_in"),
            F.sum("rows_out").alias("rows_out"),
        )


def run_stage(
    ckpt: CheckpointTable,
    stage: str,
    work: DataFrame,
    unit_col: str,
    process: "callable",
    run_id: str | None = None,
) -> DataFrame | None:
    """Execute ``process(pending_work) -> (result_df, rows_in, rows_out)``
    over not-yet-completed units, then log one success row per unit.

    Returns the result DataFrame (None when nothing is pending — the
    skip-existing fast path of cloud.py:510-516).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    pending = ckpt.pending(work, stage, unit_col)
    unit_rows = pending.groupBy(unit_col).count().collect()
    if not unit_rows:
        return None
    result, per_unit_out = process(pending)
    ckpt.log(
        [
            (run_id, stage, int(r[unit_col]), 0, int(r["count"]),
             int(per_unit_out.get(r[unit_col], 0)), SUCCESS)
            for r in unit_rows
        ]
    )
    return result
