"""Structured Streaming: incremental geotag ingest + windowed event rollups.

The reference is batch-only, but its resumable batch semantics
(/root/reference/landlensdb/handlers/cloud.py:447-695) map directly onto
Structured Streaming's checkpointing: a parquet-dir source consumed with
``availableNow`` gives exactly-once incremental runs of the SAME DataFrame
pipeline used in batch (extract -> index -> join), which is how the engine
ingests a continuously-crawled pages feed at scale.

Windowed aggregation (watermark + tumbling window) covers the late-data
case for the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_pages(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source stream over a growing parquet directory."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a watermark
    for late data. Works on both batch and streaming DataFrames."""
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the cast
    # is a pure type change
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str
):
    """Drain everything currently available into an in-memory sink and stop
    — the incremental-batch execution mode (exactly-once per file via the
    streaming checkpoint, resumable like cloud.py:483-496)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not _has_agg(stream_df) else "complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()
