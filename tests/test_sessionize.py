"""Gap-sessionization: batch window twin vs applyInPandasWithState stream."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from landlensdb_spark.streaming.events import (
    SESSION_SCHEMA,
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_batch_sessionize_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 10, "view", 2.0, "{}"),
        (3, "2024-01-01 01:10:00", 10, "view", 4.0, "{}"),  # > 30min gap -> new
        (4, "2024-01-01 00:05:00", 20, "click", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    )
    out = sessionize_batch(df, gap_minutes=30).orderBy("user_id", "session_start")
    got = [
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in out.collect()
    ]
    assert got == [
        (10, "2024-01-01 00:00:00", 2, 3.0),
        (10, "2024-01-01 01:10:00", 1, 4.0),
        (20, "2024-01-01 00:05:00", 1, 8.0),
    ]


def test_stream_sessions_match_batch(spark, tmp_path):
    """Every CLOSED session the stateful streaming operator emits must be
    byte-equal to a session of the batch twin on the same input."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    events.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("sess").toPandas()

    batch = sessionize_batch(events, gap_minutes=30).toPandas()
    key = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    b = set(map(tuple, batch[key].itertuples(index=False)))
    s = list(map(tuple, streamed[key].itertuples(index=False)))
    assert len(s) > 0, "stream emitted no closed sessions"
    missing = [row for row in s if row not in b]
    assert not missing, f"streamed sessions not in batch result: {missing[:5]}"


def test_streaming_geo_tiles_matches_batch(spark, tmp_path):
    """North-star pipeline as a stream == the batch run, incl. incremental
    exactly-once: files added between availableNow drains are each counted
    once."""
    from pyspark.sql import functions as F

    from landlensdb_spark import synth, tables
    from landlensdb_spark.operators.fused import extract_pip
    from landlensdb_spark.operators.tiles import assign_tiles
    from landlensdb_spark.streaming.events import run_available_now, streaming_geo_tiles

    pages_dir = str(tmp_path / "pages")
    polys = synth.admin_polygons(spark)
    tables.pages(spark, 1200, clustered=True, num_partitions=3).write.mode(
        "append"
    ).parquet(pages_dir)

    stream = streaming_geo_tiles(spark, pages_dir, polys, zoom=12)
    ck = str(tmp_path / "ck")
    run_available_now(stream, ck, "geo_tiles_1")
    got1 = spark.sql("SELECT * FROM geo_tiles_1")

    batch_pages = spark.read.parquet(pages_dir)
    want1 = (
        assign_tiles(extract_pip(batch_pages, polys, keep=["url"]), zoom=12)
        .groupBy("admin_id", "tile_x", "tile_y")
        .count()
    )
    key = ["admin_id", "tile_x", "tile_y", "count"]
    assert sorted(map(tuple, got1.select(*key).collect())) == sorted(
        map(tuple, want1.select(*key).collect())
    )

    # incremental drain: new files only, counts roll up to the full total
    tables.pages(spark, 2000, clustered=True, num_partitions=2).filter(
        "url > 'https://example.org/page/00001199'"
    ).write.mode("append").parquet(pages_dir)
    stream2 = streaming_geo_tiles(spark, pages_dir, polys, zoom=12)
    run_available_now(stream2, ck, "geo_tiles_2")
    got2 = spark.sql("SELECT * FROM geo_tiles_2")
    want2 = (
        assign_tiles(
            extract_pip(spark.read.parquet(pages_dir), polys, keep=["url"]), zoom=12
        )
        .groupBy("admin_id", "tile_x", "tile_y")
        .count()
    )
    assert sorted(map(tuple, got2.select(*key).collect())) == sorted(
        map(tuple, want2.select(*key).collect())
    )


def test_tile_rollup_stream_matches_batch(spark, tmp_path):
    """The spatio-temporal tile rollup must produce identical (window,
    tile, n) rows under Structured Streaming (availableNow + checkpoint,
    watermarked state) and in batch on the same input."""
    from landlensdb_spark import synth
    from landlensdb_spark.streaming.events import run_available_now, tile_rollup

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = F.col("event_id")
    pts = events.select(
        "ts", synth.lon_col(k).alias("lon"), synth.lat_col(k).alias("lat")
    )
    src = str(tmp_path / "src")
    pts.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(pts.schema).parquet(src)
    rolled = tile_rollup(stream, zoom=10, window="1 hour", watermark="2 hours")
    run_available_now(rolled, str(tmp_path / "ck"), "tiles_stream")
    key = ["win_start", "win_end", "tile_x", "tile_y", "n"]
    got = sorted(map(tuple, spark.table("tiles_stream").select(*key).collect()))

    want = sorted(
        map(tuple, tile_rollup(pts, zoom=10, window="1 hour").select(*key).collect())
    )
    assert got == want and len(got) > 0
