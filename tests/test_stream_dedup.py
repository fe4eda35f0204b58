"""Streaming dedup: incremental drain keeps one record per url; batch twin
is the exact first-by-ts; state is watermark-bounded by construction."""

from __future__ import annotations

from landlensdb_spark.streaming.dedup import dedup_batch, dedup_stream


SCHEMA = "url string, warc_ts timestamp, payload string"


def _rows(spark, rows):
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(rows, "url string, warc_ts string, payload string")
    return raw.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def test_batch_dedup_first_by_ts(spark):
    df = _rows(
        spark,
        [
            ("u1", "2024-01-01 00:00:05", "late"),
            ("u1", "2024-01-01 00:00:01", "first"),
            ("u2", "2024-01-01 00:00:02", "only"),
        ],
    )
    got = {r["url"]: r["payload"] for r in dedup_batch(df).collect()}
    assert got == {"u1": "first", "u2": "only"}


def _drain_to_parquet(stream, out, ckpt):
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """Dedup state survives between availableNow drains via the streaming
    checkpoint (append-mode parquet sink — the exactly-once path)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _rows(
        spark,
        [
            ("u1", "2024-01-01 00:00:01", "a"),
            ("u2", "2024-01-01 00:00:02", "b"),
        ],
    ).write.mode("append").parquet(src)
    stream = dedup_stream(spark.readStream.schema(SCHEMA).parquet(src))
    assert stream.isStreaming
    _drain_to_parquet(stream, out, ckpt)
    got1 = {r["url"]: r["payload"] for r in spark.read.parquet(out).collect()}
    assert got1 == {"u1": "a", "u2": "b"}

    # second drain: duplicate u1 (inside watermark) suppressed, new u3 kept
    _rows(
        spark,
        [
            ("u1", "2024-01-01 00:00:03", "dup"),
            ("u3", "2024-01-01 00:00:04", "c"),
        ],
    ).write.mode("append").parquet(src)
    stream2 = dedup_stream(spark.readStream.schema(SCHEMA).parquet(src))
    _drain_to_parquet(stream2, out, ckpt)
    got2 = {r["url"]: r["payload"] for r in spark.read.parquet(out).collect()}
    assert got2 == {"u1": "a", "u2": "b", "u3": "c"}, got2


def test_stream_plan_has_bounded_state_operator(spark, tmp_path):
    """The plan must use dropDuplicatesWithinWatermark (watermark-expiring
    state), not the unbounded dropDuplicates variant."""
    src = str(tmp_path / "src2")
    _rows(spark, [("u1", "2024-01-01 00:00:01", "a")]).write.parquet(src)
    stream = dedup_stream(spark.readStream.schema(SCHEMA).parquet(src))
    plan = stream._jdf.queryExecution().logical().toString()
    assert "WithinWatermark" in plan, plan


def test_corpus_ops_compose_into_streams(spark, tmp_path):
    """The batch corpus operators (quality gate, PII scrub) are narrow
    column transforms, so the SAME functions run unchanged inside a
    Structured Streaming plan — readStream -> scrub -> filter -> parquet
    sink with availableNow, the incremental corpus-prep shape."""
    from pyspark.sql import functions as F

    from landlensdb_spark.operators.pii import scrub_pii
    from landlensdb_spark.operators.textstats import quality_score

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "the cat and the dog sat, together. mail me at a@b.example.com please."),
        (2, "x"),  # low quality -> gated out
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    prepped = scrub_pii(stream).withColumn(
        "quality", quality_score(F.col("text"))
    ).filter(F.col("quality") >= 0.1).select("doc_id", "n_email", "redacted")
    q = (
        prepped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1
    assert got[0]["n_email"] == 1 and "[EMAIL]" in got[0]["redacted"]
