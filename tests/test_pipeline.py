"""Staged pipeline job: crash mid-run, resume, identical output, no rework."""

from __future__ import annotations

from pyspark.sql import functions as F

from landlensdb_spark import synth, tables
from landlensdb_spark.checkpoint import CheckpointTable
from landlensdb_spark.pipeline import STAGE, run_geo_pipeline


def _rows(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .select("url", "admin_id", "tile_x", "tile_y")
        .collect()
    )


def test_pipeline_resume_idempotent(spark, tmp_path):
    pages = tables.pages(spark, 2000, clustered=True, num_partitions=8)
    polys = synth.admin_polygons(spark)

    # reference run: single uninterrupted pass
    ref_out = str(tmp_path / "ref")
    ref_ckpt = CheckpointTable(spark, str(tmp_path / "ref_ckpt"))
    m0 = run_geo_pipeline(spark, pages, polys, ref_out, ref_ckpt, n_buckets=8)
    assert m0["processed_units"] == 8 and not m0["resumed"]

    # crashed run: buckets {5, 6, 7} never complete in attempt 1
    out = str(tmp_path / "out")
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    m1 = run_geo_pipeline(
        spark, pages, polys, out, ckpt, n_buckets=8, fail_buckets={5, 6, 7}
    )
    assert m1["processed_units"] == 5

    # resume: only the 3 missing buckets are pending and processed
    m2 = run_geo_pipeline(spark, pages, polys, out, ckpt, n_buckets=8)
    assert m2["resumed"]
    assert m2["pending_before"] == 3 and m2["processed_units"] == 3

    # identical final table, lineage row per bucket, third run is a no-op
    assert _rows(spark, out) == _rows(spark, ref_out)
    lineage = ckpt.read().filter(F.col("stage") == STAGE)
    assert lineage.count() == 8
    assert lineage.filter(F.col("rows_in") <= 0).count() == 0
    m3 = run_geo_pipeline(spark, pages, polys, out, ckpt, n_buckets=8)
    assert m3["processed_units"] == 0 and m3["pending_before"] == 0


def test_pipeline_lineage_row_counts(spark, tmp_path):
    pages = tables.pages(spark, 1000, num_partitions=4)
    polys = synth.admin_polygons(spark)
    out = str(tmp_path / "out")
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    run_geo_pipeline(spark, pages, polys, out, ckpt, n_buckets=4)
    lineage = ckpt.read()
    # rows_in sums to the full page count; rows_out to the joined table size
    agg = lineage.agg(
        F.sum("rows_in").alias("rin"), F.sum("rows_out").alias("rout")
    ).collect()[0]
    assert agg.rin == 1000
    assert agg.rout == spark.read.parquet(out).count()
