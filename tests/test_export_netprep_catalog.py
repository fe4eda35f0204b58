"""Edge exports (SVG/popup/map), network prep chain, spatial catalog writes."""

from __future__ import annotations

import base64

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark import export, network_prep, synth
from landlensdb_spark.catalog import merge_by_key, read_bbox, write_spatial


def test_svg_arrow_and_popup():
    url = export.svg_arrow(45.0)
    assert url.startswith("data:image/svg+xml;base64,")
    svg = base64.b64decode(url.split(",", 1)[1]).decode()
    assert 'rotate(45.0' in svg
    pop = export.popup_html({"url": "u1", "lat": 1.5, "x<y": "a&b"})
    assert "<b>u1</b>" in pop and "x&lt;y" in pop and "a&amp;b" in pop


def test_render_map_html():
    recs = [
        {"url": f"u{i}", "lon": -74.0 + i * 0.01, "lat": 40.7, "angle": i * 30.0}
        for i in range(10)
    ]
    page = export.render_map_html(recs, angle_key="angle")
    assert page.count("<g transform") == 10
    assert "10 records" in page
    assert export.render_map_html([]) == "<html><body>empty</body></html>"


def test_network_prep_chain():
    lines = [
        (0, [[0.0, 0.0], [1.0, 0.0]]),
        (1, [[1.0, 0.0], [1.0, 1.0]]),          # connected to 0
        (2, [[0.0, 0.0], [1.0, 0.0]]),          # duplicate of 0 -> dropped
        (3, [[5.0, 5.0], [6.0, 5.0]]),          # isolated -> dropped by LCC
        (4, [[1.0, 1.0], [1.0, 1.0]]),          # degenerate -> dropped
        (5, [[1.0, 1.0], [1.0, 1.0], [2.0, 1.0]]),  # dup vertex collapsed, connected
    ]
    out = network_prep.prepare_network(lines)
    ids = sorted(lid for lid, _ in out)
    assert ids == [0, 1, 5]
    for lid, coords in out:
        if lid == 5:
            assert coords == [[1.0, 1.0], [2.0, 1.0]]


def test_spatial_write_and_bbox_read(spark, tmp_path):
    path = str(tmp_path / "geo_tbl")
    pts = spark.range(20000).select(
        F.col("id").alias("key"),
        synth.lon_col(F.col("id")).alias("lon"),
        synth.lat_col(F.col("id")).alias("lat"),
    )
    write_spatial(pts, path, num_files=8)
    got = read_bbox(spark, path, -30.0, -20.0, 30.0, 45.0)
    i = np.arange(20000)
    lon, lat = synth.np_lon(i), synth.np_lat(i)
    want = int(((lon >= -30) & (lon <= 30) & (lat >= -20) & (lat <= 45)).sum())
    assert got.count() == want
    # pushed filters actually reach the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(cell" in plan
    # files cover disjoint tight cell ranges (the sort order is the index)
    files = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    ).groupBy("f").agg(F.min("cell").alias("lo"), F.max("cell").alias("hi")).collect()
    ranges = sorted((r["lo"], r["hi"]) for r in files)
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2  # non-overlapping


def test_merge_by_key(spark, tmp_path):
    path = str(tmp_path / "merge_tbl")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_by_key(spark, path, first, "k")
    second = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    merge_by_key(spark, path, second, "k", conflict="update")
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "C")}


def test_write_gpkg_spec_tables_and_geometry(spark, tmp_path):
    """GPKG sink: application_id/user_version pragmas, the three required
    spec tables, bounds in gpkg_contents, and per-row GeoPackageBinary
    headers wrapping the exact point WKB."""
    import sqlite3
    import struct

    from landlensdb_spark.export import write_gpkg
    from landlensdb_spark.geo.wkb import point_wkb

    df = spark.createDataFrame(
        [(1, "a", -74.0, 40.7), (2, "b", 139.7, 35.7), (3, "c", 2.35, 48.85)],
        "pid long, name string, lon double, lat double",
    )
    path = str(tmp_path / "out.gpkg")
    assert write_gpkg(df, path, layer="pts") == 3

    con = sqlite3.connect(path)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    assert con.execute("PRAGMA user_version").fetchone()[0] == 10300
    tables = {
        r[0]
        for r in con.execute("SELECT name FROM sqlite_master WHERE type='table'")
    }
    assert {
        "gpkg_spatial_ref_sys",
        "gpkg_contents",
        "gpkg_geometry_columns",
        "pts",
    } <= tables
    row = con.execute(
        "SELECT data_type, min_x, min_y, max_x, max_y, srs_id FROM gpkg_contents"
    ).fetchone()
    assert row == ("features", -74.0, 35.7, 139.7, 48.85, 4326)
    assert con.execute("SELECT geometry_type_name, srs_id FROM gpkg_geometry_columns").fetchone() == ("POINT", 4326)
    rows = con.execute('SELECT pid, name, geom FROM "pts" ORDER BY pid').fetchall()
    assert [(r[0], r[1]) for r in rows] == [(1, "a"), (2, "b"), (3, "c")]
    blob = rows[0][2]
    assert blob[:2] == b"GP" and blob[3] == 0x03
    assert struct.unpack("<i", blob[4:8])[0] == 4326
    assert struct.unpack("<4d", blob[8:40]) == (-74.0, -74.0, 40.7, 40.7)
    assert bytes(blob[40:]) == point_wkb(-74.0, 40.7)
    con.close()


def test_write_gpkg_null_coords_and_container_columns(spark, tmp_path):
    """NULL lon/lat -> NULL geometry row (not a crash); array columns
    serialize as JSON text (review findings, round 3)."""
    import sqlite3

    from landlensdb_spark.export import write_gpkg

    df = spark.createDataFrame(
        [
            (1, ["t1", "t2"], -74.0, 40.7),
            (2, ["x"], None, None),
        ],
        "pid long, tags array<string>, lon double, lat double",
    )
    path = str(tmp_path / "nulls.gpkg")
    assert write_gpkg(df, path, layer="pts") == 2
    con = sqlite3.connect(path)
    rows = con.execute('SELECT pid, tags, geom FROM "pts" ORDER BY pid').fetchall()
    assert rows[0][1] == '["t1", "t2"]' and rows[0][2] is not None
    assert rows[1][2] is None
    # bounds computed from the one valid point only
    assert con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
    ).fetchone() == (-74.0, 40.7, -74.0, 40.7)
    con.close()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key/count must equi-join with ZERO
    Exchange nodes — the co-located-join layout that removes the dominant
    shuffle from fact-to-fact joins at corpus scale."""
    import re

    from pyspark.sql import functions as F

    from landlensdb_spark.catalog import read_table, write_bucketed

    a = spark.range(5000).select(
        F.col("id").alias("url_id"), (F.col("id") % 97).alias("feat")
    )
    b = spark.range(5000).select(
        F.col("id").alias("url_id"), (F.col("id") % 13).alias("label")
    )
    write_bucketed(a, "bk_a", "url_id", n_buckets=8, sort_by="url_id")
    write_bucketed(b, "bk_b", "url_id", n_buckets=8, sort_by="url_id")
    try:
        joined = read_table(spark, "bk_a").join(read_table(spark, "bk_b"), "url_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
        assert n_exchange == 0, f"bucketed join shuffled:\n{plan}"
        assert joined.count() == 5000
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_compact_dir_reduces_files(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from landlensdb_spark.catalog import compact_dir

    path = str(tmp_path / "many")
    spark.range(10_000).select(F.col("id"), (F.col("id") % 7).alias("x")).repartition(
        40
    ).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 40
    compact_dir(spark, path, target_file_bytes=1 << 30)
    assert len(glob.glob(path + "/*.parquet")) == 1
    out = spark.read.parquet(path)
    assert out.count() == 10_000 and set(out.columns) == {"id", "x"}


def test_snapshot_versions_and_time_travel(spark, tmp_path):
    import pytest as _pytest

    from landlensdb_spark.catalog import snapshot_read, snapshot_upsert, snapshot_write

    path = str(tmp_path / "snap")
    v1 = snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path, "init"
    )
    assert v1 == 1
    v2 = snapshot_upsert(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        key="k",
    )
    assert v2 == 2
    latest = {r["k"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert latest == {1: "a", 2: "B", 3: "c"}
    # time travel: version 1 is unchanged
    old = {r["k"]: r["v"] for r in snapshot_read(spark, path, version=1).collect()}
    assert old == {1: "a", 2: "b"}
    with _pytest.raises(ValueError, match="not in"):
        snapshot_read(spark, path, version=9)


def test_snapshot_diff_classes_and_null_handling(spark, tmp_path):
    """added/removed/changed classification, unchanged rows omitted, and
    the null-vs-value fingerprint distinction (xxhash64 alone would treat
    a NULL column as absent)."""
    import pytest as _pytest

    from landlensdb_spark.catalog import snapshot_diff, snapshot_write

    path = str(tmp_path / "snap")
    snapshot_write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
            "k long, v string, n long",
        ),
        path,
        "v1",
    )
    snapshot_write(
        spark.createDataFrame(
            # 1 unchanged; 2 value change; 3 null -> value; 4 removed; 5 added
            [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
            "k long, v string, n long",
        ),
        path,
        "v2",
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(spark, path, "k", 1, 2).collect()
    }
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    # schema drift fails loudly
    snapshot_write(
        spark.createDataFrame([(1, "a")], "k long, v string"), path, "v3"
    )
    with _pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(spark, path, "k", 1, 3)


def test_compact_dir_recovers_from_crash_leftovers(spark, tmp_path):
    """Stale .tmp/.old dirs (crash windows) must not wedge compaction, and
    a missing live dir with an .old present rolls back."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from landlensdb_spark.catalog import compact_dir

    path = str(tmp_path / "t")
    spark.range(100).repartition(5).write.parquet(path)
    # simulate a crash that left both stale dirs behind
    shutil.copytree(path, path + ".compact.tmp")
    shutil.copytree(path, path + ".compact.old")
    compact_dir(spark, path, target_file_bytes=1 << 30)
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".compact.old")
    assert spark.read.parquet(path).count() == 100
    # simulate the crash BETWEEN the two renames: live dir gone, .old kept
    os.rename(path, path + ".compact.old")
    compact_dir(spark, path, target_file_bytes=1 << 30)
    assert spark.read.parquet(path).count() == 100


def test_compact_preserves_spatial_clustering(spark, tmp_path):
    """Compacting a write_spatial table must keep the cell sort (the
    row-group-stats index read_bbox depends on)."""
    from pyspark.sql import functions as F

    from landlensdb_spark.catalog import compact_dir, write_spatial

    path = str(tmp_path / "spatial")
    pts = spark.range(2000).select(
        F.col("id").alias("key"),
        ((F.col("id") % 360) - 180.0 + 0.5).alias("lon"),
        ((F.col("id") % 160) - 80.0 + 0.5).alias("lat"),
    )
    write_spatial(pts, path, num_files=8)
    compact_dir(spark, path, target_file_bytes=1 << 30)
    # one file, still sorted by cell within it
    cells = [r["cell"] for r in spark.read.parquet(path).collect()]
    # per-file sort: read back preserves within-file order for a single file
    assert cells == sorted(cells)


def test_snapshot_write_retries_after_crash(spark, tmp_path):
    """An orphan v-dir (crashed write, manifest never committed) must be
    reclaimed by the retry, not wedge the table forever."""
    from landlensdb_spark.catalog import snapshot_read, snapshot_write

    path = str(tmp_path / "snap2")
    snapshot_write(spark.createDataFrame([(1,)], "k long"), path)
    # orphan v=00002 with no manifest entry (simulated crash)
    spark.createDataFrame([(99,)], "k long").write.parquet(str(tmp_path / "snap2" / "v=00002"))
    v = snapshot_write(spark.createDataFrame([(2,)], "k long"), path)
    assert v == 2
    assert {r["k"] for r in snapshot_read(spark, path).collect()} == {2}
