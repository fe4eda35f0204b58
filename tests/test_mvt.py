"""MVT wire-format codec + decode scan: round-trip, semantics, geometry."""

from __future__ import annotations

import math

import numpy as np

from landlensdb_spark.operators.mvt import (
    coverage_features,
    decode_mvt,
    encode_mvt,
    np_tile_lonlat,
    tile_features,
)


def _tile_blob():
    return encode_mvt(
        {
            "image": {
                "extent": 4096,
                "features": [
                    {"id": 7, "points": [(100, 200)], "props": {"captured_at": 1600000000123, "pano": True}},
                    {"id": 8, "points": [(0, 0), (4095, 4095)], "props": {"seq": "abc"}},
                ],
            },
            "sequence": {
                "features": [{"id": 9, "points": [(2048, 1024)], "props": {"w": 2.5}}],
            },
        }
    )


def test_roundtrip_decode():
    rows = decode_mvt(_tile_blob())
    # multipoint explodes to one row per point
    assert [(r[0], r[2], r[3], r[4]) for r in rows] == [
        ("image", 7, 100, 200),
        ("image", 8, 0, 0),
        ("image", 8, 4095, 4095),
        ("sequence", 9, 2048, 1024),
    ]
    by_id = {r[2]: r[5] for r in rows}
    assert by_id[7] == {"captured_at": "1600000000123", "pano": "True"}
    assert by_id[8] == {"seq": "abc"}
    assert by_id[9] == {"w": "2.5"}


def test_unknown_fields_and_nonpoint_skipped():
    blob = _tile_blob()
    # append an unknown top-level varint field (field 9) — must be skipped
    blob = blob + bytes([0x48, 0x05])
    rows = decode_mvt(blob)
    assert len(rows) == 4
    # a LINESTRING feature (type 2) is ignored
    line = encode_mvt({"roads": {"features": [{"id": 1, "points": [(5, 5)]}]}})
    line = line.replace(bytes([0x18, 0x01]), bytes([0x18, 0x02]))  # type 1 -> 2
    assert decode_mvt(line) == []


def test_lonlat_matches_slippy_inverse():
    # px=0, py=0 is exactly the tile's west/north corner (cloud.py:889-911)
    z, x, y = 14, 4823, 6160
    lon, lat = np_tile_lonlat(
        np.array([z], float), np.array([x], float), np.array([y], float),
        np.array([0], float), np.array([0], float), np.array([4096], float),
    )
    n = 2.0**z
    assert lon[0] == round(x / n * 360.0 - 180.0, 6)
    assert lat[0] == round(math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n)))), 6)


def test_tile_features_and_coverage_semantics(spark):
    rows = [
        (14, 4823, 6160, _tile_blob()),
        (5, 10, 11, encode_mvt({"overview": {"features": [{"id": 1, "points": [(10, 10)], "props": {"captured_at": 5}}]}})),
        (14, 4824, 6160, encode_mvt({"overview": {"features": [{"id": 2, "points": [(1, 1)]}]}})),  # wrong layer for z14
    ]
    tiles = spark.createDataFrame(rows, "tile_z int, tile_x long, tile_y long, content binary")
    feats = tile_features(tiles).collect()
    assert len(feats) == 6  # 4 from tile 1 (incl multipoint + sequence), 1 overview, 1 misplaced
    cov = coverage_features(tiles).orderBy("feature_id").collect()
    # the reference's if/elif picks ONE layer per tile: at z14 the PRESENT
    # image layer shadows the sequence layer (cloud.py:730-737); z5 ->
    # overview; misplaced overview@z14 dropped
    assert sorted({(r.layer, r.feature_id) for r in cov}) == [
        ("image", 7), ("image", 8), ("overview", 1),
    ]
    # captured_at range filter keeps unparseable/missing (cloud.py:765-771)
    cov2 = coverage_features(tiles, start_captured_ms=10).collect()
    ids = sorted({(r.layer, r.feature_id) for r in cov2})
    assert ("overview", 1) not in ids  # captured_at=5 < 10 -> dropped
    assert ("image", 8) in ids  # no captured_at -> kept
    assert ("image", 7) in ids  # 1.6e12 >= 10
    # a z6-13 tile has no image branch -> sequence chosen even when an image
    # layer is present in the blob
    mixed = spark.createDataFrame(
        [(9, 5, 5, _tile_blob())],
        "tile_z int, tile_x long, tile_y long, content binary",
    )
    cov3 = coverage_features(mixed).collect()
    assert sorted({(r.layer, r.feature_id) for r in cov3}) == [("sequence", 9)]
    # shadowing by PRESENCE: an empty image layer at z14 still shadows a
    # populated sequence layer (feature list comes back empty, reference
    # cloud.py:730-732)
    shadow = encode_mvt({
        "image": {"features": []},
        "sequence": {"features": [{"id": 42, "points": [(7, 7)]}]},
    })
    t = spark.createDataFrame(
        [(14, 1, 1, shadow)], "tile_z int, tile_x long, tile_y long, content binary"
    )
    assert coverage_features(t).count() == 0


def test_coverage_ingest_bbox_prune_and_dedupe(spark):
    from landlensdb_spark.operators.mvt import coverage_ingest
    from landlensdb_spark import synth

    # duplicate feature id 7 across two adjacent tiles (edge feature)
    t1 = encode_mvt({"image": {"features": [
        {"id": 7, "points": [(4090, 100)], "props": {"captured_at": 100}},
        {"id": 8, "points": [(10, 10)]},
    ]}})
    t2 = encode_mvt({"image": {"features": [
        {"id": 7, "points": [(2, 100)], "props": {"captured_at": 100}},
        {"id": 9, "points": [(500, 500)]},
    ]}})
    far = encode_mvt({"image": {"features": [{"id": 10, "points": [(1, 1)]}]}})
    tiles = spark.createDataFrame(
        [(14, 4823, 6160, t1), (14, 4824, 6160, t2), (14, 5000, 6160, far)],
        "tile_z int, tile_x long, tile_y long, content binary",
    )
    # bbox spanning tiles 4823-4824 only; lat bounds wide open
    n = 2.0**14
    w_, e_ = 4823 / n * 360 - 180, 4825 / n * 360 - 180 - 1e-9
    got = coverage_ingest(tiles, (w_, -85.0, e_, 85.0)).collect()
    ids = sorted(r.feature_id for r in got)
    assert ids == [7, 8, 9]  # id 7 deduped, far tile pruned
    # deterministic first-occurrence tie-break: lowest (tile_x, ...) wins
    r7 = [r for r in got if r.feature_id == 7][0]
    assert (r7.tile_x, r7.px) == (4823, 4090)


def test_corrupt_tile_skipped_not_fatal(spark):
    from landlensdb_spark.operators.mvt import tile_features

    good = _tile_blob()
    tiles = spark.createDataFrame(
        [(14, 1, 1, good), (14, 2, 2, b"\x1a\xffgarbage"), (14, 3, 3, b"")],
        "tile_z int, tile_x long, tile_y long, content binary",
    )
    got = tile_features(tiles).collect()
    # the corrupt and empty tiles vanish; the good tile's 4 points survive
    assert sorted({r.tile_x for r in got}) == [1]
    assert len(got) == 4


def test_encoder_value_slots_not_conflated_across_types():
    """True, 1 and 1.0 must occupy distinct Value slots: bare == dedup would
    reuse one slot and decode the wrong wire type for one of the props."""
    blob = encode_mvt(
        {
            "image": {
                "features": [
                    {"id": 1, "points": [(1, 1)], "props": {"pano": True, "n": 1, "w": 1.0}}
                ]
            }
        }
    )
    rows = decode_mvt(blob)
    assert rows[0][5] == {"pano": "True", "n": "1", "w": "1.0"}
