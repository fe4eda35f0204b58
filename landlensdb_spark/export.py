"""Map-export edge functions (driver-side, over a collected sample).

The reference renders folium maps with rotated arrow icons and HTML popups
(/root/reference/landlensdb/geoclasses/geoimageframe.py:16-64 SVG arrow,
:312-379 popup html, :381-456 map build). In a distributed engine the
heavy lifting is the per-tile record grouping (operators/tiles.tile_export);
rendering stays an edge function over a bounded sample — these are their
dependency-free analogs (pure string templates, no folium/branca).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import html as html_mod
import json
import math


def _json_safe(v):
    """Recursive JSON-safe cast shared by the edge sinks (GeoJSON, GPKG):
    timestamps -> ISO strings, decimals -> floats, bytes -> base64,
    containers element-wise."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(v).decode()
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    return v


def _sqlite_safe(v):
    """sqlite-bindable cast: raw bytes stay BLOBs; arrays/maps/structs
    serialize to JSON text; everything else via _json_safe."""
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, bytes):
        return v
    v = _json_safe(v)
    if isinstance(v, (list, dict)):
        return json.dumps(v)
    return v


def svg_arrow(angle: float, color: str = "#3388ff", size: int = 24) -> str:
    """Rotated arrow marker as an SVG data-URL (reference
    geoimageframe.py:16-64 semantics: 0 deg = north, clockwise)."""
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'viewBox="0 0 24 24"><g transform="rotate({angle % 360:.1f} 12 12)">'
        f'<path d="M12 2 L17 14 L12 11 L7 14 Z" fill="{color}"/></g></svg>'
    )
    return "data:image/svg+xml;base64," + base64.b64encode(svg.encode()).decode()


def popup_html(record: dict, title_key: str = "url") -> str:
    """Per-record HTML popup table (reference geoimageframe.py:312-379)."""
    title = html_mod.escape(str(record.get(title_key, "")))
    rows = "".join(
        f"<tr><th>{html_mod.escape(str(k))}</th>"
        f"<td>{html_mod.escape(str(v))}</td></tr>"
        for k, v in record.items()
        if k != title_key
    )
    return (
        f'<div class="popup"><b>{title}</b><table>{rows}</table></div>'
    )


def render_map_html(
    records: list[dict],
    lon_key: str = "lon",
    lat_key: str = "lat",
    angle_key: str | None = None,
    width: int = 800,
    height: int = 500,
    max_records: int = 2000,
) -> str:
    """Self-contained HTML map of a sample: Web-Mercator scatter with
    rotated arrow markers + popups. Initial view derives from the first
    record like the reference (geoimageframe.py:381-456)."""
    records = records[:max_records]
    if not records:
        return "<html><body>empty</body></html>"

    def merc(lon, lat):
        x = (lon + 180.0) / 360.0
        y = (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0
        return x, y

    pts = [merc(r[lon_key], r[lat_key]) for r in records]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    pad = 0.05 * max(x1 - x0, y1 - y0, 1e-9)
    x0, x1, y0, y1 = x0 - pad, x1 + pad, y0 + pad, y1 - pad  # y inverted

    marks = []
    for r, (x, y) in zip(records, pts):
        px = (x - x0) / (x1 - x0) * width
        py = (y - (y1)) / ((y0) - (y1)) * height
        ang = float(r.get(angle_key, 0.0) or 0.0) if angle_key else 0.0
        tip = html_mod.escape(str(r.get("url", "")))
        marks.append(
            f'<g transform="translate({px:.1f} {py:.1f}) rotate({ang % 360:.1f})">'
            f'<path d="M0 -6 L4 6 L0 3 L-4 6 Z" fill="#3388ff" opacity="0.8">'
            f"<title>{tip}</title></path></g>"
        )
    return (
        f"<html><body><svg width='{width}' height='{height}' "
        f"style='background:#eef'>{''.join(marks)}</svg>"
        f"<p>{len(records)} records</p></body></html>"
    )


def write_geojson(
    df,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    properties: list[str] | None = None,
    limit: int = 10000,
) -> int:
    """GeoJSON FeatureCollection file sink — the reference's
    ``GeoImageFrame.to_file`` GeoJSON path (geoimageframe.py:110-123),
    driver-side over a bounded sample (edge export, like render_map_html;
    the distributed sink for full tables is the spatially-sorted parquet
    writer in catalog.write_spatial). Point geometry; all non-coordinate
    columns (or ``properties``) become feature properties with
    JSON-safe casts. Returns the number of features written."""
    rows = df.limit(limit).collect()
    prop_names = properties
    feats = []
    for r in rows:
        d = r.asDict(recursive=True)
        if prop_names is None:
            prop_names = [c for c in d if c not in (lon, lat)]

        feats.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [d[lon], d[lat]],
                },
                "properties": {k: _json_safe(d[k]) for k in prop_names},
            }
        )
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return len(feats)


def write_gpkg(
    df,
    path: str,
    layer: str = "features",
    lon: str = "lon",
    lat: str = "lat",
    properties: list[str] | None = None,
    batch_rows: int = 10_000,
) -> int:
    """GeoPackage point-layer sink — the reference's ``to_file`` GPKG path
    (geoimageframe.py:110-123, via pyogrio), rebuilt on stdlib sqlite3
    against the public OGC GPKG spec (application_id 'GPKG', required
    gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns rows, and
    the standard GeoPackageBinary header in front of each WKB geometry).

    A .gpkg is one sqlite file, so this is inherently a single-writer edge
    sink: rows stream driver-side via ``toLocalIterator`` (one partition in
    memory at a time, batched inserts) — bounded exports, same contract as
    write_geojson. The distributed sink for full tables remains
    catalog.write_spatial. Returns the number of features written.
    """
    import os
    import sqlite3
    import struct

    from landlensdb_spark.geo.wkb import point_wkb

    cols = [c for c in df.columns if c not in (lon, lat)]
    if properties is not None:
        cols = [c for c in cols if c in set(properties)]

    def sql_type(spark_t: str) -> str:
        if spark_t in ("bigint", "int", "smallint", "tinyint", "boolean"):
            return "INTEGER"
        if spark_t in ("double", "float"):
            return "REAL"
        if spark_t == "binary":
            return "BLOB"
        return "TEXT"

    types = dict(df.dtypes)

    def gpkg_blob(x: float, y: float) -> bytes:
        # GeoPackageBinary: magic 'GP', version 0, flags 0b00000011
        # (little-endian header, envelope indicator 1 = XY), srs_id,
        # [minx maxx miny maxy], then the WKB point
        header = b"GP\x00\x03" + struct.pack("<i", 4326)
        env = struct.pack("<4d", x, x, y, y)
        return header + env + point_wkb(x, y)

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")
        con.execute("PRAGMA user_version = 10300")  # GPKG 1.3
        con.execute(
            """CREATE TABLE gpkg_spatial_ref_sys (
                 srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
                 organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
                 definition TEXT NOT NULL, description TEXT)"""
        )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                (
                    "WGS 84 geodetic",
                    4326,
                    "EPSG",
                    4326,
                    'GEOGCS["WGS 84",DATUM["WGS_1984",'
                    'SPHEROID["WGS 84",6378137,298.257223563]],'
                    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
                    None,
                ),
            ],
        )
        con.execute(
            """CREATE TABLE gpkg_contents (
                 table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
                 identifier TEXT UNIQUE, description TEXT DEFAULT '',
                 last_change DATETIME NOT NULL DEFAULT
                   (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
                 min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
                 srs_id INTEGER)"""
        )
        con.execute(
            """CREATE TABLE gpkg_geometry_columns (
                 table_name TEXT NOT NULL, column_name TEXT NOT NULL,
                 geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
                 z TINYINT NOT NULL, m TINYINT NOT NULL,
                 CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
        )
        attr_ddl = "".join(f', "{c}" {sql_type(types[c])}' for c in cols)
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f"geom BLOB{attr_ddl})"
        )
        placeholders = ",".join("?" * (len(cols) + 1))
        insert = f'INSERT INTO "{layer}" (geom{"".join(", " + chr(34) + c + chr(34) for c in cols)}) VALUES ({placeholders})'
        n = 0
        bounds = [None, None, None, None]  # minx miny maxx maxy
        batch = []
        for r in df.toLocalIterator():
            d = r.asDict(recursive=True)
            # NULL coordinates -> NULL geometry row (GPKG-legal), excluded
            # from the contents bounds — same tolerance as write_geojson
            if d[lon] is None or d[lat] is None:
                geom = None
            else:
                x, y = float(d[lon]), float(d[lat])
                geom = gpkg_blob(x, y)
                if bounds[0] is None:
                    bounds = [x, y, x, y]
                else:
                    bounds[0], bounds[1] = min(bounds[0], x), min(bounds[1], y)
                    bounds[2], bounds[3] = max(bounds[2], x), max(bounds[3], y)
            batch.append((geom, *(_sqlite_safe(d[c]) for c in cols)))
            if len(batch) >= batch_rows:
                con.executemany(insert, batch)
                n += len(batch)
                batch = []
        if batch:
            con.executemany(insert, batch)
            n += len(batch)
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", layer, *bounds, 4326),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
            (layer, "geom", "POINT", 4326, 0, 0),
        )
        con.commit()
    finally:
        con.close()
    return n
