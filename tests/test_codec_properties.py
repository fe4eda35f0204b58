"""Property-based (hypothesis) checks for the wire codecs: any valid input
round-trips; malformed framing fails loudly, never silently."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(w, h, seed):
    from landlensdb_spark.operators.raster import decode_png_gray, encode_png_gray

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png_gray(encode_png_gray(img)), img)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_shape_and_bound(w, h, seed):
    from landlensdb_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        jpeg_dims,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    blob = encode_jpeg_gray(img, quality=95)
    assert jpeg_dims(blob) == (w, h)
    out = decode_jpeg_gray(blob)
    assert out.shape == (h, w)
    # q95 worst case on noise stays visually-lossless-ish; the property we
    # lock is boundedness, not a codec-quality target
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 32


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=6)
)
def test_warc_roundtrip_arbitrary_payloads(payloads):
    from landlensdb_spark.operators.warc import build_warc, parse_warc_bytes

    recs = [
        {"warc_type": "response", "target_uri": f"u{i}", "payload": p}
        for i, p in enumerate(payloads)
    ]
    out = parse_warc_bytes(build_warc(recs))
    assert [r["payload"] for r in out] == payloads
    assert [r["target_uri"] for r in out] == [f"u{i}" for i in range(len(payloads))]


@settings(max_examples=25, deadline=None)
@given(
    lon=st.floats(-180, 180, allow_nan=False),
    lat=st.floats(-85, 85, allow_nan=False),
)
def test_gpkg_blob_wkb_roundtrip(lon, lat):
    from landlensdb_spark.geo.wkb import np_wkb_to_points, point_wkb

    import pandas as pd

    lons, lats = np_wkb_to_points(pd.Series([point_wkb(lon, lat)]))
    assert lons[0] == lon and lats[0] == lat
