"""Extraction contract: byte-identical text per url, exact lat/lon recovery
from both the microdata and EXIF-DMS html forms, null-geotag filtering."""

from __future__ import annotations

import numpy as np
import pandas as pd

from landlensdb_spark import tables
from landlensdb_spark.extract import extract_geotag_pdf, extract_geotags

N = 400


def test_pandas_kernel_exact_roundtrip():
    rows = [tables.build_page_row(i) for i in range(N)]
    pdf = pd.DataFrame(rows, columns=["url", "ts", "html", "text", "lang"])
    out = extract_geotag_pdf(pdf["html"])

    # byte-identical text for every row
    assert (out["text"] == pdf["text"]).all()

    i = np.arange(N)
    has_geo = tables.np_has_geo(i)
    lon, lat = tables.np_page_coords(i)
    # geotagged rows: exact 6-dp coordinates from BOTH html forms
    got_lat = out["lat"].to_numpy()
    got_lon = out["lon"].to_numpy()
    assert np.isnan(got_lat[~has_geo]).all()
    assert np.isnan(got_lon[~has_geo]).all()
    assert (got_lat[has_geo] == np.round(lat[has_geo], 6)).all()
    assert (got_lon[has_geo] == np.round(lon[has_geo], 6)).all()
    # both forms actually exercised
    assert tables.np_is_exif(i)[has_geo].sum() > 10


def test_dms_block_is_exact_rational():
    # DMS reconstruction must be exact at 6 dp for every micro-degree value
    rng = np.random.default_rng(0)
    for micro in rng.integers(-180_000_000, 180_000_000, 2000):
        a = abs(int(micro))
        d, rem = divmod(a, 1_000_000)
        m, rem2 = divmod(rem * 60, 1_000_000)
        s = (rem2 * 60) / 1_000_000
        dec = d + m / 60.0 + s / 3600.0
        assert round(dec, 6) == a / 1_000_000


def test_spark_extraction_end_to_end(spark):
    df = tables.pages(spark, 300, num_partitions=4)
    out = extract_geotags(df).select("url", "lat", "lon", "text", "text_extracted")
    pdf = out.toPandas()
    # 80% geotagged
    assert len(pdf) == sum(1 for i in range(300) if i % 5 != 0)
    assert (pdf["text"] == pdf["text_extracted"]).all()

    kept = extract_geotags(df, drop_untagged=False).count()
    assert kept == 300


def test_pages_generator_partition_invariance(spark):
    a = tables.pages(spark, 120, num_partitions=2).orderBy("url").toPandas()
    b = tables.pages(spark, 120, num_partitions=7).orderBy("url").toPandas()
    assert (a["html"] == b["html"]).all()
    assert (a["text"] == b["text"]).all()
    assert (a["warc_ts"] == b["warc_ts"]).all()


def test_arrow_kernel_matches_pandas_oracle():
    """The RE2/Arrow hot-path kernel must agree with the pandas reference
    kernel row-for-row (incl. NaN placement and text bytes)."""
    import pandas as pd

    from landlensdb_spark.extract import extract_geotag_arrow, extract_geotag_pdf

    html = pd.Series([tables.build_page_row(i, clustered=True)[2] for i in range(5000)])
    a = extract_geotag_pdf(html).reset_index(drop=True)
    b = extract_geotag_arrow(html)
    assert (a["lat"].fillna(-999).round(6) == b["lat"].fillna(-999).round(6)).all()
    assert (a["lon"].fillna(-999).round(6) == b["lon"].fillna(-999).round(6)).all()
    assert (a["text"].fillna("") == b["text"].fillna("")).all()
