"""Grid-density clustering (operators/cluster.py) — known-answer
labels, DuckDB recursive-closure parity, noise semantics, guards."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from landlensdb_spark.operators.cluster import (
    _KEY_SHIFT,
    grid_cluster,
    grid_cluster_sql,
)


def _labels(df):
    return {r["key"]: r["cluster"] for r in df.select("key", "cluster").collect()}


def test_known_blobs_and_noise(spark):
    # blob A: cells (0,0)+(1,0) chained; blob B: isolated cell (5,5);
    # noise: lone point in cell (9,9)
    rows = [
        (0, 1.0, 1.0),
        (1, 2.0, 2.0),
        (2, 11.0, 3.0),  # cell (1,0), adjacent to (0,0)
        (3, 12.0, 4.0),
        (4, 51.0, 52.0),
        (5, 53.0, 54.0),
        (6, 91.0, 91.0),  # noise: only 1 point in its cell
    ]
    df = spark.createDataFrame(rows, "key int, x double, y double")
    got = _labels(grid_cluster(df, cell_size=10, min_count=2, iterations=4))
    a = 0 * _KEY_SHIFT + 0  # min cell key of the chained component
    b = 5 * _KEY_SHIFT + 5
    assert got == {0: a, 1: a, 2: a, 3: a, 4: b, 5: b, 6: None}


def test_diagonal_adjacency_both_directions(spark):
    # (0,0)-(1,1) and (1,0)-(0,1): both diagonals must connect
    rows = [
        (0, 5.0, 5.0), (1, 6.0, 6.0),          # cell (0,0)
        (2, 15.0, 15.0), (3, 16.0, 16.0),      # cell (1,1)
        (10, 105.0, 5.0), (11, 106.0, 6.0),    # cell (10,0)
        (12, 95.0, 15.0), (13, 96.0, 16.0),    # cell (9,1) — anti-diagonal
    ]
    df = spark.createDataFrame(rows, "key int, x double, y double")
    got = _labels(grid_cluster(df, cell_size=10, min_count=2, iterations=4))
    assert got[0] == got[2] == 0
    assert got[10] == got[12] == 9 * _KEY_SHIFT + 1
    assert got[0] != got[10]


def test_min_count_one_all_core(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 500.0, 500.0)], "key int, x double, y double"
    )
    got = _labels(grid_cluster(df, cell_size=10, min_count=1, iterations=2))
    assert None not in got.values() and got[0] != got[1]


def test_duckdb_recursive_closure_parity(spark):
    # blob+noise synthetic, same shape as the driver query's field
    n = 800
    k = np.arange(n)
    blob = k % 4 != 0
    g = k % 16
    x = np.where(blob, (g * 2654435761) % 509 + (k * 48271) % 23,
                 (k * 2654435761) % 509).astype(float)
    y = np.where(blob, ((g + 13) * 2246822519) % 521 + ((k + 7) * 16807) % 27,
                 ((k + 13) * 2246822519) % 521).astype(float)
    pdf = pd.DataFrame({"key": k, "x": x, "y": y})
    df = spark.createDataFrame(pdf)
    got = (
        grid_cluster(df, cell_size=12, min_count=3, iterations=12)
        .select("key", "cluster")
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert got["cluster"].notna().sum() > 0  # clusters actually form
    assert got["cluster"].isna().sum() > 0  # and noise exists
    con = duckdb.connect()
    con.register("p0", pdf)
    want = (
        con.sql(grid_cluster_sql("SELECT key, x, y FROM p0", 12, 3))
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    m = got.merge(want, on="key", suffixes=("_g", "_w"))
    assert (m["cluster_g"].fillna(-1) == m["cluster_w"].fillna(-1)).all()


def test_guards(spark):
    df = spark.createDataFrame([(0, 1.0, 1.0)], "key int, x double, y double")
    with pytest.raises(ValueError, match="cell_size"):
        grid_cluster(df, cell_size=0)
    with pytest.raises(ValueError, match="min_count"):
        grid_cluster(df, min_count=0)
    huge = spark.createDataFrame(
        [(0, 2.0**40, 1.0), (1, 2.0**40 + 0.5, 1.0)],
        "key int, x double, y double",
    )
    with pytest.raises(Exception, match="packing range"):
        grid_cluster(huge, cell_size=1, min_count=1).collect()


def test_negative_coordinates(spark):
    # floor (not trunc) semantics: -1.0 at cell_size 10 is cell -1
    rows = [(0, -1.0, -1.0), (1, -2.0, -2.0), (2, 1.0, 1.0), (3, 2.0, 2.0)]
    df = spark.createDataFrame(rows, "key int, x double, y double")
    got = _labels(grid_cluster(df, cell_size=10, min_count=2, iterations=4))
    # cells (-1,-1) and (0,0) are diagonal neighbors -> one component,
    # labeled by the smaller packed key (-1 * 2^32 - 1)
    lab = -1 * _KEY_SHIFT + -1
    assert set(got.values()) == {lab}
