"""Deterministic HyperLogLog (operators/sketch.py).

Covers: exact Spark<->DuckDB twin equality (both branches, both key
kinds), determinism across partitionings, the accuracy envelope the
module docstring claims, the bin()-minimality assumption both engines'
rho computation rests on, and argument validation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from landlensdb_spark.operators.sketch import hll_distinct, hll_distinct_sql


def _duck(sql: str, rows: list[tuple], cols: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({cols})")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' for _ in rows[0])})", rows
    )
    return sorted(con.execute(sql).fetchall())


def test_twin_exact_long_keys_grouped(spark):
    # 3 groups x disjoint sequential key ranges; p=8 exercises the raw
    # harmonic branch (n >> 2.5m is false here — n=600 < 640 — so this
    # actually lands in linear counting for some groups: BOTH branches
    # appear across the groups, which is the point).
    rows = [(k % 3, k) for k in range(600)]
    df = spark.createDataFrame(rows, "g int, k long")
    got = sorted(
        tuple(r) for r in hll_distinct(df, "k", group="g", p=8).collect()
    )
    want = _duck(
        hll_distinct_sql("t", "k", "g", p=8), rows, "g INTEGER, k BIGINT"
    )
    assert got == want


def test_twin_exact_string_keys_ungrouped(spark):
    rows = [(f"https://host{k}.example/p{k}",) for k in range(500)]
    df = spark.createDataFrame(rows, "u string")
    got = hll_distinct(df, "u", p=6, key_kind="string").collect()
    want = _duck(
        hll_distinct_sql("t", "u", p=6, key_kind="string"),
        rows,
        "u VARCHAR",
    )
    assert [tuple(r) for r in got] == want


def test_partitioning_invariance(spark):
    # The register max and integer register sum are partitioning-blind;
    # the estimate must be bit-identical at 1 and 13 partitions.
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    a = hll_distinct(df.coalesce(1), "k", p=8).collect()[0][0]
    b = hll_distinct(df.repartition(13), "k", p=8).collect()[0][0]
    assert a == b


def test_accuracy_envelope(spark):
    # p=8 => m=256, sigma ~ 6.5%. Sequential keys are the hash's hardest
    # input; the module docstring claims max ~18% over 1k windows. Assert
    # a loose 25% bound over several disjoint windows and cardinalities.
    for lo, n in [(0, 1000), (50_000, 1000), (0, 20_000), (123, 257)]:
        df = spark.range(lo, lo + n).select(F.col("id").alias("k"))
        est = hll_distinct(df, "k", p=8).collect()[0][0]
        assert abs(est - n) / n < 0.25, (lo, n, est)


def test_linear_counting_small_n(spark):
    # n << m lands in the linear-counting branch, which is very accurate.
    df = spark.range(0, 30).select(F.col("id").alias("k"))
    est = hll_distinct(df, "k", p=8).collect()[0][0]
    assert abs(est - 30) <= 2


def test_duplicates_do_not_move_estimate(spark):
    df = spark.range(0, 800).select(F.col("id").alias("k"))
    dup = df.union(df).union(df)
    assert (
        hll_distinct(df, "k", p=8).collect()[0][0]
        == hll_distinct(dup, "k", p=8).collect()[0][0]
    )


def test_bin_minimality_pin(spark):
    # rho = SHIFT - length(bin(h)) requires MINIMAL binary rendering with
    # no sign/zero padding in both engines (floor(log2()) is not portable
    # at exact powers of two; this is the portable substitute).
    got = spark.sql(
        "select length(bin(1L)) a, length(bin(42L)) b, length(bin(1073741824L)) c"
    ).collect()[0]
    assert (got.a, got.b, got.c) == (1, 6, 31)
    duck = duckdb.sql(
        "select length(bin(CAST(1 AS BIGINT))), length(bin(CAST(42 AS BIGINT))),"
        " length(bin(CAST(1073741824 AS BIGINT)))"
    ).fetchall()[0]
    assert duck == (1, 6, 31)


def test_p_validation(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match=r"p must be in \[2, 12\]"):
        hll_distinct(df, "k", p=1)
    with pytest.raises(ValueError, match=r"p must be in \[2, 12\]"):
        hll_distinct_sql("t", "k", p=13)
    with pytest.raises(ValueError, match="key_kind"):
        hll_distinct(df, "k", key_kind="float")
