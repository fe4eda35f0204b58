"""Deterministic sketches (operators/sketch.py): HLL, Count-Min, KMV.

Covers: exact Spark<->DuckDB twin equality (both HLL branches, both key
kinds, CM counters, KMV merges), determinism across partitionings, the
accuracy envelopes the module docstring claims (plus CM's
never-underestimates guarantee and KMV's exact-below-k property), the
bin()-minimality assumption HLL's rho rests on, and argument validation.
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


# --- Count-Min ---


def _duck_cm(rows, probes, **kw):
    import duckdb

    from landlensdb_spark.operators.sketch import cm_counts_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    con.execute("CREATE TABLE p (k BIGINT)")
    con.executemany("INSERT INTO p VALUES (?)", probes)
    return sorted(
        con.execute(
            cm_counts_sql("t", "k", "SELECT k FROM p", key_out="k", **kw)
        ).fetchall()
    )


def test_cm_twin_exact_and_never_underestimates(spark):
    from landlensdb_spark.operators.sketch import cm_counts

    rows = [(k % 7,) for k in range(210)] + [(10 + k % 97,) for k in range(300)]
    probes = [(i,) for i in range(0, 120)]
    df = spark.createDataFrame(rows, "k long")
    pr = spark.createDataFrame(probes, "k long")
    got = sorted(
        tuple(r) for r in cm_counts(df, "k", pr, d=4, w=32).collect()
    )
    assert got == _duck_cm(rows, probes, d=4, w=32)
    true = {}
    for (k,) in rows:
        true[k] = true.get(k, 0) + 1
    assert all(est >= true.get(k, 0) for k, est in got)
    # with a wide-enough sketch the estimates are EXACT for these keys
    from landlensdb_spark.operators.sketch import cm_counts as cm

    wide = sorted(tuple(r) for r in cm(df, "k", pr, d=4, w=4096).collect())
    assert all(est == true.get(k, 0) for k, est in wide)


def test_cm_validation(spark):
    from landlensdb_spark.operators.sketch import cm_counts, cm_counts_sql

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="d must be"):
        cm_counts(df, "k", df, d=0)
    with pytest.raises(ValueError, match="w must be"):
        cm_counts_sql("t", "k", "SELECT k FROM p", w=1)


# --- KMV ---


def test_kmv_distinct_accuracy_and_exact_below_k(spark):
    from landlensdb_spark.operators.sketch import kmv_distinct

    df = spark.range(0, 40).select(F.col("id").alias("k"))
    est = kmv_distinct(df, "k", k=64).collect()[0][0]
    assert est == 40.0  # below k -> sketch holds the full set, exact
    big = spark.range(0, 20000).select(F.col("id").alias("k"))
    est2 = kmv_distinct(big, "k", k=256).collect()[0][0]
    assert abs(est2 - 20000) / 20000 < 0.2


def test_kmv_partitioning_invariance(spark):
    from landlensdb_spark.operators.sketch import kmv_distinct

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    a = kmv_distinct(df.coalesce(1), "k", k=64).collect()[0][0]
    b = kmv_distinct(df.repartition(13), "k", k=64).collect()[0][0]
    assert a == b


def test_kmv_overlap_twin_exact(spark):
    from landlensdb_spark.operators.sketch import kmv_overlap, kmv_overlap_sql

    rows = (
        [(k, "a") for k in range(1000)]
        + [(k, "b") for k in range(500, 1500)]
        + [(k, "c") for k in range(2000, 2100)]
    )
    df = spark.createDataFrame(rows, "k long, g string")
    got = sorted(tuple(r) for r in kmv_overlap(df, "k", "g", k=64).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(con.execute(kmv_overlap_sql("t", "k", "g", k=64)).fetchall())
    assert got == want
    by_pair = {(a, b): (j, u, i) for a, b, j, u, i in got}
    # a/b truly overlap (jaccard 1/3); c is disjoint from both
    assert 0.15 < by_pair[("a", "b")][0] < 0.55
    assert by_pair[("a", "c")][0] == 0.0 and by_pair[("b", "c")][0] == 0.0
    # disjoint pairs: intersection estimate exactly 0
    assert by_pair[("a", "c")][2] == 0.0


def test_kmv_validation(spark):
    from landlensdb_spark.operators.sketch import kmv_sketch

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "k", k=1)


# --- histogram quantiles ---


def test_hist_quantiles_twin_and_error_bound(spark):
    from landlensdb_spark.operators.sketch import (
        hist_quantiles,
        hist_quantiles_sql,
    )

    rows = [((k * k * 7) % 1000, f"g{k % 2}") for k in range(5000)]
    df = spark.createDataFrame(rows, "x long, g string")
    got = sorted(
        tuple(r)
        for r in hist_quantiles(
            df, "x", 0.0, 1000.0, 100, [0.5, 0.9, 0.99], group="g"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.execute(
            hist_quantiles_sql("t", "x", 0.0, 1000.0, 100, [0.5, 0.9, 0.99], "g")
        ).fetchall()
    )
    assert got == want
    # error bound: est within one bin width ABOVE the exact type-1 quantile
    import math

    for gname in ("g0", "g1"):
        xs = sorted(x for x, g in rows if g == gname)
        for q in (0.5, 0.9, 0.99):
            exact = xs[math.ceil(q * len(xs)) - 1]
            est = next(v for g2, q2, v in got if g2 == gname and q2 == q)
            assert exact <= est <= exact + 10.0, (gname, q, exact, est)


def test_hist_quantiles_clamp_and_partitioning(spark):
    from landlensdb_spark.operators.sketch import hist_quantiles

    # values outside [lo, hi) clamp into edge bins instead of vanishing
    df = spark.createDataFrame([(v,) for v in (-50, 1, 2, 3, 999)], "x long")
    out = {
        (r.q): r.est
        for r in hist_quantiles(df, "x", 0.0, 10.0, 10, [0.2, 1.0]).collect()
    }
    assert out[0.2] == 1.0  # the clamped -50 lands in bin 0 -> upper edge 1
    assert out[1.0] == 10.0  # the clamped 999 lands in the top bin
    # partitioning invariance
    big = spark.range(0, 4000).selectExpr("(id * 37) % 512 as x")
    a = sorted(map(tuple, hist_quantiles(big.coalesce(1), "x", 0.0, 512.0, 64, [0.5]).collect()))
    b = sorted(map(tuple, hist_quantiles(big.repartition(11), "x", 0.0, 512.0, 64, [0.5]).collect()))
    assert a == b


def test_hist_quantiles_validation(spark):
    from landlensdb_spark.operators.sketch import (
        hist_quantiles,
        hist_quantiles_sql,
    )

    df = spark.range(3).selectExpr("id as x")
    with pytest.raises(ValueError, match="bins"):
        hist_quantiles(df, "x", 0.0, 1.0, 1, [0.5])
    with pytest.raises(ValueError, match="hi > lo"):
        hist_quantiles(df, "x", 1.0, 1.0, 4, [0.5])
    with pytest.raises(ValueError, match="qs"):
        hist_quantiles_sql("t", "x", 0.0, 1.0, 4, [0.0])


def test_hll_pyramid_merge_equals_direct(spark):
    """Register-max rollup must be BIT-identical to computing the sketch
    directly at every level (max associativity), incl. tiles crossing
    parent boundaries and both estimator branches."""
    from pyspark.sql import functions as F

    from landlensdb_spark.operators.sketch import hll_distinct, hll_pyramid

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 23).alias("tile_x"),
        ((F.col("id") * 16807) % 17).alias("tile_y"),
    )
    got = {
        r["g"]: r["hll_distinct"]
        for r in hll_pyramid(df, "k", zoom=5, min_zoom=2, p=4).collect()
    }
    for z in range(2, 6):
        shift = 5 - z
        direct = hll_distinct(
            df.select(
                "k",
                (
                    F.lit(z) * F.lit(1 << 52)
                    + F.shiftright(F.col("tile_x").cast("int"), shift).cast("long")
                    * F.lit(1 << 26)
                    + F.shiftright(F.col("tile_y").cast("int"), shift).cast("long")
                ).alias("g"),
            ),
            "k",
            group="g",
            p=4,
        )
        for r in direct.collect():
            assert got[r["g"]] == r["hll_distinct"], (z, r["g"])
    # every level present, counts of groups match the coarsening
    zs = sorted({g >> 52 for g in got})
    assert zs == [2, 3, 4, 5]


def test_hll_pyramid_guards(spark):
    from pyspark.sql import functions as F

    from landlensdb_spark.operators.sketch import hll_pyramid

    df = spark.range(4).select(
        F.col("id").alias("k"),
        F.lit(0).alias("tile_x"),
        F.lit(0).alias("tile_y"),
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="min_zoom"):
        hll_pyramid(df, "k", zoom=3, min_zoom=5)
    with _pt.raises(ValueError, match="p must be"):
        hll_pyramid(df, "k", zoom=3, min_zoom=3, p=1)
