"""Bloom-filter anti-join: exactness, no false negatives, real pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from landlensdb_spark.operators.bloom import (
    bloom_anti_join,
    build_bloom_bits,
    _next_pow2,
    _positions,
)


def _tables(spark):
    # corpus 0..1999; seen = multiples of 3 plus some dups in both sides
    corpus = spark.range(2000).select(F.col("id").alias("key"))
    seen = (
        spark.range(0, 2000, 3)
        .select(F.col("id").alias("key"))
        .unionAll(spark.range(0, 30, 3).select(F.col("id").alias("key")))
    )
    return corpus, seen


def test_bloom_anti_equals_exact(spark):
    corpus, seen = _tables(spark)
    got = sorted(r["key"] for r in bloom_anti_join(corpus, seen, "key").collect())
    want = sorted(
        r["key"]
        for r in corpus.join(seen.distinct(), "key", "left_anti").collect()
    )
    assert got == want
    assert len(got) > 0


def test_bloom_no_false_negatives_and_prunes(spark):
    corpus, seen = _tables(spark)
    n = seen.count()
    m = _next_pow2(10 * n)
    bits = build_bloom_bits(seen, "key", m)
    bits_df = spark.createDataFrame([(bits,)], "_bloom_bits array<long>")
    tagged = corpus.crossJoin(F.broadcast(bits_df))
    might = F.lit(True)
    for i, pos in enumerate(_positions(F.col("key"), m, 5)):
        tagged = tagged.withColumn(f"_p{i}", pos)
    for i in range(5):
        cb = F.get("_bloom_bits", F.shiftright(F.col(f"_p{i}"), 6).cast("int"))
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(_p{i} % 64 as int))")
        might = might & (cb.bitwiseAND(mask) != F.lit(0).cast("long"))
    rows = tagged.withColumn("_might", might).select("key", "_might").collect()
    flags = {r["key"]: r["_might"] for r in rows}
    seen_keys = {r["key"] for r in seen.collect()}
    # every seen key must test positive (no false negatives -> exactness)
    assert all(flags[k] for k in seen_keys)
    # and the filter must actually prune: most unseen keys test negative
    unseen = [k for k in flags if k not in seen_keys]
    fp = sum(1 for k in unseen if flags[k]) / len(unseen)
    assert fp < 0.2, f"false-positive rate {fp}"


def test_bloom_oversize_falls_back(spark):
    corpus, seen = _tables(spark)
    out = bloom_anti_join(corpus, seen, "key", bits_per_key=1 << 40)
    want = corpus.join(seen.distinct(), "key", "left_anti")
    assert sorted(r["key"] for r in out.collect()) == sorted(
        r["key"] for r in want.collect()
    )


def test_bloom_preserves_duplicates_and_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (5, "d")], "key long, val string"
    )
    seen = spark.createDataFrame([(2,), (2,)], "key long")
    got = sorted(
        (r["key"], r["val"]) for r in bloom_anti_join(df, seen, "key").collect()
    )
    assert got == [(1, "a"), (1, "b"), (5, "d")]


def test_mismatched_key_dtypes_stay_exact(spark):
    """xxhash64 is type-sensitive (int 2 and long 2 hash differently); a
    dtype mismatch must fall back to the coercing exact join, never the
    hash path (which would emit every seen row as 'definitely unseen')."""
    corpus = spark.createDataFrame([(i,) for i in range(50)], "key int")
    seen = spark.range(0, 50, 2).select(F.col("id").alias("key"))  # long
    got = sorted(r["key"] for r in bloom_anti_join(corpus, seen, "key").collect())
    assert got == list(range(1, 50, 2))


def test_bloom_path_at_multimillion_keys(spark):
    """>2M seen keys must route through the bloom (distributed build, no
    fallback) — the 10^7-key regime the docstring promises. Verified by
    plan shape (broadcast of the one-row bits side) plus exact counts."""
    from landlensdb_spark.operators.bloom import MAX_BITS, BITS_PER_KEY

    n_seen = 2_100_000
    assert _next_pow2(BITS_PER_KEY * n_seen) <= MAX_BITS  # bloom path, by sizing
    seen = spark.range(n_seen).select(F.col("id").alias("key"))
    corpus = spark.range(0, 2 * n_seen, 2).select(F.col("id").alias("key"))
    out = bloom_anti_join(corpus, seen, "key", seen_count=n_seen)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, "bloom bits not broadcast -> fallback taken"
    # exact: corpus evens in [0, 4.2M); seen = [0, 2.1M) -> survivors are
    # the evens >= 2.1M, i.e. n_seen/2 rows, min survivor == 2.1M
    agg = out.agg(
        F.count("*").alias("n"), F.min("key").alias("lo"), F.max("key").alias("hi")
    ).collect()[0]
    assert (agg["n"], agg["lo"], agg["hi"]) == (n_seen // 2, n_seen, 2 * n_seen - 2)
