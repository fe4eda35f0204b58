"""Filter DSL (reference db.py semantics incl. errors), validate_frame,
upsert, checkpoint resume idempotency, skew salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from landlensdb_spark import skew
from landlensdb_spark.checkpoint import SUCCESS, FAILED_PERMANENT, CheckpointTable
from landlensdb_spark.dsl import Catalog, upsert, validate_frame


@pytest.fixture(scope="module")
def cat(spark, sf_dir):
    return Catalog(spark, base_dir=sf_dir)


def test_filter_dsl_ops(spark, cat):
    q = cat.table("orders").filter(o_totalprice__gt=100000.0, o_orderstatus="F")
    got = q.all()
    want = (
        spark.read.parquet(f"{cat.base_dir}/orders.parquet")
        .filter((F.col("o_totalprice") > 100000.0) & (F.col("o_orderstatus") == "F"))
        .count()
    )
    assert got.count() == want
    assert cat.table("orders").filter(o_totalprice__lte=0.0).count() == 0


def test_filter_dsl_errors(cat):
    with pytest.raises(ValueError, match="Column 'nope' not found"):
        cat.table("orders").filter(nope__gt=1)
    with pytest.raises(ValueError, match="Unsupported operation 'like'"):
        cat.table("orders").filter(o_orderstatus__like="F")
    with pytest.raises(ValueError, match="Table 'missing' not found"):
        cat.table("missing")


def test_distinct_values(cat):
    vals = cat.distinct_values("orders", "o_orderstatus")
    assert set(vals) == {"F", "O", "P"}
    with pytest.raises(ValueError, match="Column 'xyz' not found"):
        cat.distinct_values("orders", "xyz")


def test_upsert_semantics(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    upd = {tuple(r) for r in upsert(old, new, "k", "update").collect()}
    assert upd == {(1, "a"), (2, "B"), (3, "C")}
    noth = {tuple(r) for r in upsert(old, new, "k", "nothing").collect()}
    assert noth == {(1, "a"), (2, "b"), (3, "C")}
    with pytest.raises(ValueError, match="Invalid conflict resolution"):
        upsert(old, new, "k", "merge")


def test_validate_frame(spark):
    ok = spark.createDataFrame([(1, "u1"), (2, "u2")], "k long, url string")
    validate_frame(ok, {"url": "string"}, unique_key="url")
    with pytest.raises(ValueError, match="Missing required column"):
        validate_frame(ok, {"name": "string"})
    with pytest.raises(ValueError, match="has type"):
        validate_frame(ok, {"k": "string"})
    dup = spark.createDataFrame([(1, "u"), (2, "u")], "k long, url string")
    with pytest.raises(ValueError, match="Duplicate values"):
        validate_frame(dup, {"url": "string"}, unique_key="url")
    nulls = spark.createDataFrame([(1, None)], "k long, url string")
    with pytest.raises(ValueError, match="NULLs in required"):
        validate_frame(nulls, {"url": "string"})


def test_checkpoint_resume(spark, tmp_path):
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    work = spark.createDataFrame([(i, i * 10) for i in range(10)], "unit long, val long")

    # stage ran for units 0-4, unit 9 failed permanently
    ckpt.log([("r1", "s1", u, 0, 1, 1, SUCCESS) for u in range(5)])
    ckpt.log([("r1", "s1", 9, 0, 1, 0, FAILED_PERMANENT)])

    pending = ckpt.pending(work, "s1", "unit")
    assert sorted(r["unit"] for r in pending.collect()) == [5, 6, 7, 8]
    # a different stage is unaffected
    assert ckpt.pending(work, "s2", "unit").count() == 10

    # rerun after completing the rest -> nothing pending (idempotent)
    ckpt.log([("r2", "s1", u, 0, 1, 1, SUCCESS) for u in (5, 6, 7, 8)])
    assert ckpt.pending(work, "s1", "unit").count() == 0

    m = {(-1 if r["stage"] != "s1" else 0, r["status"]): r["units"] for r in ckpt.metrics().collect()}
    assert m[(0, SUCCESS)] == 9 and m[(0, FAILED_PERMANENT)] == 1


def test_salted_count_and_spread(spark):
    # one hot key: 90% of rows in cell 7
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("cell"),
        F.col("id").alias("k"),
    )
    got = {r["cell"]: r["n"] for r in skew.salted_count(df, "cell", "k", 16).collect()}
    want = df.groupBy("cell").count().collect()
    for r in want:
        assert got[r["cell"]] == r["count"]

    plain = df.repartition(16, F.col("cell"))
    salted = skew.salted_repartition(df, "cell", "k", n_salts=16, num_partitions=16)
    _, mx_plain, _ = skew.partition_spread(plain)
    _, mx_salted, _ = skew.partition_spread(salted)
    # hot cell lands in one partition unsalted; salting must spread it
    assert mx_plain > 18000 * 0.9
    assert mx_salted < mx_plain / 4
