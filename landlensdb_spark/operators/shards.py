"""Token-budget shard packing: assign docs to contiguous output shards.

The last stage of a training-data pipeline writes the corpus as shards of
~N tokens each (sequence packing / dataset sharding). The rule here is the
deterministic contiguous one: order docs by key, take the running token
total, and put each doc in shard ``floor(exclusive_cumsum / shard_tokens)``
— shard boundaries land between docs wherever a doc straddles the budget,
every shard covers a contiguous key range, and the assignment is a pure
function of (key order, token counts), so any engine reproduces it.

The naive Spark formulation — ``sum() OVER (ORDER BY key)`` with no
partition — collapses the whole corpus into ONE window task. This operator
computes the same global prefix sum distributed, the classic two-phase
scan:

1. ``repartitionByRange(key)`` — Spark's range partitioner puts ascending
   key ranges in ascending partition ids (one data-sized shuffle, the only
   one).
2. Per-partition running sums (window partitioned by the partition id —
   parallel across partitions).
3. Per-partition TOTALS (one tiny row per partition) are collected,
   prefix-summed on the driver (bounded: #partitions entries), and joined
   back as broadcast offsets.

Total cost: one range shuffle + one broadcast of #partitions rows — the
shape that survives 100 TB (the driver never sees data rows, only one
total per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_shards(
    df: DataFrame,
    tokens: str,
    key: str,
    shard_tokens: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``shard_id`` = floor(exclusive-prefix-sum(tokens) / shard_tokens)
    over the ``key`` order. Deterministic, engine-independent, contiguous.
    """
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = df.repartitionByRange(int(n_parts), F.col(key)).withColumn(
        "_pidx", F.spark_partition_id()
    )
    w = Window.partitionBy("_pidx").orderBy(F.col(key).asc())
    local = ranged.withColumn(
        "_lcum", F.sum(F.col(tokens).cast("long")).over(w)
    )
    # one tiny row per partition -> driver prefix sum -> broadcast back.
    # cached first so the totals action and the output reuse the same
    # shuffled/cumsum lineage (and the same nondeterministic partition ids)
    local = local.persist()
    totals = (
        local.groupBy("_pidx").agg(F.max("_lcum").alias("_ptot")).collect()
    )
    offs, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["_pidx"]):
        offs[r["_pidx"]] = acc
        acc += r["_ptot"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offs.items()], "_pidx int, _poff long"
    )
    return (
        local.join(F.broadcast(off_df), "_pidx")
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("_poff") + F.col("_lcum") - F.col(tokens).cast("long"))
                / F.lit(shard_tokens)
            ),
        )
        .drop("_pidx", "_lcum", "_poff")
    )
