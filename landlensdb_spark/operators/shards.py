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
scan, with the bucket id a PURE FUNCTION OF THE KEY (quantile ranges
embedded as literals) rather than ``spark_partition_id()`` — so the two
passes need no persisted common lineage and no partition-numbering
assumptions:

1. Bucket boundaries: one ``approxQuantile`` on the key (driver gets
   ~num_buckets doubles, never data rows); ``_b`` = #boundaries <= key,
   pure column math over a literal array.
2. Per-bucket TOTALS: map-side-combined groupBy — the shuffle moves one
   row per bucket. Driver prefix-sums the totals (bounded) into offsets.
3. Running sum within each bucket: window partitioned by ``_b`` — the
   ONE data-sized shuffle (hash on the bucket id; buckets are quantile
   ranges, so they are balanced by construction). Offsets join back as a
   broadcast of #buckets rows.

Total cost: one data shuffle + two bounded driver collects — the shape
that survives 100 TB (the driver only ever sees quantiles and per-bucket
totals).
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
    over the ``key`` order. ``key`` must be numeric AND UNIQUE (a doc id):
    the running sum is ordered by ``key`` alone, so rows sharing a key
    value would take order-ambiguous prefix sums — shard_id for the tied
    rows could then differ across engines/runs. With unique keys the
    result is deterministic, engine-independent, contiguous.
    """
    n_buckets = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.approxQuantile(key, qs, 0.001))) if qs else []

    def bucket_of(col):
        if not bounds:
            return F.lit(0)
        # number of boundaries <= key: same pure function in both passes
        return F.size(
            F.filter(F.lit(bounds), lambda b: b <= col.cast("double"))
        )

    keyed = df.withColumn("_b", bucket_of(F.col(key)))
    totals = (
        keyed.groupBy("_b")
        .agg(F.sum(F.col(tokens).cast("long")).alias("_btot"))
        .collect()
    )
    offs, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_b"]):
        offs.append((r["_b"], acc))
        acc += r["_btot"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs or [(0, 0)], "_b int, _boff long")

    w = Window.partitionBy("_b").orderBy(F.col(key).asc())
    return (
        keyed.withColumn("_lcum", F.sum(F.col(tokens).cast("long")).over(w))
        .join(F.broadcast(off_df), "_b")
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("_boff") + F.col("_lcum") - F.col(tokens).cast("long"))
                / F.lit(shard_tokens)
            ),
        )
        .drop("_b", "_lcum", "_boff")
    )
