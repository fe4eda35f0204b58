"""Streaming URL dedup — first-record-per-key over an unbounded crawl feed.

The reference dedups batches by id before merging into the store
(/root/reference/landlensdb/handlers/cloud.py:383, first-by-id at :430-447).
On a continuous crawl the same contract is stateful: keep the first record
per canonical URL, with bounded state. Structured Streaming's
``dropDuplicatesWithinWatermark`` holds each key only until the event-time
watermark passes it — state is O(keys per watermark window), not O(all keys
ever), which is what makes exactly-once dedup feasible on an unbounded
10^12-row feed (an unbounded ``dropDuplicates`` would grow state forever).

Semantics: exact within the watermark horizon; a duplicate arriving later
than the watermark delay after its first occurrence MAY be re-emitted
(documented trade-off; the downstream upsert sink is keyed so re-emits are
idempotent). The batch twin is the exact first-by-(ts, tiebreak) window,
used for parity tests and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_batch(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact first-record-per-key — the backfill/parity twin.

    Equal timestamps for one key (same-second re-fetches are common) make
    ``row_number`` over ts alone nondeterministic across runs; pass
    ``tiebreak`` columns that make the ordering total, or every non-key
    column is used (deterministic, at the cost of a wider sort key)."""
    if tiebreak is None:
        # default: every remaining ORDERABLE column (maps cannot be sorted;
        # including one would throw where the old ts-only ordering worked)
        from pyspark.sql.types import MapType

        tiebreak = [
            f.name
            for f in df.schema.fields
            if f.name not in (key, ts) and not isinstance(f.dataType, MapType)
        ]
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_stream(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming dedup (state expires with the watermark)."""
    out = df.withColumn(ts, F.col(ts).cast("timestamp"))
    if out.isStreaming:
        out = out.withWatermark(ts, watermark).dropDuplicatesWithinWatermark([key])
    else:  # same call works on batch frames for convenience in tests
        out = out.dropDuplicates([key])
    return out
