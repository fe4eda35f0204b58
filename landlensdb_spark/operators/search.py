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
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    if top is not None:
        # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
        # (per-partition heads merged on the driver) — the global window
        # then ranks only `top` rows. Without `top` the global window is a
        # single sort task; fine for bounded result sets, pass `top` at
        # corpus scale.
        pruned = scored.orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        ).limit(top)
        return pruned.withColumn("rank", F.row_number().over(w))
    return scored.withColumn("rank", F.row_number().over(w))
