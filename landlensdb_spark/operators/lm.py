"""Corpus n-gram language-model scoring — the CCNet-style perplexity gate.

Production web-text pipelines rank documents by language-model
perplexity (CCNet buckets Common Crawl by a KenLM score; the Gopher/C4
rules in operators/textstats.py are its cheaper cousins). This module
implements the distributed equivalent with a corpus-trained bigram model:

1. TRAIN (two map-side-combined groupBys): bigram counts and unigram
   (context) counts over the whole corpus — the model IS two DataFrames,
   never a driver-side object, so vocabulary size is unbounded.
2. SCORE (two equi-joins + one groupBy): every document's bigrams join
   the model; per-doc score = mean log2 P(w_i | w_{i-1}) with add-k
   smoothing, P = (c(w_{i-1} w_i) + k) / (c(w_{i-1}) + k * V).

Add-k smoothing keeps unseen bigrams finite and makes the score a pure
arithmetic function of the counts — exactly reproducible in SQL (the
oracle) and on any cluster size. Lower (more negative) = less like the
corpus; the pipeline use is thresholding or bucketing by this score.

Scale notes: bigram keys are (prev, word) strings — at real scale hash
them to longs (xxhash64) to shrink the two shuffles; the join of doc
bigrams to the model is a plain equi-join AQE can re-plan. Both training
rollups and the scoring join are map-side combined before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "\x02"  # sentence-start context token (never a corpus word)


def _bigrams(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(id, prev, word) rows per document token stream, BOS-prefixed."""
    from landlensdb_spark.operators.textstats import words_of

    toks = words_of(F.col(text))
    pairs = F.zip_with(
        F.concat(F.array(F.lit(BOS)), F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))),
        toks,
        lambda p, w: F.struct(p.alias("prev"), w.alias("word")),
    )
    return (
        df.filter(F.size(toks) > 0)
        .select(F.col(id_col).alias("_id"), F.explode(pairs).alias("bg"))
        .select("_id", F.col("bg.prev").alias("prev"), F.col("bg.word").alias("word"))
    )


def _model_from(bg: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    bigrams = bg.groupBy("prev", "word").agg(F.count("*").alias("c_bg"))
    contexts = bg.groupBy("prev").agg(F.count("*").alias("c_ctx"))
    vocab = bg.select("word").distinct().agg(F.count("*").alias("v"))
    return bigrams, contexts, vocab


def train_bigram_counts(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, context_counts, vocab_size_df): the model as
    DataFrames. vocab counts distinct WORDS (BOS is a context, not a
    vocabulary entry)."""
    return _model_from(_bigrams(df, text, id_col))


def lm_scores(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, logprob): mean log2 P(w|prev) per document under
    the corpus-trained add-k bigram model (6dp rounding for cross-engine
    exactness). Empty docs are absent (no bigrams to score)."""
    # the tokenize+explode feeds FOUR consumers (three model rollups +
    # the probe side); materialize it once so the corpus scan and explode
    # never re-execute per subtree
    bg = _bigrams(df, text, id_col).localCheckpoint(eager=True)
    bigrams, contexts, vocab = _model_from(bg)
    scored = (
        bg.join(bigrams, ["prev", "word"], "left")
        .join(contexts, "prev", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_lp",
            F.log2(
                (F.coalesce("c_bg", F.lit(0)) + F.lit(add_k))
                / (F.coalesce("c_ctx", F.lit(0)) + F.lit(add_k) * F.col("v"))
            ),
        )
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("logprob"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            "logprob",
        )
    )
    return scored
