"""Distributed BPE vocabulary learning + encoding (Sennrich et al. 2016).

A tokenizer-training pass is a standard step of a web-scale corpus
pipeline: learn the byte-pair-encoding merge table FROM the corpus, then
encode documents with it. The public algorithm operates on the WORD-TYPE
table (distinct words + frequencies), not the raw corpus — exactly the
Spark-friendly shape:

1. word frequencies: ONE corpus-sized map-side-combined groupBy (the same
   tokenizer family as dedup/search: lowercase, Java-\\s split),
2. each word type becomes a symbol array (unicode chars + a '</w>'
   end-of-word marker),
3. per merge round: adjacent-pair counts weighted by word frequency (one
   explode + combine-enabled groupBy over word TYPES), the argmax pair
   (count desc, pair asc — deterministic) comes to the driver as ONE row,
   and every word's symbol array is rewritten by a pure column-math fold
   (greedy left-to-right non-overlapping, the spec's merge order).

Driver state per round is a single (left, right, count) row; the word
table lineage is truncated every few rounds (localCheckpoint, same
pattern as graph.pagerank). Cost per round = one shuffle over word types
— at 10^9 word types that is the expected cluster shape; the corpus
itself is touched exactly once.

``apply_bpe`` replays the learned merges over any text column as a chain
of the same column-math folds — no Python in the encode path at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _words(df: DataFrame, text: str) -> DataFrame:
    """(word, freq) over the corpus — lowercase whitespace tokens."""
    from landlensdb_spark.operators.textstats import words_of

    return (
        df.select(F.explode(words_of(F.lower(F.col(text)))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """word -> array of single-char symbols + end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (left,
    right) symbol pairs — one fold, no Python. The just-merged token is a
    different string than `left`, so overlap is excluded naturally."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, n): adjacent-pair frequencies weighted by word freq."""
    idx = F.sequence(F.lit(1), F.size("syms") - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("left"),
            F.element_at(F.col("syms"), i + 1).alias("right"),
        ),
    )
    return (
        words.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("n"))
    )


def learn_bpe(
    df: DataFrame, num_merges: int, text: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    [(rank, left, right, pair_count)] in merge order (rank from 1).
    Stops early when no adjacent pair remains."""
    words = _words(df, text).select(
        "freq", _initial_symbols(F.col("word")).alias("syms")
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((rank, left, right, n))
        words = words.select(
            "freq", _merge_pair(F.col("syms"), left, right).alias("syms")
        )
        if rank % 4 == 0:  # cut lineage: each round stacks a fold transform
            words = words.localCheckpoint(eager=True)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    text: str = "text",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text`` with a learned merge table: per word, start from
    characters + EOW and replay every merge in rank order (the BPE apply
    rule). Output column = array of token strings for the whole document
    (word-major order). Entire encode path is column math."""
    from landlensdb_spark.operators.textstats import words_of

    pairs = [(m[-3] if len(m) == 4 else m[0], m[-2] if len(m) == 4 else m[1])
             for m in merges]

    def encode_word(w: Column) -> Column:
        syms = _initial_symbols(w)
        for left, right in pairs:
            syms = _merge_pair(syms, left, right)
        return syms

    toks = F.flatten(
        F.transform(words_of(F.lower(F.col(text))), encode_word)
    )
    return df.withColumn(out, toks)
