"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, fingerprinting.

These extend the engine beyond the reference's operator set (SURVEY.md scope
note): the ops a 100 TB web-text pipeline needs over the ``documents`` /
``pages`` tables. Everything except the rolling-hash fingerprint is pure
JVM column math (whole-stage codegen, no Python); the fingerprint is an
Arrow-batched pandas UDF over numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# tiny per-language stopword markers (language-ID heuristic; deterministic,
# SQL-replicable). Counts of ' word ' occurrences in the padded lowercase text.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "los"],
    "pt": ["de", "com", "uma"],
}


def occurrence_count(col: Column, needle: str) -> Column:
    """# of (possibly overlapping-free) occurrences of ``needle`` via the
    length-difference trick — identical semantics in any SQL engine."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def token_count(col: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_count_bpe_ish(col: Column) -> Column:
    """BPE-ish subword estimate: alnum runs + punctuation marks each count."""
    return F.size(F.regexp_extract_all(col, F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), 1))


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio +
    stopword hit rate (the web-text analog of the reference's
    ``quality_score`` filter key, cloud.py:499-508). Deterministic column
    math, replicated in SQL by the oracle."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    stop_hits = sum(
        (occurrence_count(padded, f" {wrd} ") for wrd in LANG_MARKERS["en"]),
        F.lit(0.0),
    )
    n_tok = token_count(col).cast("double")
    len_band = F.least(F.length(col).cast("double") / F.lit(400.0), F.lit(1.0))
    punct = occurrence_count(col, ".") + occurrence_count(col, ",")
    punct_ratio = F.least(punct / F.greatest(n_tok, F.lit(1.0)), F.lit(1.0))
    stop_ratio = F.least(stop_hits / F.greatest(n_tok, F.lit(1.0)) * 5.0, F.lit(1.0))
    return F.round((len_band + punct_ratio + stop_ratio) / F.lit(3.0), 6)


def lang_id(col: Column) -> Column:
    """n-gram/stopword-marker language guess: argmax language by marker hits
    (ties -> lexicographically first language code, deterministic)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    pairs = []
    for code in sorted(LANG_MARKERS):
        score = sum(
            (occurrence_count(padded, f" {wrd} ") for wrd in LANG_MARKERS[code]),
            F.lit(0.0),
        )
        pairs.append(F.struct(score.alias("s"), F.lit(code).alias("c")))
    # max_by(score, then min code): sort by (s asc, c desc), take last
    arr = F.array_sort(
        F.array(*pairs),
        lambda a, b: F.when(a["s"] != b["s"], a["s"] - b["s"]).otherwise(
            F.when(a["c"] > b["c"], F.lit(-1)).when(a["c"] < b["c"], F.lit(1)).otherwise(F.lit(0))
        ).cast("int"),
    )
    return F.element_at(arr, -1)["c"]


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach n_tokens / n_subwords / quality / lang_pred columns."""
    c = F.col(text)
    return (
        df.withColumn("n_tokens", token_count(c).cast("long"))
        .withColumn("n_subwords", word_count_bpe_ish(c).cast("long"))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
    )


# ---------------------------------------------------------------------------
# document fingerprint (rolling polynomial hash) — pandas UDF
# ---------------------------------------------------------------------------

FP_BASE = np.uint64(1000003)
FP_MOD_MASK = np.uint64((1 << 61) - 1)


def np_fingerprint(texts: "pd.Series") -> np.ndarray:
    """Polynomial rolling hash of utf-8 bytes, folded to 61 bits; vectorized
    per-batch over a padded byte matrix."""
    bs = [t.encode("utf-8") if isinstance(t, str) else b"" for t in texts]
    n = len(bs)
    maxlen = max((len(b) for b in bs), default=0)
    if maxlen == 0:
        return np.zeros(n, dtype=np.int64)
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    lens = np.zeros(n, dtype=np.int64)
    for i, b in enumerate(bs):
        arr = np.frombuffer(b, dtype=np.uint8)
        mat[i, : len(arr)] = arr
        lens[i] = len(arr)
    acc = np.zeros(n, dtype=np.uint64)
    active = np.arange(maxlen)[None, :] < lens[:, None]
    for j in range(maxlen):
        col_active = active[:, j]
        acc = np.where(
            col_active, ((acc * FP_BASE) + mat[:, j]) & FP_MOD_MASK, acc
        )
    return acc.astype(np.int64)


@F.pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return pd.Series(np_fingerprint(text))


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_udf(F.col(text)))


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality signals (Rae et al. 2021 §A1.1, public)
# ---------------------------------------------------------------------------

def words_of(col: Column) -> Column:
    """Whitespace word array; NULL/empty/blank text -> empty array.

    Trimming must strip ALL regex whitespace, not just spaces: F.trim only
    removes ' ', so 'hello\\n' would split to ['hello', ''] and the phantom
    empty word corrupts every downstream ratio (trailing newlines are
    ubiquitous in extracted web text)."""
    trimmed = F.regexp_replace(F.coalesce(col, F.lit("")), r"^\s+|\s+$", "")
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def top_run_count(sorted_arr: Column) -> Column:
    """Multiplicity of the most frequent element of a SORTED array — one
    fold over the array (JVM higher-order aggregate, no explode/shuffle).
    Per-document mode counting via explode+groupBy would shuffle every word
    of the corpus; this keeps repetition scoring shuffle-free."""
    state = F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return state["best"]


def with_repetition_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach the Gopher repetition/shape signals + a keep flag.

    Columns: n_words, frac_unique_words, top_word_frac, mean_word_len,
    frac_alpha_words, gopher_keep. All pure JVM column math (split /
    array_sort / higher-order fold) — zero Python, zero shuffle; the same
    numbers a Gopher-rule filter computes before training-data selection.
    """
    words = words_of(F.col(text))
    n_words = F.size(words).cast("long")
    n_unique = F.size(F.array_distinct(words)).cast("long")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    top_cnt = top_run_count(F.array_sort(words))
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    frac_unique = F.round(n_unique / nw, 6)
    top_frac = F.round(top_cnt / nw, 6)
    mean_len = F.round(sum_len / nw, 6)
    frac_alpha = F.round(n_alpha / nw, 6)
    keep = (
        (n_words >= 20)
        & (mean_len >= 2.0)
        & (mean_len <= 10.0)
        & (frac_unique >= 0.2)
        & (top_frac <= 0.2)
        & (frac_alpha >= 0.8)
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("frac_unique_words", frac_unique)
        .withColumn("top_word_frac", top_frac)
        .withColumn("mean_word_len", mean_len)
        .withColumn("frac_alpha_words", frac_alpha)
        .withColumn("gopher_keep", keep)
    )


def chunk_documents(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Context-window chunking: split each document into token windows of
    ``chunk_tokens`` advancing by ``stride`` (overlap = chunk - stride),
    the standard prep for embedding / long-document training pipelines.

    Output: (id, chunk_id, chunk_start, n_tokens, chunk_text) with
    chunk_start in token coordinates; the FINAL window is the last one
    that starts inside the document (short tail windows are kept, so every
    token belongs to >= 1 chunk). Pure column math: one tokenizer pass,
    one posexplode — no shuffle, no Python. Documents shorter than one
    stride produce exactly one chunk; empty documents produce none.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # windows would skip tokens, silently breaking the every-token-
        # in-a-chunk invariant the docstring promises
        raise ValueError("stride must be <= chunk_tokens")
    toks = words_of(F.col(text))
    n = F.size(toks)
    # starts: 0, stride, 2*stride, ... up to the last start < n
    n_chunks = F.when(n > 0, F.floor((n - 1) / stride) + 1).otherwise(F.lit(0))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(toks, s + 1, chunk_tokens).alias("w"),
        ),
    )
    return (
        df.filter(n > 0)
        .select(
            F.col(id_col).alias(id_col),
            F.posexplode(chunks).alias("chunk_id", "c"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start").cast("long").alias("chunk_start"),
            F.size("c.w").cast("long").alias("n_tokens"),
            F.array_join("c.w", " ").alias("chunk_text"),
        )
    )
