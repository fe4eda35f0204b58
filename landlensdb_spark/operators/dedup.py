"""Deduplication operators for web-text training pipelines.

Five strategies, each a standard large-scale dedup building block:

- ``exact_dedup``: md5(text) hash-groupBy, keep min doc id. One shuffle on
  the hash; map-side partial agg makes it scale linearly.
- ``ngram_jaccard_pairs``: word n-gram shingles -> explode -> self-join on
  shingle -> per-pair intersection counts -> Jaccard >= threshold. The
  shingle join is the scalable candidate generator (no all-pairs).
- ``minhash_lsh_pairs``: per-doc minhash signature (min of md5(shingle#seed)
  hex strings — portable across engines), banded; pairs sharing a band
  bucket are candidates, then exact-Jaccard verified.
- ``simhash``: 64-bit sign-aggregated shingle hashes (Arrow UDF); near-dups
  = identical simhash (or small Hamming distance via band rotation).
- ``embedding_near_dup``: cosine >= threshold pairs via the similarity
  module's LSH/brute-force scorer (see similarity.py).

All shuffles key on hash-uniform values, so no skew handling is needed
beyond AQE; shingle explosion multiplies rows ~n_tokens x which at 100 TB
argues for the minhash path (fixed 'signature rows' per doc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: (kept_id, n_dupes, text_hash)."""
    return (
        df.select(F.md5(F.col(text)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def _shingles(df: DataFrame, text: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    toks = F.split(F.trim(F.col(text)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("_id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with n-gram Jaccard >= threshold.

    Candidates come from the shared-shingle self-join (docs with zero common
    shingles never meet), intersection counts from one groupBy, and set
    sizes join back for the exact Jaccard — all equi-joins on uniform keys.
    """
    sh = _shingles(df, text, id_col, n)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, seed, minhash) — minhash_j = min over shingles of
    md5(shingle || '#' || j), as a hex string (portable, engine-identical)."""
    sh = _shingles(df, text, id_col, n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    exploded = sh.select("_id", "shingle", seeds)
    return (
        exploded.withColumn(
            "h", F.md5(F.concat_ws("#", F.col("shingle"), F.col("seed")))
        )
        .groupBy("_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banded minhash buckets, verified by exact Jaccard.

    rows/doc through the shuffle = num_hashes + bands (constant), the
    property that makes MinHash+LSH the 10^12-document dedup strategy.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text, id_col, n, num_hashes)
    band_sig = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("_id", "band")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list("minhash"))).alias("bucket"))
    )
    a, b = band_sig.alias("a"), band_sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # exact-Jaccard verify restricted to the LSH candidates (inner join)
    jac = ngram_jaccard_pairs(df, text, id_col, n, threshold=0.0)
    out = cand.join(jac, ["id_a", "id_b"], "inner").filter(
        F.col("jaccard") >= threshold
    )
    return out.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash (Arrow UDF; 64-bit)
# ---------------------------------------------------------------------------

def _np_simhash(texts: pd.Series, n: int) -> np.ndarray:
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if len(toks) < n:
            continue
        sh = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        if not sh:
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                for s in sh
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        val = np.uint64(0)
        for bpos in np.where(votes > 0)[0]:
            val |= np.uint64(1) << np.uint64(bpos)
        out[i] = np.int64(val.astype(np.int64))
    return out


def simhash_udf(n: int = 3):
    @F.pandas_udf(LongType())
    def _sh(text: pd.Series) -> pd.Series:
        return pd.Series(_np_simhash(text, n))

    return _sh


def simhash_dups(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Groups of identical simhash (near-dup clusters at Hamming 0)."""
    h = df.select(F.col(id_col), simhash_udf(n)(F.col(text)).alias("simhash"))
    w = Window.partitionBy("simhash")
    return (
        h.withColumn("cluster_size", F.count("*").over(w))
        .filter(F.col("cluster_size") > 1)
        .select(id_col, "simhash", "cluster_size")
    )
