"""Benchmark-contamination scan: n-gram overlap vs a held-out eval set.

Before training on web text you must measure how much of each document
already appears in your evaluation benchmarks (test-set leakage). The
standard check (as popularized by the GPT-3/C4 decontamination appendices)
is n-gram overlap: a document is contaminated to the degree its distinct
word n-grams appear in the benchmark's n-gram set.

Scale shape: the benchmark side is tiny (eval suites are ~10^5 docs);
its distinct-shingle set is built once and the corpus side SEMI-joins it
on the shingle string — an equi-join AQE will broadcast. The corpus side
is the same distinct-shingles-per-doc explode the dedup family uses
(operators/dedup._shingles — one lineage, same tokenizer), followed by one
groupBy(doc). No all-pairs anything: cost is O(corpus shingles) +
O(benchmark shingles).

Output per doc: n_shingles (distinct), n_contaminated (distinct shingles
found in the benchmark), contamination = n_contaminated / n_shingles
(rounded 6dp). Docs shorter than n words have no shingles and report 0/0/0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landlensdb_spark.operators.dedup import _shingles


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id, n_shingles, n_contaminated, contamination) for every corpus doc.

    ``benchmark`` needs the same ``text`` column; its ids are irrelevant
    (only its distinct shingle SET matters).
    """
    corpus_sh = _shingles(corpus, text, id_col, n)
    # the benchmark contributes only its shingle SET, so it needs only the
    # text column — shingle it under a synthetic id (eval suites often
    # carry no ids at all)
    bench_ids = benchmark.select(F.lit(0).alias("_bid"), F.col(text))
    bench_sh = _shingles(bench_ids, text, "_bid", n).select("shingle").distinct()
    per_doc = corpus_sh.groupBy("_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus_sh.join(bench_sh, "shingle", "left_semi")
        .groupBy("_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    ids = corpus.select(F.col(id_col).alias("_id"))
    return (
        ids.join(per_doc, "_id", "left")
        .join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0))
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1)),
                6,
            ).alias("contamination"),
        )
    )
