"""BPE learning/encoding: paper example, merge-fold edge cases, twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from landlensdb_spark.operators.bpe import (
    _merge_pair,
    apply_bpe,
    learn_bpe,
)


def test_learn_bpe_matches_paper_example(spark):
    """Sennrich et al. (2016) running example: with freq {low:5, lower:2,
    newest:6, widest:3} the first merges are (e,s), (es,t), (est,</w>),
    (l,o), (lo,w)."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(l, r) for _, l, r, _ in learn_bpe(df, 5)]
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]


def test_merge_pair_fold_edge_cases(spark):
    """The greedy left-to-right non-overlap fold vs hand-computed
    results, including the self-pair overlap cases."""
    cases = [
        (["x", "x", "x"], ("x", "x"), ["xx", "x"]),
        (["x", "x", "x", "x"], ("x", "x"), ["xx", "xx"]),
        (["a", "x", "a", "b"], ("a", "b"), ["a", "x", "ab"]),
        (["b", "a", "b", "a"], ("a", "b"), ["b", "ab", "a"]),
        (["a"], ("a", "b"), ["a"]),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        "id long, syms array<string>",
    )
    for i, (syms, (l, r), want) in enumerate(cases):
        got = (
            df.filter(F.col("id") == i)
            .select(_merge_pair(F.col("syms"), l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want, (syms, (l, r), got, want)


def test_apply_bpe_encodes_with_learned_merges(spark):
    df = spark.createDataFrame(
        [(1, "low low low lowest")], "doc_id long, text string"
    )
    merges = learn_bpe(df, 6)
    toks = apply_bpe(df, merges).collect()[0]["bpe_tokens"]
    # every word is fully segmented; concatenation restores the text + EOW
    assert "".join(toks).replace("</w>", " ").strip() == "low low low lowest"
    # 'low' appears often enough that it (or 'low</w>') became one token
    assert any(t.startswith("low") and len(t) > 2 for t in toks)


def test_bpe_python_twin_agrees_on_synthetic_docs(spark):
    """The oracle's independent dict implementation and the Spark fold
    must produce identical merge tables on a corpus with ties and
    repeated-symbol words."""
    texts = [
        "aaa aa aaaa banana bandana",
        "aaa banana banana bandana ana",
        "ana ana banana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = learn_bpe(df, 8)

    import tempfile

    import duckdb

    from landlensdb_spark.entry_queries import _bpe_py_merges

    with tempfile.TemporaryDirectory() as d:
        duckdb.sql(
            "COPY (SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
            + ") t(doc_id, text)) TO '" + d + "/documents.parquet'"
        )
        want = _bpe_py_merges(d, 8)
    assert got == want
