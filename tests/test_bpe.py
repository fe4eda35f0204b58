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


def test_learn_bpe_job_count_constant_in_merges(spark):
    """2000 merges must cost a CONSTANT number of Spark jobs (one corpus
    pass + collect), not one job per merge round — at a real tokenizer
    vocab (30k-50k merges) per-round jobs are weeks of submit latency."""
    text = " ".join(
        f"{a}{b}{c}" for a in "abcdef" for b in "ghijkl" for c in "mnopqr"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sc = spark.sparkContext
    sc.setJobGroup("bpe2000", "bounded-jobs assertion")
    try:
        merges = learn_bpe(df, 2000)
    finally:
        sc.setJobGroup(None, None)
    assert len(merges) > 100  # the tiny corpus still yields real merges
    jobs = sc.statusTracker().getJobIdsForGroup("bpe2000")
    assert len(jobs) <= 4, f"learn_bpe(2000) ran {len(jobs)} jobs"


def test_apply_bpe_equals_sequential_rank_order_replay(spark):
    """The rank-priority pandas-UDF encode must reach the same fixed point
    as replaying every merge sequentially in rank order (the twin the
    oracle uses) — including self-pair overlap words and merge-created
    adjacencies."""
    texts = [
        "aaa aa aaaa banana bandana",
        "low low lower lowest newest",
        "",
        "   ",
        "banana ana aaaa",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe(df, 10)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    import re

    from landlensdb_spark.operators.bpe import EOW

    ws = re.compile(r"[ \t\n\r\f\x0b]+")
    for i, t in enumerate(texts):
        t = t.strip().lower()
        want = []
        for w in (ws.split(t) if t else []):
            syms = list(w) + [EOW]
            for _, lhs, rhs, _ in merges:  # sequential rank-order replay
                out, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == lhs and syms[j + 1] == rhs:
                        out.append(lhs + rhs)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            want.extend(syms)
        assert got[i] == want, (i, t, got[i], want)


def test_learn_bpe_truncation_is_deterministic(spark):
    """max_word_types truncation must select by (freq desc, word asc) —
    the same table regardless of partitioning."""
    text = "bb bb aa aa cc dd"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # keep only the 2 most frequent types: aa(2), bb(2) beat cc/dd on the
    # word asc tie-break; merges learn only from those
    merges = learn_bpe(df, 4, max_word_types=2)
    learned_syms = {m[1] for m in merges} | {m[2] for m in merges}
    assert "c" not in learned_syms and "d" not in learned_syms
    assert merges == learn_bpe(df.repartition(7), 4, max_word_types=2)


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


def test_learn_bpe_refuses_over_budget_word_type_cap(spark):
    """max_word_types converts to an approximate driver byte commitment
    (~750 B/type measured); caps past MAX_DRIVER_COLLECT_BYTES must raise
    up front with guidance, BEFORE any Spark job runs."""
    import pytest

    from landlensdb_spark.operators import bpe

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    too_big = bpe.MAX_DRIVER_COLLECT_BYTES // bpe.BYTES_PER_WORD_TYPE + 1
    with pytest.raises(ValueError, match="driver memory"):
        learn_bpe(df, 2, max_word_types=too_big)
    # the default cap must sit comfortably inside the budget
    from landlensdb_spark.operators.bpe import DEFAULT_MAX_WORD_TYPES

    assert (
        DEFAULT_MAX_WORD_TYPES * bpe.BYTES_PER_WORD_TYPE
        < bpe.MAX_DRIVER_COLLECT_BYTES
    )


def test_apply_bpe_duplicate_pair_keeps_first_rank(spark):
    """Token-string aliasing: when the same (left, right) pair appears
    twice in a merge table (re-learned after being consumed), the encoder
    must score it by its FIRST rank — sequential replay applies it at its
    earliest appearance. On word 'abc' with merges [(a,b), (b,c), (a,b)],
    sequential replay gives [ab, c]: (a,b) fires first, consuming the b
    that (b,c) needed. Last-wins ranks would score (a,b)=2 > (b,c)=1 and
    wrongly produce [a, bc]."""
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    merges = [("a", "b"), ("b", "c"), ("a", "b")]
    rows = apply_bpe(df, merges).select("bpe_tokens").collect()
    assert rows[0]["bpe_tokens"] == ["ab", "c", "</w>"]


def test_learn_bpe_none_cap_still_enforces_budget(spark, monkeypatch):
    """max_word_types=None is NOT an opt-out of the driver byte budget
    (round-6 ADVICE): the word types are counted first and the same
    refusal fires when the estimate exceeds MAX_DRIVER_COLLECT_BYTES."""
    import pytest

    from landlensdb_spark.operators import bpe

    df = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} common") for i in range(40)],
        "doc_id long, text string",
    )
    # 42 word types; shrink the budget so the None path must refuse
    monkeypatch.setattr(bpe, "MAX_DRIVER_COLLECT_BYTES", 10 * bpe.BYTES_PER_WORD_TYPE)
    with pytest.raises(ValueError, match="max_word_types=None"):
        bpe.learn_bpe(df, 2, max_word_types=None)
    # and under the budget the unbounded path still learns normally
    monkeypatch.setattr(bpe, "MAX_DRIVER_COLLECT_BYTES", 4 * 1024**3)
    merges = bpe.learn_bpe(df, 1, max_word_types=None)
    assert merges and merges[0][0] == 1
