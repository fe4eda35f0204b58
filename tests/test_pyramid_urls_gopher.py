"""tile_pyramid rollup, URL canonicalization, Gopher repetition stats."""

from __future__ import annotations

import collections

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark.geo.tiles import np_quadkey, np_tile_xy
from landlensdb_spark.operators.textstats import with_repetition_stats
from landlensdb_spark.operators.tiles import tile_pyramid, tile_stats
from landlensdb_spark.operators.urls import (
    registered_domain,
    url_host,
    url_normalize,
    with_url_parts,
)


def _pts(spark, n=500):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "rec_id long, lon double, lat double",
    )


# ---------------------------------------------------------------------------
# tile_pyramid
# ---------------------------------------------------------------------------

def test_pyramid_matches_per_level_stats(spark):
    """Every level of the one-shuffle pyramid equals an independent
    tile_stats recompute at that zoom."""
    df = _pts(spark)
    pyr = tile_pyramid(df, min_zoom=1, max_zoom=7)
    got = {
        (r["tile_z"], r["tile_x"], r["tile_y"]): r for r in pyr.collect()
    }
    n_levels = 0
    for z in range(1, 8):
        want = tile_stats(df, zoom=z).collect()
        n_levels += len(want)
        for w in want:
            g = got[(z, w["tile_x"], w["tile_y"])]
            assert g["n_records"] == w["n_records"]
            for c in ("min_lon", "max_lon", "min_lat", "max_lat"):
                assert g[c] == w[c], (z, c)
    assert len(got) == n_levels


def test_pyramid_quadkey_and_totals(spark):
    df = _pts(spark, 300)
    rows = tile_pyramid(df, min_zoom=0, max_zoom=5).collect()
    # each level partitions all points: per-level counts sum to n
    per_z = collections.Counter()
    for r in rows:
        per_z[r["tile_z"]] += r["n_records"]
        assert r["quadkey"] == int(
            np_quadkey(np.array([r["tile_x"]]), np.array([r["tile_y"]]), r["tile_z"])[0]
        )
    assert all(per_z[z] == 300 for z in range(6))
    # parents are exact shifts of children: every z5 tile's parent exists at z4
    z5 = {(r["tile_x"], r["tile_y"]) for r in rows if r["tile_z"] == 5}
    z4 = {(r["tile_x"], r["tile_y"]) for r in rows if r["tile_z"] == 4}
    assert {(x >> 1, y >> 1) for x, y in z5} == z4


def test_pyramid_single_shuffle(spark):
    """One exchange total — the explode happens before the (only) groupBy."""
    plan = (
        tile_pyramid(_pts(spark, 50), min_zoom=0, max_zoom=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # shuffle + AQE final agg read at most


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

CASES = [
    # raw -> (norm, host, domain)
    (
        "HTTP://WWW.Example.COM:80/a/b?id=3&utm_source=x#frag",
        "http://www.example.com/a/b?id=3",
        "www.example.com",
        "example.com",
    ),
    (
        "https://Site.CO.UK:443/",
        "https://site.co.uk/",
        "site.co.uk",
        "site.co.uk",
    ),
    (
        "http://h.example.org:8080",
        "http://h.example.org:8080/",
        "h.example.org",
        "example.org",
    ),
    (
        "https://a.b.com?utm_source=1&utm_medium=2",
        "https://a.b.com/",
        "a.b.com",
        "b.com",
    ),
    (
        "http://x.COM:443/p?a=1&b=2",
        "http://x.com:443/p?a=1&b=2",
        "x.com",
        "x.com",
    ),
    ("https://localhost/x", "https://localhost/x", "localhost", "localhost"),
]


def test_url_normalize_cases(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    out = with_url_parts(df).collect()
    want = {u: (n, h, d) for u, n, h, d in CASES}
    for r in out:
        n, h, d = want[r["url"]]
        assert r["norm_url"] == n, r["url"]
        assert r["host"] == h
        assert r["domain"] == d


def test_url_normalize_idempotent(spark):
    """normalize(normalize(u)) == normalize(u)."""
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    once = df.select(url_normalize(F.col("url")).alias("u1"))
    twice = once.select(
        F.col("u1"), url_normalize(F.col("u1")).alias("u2")
    ).collect()
    for r in twice:
        assert r["u1"] == r["u2"]


# ---------------------------------------------------------------------------
# Gopher repetition stats
# ---------------------------------------------------------------------------

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "spam spam spam spam spam"),
    (2, ""),
    (3, "   "),
    (4, "one"),
    (5, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 2),
    (6, "12 34 56 xx"),
]


def _py_stats(text: str):
    words = text.split()
    n = len(words)
    if n == 0:
        return (0, 0.0, 0.0, 0.0, 0.0)
    c = collections.Counter(words)
    nw = max(n, 1)
    return (
        n,
        round(len(c) / nw, 6),
        round(max(c.values()) / nw, 6),
        round(sum(len(w) for w in words) / nw, 6),
        round(sum(v for w, v in c.items() if any(ch.isalpha() and ch.isascii() for ch in w)) / nw, 6),
    )


def test_repetition_stats_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    for doc_id, text in DOCS:
        n, fu, tf, ml, fa = _py_stats(text)
        r = out[doc_id]
        assert r["n_words"] == n, doc_id
        assert r["frac_unique_words"] == fu
        assert r["top_word_frac"] == tf
        assert r["mean_word_len"] == ml
        assert r["frac_alpha_words"] == fa


def test_gopher_keep_flags(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r["gopher_keep"] for r in with_repetition_stats(df).collect()}
    assert out[1] is False  # top_word_frac = 1.0, too repetitive
    assert out[2] is False  # empty
    assert out[5] is False  # single-char words -> mean_word_len 1.0
    assert out[0] is False  # only 13 words (< 20)
    long_ok = " ".join(f"word{i} item{i} text{i}" for i in range(10))
    df2 = spark.createDataFrame([(9, long_ok)], "doc_id long, text string")
    assert with_repetition_stats(df2).collect()[0]["gopher_keep"] is True


def test_repetition_stats_whitespace_and_null(spark):
    """Tabs/newlines must not create phantom words; NULL text scores as
    empty (matching the SQL oracle's coalesce), not NULL."""
    rows = [
        (0, "hello world\n"),
        (1, "\t\t"),
        (2, None),
        (3, "  a\tb\nc  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert out[0]["n_words"] == 2
    assert out[0]["mean_word_len"] == 5.0
    assert out[0]["frac_alpha_words"] == 1.0
    assert out[1]["n_words"] == 0
    assert out[2]["n_words"] == 0 and out[2]["gopher_keep"] is False
    assert out[3]["n_words"] == 3 and out[3]["mean_word_len"] == 1.0
