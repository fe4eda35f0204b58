"""fetch_plan: per-host wave bounds, determinism, schedule completeness."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from landlensdb_spark.operators.fetch import fetch_plan


def _frontier(spark):
    rows = []
    for h in range(5):
        for i in range(1 + h * 3):  # skewed host fanout: 1, 4, 7, 10, 13
            rows.append((f"https://h{h}.example.com/p/{i:03d}",))
    return spark.createDataFrame(rows, "url string")


def test_wave_bounds_per_host(spark):
    df = _frontier(spark)
    out = fetch_plan(df, rps_per_host=2.0, wave_seconds=1.0).collect()
    per = collections.Counter((r["host"], r["fetch_wave"]) for r in out)
    assert max(per.values()) <= 2  # never more than rps*window per host-wave
    # waves are dense from 0 per host
    by_host = collections.defaultdict(set)
    for r in out:
        by_host[r["host"]].add(r["fetch_wave"])
    for host, waves in by_host.items():
        assert waves == set(range(len(waves))), (host, waves)


def test_schedule_is_complete_and_deterministic(spark):
    df = _frontier(spark)
    a = sorted((r["url"], r["fetch_wave"]) for r in fetch_plan(df).collect())
    b = sorted((r["url"], r["fetch_wave"]) for r in fetch_plan(df).collect())
    assert a == b
    assert len(a) == df.count()  # every url scheduled exactly once


def test_duplicate_urls_deterministic_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "https://h.example.com/same") for i in range(5)],
        "k long, url string",
    )
    out = {
        r["k"]: r["fetch_wave"]
        for r in fetch_plan(df, order_cols=["url", "k"], rps_per_host=1.0).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


# ---------------------------------------------------------------------------
# robots.txt parser + gate (round 3)
# ---------------------------------------------------------------------------

def test_parse_robots_groups_and_precedence():
    from landlensdb_spark.operators.robots import parse_robots

    txt = """
# comment
User-agent: googlebot
Disallow: /g

User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2.5
"""
    rules, delay = parse_robots(txt, agent="*")
    assert rules == [("/private", False), ("/private/ok", True)]
    assert delay == 2.5
    # exact agent match beats *
    rules_g, delay_g = parse_robots(txt, agent="GoogleBot")
    assert rules_g == [("/g", False)] and delay_g is None
    # stacked user-agents share one rule group
    both = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(both, agent="b")[0] == [("/x", False)]
    # empty Disallow contributes no rule; absent robots -> no rules
    assert parse_robots("User-agent: *\nDisallow:\n")[0] == []
    assert parse_robots("")[0] == []


def test_gate_urls_longest_match_and_missing_host(spark):
    from landlensdb_spark.operators.robots import gate_urls

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\nCrawl-delay: 3\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("a.com", "/p/secret"),
            ("a.com", "/p/ok/fine"),
            ("a.com", "/open"),
            ("b.com", "/p/anything"),  # no robots entry -> allowed
        ],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): (r["allowed"], r["crawl_delay"])
        for r in gate_urls(urls, robots).collect()
    }
    assert got[("a.com", "/p/secret")] == (False, 3.0)
    assert got[("a.com", "/p/ok/fine")] == (True, 3.0)
    assert got[("a.com", "/open")] == (True, 3.0)
    assert got[("b.com", "/p/anything")] == (True, None)
