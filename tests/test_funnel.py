"""Ordered funnel (operators/funnel.py) — chain semantics, greedy
completeness, depth edges."""

from __future__ import annotations

import pytest

from landlensdb_spark.operators.funnel import funnel


def _run(spark, rows, steps=("a", "b", "c")):
    df = spark.createDataFrame(rows, "user_id int, t long, event_type string")
    return {
        r["user_id"]: tuple(r[c] for c in ("t_1", "t_2", "t_3", "depth"))
        for r in funnel(df, steps).collect()
    }


def test_chain_semantics(spark):
    rows = [
        # u1: full chain, earliest picks
        (1, 10, "a"), (1, 5, "a"), (1, 7, "b"), (1, 20, "b"), (1, 30, "c"),
        # u2: b before any a -> depth 1 only
        (2, 3, "b"), (2, 8, "a"),
        # u3: a then c (no b) -> depth 1, t_3 NULL even though c exists
        (3, 1, "a"), (3, 9, "c"),
        # u4: no step-1 at all -> depth 0
        (4, 2, "b"), (4, 3, "c"),
    ]
    got = _run(spark, rows)
    assert got[1] == (5, 7, 30, 3)  # earliest a=5, earliest b after it = 7
    assert got[2] == (8, None, None, 1)
    assert got[3] == (1, None, None, 1)
    assert got[4] == (None, None, None, 0)


def test_chain_earliest_is_seven(spark):
    # explicit: with a at 5, the first b after it is 7 (not 20)
    rows = [(1, 5, "a"), (1, 7, "b"), (1, 20, "b"), (1, 30, "c")]
    got = _run(spark, rows)
    assert got[1] == (5, 7, 30, 3)


def test_strictly_after(spark):
    # b at the SAME timestamp as a does not count
    rows = [(1, 5, "a"), (1, 5, "b"), (1, 9, "b")]
    got = _run(spark, rows)
    assert got[1] == (5, 9, None, 2)


def test_greedy_is_complete(spark):
    # later a (8) would chain to b at 9, but greedy a=2 also reaches it
    rows = [(1, 2, "a"), (1, 8, "a"), (1, 9, "b"), (1, 10, "c")]
    assert _run(spark, rows)[1] == (2, 9, 10, 3)


def test_empty_steps_raise(spark):
    df = spark.createDataFrame([(1, 1, "a")], "user_id int, t long, event_type string")
    with pytest.raises(ValueError, match="steps"):
        funnel(df, ())


def test_retention_cohorts_semantics(spark):
    from landlensdb_spark.operators.funnel import retention_cohorts

    rows = [
        # u1 first in period 0, active 0 and 2
        (1, 5), (1, 25),
        # u2 first in period 1, active 1 only (two events same period
        # count once)
        (2, 11), (2, 13),
        # u3 first in period 0, active 0,1,2
        (3, 0), (3, 10), (3, 20),
    ]
    df = spark.createDataFrame(rows, "user_id int, t long")
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in retention_cohorts(df, period_s=10).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}
    import pytest as _pt

    with _pt.raises(ValueError, match="period_s"):
        retention_cohorts(df, period_s=0)


def test_funnel_random_streams_match_bruteforce(spark):
    """Randomized property check: the window-chain plan equals the
    obvious per-user greedy python fold on arbitrary event streams."""
    import numpy as np

    rng = np.random.default_rng(17)
    evs = ["a", "b", "c", "x"]
    rows = []
    for u in range(25):
        n = int(rng.integers(0, 15))
        ts = rng.choice(10_000, size=n, replace=False)
        for t in ts:
            rows.append((u, int(t), evs[int(rng.integers(0, 4))]))
    rows.append((99, 1, "x"))  # user with no funnel steps at all
    got = _run(spark, rows)

    def brute(user_rows):
        seq = sorted(user_rows)
        out, prev = [], None
        for step in ("a", "b", "c"):
            cand = [t for t, e in seq if e == step and (prev is None or t > prev)]
            if not cand:
                break
            prev = min(cand)
            out.append(prev)
        return tuple(out + [None] * (3 - len(out)) + [len(out)])

    import collections

    by_u = collections.defaultdict(list)
    for u, t, e in rows:
        by_u[u].append((t, e))
    for u, ur in by_u.items():
        assert got[u] == brute(ur), u


def test_retention_random_match_bruteforce(spark):
    import collections

    import numpy as np

    from landlensdb_spark.operators.funnel import retention_cohorts

    rng = np.random.default_rng(29)
    rows = []
    for u in range(40):
        n = int(rng.integers(1, 20))
        for t in rng.choice(3_000, size=n, replace=False):
            rows.append((u, int(t)))
    df = spark.createDataFrame(rows, "user_id int, t long")
    period = 100
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in retention_cohorts(df, period_s=period).collect()
    }
    by_u = collections.defaultdict(set)
    for u, t in rows:
        by_u[u].add(t // period)
    want = collections.Counter()
    for u, ps in by_u.items():
        c = min(ps)
        for p in ps:
            want[(c, p - c)] += 1
    assert got == dict(want)
