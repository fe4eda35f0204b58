"""Trajectory resampling (operators/tracks.py) — tick placement,
half-open segment semantics, lerp exactness, fan-out guard."""

from __future__ import annotations

import pytest

from landlensdb_spark.operators.tracks import resample_tracks


def _rows(spark, rows):
    df = spark.createDataFrame(rows, "user_id int, t long, lon double, lat double")
    return sorted(
        (r["user_id"], r["tick"], r["lon"], r["lat"])
        for r in resample_tracks(df, step_s=10).collect()
    )


def test_ticks_and_lerp(spark):
    # fixes at t=5 (0,0) and t=35 (30,60): ticks 10, 20, 30 (t=35 has no
    # following fix -> nothing at/after 35). Linear: lon = t-5, lat = 2(t-5)
    got = _rows(spark, [(1, 5, 0.0, 0.0), (1, 35, 30.0, 60.0)])
    assert got == [
        (1, 10, 5.0, 10.0),
        (1, 20, 15.0, 30.0),
        (1, 30, 25.0, 50.0),
    ]


def test_half_open_tick_on_fix_belongs_to_next_segment(spark):
    # fix exactly on a tick (t=10): emitted once, from the segment that
    # STARTS there, with the fix's own coordinates
    got = _rows(spark, [(1, 0, 0.0, 0.0), (1, 10, 4.0, 8.0), (1, 20, 8.0, 16.0)])
    assert (1, 10, 4.0, 8.0) in got
    assert len([g for g in got if g[1] == 10]) == 1
    assert got[0] == (1, 0, 0.0, 0.0)  # tick on the FIRST fix still emits


def test_single_fix_and_gap_shorter_than_step(spark):
    assert _rows(spark, [(1, 3, 1.0, 1.0)]) == []
    # both fixes inside one step window with no tick between
    assert _rows(spark, [(1, 11, 1.0, 1.0), (1, 14, 2.0, 2.0)]) == []


def test_entities_independent(spark):
    got = _rows(spark, [(1, 0, 0.0, 0.0), (1, 20, 20.0, 0.0),
                        (2, 0, 100.0, 0.0), (2, 20, 120.0, 0.0)])
    assert (1, 10, 10.0, 0.0) in got and (2, 10, 110.0, 0.0) in got


def test_fanout_guard_and_step_validation(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 10**9, 1.0, 1.0)],
        "user_id int, t long, lon double, lat double",
    )
    with pytest.raises(Exception, match="raise step_s"):
        resample_tracks(df, step_s=10, max_ticks_per_segment=100).collect()
    with pytest.raises(ValueError, match="step_s"):
        resample_tracks(df, step_s=0)


def test_resample_random_tracks_match_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(23)
    rows = []
    for u in range(12):
        n = int(rng.integers(1, 12))
        ts = np.sort(rng.choice(5_000, size=n, replace=False))
        for t in ts:
            rows.append((u, int(t), float(rng.integers(0, 100)), float(rng.integers(0, 100))))
    df = spark.createDataFrame(rows, "user_id int, t long, lon double, lat double")
    step = 37
    got = sorted(
        (r["user_id"], r["tick"], r["lon"], r["lat"])
        for r in resample_tracks(df, step_s=step).collect()
    )
    import collections

    by_u = collections.defaultdict(list)
    for u, t, lo, la in rows:
        by_u[u].append((t, lo, la))
    want = []
    for u, fixes in by_u.items():
        fixes.sort()
        for (t0, lo0, la0), (t1, lo1, la1) in zip(fixes, fixes[1:]):
            k = -(-t0 // step) * step
            while k < t1:
                f = float(k - t0) / float(t1 - t0)
                want.append((u, k, lo0 + (lo1 - lo0) * f, la0 + (la1 - la0) * f))
                k += step
    assert got == sorted(want)


def test_od_matrix_semantics(spark):
    from landlensdb_spark.operators.tracks import od_matrix

    rows = [
        (1, 1, 10), (1, 2, 20), (1, 3, 20), (1, 4, 10),  # 10->20, 20=20 loop, 20->10
        (2, 1, 10), (2, 2, 20),                           # 10->20
    ]
    df = spark.createDataFrame(rows, "user_id int, t long, cell long")
    got = {
        (r["from_cell"], r["to_cell"]): r["n_trips"]
        for r in od_matrix(df).collect()
    }
    assert got == {(10, 20): 2, (20, 10): 1}
    with_loops = {
        (r["from_cell"], r["to_cell"]): r["n_trips"]
        for r in od_matrix(df, drop_loops=False).collect()
    }
    assert with_loops == {(10, 20): 2, (20, 20): 1, (20, 10): 1}
