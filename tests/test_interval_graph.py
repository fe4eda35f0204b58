"""Bucketized interval join (operators/interval.py) and degree-oriented
triangle counting (operators/graph.py triangle_counts)."""

from __future__ import annotations

import pytest
from pyspark.errors import SparkRuntimeException
from pyspark.sql import functions as F

from landlensdb_spark.operators.graph import triangle_counts
from landlensdb_spark.operators.interval import interval_join


def _pts(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "pid long, p long")


def _ivs(spark, rows):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rows)], "iid long, s long, e long"
    )


def test_interval_semantics(spark):
    pts = _pts(spark, [5, 10, 20, 99, 1000])
    ivs = _ivs(spark, [(10, 20), (15, 30), (50, 40)])  # last is inverted -> empty
    out = interval_join(pts, ivs, "p", "s", "e", bucket_width=7)
    got = sorted((r.p, r.iid) for r in out.collect())
    # closed interval: 10 and 20 both match [10,20]; 20 also matches [15,30]
    assert got == [(10, 0), (20, 0), (20, 1)]


@pytest.mark.parametrize("bw", [1, 3, 10, 1000, 10**9])
def test_interval_bucket_width_invariance(spark, bw):
    pts = _pts(spark, list(range(0, 200, 7)))
    ivs = _ivs(spark, [(10, 40), (40, 40), (100, 163), (150, 151)])
    out = interval_join(pts, ivs, "p", "s", "e", bucket_width=bw)
    got = sorted((r.p, r.iid) for r in out.collect())
    want = sorted(
        (p, i)
        for p in range(0, 200, 7)
        for i, (s, e) in enumerate([(10, 40), (40, 40), (100, 163), (150, 151)])
        if s <= p <= e
    )
    assert got == want


def test_interval_key_scoping(spark):
    pts = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], "pid long, p long, k string")
    ivs = spark.createDataFrame([(7, 0, 100, "a")], "iid long, s long, e long, k string")
    out = interval_join(pts, ivs, "p", "s", "e", bucket_width=50, key="k")
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 7)]


def test_interval_fanout_guard(spark):
    pts = _pts(spark, [5])
    ivs = _ivs(spark, [(0, 10**9)])
    bad = interval_join(pts, ivs, "p", "s", "e", bucket_width=10, max_fanout=100)
    with pytest.raises(SparkRuntimeException, match="spans > 100 buckets"):
        bad.collect()


def test_interval_validation(spark):
    pts = _pts(spark, [1])
    ivs = _ivs(spark, [(0, 1)])
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, ivs, "p", "s", "e", bucket_width=0)
    with pytest.raises(ValueError, match="colliding"):
        interval_join(pts, ivs.withColumnRenamed("iid", "pid"), "p", "s", "e", 10)


def test_interval_plan_shape(spark):
    pts = _pts(spark, [1, 2, 3])
    ivs = _ivs(spark, [(0, 1)])
    plan = (
        interval_join(pts, ivs, "p", "s", "e", bucket_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- triangles ---


def _tri(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def test_triangles_known_graphs(spark):
    # K4: every node sits in C(3,2) = 3 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # path and star: triangle-free
    assert _tri(spark, [(0, 1), (1, 2), (2, 3)]) == {0: 0, 1: 0, 2: 0, 3: 0}
    assert _tri(spark, [(0, i) for i in range(1, 5)]) == {i: 0 for i in range(5)}
    # two triangles sharing edge (1,2)
    bowtie = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert _tri(spark, bowtie) == {0: 1, 1: 2, 2: 2, 3: 1}


def test_triangles_input_canonicalization(spark):
    base = [(0, 1), (0, 2), (1, 2)]
    messy = base + [(b, a) for a, b in base] + base + [(1, 1), (2, 2)]
    assert _tri(spark, messy) == _tri(spark, base) == {0: 1, 1: 1, 2: 1}


def test_triangles_vs_naive_random_graph(spark):
    # deterministic irregular graph: ~20% of pairs over 30 nodes, picked
    # by a quadratic residue rule (degree-diverse, many triangles)
    pairs = [
        (a, b)
        for a in range(30)
        for b in range(30)
        if a < b and (a * a + b * b + a * b) % 5 == 0
    ]
    got = _tri(spark, pairs)
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = {n for e in edges for n in e}
    naive = dict.fromkeys(nodes, 0)
    es = sorted(edges)
    for a, b in es:
        for c in nodes:
            if c > b and (a, c) in edges and (b, c) in edges:
                for n in (a, b, c):
                    naive[n] += 1
    assert got == naive
    assert sum(naive.values()) > 0  # the graph actually has triangles


def test_triangles_plan_shape(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_shortest_paths_matches_dijkstra(spark):
    """Random weighted graphs (directed and undirected) vs a plain heap
    Dijkstra; unreachable nodes absent; convergence guard raises when
    under-provisioned; negative weights refused."""
    import heapq

    import numpy as np
    import pytest as _pt

    from landlensdb_spark.operators.graph import shortest_paths

    rng = np.random.default_rng(31)

    def dijkstra(edges, n, directed):
        adj = {}
        for s, d, w in edges:
            adj.setdefault(s, []).append((d, w))
            if not directed:
                adj.setdefault(d, []).append((s, w))
        dist, heap = {0: 0}, [(0, 0)]
        while heap:
            du, u = heapq.heappop(heap)
            if du > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = du + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        return dist

    for directed in (True, False):
        n = 30
        m = 70
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)), int(rng.integers(1, 20)))
            for _ in range(m)
        ]
        df = spark.createDataFrame(edges, "src long, dst long, w long")
        srcs = spark.createDataFrame([(0,)], "node long")
        got = {
            r["node"]: r["dist"]
            for r in shortest_paths(
                df, srcs, iterations=n, directed=directed
            ).collect()
        }
        assert got == dijkstra(edges, n, directed), directed

    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], "src long, dst long, w long"
    )
    srcs = spark.createDataFrame([(0,)], "node long")
    with _pt.raises(ValueError, match="did not converge"):
        shortest_paths(chain, srcs, iterations=3)
    neg = spark.createDataFrame([(0, 1, -2)], "src long, dst long, w long")
    with _pt.raises(ValueError, match="negative"):
        shortest_paths(neg, srcs, iterations=2)


def test_k_core_matches_bruteforce(spark):
    """Random graphs vs an in-python peel; empty core; guard raises
    when rounds are too few; canonicalization (dup/self-loop/reversed
    edges) handled."""
    import collections

    import numpy as np
    import pytest as _pt

    from landlensdb_spark.operators.graph import k_core

    rng = np.random.default_rng(37)

    def brute(edges, k):
        es = {(min(s, d), max(s, d)) for s, d in edges if s != d}
        while True:
            deg = collections.Counter()
            for s, d in es:
                deg[s] += 1
                deg[d] += 1
            keep = {n for n, c in deg.items() if c >= k}
            ns = {(s, d) for s, d in es if s in keep and d in keep}
            if ns == es:
                break
            es = ns
        deg = collections.Counter()
        for s, d in es:
            deg[s] += 1
            deg[d] += 1
        return dict(deg)

    for k in (2, 3, 5):
        edges = [
            (int(rng.integers(0, 25)), int(rng.integers(0, 25))) for _ in range(80)
        ]
        # duplicates + reversed copies + self-loops must not matter
        noisy = edges + [(d, s) for s, d in edges[:20]] + [(7, 7)]
        df = spark.createDataFrame(noisy, "src long, dst long")
        got = {r["node"]: r["degree"] for r in k_core(df, k, iterations=25).collect()}
        assert got == brute(edges, k), k

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    # 2-core of a path is empty but needs several peel rounds
    with _pt.raises(ValueError, match="did not converge"):
        k_core(chain, 2, iterations=1)
    assert k_core(chain, 2, iterations=8).count() == 0
    with _pt.raises(ValueError, match="k must be"):
        k_core(chain, 0)


def test_until_converged_early_exit_identical_output(spark):
    """r08: opt-in early exit stops at a lineage-truncation boundary once
    the fixpoint is certified, with output identical to the fixed-round
    run (oracle rows keep fixed rounds; this is the non-oracle caller's
    escape from dead shuffle rounds)."""
    from landlensdb_spark.operators import graph as G

    # small-diameter weighted graph: star + one chain hop (diameter ~3)
    edges = spark.createDataFrame(
        [(0, i, 1) for i in range(1, 6)] + [(5, 6, 2), (6, 7, 3)],
        "src long, dst long, w long",
    )
    srcs = spark.createDataFrame([(0,)], "node long")
    fixed = {
        (r["node"], r["dist"])
        for r in G.shortest_paths(edges, srcs, iterations=20).collect()
    }
    early = {
        (r["node"], r["dist"])
        for r in G.shortest_paths(
            edges, srcs, iterations=20, until_converged=True
        ).collect()
    }
    assert early == fixed
    assert G._LAST_ROUNDS["shortest_paths"] < 20  # stopped at a boundary

    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src long, dst long"
    )
    fixed_core = {
        (r["node"], r["degree"]) for r in G.k_core(tri, 2, iterations=20).collect()
    }
    early_core = {
        (r["node"], r["degree"])
        for r in G.k_core(tri, 2, iterations=20, until_converged=True).collect()
    }
    assert early_core == fixed_core
    assert G._LAST_ROUNDS["k_core"] < 20
