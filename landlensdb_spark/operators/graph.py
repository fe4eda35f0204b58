"""Link-graph analytics: distributed PageRank over a host/page edge list.

A web corpus is also a graph; crawl prioritization and quality weighting
use link centrality (the reference's network prep builds a road graph and
keeps its largest component, network_prep.py — this is the web-link
counterpart). PageRank here is the textbook damped power iteration,
expressed as DataFrame joins so it runs at any scale:

    rank_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} rank_t(u)/outdeg(u)
                                    + dangling_mass_t / N )

Execution shape per iteration: one equi-join (edges x current ranks, on
the src id) + one map-side-combined groupBy(dst) + a broadcast of the two
global scalars (dangling mass, N). The edge list is the big side and is
never re-keyed between iterations — re-use a persisted, pre-partitioned
edges DataFrame so every iteration's join shuffles ONLY the (much
smaller) rank table. A fixed iteration count with deterministic float
math makes the result engine-exact at 6dp, so the oracle unrolls the same
iterations as chained SQL CTEs.

Lineage note at scale: each iteration extends the plan; for big iteration
counts checkpoint/localCheckpoint every ~10 rounds to cut the DAG. The
default here is a small fixed count (the oracle unrolls the same N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: observability hook (tests/profiling): relaxation/peel rounds actually
#: executed by the most recent shortest_paths / k_core call.
_LAST_ROUNDS: dict[str, int | None] = {"shortest_paths": None, "k_core": None}


#: truncate lineage every N iterations: each power step references the
#: previous ranks TWICE (dangling mass + contributions), so the logical
#: plan doubles per iteration — unbounded iteration counts need a
#: materialization point or plan analysis itself becomes exponential.
CHECKPOINT_EVERY = 4


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power steps.

    Nodes are every id appearing as src OR dst; ranks start uniform at
    1/N; dangling nodes (no out-edges) redistribute their mass uniformly.
    Ranks are rounded to 6dp at the END only.
    """
    # every iteration joins the edge list and the degree table; materialize
    # both once so an expensive edges lineage is never re-executed per round
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg")).localCheckpoint(
        eager=True
    )
    n_nodes = nodes.count()  # one bounded action; N is a plan constant below
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))  # empty in, empty out
    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))

    for it in range(iterations):
        if it and it % CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=True)
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["_s"], "left"
        ).select("node", "rank", "_deg")
        # dangling mass: total rank sitting on nodes with no out-edges
        dangling = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            e.join(with_deg.filter(F.col("_deg").isNotNull()), e["_s"] == F.col("node"))
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph:
    rows ``(node, n_triangles)`` for every node of ``edges`` (0 when the
    node closes no triangle). Input direction/duplication is irrelevant —
    edges canonicalize to unordered distinct pairs; self-loops drop.

    Degree-oriented enumeration (Cohen's MapReduce formulation / Suri &
    Vassilvitskii WWW'11, public): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one — an acyclic
    orientation whose max out-degree is O(sqrt(|E|)) on ANY graph, so the
    wedge self-join (the quadratic step in naive triangle counting, and
    the skew bomb on power-law webgraphs: a degree-10^7 hub emits 10^14
    wedges undirected) emits at most sum(outdeg^2) <= |E|*sqrt(|E|)
    candidates, evenly spread across low-degree sources. Each triangle is
    then found exactly once (its unique orientation-source), and per-node
    counts are one explode + map-side-combined groupBy.

    Every step is an equi-join / groupBy on ids — AQE-splittable, no
    windows, no Python. The driver oracle counts triangles with the
    INDEPENDENT naive node-ordered triple self-join (affordable at
    sf0.01, not at web scale), so the orientation machinery is verified
    against plain set semantics, not against itself.
    """
    u, v = F.col(src), F.col(dst)
    canon = (
        edges.filter(u != v)
        .select(
            F.least(u, v).alias("_u"), F.greatest(u, v).alias("_v")
        )
        .distinct()
    )
    deg = (
        canon.select(F.col("_u").alias("node"))
        .unionAll(canon.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    # orient by (degree, id): rank both endpoints, flip edges whose source
    # outranks its destination
    ranked = (
        canon.join(deg.withColumnRenamed("node", "_u"), "_u")
        .withColumnRenamed("_deg", "_du")
        .join(deg.withColumnRenamed("node", "_v"), "_v")
        .withColumnRenamed("_deg", "_dv")
    )
    fwd = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("_u")).otherwise(F.col("_v")).alias("_s"),
        F.when(fwd, F.col("_v")).otherwise(F.col("_u")).alias("_d"),
        F.when(fwd, F.col("_du")).otherwise(F.col("_dv")).alias("_ds"),
        F.when(fwd, F.col("_dv")).otherwise(F.col("_du")).alias("_dd"),
    )
    # wedges from a common source x -> {y, z} with rank(y) < rank(z); the
    # closing edge {y, z}, if present, is oriented y -> z by transitivity
    e1 = oriented.select(
        F.col("_s").alias("_x"), F.col("_d").alias("_y"),
        F.col("_dd").alias("_dy"),
    )
    e2 = oriented.select(
        F.col("_s").alias("_x"), F.col("_d").alias("_z"),
        F.col("_dd").alias("_dz"),
    )
    wedges = e1.join(e2, "_x").filter(
        (F.col("_dy") < F.col("_dz"))
        | ((F.col("_dy") == F.col("_dz")) & (F.col("_y") < F.col("_z")))
    )
    closing = oriented.select(
        F.col("_s").alias("_y"), F.col("_d").alias("_z")
    )
    tri = wedges.join(closing, ["_y", "_z"]).select("_x", "_y", "_z")
    members = (
        tri.select(F.explode(F.array("_x", "_y", "_z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(members, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    iterations: int = 20,
    directed: bool = True,
    verify_convergence: bool = True,
    until_converged: bool = False,
) -> DataFrame:
    """Single/multi-source shortest paths — join-based Bellman-Ford:
    ``(node, dist)`` for every node reachable from ``sources`` (a
    one-column ``node`` DataFrame; unreachable nodes are absent). The
    routing primitive next to :func:`pagerank` / :func:`triangle_counts`
    (reference parity: the networkx shortest-path calls behind
    road_network.py's nearest-road routing — here distributed, because
    a 10^9-edge road graph fits no driver).

    Per round: one edge equi-join + two map-side-combined min
    aggregates — label state is (node, dist), never paths. With
    integral weights every distance is exact int64 (hashable
    cross-engine). Like :func:`~landlensdb_spark.operators.dedup.
    dup_clusters`, the round count is FIXED (a pure function of the
    input, reproducible by an unrolled-SQL oracle) and
    ``verify_convergence`` runs one extra relaxation and raises if any
    distance would still drop — a converged Bellman-Ford fixpoint IS
    the true distance vector, so the guard turns the fixed-round result
    into a certified answer. Negative weights raise immediately
    (Bellman-Ford detects nothing useful here; the engine's graphs are
    metric).

    ``until_converged=True`` (r08, opt-in — oracle rows keep the fixed
    round count) checks the fixpoint at every lineage-truncation
    boundary (every 4 rounds, one bounded ``(count, sum)`` aggregate)
    and stops early: distances only decrease and nodes only join, so an
    unchanged (count, sum(dist)) across a boundary proves the label
    vector is already the Bellman-Ford fixpoint — i.e. the certified
    answer — and the remaining edge-join rounds are pure waste (a
    diameter-6 graph under the default ``iterations=20`` otherwise pays
    14 dead shuffles). The early exit certifies convergence by the same
    argument, so the ``verify_convergence`` extra relaxation is skipped
    when it fires."""
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(w).alias("_w")
    )
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias("_s"), F.col(src).alias("_d"), F.col(w).alias("_w")
            )
        )
    neg = e.filter(F.col("_w") < 0).limit(1).count()
    if neg:
        raise ValueError("shortest_paths: negative edge weights are not supported")
    e = e.localCheckpoint(eager=True)
    dists = sources.select(F.col("node"), F.lit(0).cast("long").alias("dist"))

    def _relax(d: DataFrame) -> DataFrame:
        nd = (
            e.join(d, e["_s"] == d["node"])
            .select(F.col("_d").alias("node"), (F.col("dist") + F.col("_w")).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        return (
            d.unionByName(nd).groupBy("node").agg(F.min("dist").alias("dist"))
        )

    prev_stats = None
    converged = False
    rounds = 0
    for it in range(iterations):
        if it and it % 4 == 0:
            dists = dists.localCheckpoint(eager=True)
            if until_converged:
                stats = tuple(dists.agg(F.count("*"), F.sum("dist")).first())
                if stats == prev_stats:
                    # count equal -> same node set across the window (nodes
                    # never leave); then per-node dists are non-increasing,
                    # so sum equal -> every dist equal -> relax() is a
                    # no-op: certified fixpoint, stop.
                    converged = True
                    break
                prev_stats = stats
        dists = _relax(dists)
        rounds += 1
    _LAST_ROUNDS["shortest_paths"] = rounds
    if verify_convergence and not converged:
        dists = dists.localCheckpoint(eager=True)
        improved = (
            _relax(dists)
            .join(dists.withColumnRenamed("dist", "_old"), "node", "left")
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .count()
        )
        if improved:
            raise ValueError(
                f"shortest_paths did not converge in {iterations} iterations: "
                f"{improved} distances would still drop; raise `iterations`"
            )
    return dists


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 20,
    verify_convergence: bool = True,
    until_converged: bool = False,
) -> DataFrame:
    """The k-core — the maximal subgraph in which every node has degree
    >= ``k`` — by iterative degree peeling (the density filter behind
    web-community extraction / spam-farm detection on host graphs).
    Input is an undirected edge list (direction/duplicates/self-loops
    normalized away, same canonicalization as :func:`triangle_counts`);
    output is ``(node, degree)`` within the surviving core (empty when
    the core is empty).

    Per round: one degree aggregate + two semi-joins dropping edges
    incident to sub-``k`` nodes — edge-list-sized state, no adjacency
    materialization. The round count is FIXED (SQL-reproducible by an
    unrolled oracle) and ``verify_convergence`` runs one extra peel and
    raises if any node would still fall — a fixpoint where every degree
    is >= ``k`` IS the k-core (it is the union of all such subgraphs),
    so the fixed-round result is certified, never silently unpeeled.

    ``until_converged=True`` (r08, opt-in — oracle rows keep the fixed
    round count) checks the edge count at every lineage-truncation
    boundary (every 4 rounds, one bounded count): edges only ever peel
    away, so an unchanged count across a boundary proves the peel is a
    no-op — certified fixpoint — and the remaining rounds are skipped
    (the ``verify_convergence`` extra peel too)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    e = (
        edges.select(
            F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _peel(cur: DataFrame) -> DataFrame:
        deg = (
            cur.select(F.col("_a").alias("node"))
            .unionByName(cur.select(F.col("_b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("_deg"))
        )
        keep = deg.filter(F.col("_deg") >= F.lit(int(k))).select("node")
        return cur.join(
            keep.withColumnRenamed("node", "_a"), "_a", "left_semi"
        ).join(keep.withColumnRenamed("node", "_b"), "_b", "left_semi")

    cur = e
    prev_cnt = None
    converged = False
    rounds = 0
    for it in range(iterations):
        if it and it % 4 == 0:
            cur = cur.localCheckpoint(eager=True)
            if until_converged:
                cnt = cur.count()
                if cnt == prev_cnt:
                    # edges only peel away: an unchanged count across the
                    # 4-round window proves _peel is a no-op — certified
                    # fixpoint, stop.
                    converged = True
                    break
                prev_cnt = cnt
        cur = _peel(cur)
        rounds += 1
    _LAST_ROUNDS["k_core"] = rounds
    cur = cur.localCheckpoint(eager=True)
    if verify_convergence and not converged:
        dropped = cur.count() - _peel(cur).count()
        if dropped:
            raise ValueError(
                f"k_core did not converge in {iterations} iterations: "
                f"{dropped} edges would still peel; raise `iterations`"
            )
    return (
        cur.select(F.col("_a").alias("node"))
        .unionByName(cur.select(F.col("_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
