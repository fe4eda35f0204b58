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
