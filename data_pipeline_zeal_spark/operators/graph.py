"""[EXT] Graph operators over edge DataFrames.

PageRank as a fixed-iteration power method expressed with joins and
aggregates — the iterative-algorithm family next to the min-label
connected components in ``dedup.connected_components``.  No GraphX/
GraphFrames dependency: an edge list is just a DataFrame, and one
power-method step is one equality join plus one key aggregate, which is
exactly what a distributed Pregel superstep compiles to anyway.

Scale notes (100 TB bar):
* Edges are normalized ONCE (out-weight per source, one aggregate +
  one join) and the normalized edge frame is reused every iteration —
  at scale it should be persisted/bucketed by ``dst`` so each step's
  join is co-partitioned and the only moving data is the (node, rank)
  frame, which is |V| rows, not |E|.
* Each iteration is join-on-src → groupBy(dst): two exchanges of
  bounded width; ``iterations`` is a fixed small constant (power-method
  convergence is geometric in the damping factor), so the lineage stays
  shallow — no checkpoint needed for <= ~10 steps.
* Dangling mass: nodes with no out-edges would leak rank.  Callers with
  dangling nodes should symmetrize or pre-prune; the kernel asserts
  nothing and simply redistributes (1 - damping)/N per step, matching
  the standard formulation without a per-step driver round-trip (a
  global dangling-sum needs a scalar broadcast per iteration — a
  deliberate non-feature; symmetric graphs, the common similarity /
  co-occurrence case, have no dangling nodes by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    broadcast_nodes_max: int = 5_000_000,
) -> DataFrame:
    """Weighted PageRank after a fixed number of power iterations.

    ``edges`` is a directed edge list; ``weight`` of None means
    unweighted (every edge counts 1).  Returns (node, rank) for every
    node that appears as a source or destination, from a uniform 1/N
    start — deterministic, so it is oracle-checkable by unrolling the
    same iterations in SQL.
    """
    w = F.col(weight) if weight is not None else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.cast("double").alias("w")
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # Transition probability src -> dst.  Materialized ONCE
    # (localCheckpoint truncates the upstream lineage — often an
    # expensive pair-generation join) and reused by every iteration;
    # without this each superstep would re-run the whole edge pipeline.
    trans = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    ).localCheckpoint(eager=True)
    nodes = (
        trans.select(F.col("src").alias("node"))
        .unionByName(trans.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()  # one scalar; node count, not data volume
    if n == 0:  # empty edge frame: no nodes, no ranks — avoid 1/0 below
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n
    # The rank frame is |V| rows — tiny next to the edge frame.  While it
    # fits the broadcast budget, hint it on BOTH per-iteration joins so the
    # (much larger, already-checkpointed) transition frame never moves:
    # each superstep then shuffles only the partial in-rank sums (≈|V| rows
    # per map partition), not |E| edges.  Past the threshold the joins fall
    # back to hash exchanges on uniform keys — the standard Pregel shape.
    small_ranks = n <= broadcast_nodes_max
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        r = F.broadcast(ranks) if small_ranks else ranks
        contrib = (
            trans.join(r, trans["src"] == r["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_rank"))
        )
        c = F.broadcast(contrib) if small_ranks else contrib
        ranks = (
            nodes.join(c, nodes["node"] == c["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks


def degree_histogram(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree distribution of an undirected edge list: how many nodes
    have each total degree — the first sanity plot on any graph (spot
    hubs, disconnected dust, power-law shape) and the input to skew
    planning for the join-based graph kernels above.

    Two bounded aggregates: per-node degree (shuffle on node id), then
    a count per degree value (shuffle on degree — at most #distinct
    degrees rows)."""
    ends = edges.select(F.col(src).alias("node")).unionByName(
        edges.select(F.col(dst).alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )
