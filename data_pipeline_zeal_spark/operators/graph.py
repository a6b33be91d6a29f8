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


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of an undirected graph: node/edge counts,
    wedge (open 2-path) count, triangle count, and the global clustering
    coefficient 3*triangles/wedges — the standard cohesion summary for a
    co-occurrence graph.

    SCALE: the naive wedge enumeration joins every pair of edges sharing
    an endpoint — quadratic in the degree of hub nodes, which is exactly
    where 100 TB co-occurrence graphs blow up.  This kernel uses the
    classic degree orientation: direct every edge from its lower-
    (degree, id) endpoint to the higher one, making the graph a DAG where
    every node's OUT-degree is O(sqrt(|E|)); each triangle {{x,y,z}}
    survives as exactly one out-wedge (at its minimum-order vertex) plus
    one closing oriented edge, so the wedge self-join touches
    sum(out_deg^2) = O(|E|^1.5) rows instead of sum(deg^2), and no
    dedup-by-3!-orderings pass is needed.  All joins are equality joins
    on node ids; the canonical edge frame is localCheckpointed once and
    reused by the degree, wedge, and closing-edge stages.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    # Orient a->b when (deg_a, a) <= (deg_b, b); since a < b the tie
    # case keeps the canonical direction.
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(F.col("da") <= F.col("db"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("u"),
            F.when(F.col("da") <= F.col("db"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = (
        w1.join(w2, "u")
        .where(F.col("v1") != F.col("v2"))
        .join(closing, ["v1", "v2"])  # only one ordering closes in a DAG
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            # coalesce: SUM over an empty (edge-free) frame is NULL, not 0
            F.coalesce(
                F.sum(
                    (F.col("degree") * (F.col("degree") - 1) / 2).cast("long")
                ),
                F.lit(0),
            ).alias("n_wedges"),
        )
    )
    return counts.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                3.0 * F.col("n_triangles") / F.col("n_wedges")
            ),
            6,
        ).alias("clustering_coefficient"),
    )
