"""Graph analytics operators (beyond connected components, which lives
in operators/dedup.py next to its near-dup use case).

PageRank is the canonical iterative-shuffle workload: each round is one
join (ranks → edges on src) and one aggregation (sum contributions on
dst), both shuffling on node id. The loop is a driver ``for`` over a
fixed iteration count — rank frames are localCheckpoint-ed per round so
the plan stays one-round deep instead of growing O(iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_deg) over a directed edge list."""
    return edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
    checkpoint_every: int = 3,
    checkpoint_edges: bool = True,
) -> DataFrame:
    """PageRank by power iteration over a directed edge list; returns
    (node, rank) for every node appearing as src or dst.

    ``rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u)/out_deg(u)``

    Every node must have at least one out-edge (no dangling-mass
    redistribution — callers symmetrize undirected graphs, which
    guarantees it); raises ValueError otherwise. A FIXED iteration
    count (not a convergence test) keeps the computation a pure
    deterministic function of the edge set — the property that lets a
    SQL oracle replay it exactly.

    Scale shape: per round, one join shuffling ranks on node id and one
    map-side-combinable sum on dst. Edges and degrees are materialized
    once (localCheckpoint) before the loop; ranks re-checkpoint every
    ``checkpoint_every`` rounds so lineage depth stays bounded while
    the eager-job count shrinks — an every-round checkpoint pays one
    materialization job per round for no extra safety (measured 25% of
    the 3-round wall at sf0.1). Hot sink nodes skew only the dst agg,
    which partial aggregation absorbs; AQE splits a skewed rank join.
    """
    from archive_to_parquet_spark.plans.checkpoint import (
        checkpoint_partitioned,
    )

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        # callers that already guarantee a distinct edge list (e.g. the
        # union of a distinct pair set with its prefix-disjoint reverse)
        # pass assume_distinct=True and skip this corpus-sized shuffle
        e = e.distinct()
    if checkpoint_edges:
        # callers whose edge frame is already a cheap view over
        # materialized rows (e.g. a union of one checkpointed half with
        # its reverse — graph_pagerank) pass checkpoint_edges=False:
        # re-materializing the union here would only copy the blocks
        # (round 12; the scan profile showed the source table read once
        # per union branch because the checkpoint sat ABOVE the union)
        e = e.localCheckpoint()
    deg = out_degrees(e)
    # per-edge contribution weight (1/out_deg) is precomputed ONCE, so
    # rounds multiply instead of re-dividing. Computed with a count
    # window over src — ONE exchange of the edge list, where the
    # agg-then-join-back form pays the same exchange for the agg AND a
    # second one for the join (measured ~0.5 s of the sf0.1 setup).
    #
    # Round 11: the weighted edge list is materialized hash-partitioned
    # on ``src`` with the partitioning RECORDED through the checkpoint
    # (checkpoint_partitioned — the window's own exchange IS that
    # shuffle, so this costs nothing extra). A plain localCheckpoint
    # captured UnknownPartitioning, and with no stats on the LogicalRDD
    # the planner chose to BROADCAST the edge table into every round's
    # rank join — a full collect-and-build of the edge list per round
    # locally (r11 profile: 28.8/13.8/13.2 s executor time at sf0.1 in
    # the three broadcast-collect stages, the entry's dominant cost)
    # and an impossibility on a 100-TB edge list.
    w_src = Window.partitionBy("src")
    contrib_edges = checkpoint_partitioned(
        e.select(
            "src",
            "dst",
            (F.lit(1.0) / F.count(F.lit(1)).over(w_src)).alias("weight"),
        ),
        "src",
    )
    # One action answers all three validations (round 12): total node
    # count, nodes lacking an OUT-edge (dangling — an error), and nodes
    # lacking an IN-edge. The third is new: when every node has an
    # in-edge (true for any symmetrized graph — the entry's case), the
    # per-round `nodes LEFT JOIN contribs` exists only to re-attach
    # nodes that received no mass, i.e. it re-attaches NOTHING — the
    # groupBy(dst) already emits one row per node. Dropping it removes
    # one join + one exchange + one scan of the node list per round
    # (guide §2.4), and the node-list union/distinct/checkpoint setup
    # job with it. `full_outer` of the distinct-dst set against the
    # out-degree table sees the union of both node sets, so `n` is
    # counted over exactly the node universe the old code used.
    n, dangling, no_in = (
        e.select(F.col("dst").alias("node"))
        .distinct()
        .withColumn("has_in", F.lit(1))
        .join(deg, "node", "full_outer")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("out_deg").isNull(), 1).otherwise(0)).alias(
                "dangling"
            ),
            F.sum(F.when(F.col("has_in").isNull(), 1).otherwise(0)).alias(
                "no_in"
            ),
        )
        .first()
    )
    if dangling:
        raise ValueError(
            "pagerank requires every node to have an out-edge; "
            "symmetrize the edge list or drop sink nodes first"
        )
    base = (1.0 - damping) / n
    if no_in:
        # general path: some node never appears as dst — it must be
        # re-attached every round with base mass, so keep the node
        # list and the per-round left join
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
    else:
        # in-coverage path: every node appears as dst, so the seed is
        # simply the out-degree key set (== all nodes: no dangling)
        nodes = deg.select("node")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iter):
        # contrib_edges rides its recorded hash(src) partitioning, so
        # the round join moves only the small rank frame. The
        # SHUFFLE_HASH hint on the rank side pins the strategy the
        # true sizes imply: a per-partition hash build of the rank
        # rows with the edge side STREAMED — no broadcast of the edge
        # list (the checkpoint's under-estimated stats otherwise pick
        # exactly that, impossible at 100 TB), and no per-round sort
        # of the edge list (what a MERGE pin would cost; measured
        # 15-28 s executor per round at sf0.1). The groupBy(dst) is
        # the round's one shuffle.
        joined = contrib_edges.join(
            ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src",
        )
        if no_in:
            contribs = (
                joined.groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") * F.col("weight")).alias("in_mass"))
            )
            ranks = nodes.join(
                contribs.hint("shuffle_hash"), "node", "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        else:
            # same sum, same grouping, same float expression — the
            # affine transform just moves into the aggregate's result
            # projection since no row can be absent
            ranks = joined.groupBy(F.col("dst").alias("node")).agg(
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.sum(F.col("rank") * F.col("weight"))
                ).alias("rank")
            )
        # cut lineage on cadence, never after the final round (the
        # caller's action executes the tail rounds in one job)
        if (it + 1) % checkpoint_every == 0 and it < n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count over an UNDIRECTED simple graph (edges in
    either orientation; self-loops and duplicates removed here).

    Degree-ordered orientation — the standard scale trick: each edge is
    directed from its lower-degree endpoint to the higher (ties by node
    id), so every triangle is counted exactly ONCE (at its lowest-degree
    corner) and, decisively for skewed graphs, the wedge join's fan-out
    is bounded by the ORIENTED out-degree ≤ O(√m) instead of a hub's raw
    degree — a celebrity node with 10^7 neighbors contributes wedges
    only through its (few) higher-degree peers.

    Plan: canonicalize + distinct → degree agg → two joins on node id
    (wedge build, then closing-edge semi join). All shuffles key on node
    id / edge pairs; no broadcast assumptions, so it scales to edge sets
    far beyond memory. Returns one row: (n_nodes, n_edges, n_triangles).
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # canon feeds degrees, orientation, and the edge count; the
        # oriented set below feeds three join sides — localCheckpoint
        # both (the connected-components precedent) or every consumer
        # re-runs the upstream edge build: 36 scans / 58 exchanges
        # measured without, 3 scans with
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint()
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint()
    )
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.v") == F.col("e2.u")
    ).select(F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z"))
    closed = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("z")),
        ["x", "z"],
        "left_semi",
    )
    return (
        closed.agg(F.count("*").alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count("*").alias("n_nodes"))))
        .crossJoin(F.broadcast(canon.agg(F.count("*").alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )
