"""Weighted single-source shortest paths as frontier Bellman-Ford
supersteps (the Pregel-standard SSSP).

Extends the reference's unit-weight Dijkstra semantics
(shortest_paths.rs:19-77) to the weighted graphs its weighted builder
produces (weighted_undirected_graph_builder.rs:21-73): distance = the
minimum total edge weight from the source; ``hops`` = the edge count of
the minimum-hop path among the minimum-weight paths (the round at which
the label-correcting fixpoint last improved the vertex — deterministic
because relaxation is round-synchronous).

Scale shape: each round is one shuffle-join of the adjacency against
the previous round's improved frontier plus a min-combine per
destination — the message volume decays with the frontier, exactly like
the BFS/CC supersteps.  Spark's map-side partial ``min`` combines
messages before the exchange, so hub destinations never concentrate raw
messages on one reducer.  For graphs with very long weighted diameters
a delta-stepping bucketing would cap round counts; the round count here
is bounded by the hop length of the longest minimum-hop shortest path,
which on web/social topologies is the same small number that bounds the
BFS depth.

Requires non-negative weights (termination of label-correcting
relaxation); raises after ``max_rounds`` otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_sssp(
    edges: DataFrame, source: int, max_rounds: int = 10000
) -> DataFrame:
    """DataFrame[v, dist, hops] for vertices reachable from ``source``
    over directed weighted edges (src, dst, weight); symmetrize upstream
    for undirected semantics.

    Lineage discipline (see operators/paths.py:18): each round reads the
    previous state twice (frontier filter + full-outer fold), so the
    uncut plan doubles per round — every 3 rounds the state is rebased
    onto an eager ``cut_lineage`` leaf and the frontier re-derived as
    ``hops == round`` from that leaf; superseded persisted states are
    released only once a lineage-free successor has materialized
    (the deferred-release window).
    """
    from ..plans.superstep import cut_lineage, release

    spark = edges.sparkSession
    adj = edges.select("src", "dst", "weight").repartition("src").persist()
    adj.count()
    dist = spark.createDataFrame(
        [(int(source), 0.0, 0)], "v long, dist double, hops int"
    ).persist()
    rnd = 0
    window: list = []
    while rnd < max_rounds:
        rnd += 1
        frontier = dist.filter(F.col("hops") == rnd - 1)
        best = (
            adj.join(frontier, adj.src == frontier.v)
            .select(
                F.col("dst").alias("v"),
                (F.col("dist") + F.col("weight")).alias("cand"),
            )
            .groupBy("v")
            .agg(F.min("cand").alias("cand"))
        )
        prev = dist.select(
            "v", F.col("dist").alias("old_dist"), F.col("hops").alias("old_hops")
        )
        improved = (F.col("old_dist").isNull()) | (
            F.col("cand") < F.col("old_dist")
        )
        new_dist = (
            prev.join(best, "v", "full_outer")
            .select(
                "v",
                F.when(improved, F.col("cand"))
                .otherwise(F.col("old_dist"))
                .alias("dist"),
                F.when(improved, F.lit(rnd))
                .otherwise(F.col("old_hops"))
                .alias("hops"),
            )
        )
        if rnd % 3 == 0:
            new_dist = cut_lineage(new_dist)  # eager: lineage-free leaf
            for p in (*window, dist):
                release(p)
            window.clear()
        else:
            new_dist = new_dist.persist()
            window.append(dist)
        # one action per round: materializes new_dist AND counts improved
        n_improved = new_dist.agg(
            F.sum((F.col("hops") == rnd).cast("long")).alias("n")
        ).collect()[0][0]
        dist = new_dist
        if not n_improved:
            break
    else:
        raise RuntimeError(
            f"weighted_sssp did not converge in {max_rounds} rounds "
            "(negative edge weights, or raise max_rounds)"
        )
    if window:
        prev_state = dist
        dist = cut_lineage(dist)
        for p in (*window, prev_state):
            release(p)
        window.clear()
    adj.unpersist()
    # the termination round improved nothing, so every hops value is the
    # round its dist was finalized; the source keeps hops = 0
    return dist
