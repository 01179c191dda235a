"""Distributed maximal matching — greedy by a fixed priority order.

The reference's connectivity family (connected_components.rs,
connectivity.rs) gives reachability; a web-scale link-graph engine also
needs the edge-side symmetry-breaking primitive: maximal matching is the
standard building block for coarsening (multilevel partitioners pair
matched vertices), one-to-one host/page canonical-pairing, and load
balancing (Israeli & Itai 1986, "A fast and simple randomized parallel
algorithm for maximal matching").

Determinism and the oracle: the priority of canonical edge ``(a, b)`` is
the STATIC string ``md5(f"{a}|{b}")`` — fixed across rounds.  Under a
fixed total order, repeated local-minima selection computes exactly the
lexicographically-first maximal matching, i.e. the result of a SEQUENTIAL
greedy scan in priority order (the line-graph analogue of the
lexicographically-first MIS).  That makes this "parallel randomized"
algorithm value-hash-gateable against a trivial sorted-scan kernel
(kernels.greedy_matching) — same trick as operators/mis.py, which needs
fresh per-round draws and therefore mirrors round structure instead.

Spark design, per round (all state shrinks geometrically):

- each live edge sends its (priority, a, b) struct to both endpoints; one
  map-side-combining ``min(struct)`` per vertex yields the strongest
  incident edge — the shuffle carries one candidate per (vertex,
  partition), never the adjacency;
- an edge wins if it IS the minimum at BOTH endpoints (two broadcast-able
  joins against the vertex-min table, equality on the full struct);
- winners join the matching; all edges touching a matched vertex leave
  via two anti-joins.  The global minimum edge always wins, and in
  expectation a constant fraction of edges dies per round, so rounds =
  O(log m) — ~45 at 10^13 edges, each over a shrinking frontier.

Lineage: per-round states are ``cut_lineage`` leaves, superseded leaves
released after their successor materializes (engine-wide deferred-release
discipline; see plans/superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release


def greedy_matching(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Undirected edges (src, dst) -> the lexicographically-first maximal
    matching under the static md5 edge-priority order.

    Returns DataFrame[a, b] with a < b — one row per matched edge.  No
    vertex appears twice (matching); every live edge has a matched
    endpoint (maximality); both pinned by tests against the sequential
    kernel mirror (kernels.greedy_matching).
    """
    pr = F.md5(
        F.concat_ws("|", F.col("a").cast("string"), F.col("b").cast("string"))
    )
    live = cut_lineage(
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .select("a", "b", F.struct(pr.alias("p"), "a", "b").alias("e"))
    )
    won_leaves: list[DataFrame] = []
    for _ in range(max_rounds):
        if live.isEmpty():
            break
        # strongest incident edge per vertex (min struct, map-side combine)
        msgs = live.select(F.col("a").alias("v"), "e").union(
            live.select(F.col("b").alias("v"), "e")
        )
        vmin = msgs.groupBy("v").agg(F.min("e").alias("me"))
        winners = cut_lineage(
            live.join(vmin.withColumnRenamed("v", "a"), "a")
            .filter(F.col("e") == F.col("me"))
            .drop("me")
            .join(vmin.withColumnRenamed("v", "b"), "b")
            .filter(F.col("e") == F.col("me"))
            .select("a", "b")
        )
        won_leaves.append(winners)
        matched = winners.select(F.col("a").alias("v")).union(
            winners.select(F.col("b").alias("v"))
        )
        new_live = cut_lineage(
            live.join(matched.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(matched.withColumnRenamed("v", "b"), "b", "left_anti")
        )
        release(live)
        live = new_live
    else:
        # the loop guard only checks emptiness at the TOP of each round: a
        # run whose final permitted round empties the edge set has
        # converged even though the for clause exhausted
        if not live.isEmpty():
            raise RuntimeError(
                f"greedy_matching: not converged in {max_rounds} rounds"
            )
    out = live.limit(0).select("a", "b")
    for leaf in won_leaves:
        out = out.union(leaf.select("a", "b"))
    result = cut_lineage(out)
    release(live)
    for leaf in won_leaves:
        release(leaf)
    return result
