"""Distributed maximal independent set — Luby's algorithm over DataFrames.

The reference engine's connectivity family (connected_components.rs,
connectivity.rs) covers reachability; a link-graph engine at web scale
also needs the classic symmetry-breaking primitive (Luby, STOC 1985 —
"A simple parallel algorithm for the maximal independent set problem").
MIS is the building block for distributed graph coloring, landmark /
seed-set selection, and one-hop de-duplication of near-identical hosts
(pick one representative such that no two picked hosts are adjacent).

Determinism: the classic algorithm draws fresh random priorities each
round; here the priority of vertex ``v`` in round ``r`` is
``md5(f"{seed}:{r}:{v}")`` — deterministic across partitioning, task
retries, and cluster sizes, so even this "randomized" algorithm is
value-hash-gateable (same trick as operators/walks.py).  Ties are
impossible in practice but the comparison key is the struct
``(priority, v)`` — a strict total order — so the output is THE unique
MIS for a given seed.

Spark design, per round (all state shrinks geometrically):

- priorities are a codegen'd md5 projection — no shuffle;
- each active edge sends its endpoints' (priority, v) structs both ways;
  one map-side-combining ``min(struct)`` per vertex yields the strongest
  active neighbor — the shuffle carries one candidate per (vertex,
  partition), never the adjacency;
- winners are active vertices whose own struct beats the neighbor
  minimum (or that have no active neighbor — the null leg of the left
  join), joining the MIS this round;
- winners and their neighbors leave the active set; surviving edges are
  two anti-joins against the removed set.  With fresh per-round
  priorities, each round removes a constant fraction of edges in
  expectation, so rounds = O(log m) — ~45 rounds at 10^13 edges, each a
  pair of shuffles over a geometrically shrinking frontier.

Lineage: per-round states are ``cut_lineage`` leaves (stats-reset, flat
plans), superseded leaves released once their successor materializes —
the engine-wide deferred-release discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release
from .builders import vertices


def _priority(col, seed: int, rnd: int):
    """Deterministic per-round priority struct; the trailing vertex id
    makes the order strict even under an md5 collision."""
    return F.struct(
        F.md5(
            F.concat_ws(":", F.lit(seed), F.lit(rnd), col.cast("string"))
        ).alias("p"),
        col.alias("v"),
    )


def luby_mis(
    edges: DataFrame, seed: int = 0, max_rounds: int = 64
) -> DataFrame:
    """Undirected edges (src, dst) -> the unique maximal independent set
    under the seeded md5 priority order.

    Returns DataFrame[v, mis_round] — one row per MIS member with the
    round (0-based) it joined.  Every vertex of the input graph is either
    in the output or adjacent to a member (maximality); no two output
    vertices are adjacent (independence) — both properties are pinned by
    tests against the sequential kernel mirror (kernels.luby_mis).
    """
    canon = cut_lineage(
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    active_v = cut_lineage(
        vertices(canon.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    )
    active_e = canon
    win_leaves: list[DataFrame] = []
    for rnd in range(max_rounds):
        n_active = active_v.count()
        if n_active == 0:
            break
        # strongest active neighbor per vertex: edge rows send both
        # endpoint structs, min(struct) combines map-side
        pa = _priority(F.col("a"), seed, rnd)
        pb = _priority(F.col("b"), seed, rnd)
        msgs = active_e.select(F.col("a").alias("v"), pb.alias("m")).union(
            active_e.select(F.col("b").alias("v"), pa.alias("m"))
        )
        min_nbr = msgs.groupBy("v").agg(F.min("m").alias("mn"))
        own = _priority(F.col("v"), seed, rnd)
        winners = cut_lineage(
            active_v.join(min_nbr, "v", "left")
            .filter(F.col("mn").isNull() | (own < F.col("mn")))
            .select("v", F.lit(rnd).alias("mis_round"))
        )
        win_leaves.append(winners)
        # removed = winners + their active neighbors; semi-joins keep the
        # shuffle at id width.  Winner neighbors come from the edge list
        # (both directions), winners themselves from the leaf.
        w_ids = winners.select("v")
        nbrs = (
            active_e.join(w_ids.withColumnRenamed("v", "a"), "a", "left_semi")
            .select(F.col("b").alias("v"))
            .union(
                active_e.join(
                    w_ids.withColumnRenamed("v", "b"), "b", "left_semi"
                ).select(F.col("a").alias("v"))
            )
        )
        removed = w_ids.union(nbrs).distinct()
        new_v = cut_lineage(active_v.join(removed, "v", "left_anti"))
        new_e = cut_lineage(
            active_e.join(
                removed.withColumnRenamed("v", "a"), "a", "left_anti"
            ).join(removed.withColumnRenamed("v", "b"), "b", "left_anti")
        )
        release(active_v)
        if active_e is not canon:  # canon backs the limit(0) leg below
            release(active_e)
        active_v, active_e = new_v, new_e
    else:
        raise RuntimeError(f"luby_mis: not converged in {max_rounds} rounds")
    out = canon.limit(0).select(
        F.col("a").alias("v"), F.lit(0).alias("mis_round")
    )
    for leaf in win_leaves:
        out = out.union(leaf)
    result = cut_lineage(out)
    release(active_v)
    if active_e is not canon:
        release(active_e)
    release(canon)
    for leaf in win_leaves:
        release(leaf)
    return result
