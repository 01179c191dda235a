"""Distributed greedy graph coloring — Jones–Plassmann over DataFrames.

The reference's degeneracy family (coreness.rs) orders vertices by how
deep they sit in dense cores; coloring is the companion primitive a
link-graph engine needs for conflict-free scheduling (updating no two
adjacent hosts in the same wave), channel/shard assignment, and
register-allocation-style dedup batching.  Jones & Plassmann ("A
parallel graph coloring heuristic", SIAM J. Sci. Comput. 1993) is the
classic distributed form of greedy coloring: a fixed random priority per
vertex; each round, every uncolored vertex that beats all its uncolored
neighbors takes the smallest color unused by its already-colored
neighbors.

Determinism: the priority of vertex ``v`` is ``md5(f"{seed}:{v}")`` —
fixed across rounds, partitioning, task retries, and cluster sizes
(same trick as operators/mis.py), with the vertex id as tie-break, so
the output is THE unique JP coloring for a given seed and is
value-hash-gateable against the sequential kernel mirror
(kernels.jp_coloring).

Spark design, per round (one driver action):

- winner selection is exactly the MIS round shape: active edges send
  both endpoints' (priority, v) structs, one map-side-combining
  ``min(struct)`` per vertex finds the strongest uncolored neighbor,
  and a left join picks the local minima.  Adjacent vertices can never
  both win a round, so same-round color conflicts are impossible by
  construction.
- the smallest-free-color (mex) computation never joins against the
  full colored table: each vertex's state carries the ``forbidden``
  array of colors its already-colored neighbors took.  Winners fold
  ``mex(forbidden)`` in a codegen'd projection; their new colors are
  then pushed ALONG ACTIVE EDGES to surviving neighbors, whose arrays
  grow by ``array_union``.  Per-round shuffle is bounded by
  winner-incident edges, not by n — at 10^12 edges the early dense
  rounds stream edge-width messages and late rounds are tiny frontiers.
- forbidden arrays are bounded by max(degree to higher-priority
  vertices) <= degree; colors by the greedy bound (degeneracy-ordered
  in expectation, <= Δ+1 always).

Lineage: per-round states are ``cut_lineage`` leaves, superseded leaves
released once their successor materializes (the engine-wide
deferred-release discipline); per-round winner leaves accumulate and
union into the result, exactly like operators/mis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release
from .builders import vertices


def _priority(col, seed: int):
    """Fixed (not per-round) deterministic priority struct; the trailing
    vertex id makes the order strict even under an md5 collision."""
    return F.struct(
        F.md5(F.concat_ws(":", F.lit(seed), col.cast("string"))).alias("p"),
        col.alias("v"),
    )


# smallest non-negative integer absent from the (deduped, sorted)
# forbidden array: walk the sorted colors, bumping the candidate while it
# keeps being matched.  Interpreted-eval HOF, but over arrays bounded by
# vertex degree — never the hot path.
_MEX = (
    "aggregate(array_sort(array_distinct(forbidden)), 0, "
    "(acc, x) -> IF(x = acc, acc + 1, acc))"
)


def jp_coloring(
    edges: DataFrame, seed: int = 0, max_rounds: int = 512
) -> DataFrame:
    """Undirected edges (src, dst) -> the unique Jones–Plassmann greedy
    coloring under the seeded md5 priority order.

    Returns DataFrame[v, color, jp_round] — every vertex of the input
    graph, its color (0-based), and the round it was colored.  Validity
    (no monochromatic edge) and exact parity with the sequential kernel
    are pinned by tests."""
    canon = cut_lineage(
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    active_v = cut_lineage(
        vertices(
            canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        ).select("v", F.array().cast("array<int>").alias("forbidden"))
    )
    active_e = canon
    done_leaves: list[DataFrame] = []
    for rnd in range(max_rounds):
        if active_v.count() == 0:
            break
        pa = _priority(F.col("a"), seed)
        pb = _priority(F.col("b"), seed)
        msgs = active_e.select(F.col("a").alias("v"), pb.alias("m")).union(
            active_e.select(F.col("b").alias("v"), pa.alias("m"))
        )
        min_nbr = msgs.groupBy("v").agg(F.min("m").alias("mn"))
        own = _priority(F.col("v"), seed)
        winners = cut_lineage(
            active_v.join(min_nbr, "v", "left")
            .filter(F.col("mn").isNull() | (own < F.col("mn")))
            .select(
                "v",
                F.expr(_MEX).cast("int").alias("color"),
                F.lit(rnd).alias("jp_round"),
            )
        )
        done_leaves.append(winners)
        # push new colors along active edges to surviving neighbors
        wcol = winners.select("v", "color")
        cmsgs = (
            active_e.join(
                wcol.withColumnRenamed("v", "a"), "a"
            ).select(F.col("b").alias("v"), "color")
        ).union(
            active_e.join(
                wcol.withColumnRenamed("v", "b"), "b"
            ).select(F.col("a").alias("v"), "color")
        )
        nbr_colors = cmsgs.groupBy("v").agg(
            F.collect_set("color").alias("nc")
        )
        w_ids = winners.select("v")
        new_v = cut_lineage(
            active_v.join(w_ids, "v", "left_anti")
            .join(nbr_colors, "v", "left")
            .select(
                "v",
                F.array_union(
                    "forbidden",
                    F.coalesce("nc", F.array().cast("array<int>")),
                ).alias("forbidden"),
            )
        )
        new_e = cut_lineage(
            active_e.join(
                w_ids.withColumnRenamed("v", "a"), "a", "left_anti"
            ).join(w_ids.withColumnRenamed("v", "b"), "b", "left_anti")
        )
        release(active_v)
        if active_e is not canon:
            release(active_e)
        active_v, active_e = new_v, new_e
    else:
        raise RuntimeError(f"jp_coloring: not converged in {max_rounds} rounds")
    out = canon.limit(0).select(
        F.col("a").alias("v"),
        F.lit(0).cast("int").alias("color"),
        F.lit(0).alias("jp_round"),
    )
    for leaf in done_leaves:
        out = out.union(leaf)
    result = cut_lineage(out)
    release(active_v)
    if active_e is not canon:
        release(active_e)
    release(canon)
    for leaf in done_leaves:
        release(leaf)
    return result
