"""DAG scheduling primitives: Kahn topological layering.

The reference proves acyclicity via Kahn's algorithm run to exhaustion
(simple_directed_graph.rs:25-43 — repeatedly delete in-degree-0
vertices); this operator keeps what that loop throws away: the ROUND at
which each vertex is deleted is its topological level (= longest path
from any source to it), the canonical parallel schedule of a dependency
DAG (crawl-frontier waves, derivation layers in a lineage graph).  All
vertices of one level are mutually unordered, so level numbering is a
deterministic function of the graph — no tie-breaking needed.

Spark design: identical shape to the SCC trim loop
(components.strongly_connected_components) — per round, the current
sources are ONE anti-join (remaining vertices that occur as no edge's
dst), removing them is one semi-join filter on src.  Rounds = DAG depth,
each touching only the surviving subgraph, whose edge set shrinks
monotonically; lineage is cut per round so the plan stays flat.  At
10^12 edges this is depth-many anti-join rounds — the same budget the
reference's own acyclicity check pays, but returning the schedule
instead of a boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release
from .builders import vertices


def topological_levels(edges: DataFrame, max_rounds: int = 100000) -> DataFrame:
    """Directed DAG edges (src, dst) -> DataFrame[v, level] where level
    is the longest-path distance from the DAG's sources (level 0 =
    in-degree-0 vertices of the input).

    Raises ValueError if the graph has a cycle (some vertices never
    reach in-degree 0) — the constructive form of the reference's
    is_acyclic=False verdict."""
    cur = cut_lineage(edges.select("src", "dst").distinct())
    remaining = cut_lineage(vertices(cur))
    n_left = remaining.count()
    # each round's source set is a cut leaf; result legs are projections
    # over them, so the leaves stay live until the final union
    # materializes (deferred-release window)
    src_leaves: list[DataFrame] = []
    legs: list[DataFrame] = []
    level = 0
    while n_left > 0:
        if level >= max_rounds:
            raise RuntimeError(
                f"topological_levels: depth exceeds max_rounds={max_rounds}"
            )
        srcs = cut_lineage(
            remaining.join(
                cur.select(F.col("dst").alias("v")).distinct(), "v", "left_anti"
            )
        )
        k = srcs.count()
        if k == 0:
            raise ValueError(
                f"topological_levels: cycle detected — {n_left} vertices "
                "never reach in-degree 0 (cf. is_acyclic, "
                "simple_directed_graph.rs:25-43)"
            )
        src_leaves.append(srcs)
        legs.append(srcs.select("v", F.lit(level).alias("level")))
        new_remaining = cut_lineage(remaining.join(srcs, "v", "left_anti"))
        new_cur = cut_lineage(
            cur.join(srcs.withColumnRenamed("v", "src"), "src", "left_anti")
        )
        release(remaining)
        release(cur)
        # srcs stays live: its blocks back the appended result leg
        remaining, cur = new_remaining, new_cur
        n_left -= k
        level += 1
    if not legs:
        return remaining.select("v", F.lit(0).alias("level")).limit(0)
    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    result = cut_lineage(out)
    release(remaining)
    release(cur)
    for leaf in src_leaves:
        release(leaf)
    return result
