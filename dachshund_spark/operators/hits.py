"""HITS (hubs and authorities) over a directed edge DataFrame.

Kleinberg's link-analysis pair (JACM 1999, public): authority(v) sums the
hub scores of pages linking TO v; hub(u) sums the authority scores of
pages u links to; each vector is L1-normalized every half-step so the
fixed iteration count is scale-free.  The reference engine has no
counterpart (its centrality family, eigenvector_centrality.rs:21-42,
covers the undirected single-vector case only); this is the directed
two-vector sibling, built for the web link graph the engine targets.

Spark design (one lazy plan per half-step, two shuffles per iteration):

- State is one DataFrame (v, hub, auth) over the static vertex table
  (union of srcs and dsts), so vertices with no in-links keep authority
  0 and leaves keep hub contributions flowing — exactly the dense
  semantics of the sequential kernel oracle (functions/kernels.py:hits).
- Each half-step is edges ⋈ state → groupBy → sum (Catalyst partial
  aggregation map-side combines hub mass per shuffle partition, so a
  10^7-in-link authority costs one partial row per partition, not 10^7
  shuffled messages) → left join back onto the vertex table → divide by
  an in-plan one-row L1-sum (broadcast crossJoin; no driver collect).
- Every iteration ends in an eager ``cut_lineage`` leaf and releases its
  predecessor: plan depth and checkpoint blocks both stay O(1) across
  iterations (the repo-wide iterative-loop discipline).

Edge multiplicity counts as weight (a page linking twice contributes
twice); callers wanting set semantics should ``distinct()`` first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release


def hits(edges: DataFrame, max_iter: int = 8) -> DataFrame:
    """(src, dst) directed -> (v, hub, authority), both L1-normalized
    (each column sums to 1) after ``max_iter`` full iterations."""
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    e = edges.select("src", "dst").persist()
    verts = cut_lineage(
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    n = verts.count()  # also materializes e
    if n == 0:
        raise ValueError("hits: empty edge table")
    state = cut_lineage(
        verts.select(
            "v",
            (F.lit(1.0) / F.lit(float(n))).alias("hub"),
            F.lit(0.0).alias("auth"),
        )
    )

    def _half_step(st: DataFrame, from_col: str, join_key: str,
                   group_key: str, out_col: str) -> DataFrame:
        """One half-step: push ``from_col`` mass across edges onto
        ``group_key``, L1-normalize in-plan, left-join onto verts.

        ``raw`` feeds both the join and the one-row L1 total; its
        aggregate exchange is identical in both branches, so Catalyst's
        ReuseExchange computes the shuffle once per action."""
        raw = (
            e.join(st.select(F.col("v").alias(join_key), from_col), join_key)
            .groupBy(F.col(group_key).alias("v"))
            .agg(F.sum(from_col).alias("raw"))
        )
        total = raw.agg(F.sum("raw").alias("l1"))
        return (
            verts.join(raw, "v", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "v",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("l1"))
                .alias(out_col),
            )
        )

    for _ in range(max_iter):
        # auth is consumed twice (the hub half-step and the final join),
        # so it becomes a cut leaf first — two eager cuts per iteration,
        # plan depth and checkpoint blocks O(1) across iterations
        auth = cut_lineage(_half_step(state, "hub", "src", "dst", "auth"))
        new_state = cut_lineage(
            _half_step(auth, "auth", "dst", "src", "hub")
            .join(auth, "v")
            .select("v", "hub", "auth")
        )
        release(state)
        release(auth)
        state = new_state
    e.unpersist()
    release(verts)
    return state.select("v", "hub", F.col("auth").alias("authority"))
