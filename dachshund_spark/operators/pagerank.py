"""PageRank as damped power-iteration supersteps (north_rule op).

Template = the reference's eigenvector power iteration
(eigenvector_centrality.rs:21-42) with damping, per-edge 1/out_degree
weights, dangling-mass redistribution, and L1 convergence (Σ|Δ| < tol).
Oracle: ``kernels.pagerank_numpy`` (allclose 1e-6 at convergence).

Two physical strategies, selectable per call:

* ``impl="sql"`` — pure DataFrame: ``links ⋈ ranks → groupBy(dst).sum``.
  Catalyst gives partial (map-side) aggregation; AQE splits skewed
  reducers.  The ``links`` table (edge + precomputed 1/out_degree weight)
  is repartitioned on ``src`` and persisted once, so every superstep
  shuffles only the rank vector, not the edge table.

* ``impl="csr"`` — per-partition CSR-block gather-scatter (north_star):
  after the ranks join, an Arrow-batched ``mapInPandas`` factorizes each
  partition's dst column into a dense local id space (numpy) and
  ``np.bincount``-combines rank*weight locally, emitting one partial row
  per *distinct* dst per partition instead of one per edge — an explicit
  pre-shuffle combine that cuts shuffle volume on high-fanout partitions
  beyond what hash-aggregate buffers cover.

Both return identical values (tested against each other and the numpy
oracle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import CheckpointManager, iterate
from .builders import vertices


def _csr_partial_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition gather-scatter: combine contributions by dst with
    numpy before the shuffle.  Receives (dst, contrib) rows; emits one
    (dst, partial) row per distinct dst in the partition."""
    import numpy as np

    acc: dict = {}
    for pdf in batches:
        if pdf.empty:
            continue
        codes, uniques = pd.factorize(pdf["dst"].to_numpy())
        sums = np.bincount(codes, weights=pdf["contrib"].to_numpy())
        for d, s in zip(uniques, sums):
            acc[d] = acc.get(d, 0.0) + s
    if acc:
        yield pd.DataFrame(
            {"dst": list(acc.keys()), "partial": list(acc.values())}
        )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    impl: str = "sql",
    checkpointer: CheckpointManager | None = None,
    include_metrics: bool = False,
):
    """Directed PageRank over DataFrame[src, dst]; returns
    DataFrame[v: long, pagerank: double] summing to 1.

    Multi-edges contribute multiply (weights are per-edge, as in a raw
    link table); pre-deduplicate upstream if simple-graph semantics are
    wanted.
    """
    spark = edges.sparkSession
    verts = vertices(edges).persist()
    n = verts.count()

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_degree"))
    links = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("w"))
        .repartition("src")
        .persist()
    )
    links.count()

    state0 = verts.select(
        "v",
        F.lit(1.0 / n).alias("rank"),
        F.lit(1.0).alias("delta"),
    )

    def step(state: DataFrame, i: int):
        ranks = state.select("v", "rank")
        contribs = links.join(ranks, links.src == ranks.v).select(
            "dst", (F.col("rank") * F.col("w")).alias("contrib")
        )
        if impl == "csr":
            partials = contribs.mapInPandas(
                _csr_partial_sums, "dst long, partial double"
            )
            sums = partials.groupBy("dst").agg(F.sum("partial").alias("mass"))
        else:
            sums = contribs.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        sums = sums.persist()
        # non-dangling vertices emit their full rank, so the dangling mass
        # is the total rank (==1 by induction) minus the emitted mass —
        # one scalar aggregate instead of an extra join per superstep
        emitted = sums.agg(F.sum("mass")).collect()[0][0] or 0.0
        dangling = max(0.0, 1.0 - emitted)
        base = (1.0 - damping) / n + damping * dangling / n
        prev = state.select("v", F.col("rank").alias("old_rank"))
        new_state = (
            prev.join(sums, prev.v == sums.dst, "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
                F.abs(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                    - F.col("old_rank")
                ).alias("delta"),
            )
        )
        # materialize before dropping the sums cache so the follow-up count
        # in the superstep loop is served from cache, not a recompute
        new_state = new_state.persist()
        l1 = new_state.agg(F.sum("delta")).collect()[0][0]
        sums.unpersist()
        return new_state, float(l1)

    result = iterate(
        state0, step, max_iter=max_iter, tol=tol, checkpointer=checkpointer
    )
    out = result.state.select("v", F.col("rank").alias("pagerank"))
    links.unpersist()
    verts.unpersist()
    if include_metrics:
        return out, result
    return out
