"""Distributed centrality operators.

* ``eigenvector_centrality`` — power iteration as supersteps with the
  reference's exact discipline (eigenvector_centrality.rs:21-42): x <- xA,
  L-infinity normalize each step, stop when the L1 change <= eps or
  max_iter.  Golden values: tests/karate_club.rs:446-458.

* ``betweenness`` — exact Brandes, parallelized over sources
  (betweenness.rs:57-96; the reference loops sources sequentially).  The
  graph is broadcast once as an edge list; each task runs the pure-Python
  Brandes kernel for its slice of sources over a shared in-process CSR,
  emitting (v, dependency) partials that a final groupBy sums.  This is
  the standard source-parallel decomposition: exact, embarrassingly
  parallel, bounded by the graph fitting on each executor (betweenness is
  inherently O(VE) — for web-scale graphs use the sampled-sources variant,
  matching the featurizer's 100-source approximation,
  simple_transformer.rs:46-52).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import iterate
from .builders import symmetrized, vertices


def eigenvector_centrality(
    edges: DataFrame, eps: float = 0.001, max_iter: int = 1000
) -> DataFrame:
    """DataFrame[v, evcent], L-inf normalized (max = 1)."""
    adj = symmetrized(edges).repartition("src").persist()
    adj.count()
    n_row = vertices(edges).count()
    state0 = vertices(edges).select("v", F.lit(1.0 / n_row).alias("x"))

    def step(state: DataFrame, i: int):
        msgs = adj.join(state, adj.src == state.v).select(
            F.col("dst").alias("v"), "x"
        )
        y = msgs.groupBy("v").agg(F.sum("x").alias("y")).persist()
        m = y.agg(F.max("y")).collect()[0][0]
        prev = state.select("v", F.col("x").alias("x0"))
        new_state = prev.join(y, "v", "left").select(
            "v",
            (F.coalesce(F.col("y"), F.lit(0.0)) / F.lit(m)).alias("x"),
            F.abs(
                F.coalesce(F.col("y"), F.lit(0.0)) / F.lit(m) - F.col("x0")
            ).alias("d"),
        ).persist()
        agg = new_state.agg(
            F.sum("d").alias("l1"), F.count("*").alias("rows")
        ).collect()[0]
        y.unpersist()
        return (
            new_state.select("v", "x"),
            float(agg["l1"]),
            int(agg["rows"]),
        )

    result = iterate(state0, step, max_iter=max_iter, tol=eps)
    out = result.state.select("v", F.col("x").alias("evcent"))
    adj.unpersist()
    return out


def betweenness(edges: DataFrame, sources: list[int] | None = None) -> DataFrame:
    """Exact Brandes betweenness (undirected, 0.5-per-direction weights as
    in the reference), source-parallel.  ``sources=None`` uses every
    vertex (exact); pass a sampled list for the approximate variant."""
    spark = edges.sparkSession
    from ..operators.builders import canonical_undirected

    canon = canonical_undirected(edges)
    edge_list = [(r["src"], r["dst"]) for r in canon.collect()]
    bc_edges = spark.sparkContext.broadcast(edge_list)

    verts = vertices(canon)
    if sources is None:
        src_df = verts.select(F.col("v").alias("source"))
    else:
        src_df = spark.createDataFrame(
            [(int(s),) for s in sources], "source long"
        )
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    src_df = src_df.repartition(n_part)

    def run_sources(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.kernels import brandes_single_source, build_undirected_adj

        adj = build_undirected_adj(bc_edges.value)
        acc: dict[int, float] = {}
        for pdf in batches:
            for s in pdf["source"]:
                for nid, dep in brandes_single_source(adj, int(s)).items():
                    acc[nid] = acc.get(nid, 0.0) + dep
        if acc:
            yield pd.DataFrame(
                {"v": list(acc.keys()), "partial": list(acc.values())}
            )

    partials = src_df.mapInPandas(run_sources, "v long, partial double")
    summed = partials.groupBy("v").agg(F.sum("partial").alias("betweenness"))
    return verts.join(summed, "v", "left").select(
        "v", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
