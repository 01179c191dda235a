"""Distributed centrality operators.

* ``eigenvector_centrality`` — power iteration as supersteps with the
  reference's exact discipline (eigenvector_centrality.rs:21-42): x <- xA,
  L-infinity normalize each step, stop when the L1 change <= eps or
  max_iter.  Golden values: tests/karate_club.rs:446-458.

* ``betweenness`` — Brandes, parallelized over sources
  (betweenness.rs:57-96; the reference loops sources sequentially).  The
  canonical edge table is written ONCE to a parquet scratch path and read
  inside each task (pyarrow) — the edge list never round-trips through
  the driver, so driver memory stays O(1) in the graph size.  Each task
  runs the pure-Python Brandes kernel for its slice of sources over a
  shared in-process adjacency, emitting (v, dependency) partials that a
  final groupBy sums.  The default is the reference featurizer's
  approximation — 100 sampled sources when the graph has more than 100
  vertices (simple_transformer.rs:46-52) — because exact betweenness is
  inherently O(VE); pass ``max_sources=None`` for exact.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, iterate
from .builders import symmetrized, vertices


def eigenvector_centrality(
    edges: DataFrame, eps: float = 0.001, max_iter: int = 1000
) -> DataFrame:
    """DataFrame[v, evcent], L-inf normalized (max = 1).

    ONE driver action per superstep (pagerank.py's discipline): the state
    carries the UN-normalized inflow ``y_i`` plus the previous normalized
    vector ``x_{i-1}``; the L-inf scale ``m_i = max(y_i)`` lives on the
    driver and is applied lazily as a ``lit`` expression, so normalization
    costs no job.  The single per-superstep aggregate returns
    ``(max(y_i), L1(x_{i-1} - x_{i-2}), rows)`` — the L1 change is EXACT
    but lagged one superstep (both scales in ``|y_{i-1}/m_{i-1} -
    x_{i-2}|`` are known by then), so a tolerance stop detects convergence
    one superstep late and returns the converged vector ``x_{i-1}``
    itself, bit-identical to the eager-delta formulation."""
    adj = symmetrized(edges).repartition("src").persist()
    adj.count()
    n_row = vertices(edges).count()
    state0 = vertices(edges).select(
        "v",
        F.lit(1.0 / n_row).alias("y"),
        F.lit(1.0 / n_row).alias("xprev"),
    )
    scale = {"m": 1.0}  # x_0 = y_0 / 1

    def step(state: DataFrame, i: int):
        m = scale["m"]
        msgs = adj.join(state, adj.src == state.v).select(
            F.col("dst").alias("v"), (F.col("y") / F.lit(m)).alias("x")
        )
        inflow = msgs.groupBy("v").agg(F.sum("x").alias("ynew"))
        new_state = (
            state.join(inflow, "v", "left")
            .select(
                "v",
                F.coalesce("ynew", F.lit(0.0)).alias("y"),
                (F.col("y") / F.lit(m)).alias("xprev"),
                F.abs(F.col("y") / F.lit(m) - F.col("xprev")).alias("d"),
            )
            .persist()
        )
        agg = new_state.agg(
            F.max("y").alias("m"),
            F.sum("d").alias("l1"),
            F.count("*").alias("rows"),
        ).collect()[0]
        scale["m"] = float(agg["m"])
        # first superstep has no previous change to report
        delta = float("inf") if i == 0 else float(agg["l1"])
        return (new_state, delta, int(agg["rows"]))

    result = iterate(state0, step, max_iter=max_iter, tol=eps)
    if result.converged:
        # stop fired on the lagged delta: xprev IS the converged vector
        out = result.state.select("v", F.col("xprev").alias("evcent"))
    else:
        out = result.state.select(
            "v", (F.col("y") / F.lit(scale["m"])).alias("evcent")
        )
    adj.unpersist()
    return out


def source_hash_expr(v, seed: int):
    """md5(seed|v) — the deterministic source-sampling rank.  Computable
    identically in Spark SQL, DuckDB, and python hashlib, so sampled-source
    runs are reproducible across engines and across executors."""
    return F.md5(F.concat(F.lit(f"{seed}|"), v.cast("string")))


def sample_sources_py(vertex_ids, max_sources: int, seed: int) -> list[int]:
    """Python mirror of the Spark-side sampled-source selection (used by
    kernel oracles): the ``max_sources`` vertices with smallest
    md5(seed|v)."""
    ranked = sorted(
        (hashlib.md5(f"{seed}|{v}".encode()).hexdigest(), v) for v in vertex_ids
    )
    return [v for _, v in ranked[:max_sources]]


def betweenness(
    edges: DataFrame,
    sources: list[int] | None = None,
    max_sources: int | None = 100,
    seed: int = 0,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Brandes betweenness (undirected, 0.5-per-direction weights as in
    the reference), source-parallel.

    * ``sources`` — explicit source list (overrides sampling).
    * ``max_sources`` — when the graph has more vertices than this, run
      from a deterministic md5-ranked sample (the reference featurizer's
      100-source approximation, simple_transformer.rs:46-52).  ``None``
      means every vertex (exact).
    * ``scratch_dir`` — where the canonical edge table is staged as
      parquet for task-side reads.  MUST be a cluster-visible path
      (HDFS/S3/shared FS) on a real cluster; defaults to a local temp dir,
      correct for local[*] mode.
    """
    spark = edges.sparkSession
    from ..operators.builders import canonical_undirected

    master = spark.sparkContext.master
    if scratch_dir is None and not master.startswith("local"):
        raise ValueError(
            "betweenness on a non-local cluster requires scratch_dir to be "
            "a cluster-visible path (HDFS/S3/shared FS); the local tempdir "
            f"default would fail task-side reads under master={master!r}"
        )
    canon = canonical_undirected(edges)
    root = scratch_dir or os.path.join(tempfile.gettempdir(), "dachshund_bet")
    path = os.path.join(root, f"edges-{uuid.uuid4().hex}")
    canon.write.mode("overwrite").parquet(path)
    canon = spark.read.parquet(path)

    verts = vertices(canon)
    if sources is not None:
        src_df = spark.createDataFrame(
            [(int(s),) for s in sources], "source long"
        )
    elif max_sources is not None:
        src_df = (
            verts.orderBy(source_hash_expr(F.col("v"), seed))
            .limit(max_sources)
            .select(F.col("v").alias("source"))
        )
    else:
        src_df = verts.select(F.col("v").alias("source"))
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    src_df = src_df.repartition(n_part)

    def run_sources(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        from ..functions.kernels import brandes_single_source, build_undirected_adj

        tbl = pq.read_table(path, columns=["src", "dst"])
        adj = build_undirected_adj(
            list(zip(tbl["src"].to_pylist(), tbl["dst"].to_pylist()))
        )
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
    out = verts.join(summed, "v", "left").select(
        "v", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    # the result is small (one row per vertex): materialize it eagerly so
    # the scratch parquet can be deleted deterministically instead of
    # leaking one edges-<uuid> directory per call
    try:
        return cut_lineage(out)
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
