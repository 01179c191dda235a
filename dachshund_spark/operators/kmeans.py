"""Distributed k-means (Lloyd's) over an embedding column — exact
integer arithmetic so the result is value-hash-gateable.

functions/similarity.py trains IVF centroids on a driver-side bounded
sample (the right call for an index build); this operator is the SCALE
path: every row participates in assignment and in the centroid update,
so it distributes to 10^12 embeddings — the clustering pass a
training-data pipeline runs for dedup bucketing, curriculum binning, or
IVF training at full corpus size.

Why it hash-matches a sequential mirror (kernels.kmeans_lloyd_int):

- embeddings are quantized to integer micro-units,
  ``floor(x * 1e6 + 0.5)`` in float64 — identical in Spark double
  expressions, numpy float64, and plain Python;
- per-cluster per-dimension sums are BIGINT — exact in ANY summation
  order, immune to the float reassociation that makes
  ``groupBy().sum()`` of doubles engine-dependent (the exact-cents
  trick from the TPC-H gates, applied to geometry);
- centroid update is integer division truncated toward zero (Spark
  ``DIV`` / sign-adjusted ``//`` in the kernel); empty clusters keep
  their previous centroid;
- assignment ties break on the smaller cluster id.

Spark design, per iteration:

- assignment is an Arrow-batched pandas UDF: the k x dim int64 centroid
  matrix is closed over (k is small — broadcast-by-closure), each batch
  computes all squared distances in vectorized int64 and argmins — no
  per-row Python, no shuffle;
- the update posexplodes assigned vectors to (cluster, dim, value) rows;
  the groupBy gets map-side partial combine, so the shuffle carries at
  most k * dim * partitions rows regardless of corpus size;
- one driver action per iteration collects the k new centroids
  (k * dim ints) — the same O(k) scalar-readback shape as the PageRank
  dangling-mass fold.

cf. the reference's seeded approximations (SURVEY §2: sampling
transformers) for the sample-then-refine alternative this deliberately
avoids at full scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _quantize_expr(col: str):
    """array<float> -> array<bigint> micro-units, double math."""
    return F.expr(
        f"transform({col}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5D)"
        " AS BIGINT))"
    )


def _seed_centroids(emb: DataFrame, k: int, seed: int,
                    id_col: str, emb_col: str) -> list[list[int]]:
    """Initial centroids: the k vectors whose ids rank smallest under
    md5(seed:id) — a deterministic seeded spread (same trick as
    operators/mis.py priorities), not the first k row ids."""
    rows = (
        emb.select(
            F.md5(
                F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
            ).alias("r"),
            F.col(id_col).alias("i"),
            _quantize_expr(emb_col).alias("xq"),
        )
        .orderBy("r", "i")
        .limit(k)
        .collect()
    )
    return [list(r["xq"]) for r in rows]


def _assign_udf(cents: list[list[int]]):
    import numpy as np

    C = np.asarray(cents, dtype=np.int64)  # k x dim

    @F.pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy())  # float32 from Arrow
        Xq = np.floor(X.astype(np.float64) * _SCALE + 0.5).astype(np.int64)
        # exact int64 distances; argmin picks the smallest cluster id on
        # ties (first minimum)
        d2 = ((Xq[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return assign


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    seed: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact-integer distributed Lloyd's; returns
    DataFrame[<id_col>, cluster] after ``iters`` assignment/update
    rounds from the seeded initialization."""
    emb = emb.select(id_col, emb_col).persist()
    emb.count()
    cents = _seed_centroids(emb, k, seed, id_col, emb_col)
    dim = len(cents[0])
    try:
        for _ in range(iters):
            assigned = emb.select(
                id_col,
                _quantize_expr(emb_col).alias("xq"),
                _assign_udf(cents)(F.col(emb_col)).alias("cluster"),
            )
            sums = (
                assigned.select(
                    "cluster", F.posexplode("xq").alias("d", "x")
                )
                .groupBy("cluster", "d")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            by_c: dict[int, dict[int, tuple[int, int]]] = {}
            for r in sums:
                by_c.setdefault(r["cluster"], {})[r["d"]] = (r["s"], r["n"])
            for c in range(k):
                if c not in by_c:
                    continue  # empty cluster keeps its centroid
                cents[c] = [
                    _div_trunc(*by_c[c][d]) for d in range(dim)
                ]
        # cut lineage on the final assignment BEFORE the finally releases
        # the emb cache: the old code unpersisted first, so the caller's
        # action recomputed the whole input lineage from source —
        # forfeiting the cache the iterations paid to build
        from ..plans.superstep import cut_lineage

        return cut_lineage(
            emb.select(
                id_col, _assign_udf(cents)(F.col(emb_col)).alias("cluster")
            )
        )
    finally:
        emb.unpersist()


def _div_trunc(s: int, n: int) -> int:
    """Integer division truncated toward zero (Spark DIV / Java
    semantics) — the kernel mirrors this exactly."""
    q = abs(s) // n
    return q if s >= 0 else -q
