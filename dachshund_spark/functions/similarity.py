"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k neighbors, all JVM-side
  (``zip_with`` + ``aggregate`` dot products inside whole-stage codegen);
  the baseline and the verifier for the approximate path.
* ``lsh_bucketed_topk`` — random-hyperplane LSH: a deterministic
  pseudo-random projection matrix (seeded, recomputed identically on every
  executor) maps each embedding to a bucket id via an Arrow-batched pandas
  UDF (one numpy matmul per batch); candidates = same-bucket vectors
  (multi-probe over ``n_tables`` independent tables), then exact cosine
  re-rank.  This is the 100 TB path: the cross join collapses to a
  bucket-key equi-join.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    embeddings: (vec_id, embedding); queries: (vec_id, embedding).
    Returns (query_id, neighbor_id, cosine, rank) excluding self-matches;
    ties broken by neighbor_id for determinism.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(
                F.col("q_emb").cast("array<double>"),
                F.col("c_emb").cast("array<double>"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ann_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """recall@k of the LSH-bucketed path against the exact brute-force
    baseline, per query: |topk_lsh ∩ topk_exact| / k.  The driver-gate
    quality check for the approximate similarity path."""
    exact = cosine_topk(embeddings, queries, k).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_bucketed_topk(
        embeddings, queries, k, n_planes, n_tables, seed, dim
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    qs = exact.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce("n_hit", F.lit(0)) / F.lit(float(k)), 6).alias(
            "recall"
        ),
    )


def synthesize_clustered_embeddings(
    spark,
    n: int,
    dim: int = 32,
    n_clusters: int = 50,
    sigma: float = 0.1,
    seed: int = 7,
    partitions: int = 8,
) -> DataFrame:
    """Deterministic mixture-of-Gaussians embedding table
    (vec_id, embedding array<float>): vector i belongs to cluster
    ``i % n_clusters``; value = unit-norm cluster center + sigma * noise,
    both drawn from ``np.random.default_rng`` streams keyed ONLY by
    (seed, cluster) / (seed, vec_id) — executor- and partitioning-
    independent, so the in-process oracle regenerates the exact bytes.

    This is the fixture that demonstrates the LSH scale win: on clustered
    data (real corpora), same-cluster vectors collide in nearly every
    hash table while cross-cluster vectors almost never do, so the
    candidate set is a small fraction of the corpus at recall ~1."""
    import pandas as pd  # noqa: F811 (kept local for mapInPandas pickling)

    def gen(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                c = int(i) % n_clusters
                center = np.random.default_rng(seed * 1_000_003 + c).standard_normal(dim)
                center /= np.linalg.norm(center)
                noise = np.random.default_rng(
                    seed * 2_000_003 + int(i)
                ).standard_normal(dim)
                vecs.append((center + sigma * noise).astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(0, n, 1, partitions)
        .select(F.col("id"))
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )


def lsh_candidate_pairs_emb(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int,
    n_tables: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """Deduped same-bucket (query_id, neighbor_id, q_emb, c_emb)
    candidates over ``n_tables`` hyperplane tables, self-matches removed —
    the shared candidate-generation stage of the approximate path."""
    cand_frames = []
    for t in range(n_tables):
        udf = _bucket_udf(dim, n_planes, seed, t)
        qb = queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            udf(F.col("embedding")).alias("bucket"),
        )
        cb = embeddings.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            udf(F.col("embedding")).alias("bucket"),
        )
        cand_frames.append(
            qb.join(cb, "bucket").select(
                "query_id", "neighbor_id", "q_emb", "c_emb"
            )
        )
    cands = cand_frames[0]
    for f in cand_frames[1:]:
        cands = cands.union(f)
    return cands.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )


def ann_recall_stats(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Per query: recall@k of the LSH path vs the exact baseline AND the
    candidate fraction (candidates examined / possible neighbors) — the
    pruning evidence that justifies the approximate path at scale.
    Returns (query_id, recall, cand_fraction)."""
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])
    from ..plans.superstep import cut_lineage

    n_total = embeddings.count()
    cands = lsh_candidate_pairs_emb(
        embeddings, queries, n_planes, n_tables, seed, dim
    ).persist()
    # both consumers of the (large) candidate table are tiny — per-query
    # counts and a top-k — so materialize them eagerly and drop the
    # candidate cache before returning instead of leaking it for the
    # session lifetime
    n_cand = cut_lineage(
        cands.groupBy("query_id").agg(F.count("*").alias("n_cand"))
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_col(
            F.col("q_emb").cast("array<double>"),
            F.col("c_emb").cast("array<double>"),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    approx = cut_lineage(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )
    cands.unpersist()
    exact = cosine_topk(embeddings, queries, k).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    qs = exact.select("query_id").distinct()
    return (
        qs.join(hits, "query_id", "left")
        .join(n_cand, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
            F.round(
                F.coalesce("n_cand", F.lit(0)) / F.lit(float(n_total - 1)), 6
            ).alias("cand_fraction"),
        )
    )


def lsh_planes(dim: int, n_planes: int, seed: int, table: int):
    """The deterministic hyperplane matrix for one LSH table — shared by
    the Spark UDF and the in-process kernel oracle."""
    import numpy as np

    rng = np.random.default_rng(seed * 1_000_003 + table)
    return rng.standard_normal((dim, n_planes))


def _bucket_udf(dim: int, n_planes: int, seed: int, table: int):
    @pandas_udf(LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        import numpy as np

        planes = lsh_planes(dim, n_planes, seed, table)
        # one vectorized conversion of the whole Arrow batch — no per-row
        # python: the list array flattens to a contiguous (n*dim) buffer
        mat = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int64))

    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: union of same-bucket candidates over
    ``n_tables`` hyperplane tables, exact cosine re-rank.  Deterministic
    given the seed.  This is the scale default for similarity search —
    the bucket equi-join replaces ``cosine_topk``'s cross join; use
    ``cosine_topk`` only as the verification baseline.

    Pass ``dim`` explicitly at scale (it is schema metadata); the
    ``.first()`` fallback is a convenience for ad-hoc use only."""
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])
    cands = lsh_candidate_pairs_emb(
        embeddings, queries, n_planes, n_tables, seed, dim
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_col(
            F.col("q_emb").cast("array<double>"),
            F.col("c_emb").cast("array<double>"),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
