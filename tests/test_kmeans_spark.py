"""Distributed Lloyd's k-means (operators/kmeans.py) vs its sequential
kernel mirror — the exact-integer contract means assignments must match
bit-for-bit, not approximately."""

import os

from pyspark.sql import functions as F

from dachshund_spark.functions import kernels as K
from dachshund_spark.functions import similarity as S
from dachshund_spark.operators.kmeans import kmeans_lloyd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_kmeans_matches_kernel_on_real_table(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(emb, k=8, iters=5, seed=0).collect()
    }
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    want = K.kmeans_lloyd_int(vecs, k=8, iters=5, seed=0)
    assert got == want


def test_kmeans_recovers_planted_clusters(spark):
    # on well-separated synthetic clusters, Lloyd's must be a useful
    # clustering, not just a deterministic one: every planted cluster
    # should map to a single dominant k-means label
    emb = S.synthesize_clustered_embeddings(
        spark, 600, dim=16, n_clusters=6, sigma=0.02, seed=3
    ).persist()
    try:
        # planted cluster is vec_id % n_clusters (see the fixture docstring)
        joined = kmeans_lloyd(emb, k=6, iters=8, seed=1).collect()
    finally:
        emb.unpersist()
    purity_num = 0
    by_planted = {}
    for r in joined:
        by_planted.setdefault(r["vec_id"] % 6, []).append(r["cluster"])
    for labels in by_planted.values():
        purity_num += max(labels.count(c) for c in set(labels))
    assert purity_num / len(joined) >= 0.9


def test_kmeans_seed_changes_init(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    a = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(emb, k=4, iters=1, seed=0).collect()
    }
    b = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(emb, k=4, iters=1, seed=99).collect()
    }
    assert set(a) == set(b) and len(a) == 100
    # different seeded inits should produce a different 1-iter labeling
    assert a != b
