"""Product quantization (functions/similarity.py pq_*) — distributed
encoding vs the shared numpy kernel, plus quantizer sanity properties."""

import numpy as np
import pytest

from dachshund_spark.functions.similarity import (
    pq_codes,
    pq_encode_mat,
    pq_train_codebooks,
    synthesize_clustered_embeddings,
)


def test_pq_codes_match_numpy_mirror(spark):
    emb = synthesize_clustered_embeddings(
        spark, 300, dim=16, n_clusters=10, sigma=0.05, seed=3
    )
    rows = sorted(emb.select("vec_id", "embedding").collect())
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    books = pq_train_codebooks(mat, m=4, k=8, n_iters=5)
    codes, err = pq_encode_mat(mat, books)
    got = {
        r["vec_id"]: (r["code0"], r["code1"], r["code2"], r["code3"], r["recon_err"])
        for r in pq_codes(emb, m=4, k=8, n_iters=5).collect()
    }
    for i, (vid, _) in enumerate(rows):
        assert got[vid] == (*(int(c) for c in codes[i]), float(err[i]))


def test_pq_codes_in_range_and_err_nonneg(spark):
    emb = synthesize_clustered_embeddings(
        spark, 200, dim=16, n_clusters=8, sigma=0.1, seed=5
    )
    out = pq_codes(emb, m=2, k=4, n_iters=3).collect()
    assert len(out) == 200
    for r in out:
        assert 0 <= r["code0"] < 4 and 0 <= r["code1"] < 4
        assert r["recon_err"] >= 0.0


def test_pq_more_centroids_reduce_error():
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((400, 8))
    errs = []
    for k in (2, 8, 32):
        books = pq_train_codebooks(mat, m=2, k=k, n_iters=8)
        _, err = pq_encode_mat(mat, books)
        errs.append(err.sum())
    assert errs[0] > errs[1] > errs[2]


def test_pq_dim_not_divisible_raises():
    with pytest.raises(ValueError):
        pq_train_codebooks(np.zeros((10, 10)), m=4, k=2)


def test_pq_adc_neighbors_are_same_cluster(spark):
    # PQ codes collide WITHIN a well-separated cluster (that's the
    # compression), so ADC cannot reproduce fine-grained cosine order —
    # the property a coarse quantizer must have is cluster purity: the
    # ADC top-10 of a query lives in the query's own cluster
    # (cluster id = vec_id % n_clusters in the fixture)
    from dachshund_spark.functions.similarity import pq_adc_topk

    n_clusters = 20
    emb = synthesize_clustered_embeddings(
        spark, 600, dim=32, n_clusters=n_clusters, sigma=0.05, seed=9
    ).persist()
    queries = emb.filter("vec_id < 8")
    got = pq_adc_topk(emb, queries, k_neighbors=10, m=4, k=16, n_iters=5)
    rows = got.collect()
    assert len(rows) == 80
    pure = sum(
        1 for r in rows
        if r["neighbor_id"] % n_clusters == r["query_id"] % n_clusters
    )
    assert pure / len(rows) >= 0.9
    # and per-query ranks are dense 1..10
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per.values())
