"""HITS hubs/authorities (operators/hits.py) vs an independent dense
numpy power iteration and the sequential kernel oracle."""

import numpy as np
import pytest

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.hits import hits


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src bigint, dst bigint")


def _hits_numpy(edges, iters):
    """Dense reference: a = A^T h / ||.||_1, h = A a / ||.||_1 per
    iteration, h0 uniform — independent of both implementations."""
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t in edges:
        A[idx[s], idx[t]] += 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}


EDGES = [
    (1, 2), (1, 3), (1, 4),   # 1 is a pure hub
    (5, 2), (5, 3),           # 5 a smaller hub
    (2, 6), (3, 6),           # 2,3 both hub-ish and authority-ish
    (7, 1),                   # 1 also gets an in-link
]


def test_hits_matches_dense_reference(spark):
    got = {
        r["v"]: (r["hub"], r["authority"])
        for r in hits(_edges_df(spark, EDGES), max_iter=6).collect()
    }
    want = _hits_numpy(EDGES, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12), ("hub", v)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12), ("auth", v)
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_kernel_matches_dense_reference():
    want = _hits_numpy(EDGES, 6)
    got = K.hits(EDGES, max_iter=6)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)


def test_hits_structure(spark):
    # on a pure star 0 -> {1..4}: 0 is the only hub, 1..4 equal authorities
    edges = [(0, t) for t in range(1, 5)]
    got = {
        r["v"]: (r["hub"], r["authority"])
        for r in hits(_edges_df(spark, edges), max_iter=3).collect()
    }
    assert got[0] == pytest.approx((1.0, 0.0))
    for t in range(1, 5):
        assert got[t] == pytest.approx((0.0, 0.25))


def test_hits_empty_raises(spark):
    with pytest.raises(ValueError):
        hits(_edges_df(spark, []), max_iter=2)
