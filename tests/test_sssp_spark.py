"""Weighted SSSP (frontier Bellman-Ford supersteps) vs the sequential
kernel, goldens, and the non-convergence guard."""

import random

import pytest

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.sssp import weighted_sssp


def _wdf(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_sssp_prefers_cheaper_longer_path(spark):
    # 1->2 costs 10 direct, but 2 via 3 costs 2: the round-2 relaxation
    # must LOWER a distance set in round 1 (the label-correcting case
    # unit-weight BFS never exercises)
    edges = [(1, 2, 10.0), (1, 3, 1.0), (3, 2, 1.0), (2, 4, 1.0)]
    got = {r["v"]: (r["dist"], r["hops"]) for r in
           weighted_sssp(_wdf(spark, edges), 1).collect()}
    assert got == {1: (0.0, 0), 3: (1.0, 1), 2: (2.0, 2), 4: (3.0, 3)}


def test_sssp_unreachable_and_directionality(spark):
    # directed: 5 -> 1 does not make 5 reachable FROM 1; 9 is isolated
    edges = [(1, 2, 3.0), (5, 1, 1.0), (9, 9, 1.0)]
    got = {r["v"]: r["dist"] for r in
           weighted_sssp(_wdf(spark, edges), 1).collect()}
    assert got == {1: 0.0, 2: 3.0}


def test_sssp_matches_kernel_random_graph(spark):
    rng = random.Random(11)
    n = 120
    edges = [(i, i + 1, float(rng.randint(1, 9))) for i in range(n - 1)]
    for _ in range(400):
        a, b = rng.sample(range(n), 2)
        edges.append((a, b, float(rng.randint(1, 9))))
    # exercises > 3 rounds => at least one mid-loop lineage cut
    got = {r["v"]: (r["dist"], r["hops"]) for r in
           weighted_sssp(_wdf(spark, edges), 0).collect()}
    assert got == K.bellman_ford_rounds(edges, 0)


def test_sssp_undirected_symmetrized_parity(spark):
    edges = [(1, 2, 2.0), (2, 3, 2.0), (1, 3, 5.0), (3, 4, 1.0)]
    sym = edges + [(t, s, w) for s, t, w in edges]
    got = {r["v"]: (r["dist"], r["hops"]) for r in
           weighted_sssp(_wdf(spark, sym), 4).collect()}
    assert got == K.bellman_ford_rounds(sym, 4)
    assert got[1] == (5.0, 3)  # 4-3-2-1 (cost 5) beats 4-3-1 (cost 6)


def test_sssp_max_rounds_guard(spark):
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    with pytest.raises(RuntimeError, match="did not converge"):
        weighted_sssp(_wdf(spark, edges), 1, max_rounds=2)
