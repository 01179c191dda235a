"""Truss decomposition (edge trussness) vs its sequential kernel and
vs the single-k k_truss_edges operator."""

import random

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.coreness import k_truss_edges, trussness


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _k4_plus_tail():
    # K4 (trussness 4) + a triangle hanging off (trussness 3) + a path
    # tail (trussness 2)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(4, 5), (4, 6), (5, 6)]
    tail = [(6, 7), (7, 8)]
    return k4 + tri + tail


def test_trussness_hand_graph(spark):
    edges = _k4_plus_tail()
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in trussness(_edges_df(spark, edges)).collect()
    }
    assert got == K.trussness(K.build_undirected_adj(edges))
    for e in [(1, 2), (3, 4)]:
        assert got[e] == 4
    assert got[(5, 6)] == 3 and got[(4, 5)] == 3
    assert got[(6, 7)] == 2 and got[(7, 8)] == 2


def test_trussness_matches_kernel_random_graph(spark):
    rng = random.Random(13)
    n = 40
    edges = [(i, i + 1) for i in range(n - 1)]
    for _ in range(160):
        a, b = rng.sample(range(n), 2)
        edges.append((a, b))
    df = _edges_df(spark, edges)
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in trussness(df).collect()
    }
    want = K.trussness(K.build_undirected_adj(edges))
    assert got == want
    # cross-operator invariant: {e : trussness(e) >= k} == k-truss(k)
    for k in (3, 4):
        tk = {
            (r["src"], r["dst"]) for r in k_truss_edges(df, k).collect()
        }
        assert tk == {e for e, t in got.items() if t >= k}


def test_trussness_edge_cases(spark):
    # triangle-free graph: everything trussness 2
    star = [(0, i) for i in range(1, 8)]
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in trussness(_edges_df(spark, star)).collect()
    }
    assert set(got.values()) == {2} and len(got) == 7
    # self-loops/duplicates/reversed edges collapse to the simple graph
    messy = [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (1, 3)]
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in trussness(_edges_df(spark, messy)).collect()
    }
    assert got == {(1, 2): 3, (1, 3): 3, (2, 3): 3}
    # empty
    assert trussness(_edges_df(spark, star).filter("src < 0")).count() == 0
