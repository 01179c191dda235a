"""Jones–Plassmann coloring: distributed operator vs sequential kernel
mirror — exact (color, round) parity plus validity on seeded random
graphs and canonical shapes."""

import random

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.coloring import jp_coloring


def _check(spark, edges, seed=0):
    adj = K.build_undirected_adj(edges)
    want = K.jp_coloring(adj, seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["v"]: (r["color"], r["jp_round"])
        for r in jp_coloring(df, seed=seed).collect()
    }
    assert got == want
    for u in adj:
        for w in adj[u]:
            if u != w:
                assert got[u][0] != got[w][0]
    return got


def test_jp_coloring_shapes(spark):
    # triangle + pendant: 3 colors on the triangle, pendant reuses one
    got = _check(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert len({c for c, _ in got.values()}) == 3
    # path: 2 colors suffice for the greedy too (priorities permitting
    # at most 3); validity is what's pinned
    _check(spark, [(i, i + 1) for i in range(8)])
    # K5 needs exactly 5
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = _check(spark, k5)
    assert sorted(c for c, _ in got.values()) == [0, 1, 2, 3, 4]


def test_jp_coloring_random_parity(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(120)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        _check(spark, edges, seed=trial)
