"""Louvain phase-1 (operators/louvain.py) vs its sequential kernel, plus
community-structure sanity on known graphs."""

import pytest

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.louvain import louvain_moves


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_louvain_matches_kernel(spark):
    pairs = sorted(
        {((i * 13) % 41, (i * i * 7 + 3) % 41) for i in range(150)}
        - {(v, v) for v in range(41)}
    )
    got = {
        r["v"]: r["community"]
        for r in louvain_moves(_edges(spark, pairs), max_rounds=6).collect()
    }
    assert got == K.louvain_moves(K.build_undirected_adj(pairs), max_rounds=6)


def test_louvain_two_triangles(spark):
    # two triangles joined by one bridge edge: each triangle is one
    # community (min member id wins the label by the tie-break)
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = {
        r["v"]: r["community"]
        for r in louvain_moves(_edges(spark, pairs), max_rounds=6).collect()
    }
    comms = {}
    for v, c in got.items():
        comms.setdefault(c, set()).add(v)
    assert sorted(map(sorted, comms.values())) == [[0, 1, 2], [3, 4, 5]]


def test_louvain_coarsens_star(spark):
    # star K1,6: everything collapses into the hub's community
    got = {
        r["v"]: r["community"]
        for r in louvain_moves(
            _edges(spark, [(0, i) for i in range(1, 7)]), max_rounds=8
        ).collect()
    }
    assert len(set(got.values())) == 1


def test_louvain_empty_raises(spark):
    with pytest.raises(ValueError):
        louvain_moves(_edges(spark, []).filter("src > 0"))
