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


def test_modularity_two_triangles_exact(spark):
    from dachshund_spark.operators.louvain import modularity

    # two triangles + bridge, perfect labeling: m=7, e_in=3 each,
    # vol = 7 each -> q_num = 2*(4*7*3 - 49) = 70, q_den = 196
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    lab = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], ["v", "community"]
    )
    r = modularity(_edges(spark, pairs), lab).collect()[0]
    assert (r["n_communities"], r["q_num"], r["q_den"]) == (2, 70, 196)
    assert r["modularity"] == 70 / 196


def test_modularity_matches_kernel_on_louvain_labels(spark):
    from dachshund_spark.operators.louvain import modularity

    pairs = sorted(
        {((i * 13) % 41, (i * i * 7 + 3) % 41) for i in range(150)}
        - {(v, v) for v in range(41)}
    )
    labels_df = louvain_moves(_edges(spark, pairs), max_rounds=6)
    got = modularity(_edges(spark, pairs), labels_df).collect()[0]
    adj = K.build_undirected_adj(pairs)
    want = K.modularity_of(adj, K.louvain_moves(adj, max_rounds=6))
    assert (got["n_communities"], got["q_num"], got["q_den"],
            got["modularity"]) == want
    # the moves must IMPROVE on the singleton partition's modularity
    singleton = K.modularity_of(adj, {v: v for v in adj})
    assert got["modularity"] > singleton[3]
