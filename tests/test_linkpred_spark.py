"""Adamic-Adar link prediction (operators/linkpred.py) vs hand-computed
scores and the sequential kernel."""

import math

import pytest

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.linkpred import adamic_adar

# two wedge centers 3 and 4 both connect 1 and 2; (1,2) is NOT an edge.
# 5 hangs off 3 so deg(3)=3; deg(4)=2.
EDGES = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5)]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src bigint, dst bigint")


def test_adamic_adar_hand_computed(spark):
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
        for r in adamic_adar(_df(spark, EDGES), min_common=2).collect()
    }
    # (1,2) via centers 3 (deg 3) and 4 (deg 2); (3,4) via centers 1, 2
    # (both deg 2) — both non-adjacent distance-2 pairs
    assert got == {
        (1, 2): (2, round(1 / math.log(3) + 1 / math.log(2), 6)),
        (3, 4): (2, round(2 / math.log(2), 6)),
    }


def test_adamic_adar_excludes_existing_edges(spark):
    # close the (1, 2) edge: the pair is adjacent now, so it must vanish
    got = adamic_adar(_df(spark, EDGES + [(1, 2)]), min_common=2).collect()
    assert all((r["u"], r["v"]) != (1, 2) for r in got)


def test_adamic_adar_matches_kernel(spark):
    # K5 minus a perfect matching-ish set: denser wedge structure
    edges = [
        (a, b)
        for a in range(1, 7)
        for b in range(a + 1, 7)
        if (a + b) % 3 != 0
    ]
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
        for r in adamic_adar(_df(spark, edges), min_common=1).collect()
    }
    want = K.adamic_adar(K.build_undirected_adj(edges), min_common=1)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k


def test_adamic_adar_center_degree_cap(spark):
    # capping out the deg-3 center (vertex 3): (1,2) keeps only wedge
    # center 4, (1,5)/(2,5) vanish entirely, (3,4) is untouched (its
    # centers 1 and 2 are deg 2)
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
        for r in adamic_adar(
            _df(spark, EDGES), min_common=1, max_center_degree=2
        ).collect()
    }
    assert got == {
        (1, 2): (1, round(1 / math.log(2), 6)),
        (3, 4): (2, round(2 / math.log(2), 6)),
    }
