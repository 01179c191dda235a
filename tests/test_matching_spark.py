"""Maximal matching (operators/matching.py) vs its sequential greedy
kernel, plus the matching/maximality invariants."""

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.matching import greedy_matching


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _fixture_pairs():
    # deterministic pseudo-random graph with dup + reversed edges and a
    # self-loop, so the canonicalization path is exercised too
    pairs = sorted({((i * 11) % 37, (i * i * 3 + 5) % 37) for i in range(140)})
    return pairs + [(5, 5)] + [(b, a) for a, b in pairs[:10]]


def test_matching_matches_kernel(spark):
    pairs = _fixture_pairs()
    got = sorted((r["a"], r["b"]) for r in greedy_matching(_edges(spark, pairs)).collect())
    assert got == K.greedy_matching(pairs)


def test_matching_is_a_matching_and_maximal(spark):
    pairs = _fixture_pairs()
    got = sorted((r["a"], r["b"]) for r in greedy_matching(_edges(spark, pairs)).collect())
    matched = [v for e in got for v in e]
    assert len(matched) == len(set(matched))  # no vertex matched twice
    free = set(matched)
    for s, t in pairs:  # maximality: no edge with both endpoints free
        if s != t:
            assert s in free or t in free


def test_matching_k2_and_star(spark):
    # K2: the single edge is matched
    assert [(r["a"], r["b"]) for r in greedy_matching(_edges(spark, [(2, 1)])).collect()] == [(1, 2)]
    # star: exactly one spoke wins, and it's the kernel's pick
    star = [(0, i) for i in range(1, 8)]
    got = [(r["a"], r["b"]) for r in greedy_matching(_edges(spark, star)).collect()]
    assert got == K.greedy_matching(star) and len(got) == 1


def test_matching_self_loops_only_is_empty(spark):
    assert greedy_matching(_edges(spark, [(3, 3), (4, 4)])).count() == 0


def test_double_sweep_path_graph_exact(spark):
    from dachshund_spark.operators.paths import double_sweep_diameter

    # path 0-1-2-3-4: diameter 4, sweep1 from 0, farthest 4
    r = double_sweep_diameter(
        _edges(spark, [(i, i + 1) for i in range(4)])
    ).collect()[0]
    assert (r["sweep1_source"], r["sweep2_source"],
            r["diameter_lower_bound"]) == (0, 4, 4)


def test_double_sweep_matches_kernel(spark):
    from dachshund_spark.operators.paths import double_sweep_diameter

    pairs = _fixture_pairs()
    got = double_sweep_diameter(_edges(spark, pairs)).collect()[0]
    want = K.double_sweep_diameter(K.build_undirected_adj(pairs))
    assert (got["sweep1_source"], got["sweep2_source"],
            got["diameter_lower_bound"]) == want
