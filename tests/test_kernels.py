"""Golden-value tests for the pure-Python kernels, asserting the exact
values hard-coded in the reference's own test suite (file:line cited per
test)."""

import math

import pytest

from dachshund_spark.functions import kernels as K
from tests.fixtures import (
    ALMOST_K4_EDGES,
    EXPECTED_MODULARITY_CHANGES,
    K4_EDGES,
    KARATE_BROKERAGE_EXPECTED,
    KARATE_CLUB_EDGES,
    KARATE_MODULARITY_CHANGES,
    KARATE_PLUS_EDGE,
    TWO_KARATE_CLUBS,
    TWO_KARATE_CLUBS_BRIDGE,
    complete_graph_edges,
    simple_graph_edges,
    weighted_graph_edges,
)


@pytest.fixture(scope="module")
def karate():
    return K.build_undirected_adj(KARATE_CLUB_EDGES)


def test_karate_club_basics(karate):
    # tests/karate_club.rs:252-289
    assert len(karate) == 34
    assert K.count_edges(karate) == 78
    deg = K.degrees(karate)
    assert deg[1] == 16 and deg[2] == 9 and deg[3] == 10
    assert deg[27] == 2 and deg[34] == 17
    assert K.clustering_coefficient(karate, 1) == 0.15
    assert abs(K.clustering_coefficient(karate, 34) - 0.1102941) <= 1e-5
    assert K.clustering_coefficient(karate, 22) == 1.0
    assert K.clustering_coefficient(karate, 12) is None
    assert K.clustering_coefficient(karate, 10) == 0.0


def test_shortest_paths(karate):
    # tests/karate_club.rs:291-339
    dist, parents = K.shortest_paths(karate, 1)
    assert dist[1] == 0 and parents[1] == {1}
    assert dist[2] == 1 and dist[33] == 2 and dist[30] == 3
    assert 1 in parents[2]
    assert parents[10] == {3}
    assert parents[33] == {3, 9, 32}
    assert parents[30] == {33, 34}

    paths = K.enumerate_shortest_paths(dist, parents, 1)
    assert len(paths) == 34
    unrolled = {
        "-".join(map(str, p)) for plist in paths.values() for p in plist
    }
    assert len(unrolled) == 89
    assert len(paths[2]) == 1 and len(paths[2][0]) == 2
    assert len(paths[30][0]) == 4
    assert len(paths[16]) == 7
    for want in [
        "1-9-34-16", "1-14-34-16", "1-20-34-16", "1-32-34-16",
        "1-3-33-16", "1-9-33-16", "1-32-33-16",
    ]:
        assert want in unrolled


def test_connectivity(karate):
    # tests/karate_club.rs:361-382, :488-501
    assert K.is_connected(karate)
    cc = [c for c in K.connected_components(karate) if c]
    assert len(cc) == 1 and len(cc[0]) == 34

    unconnected = K.build_undirected_adj(KARATE_PLUS_EDGE)
    assert not K.is_connected(unconnected)
    cc2 = [c for c in K.connected_components(unconnected) if c]
    assert sorted(len(c) for c in cc2) == [2, 34]
    # discovery order: component containing node 1 first
    assert len(cc2[0]) == 34 and len(cc2[1]) == 2

    with pytest.raises(ValueError):
        K.is_connected({})

    double = K.build_undirected_adj(TWO_KARATE_CLUBS)
    cc3 = [c for c in K.connected_components(double) if c]
    assert len(cc3) == 2 and len(cc3[0]) == 34 and len(cc3[1]) == 34


def test_betweenness(karate):
    # tests/karate_club.rs:384-404 (naive and Brandes share goldens)
    for bet in (K.betweenness_naive(karate), K.betweenness_brandes(karate)):
        assert bet[8] == 0.0
        assert abs(bet[34] - 160.5515873) <= 1e-6
        assert abs(bet[33] - 76.6904762) <= 1e-6
        assert abs(bet[32] - 73.0095238) <= 1e-6


def test_matrices(karate):
    # tests/karate_club.rs:424-444
    deg_mat, _ = K.degree_matrix(karate)
    assert deg_mat.shape == (34, 34)
    assert deg_mat[0, 0] == 16.0 and deg_mat[33, 33] == 17.0
    assert deg_mat[2, 2] == 10.0 and deg_mat.sum() == 156.0
    adj_mat, _ = K.adjacency_matrix(karate)
    assert adj_mat.sum() == 156.0 and adj_mat[0].sum() == 16.0
    assert adj_mat[6, 16] == 1.0 and adj_mat[6, 17] == 0.0
    lap, _ = K.laplacian_matrix(karate)
    assert lap.sum() == 0.0
    assert ((lap + adj_mat) == deg_mat).all()


def test_eigen(karate):
    # tests/karate_club.rs:446-458
    fiedler = K.algebraic_connectivity(karate)
    assert abs(fiedler - 0.469) <= 0.001
    ev = K.eigenvector_centrality(karate, 0.001, 1000)
    assert abs(ev[34] - 1.0) <= 0.001
    assert abs(ev[1] - 0.95213237) <= 0.001
    assert abs(ev[19] - 0.27159396) <= 0.001


def test_k_cores(karate):
    # tests/karate_club.rs:460-486
    assert [len(c) for c in K.k_cores(karate, 1)] == [34]
    k4 = K.k_cores(karate, 4)
    assert len(k4) == 1 and len(k4[0]) == 10
    assert K.k_cores(karate, 5) == []

    double_bridge = K.build_undirected_adj(TWO_KARATE_CLUBS_BRIDGE)
    k4b = K.k_cores(double_bridge, 4)
    assert len(k4b) == 2 and len(k4b[0]) == 10 and len(k4b[1]) == 10

    coreness = K.coreness_values(karate)
    assignments = K.core_assignments(karate, coreness)
    assert len(assignments[0][0]) == 34
    assert len(assignments[1][0]) == 33
    assert len(assignments[2][0]) == 22
    assert len(assignments[3][0]) == 10
    assert coreness[34] == 4


def test_transitivity(karate):
    # tests/karate_club.rs:503-514
    t = K.transitivity(karate)
    assert abs(t - 0.2556818181818182) <= 1e-15
    approx = K.approx_transitivity(karate, 1000, seed=7)
    assert abs(approx - t) <= 0.05


def test_cnm_karate(karate):
    # tests/karate_club.rs:516-562
    _, changes = K.cnm_communities(karate)
    assert len(changes) >= len(KARATE_MODULARITY_CHANGES)
    for got, want in zip(changes, KARATE_MODULARITY_CHANGES):
        assert abs(got - want) <= 0.001


def test_cnm_simple_graphs():
    # tests/simple_graph.rs:430-444
    for idx, expected in EXPECTED_MODULARITY_CHANGES.items():
        adj = K.build_undirected_adj(simple_graph_edges(idx))
        _, changes = K.cnm_communities(adj)
        for i, want in enumerate(expected):
            assert abs(changes[i] - want) <= 0.001, (idx, i)


def test_brokerage():
    # tests/karate_club.rs:564-636 (directed graph, edges as given)
    out_adj, in_adj = K.build_directed_adj(KARATE_CLUB_EDGES)
    membership = {n: 1 + (n <= 17) for n in out_adj}
    for n in out_adj:
        s = K.brokerage_scores(out_adj, in_adj, n, membership)
        coord, itin, rep, gate, liai, total = KARATE_BROKERAGE_EXPECTED[n]
        assert s["coordinator"] == coord, n
        assert s["itinerant"] == itin, n
        assert s["representative"] == rep, n
        assert s["gatekeeper"] == gate, n
        assert s["liaison"] == liai, n
        assert s["total_open_twopaths"] == total, n


def test_directed_components_and_acyclicity():
    # tests/karate_club.rs:637-704
    out_adj, in_adj = K.build_directed_adj(KARATE_CLUB_EDGES)
    wcc = [c for c in K.weakly_connected_components(out_adj, in_adj) if c]
    assert len(wcc) == 1 and len(wcc[0]) == 34

    scc = K.strongly_connected_components(out_adj, in_adj)
    assert len(scc) == 34

    both_ways = KARATE_CLUB_EDGES + [(v, u) for u, v in KARATE_CLUB_EDGES]
    out2, in2 = K.build_directed_adj(both_ways)
    assert len(K.strongly_connected_components(out2, in2)) == 1

    core = {1, 2, 3}
    with_core = KARATE_CLUB_EDGES + [
        (v, u) for u, v in KARATE_CLUB_EDGES if u in core and v in core
    ]
    out3, in3 = K.build_directed_adj(with_core)
    scc3 = K.strongly_connected_components(out3, in3)
    assert len(scc3) == 32
    assert sorted(scc3[0]) == [1, 2, 3]

    assert K.is_acyclic(out_adj)
    assert not K.is_acyclic(out2)
    assert not K.is_acyclic(out3)


def test_truss_graphs():
    # tests/simple_graph.rs:266-313
    g5 = K.build_undirected_adj(simple_graph_edges(5))
    assert len([c for c in K.connected_components(g5) if c]) == 1
    # node 3 loses its only edge; the reference emits an *empty* second
    # component for such isolated roots (connected_components.rs:40-47:
    # roots are only recorded via a back-edge) and its test counts it.
    assert len(K.connected_components(g5, ignore_edges={(2, 3)})) == 2

    def truss_count(idx, k):
        return len(K.k_trusses(K.build_undirected_adj(simple_graph_edges(idx)), k)[0])

    assert truss_count(1, 3) == 1
    assert truss_count(2, 3) == 1
    assert truss_count(3, 3) == 2
    assert truss_count(4, 3) == 2

    def truss_sizes(idx, k):
        return [len(t) for t in K.k_trusses(
            K.build_undirected_adj(simple_graph_edges(idx)), k)[0]]

    assert truss_sizes(1, 3)[0] == 3
    assert truss_sizes(2, 3)[0] == 5
    assert truss_sizes(5, 3)[0] == 3

    g0 = K.build_undirected_adj(simple_graph_edges(0))
    trusses, truss_nodes = K.k_trusses(g0, 3)
    assert len(trusses) == 2
    assert frozenset({0, 1, 9}) in truss_nodes
    assert frozenset({8, 10, 16}) in truss_nodes

    g6 = K.build_undirected_adj(simple_graph_edges(6))
    trusses2, truss_nodes2 = K.k_trusses(g6, 4)
    assert len(trusses2) == 2
    assert frozenset({3, 8, 9, 18}) in truss_nodes2
    assert frozenset({7, 11, 15, 21}) in truss_nodes2


def test_coreness_simple_graphs():
    # tests/simple_graph.rs:315-344
    g3 = K.build_undirected_adj(simple_graph_edges(3))
    coreness = K.coreness_values(g3)
    assert coreness[2] == 2 and coreness[5] == 2
    two_cores = K.k_cores(g3, 2)
    assert len(two_cores) == 2
    assert len(two_cores[0]) == 3 and len(two_cores[1]) == 3
    assert K.k_cores(g3, 3) == []

    # the case that breaks the reference's own peeling (simple_graph.rs:335)
    g7 = K.build_undirected_adj(simple_graph_edges(7))
    coreness7 = K.coreness_values(g7)
    for i in range(1, 15):
        assert coreness7[i] == (2 if i > 10 else 1), i


def test_averaged_ties_ranking():
    # tests/simple_graph.rs:346-361
    values = {1: 10, 2: 20, 3: 15, 4: 20, 5: 25}
    ranks = K.averaged_ties_ranking(values)
    assert ranks == {5: 1.0, 4: 2.5, 2: 2.5, 3: 4.0, 1: 5.0}


def test_k_peaks():
    # tests/simple_graph.rs:446-530
    g8 = K.build_undirected_adj(simple_graph_edges(8))
    peaks, mountains = K.k_peak_mountain_assignment(g8)
    for n in (0, 1, 2, 3, 4, 5):
        assert peaks[n] == 5, n
    for n in (8, 10, 11, 12, 13):
        assert peaks[n] == 3, n
    assert peaks[6] == 1 and peaks[7] == 1
    assert peaks[14] == 0 and peaks[9] == 0
    for n in (0, 1, 2, 3, 4, 5, 6, 7, 9):
        assert n in mountains[0], n
    for n in (8, 10, 11, 12, 13, 14):
        assert n in mountains[1], n


def test_weighted_graphs():
    # tests/weighted_graph.rs:63-133
    star = K.build_weighted_adj(weighted_graph_edges(0))
    assert len(star) == 4
    assert sum(star[0].values()) == 6.0

    dup = K.build_weighted_adj(weighted_graph_edges(1))
    assert len(dup[0]) == 1 and dup[0][1] == 2.5

    dup2 = K.build_weighted_adj(weighted_graph_edges(2))
    assert len(dup2[0]) == 1 and dup2[0][1] == 0.1

    # unweighted coreness over the weighted structure
    unw = {n: set(ws) for n, ws in star.items()}
    coreness = K.coreness_values(unw)
    for i in range(4):
        assert coreness[i] == 1
    square = K.build_weighted_adj(weighted_graph_edges(3))
    coreness = K.coreness_values({n: set(ws) for n, ws in square.items()})
    for i in range(4):
        assert coreness[i] == 2

    fc4 = K.fractional_coreness(K.build_weighted_adj(weighted_graph_edges(4)))
    for i in range(6):
        assert fc4[i] == (1.0 if i > 2 else 4.0), i
    fc5 = K.fractional_coreness(K.build_weighted_adj(weighted_graph_edges(5)))
    for i in range(5):
        assert fc5[i] == 2.0
    fc6 = K.fractional_coreness(K.build_weighted_adj(weighted_graph_edges(6)))
    for i in range(8):
        assert fc6[i] == (4.0 if i in (0, 4) else 6.0), i


def test_triangles():
    # tests/triangles.rs:32-105
    k4 = K.build_undirected_adj(K4_EDGES)
    for n in k4:
        assert K.triangle_count(k4, n) == 3
        assert K.clustering_coefficient(k4, n) == 1.0
    assert K.avg_clustering(k4) == 1.0
    assert K.transitivity(k4) == 1.0

    ak4 = K.build_undirected_adj(ALMOST_K4_EDGES)
    for i in range(4):
        assert K.triangle_count(ak4, i) == (2 if i <= 1 else 1)
    assert abs(5.0 / 6.0 - K.avg_clustering(ak4)) <= 1e-5
    assert K.transitivity(ak4) == 0.75
    assert abs(K.approx_avg_clustering(ak4, 20000, seed=3) - 5 / 6) <= 0.01
    assert abs(K.approx_transitivity(ak4, 20000, seed=3) - 0.75) <= 0.01

    k100 = K.build_undirected_adj(complete_graph_edges(100))
    assert K.triangle_count(k100, 1) == math.comb(99, 2)


def test_pagerank_numpy_properties():
    pr = K.pagerank_numpy(
        KARATE_CLUB_EDGES + [(v, u) for u, v in KARATE_CLUB_EDGES]
    )
    assert abs(sum(pr.values()) - 1.0) <= 1e-9
    # node 34 (highest degree) outranks everything
    assert max(pr, key=pr.get) == 34


def test_label_propagation_two_cliques():
    # two disjoint triangles: each converges to its own min label
    adj = K.build_undirected_adj(simple_graph_edges(3))
    labels = K.label_propagation(adj)
    assert len({labels[0], labels[3]}) == 2


def test_graph_stats_featurizer():
    # featurizer composite mirrors simple_transformer.rs:42-84 on graph 0
    g0 = K.build_undirected_adj(simple_graph_edges(0))
    stats = K.graph_stats(g0)
    assert stats["num_edges"] == 28
    assert stats["num_connected_components"] == 1
    assert stats["size_of_largest_cc"] == 19
    assert stats["num_16_cores"] == 0
    assert stats["num_17_trusses"] == 0
    assert 0 <= stats["clust_coef"] <= 1


def test_tarjan_scc_vs_reference_port():
    """tarjan_scc is the true-SCC oracle; on the reference's own test
    shapes it matches the reference port, and on the bug-exposing shape
    it differs exactly as documented (reference bug #3)."""
    # DAG: every node its own SCC (reference test shape)
    dag = [(1, 2), (1, 3), (2, 4), (3, 4)]
    out_adj, in_adj = K.build_directed_adj(dag)
    assert K.tarjan_scc(out_adj) == [[1], [2], [3], [4]]
    assert len(K.strongly_connected_components(out_adj, in_adj)) == 4
    # fully symmetric: one SCC (reference test shape)
    both = dag + [(v, u) for u, v in dag]
    out_adj, in_adj = K.build_directed_adj(both)
    assert K.tarjan_scc(out_adj) == [[1, 2, 3, 4]]
    assert len(K.strongly_connected_components(out_adj, in_adj)) == 1
    # the shape where the reference's shortcut is wrong
    bug = [(5, 6), (6, 7), (7, 5), (7, 30), (30, 1), (1, 2), (2, 1)]
    out_adj, in_adj = K.build_directed_adj(bug)
    assert K.tarjan_scc(out_adj) == [[1, 2], [5, 6, 7], [30]]
    ref = K.strongly_connected_components(out_adj, in_adj)
    assert sorted(ref[0]) == [1, 2, 5, 6, 7, 30]  # reference merges all
