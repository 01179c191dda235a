"""Per-graph applyInPandas operators vs the kernel goldens, multiple
graph_ids in one DataFrame (the reference's batch-per-graph granularity)."""

import json

import pyspark.sql.functions as F

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators import pergraph as PG
from tests.fixtures import (
    KARATE_CLUB_EDGES,
    simple_graph_edges,
    weighted_graph_edges,
)


def _multi_graph_df(spark, graphs):
    rows = []
    for gid, edges in graphs.items():
        for u, v in edges:
            rows.append((gid, u, v))
    return spark.createDataFrame(rows, "graph_id long, src long, dst long")


def test_featurize_multi_graph(spark):
    graphs = {0: simple_graph_edges(0), 1: KARATE_CLUB_EDGES, 2: simple_graph_edges(3)}
    out = {r["graph_id"]: json.loads(r["stats"]) for r in PG.featurize(
        _multi_graph_df(spark, graphs)).collect()}
    for gid, edges in graphs.items():
        want = K.graph_stats(K.build_undirected_adj(edges), seed=gid)
        assert out[gid] == json.loads(json.dumps(want)), gid


def test_core_miner(spark):
    df = _multi_graph_df(spark, {7: simple_graph_edges(7)})
    rows = PG.core_miner(df).collect()
    adj = K.build_undirected_adj(simple_graph_edges(7))
    want_core = K.coreness_values(adj)
    want_anom = K.coreness_anomaly(adj, want_core)
    assert {r["node"]: r["coreness"] for r in rows} == want_core
    for r in rows:
        assert abs(r["anomaly"] - want_anom[r["node"]]) < 1e-12
    # sorted by coreness within the graph (core_transformer.rs:77)
    cor = [r["coreness"] for r in rows]
    assert cor == sorted(cor)


def test_weighted_core_miner(spark):
    rows = []
    for u, v, w in weighted_graph_edges(6):
        rows.append((6, u, v, w))
    df = spark.createDataFrame(rows, "graph_id long, src long, dst long, weight double")
    got = {r["node"]: r["frac_coreness"] for r in PG.weighted_core_miner(df).collect()}
    want = K.fractional_coreness(K.build_weighted_adj(weighted_graph_edges(6)))
    assert got == want


def test_kpeak_miner(spark):
    df = _multi_graph_df(spark, {8: simple_graph_edges(8)})
    got = {r["node"]: (r["peak"], r["mountain"]) for r in PG.kpeak_miner(df).collect()}
    peaks, mountains = K.k_peak_mountain_assignment(
        K.build_undirected_adj(simple_graph_edges(8))
    )
    m_of = {n: mid for mid, nodes in mountains.items() for n in nodes}
    assert got == {n: (peaks[n], m_of[n]) for n in peaks}


def test_cc_and_scc_per_graph(spark):
    df = _multi_graph_df(spark, {9: simple_graph_edges(9)})
    got = {r["node"]: r["component"] for r in
           PG.connected_components_per_graph(df).collect()}
    want, _ = K.connected_components_membership(
        K.build_undirected_adj(simple_graph_edges(9))
    )
    assert got == want

    scc = PG.scc_per_graph(_multi_graph_df(spark, {1: KARATE_CLUB_EDGES}))
    assert scc.select("component").distinct().count() == 34


def test_betweenness_and_evcent_per_graph(spark):
    df = _multi_graph_df(spark, {1: KARATE_CLUB_EDGES})
    bet = {r["node"]: r["betweenness"] for r in PG.betweenness_per_graph(df).collect()}
    assert abs(bet[34] - 160.5515873) <= 1e-6
    ev = {r["node"]: r["evcent"] for r in
          PG.eigenvector_centrality_per_graph(df).collect()}
    assert abs(ev[34] - 1.0) <= 0.001


def test_cnm_per_graph(spark):
    df = _multi_graph_df(spark, {1: KARATE_CLUB_EDGES})
    rows = PG.cnm_communities_per_graph(df).collect()
    trace = json.loads(rows[0]["modularity_trace"])
    from tests.fixtures import KARATE_MODULARITY_CHANGES

    for got, want in zip(trace, KARATE_MODULARITY_CHANGES):
        assert abs(got - want) <= 0.001
    # communities == kernel communities (canonical min-id labels)
    communities, _ = K.cnm_communities(K.build_undirected_adj(KARATE_CLUB_EDGES))
    want_label = {}
    for members in communities.values():
        m = min(members)
        for n in members:
            want_label[n] = m
    assert {r["node"]: r["community"] for r in rows} == want_label


def test_brokerage_per_graph(spark):
    from tests.fixtures import KARATE_BROKERAGE_EXPECTED

    df = _multi_graph_df(spark, {1: KARATE_CLUB_EDGES})
    membership = {n: 1 + (n <= 17) for n in range(1, 35)}
    rows = PG.brokerage_per_graph(df, membership).collect()
    for r in rows:
        coord, itin, rep, gate, liai, total = KARATE_BROKERAGE_EXPECTED[r["node"]]
        assert (
            r["coordinator"], r["itinerant"], r["representative"],
            r["gatekeeper"], r["liaison"], r["total_open_twopaths"],
        ) == (coord, itin, rep, gate, liai, total), r["node"]


def test_clique_miner_spark(spark):
    import json as _json

    from dachshund_spark.functions import clique_kernel as CK
    from dachshund_spark.operators.clique_miner import mine_cliques

    typespec = [
        ["author", "published_at", "conference"],
        ["author", "published_at", "journal"],
    ]
    rows = []
    # graph 1: planted 6x5 biclique + noise pendant
    for c in range(1, 7):
        for nc in range(100, 105):
            rows.append((1, c, nc, "published_at", "conference"))
    rows.append((1, 50, 300, "published_at", "journal"))
    # graph 2: too sparse, empty result after min_degree prune
    rows.append((2, 1, 100, "published_at", "journal"))
    df = spark.createDataFrame(
        rows,
        "graph_id long, core_id long, non_core_id long, edge_type string,"
        " non_core_type string",
    )
    out = mine_cliques(
        df, typespec, CK.SearchProblem(num_epochs=50, min_degree=2)
    ).collect()
    by_gid = {r["graph_id"]: r for r in out}
    assert 1 in by_gid
    r = by_gid[1]
    assert r["num_core"] == 6 and r["num_non_core"] == 5
    assert _json.loads(r["core_ids"]) == [1, 2, 3, 4, 5, 6]
    assert _json.loads(r["non_core_ids"]) == [100, 101, 102, 103, 104]
    assert r["cliqueness"] == 1.0
    assert 2 not in by_gid  # pruned to empty


def test_spectral_per_graph(spark):
    """Fiedler value per graph vs the kernel: karate club golden 0.469...
    (tests/karate_club.rs spectral family) and a disconnected graph -> 0."""
    from tests.fixtures import KARATE_CLUB_EDGES

    rows = [(1, u, v) for u, v in KARATE_CLUB_EDGES]
    rows += [(2, 1, 2), (2, 3, 4)]  # disconnected -> fiedler 0
    df = spark.createDataFrame(rows, "graph_id long, src long, dst long")
    got = {
        r["graph_id"]: r for r in PG.spectral_per_graph(df).collect()
    }
    assert abs(got[1]["algebraic_connectivity"] - 0.469) < 0.001
    assert got[1]["n_nodes"] == 34 and got[1]["n_edges"] == 78
    assert abs(got[2]["algebraic_connectivity"]) < 1e-9


def test_biconnectivity_kernel_brute_force():
    """cut_vertices_and_bridges vs exhaustive remove-and-recount on 150
    seeded random multigraphs (self-loops included)."""
    import random

    def comps(adj, skip_v=None, skip_e=None):
        seen, n = set(), 0
        for s in adj:
            if s == skip_v or s in seen:
                continue
            n += 1
            st = [s]
            seen.add(s)
            while st:
                u = st.pop()
                for w in adj[u]:
                    if w in (u, skip_v) or w in seen:
                        continue
                    if skip_e and (min(u, w), max(u, w)) == skip_e:
                        continue
                    seen.add(w)
                    st.append(w)
        return n

    rng = random.Random(42)
    for _ in range(150):
        n = rng.randint(2, 12)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(1, 18))
        ]
        adj = K.build_undirected_adj(edges)
        cuts, bridges = K.cut_vertices_and_bridges(adj)
        base = comps(adj)
        want_cuts = {
            v
            for v in adj
            if not set(adj[v]) <= {v} and comps(adj, skip_v=v) > base
        }
        es = {(min(u, w), max(u, w)) for u in adj for w in adj[u] if u != w}
        want_bridges = {e for e in es if comps(adj, skip_e=e) > base}
        assert cuts == want_cuts
        assert bridges == want_bridges


def test_biconnectivity_per_graph(spark):
    """Distributed per-graph output == kernel on a mixed fixture:
    triangle+pendant (cut 3, bridge 3-4), a pure path, and a cycle."""
    rows = (
        [(1, 1, 2), (1, 2, 3), (1, 1, 3), (1, 3, 4)]
        + [(2, 10, 11), (2, 11, 12)]
        + [(3, 20, 21), (3, 21, 22), (3, 22, 20)]
    )
    df = spark.createDataFrame(rows, "graph_id long, src long, dst long")
    got = {
        (r["graph_id"], r["node"]): (r["is_cut"], r["bridge_count"])
        for r in PG.biconnectivity_per_graph(df).collect()
    }
    assert got[(1, 3)] == (True, 1) and got[(1, 4)] == (False, 1)
    assert got[(1, 1)] == (False, 0) and got[(1, 2)] == (False, 0)
    assert got[(2, 11)] == (True, 2)
    assert got[(2, 10)] == (False, 1) and got[(2, 12)] == (False, 1)
    assert all(got[(3, v)] == (False, 0) for v in (20, 21, 22))
