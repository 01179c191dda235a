"""Per-graph exact algorithm ports: ``groupBy(graph_id).applyInPandas``
over the pure-Python kernels.

This is the DataFrame form of the reference's graph-per-key batching
(transformer_base.rs:58-88, simple_transformer.rs:143-173): each graph_id
group becomes one Arrow batch in one task; the kernel runs the exact
sequential algorithm (CNM heaps, fractional-coreness priority queue,
Brandes, Fiedler) whose semantics cannot be superstep-ized without
changing results.  Parallelism across graphs is Spark task parallelism —
the same granularity as the reference's rayon pool, minus the pre-sorted
input requirement (the shuffle groups keys for us).

Memory bound: one graph per worker heap — the same practical bound as the
reference's per-batch build.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame

from ..functions import kernels as K

GRAPH_COL = "graph_id"


def stable_graph_seed(gid) -> int:
    """Executor-stable integer seed for a graph id: numeric ids pass
    through; anything else hashes via md5 (python's builtin str hash is
    PYTHONHASHSEED-salted and differs across worker processes)."""
    s = str(gid)
    if s.isdigit():
        return int(s)
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _adj_from_pdf(pdf: pd.DataFrame):
    return K.build_undirected_adj(
        list(zip(pdf["src"].astype("int64"), pdf["dst"].astype("int64")))
    )


def featurize(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """simple_graph_featurizer: one JSON feature map per graph
    (cf. simple_transformer.rs:41-84; output `graph_id\\tjson`)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        # seed betweenness-source sampling by graph id for determinism —
        # md5-based for non-numeric ids (python str hash is
        # PYTHONHASHSEED-salted and would differ across executors)
        stats = K.graph_stats(adj, seed=stable_graph_seed(gid))
        return pd.DataFrame({graph_col: [gid], "stats": [json.dumps(stats, sort_keys=True)]})

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, stats string"
    )


def approx_stats_per_graph(
    edges: DataFrame, samples: int = 200, graph_col: str = GRAPH_COL
) -> DataFrame:
    """Seeded sampling approximations + connectivity, one row per graph:
    (graph_id, is_connected, approx_avg_clustering, approx_transitivity).

    Ports the reference's wedge-sampling estimators (clustering.rs:50-80,
    transitivity.rs:56-91) and is_connected (connectivity.rs:48-63).
    Sampling is seeded by ``stable_graph_seed(graph_id)`` so the result is
    deterministic across executors and retries.  Graphs with no vertex of
    degree >= 2 have no wedges to sample — both estimators are null."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        seed = stable_graph_seed(gid)
        has_wedge = any(len(nbrs) >= 2 for nbrs in adj.values())
        return pd.DataFrame(
            {
                graph_col: [gid],
                "is_connected": [K.is_connected(adj)],
                "approx_avg_clustering": [
                    K.approx_avg_clustering(adj, samples, seed)
                    if has_wedge
                    else None
                ],
                "approx_transitivity": [
                    K.approx_transitivity(adj, samples, seed)
                    if has_wedge
                    else None
                ],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, is_connected boolean,"
        " approx_avg_clustering double, approx_transitivity double",
    )


def core_miner(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """core_miner default output: per node coreness, degree, anomaly,
    sorted by coreness (cf. core_transformer.rs:64-92)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        core = K.coreness_values(adj)
        anom = K.coreness_anomaly(adj, core)
        deg = K.degrees(adj)
        rows = sorted(core.items(), key=lambda kv: (kv[1], kv[0]))
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": [n for n, _ in rows],
                "coreness": [c for _, c in rows],
                "degree": [deg[n] for n, _ in rows],
                "anomaly": [anom[n] for n, _ in rows],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, node long, coreness int, degree int, anomaly double",
    )


def weighted_core_miner(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """core_miner -w: fractional coreness + degree
    (cf. weighted_core_transformer.rs:56-82)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        wadj = K.build_weighted_adj(
            list(
                zip(
                    pdf["src"].astype("int64"),
                    pdf["dst"].astype("int64"),
                    pdf["weight"].astype("float64"),
                )
            )
        )
        fc = K.fractional_coreness(wadj)
        rows = sorted(fc.items(), key=lambda kv: (kv[1], kv[0]))
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": [n for n, _ in rows],
                "frac_coreness": [c for _, c in rows],
                "degree": [len(wadj[n]) for n, _ in rows],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, node long, frac_coreness double, degree int"
    )


def kpeak_miner(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """core_miner --kpeaks: coreness, peak number, mountain id
    (cf. kpeak_transformer.rs:62-89)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        core = K.coreness_values(adj)
        peaks, mountains = K.k_peak_mountain_assignment(adj)
        m_of = {n: mid for mid, nodes in mountains.items() for n in nodes}
        rows = sorted(adj)
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": rows,
                "coreness": [core[n] for n in rows],
                "peak": [peaks[n] for n in rows],
                "mountain": [m_of[n] for n in rows],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, node long, coreness int, peak int, mountain int",
    )


def core_assignments_per_graph(
    edges: DataFrame, graph_col: str = GRAPH_COL
) -> DataFrame:
    """Per-coreness-level CC decomposition per graph (coreness.rs:82-104):
    for each level k >= 1, the connected components of the subgraph induced
    by vertices of coreness >= k.  One row per (level, node); component is
    labeled by its min node id (canonical relabeling of the kernel's list
    index)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        levels = K.core_assignments(adj)
        recs = []
        for lvl, comps in enumerate(levels, start=1):
            for comp in comps:
                m = min(comp)
                for n in sorted(comp):
                    recs.append((gid, lvl, n, m))
        return pd.DataFrame(
            recs, columns=[graph_col, "level", "node", "component"]
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, level int, node long, component long"
    )


def spectral_per_graph(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """Spectral summary per graph: node count, edge count, algebraic
    connectivity (Fiedler value — second-smallest Laplacian eigenvalue,
    algebraic_connectivity.rs:20-26).  Small-graph path by design: the
    dense matrices live inside one applyInPandas task per graph."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        fiedler = K.algebraic_connectivity(adj)
        return pd.DataFrame(
            {
                graph_col: [gid],
                "n_nodes": [len(adj)],
                "n_edges": [K.count_edges(adj)],
                # + 0.0 folds IEEE -0.0 (disconnected graphs round to a
                # signed zero) to +0.0 so both gate sides agree
                "algebraic_connectivity": [round(float(fiedler), 6) + 0.0],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, n_nodes int, n_edges int,"
        " algebraic_connectivity double",
    )


class ModMembership:
    """Deterministic node->community map (node % k) — a picklable
    dict-like for brokerage queries when no community assignment is
    supplied upstream."""

    def __init__(self, k: int):
        self.k = k

    def __getitem__(self, node):
        return int(node) % self.k


def connected_components_per_graph(
    edges: DataFrame, graph_col: str = GRAPH_COL
) -> DataFrame:
    """connected_component_extractor: per node, component id in the
    reference's discovery order (cf.
    connected_components_transformer.rs:52-72)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        membership, _ = K.connected_components_membership(adj)
        rows = sorted(membership.items())
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": [n for n, _ in rows],
                "component": [c for _, c in rows],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, node long, component int"
    )


def scc_per_graph(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """Strongly connected components per graph.  Note: the reference CLI's
    `-d` flag is inverted (connected_component_extractor.rs:48-52 runs the
    undirected transformer for -d); we implement the documented intent."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        out_adj, in_adj = K.build_directed_adj(
            list(zip(pdf["src"].astype("int64"), pdf["dst"].astype("int64")))
        )
        comps = K.strongly_connected_components(out_adj, in_adj)
        recs = []
        for idx, comp in enumerate(comps):
            for n in comp:
                recs.append((gid, n, idx))
        return pd.DataFrame(recs, columns=[graph_col, "node", "component"])

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, node long, component int"
    )


def betweenness_per_graph(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """Exact Brandes betweenness per graph (betweenness.rs:57-96)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        bet = K.betweenness_brandes(adj)
        rows = sorted(bet.items())
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": [n for n, _ in rows],
                "betweenness": [b for _, b in rows],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, node long, betweenness double"
    )


def eigenvector_centrality_per_graph(
    edges: DataFrame, eps: float = 0.001, max_iter: int = 1000,
    graph_col: str = GRAPH_COL,
) -> DataFrame:
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        ev = K.eigenvector_centrality(adj, eps, max_iter)
        rows = sorted(ev.items())
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": [n for n, _ in rows],
                "evcent": [x for _, x in rows],
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn, f"{graph_col} long, node long, evcent double"
    )


def cnm_communities_per_graph(edges: DataFrame, graph_col: str = GRAPH_COL) -> DataFrame:
    """Exact CNM greedy modularity per graph (cnm_communities.rs:92-278);
    returns one row per node with its final community id (the min node id
    in the community, a canonical relabeling of the reference's internal
    indices) plus the modularity-change trace as JSON on each row group."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = _adj_from_pdf(pdf)
        communities, trace = K.cnm_communities(adj)
        label = {}
        for _, members in communities.items():
            m = min(members)
            for n in members:
                label[n] = m
        rows = sorted(label.items())
        tr = json.dumps(trace)
        return pd.DataFrame(
            {
                graph_col: [gid] * len(rows),
                "node": [n for n, _ in rows],
                "community": [c for _, c in rows],
                "modularity_trace": [tr] * len(rows),
            }
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, node long, community long, modularity_trace string",
    )


def brokerage_per_graph(
    edges: DataFrame, membership: dict, graph_col: str = GRAPH_COL
) -> DataFrame:
    """Brokerage role census per node for directed graphs
    (brokerage.rs:26-66).  ``membership``: {node: community}."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        out_adj, in_adj = K.build_directed_adj(
            list(zip(pdf["src"].astype("int64"), pdf["dst"].astype("int64")))
        )
        recs = []
        for n in sorted(out_adj):
            s = K.brokerage_scores(out_adj, in_adj, n, membership)
            recs.append(
                (
                    gid, n,
                    s["coordinator"], s["itinerant"], s["gatekeeper"],
                    s["representative"], s["liaison"], s["total_open_twopaths"],
                )
            )
        return pd.DataFrame(
            recs,
            columns=[
                graph_col, "node", "coordinator", "itinerant", "gatekeeper",
                "representative", "liaison", "total_open_twopaths",
            ],
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, node long, coordinator int, itinerant int,"
        " gatekeeper int, representative int, liaison int,"
        " total_open_twopaths int",
    )


def biconnectivity_per_graph(
    edges: DataFrame, graph_col: str = GRAPH_COL
) -> DataFrame:
    """Articulation points + bridge incidence per node, per graph
    (kernels.cut_vertices_and_bridges — Tarjan lowlink).  Extends the
    reference's connectivity family (connectivity.rs:22-83) from "is it
    connected" to "where does connectivity hinge".

    Returns DataFrame[graph_id, node, is_cut, bridge_count] — one row per
    vertex; ``bridge_count`` = number of incident bridge edges."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[graph_col].iloc[0]
        adj = K.build_undirected_adj(
            list(zip(pdf["src"].astype("int64"), pdf["dst"].astype("int64")))
        )
        cuts, bridges = K.cut_vertices_and_bridges(adj)
        binc: dict = {}
        for a, b in bridges:
            binc[a] = binc.get(a, 0) + 1
            binc[b] = binc.get(b, 0) + 1
        recs = [
            (gid, n, n in cuts, binc.get(n, 0)) for n in sorted(adj)
        ]
        return pd.DataFrame(
            recs, columns=[graph_col, "node", "is_cut", "bridge_count"]
        )

    return edges.groupBy(graph_col).applyInPandas(
        fn,
        f"{graph_col} long, node long, is_cut boolean, bridge_count int",
    )
