"""clique_miner as a per-graph Spark operator: typed-edge DataFrame ->
best quasi-biclique per graph_id (wide format), via the beam-search kernel
inside applyInPandas.

Input columns (cf. sources.tsv.read_typed_edges / FIXTURES.md §1.4):
  graph_id, core_id, non_core_id, edge_type, non_core_type
Output mirrors the reference's wide row (candidate.rs:298-338,
README.md:41-50): graph_id, num_core, num_non_core, core_ids json,
non_core_ids json, non_core_types json, cliqueness, core_densities json,
non_core_densities json — emitted only when score > 0
(transformer.rs:290-308).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame

from ..functions import clique_kernel as CK

WIDE_SCHEMA = (
    "graph_id long, num_core int, num_non_core int, core_ids string,"
    " non_core_ids string, non_core_types string, cliqueness double,"
    " core_densities string, non_core_densities string"
)
LONG_SCHEMA = "graph_id long, node_id long, node_type string"


def mine_cliques(
    typed_edges: DataFrame,
    typespec: list[list[str]],
    search_problem: CK.SearchProblem | None = None,
    graph_col: str = "graph_id",
    long_format: bool = False,
) -> DataFrame:
    """``long_format=False`` (default): the reference's wide row per graph.
    ``long_format=True``: one row per clique node — sorted core labels
    (node_type = the core type) then sorted non-core labels (node_type =
    the node's non-core type name), mirroring
    transformer.rs:291-307 / candidate.rs:341-397 (``--long_format``)."""
    sp = search_problem or CK.SearchProblem()
    core_type, non_core_types, _, _ = CK.process_typespec(typespec)
    n_types = len(non_core_types)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[graph_col].iloc[0])
        # canonical row order: the beam search breaks score ties by
        # insertion-order-dependent structures, so the arriving shuffle
        # order must not leak into the result
        rows = sorted(
            (int(c), int(nc), str(et), str(nct))
            for c, nc, et, nct in zip(
                pdf["core_id"], pdf["non_core_id"],
                pdf["edge_type"], pdf["non_core_type"],
            )
        )
        empty = pd.DataFrame(
            columns=(
                [graph_col, "node_id", "node_type"]
                if long_format
                else [
                    graph_col, "num_core", "num_non_core", "core_ids",
                    "non_core_ids", "non_core_types", "cliqueness",
                    "core_densities", "non_core_densities",
                ]
            )
        )
        g = CK.build_typed_graph(rows, typespec, min_degree=sp.min_degree)
        if not g.core_ids or not g.non_core_ids:
            return empty  # cf. transformer.rs:279-286 (empty-side early exit)
        beam = CK.Beam(g, sp, graph_key=gid, num_non_core_types=n_types)
        top, _steps = beam.run_search()
        if top.score is None or top.score <= 0:
            return empty
        rev = g.reverse_labels_map
        core_labels = sorted(rev[i][1] for i in top.core_ids)
        non_core_labels = sorted(rev[i][1] for i in top.non_core_ids)
        nct_names = [
            non_core_types[g.nodes[i].non_core_type - 1]
            for i in sorted(top.non_core_ids)
        ]
        if long_format:
            by_label = {
                rev[i][1]: non_core_types[g.nodes[i].non_core_type - 1]
                for i in top.non_core_ids
            }
            return pd.DataFrame(
                [
                    {graph_col: gid, "node_id": c, "node_type": core_type}
                    for c in core_labels
                ]
                + [
                    {graph_col: gid, "node_id": nc, "node_type": by_label[nc]}
                    for nc in non_core_labels
                ]
            )
        return pd.DataFrame(
            [
                {
                    graph_col: gid,
                    "num_core": len(core_labels),
                    "num_non_core": len(non_core_labels),
                    "core_ids": json.dumps(core_labels),
                    "non_core_ids": json.dumps(non_core_labels),
                    "non_core_types": json.dumps(nct_names),
                    "cliqueness": top.get_cliqueness(),
                    "core_densities": json.dumps(top.get_core_densities()),
                    "non_core_densities": json.dumps(
                        top.get_non_core_densities(n_types)
                    ),
                }
            ]
        )

    return typed_edges.groupBy(graph_col).applyInPandas(
        fn, LONG_SCHEMA if long_format else WIDE_SCHEMA
    )
