"""End-to-end parity on the reference's own shipped fixtures
(/root/reference/example.txt and weighted_example.txt — the README demo,
README.md:27-50): the full typed-TSV pipeline must reproduce the
reference's documented clique and the weighted kernel's golden shells.

Note: the README's sample output line shows non-core ids [3,4], which is
stale against its own example.txt (articles 4 has only one author edge;
the complete 2x2 biclique in the data is authors [1,2] x articles [3,5]
with all densities 1.0 — exactly the structure the README describes).
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

EXAMPLE = "/root/reference/example.txt"
WEIGHTED_EXAMPLE = "/root/reference/weighted_example.txt"


def test_example_txt_clique_miner_e2e(spark):
    import json

    from dachshund_spark.functions.clique_kernel import SearchProblem
    from dachshund_spark.operators.clique_miner import mine_cliques
    from dachshund_spark.sources.tsv import intern_graph_keys, read_typed_edges

    edges, seeds = read_typed_edges(spark, EXAMPLE)
    assert seeds.count() == 0
    edges_i, dim = intern_graph_keys(edges)
    assert dim.count() == 1
    typed = edges_i.select(
        "graph_id",
        "core_id",
        F.col("non_core_id").cast("long").alias("non_core_id"),
        "edge_type",
        "non_core_type",
    )
    sp = SearchProblem(
        beam_size=20, alpha=0.1, global_thresh=1.0, local_thresh=1.0,
        num_to_search=10, num_epochs=200, max_repeated_prior_scores=3,
        min_degree=1,
    )
    out = mine_cliques(
        typed, [["author", "published", "article"]], sp
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["num_core"] == 2 and r["num_non_core"] == 2
    assert json.loads(r["core_ids"]) == [1, 2]
    assert json.loads(r["non_core_ids"]) == [3, 5]
    assert json.loads(r["non_core_types"]) == ["article", "article"]
    assert r["cliqueness"] == pytest.approx(1.0)
    assert json.loads(r["core_densities"]) == [1.0, 1.0]
    assert json.loads(r["non_core_densities"]) == [1.0]


def test_example_txt_clique_miner_long_format_e2e(spark):
    # --long_format (transformer.rs:291-307): one row per clique node,
    # sorted cores (type = core type) then sorted non-cores (their type)
    from dachshund_spark.functions.clique_kernel import SearchProblem
    from dachshund_spark.operators.clique_miner import mine_cliques
    from dachshund_spark.sources.tsv import intern_graph_keys, read_typed_edges

    edges, _ = read_typed_edges(spark, EXAMPLE)
    edges_i, _ = intern_graph_keys(edges)
    typed = edges_i.select(
        "graph_id",
        "core_id",
        F.col("non_core_id").cast("long").alias("non_core_id"),
        "edge_type",
        "non_core_type",
    )
    sp = SearchProblem(
        beam_size=20, alpha=0.1, global_thresh=1.0, local_thresh=1.0,
        num_to_search=10, num_epochs=200, max_repeated_prior_scores=3,
        min_degree=1,
    )
    out = mine_cliques(
        typed, [["author", "published", "article"]], sp, long_format=True
    )
    rows = sorted(
        (r["node_id"], r["node_type"])
        for r in out.collect()
    )
    assert rows == [
        (1, "author"), (2, "author"), (3, "article"), (5, "article"),
    ]


def test_weighted_example_txt_core_miner_e2e(spark):
    from dachshund_spark.functions import kernels as K
    from dachshund_spark.operators.pergraph import weighted_core_miner
    from dachshund_spark.sources.tsv import intern_graph_keys, read_weighted_edges

    edges = read_weighted_edges(spark, WEIGHTED_EXAMPLE)
    edges_i, _ = intern_graph_keys(edges)
    got = {
        r["node"]: (r["frac_coreness"], r["degree"])
        for r in weighted_core_miner(
            edges_i.select("graph_id", "src", "dst", "weight")
        ).collect()
    }
    rows = [
        (int(p[1]), int(p[2]), float(p[3]))
        for p in (l.rstrip("\n").split("\t") for l in open(WEIGHTED_EXAMPLE))
    ]
    wadj = K.build_weighted_adj(rows)
    want = K.fractional_coreness(wadj)
    assert set(got) == set(want)
    for n, c in want.items():
        assert got[n][0] == pytest.approx(c)
        assert got[n][1] == len(wadj[n])
    # structural pin: both weight-3 triangles out-shell the weight-1 hubs
    assert got[1][0] > got[0][0] and got[5][0] > got[4][0]
