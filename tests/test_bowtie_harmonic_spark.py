"""Bow-tie decomposition (operators/bowtie.py), harmonic centrality
(operators/centrality.py:harmonic_centrality) and the ANF
effective-diameter readout — distributed vs sequential-kernel parity
plus the semantic invariants each must satisfy."""

import pytest

from dachshund_spark.functions import kernels as K


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src bigint, dst bigint")


# core cycle {10,11,12}; IN {1,2}; OUT {20,21}; tendrils {30,40};
# a separate 2-cycle {50,51} (smaller than the core -> DISCONNECTED)
BOWTIE_EDGES = [
    (10, 11), (11, 12), (12, 10),
    (1, 10), (2, 1),
    (12, 20), (20, 21),
    (2, 30), (40, 20),
    (50, 51), (51, 50),
]

HARMONIC_EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6), (2, 7), (8, 9)]


def test_bowtie_hand_graph_categories(spark):
    from dachshund_spark.operators.bowtie import bowtie_decomposition

    got = {
        r.v: r.category
        for r in bowtie_decomposition(_edges_df(spark, BOWTIE_EDGES)).collect()
    }
    assert got == {
        10: "CORE", 11: "CORE", 12: "CORE",
        1: "IN", 2: "IN",
        20: "OUT", 21: "OUT",
        30: "TENDRIL_TUBE", 40: "TENDRIL_TUBE",
        50: "DISCONNECTED", 51: "DISCONNECTED",
    }
    assert got == K.bowtie(BOWTIE_EDGES)


def test_bowtie_banded_page_digraph_matches_kernel(spark):
    # the gate fixture's shape at toy scale: page digraph banded so the
    # outer quarters are ascending-only DAGs
    from dachshund_spark.operators.bowtie import bowtie_decomposition
    from dachshund_spark.oracles import page_targets

    n = 400

    def band(v):
        return 0 if v < n // 4 else (1 if v < 3 * n // 4 else 2)

    kept = [
        (i, t)
        for i in range(n)
        for t in page_targets(i, n)
        if band(i) <= band(t)
        and ((band(i) == 1 and band(t) == 1) or i < t or band(i) != band(t))
    ]
    want = K.bowtie(kept)
    got = {
        r.v: r.category
        for r in bowtie_decomposition(_edges_df(spark, kept)).collect()
    }
    assert got == want
    # structurally interesting: at least core, in, out all non-empty
    cats = set(want.values())
    assert {"CORE", "IN", "OUT"} <= cats


def test_bowtie_kernel_invariants():
    # IN/OUT partition correctness on the hand graph: every IN vertex
    # reaches the core, no OUT vertex does
    cats = K.bowtie(BOWTIE_EDGES)
    out_adj, _ = K.build_directed_adj(sorted({e for e in BOWTIE_EDGES}))
    core = {v for v, c in cats.items() if c == "CORE"}

    def reaches_core(s):
        seen, frontier = {s}, [s]
        while frontier:
            u = frontier.pop()
            for w in out_adj.get(u, ()):
                if w in core:
                    return True
                if w not in seen:
                    seen.add(w)
                    frontier.append(w)
        return False

    for v, c in cats.items():
        if c == "IN":
            assert reaches_core(v), v
        if c in ("OUT", "TENDRIL_TUBE", "DISCONNECTED"):
            assert not reaches_core(v), v


def test_harmonic_full_sources_matches_kernel(spark):
    from dachshund_spark.operators.centrality import harmonic_centrality
    from dachshund_spark.oracles import spark_round

    adj = K.build_undirected_adj(HARMONIC_EDGES)
    got = {
        r.v: r.harmonic
        for r in harmonic_centrality(
            _edges_df(spark, HARMONIC_EDGES), max_sources=None
        ).collect()
    }
    want = {
        v: spark_round(h, 6)
        for v, h in K.harmonic_centrality(adj, sorted(adj)).items()
    }
    assert got == want
    # hand value: vertex 9's only neighbor is 8 -> H(9) = 1.0 from the
    # full source set (everything else unreachable)
    assert got[9] == 1.0


def test_harmonic_sampled_sources_match_kernel(spark):
    from dachshund_spark.operators.centrality import (
        harmonic_centrality,
        sample_sources_py,
    )
    from dachshund_spark.oracles import spark_round

    adj = K.build_undirected_adj(HARMONIC_EDGES)
    srcs = sample_sources_py(sorted(adj), 4, seed=0)
    got = {
        r.v: r.harmonic
        for r in harmonic_centrality(
            _edges_df(spark, HARMONIC_EDGES), max_sources=4, seed=0
        ).collect()
    }
    want = {
        v: spark_round(h, 6)
        for v, h in K.harmonic_centrality(adj, srcs).items()
    }
    assert got == want


def test_harmonic_path_graph_closed_form(spark):
    # P4 (0-1-2-3), all sources: H(0) = 1 + 1/2 + 1/3; H(1) = 1+1+1/2
    from dachshund_spark.operators.centrality import harmonic_centrality
    from dachshund_spark.oracles import spark_round

    got = {
        r.v: r.harmonic
        for r in harmonic_centrality(
            _edges_df(spark, [(0, 1), (1, 2), (2, 3)]), max_sources=None
        ).collect()
    }
    assert got[0] == got[3] == spark_round(1 + 0.5 + 1 / 3, 6)
    assert got[1] == got[2] == spark_round(1 + 1 + 0.5, 6)


def test_effective_diameter_interpolation():
    from dachshund_spark.operators.anf import effective_diameter_from_totals

    # N = [10, 55, 100]: target 0.9*100 = 90 -> between t=1 and t=2:
    # eff = 1 + (90-55)/(100-55)
    t_hit, eff = effective_diameter_from_totals([10.0, 55.0, 100.0], 0.9)
    assert t_hit == 2
    assert eff == round(1 + 35 / 45, 6)
    # already satisfied at t=0 -> 0.0
    assert effective_diameter_from_totals([95.0, 100.0], 0.9) == (0, 0.0)


def test_anf_effective_diameter_spark_matches_oracle_path(spark):
    from dachshund_spark.operators.anf import (
        anf_effective_diameter,
        effective_diameter_from_totals,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (10, 11)]
    row = anf_effective_diameter(
        _edges_df(spark, edges), q=0.9, rounds=3, k=4
    ).collect()[0]
    adj = K.build_undirected_adj(edges)
    totals = []
    for t in range(4):
        st = K.anf_sketches(adj, t, 4)
        totals.append(
            round(sum(K.anf_estimate(regs) for regs in st.values()), 3)
        )
    t_hit, eff = effective_diameter_from_totals(totals, 0.9)
    assert (row["q"], row["t_hit"], row["eff_diameter"]) == (0.9, t_hit, eff)


def test_anf_harmonic_matches_kernel(spark):
    from dachshund_spark.operators.anf import anf_harmonic_centrality
    from dachshund_spark.oracles import spark_round

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (10, 11)]
    got = {
        r.v: r.harmonic_est
        for r in anf_harmonic_centrality(
            _edges_df(spark, edges), rounds=3, k=4
        ).collect()
    }
    want = {
        v: spark_round(h, 6)
        for v, h in K.anf_harmonic(K.build_undirected_adj(edges), 3, 4).items()
    }
    assert got == want
    # sketch harmonic is 0 for an isolated pair after its ball saturates
    # at distance 1 only when the t=1 delta is 0 too — here 10<->11 has
    # exactly one neighbor each, so H >= 0 and the t>=2 deltas vanish
    h10 = K.anf_harmonic(K.build_undirected_adj(edges), 3, 4)[10]
    h1 = K.anf_harmonic(K.build_undirected_adj(edges), 1, 4)[10]
    assert h10 == h1  # no growth past t=1 for the isolated pair
