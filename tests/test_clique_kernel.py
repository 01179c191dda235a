"""Beam-search clique miner kernel vs the reference's golden tests:
scoring arithmetic (tests/scoring.rs:24-91), typespec processing
(tests/tests.rs:22-63), pruning (tests/pruning.rs), and e2e planted-clique
mining (tests/tests.rs:115-298)."""

import math

from dachshund_spark.functions import clique_kernel as CK

TYPESPEC = [
    ["author", "published_at", "conference"],
    ["author", "published_at", "journal"],
]


def gen_clique_rows(core_ids, non_core_ids_and_types, edge_types=("published_at",)):
    """cf. test_utils.rs:96-160: all core x non-core x edge-type rows."""
    types = ["conference", "journal"]
    rows = []
    for c in core_ids:
        for nc, t in non_core_ids_and_types:
            for et in edge_types:
                rows.append((c, nc, et, types[t]))
    return rows


def test_process_typespec():
    # cf. tests/tests.rs:22-63 — conference/journal each allow 1 edge type;
    # with two rows to 'conference' (scoring.rs:25-32) it allows 2
    core, ncts, ets, type_ids = CK.process_typespec(TYPESPEC)
    assert core == "author"
    assert ncts == ["conference", "journal"]
    assert type_ids["conference"][1] == 1 and type_ids["journal"][1] == 1

    spec2 = [
        ["author", "published_at", "conference"],
        ["author", "attended", "conference"],
    ]
    _, _, _, tids2 = CK.process_typespec(spec2)
    assert tids2["conference"] == (1, 2)


def test_score_trivial_graph():
    """Exact port of tests/scoring.rs:24-91."""
    spec = [
        ["author", "published_at", "conference"],
        ["author", "attended", "conference"],
    ]
    rows = [(1, 2, "published_at", "conference")]
    g = CK.build_typed_graph(rows, spec, min_degree=1)
    assert len(g.core_ids) == 1 and len(g.non_core_ids) == 1

    sp = CK.SearchProblem(
        beam_size=20, alpha=1.0, global_thresh=0.5, local_thresh=0.5,
        num_to_search=20, num_epochs=100, max_repeated_prior_scores=3,
        min_degree=1,
    )
    scorer = CK.Scorer(2, sp)
    cand = CK.Candidate.from_node(g.core_ids[0], g, scorer)
    assert cand.score == -1.0

    cand.add_node(g.non_core_ids[0])
    assert cand.score is None

    diversity = scorer.diversity_score(cand.node_counts)
    assert abs(diversity - 2 * math.log(2.0)) < 1e-12
    assert cand.local_thresh_score_at_least(0.5)
    assert cand.get_size() == 2  # two possible edge types to the core
    assert cand.ties_between_nodes == 1
    assert cand.get_cliqueness() == 0.5
    assert scorer.get_global_thresh_score(0.5) == 1.0
    score = scorer.score(cand)
    assert abs(score - (diversity + 0.5)) < 1e-12


def test_prune_reduces_graph():
    """cf. tests/pruning.rs:31-78 — low-degree nodes trimmed, cascade."""
    # clique of 3 cores x 3 non-cores + a pendant core attached to 1 non-core
    rows = gen_clique_rows([1, 2, 3], [(10, 0), (11, 0), (12, 1)])
    rows.append((99, 10, "published_at", "conference"))
    g_unpruned = CK.build_typed_graph(rows, TYPESPEC, min_degree=1)
    assert len(g_unpruned.core_ids) == 4
    g = CK.build_typed_graph(rows, TYPESPEC, min_degree=2)
    assert len(g.core_ids) == 3
    assert len(g.non_core_ids) == 3


def test_beam_finds_planted_clique():
    """cf. tests/tests.rs:115-298 — the search must recover a planted
    complete biclique."""
    rows = gen_clique_rows(
        list(range(1, 11)), [(100 + i, i % 2) for i in range(10)]
    )
    g = CK.build_typed_graph(rows, TYPESPEC, min_degree=1)
    sp = CK.SearchProblem(
        beam_size=20, alpha=1.0, global_thresh=1.0, local_thresh=1.0,
        num_to_search=20, num_epochs=100, max_repeated_prior_scores=3,
        min_degree=1,
    )
    beam = CK.Beam(g, sp, graph_key=0, num_non_core_types=2)
    top, steps = beam.run_search()
    assert steps > 0
    assert top.score > 0
    assert top.is_clique()
    rev = g.reverse_labels_map
    cores = {rev[i][1] for i in top.core_ids}
    non_cores = {rev[i][1] for i in top.non_core_ids}
    assert cores == set(range(1, 11))
    assert non_cores == {100 + i for i in range(10)}


def test_beam_deterministic():
    rows = gen_clique_rows(
        list(range(1, 8)), [(100 + i, i % 2) for i in range(6)]
    )
    # noise edges
    rows += [(50, 300, "published_at", "journal"), (51, 300, "published_at", "journal")]
    g = CK.build_typed_graph(rows, TYPESPEC, min_degree=1)
    sp = CK.SearchProblem(num_epochs=30)

    def run():
        beam = CK.Beam(g, sp, graph_key="g1", num_non_core_types=2)
        top, _ = beam.run_search()
        return (top.checksum, top.score, frozenset(top.core_ids))

    assert run() == run()


def test_seeded_warm_start():
    """cf. beam.rs:108-113 + tests/beam.rs — seed rows initialize the first
    candidate."""
    rows = gen_clique_rows(
        list(range(1, 6)), [(100 + i, 0) for i in range(4)]
    )
    g = CK.build_typed_graph(rows, TYPESPEC, min_degree=1)
    sp = CK.SearchProblem(num_epochs=0, beam_size=3)
    seeds = [("c", 1), ("c", 2), ("n", 100)]
    beam = CK.Beam(g, sp, graph_key=0, seed_labels=seeds, num_non_core_types=2)
    first = beam.candidates[0]
    rev = g.reverse_labels_map
    assert {rev[i][1] for i in first.core_ids} == {1, 2}
    assert {rev[i][1] for i in first.non_core_ids} == {100}


def test_pruning_cuts_search_steps():
    """cf. tests/pruning.rs:80-195 — pruned graph needs <= steps and finds
    the same planted clique."""
    rows = gen_clique_rows(list(range(1, 9)), [(100 + i, 0) for i in range(8)])
    # tendrils of degree-1 cores
    rows += [(200 + i, 100 + (i % 8), "published_at", "conference") for i in range(20)]
    sp = CK.SearchProblem(num_epochs=100)

    g_full = CK.build_typed_graph(rows, TYPESPEC, min_degree=1)
    top_full, steps_full = CK.Beam(g_full, sp, 0, num_non_core_types=2).run_search()
    g_pruned = CK.build_typed_graph(rows, TYPESPEC, min_degree=3)
    top_pruned, steps_pruned = CK.Beam(g_pruned, sp, 0, num_non_core_types=2).run_search()
    rev_f, rev_p = g_full.reverse_labels_map, g_pruned.reverse_labels_map
    assert {rev_f[i][1] for i in top_full.core_ids} == {
        rev_p[i][1] for i in top_pruned.core_ids
    }
    assert steps_pruned <= steps_full
