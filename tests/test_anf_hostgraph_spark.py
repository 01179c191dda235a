"""ANF sketches (operators/anf.py) and the host-level link-graph rollup
(sources/pages.py host_graph) — distributed vs sequential-oracle parity
plus the semantic properties the sketches must satisfy."""

import pytest

from dachshund_spark.functions import kernels as K

EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (10, 11)]


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src bigint, dst bigint")


def _reachable_within(adj, v, t):
    """Exact distance-<=t ball via BFS (the quantity ANF approximates)."""
    seen = {v}
    frontier = {v}
    for _ in range(t):
        frontier = {u for w in frontier for u in adj[w]} - seen
        seen |= frontier
    return seen


def test_anf_matches_kernel_bit_for_bit(spark):
    from dachshund_spark.operators.anf import anf_sketches

    sk = anf_sketches(_edges_df(spark, EDGES), rounds=2, k=4)
    got = {r["v"]: [r[f"r{i}"] for i in range(4)] for r in sk.collect()}
    want = K.anf_sketches(K.build_undirected_adj(EDGES), 2, 4)
    assert got == want


def test_anf_register_is_or_over_ball(spark):
    # after t rounds each register must equal the OR of the INITIAL
    # registers over the exact distance-<=t ball — the defining property
    # of the OR-merge superstep
    from dachshund_spark.operators.anf import anf_sketches

    adj = K.build_undirected_adj(EDGES)
    for t in (0, 1, 3):
        sk = anf_sketches(_edges_df(spark, EDGES), rounds=t, k=3)
        got = {r["v"]: [r[f"r{i}"] for i in range(3)] for r in sk.collect()}
        for v in adj:
            ball = _reachable_within(adj, v, t)
            want = [0, 0, 0]
            for u in ball:
                for i, reg in enumerate(K.anf_init(u, 3)):
                    want[i] |= reg
            assert got[v] == want, (v, t)


def test_anf_estimates_match_kernel_formula(spark):
    from dachshund_spark.operators.anf import anf_estimates, anf_sketches

    sk = anf_sketches(_edges_df(spark, EDGES), rounds=2, k=4)
    est = {r["v"]: r["nf_est"] for r in anf_estimates(sk, k=4).collect()}
    want = K.anf_sketches(K.build_undirected_adj(EDGES), 2, 4)
    for v, regs in want.items():
        assert est[v] == pytest.approx(K.anf_estimate(regs), rel=1e-12)


def test_anf_estimate_tracks_ball_size():
    # sanity on the estimator itself (not the distributed plumbing): with
    # many registers the FM estimate of an n-element union lands within
    # the standard error band, and grows monotonically with n
    regs64 = {v: K.anf_init(v, 64) for v in range(4096)}

    def est(n):
        acc = [0] * 64
        for v in range(n):
            for i, r in enumerate(regs64[v]):
                acc[i] |= r
        return K.anf_estimate(acc)

    for n in (64, 512, 4096):
        assert 0.5 * n < est(n) < 2.0 * n, (n, est(n))
    assert est(64) < est(512) < est(4096)


def test_host_graph_matches_synthesis_arithmetic(spark):
    # end-to-end: synthesize pages -> REAL pandas-UDF extraction ->
    # host rollup == pure-python replication of the synthesis link
    # arithmetic (a single wrong byte in extraction breaks this)
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.oracles import host_rollup_rows
    from dachshund_spark.sources.pages import host_graph, synthesize_pages

    pages = synthesize_pages(spark, n_pages=200, n_sites=5, n_hubs=4, seed=7)
    got = sorted(
        tuple(r) for r in host_graph(extract(pages)).collect()
    )
    assert got == host_rollup_rows(200, n_sites=5, n_hubs=4, seed=7)


def test_host_graph_counts_pages_once_per_pair(spark):
    # two links from the same page to the same host-pair: links counts
    # both, src_pages counts the page once
    from dachshund_spark.sources.pages import host_graph

    extracted = spark.createDataFrame(
        [
            ("https://a.test/p1", ["https://b.test/x", "https://b.test/y",
                                   "https://a.test/p1"]),
            ("https://b.test/x", ["https://b.test/y"]),
            ("https://b.test/y", []),
            # dangling target outside the crawl must be dropped
            ("https://a.test/p2", ["https://nowhere.test/z"]),
        ],
        "url string, outlinks array<string>",
    )
    got = {
        (r["src_host"], r["dst_host"]): (r["links"], r["src_pages"])
        for r in host_graph(extracted).collect()
    }
    assert got == {
        ("a.test", "b.test"): (2, 1),
        ("a.test", "a.test"): (1, 1),
        ("b.test", "b.test"): (1, 1),
    }


def test_anf_neighborhood_function_matches_kernel(spark):
    from dachshund_spark.operators.anf import anf_neighborhood_function

    nf = anf_neighborhood_function(_edges_df(spark, EDGES), rounds=3, k=4)
    got = {r["t"]: (r["nf_total"], r["frac"]) for r in nf.collect()}
    adj = K.build_undirected_adj(EDGES)
    totals = [
        round(
            sum(
                K.anf_estimate(regs)
                for regs in K.anf_sketches(adj, t, 4).values()
            ),
            3,
        )
        for t in range(4)
    ]
    want = {
        t: (tot, round(tot / totals[-1], 6)) for t, tot in enumerate(totals)
    }
    assert got == want
    # N(t) is monotone non-decreasing and the last frac is exactly 1.0
    ts = sorted(got)
    assert all(got[a][0] <= got[b][0] for a, b in zip(ts, ts[1:]))
    assert got[ts[-1]][1] == 1.0
