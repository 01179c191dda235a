"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline workload =
  * the north-star pipeline: synthetic Common-Crawl-style pages ->
    Arrow-UDF extraction -> (src,dst) edge table -> PageRank supersteps
    (primary metric: edges/sec/core per superstep), connected components,
    label propagation;
  * co-purchase graph analytics at the SF dir (triangles/transitivity);
  * representative SQL aggregations.

Scaling-efficiency evidence (N vs 4N) is produced by
``python bench.py --scaling [small big [runs]] [--executors]``: the
PageRank job re-runs in fresh processes at two parallelism sizes on
identical input, INTERLEAVED so each small/big pair shares noise
conditions (default local[2] vs local[8] threads; --executors switches
to local-cluster executor JVMs), and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _pages_count(sf: float) -> int:
    return max(2000, int(2_000_000 * sf))


def run_bench(
    sf_dir: str,
    cpus: int,
    pagerank_iters: int = 10,
    n_pages_override: int | None = None,
    shuffle_partitions: int | None = None,
    pagerank_block: int = 1,
    scaling_only: bool = False,
    master: str | None = None,
    n_executors: int | None = None,
) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.builders import symmetrized
    from dachshund_spark.operators.components import connected_components
    from dachshund_spark.operators.label_propagation import label_propagation
    from dachshund_spark.operators.pagerank import pagerank
    from dachshund_spark.operators.triangles import global_stats
    from dachshund_spark.session import get_spark
    from dachshund_spark.sources.pages import edges_from_extracted, synthesize_pages

    sf = _sf_from_dir(sf_dir)
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "20g"}
    # shuffle to tmpfs when available: local-mode shuffle file IO otherwise
    # bottlenecks multi-core scaling long before the CPUs saturate
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="dachshund_bench",
        master=master or f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or max(cpus, 8),
        extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}
    extras: dict = {}

    # --- north-star pipeline: pages -> extraction -> edges ---
    t0 = time.time()
    n_pages = n_pages_override or _pages_count(sf)
    pages = synthesize_pages(spark, n_pages, n_sites=997, n_hubs=64, seed=42)
    edges = edges_from_extracted(extract(pages)).persist()
    n_edges = edges.count()
    queries["extract_and_materialize_edges"] = round(time.time() - t0, 3)
    extras["n_pages"] = n_pages
    extras["n_edges"] = n_edges

    t0 = time.time()
    pr, res = pagerank(
        edges, tol=0.0, max_iter=pagerank_iters, impl="sql",
        include_metrics=True, block_size=pagerank_block,
    )
    pr_rows = pr.count()
    queries[f"pagerank_{pagerank_iters}iter"] = round(time.time() - t0, 3)
    # each metrics row covers one block of `pagerank_block` supersteps;
    # steady-state stats drop the first two blocks (JIT + cache warm-up)
    block_secs = [m.seconds for m in res.metrics]
    n_supersteps = len(block_secs) * pagerank_block
    per_superstep = sum(block_secs) / n_supersteps
    steady = block_secs[2:] if len(block_secs) > 3 else block_secs
    per_superstep_steady = sum(steady) / (len(steady) * pagerank_block)
    extras["pagerank"] = {
        "vertices": pr_rows,
        "supersteps": n_supersteps,
        "block_size": pagerank_block,
        "sec_per_superstep": round(per_superstep, 4),
        "sec_per_superstep_steady": round(per_superstep_steady, 4),
        "edges_per_sec_per_superstep": round(n_edges / per_superstep_steady, 1),
        "edges_per_sec_per_core_per_superstep": round(
            n_edges / per_superstep_steady / cpus, 1
        ),
        "block_secs": block_secs,
        "cores": cpus,
    }
    if n_executors:
        extras["pagerank"]["n_executors"] = n_executors
        extras["pagerank"]["edges_per_sec_per_executor_per_superstep"] = round(
            n_edges / per_superstep_steady / n_executors, 1
        )
    if scaling_only:
        total = round(sum(queries.values()), 3)
        out = {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            **extras,
        }
        spark.stop()
        return out

    t0 = time.time()
    pr_csr, _ = pagerank(
        edges, tol=0.0, max_iter=pagerank_iters, impl="csr", include_metrics=True
    )
    pr_csr.count()
    queries[f"pagerank_csr_{pagerank_iters}iter"] = round(time.time() - t0, 3)

    t0 = time.time()
    cc = connected_components(edges, max_iter=50)
    n_comp = cc.select("component").distinct().count()
    queries["connected_components"] = round(time.time() - t0, 3)
    extras["n_components"] = n_comp

    t0 = time.time()
    lp = label_propagation(edges, max_iter=5)
    lp.count()
    queries["label_propagation_5iter"] = round(time.time() - t0, 3)

    # --- HITS on the same page digraph: the two-vector link-analysis
    # sibling of pagerank (2 shuffles + 2 cut jobs per iteration; see
    # operators/hits.py for the ReuseExchange normalizer note)
    from dachshund_spark.operators.hits import hits

    t0 = time.time()
    hits(edges, max_iter=8).count()
    queries["hits_8iter"] = round(time.time() - t0, 3)
    edges.unpersist()

    # --- co-purchase analytics at the SF dir ---
    t0 = time.time()
    cp = entrymod.copurchase_edges(spark, sf_dir).persist()
    stats = global_stats(cp)
    queries["copurchase_triangle_stats"] = round(time.time() - t0, 3)
    extras["copurchase"] = {
        "edges": stats["edges"],
        "triangles": stats["triangles"],
        "transitivity": round(stats["transitivity"], 6),
    }

    # --- iterative peel/propagation family at the SF dir: the scale
    # proof that the anti-join peel loops + stats-reset lineage cuts hold
    # a decade above the correctness gate (sf0.01), not just at it ---
    from dachshund_spark.operators.components import (
        connected_components_two_phase,
        strongly_connected_components,
    )
    from dachshund_spark.operators.coreness import coreness, k_truss_edges

    t0 = time.time()
    cor = coreness(cp)
    extras["max_coreness"] = cor.agg(F.max("coreness")).collect()[0][0]
    queries["coreness_full_graph"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_truss = k_truss_edges(cp, 10).count()
    queries["k_truss_k10"] = round(time.time() - t0, 3)
    extras["k_truss_k10_edges"] = n_truss

    # --- betweenness: both physical paths on the SAME 100 md5-sampled
    # sources (seed=0), so the giant-graph superstep fallback has a
    # tracked perf identity next to the task-parallel default it backs up
    from dachshund_spark.operators.centrality import (
        betweenness,
        betweenness_superstep,
    )

    t0 = time.time()
    betweenness(cp, max_sources=100, seed=0).count()
    queries["betweenness_taskpar_100src"] = round(time.time() - t0, 3)

    t0 = time.time()
    betweenness_superstep(cp, max_sources=100, seed=0).count()
    queries["betweenness_superstep_100src"] = round(time.time() - t0, 3)

    # --- ANF sketches: the approximate-distinct-within-t superstep whose
    # bit_or aggregate OR-combines map-side (the hub-skew-proof plan;
    # see operators/anf.py and BENCH/PLANS.md round 6)
    from dachshund_spark.operators.anf import anf_sketches

    t0 = time.time()
    anf_sketches(cp, rounds=3, k=8).count()
    queries["anf_sketch_t3_k8"] = round(time.time() - t0, 3)

    # --- HyperBall harmonic: the designated per-vertex closeness scale
    # path (all vertices in `rounds` supersteps; the exact sampled-BFS
    # path is gate-only because its cost scales with |sources|)
    from dachshund_spark.operators.anf import anf_harmonic_centrality

    t0 = time.time()
    anf_harmonic_centrality(cp, rounds=3, k=8).count()
    queries["anf_harmonic_t3_k8"] = round(time.time() - t0, 3)

    # --- Louvain phase-1: the community-detection superstep (2 data
    # shuffles/round, md5-parity move gate halves the big one; exact
    # integer gain keys — see operators/louvain.py)
    from dachshund_spark.operators.louvain import louvain_moves

    t0 = time.time()
    n_comm = (
        louvain_moves(cp, max_rounds=6).select("community").distinct().count()
    )
    queries["louvain_moves_6rounds"] = round(time.time() - t0, 3)
    extras["louvain_communities"] = n_comm
    cp.unpersist()

    t0 = time.time()
    scc = strongly_connected_components(
        entrymod.event_cyc_edges(spark, sf_dir), max_outer=60
    )
    scc.count()
    queries["scc_event_digraph"] = round(time.time() - t0, 3)

    t0 = time.time()
    cc2 = connected_components_two_phase(
        entrymod.event_chain_edges(spark, sf_dir)
    )
    cc2.count()
    queries["cc_twophase_event_chains"] = round(time.time() - t0, 3)

    # --- SQL aggregations + LLM-pipeline dedup ---
    # doc_minhash_lsh_pairs tracks the banded-LSH self-join dedup path
    # (shingle explode -> minhash agg -> band bucket join -> jaccard
    # verify) so the training-data-pipeline family has a headline perf
    # number alongside the graph/SQL ones
    for name in (
        "tpch_q1_pricing_summary", "events_user_activity",
        "doc_quality_scores", "doc_minhash_lsh_pairs",
    ):
        t0 = time.time()
        entrymod.queries()[name](spark, sf_dir).count()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        **extras,
    }
    spark.stop()
    return out


def _scaling_child(
    sf_dir: str,
    n: int,
    mode: str = "threads",
    cores_per_exec: int = 2,
    mem_mb: int = 12288,
    shuffle_partitions: int = 64,
) -> dict:
    """Run the PageRank pipeline alone in a fresh driver process at one
    parallelism size.  Two cluster shapes:

    * ``mode="threads"``: ``local[n]`` — n executor threads in one JVM
      (the task-instruction proxy, "N and 4N cores").
    * ``mode="executors"``: ``local-cluster[n, cores_per_exec, mem_mb]``
      — n separate executor JVMs with identical per-executor resources
      (the north rule's literal N vs 4N executors; measured ~15-25%
      slower per superstep here from inter-JVM shuffle fetches, see
      BENCH/PLANS.md).

    ~20M edges is the sweet spot on this host: big enough that the
    driver-side serial floor stays small, small enough that the cached
    edge table + shuffle files stay memory-resident (a 40M-edge variant
    measured WORSE big-side throughput from heap churn)."""
    if mode == "threads":
        cpus = n
        master = f"local[{n}]"
        n_exec = None
        exec_mem = None
    else:
        cpus = n * cores_per_exec
        master = f"local-cluster[{n},{cores_per_exec},{mem_mb}]"
        n_exec = n
        # the worker's mem_mb only CAPS allocation; executor JVM heap must
        # be set explicitly or it defaults to 1g and dies with exit 52 (OOM)
        exec_mem = f"spark.executor.memory={max(mem_mb - 2048, 2048)}m"
    code = (
        "import json, bench; "
        f"r = bench.run_bench({sf_dir!r}, {cpus}, pagerank_iters=30, "
        f"n_pages_override=4000000, shuffle_partitions={shuffle_partitions}, pagerank_block=5, "
        f"scaling_only=True, master={master!r}, n_executors={n_exec}); "
        "print('SCALING_JSON ' + json.dumps(r))"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_HOME", "/opt/spark")
    if exec_mem:
        prior = env.get("SPARK_GRAFT_CONF", "")
        env["SPARK_GRAFT_CONF"] = (prior + ";" if prior else "") + exec_mem
    if os.path.isdir("/dev/shm"):
        # executor JVMs read SPARK_LOCAL_DIRS from their (inherited) env;
        # spark.local.dir is overridden by the cluster manager in
        # local-cluster mode
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = shm
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_JSON "):
            return json.loads(line[len("SCALING_JSON "):])
    raise RuntimeError(
        f"scaling child (n={n}, mode={mode}) produced no result:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def _cpu_ceiling(small: int, big: int) -> float:
    """Measured hardware parallel-scaling ceiling: aggregate pure-python
    CPU throughput at `big` procs over `small` procs.  On shared/cloud
    hosts this is < big/small even for embarrassingly parallel work, and
    bounds any job's achievable scaling."""
    import multiprocessing as mp

    def agg(procs: int) -> float:
        with mp.get_context("spawn").Pool(procs) as pool:
            return sum(pool.map(_burn, [1.5] * procs))

    return agg(big) / agg(small)


def _burn(seconds: float) -> int:
    import time as _t

    t0 = _t.time()
    x = 0
    while _t.time() - t0 < seconds:
        x += 1
    return x


def _stream(seconds: float) -> float:
    """Memory-BANDWIDTH burn: traverse a 512 MB numpy array repeatedly and
    return bytes touched.  A shuffle-heavy Spark job is closer to this
    profile than to pure-CPU burn — on multi-tenant hosts the bandwidth
    ceiling saturates at lower process counts than the CPU ceiling."""
    import time as _t

    import numpy as np

    arr = np.ones(64_000_000, dtype=np.float64)  # 512 MB
    arr.sum()  # warm pass: allocation + first-touch faults OUTSIDE the timer
    t0 = _t.time()
    touched = 0.0
    while _t.time() - t0 < seconds:
        touched += float(arr.sum() and arr.nbytes)
    return touched


def _membw_ceiling(small: int, big: int) -> float:
    """Aggregate memory-bandwidth scaling from `small` to `big` processes —
    the fair physical bound for shuffle-heavy jobs (cf. _cpu_ceiling for
    compute-bound work)."""
    import multiprocessing as mp

    def agg(procs: int) -> float:
        with mp.get_context("spawn").Pool(procs) as pool:
            return sum(pool.map(_stream, [2.0] * procs))

    return agg(big) / agg(small)


def run_scaling(
    sf_dir: str,
    small: int = 2,
    big: int = 8,
    runs: int = 3,
    mode: str = "threads",
    partitions: int = 256,
    partition_ab: tuple[int, ...] = (64, 512),
) -> str:
    """north_rule scaling evidence: the same job on the same input at
    ``small`` vs ``big`` parallelism (``mode="threads"``: local[N] cores;
    ``mode="executors"``: local-cluster executor JVMs).

    Methodology: runs are INTERLEAVED (small, big, small, big, ...) and
    efficiency is computed per adjacent pair, so both sizes of a pair see
    the same noisy-neighbor conditions; the sandbox host's background
    load varies several-fold over minutes, which makes
    best-of-N-per-size-independently systematically misleading (a lucky
    quiet small run deflates, a lucky quiet big run inflates).  The
    best-pair efficiency is reported next to every pair and next to the
    measured pure-CPU hardware ceiling.

    ``partitions``: shuffle partitions for the headline pairs.  256 (≥32
    task waves on the big side) is the headline protocol as of round 5:
    the round-3/4 default of 64 leaves only 8 waves per stage on the big
    side, so one straggler task extends the stage barrier by 1/8 of the
    stage — the measured dominant recoverable loss; at 256 the same
    straggler costs 1/32 (r04: median 0.773 at 256 vs 0.659 at 64).  The
    old 64-partition setting runs once as the supplementary A/B so the
    barrier-tail effect stays quantified."""
    cores_factor = 1 if mode == "threads" else 2
    ceiling = _cpu_ceiling(small * cores_factor, big * cores_factor)
    ratio = big / small
    def child_with_retry(
        n: int, attempts: int = 2, shuffle_partitions: int | None = None
    ) -> dict:
        if shuffle_partitions is None:
            shuffle_partitions = partitions
        last = None
        for _ in range(attempts):
            try:
                return _scaling_child(
                    sf_dir, n, mode=mode,
                    shuffle_partitions=shuffle_partitions,
                )
            except Exception as ex:  # local-cluster startup is occasionally flaky
                last = ex
        raise last

    pairs = []
    for i in range(runs):
        r_small = child_with_retry(small)
        r_big = child_with_retry(big)
        eps_s = r_small["pagerank"]["edges_per_sec_per_superstep"]
        eps_b = r_big["pagerank"]["edges_per_sec_per_superstep"]
        pairs.append(
            {
                "pair": i + 1,
                "small": r_small,
                "big": r_big,
                "speedup": eps_b / eps_s,
                "efficiency": eps_b / eps_s / ratio,
            }
        )
    # validity guard: a pair whose SMALL side is itself noise-inflated
    # (steady sec/superstep > 1.25x the fastest small run observed) would
    # overstate efficiency — the noise hit the small window and missed the
    # big one.  Such pairs are reported but excluded from the headline.
    min_small = min(
        p["small"]["pagerank"]["sec_per_superstep_steady"] for p in pairs
    )
    for p in pairs:
        p["valid"] = (
            p["small"]["pagerank"]["sec_per_superstep_steady"]
            <= 1.25 * min_small
        )
    valid = [p for p in pairs if p["valid"]] or pairs
    # headline = the MEDIAN-efficiency valid pair, not the max: selecting
    # the best pair is an upward-biased draw from run-to-run noise (the
    # guard only filters noise-inflated SMALL sides; a lucky-quiet BIG
    # side would still inflate a best-of headline).  Best pair stays in
    # the report as supplementary detail.
    ranked = sorted(valid, key=lambda p: p["efficiency"])
    headline = ranked[(len(ranked) - 1) // 2]
    best = max(valid, key=lambda p: p["efficiency"])
    r_small, r_big = headline["small"], headline["big"]
    eps_small = r_small["pagerank"]["edges_per_sec_per_superstep"]
    eps_big = r_big["pagerank"]["edges_per_sec_per_superstep"]
    speedup, efficiency = headline["speedup"], headline["efficiency"]
    rel_efficiency = speedup / ceiling
    pair_rows = [
        f"| {p['pair']} | {p['small']['pagerank']['sec_per_superstep_steady']} | "
        f"{p['big']['pagerank']['sec_per_superstep_steady']} | "
        f"{p['speedup']:.2f}× | {p['efficiency']:.3f} | "
        f"{'yes' if p['valid'] else 'no (small side noise-inflated)'} |"
        for p in pairs
    ]
    lines = [
        "# BENCH/BASELINE.md — measured throughput & scaling",
        "",
        f"Input: deterministic synthetic pages table ({r_small['n_pages']} pages, "
        f"{r_small['n_edges']} edges, power-law hubs), seed=42; sf dir `{sf_dir}`.",
        f"Job: PageRank, {r_small['pagerank']['supersteps']} supersteps in blocks of "
        f"{r_small['pagerank'].get('block_size', 1)}, identical code / input / "
        f"partitioning ({partitions} shuffle partitions) at both sizes;",
        (
            f"cluster shape: local[{small}] vs local[{big}] executor threads "
            "(the task-instruction proxy: N and 4N cores, one host)"
            if mode == "threads"
            else f"cluster shape: local-cluster — {small} vs {big} executor "
            "JVMs, 2 cores + 10 GiB each (the north rule's N vs 4N executors)"
        ) + ";",
        "steady-state sec/superstep (first two blocks excluded); fresh JVMs per run.",
        "",
        f"Headline (median valid pair): **{small}→{big} "
        f"{'cores' if mode == 'threads' else 'executors'} ({ratio:.0f}×): speedup "
        f"{speedup:.2f}×, scaling efficiency {efficiency:.3f}** "
        "(north-rule target ≥ 0.8). "
        f"Best valid pair: {best['speedup']:.2f}× / {best['efficiency']:.3f} "
        "(supplementary — best-of-N is an upward-biased selection).",
        "",
        "| size | sec/superstep | edges/sec/superstep | edges/sec/core |",
        "|---|---|---|---|",
        f"| {small} | {r_small['pagerank']['sec_per_superstep_steady']} | "
        f"{eps_small} | {r_small['pagerank']['edges_per_sec_per_core_per_superstep']} |",
        f"| {big} | {r_big['pagerank']['sec_per_superstep_steady']} | "
        f"{eps_big} | {r_big['pagerank']['edges_per_sec_per_core_per_superstep']} |",
        "",
        "All interleaved pairs (shared noise conditions within a pair):",
        "",
        "| pair | small sec/superstep | big sec/superstep | speedup | efficiency | valid |",
        "|---|---|---|---|---|---|",
        *pair_rows,
        "",
        f"Measured hardware ceiling on this host: pure-CPU embarrassingly-parallel "
        f"python work achieves only **{ceiling:.2f}×** from "
        f"{small * cores_factor} to {big * cores_factor} "
        f"processes (shared/burst host), so {ceiling:.2f}× bounds any job here; "
        f"relative to that ceiling the headline pair achieves **{rel_efficiency:.3f}**. "
        "Run-to-run variance is documented in BENCH/PLANS.md.",
        "",
        "Full headline-pair metrics:",
        "```json",
        json.dumps({"small": r_small, "big": r_big}, indent=2),
        "```",
    ]
    if partition_ab:
        # shuffle-partition probes: one extra interleaved pair each at the
        # OLD 64-partition protocol (the stage-barrier-tail A/B that
        # motivated the 256 headline) and at 512 (does finer task-wave
        # amortization extend past 256, or does per-task fixed overhead
        # take over?)
        probe_rows = [
            f"| {partitions} (headline) | "
            f"{r_small['pagerank']['sec_per_superstep_steady']} | "
            f"{r_big['pagerank']['sec_per_superstep_steady']} | {speedup:.2f}× | "
            f"{efficiency:.3f} |",
        ]
        for np_ in partition_ab:
            r_s2 = child_with_retry(small, shuffle_partitions=np_)
            r_b2 = child_with_retry(big, shuffle_partitions=np_)
            eps_s2 = r_s2["pagerank"]["edges_per_sec_per_superstep"]
            eps_b2 = r_b2["pagerank"]["edges_per_sec_per_superstep"]
            sp2 = eps_b2 / eps_s2
            probe_rows.append(
                f"| {np_} | {r_s2['pagerank']['sec_per_superstep_steady']} | "
                f"{r_b2['pagerank']['sec_per_superstep_steady']} | {sp2:.2f}× | "
                f"{sp2 / ratio:.3f} |"
            )
        lines += [
            "",
            f"## Supplementary: shuffle-partition probes "
            f"({partitions} headline vs {', '.join(map(str, partition_ab))})",
            "",
            "One extra interleaved pair per setting at the same sizes: 64 "
            f"partitions ({64 // big} task waves on the big side, the "
            "round-3/4 protocol) quantifies the stage-barrier straggler "
            f"tail that motivated the {partitions}-partition headline; 512 "
            "probes whether finer waves keep helping past 256 or per-task "
            "fixed overhead takes over:",
            "",
            "| partitions | small sec/superstep | big sec/superstep | speedup | efficiency |",
            "|---|---|---|---|---|",
            *probe_rows,
        ]
    return "\n".join(lines)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        # optional override: --scaling [small_execs big_execs [runs]]
        args = [a for a in sys.argv[sys.argv.index("--scaling") + 1:] if a.isdigit()]
        small = int(args[0]) if len(args) > 0 else 2
        big = int(args[1]) if len(args) > 1 else 8
        runs = int(args[2]) if len(args) > 2 else 3
        mode = "executors" if "--executors" in sys.argv else "threads"
        report = run_scaling(sf_dir, small=small, big=big, runs=runs, mode=mode)
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md"
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            f.write(report + "\n")
        print(f"wrote {out_path}")
        return
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
