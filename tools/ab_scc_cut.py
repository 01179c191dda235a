"""Interleaved A/B of the SCC inner-loop lineage policy: windowed
deferred-release (cut_lineage every 3rd round, persist in between,
predecessors freed only after the next cut materializes — HEAD) vs the
round-5 cut-EVERY-round policy, adjudicating the scc_event_digraph move
that stayed ~25% above its round-4 number in every post-r5 window
(BENCH/PLANS.md round-6 double-run table).

Both policies share `_bidirectional_min_labels`; only its `cut_every`
default differs, so they swap by rebinding the function inside ONE Spark
session over ONE persisted event digraph — same-window by construction.
Order alternates per pair; a discarded warm-up precedes the pairs.

Usage: python tools/ab_scc_cut.py [sf_dir] [pairs]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as E
    from dachshund_spark.operators import components as C
    from dachshund_spark.session import get_spark

    inner = C._bidirectional_min_labels

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "20g"}
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="ab_scc", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = E.event_cyc_edges(spark, sf_dir).persist()
    n_edges = edges.count()
    print(f"edges={n_edges} cpus={cpus} sf_dir={sf_dir}", flush=True)

    def run(cut_every: int) -> float:
        C._bidirectional_min_labels = functools.partial(
            inner, cut_every=cut_every
        )
        t0 = time.time()
        C.strongly_connected_components(edges, max_outer=60).count()
        sec = round(time.time() - t0, 3)
        # evict anything a run leaked (settled cuts live until GC), then
        # re-warm the shared input OUTSIDE the timed region so every run
        # starts from the same cached-edges state
        spark.catalog.clearCache()
        edges.persist()
        edges.count()
        return sec

    print("warmup (windowed, discarded):", run(3), flush=True)

    results = {"windowed3": [], "everyround": []}
    for p in range(pairs):
        order = (
            [("windowed3", 3), ("everyround", 1)]
            if p % 2 == 0
            else [("everyround", 1), ("windowed3", 3)]
        )
        for name, ce in order:
            sec = run(ce)
            results[name].append(sec)
            print(f"pair {p} {name}: {sec}s", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"n_edges": n_edges, "runs": results, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
