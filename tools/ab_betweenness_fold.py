"""Interleaved A/B of betweenness_superstep's dependency-fold policy:
per-depth accumulator folds (HEAD default, defer_fold=False) vs one
deferred union-fold after the backward pass (defer_fold=True).

Same session, same persisted sf0.1 copurchase edge table, alternating
order per pair, discarded warm-up — the repo's standard protocol for
classifying <2x moves on this noisy shared host (BENCH/PLANS.md).

The defer variant saves one cut-action + V-row checkpoint per backward
depth; its cost is holding every depth's delta blocks until the final
fold (~|sources|x|V| rows, the same order as the forward levels).  On the
sf0.1 copurchase graph the backward pass is only ~eccentricity deep, so
the expected delta is a few actions' worth — this A/B decides whether
that is measurable above ambient noise.

Usage: python tools/ab_betweenness_fold.py [pairs] [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as E
    from dachshund_spark.operators.centrality import betweenness_superstep
    from dachshund_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "20g"}
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="ab_bet_fold", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = E.copurchase_edges(spark, sf_dir).persist()
    n_edges = edges.count()
    print(f"edges={n_edges} cpus={cpus}", flush=True)

    def run(defer: bool) -> float:
        t0 = time.time()
        betweenness_superstep(
            edges, max_sources=100, seed=0, defer_fold=defer
        ).count()
        return round(time.time() - t0, 3)

    print("warmup (perdepth, discarded):", run(False), flush=True)

    results = {"perdepth": [], "deferred": []}
    for p in range(pairs):
        order = (
            [("perdepth", False), ("deferred", True)]
            if p % 2 == 0
            else [("deferred", True), ("perdepth", False)]
        )
        for name, flag in order:
            sec = run(flag)
            results[name].append(sec)
            print(f"pair {p} {name}: {sec}s", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"n_edges": n_edges, "runs": results, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
