"""Interleaved A/B: lazy vs eager per-depth cuts in
betweenness_superstep / harmonic_centrality.

The old shape paid two driver jobs per depth: the eager localCheckpoint
of the new level/delta, then the action that consumes it (frontier
count / accumulator cut).  Leaving the cut lazy lets that single action
materialize it in the same job (the SCC trim-loop fold pattern).
Results asserted identical per pair.

Usage: python tools/ab_lazy_cuts.py [n_pairs] [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from dachshund_spark.session import get_spark  # noqa: E402


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab_lazy_cuts",
        shuffle_partitions=32,
        extra={"spark.driver.memory": "20g"},
    )
    import __spark_entry__ as E  # noqa: E402
    from dachshund_spark.operators import centrality as C  # noqa: E402

    edges = E.copurchase_edges(spark, sf_dir).persist()
    edges.count()

    def run(eager, op):
        C._EAGER_STEP_CUTS = eager
        t0 = time.time()
        if op == "bet":
            out = C.betweenness_superstep(edges, max_sources=100, seed=0)
            rows = sorted(
                (r.v, round(r.betweenness, 6)) for r in out.collect()
            )
        else:
            out = C.harmonic_centrality(edges, max_sources=100, seed=0)
            rows = sorted((r.v, r.harmonic) for r in out.collect())
        return round(time.time() - t0, 1), rows

    for op in ("bet", "harm"):
        wu = run(False, op)
        print(f"[{op}] warmup lazy: {wu[0]}s", flush=True)
        wins = 0
        for p in range(n_pairs):
            if p % 2 == 0:
                t_new, r_new = run(False, op)
                t_old, r_old = run(True, op)
            else:
                t_old, r_old = run(True, op)
                t_new, r_new = run(False, op)
            assert r_new == r_old, "results differ between variants!"
            wins += t_new < t_old
            print(
                f"[{op}] pair {p + 1}: lazy {t_new}s vs eager {t_old}s "
                f"-> {'LAZY' if t_new < t_old else 'EAGER'} "
                "(results identical)",
                flush=True,
            )
        print(f"[{op}] lazy wins {wins}/{n_pairs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
