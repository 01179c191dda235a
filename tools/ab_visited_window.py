"""Interleaved A/B: BFS anti-join against the full visited union (old)
vs the last-two-levels window (new) in betweenness_superstep /
harmonic_centrality.

By the BFS distance property on an unweighted (symmetrized) graph, a
candidate produced by expanding depth d has distance in {d-1, d, d+1};
already-visited candidates therefore live in levels d or d-1 only, so
anti-joining against those two leaves is result-identical to
anti-joining against every level — asserted per pair below.

One session, one persisted input, alternating pairs with a discarded
warm-up (the repo's noise-adjudication protocol).

Usage: python tools/ab_visited_window.py [n_pairs] [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from dachshund_spark.session import get_spark  # noqa: E402


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab_visited_window",
        shuffle_partitions=32,
        extra={"spark.driver.memory": "20g"},
    )
    import __spark_entry__ as E  # noqa: E402
    from dachshund_spark.operators import centrality as C  # noqa: E402

    edges = E.copurchase_edges(spark, sf_dir).persist()
    edges.count()

    def run(full_window, op):
        C._VISITED_WINDOW_FULL = full_window
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
        print(f"[{op}] warmup window: {wu[0]}s", flush=True)
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
                f"[{op}] pair {p + 1}: window {t_new}s vs full {t_old}s "
                f"-> {'WINDOW' if t_new < t_old else 'FULL'} "
                "(results identical)",
                flush=True,
            )
        print(f"[{op}] window wins {wins}/{n_pairs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
