"""Interleaved A/B for the BFS visited-window change on a DEEP graph.

The full-visited anti-join re-scans and re-shuffles the whole
accumulated (source, v) state every depth — O(depth^2 x level) total —
while the two-level window is O(depth x level).  The copurchase graph's
~8 BFS depths hide that asymptotic difference under host noise, so this
fixture is a thick layered graph (L layers x W vertices, edges only
between consecutive layers) with diameter ~L, where the quadratic term
dominates.  Results are asserted identical per pair.

Usage: python tools/ab_visited_window_deep.py [n_pairs] [L] [W]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from dachshund_spark.session import get_spark  # noqa: E402


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = get_spark(
        app_name="ab_visited_window_deep",
        shuffle_partitions=32,
        extra={"spark.driver.memory": "20g"},
    )
    from dachshund_spark.operators import centrality as C  # noqa: E402

    # deterministic thick path: vertex id = layer * W + slot; each vertex
    # links to 3 pseudo-random slots in the next layer (md5-free integer
    # mix keeps the build cheap and reproducible)
    rows = []
    for layer in range(L - 1):
        for slot in range(W):
            v = layer * W + slot
            for j in range(3):
                t = (layer + 1) * W + ((slot * 7919 + j * 104729 + layer) % W)
                rows.append((v, t))
    edges = spark.createDataFrame(rows, "src long, dst long").persist()
    edges.count()
    print(f"fixture: {L}x{W} layered graph, {len(rows)} edges", flush=True)

    def run(full_window, op):
        C._VISITED_WINDOW_FULL = full_window
        t0 = time.time()
        if op == "bet":
            out = C.betweenness_superstep(
                edges, max_sources=100, seed=0, max_depth=L + 5
            )
            rows_ = sorted(
                (r.v, round(r.betweenness, 6)) for r in out.collect()
            )
        else:
            out = C.harmonic_centrality(
                edges, max_sources=100, seed=0, max_depth=L + 5
            )
            rows_ = sorted((r.v, r.harmonic) for r in out.collect())
        return round(time.time() - t0, 1), rows_

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
