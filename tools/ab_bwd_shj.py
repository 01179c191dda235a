"""Interleaved A/B: betweenness_superstep backward-pass join strategy.

Per backward depth the big ``links`` fan-out (|level d| x degree rows)
joins ``succ`` (|level d+1| rows) on (source, w).  Stat-free cut leaves
push the planner to sort-merge, which sorts the fan-out; a
``shuffle_hash`` hint on the smaller ``succ`` side keeps the exchange
but drops both sorts.  Results asserted identical per pair (to the
gate's 6-decimal rounding).

Usage: python tools/ab_bwd_shj.py [n_pairs] [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from dachshund_spark.session import get_spark  # noqa: E402


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab_bwd_shj",
        shuffle_partitions=32,
        extra={"spark.driver.memory": "20g"},
    )
    import __spark_entry__ as E  # noqa: E402
    from dachshund_spark.operators import centrality as C  # noqa: E402

    edges = E.copurchase_edges(spark, sf_dir).persist()
    edges.count()

    def run(shj):
        C._BWD_SHUFFLE_HASH = shj
        t0 = time.time()
        out = C.betweenness_superstep(edges, max_sources=100, seed=0)
        rows = sorted((r.v, round(r.betweenness, 6)) for r in out.collect())
        return round(time.time() - t0, 1), rows

    wu = run(True)
    print(f"warmup shj: {wu[0]}s", flush=True)
    wins = 0
    for p in range(n_pairs):
        if p % 2 == 0:
            t_new, r_new = run(True)
            t_old, r_old = run(False)
        else:
            t_old, r_old = run(False)
            t_new, r_new = run(True)
        assert r_new == r_old, "results differ between variants!"
        wins += t_new < t_old
        print(
            f"pair {p + 1}: shj {t_new}s vs smj {t_old}s "
            f"-> {'SHJ' if t_new < t_old else 'SMJ'} (results identical)",
            flush=True,
        )
    print(f"shj wins {wins}/{n_pairs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
