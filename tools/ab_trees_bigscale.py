"""Round-start vs HEAD interleaved A/B at 3x bench scale.

Proves the round-7 optimizations hold a scale decade in the right
direction (the driver may measure at a larger driver-generated sf):
each query runs alternately from the round-start tree (git worktree)
and HEAD in fresh subprocesses over identical 3x inputs
(/dev/shm/r07_inputs/{page_edges_3x,cp_edges_3x}; /tmp/make_big_inputs
recipe recorded in OPTIMIZATION_r07.md), old-first then new-first per
pair so warm-cache order cannot favour either side.

Usage: python tools/ab_trees_bigscale.py [pairs] [query ...]
"""
import json
import os
import statistics
import subprocess
import sys

OLD_TREE = "/tmp/r6tree"
NEW_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import json, os, sys, time
tree, qname = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
from dachshund_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="ab3x", master="local[32]", shuffle_partitions=32,
                  extra={"spark.ui.enabled": "false", "spark.driver.memory": "20g",
                         "spark.local.dir": "/dev/shm/dachshund_spark_local"})
spark.sparkContext.setLogLevel("ERROR")
def rd(n):
    return spark.read.parquet(f"/dev/shm/r07_inputs/{n}")
def q_coreness():
    from dachshund_spark.operators.coreness import coreness
    cp = rd("cp_edges_3x").persist(); cp.count()
    return coreness(cp).agg(F.max("coreness")).collect()[0][0]
def q_louvain():
    from dachshund_spark.operators.louvain import louvain_moves
    cp = rd("cp_edges_3x").persist(); cp.count()
    return louvain_moves(cp, max_rounds=6).select("community").distinct().count()
def q_anf():
    from dachshund_spark.operators.anf import anf_sketches
    cp = rd("cp_edges_3x").persist(); cp.count()
    return anf_sketches(cp, rounds=3, k=8).count()
def q_hits():
    from dachshund_spark.operators.hits import hits
    e = rd("page_edges_3x").persist(); e.count()
    return hits(e, max_iter=8).count()
def q_cc():
    from dachshund_spark.operators.components import connected_components
    e = rd("page_edges_3x").persist(); e.count()
    return connected_components(e, max_iter=50).count()
def q_pagerank():
    from dachshund_spark.operators.pagerank import pagerank
    e = rd("page_edges_3x").persist(); e.count()
    return pagerank(e, tol=0.0, max_iter=10, impl="sql").count()
def q_bet_taskpar():
    from dachshund_spark.operators.centrality import betweenness
    cp = rd("cp_edges_3x").persist(); cp.count()
    return betweenness(cp, max_sources=100, seed=0).count()
def q_bet_superstep():
    from dachshund_spark.operators.centrality import betweenness_superstep
    cp = rd("cp_edges_3x").persist(); cp.count()
    return betweenness_superstep(cp, max_sources=100, seed=0).count()
QS = {"coreness": q_coreness, "louvain": q_louvain, "anf": q_anf,
      "hits": q_hits, "cc": q_cc, "pagerank": q_pagerank,
      "bet_taskpar": q_bet_taskpar, "bet_superstep": q_bet_superstep}
t0 = time.time()
r = QS[qname]()
print("ABSEC", json.dumps({"tree": tree, "q": qname,
                           "sec": round(time.time() - t0, 2), "result": r}))
spark.stop()
'''


def run(tree, q):
    p = subprocess.run([sys.executable, "-c", CHILD, tree, q],
                       capture_output=True, text=True, timeout=2400)
    for line in p.stdout.splitlines():
        if line.startswith("ABSEC"):
            return json.loads(line[6:])
    raise RuntimeError(f"no result for {tree} {q}:\n{p.stderr[-1500:]}")


def main():
    args = sys.argv[1:]
    pairs = int(args[0]) if args and args[0].isdigit() else 2
    qs = args[1:] if args and args[0].isdigit() else args
    qs = qs or ["coreness", "louvain", "anf", "hits", "cc", "pagerank",
                "bet_taskpar", "bet_superstep"]
    report = {}
    for q in qs:
        olds, news = [], []
        for i in range(pairs):
            order = [(OLD_TREE, olds), (NEW_TREE, news)]
            if i % 2 == 1:
                order.reverse()
            for tree, sink in order:
                r = run(tree, q)
                sink.append(r["sec"])
                print(f"{q} pair{i} {'old' if tree == OLD_TREE else 'new'}: "
                      f"{r['sec']}s (result {r['result']})", flush=True)
        report[q] = {
            "old_median": statistics.median(olds), "old": olds,
            "new_median": statistics.median(news), "new": news,
            "speedup": round(statistics.median(olds) / statistics.median(news), 2),
        }
    print("AB3X_REPORT " + json.dumps(report))


if __name__ == "__main__":
    main()
