"""Interleaved two-tree A/B at 3x bench scale for this session's
operator changes (superstep betweenness dedup window + lazy cuts + SHJ
backward pass; Louvain restructure).

Fixture: three id-shifted copies of the sf0.1 copurchase graph
(src + k*10^9, k in 0..2) written once to /dev/shm/r07_inputs/cp_edges_3x
— deterministic, 3x vertices and edges.  Each pair runs old tree (git
worktree of the session-start commit) and HEAD in fresh subprocesses,
alternating order; outputs are md5-asserted identical per pair.

Usage: python tools/ab_session_3x.py <old_tree> <query> [n_pairs]
       query in {bet_superstep, louvain}
"""
import json
import os
import statistics
import subprocess
import sys

NEW_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = "/dev/shm/r07_inputs/cp_edges_3x"

MATERIALIZE = r'''
import sys
sys.path.insert(0, "/root/repo")
from dachshund_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="mk3x", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
cp = E.copurchase_edges(spark, "/root/testdata/sf0.1")
out = None
for k in range(3):
    off = k * 10**9
    leg = cp.select((F.col("src") + off).alias("src"),
                    (F.col("dst") + off).alias("dst"))
    out = leg if out is None else out.union(leg)
out.write.mode("overwrite").parquet(sys.argv[1])
print("rows", spark.read.parquet(sys.argv[1]).count())
spark.stop()
'''

CHILD = r'''
import hashlib, json, sys, time
tree, qname, fix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, tree)
from dachshund_spark.session import get_spark
spark = get_spark(app_name="ab3x_session", master="local[32]",
                  shuffle_partitions=32,
                  extra={"spark.ui.enabled": "false",
                         "spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
cp = spark.read.parquet(fix).persist()
cp.count()
t0 = time.time()
if qname == "bet_superstep":
    from dachshund_spark.operators.centrality import betweenness_superstep
    out = sorted((r.v, round(r.betweenness, 6)) for r in
                 betweenness_superstep(cp, max_sources=100, seed=0).collect())
else:
    from dachshund_spark.operators.louvain import louvain_moves
    out = sorted((r.v, r.community) for r in
                 louvain_moves(cp, max_rounds=6).collect())
sec = round(time.time() - t0, 2)
digest = hashlib.md5(json.dumps(out).encode()).hexdigest()
print("ABSEC", json.dumps({"sec": sec, "md5": digest}))
spark.stop()
'''


def run(tree, q):
    p = subprocess.run([sys.executable, "-c", CHILD, tree, q, FIX],
                       capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("ABSEC"):
            return json.loads(line[6:])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main():
    old_tree = sys.argv[1]
    q = sys.argv[2]
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    if not os.path.exists(FIX):
        print("materializing 3x fixture...", flush=True)
        p = subprocess.run([sys.executable, "-c", MATERIALIZE, FIX],
                           capture_output=True, text=True, timeout=1200)
        print(p.stdout.strip() or p.stderr[-500:], flush=True)
    print(f"[{q}] warmup new: {run(NEW_TREE, q)}", flush=True)
    news, olds, wins = [], [], 0
    for p_i in range(n_pairs):
        order = (
            [(NEW_TREE, "new"), (old_tree, "old")]
            if p_i % 2 == 0
            else [(old_tree, "old"), (NEW_TREE, "new")]
        )
        res = {}
        for tree, tag in order:
            res[tag] = run(tree, q)
        assert res["new"]["md5"] == res["old"]["md5"], res
        news.append(res["new"]["sec"])
        olds.append(res["old"]["sec"])
        wins += res["new"]["sec"] < res["old"]["sec"]
        print(
            f"[{q}] pair {p_i + 1}: new {res['new']['sec']}s vs old "
            f"{res['old']['sec']}s -> "
            f"{'NEW' if res['new']['sec'] < res['old']['sec'] else 'OLD'} "
            "(outputs md5-identical)",
            flush=True,
        )
    print(
        f"[{q}] new wins {wins}/{n_pairs}; medians new "
        f"{statistics.median(news)} vs old {statistics.median(olds)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
