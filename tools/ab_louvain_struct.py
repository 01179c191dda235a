"""Interleaved two-tree A/B for the louvain_moves restructure
(deg-in-state + no candidate dedupe aggregate).

Old tree = a git worktree of the pre-change commit, new tree = this
repo; each pair runs both variants in fresh subprocesses over the same
sf0.1 copurchase graph, alternating order, and asserts the full
(v, community) output is identical (integer decisions — must be exact).

Usage: python tools/ab_louvain_struct.py <old_tree> [n_pairs]
"""
import json
import statistics
import subprocess
import sys
import os

NEW_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import hashlib, json, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from dachshund_spark.session import get_spark
spark = get_spark(app_name="ab_louvain", master="local[32]",
                  shuffle_partitions=32,
                  extra={"spark.ui.enabled": "false",
                         "spark.driver.memory": "20g"})
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
sys.path.remove("/root/repo")
cp = E.copurchase_edges(spark, "/root/testdata/sf0.1").persist()
cp.count()
from dachshund_spark.operators.louvain import louvain_moves
t0 = time.time()
out = sorted((r.v, r.community)
             for r in louvain_moves(cp, max_rounds=6).collect())
sec = round(time.time() - t0, 2)
digest = hashlib.md5(json.dumps(out).encode()).hexdigest()
print("ABSEC", json.dumps({"sec": sec, "md5": digest}))
spark.stop()
'''


def run(tree):
    p = subprocess.run([sys.executable, "-c", CHILD, tree],
                       capture_output=True, text=True, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("ABSEC"):
            return json.loads(line[6:])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main():
    old_tree = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print(f"warmup new: {run(NEW_TREE)}", flush=True)
    news, olds, wins = [], [], 0
    for p in range(n_pairs):
        order = (
            [(NEW_TREE, "new"), (old_tree, "old")]
            if p % 2 == 0
            else [(old_tree, "old"), (NEW_TREE, "new")]
        )
        res = {}
        for tree, tag in order:
            res[tag] = run(tree)
        assert res["new"]["md5"] == res["old"]["md5"], res
        news.append(res["new"]["sec"])
        olds.append(res["old"]["sec"])
        wins += res["new"]["sec"] < res["old"]["sec"]
        print(
            f"pair {p + 1}: new {res['new']['sec']}s vs old "
            f"{res['old']['sec']}s -> "
            f"{'NEW' if res['new']['sec'] < res['old']['sec'] else 'OLD'} "
            "(outputs md5-identical)",
            flush=True,
        )
    print(
        f"new wins {wins}/{n_pairs}; medians new "
        f"{statistics.median(news)} vs old {statistics.median(olds)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
