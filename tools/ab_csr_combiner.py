"""Interleaved A/B of the CSR combiner's cross-batch merge (commit
28572e1 concat+groupby vs its parent's dict loop), adjudicating the
+78% pagerank_csr_10iter move in the round-5 driver bench window.

Both variants are pure-Python batch combiners behind the same
mapInPandas call, so they can be swapped by rebinding the module
global inside ONE Spark session over ONE persisted edge table —
same-window by construction.  Order alternates (A B | B A | A B) so
JIT/cache warm-up cannot favour either side; a discarded warm-up run
precedes the pairs.

Usage: python tools/ab_csr_combiner.py [n_pages] [pairs]
"""
import json
import os
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def combiner_dict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Pre-28572e1 variant: per-element dict accumulate across batches."""
    import numpy as np

    acc: dict = {}
    for pdf in batches:
        if pdf.empty:
            continue
        codes, uniques = pd.factorize(pdf["dst"].to_numpy())
        sums = np.bincount(codes, weights=pdf["contrib"].to_numpy())
        for d, s in zip(uniques, sums):
            acc[d] = acc.get(d, 0.0) + s
    if acc:
        yield pd.DataFrame({"dst": list(acc.keys()), "partial": list(acc.values())})


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators import pagerank as prmod
    from dachshund_spark.session import get_spark
    from dachshund_spark.sources.pages import edges_from_extracted, synthesize_pages

    combiner_groupby = prmod._csr_partial_sums  # HEAD variant

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "20g"}
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="ab_csr", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = synthesize_pages(spark, n_pages, n_sites=997, n_hubs=64, seed=42)
    edges = edges_from_extracted(extract(pages)).persist()
    n_edges = edges.count()
    print(f"edges={n_edges} cpus={cpus}", flush=True)

    def run(combiner) -> float:
        prmod._csr_partial_sums = combiner
        t0 = time.time()
        pr, _ = pagerank_call(edges)
        pr.count()
        return round(time.time() - t0, 3)

    def pagerank_call(e):
        return prmod.pagerank(e, tol=0.0, max_iter=10, impl="csr",
                              include_metrics=True)

    print("warmup (dict, discarded):", run(combiner_dict), flush=True)

    results = {"groupby": [], "dict": []}
    for p in range(pairs):
        order = (
            [("groupby", combiner_groupby), ("dict", combiner_dict)]
            if p % 2 == 0
            else [("dict", combiner_dict), ("groupby", combiner_groupby)]
        )
        for name, fn in order:
            sec = run(fn)
            results[name].append(sec)
            print(f"pair {p} {name}: {sec}s", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"n_edges": n_edges, "runs": results, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
