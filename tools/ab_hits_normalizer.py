"""Interleaved A/B of the HITS normalizer formulation:

A ("inplan")  — the first formulation: L1 total as an in-plan one-row
  aggregate broadcast-crossJoined into the half-step, which references
  the half-step aggregate twice and relies on exchange reuse that AQE
  does not reliably provide (observed: no ReusedExchange in the final
  plan), so the message shuffle may run twice per half-step.
B ("scalar")  — HEAD: eager cut leaf per half-step + leaf-scan L1 total
  collected to the driver, applied as a lit() in the next half-step
  (the eigenvector_centrality discipline, centrality.py:38-99).

Both run inside ONE Spark session over ONE persisted page edge table,
alternating order per pair with a discarded warm-up, per the repo's
measurement discipline (BENCH/PLANS.md round-6 noise adjudications).

Usage: python tools/ab_hits_normalizer.py [n_pages] [pairs] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dachshund_spark.plans.superstep import cut_lineage, release  # noqa: E402


def hits_inplan(edges, max_iter=8):
    """Variant A: in-plan crossJoin(one-row L1) normalizer."""
    e = edges.select("src", "dst").persist()
    verts = cut_lineage(
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    n = verts.count()
    state = cut_lineage(
        verts.select(
            "v",
            (F.lit(1.0) / F.lit(float(n))).alias("hub"),
            F.lit(0.0).alias("auth"),
        )
    )

    def half(st, from_col, join_key, group_key, out_col):
        raw = (
            e.join(st.select(F.col("v").alias(join_key), from_col), join_key)
            .groupBy(F.col(group_key).alias("v"))
            .agg(F.sum(from_col).alias("raw"))
        )
        total = raw.agg(F.sum("raw").alias("l1"))
        return (
            verts.join(raw, "v", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "v",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("l1"))
                .alias(out_col),
            )
        )

    for _ in range(max_iter):
        auth = cut_lineage(half(state, "hub", "src", "dst", "auth"))
        new_state = cut_lineage(
            half(auth, "auth", "dst", "src", "hub")
            .join(auth, "v")
            .select("v", "hub", "auth")
        )
        release(state)
        release(auth)
        state = new_state
    e.unpersist()
    release(verts)
    return state.select("v", "hub", F.col("auth").alias("authority"))


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.hits import hits as hits_scalar
    from dachshund_spark.session import get_spark
    from dachshund_spark.sources.pages import (
        edges_from_extracted,
        synthesize_pages,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "20g"}
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="ab_hits", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = synthesize_pages(spark, n_pages, n_sites=997, n_hubs=64, seed=42)
    edges = edges_from_extracted(extract(pages)).persist()
    print(f"edges: {edges.count()}", flush=True)

    variants = {"inplan": hits_inplan, "scalar": hits_scalar}

    def run(name):
        t0 = time.time()
        variants[name](edges, max_iter=iters).count()
        dt = round(time.time() - t0, 2)
        print(f"{name}: {dt}s", flush=True)
        spark.catalog.clearCache()
        edges.persist().count()
        return dt

    run("scalar")  # discarded warm-up
    results = {"inplan": [], "scalar": []}
    for p in range(pairs):
        order = ["inplan", "scalar"] if p % 2 == 0 else ["scalar", "inplan"]
        for name in order:
            results[name].append(run(name))
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(f"RESULT inplan={results['inplan']} scalar={results['scalar']} "
          f"medians inplan={med['inplan']} scalar={med['scalar']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
