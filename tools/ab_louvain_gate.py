"""Interleaved A/B of the Louvain move-gate placement:

A ("postgate") — the naive formulation: every vertex's best move is
  computed each round (full e(v,C) shuffle over ALL directed edges), and
  the md5-parity gate is applied only at the label update.
B ("upstream") — HEAD (operators/louvain.py): the gate filters the
  directed edge table BEFORE the e(v,C) join, so ungated vertices
  contribute no messages — the dominant exchange halves.

Both produce IDENTICAL labels (asserted on the first pair).  Runs inside
ONE Spark session over ONE persisted copurchase edge table, alternating
order per pair with a discarded warm-up, per the repo's measurement
discipline (BENCH/PLANS.md round-6 noise adjudications).

Usage: python tools/ab_louvain_gate.py [sf_dir] [pairs] [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dachshund_spark.plans.superstep import cut_lineage, release  # noqa: E402


def louvain_postgate(edges, max_rounds=6):
    """Variant A: full-edge e(v,C) every round, gate at update only."""
    canon = cut_lineage(
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).filter(F.col("a") != F.col("b")).distinct()
    )
    m = canon.count()
    dir_e = canon.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).repartition("dst").persist()
    deg = dir_e.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    deg = deg.persist()
    deg.count()
    labels = cut_lineage(deg.select("v", F.col("v").alias("c")))

    def _gate(col, rnd):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(rnd), col.cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2 == 0
        )

    for rnd in range(max_rounds):
        evc = (
            dir_e.join(labels.select(F.col("v").alias("dst"), F.col("c")), "dst")
            .groupBy(F.col("src").alias("v"), "c")
            .agg(F.count("*").alias("e"))
        )
        vol = labels.join(deg, "v").groupBy("c").agg(F.sum("deg").alias("vol"))
        cur = labels.select("v", F.col("c").alias("cur_c"))
        cands = (
            evc.unionByName(
                cur.select("v", F.col("cur_c").alias("c"), F.lit(0).alias("e"))
            )
            .groupBy("v", "c").agg(F.max("e").alias("e"))
        )
        key = (
            F.lit(2 * m) * F.col("e")
            - F.col("deg")
            * (F.col("vol") - F.when(F.col("c") == F.col("cur_c"), F.col("deg")).otherwise(F.lit(0)))
        ).cast("long")
        picked = (
            cands.join(F.broadcast(vol), "c")
            .join(deg, "v")
            .join(cur, "v")
            .select("v", "cur_c",
                    F.struct((-key).alias("nk"), F.col("c")).alias("cand"))
            .groupBy("v", "cur_c").agg(F.min("cand").alias("best"))
        )
        labels_new = cut_lineage(
            picked.select(
                "v",
                F.when(_gate(F.col("v"), rnd), F.col("best.c"))
                .otherwise(F.col("cur_c")).alias("c"),
            )
        )
        release(labels)
        labels = labels_new
    dir_e.unpersist()
    deg.unpersist()
    release(canon)
    return labels.select("v", F.col("c").alias("community"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    import __spark_entry__ as E
    from dachshund_spark.operators.louvain import louvain_moves
    from dachshund_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "20g"}
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="ab_louvain", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = E.copurchase_edges(spark, sf_dir).persist()
    print(f"edges: {edges.count()}", flush=True)

    variants = {"postgate": louvain_postgate, "upstream": louvain_moves}
    outputs = {}

    def run(name, keep=False):
        t0 = time.time()
        out = variants[name](edges, rounds)
        if keep:
            outputs[name] = {r["v"]: r["community"] for r in out.collect()}
        else:
            out.count()
        dt = round(time.time() - t0, 2)
        print(f"{name}: {dt}s", flush=True)
        spark.catalog.clearCache()
        edges.persist().count()
        return dt

    run("upstream")  # discarded warm-up
    # parity check once (collect cost excluded from timing comparisons)
    run_a = run("postgate", keep=True)
    run_b = run("upstream", keep=True)
    assert outputs["postgate"] == outputs["upstream"], "label mismatch!"
    print(f"parity OK over {len(outputs['upstream'])} vertices", flush=True)

    results = {"postgate": [run_a], "upstream": [run_b]}
    for p in range(pairs - 1):
        order = (
            ["postgate", "upstream"] if p % 2 == 0 else ["upstream", "postgate"]
        )
        for name in order:
            results[name].append(run(name))
    med = {
        k: sorted(v)[len(v) // 2] for k, v in results.items()
    }
    print(f"runs: {results}", flush=True)
    print(
        f"medians postgate={med['postgate']} upstream={med['upstream']}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
