"""SALSA (Stochastic Approach for Link-Structure Analysis) over a
directed edge DataFrame.

Lempel & Moran's degree-normalized sibling of HITS (WWW9 2000, public;
the link-analysis variant production systems actually favor — cf.
Twitter's who-to-follow literature): the authority walk steps backward
along an in-link chosen uniformly, then forward along an out-link chosen
uniformly, so each half-step divides messages by the LOCAL degree rather
than re-normalizing by the global L1 total.

That local normalization is what makes this operator cheaper than its
HITS sibling (operators/hits.py) at scale: both half-step transition
weights are static edge attributes, so the iteration needs NO driver
action at all — zero per-round synchronization barriers beyond the
shuffles themselves, where HITS pays a leaf-scan collect per half-step
for its L1 scale.

Spark design:

- out-degree / in-degree are computed once and folded INTO the two
  cached edge tables (edges ⋈ degree, pre-partitioned by the half-step's
  join key — pagerank's cached-links discipline), so per half-step only
  the O(|V|) state shuffles;
- each half-step is one state ⋈ edges join + one map-side-combining sum
  (hub-vertex safe: a 10^7-in-link authority costs one partial row per
  shuffle partition);
- messages divide by the INTEGER degree column in place (``s / deg``),
  the same correctly-rounded double op the sequential kernel mirror
  performs (functions/kernels.py:salsa) — no precomputed-reciprocal
  drift;
- per-iteration ``cut_lineage`` + release keeps plan depth and block
  storage O(1) across iterations (each state is referenced exactly once
  by its successor, the lazy-superstep rule).

Edge multiplicity counts as weight, exactly like hits().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release


def salsa(edges: DataFrame, max_iter: int = 8) -> DataFrame:
    """(src, dst) directed -> (v, hub, authority) after ``max_iter``
    backward/forward double-steps from the uniform authority start
    (1/n_authorities on every vertex with an in-link)."""
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    e = edges.select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("ind"))
    # hub half-step reads authority state keyed by dst; authority
    # half-step reads hub state keyed by src — fold the divisor into
    # each edge copy and pre-partition on its probe key
    e_bwd = (
        e.join(indeg, "dst").select("src", "dst", "ind")
        .repartition("dst").persist()
    )
    e_fwd = (
        e.join(outdeg, "src").select("src", "dst", "od")
        .repartition("src").persist()
    )
    verts = cut_lineage(
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    n_auth = e_bwd.select("dst").distinct().count()  # materializes caches
    if n_auth == 0:
        raise ValueError("salsa: empty edge table")

    auth = cut_lineage(
        e_bwd.select(F.col("dst").alias("v")).distinct()
        .select("v", F.lit(1.0 / n_auth).alias("s"))
    )
    hub = None
    for _ in range(max_iter):
        new_hub = cut_lineage(
            e_bwd.join(auth.select(F.col("v").alias("dst"), "s"), "dst")
            .select(F.col("src").alias("v"), (F.col("s") / F.col("ind")).alias("m"))
            .groupBy("v")
            .agg(F.sum("m").alias("s"))
        )
        release(hub)
        hub = new_hub
        new_auth = cut_lineage(
            e_fwd.join(hub.select(F.col("v").alias("src"), "s"), "src")
            .select(F.col("dst").alias("v"), (F.col("s") / F.col("od")).alias("m"))
            .groupBy("v")
            .agg(F.sum("m").alias("s"))
        )
        release(auth)
        auth = new_auth
    out = cut_lineage(
        verts.join(hub.select("v", F.col("s").alias("hs")), "v", "left")
        .join(auth.select("v", F.col("s").alias("as_")), "v", "left")
        .select(
            "v",
            F.coalesce("hs", F.lit(0.0)).alias("hub"),
            F.coalesce("as_", F.lit(0.0)).alias("authority"),
        )
    )
    release(verts)
    release(hub)
    release(auth)
    e_bwd.unpersist()
    e_fwd.unpersist()
    return out
