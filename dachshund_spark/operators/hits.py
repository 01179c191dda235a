"""HITS (hubs and authorities) over a directed edge DataFrame.

Kleinberg's link-analysis pair (JACM 1999, public): authority(v) sums the
hub scores of pages linking TO v; hub(u) sums the authority scores of
pages u links to; each vector is L1-normalized every half-step so the
fixed iteration count is scale-free.  The reference engine has no
counterpart (its centrality family, eigenvector_centrality.rs:21-42,
covers the undirected single-vector case only); this is the directed
two-vector sibling, built for the web link graph the engine targets.

Spark design (the eigenvector_centrality normalization discipline,
centrality.py:38-99 — carry the UN-normalized vector, hold the L1 scale
on the driver, apply it lazily as a ``lit`` inside the next half-step's
message expression):

- Each half-step is one edge ⋈ state join + one map-side-combining sum
  aggregate (a 10^7-in-link authority costs one partial row per shuffle
  partition, not 10^7 shuffled messages), materialized as an eager
  ``cut_lineage`` leaf; the L1 total then comes from a leaf-scan
  aggregate — O(|V|) rows off block storage, NO recomputed shuffle (the
  naive in-plan normalizer would reference the aggregate twice and AQE
  does not reliably reuse the exchange across the two branches).
- The edge table is persisted twice, pre-partitioned by src and by dst
  (pagerank's cached-links discipline), so neither half-step re-exchanges
  the edges — only the O(|V|) message state shuffles per half-step.
- Dividing each message by ``lit(scale)`` before the sum reproduces the
  sequential kernel's divide-then-sum order exactly (functions/
  kernels.py:hits), so results are float-comparable at 1e-12.
- Superseded leaves are released every half-step: plan depth and
  checkpoint blocks stay O(1) across iterations.

Edge multiplicity counts as weight (a page linking twice contributes
twice); callers wanting set semantics should ``distinct()`` first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release, superstep_state_side


def hits(edges: DataFrame, max_iter: int = 8) -> DataFrame:
    """(src, dst) directed -> (v, hub, authority), both L1-normalized
    (each column sums to 1) after ``max_iter`` full iterations."""
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    e_by_src = edges.select("src", "dst").repartition("src").persist()
    e_by_dst = e_by_src.repartition("dst").persist()
    verts = cut_lineage(
        e_by_src.select(F.col("src").alias("v"))
        .union(e_by_src.select(F.col("dst").alias("v")))
        .distinct()
    )
    n = verts.count()  # also materializes the edge caches
    if n == 0:
        raise ValueError("hits: empty edge table")

    def _push(ev: DataFrame, st: DataFrame, scale: float,
              from_key: str, to_key: str) -> tuple[DataFrame, float]:
        """One half-step: sum st.s/scale over edges onto ``to_key``;
        returns the new un-normalized leaf and its L1 total."""
        # deliberate state-side strategy (superstep_state_side): the
        # stats-free cut leaf otherwise makes the planner broadcast the
        # cached edge table — a serial |E|-row build per half-step
        msgs = ev.join(
            superstep_state_side(
                st.select(F.col("v").alias(from_key), "s"), n
            ),
            from_key,
        ).select(F.col(to_key).alias("v"), (F.col("s") / F.lit(scale)).alias("m"))
        # lazy cut + leaf-scan aggregate in ONE job (the aggregate
        # materializes the checkpoint): halves the driver actions per
        # half-step vs the old eager-cut-then-aggregate pair
        out = cut_lineage(
            msgs.groupBy("v").agg(F.sum("m").alias("s")), eager=False
        )
        total = out.agg(F.sum("s").alias("t")).collect()[0]["t"]
        return out, float(total)

    # un-normalized hub vector starts at 1 everywhere; its L1 scale is n,
    # so hub_0 / hsum == the kernel's uniform 1/n start
    hub = cut_lineage(verts.select("v", F.lit(1.0).alias("s")))
    hsum = float(n)
    auth, asum = None, 1.0
    for _ in range(max_iter):
        new_auth, asum = _push(e_by_src, hub, hsum, "src", "dst")
        release(auth)
        auth = new_auth
        new_hub, hsum = _push(e_by_dst, auth, asum, "dst", "src")
        release(hub)
        hub = new_hub
    out = (
        verts.join(hub.select("v", F.col("s").alias("hs")), "v", "left")
        .join(auth.select("v", F.col("s").alias("as_")), "v", "left")
        .select(
            "v",
            (F.coalesce("hs", F.lit(0.0)) / F.lit(hsum)).alias("hub"),
            (F.coalesce("as_", F.lit(0.0)) / F.lit(asum)).alias("authority"),
        )
    )
    out = cut_lineage(out)
    release(verts)
    release(hub)
    release(auth)
    e_by_src.unpersist()
    e_by_dst.unpersist()
    return out
