"""Link prediction over an undirected graph: common-neighbor candidates
with Adamic-Adar scores.

The classic missing-link primitive of link-graph analytics (Adamic &
Adar, "Friends and neighbors on the Web", Social Networks 2003 —
public): for every NON-adjacent pair (u, v) at distance 2, score
AA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w)).  The reference engine has
no counterpart (its counting family, transitivity.rs:20-51, stops at
triangles); this is the open-wedge sibling of the same join.

Spark design — one wedge self-join, like the triangle counter:

- Enumerate wedges by joining the symmetrized adjacency with itself on
  the center w (neighbor lists ordered u < v so each pair appears once
  per common neighbor), carrying deg(w) on the center row.
- groupBy (u, v): the common-neighbor count and the AA sum come out of
  ONE map-side-combining aggregate — the shuffle carries candidate
  pairs, not wedges.
- Existing edges leave via a left_anti join against the canonical edge
  list; ``min_common`` prunes the long noise tail BEFORE that join.

Cost is Σ_w deg(w)² wedge rows — the same frontier every distributed
triangle count pays.  ``max_center_degree`` optionally drops super-hub
centers (a 10^7-degree hub contributes 10^14 wedges of near-zero AA
weight each — standard practice is to cap or sample hubs; the knob makes
the truncation explicit rather than silent).

A degree-1 center cannot close a wedge, so deg(w) >= 2 and the
1/ln(deg) weight never divides by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .builders import canonical_undirected, symmetrized


def adamic_adar(
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(src, dst) -> (u, v, common_neighbors, aa_score) for non-adjacent
    u < v with at least ``min_common`` common neighbors."""
    sym = symmetrized(edges)
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    if max_center_degree is not None:
        deg = deg.filter(F.col("deg") <= max_center_degree)
    nb = sym.join(deg, "src").select(
        F.col("src").alias("w"), F.col("dst").alias("n"), "deg"
    )
    a = nb.select("w", F.col("n").alias("u"), "deg")
    b = nb.select("w", F.col("n").alias("v"))
    wedges = a.join(b, "w").filter(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common_neighbors"),
        F.round(F.sum(F.lit(1.0) / F.log("deg")), 6).alias("aa_score"),
    )
    canon = canonical_undirected(edges).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return pairs.filter(F.col("common_neighbors") >= min_common).join(
        canon, ["u", "v"], "left_anti"
    )
