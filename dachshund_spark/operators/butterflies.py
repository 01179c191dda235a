"""Bipartite butterfly (K2,2) counting.

The reference's typed bipartite graphs (typed_graph_builder.rs:29-169)
stop at clique mining; butterflies are the bipartite analog of triangles
(Sanei-Mehri et al., "Butterfly Counting in Bipartite Networks", KDD
2018) and the standard cohesion motif for order/part, user/page, and
host/resource incidence tables.

Counting is wedge-based and fully aggregate-shaped (no enumeration of
the 4-cycles themselves): for each pair of same-side vertices, ``c`` =
the number of common neighbors, and that pair participates in C(c, 2)
butterflies.  The wedge self-join pivots on the OTHER side, so its cost
is sum over pivot vertices of C(degree, 2) — the classic side-selection
rule picks the side with the smaller wedge sum (``global_butterflies``
does; per-vertex output fixes the pivot by construction).  All
aggregates get map-side partial combine; hub pivots (an order touching
thousands of parts) dominate cost quadratically, which at 100 TB is
handled upstream by the same degree-cap / hub-split policy as the
triangle family (operators/triangles.py) — the wedge join itself is a
plain equi-join Catalyst shuffles on the pivot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(inc: DataFrame, pivot: str, side: str) -> DataFrame:
    """DataFrame[p1, p2, c]: for each unordered pair of ``side`` vertices,
    the number of common ``pivot`` neighbors (c >= 1)."""
    a = inc.select(F.col(pivot).alias("g"), F.col(side).alias("p1"))
    b = inc.select(F.col(pivot).alias("g"), F.col(side).alias("p2"))
    return (
        a.join(b, "g")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("c"))
    )


def butterfly_per_vertex(
    inc: DataFrame, pivot: str, side: str, top_k: int | None = None
) -> DataFrame:
    """DataFrame[v, butterflies] for ``side`` vertices: the number of
    K2,2's each participates in (only vertices with >= 1 butterfly).
    ``top_k`` keeps the deterministic head under (butterflies DESC,
    v ASC).  ``inc`` is an incidence table; duplicates are dropped."""
    from pyspark.sql import Window

    pairs = _pair_counts(inc.select(pivot, side).distinct(), pivot, side)
    per = (
        pairs.select(F.col("p1").alias("v"), "c")
        .union(pairs.select(F.col("p2").alias("v"), "c"))
        .groupBy("v")
        .agg(
            # sum the (even) doubled counts exactly in BIGINT, halve once
            F.expr("sum(c * (c - 1)) div 2").alias("butterflies")
        )
        .filter(F.col("butterflies") > 0)
    )
    if top_k is None:
        return per
    w = Window.orderBy(F.col("butterflies").desc(), F.col("v"))
    return (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .drop("rn")
    )


def global_butterflies(inc: DataFrame, left: str, right: str) -> DataFrame:
    """One row [butterflies, wedges_left_pivot, wedges_right_pivot,
    pivot]: the exact global K2,2 count, wedge-joined on whichever side
    yields fewer wedges (both wedge sums are reported; the count is
    side-invariant)."""
    inc = inc.select(left, right).distinct().persist()
    wedges = {}
    for pivot in (left, right):
        wedges[pivot] = (
            inc.groupBy(pivot)
            .agg(F.count("*").alias("d"))
            .agg(F.expr("sum(d * (d - 1)) div 2").alias("w"))
            .collect()[0][0]
            or 0
        )
    pivot = left if wedges[left] <= wedges[right] else right
    side = right if pivot == left else left
    total = (
        _pair_counts(inc, pivot, side)
        .agg(F.expr("sum(c * (c - 1)) div 2").alias("butterflies"))
        .collect()[0][0]
        or 0
    )
    inc.unpersist()
    spark = inc.sparkSession
    return spark.createDataFrame(
        [(int(total), int(wedges[left]), int(wedges[right]), str(pivot))],
        "butterflies long, wedges_left_pivot long, "
        "wedges_right_pivot long, pivot string",
    )
