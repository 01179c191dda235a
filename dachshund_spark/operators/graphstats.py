"""Whole-graph structural statistics: degree assortativity and
reciprocity.

Extends the reference's global-stats family (clustering.rs:40-46,
transitivity.rs:37-51 — averages/ratios over the whole graph) with two
standard link-graph measures from the public literature (Newman,
"Assortative mixing in networks", PRL 2002; Garlaschelli & Loffredo,
"Patterns of link reciprocity in directed networks", PRL 2004).

Scale design: both reduce to a handful of exact BIGINT sums over the edge
list (one partial-aggregating pass, no join fan-out beyond the degree
attach), with the floating-point formula applied once to the aggregate
row.  Integer sums are order-independent, so the result is deterministic
under any partitioning/AQE reordering — the final double arithmetic runs
on identical integers everywhere, and +,-,*,/ and sqrt are IEEE
correctly-rounded, making the value reproducible bit-for-bit against a
sequential oracle (no float-reduction wobble to tolerate)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .builders import symmetrized


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Pearson correlation of endpoint degrees over the symmetrized edge
    list -> one row (m_edges, assortativity).  m counts directed (ordered)
    edge slots, the standard convention for undirected assortativity."""
    sym = symmetrized(edges)
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    e = (
        sym.join(deg, "src")
        .withColumnRenamed("d", "ds")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("d").alias("dd")),
            "dst",
        )
    )
    agg = e.agg(
        F.count("*").alias("m"),
        F.sum("ds").alias("sx"),
        F.sum("dd").alias("sy"),
        F.sum(F.col("ds") * F.col("dd")).alias("sxy"),
        F.sum(F.col("ds") * F.col("ds")).alias("sxx"),
        F.sum(F.col("dd") * F.col("dd")).alias("syy"),
    )
    # every operand cast to double BEFORE the formula so the oracle can
    # reproduce the arithmetic term-for-term (m*sxy overflows BIGINT at
    # sf0.1 scale; in double it rounds identically on both sides)
    r = (
        "(cast(m as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / sqrt((cast(m as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double))"
        " * (cast(m as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double)))"
    )
    return agg.selectExpr("m as m_edges", f"{r} as assortativity")


def reciprocity(edges: DataFrame) -> DataFrame:
    """Fraction of directed edges whose reverse edge also exists -> one
    row (n_edges, n_reciprocal, reciprocity).  Self-loops are excluded
    (their reverse is themselves, which would inflate the measure)."""
    e = edges.select("src", "dst").filter("src != dst").distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    agg = e.agg(F.count("*").alias("n_edges")).crossJoin(
        recip.agg(F.count("*").alias("n_reciprocal"))
    )
    return agg.selectExpr(
        "n_edges",
        "n_reciprocal",
        "cast(n_reciprocal as double) / cast(n_edges as double)"
        " as reciprocity",
    )
