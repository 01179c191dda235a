"""Approximate neighborhood function (ANF / HyperBall family).

Estimates, for every vertex simultaneously, the number of distinct
vertices within distance <= t — the primitive behind effective-diameter
and centrality estimates on web-scale link graphs (Palmer et al., "ANF: a
fast and scalable tool for data mining in massive graphs", KDD'02;
Boldi & Vigna, "HyperBall", 2013 — both public).  The reference engine has
no counterpart (its connectivity family, connected_components.rs:26-155,
computes exact components only); this is a scale-path addition: exact
per-vertex ball sizes need |V| BFS runs, while the sketch runs in t
supersteps total for ALL vertices at once.

Design (Spark-first, zero UDFs):

- Per vertex, ``k`` Flajolet-Martin bitmaps, each a 64-bit BIGINT column
  ``r0..r{k-1}``.  Register i of vertex v starts with one bit set at the
  trailing-zero count of a 60-bit integer drawn from ``md5(v ':' i)`` —
  fully deterministic, so the distributed result is hash-comparable to
  the sequential kernel oracle (``functions.kernels.anf_sketches``).
- One superstep = neighbors' sketches OR-merged into each vertex:
  an edge join + ``bit_or`` aggregate.  ``bit_or`` is commutative and
  associative, so Catalyst's partial aggregation OR-combines map-side;
  a hub vertex with 10^7 in-links costs one partial row per shuffle
  partition, not 10^7 shuffled messages.  This is the property that
  makes the sketch the 100 TB path where exact distinct-within-t
  (a t-hop self-join + count distinct) is not.
- After t rounds, ``r_i(v)`` summarizes the distance-<=t ball around v;
  ``anf_estimates`` turns the registers into a cardinality estimate with
  the standard FM correction (2^mean(lowest-zero-bit) / 0.77351).

All expressions (md5, conv, bit_count, shiftleft, bit_or, power) are JVM
built-ins inside whole-stage codegen; state stays (v, k bigints) — 8-ish
bytes/register — so the shuffle per superstep is O(|E|) rows of fixed
width regardless of ball sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import cut_lineage, release, superstep_state_side
from .builders import symmetrized

FM_PHI = 0.77351  # Flajolet-Martin bias correction constant


def _init_register_exprs(k: int) -> list[str]:
    """SQL expressions for the k initial FM registers of column ``v``.

    Register i: take the first 15 hex chars (60 bits) of md5("<v>:<i>"),
    set the single bit at that integer's trailing-zero count.  The
    sequential oracle (kernels.anf_sketches) computes the identical
    hashlib.md5 -> int(hex[:15], 16) -> (x & -x).bit_length()-1 chain, so
    registers are bit-identical across the two implementations.
    """
    exprs = []
    for i in range(k):
        x = (
            "cast(conv(substring(md5(cast(concat(cast(v as string), "
            f"':', '{i}') as binary)), 1, 15), 16, 10) as bigint)"
        )
        # trailing-zero count of a positive 60-bit value; x = 0 (prob
        # 2^-60 per register) maps past every real position
        p = f"(case when {x} = 0 then 60 else bit_count(({x} & -{x}) - 1) end)"
        exprs.append(f"shiftleft(cast(1 as bigint), {p}) as r{i}")
    return exprs


def anf_sketches(edges: DataFrame, rounds: int = 3, k: int = 8) -> DataFrame:
    """(src, dst) -> (v, r0..r{k-1}): FM sketches of each vertex's
    distance-<=``rounds`` ball on the symmetrized graph.

    Each round is one shuffle (the edge join) + one aggregate whose
    partials OR-combine map-side; state is released via the cut-leaf
    discipline (each new state is an eager ``cut_lineage`` leaf, so the
    superseded one frees immediately — no deferred window needed).
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    sym = symmetrized(edges).repartition("src").persist()
    sym.count()
    regs = [f"r{i}" for i in range(k)]
    state = cut_lineage(
        sym.select(F.col("src").alias("v"))
        .distinct()
        .selectExpr("v", *_init_register_exprs(k))
    )
    n_verts = state.count()  # sets the state-side join strategy
    aggs = [F.bit_or(r).alias(r) for r in regs]
    for _ in range(rounds):
        # deliberate state-side strategy (superstep_state_side): unhinted,
        # the stats-free cut leaf makes the planner broadcast the cached
        # edge table every round (serial |E|-row build)
        msgs = sym.join(
            superstep_state_side(state, n_verts), sym.dst == state.v
        ).select(
            F.col("src").alias("v"), *regs
        )
        new_state = cut_lineage(
            state.unionByName(msgs).groupBy("v").agg(*aggs)
        )
        release(state)
        state = new_state
    sym.unpersist()
    return state


def anf_estimates(sketches: DataFrame, k: int = 8) -> DataFrame:
    """(v, r0..r{k-1}) -> (v, nf_est): FM cardinality estimate of the
    ball each sketch summarizes: 2^(mean lowest-zero-bit) / 0.77351.

    ``r ^ (r+1)`` sets exactly the bits up to and including the lowest
    zero bit, so its bit_count minus one is that bit's position — pure
    integer ops until the final power, all codegen'd.  (Registers never
    set bit 63 — positions are trailing-zero counts <= 60 — so the +1
    cannot overflow.)
    """
    return sketches.selectExpr("v", f"{_estimate_expr(k)} as nf_est")


def _estimate_expr(k: int) -> str:
    """The FM cardinality-estimate SQL expression over columns
    ``r0..r{k-1}`` (shared by ``anf_estimates`` and the in-state
    accumulator of ``anf_harmonic_centrality``)."""
    lows = [
        f"(bit_count(r{i} ^ (r{i} + cast(1 as bigint))) - 1)"
        for i in range(k)
    ]
    mean = "(" + " + ".join(lows) + f") / cast({k} as double)"
    return f"power(cast(2 as double), {mean}) / {FM_PHI}"


def anf_neighborhood_function(
    edges: DataFrame, rounds: int = 3, k: int = 8
) -> DataFrame:
    """(src, dst) -> (t, nf_total, frac) for t = 0..rounds: the graph's
    neighborhood function N(t) = Σ_v |ball(v, t)| estimated from the FM
    sketches, plus each round's fraction of N(rounds).

    This is the ANF/HyperBall headline readout (Palmer KDD'02 §4; Boldi &
    Vigna 2013 §5): the smallest t with frac >= 0.9 is the standard
    effective-diameter estimate.  One extra Spark action per round (the
    one-row Σ estimate — rounds is small by construction); everything else
    is the ``anf_sketches`` superstep: edge join + map-side-combining
    ``bit_or``, state a cut leaf per round, O(|E|) fixed-width shuffle
    rows regardless of ball sizes.

    ``nf_total`` is rounded to 3 decimals driver-side before the ratio —
    the absolute float-drift between Spark's and the oracle's sum orders
    is ~1e-9 at 1e6 vertices, so the rounded totals (and hence ``frac``,
    computed from them) are hash-stable.
    """
    spark = edges.sparkSession
    totals = _nf_totals(edges, rounds, k)
    last = totals[-1]
    return spark.createDataFrame(
        [(t, tot, round(tot / last, 6)) for t, tot in enumerate(totals)],
        "t int, nf_total double, frac double",
    )


def _nf_totals(edges: DataFrame, rounds: int, k: int) -> list[float]:
    """The N(t) estimate per round, t = 0..rounds — the shared superstep
    loop behind ``anf_neighborhood_function`` and
    ``anf_effective_diameter`` (one one-row action per round; each total
    rounded to 3 decimals driver-side, see the caller docstrings)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    sym = symmetrized(edges).repartition("src").persist()
    sym.count()
    regs = [f"r{i}" for i in range(k)]
    state = cut_lineage(
        sym.select(F.col("src").alias("v"))
        .distinct()
        .selectExpr("v", *_init_register_exprs(k))
    )
    n_verts = state.count()  # sets the state-side join strategy
    aggs = [F.bit_or(r).alias(r) for r in regs]

    def _total(st: DataFrame) -> float:
        row = anf_estimates(st, k).agg(F.sum("nf_est").alias("s")).collect()
        return round(float(row[0]["s"]), 3)

    totals = [_total(state)]
    for _ in range(rounds):
        # deliberate state-side strategy (superstep_state_side): unhinted,
        # the stats-free cut leaf makes the planner broadcast the cached
        # edge table every round (serial |E|-row build)
        msgs = sym.join(
            superstep_state_side(state, n_verts), sym.dst == state.v
        ).select(
            F.col("src").alias("v"), *regs
        )
        new_state = cut_lineage(
            state.unionByName(msgs).groupBy("v").agg(*aggs)
        )
        release(state)
        state = new_state
        totals.append(_total(state))
    sym.unpersist()
    release(state)
    return totals


def effective_diameter_from_totals(
    totals: list[float], q: float
) -> tuple[int, float]:
    """(t_hit, interpolated effective diameter) from the rounded N(t)
    series — the standard ANF readout (Palmer KDD'02 §4.4): the smallest
    t with N(t) >= q·N(rounds), linearly interpolated between t-1 and t.
    Pure driver-side arithmetic over the (already-rounded) totals, so the
    sequential oracle runs the IDENTICAL code path on identical inputs —
    shared by operator and oracle precisely so the two cannot diverge.
    If the series never reaches the target inside ``rounds`` supersteps
    (impossible for q <= 1 since frac(rounds) == 1 by construction), the
    last round is reported."""
    target = q * totals[-1]
    t_hit = len(totals) - 1
    for t, tot in enumerate(totals):
        if tot >= target:
            t_hit = t
            break
    if t_hit == 0:
        eff = 0.0
    else:
        lo, hi = totals[t_hit - 1], totals[t_hit]
        eff = (t_hit - 1) + (target - lo) / (hi - lo)
    return t_hit, round(eff, 6)


def anf_effective_diameter(
    edges: DataFrame, q: float = 0.9, rounds: int = 3, k: int = 8
) -> DataFrame:
    """(src, dst) -> one row (q, t_hit, eff_diameter): the q-effective
    diameter of the graph estimated from the ANF sketches — the smallest
    distance within which a q-fraction of all reachable pairs sits
    (q = 0.9 is the standard web-graph headline number, Palmer KDD'02;
    Broder et al., "Graph structure in the web", WWW'00 report ~6.8 for
    the 1999 web).  Runs the ``_nf_totals`` superstep loop (edge join +
    map-side-combining ``bit_or`` per round, O(|E|) fixed-width shuffle
    rows) and interpolates driver-side."""
    spark = edges.sparkSession
    totals = _nf_totals(edges, rounds, k)
    t_hit, eff = effective_diameter_from_totals(totals, q)
    return spark.createDataFrame(
        [(float(q), t_hit, eff)],
        "q double, t_hit int, eff_diameter double",
    )


def anf_harmonic_centrality(
    edges: DataFrame, rounds: int = 3, k: int = 8
) -> DataFrame:
    """(src, dst) -> (v, harmonic_est): HyperBall-style harmonic
    centrality for EVERY vertex simultaneously (Boldi & Vigna,
    "In-core computation of geometric centralities with HyperBall",
    2013): H(v) = Σ_t (|B(v,t)| - |B(v,t-1)|) / t over t = 1..rounds,
    ball sizes estimated from the FM sketches.

    This is the scale companion to ``harmonic_centrality`` (exact,
    sampled sources): the exact path costs one BFS frontier per source,
    the sketch path serves ALL vertices in ``rounds`` supersteps total —
    at 10^12 edges the only viable per-vertex closeness.  The running
    H accumulator and the previous ball estimate ride INSIDE the
    superstep state (message rows carry typed nulls; ``max`` folds the
    lone state row's values through the register aggregate), so the
    whole operator costs exactly the sketch loop's one exchange per
    round — no readout joins at all (cut leaves are opaque LogicalRDDs
    that LOSE their output partitioning, so a join-based readout over
    per-round leaves would re-shuffle every leg; measured: 4 Exchanges +
    3 SortMergeJoins for rounds=3).  The per-round update
    ``h += (e_new - e_prev)/t`` is increasing-t, left-associated —
    bit-identical to the sequential kernel's accumulation (registers are
    deterministic md5; estimates are identical IEEE ops).

    Returns harmonic_est rounded to 6 decimals.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    sym = symmetrized(edges).repartition("src").persist()
    sym.count()
    regs = [f"r{i}" for i in range(k)]
    est = _estimate_expr(k)
    state = cut_lineage(
        sym.select(F.col("src").alias("v"))
        .distinct()
        .selectExpr("v", *_init_register_exprs(k))
        .selectExpr("v", *regs, f"{est} as e_prev", "cast(0.0 as double) as h")
    )
    n_verts = state.count()  # sets the state-side join strategy
    aggs = [F.bit_or(r).alias(r) for r in regs] + [
        F.max("e_prev").alias("e_prev"),
        F.max("h").alias("h"),
    ]
    for t in range(1, rounds + 1):
        # deliberate state-side strategy (superstep_state_side): unhinted,
        # the stats-free cut leaf makes the planner broadcast the cached
        # edge table every round (serial |E|-row build)
        msgs = sym.join(
            superstep_state_side(state, n_verts), sym.dst == state.v
        ).select(
            F.col("src").alias("v"),
            *regs,
            F.lit(None).cast("double").alias("e_prev"),
            F.lit(None).cast("double").alias("h"),
        )
        new_state = cut_lineage(
            state.unionByName(msgs)
            .groupBy("v")
            .agg(*aggs)
            .selectExpr(
                "v",
                *regs,
                f"{est} as e_prev",
                f"h + ({est} - e_prev) / {float(t)}d as h",
            )
        )
        release(state)
        state = new_state
    sym.unpersist()
    out = cut_lineage(state.selectExpr("v", "round(h, 6) as harmonic_est"))
    release(state)
    return out
