"""Butterfly (K2,2) counting vs brute force, side-invariance, and
duplicate handling."""

import itertools
import random

from dachshund_spark.operators.butterflies import (
    butterfly_per_vertex,
    global_butterflies,
)


def _inc_df(spark, rows):
    return spark.createDataFrame(rows, "l long, r long")


def _brute_per_vertex(rows):
    """Per-right-vertex butterfly counts by enumerating all K2,2's."""
    inc = set(rows)
    rights = sorted({r for _, r in inc})
    lefts = sorted({l for l, _ in inc})
    nbr = {r: {l for l, rr in inc if rr == r} for r in rights}
    counts = dict.fromkeys(rights, 0)
    for r1, r2 in itertools.combinations(rights, 2):
        c = len(nbr[r1] & nbr[r2])
        b = c * (c - 1) // 2
        counts[r1] += b
        counts[r2] += b
    total = sum(counts.values()) // 2
    return {v: c for v, c in counts.items() if c > 0}, total


def test_butterflies_match_brute_force(spark):
    rng = random.Random(3)
    rows = {(rng.randint(0, 14), rng.randint(100, 111)) for _ in range(120)}
    rows = sorted(rows)
    want_per, want_total = _brute_per_vertex(rows)
    df = _inc_df(spark, rows)
    got = {r["v"]: r["butterflies"] for r in
           butterfly_per_vertex(df, pivot="l", side="r").collect()}
    assert got == want_per
    g = global_butterflies(df, "l", "r").collect()[0]
    assert g["butterflies"] == want_total


def test_butterflies_side_invariance_and_pivot_choice(spark):
    # skewed: 3 lefts, 40 rights => wedge sums differ strongly; the
    # count must not depend on the chosen pivot
    rows = [(l, r) for l in range(3) for r in range(100, 140) if (l + r) % 3]
    df = _inc_df(spark, rows)
    g = global_butterflies(df, "l", "r").collect()[0]
    # pivoting on the other side by hand gives the same count
    per_left = butterfly_per_vertex(df, pivot="r", side="l").collect()
    assert g["butterflies"] == sum(r["butterflies"] for r in per_left) // 2
    # side selection picked the side with fewer wedges
    assert g["pivot"] == ("l" if g["wedges_left_pivot"] <= g["wedges_right_pivot"] else "r")


def test_butterflies_dedupe_and_topk(spark):
    # duplicate incidences must not inflate counts; one K2,2 exactly
    rows = [(1, 10), (1, 11), (2, 10), (2, 11), (1, 10), (2, 11)]
    df = _inc_df(spark, rows)
    got = sorted(
        tuple(r)
        for r in butterfly_per_vertex(df, pivot="l", side="r").collect()
    )
    assert got == [(10, 1), (11, 1)]
    top1 = butterfly_per_vertex(df, pivot="l", side="r", top_k=1).collect()
    assert [tuple(r) for r in top1] == [(10, 1)]  # tie broken by v ASC
    assert global_butterflies(df, "l", "r").collect()[0]["butterflies"] == 1
