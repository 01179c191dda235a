"""SALSA (operators/salsa.py) vs its sequential kernel, plus the
Lempel-Moran stationarity property that distinguishes it from HITS."""

import pytest

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators.salsa import salsa


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_salsa_matches_kernel(spark):
    # deterministic pseudo-random digraph incl. a hub and a sink
    pairs = sorted(
        {((i * 7) % 23, (i * i * 5 + 3) % 23) for i in range(80)}
        - {(v, v) for v in range(23)}
    )
    got = {
        r["v"]: (r["hub"], r["authority"])
        for r in salsa(_edges(spark, pairs), max_iter=6).collect()
    }
    want = K.salsa(pairs, max_iter=6)
    # tolerance, not round-then-equal: the Spark sums accumulate in
    # partition order while the kernel is sequential, so a value adjacent
    # to a rounding boundary could flip the 9th digit nondeterministically
    assert set(got) == set(want)
    for v, (h, a) in want.items():
        assert abs(got[v][0] - h) <= 1e-9 and abs(got[v][1] - a) <= 1e-9


def test_salsa_stationary_is_degree_proportional(spark):
    # Lempel & Moran: on a connected support graph, the authority walk's
    # stationary weight of v is indeg(v)/|E| — run long enough to
    # converge and check against the closed form (the property HITS does
    # NOT have; eigenvector-based scores concentrate on the tightest
    # community instead)
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1), (1, 0)]
    rows = salsa(_edges(spark, pairs), max_iter=40).collect()
    ind = {0: 2, 1: 2, 2: 2}
    for r in rows:
        assert r["authority"] == pytest.approx(ind[r["v"]] / 6, abs=1e-9)


def test_salsa_no_outlinks_zero_hub(spark):
    rows = {
        r["v"]: r for r in salsa(_edges(spark, [(1, 2)]), max_iter=3).collect()
    }
    assert rows[2]["hub"] == 0.0
    assert rows[1]["authority"] == 0.0
    assert rows[1]["hub"] == pytest.approx(1.0)
    assert rows[2]["authority"] == pytest.approx(1.0)


def test_salsa_empty_raises(spark):
    with pytest.raises(ValueError):
        salsa(_edges(spark, []).filter("src > 0"), max_iter=2)
