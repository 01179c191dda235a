"""Luby maximal independent set vs its sequential kernel, and the
Gopher-style repetition signals vs a hand-computed document."""

import random

from dachshund_spark.functions import kernels as K
from dachshund_spark.functions.textops import gopher_repetition
from dachshund_spark.operators.mis import luby_mis


def _edges_df(spark, rows, schema="src long, dst long"):
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# Luby MIS
# --------------------------------------------------------------------------


def _assert_mis_properties(edges, members):
    adj = K.build_undirected_adj(edges)
    mem = set(members)
    for v, ns in adj.items():
        simple = ns - {v}
        if v in mem:
            assert not (simple & mem), f"MIS members {v} adjacent"
        elif simple:
            assert simple & mem, f"non-member {v} has no MIS neighbor"


def test_luby_mis_matches_kernel_random_graph(spark):
    rng = random.Random(11)
    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    for _ in range(300):
        a, b = rng.sample(range(n), 2)
        edges.append((a, b))
    got = {
        r["v"]: r["mis_round"]
        for r in luby_mis(_edges_df(spark, edges), seed=3).collect()
    }
    want = K.luby_mis(K.build_undirected_adj(edges), seed=3)
    assert got == want
    _assert_mis_properties(edges, got)


def test_luby_mis_path_and_selfloop_and_seed(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (7, 7), (8, 9)]
    # self-loop-only vertex 7 is dropped with its loop (not a graph vertex
    # in the canonical simple form, same contract as random_walks)
    df = _edges_df(spark, edges)
    for seed in (0, 1):
        got = {r["v"]: r["mis_round"] for r in luby_mis(df, seed=seed).collect()}
        want = K.luby_mis(K.build_undirected_adj(edges), seed=seed)
        want.pop(7, None)
        assert got == want
        _assert_mis_properties([e for e in edges if e != (7, 7)], got)
    # different seeds explore different priorities on the same graph but
    # both outputs are valid MISes (checked above); determinism per seed:
    again = {r["v"]: r["mis_round"] for r in luby_mis(df, seed=0).collect()}
    assert again == {
        r["v"]: r["mis_round"] for r in luby_mis(df, seed=0).collect()
    }


def test_luby_mis_star_and_empty(spark):
    # star: either the hub alone or all leaves win — maximality either way
    star = [(0, i) for i in range(1, 30)]
    got = {r["v"] for r in luby_mis(_edges_df(spark, star), seed=0).collect()}
    assert got == set(K.luby_mis(K.build_undirected_adj(star), seed=0))
    _assert_mis_properties(star, got)
    empty = _edges_df(spark, star).filter("src < 0")
    assert luby_mis(empty).count() == 0


# --------------------------------------------------------------------------
# Gopher repetition signals
# --------------------------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gopher_repetition_hand_computed(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" x3,
    # chars(ab)=2 -> 6/6 = 1.0; 3-grams top "a b a" x2 -> 2*3/6 = 1.0;
    # 5-grams: "a b a b a" x1, "b a b a b" x1 -> no dups -> 0.0
    rows = {
        r["doc_id"]: r
        for r in gopher_repetition(
            _docs_df(spark, ["a b a b a b", "xy zq wk", ""])
        ).collect()
    }
    assert rows[0]["top_2gram_frac"] == 1.0
    assert rows[0]["top_3gram_frac"] == 1.0
    assert rows[0]["dup_5gram_frac"] == 0.0
    # all-distinct doc: top 2-gram "xy zq" once -> 4/6; top 3-gram once
    # -> 6/6; too short for any duplicate 5-gram
    assert rows[1]["top_2gram_frac"] == round(4 / 6, 6)
    assert rows[1]["top_3gram_frac"] == 1.0
    assert rows[1]["dup_5gram_frac"] == 0.0
    # empty text: all zero, still one output row per input doc
    assert rows[2]["top_2gram_frac"] == 0.0
    assert rows[2]["dup_5gram_frac"] == 0.0
    assert len(rows) == 3


def test_gopher_repetition_dup_5gram(spark):
    # "w1..w5 w1..w5 w1..w5": the 5-gram "w1 w2 w3 w4 w5" occurs 3x (plus
    # the rotations twice each); every 5-gram is duplicated, so coverage
    # is occurrence-weighted: sum(cnt*10 chars) over dup 5-grams / 30
    text = " ".join(["w1", "w2", "w3", "w4", "w5"] * 3)
    r = gopher_repetition(_docs_df(spark, [text])).collect()[0]
    # 11 5-gram positions, all duplicated (each distinct gram appears 2-3x)
    # -> occurrence-weighted chars = 11 * 10 = 110 over 30 non-space chars
    assert r["dup_5gram_frac"] == round(110 / 30, 6)
    assert r["top_2gram_frac"] == round(3 * 4 / 30, 6)
