"""node2vec biased walks vs their sequential kernel, and the
deterministic per-key sampler."""

import random

from dachshund_spark.functions import kernels as K
from dachshund_spark.functions.sampling import deterministic_sample
from dachshund_spark.operators.walks import node2vec_walks


def _edges_df(spark, rows, schema="src long, dst long"):
    return spark.createDataFrame(rows, schema)


def test_node2vec_matches_kernel_random_graph(spark):
    rng = random.Random(5)
    n = 60
    edges = [(i, i + 1) for i in range(n - 1)]
    for _ in range(150):
        a, b = rng.sample(range(n), 2)
        edges.append((a, b))
    df = _edges_df(spark, edges)
    got = sorted(
        tuple(r)
        for r in node2vec_walks(
            df, walks_per_vertex=2, length=5, p=4.0, q=0.25, seed=9
        ).collect()
    )
    want = sorted(
        K.node2vec_seeded_walks(
            K.build_undirected_adj(edges), 2, 5, 4.0, 0.25, 9
        )
    )
    assert got == want
    # every consecutive (step, step+1) pair is a graph edge
    adj = K.build_undirected_adj(edges)
    pos = {(s, w, i): v for s, w, i, v in got}
    for (s, w, i), v in pos.items():
        if i > 0:
            assert v in adj[pos[(s, w, i - 1)]]


def test_node2vec_return_bias(spark):
    # path 1-2-3: from 2 after arriving via 1, candidates are {1 (return,
    # weight 1/p), 3 (distance 2, weight 1/q)}.  With p huge and q tiny
    # the walk must continue to 3; with p tiny and q huge it must return.
    edges = [(1, 2), (2, 3)]
    df = _edges_df(spark, edges)
    for p, q in ((1e9, 1e-9), (1e-9, 1e9)):
        rows = {
            (r["start"], r["walk"], r["step"]): r["v"]
            for r in node2vec_walks(
                df, walks_per_vertex=1, length=2, p=p, q=q, seed=0
            ).collect()
        }
        for (s, w, i), v in sorted(rows.items()):
            if i != 2:
                continue
            prev2, prev1 = rows[(s, w, 0)], rows[(s, w, 1)]
            if prev1 == 2:  # the only branching vertex
                other = 1 if prev2 == 3 else 3
                # p huge + q tiny -> returning costs 1/p ~ 0: advance to
                # the far neighbor; p tiny + q huge -> return to prev
                expect = other if p > 1 else prev2
                assert v == expect
        want = {
            (s, w, i): v
            for s, w, i, v in K.node2vec_seeded_walks(
                K.build_undirected_adj(edges), 1, 2, p, q, 0
            )
        }
        assert rows == want


def test_deterministic_sample_contract(spark):
    rows = [(u, u * 100 + i, float(i)) for u in range(8) for i in range(12)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    got = deterministic_sample(df, ["user_id"], "event_id", k=5, seed=7)
    pdf = got.toPandas()
    # 5 per key, ranks exactly 1..5, rows are a subset of the input
    assert len(pdf) == 8 * 5
    for u, grp in pdf.groupby("user_id"):
        assert sorted(grp["sample_rank"]) == [1, 2, 3, 4, 5]
    src = {(r[0], r[1]) for r in rows}
    assert all((r.user_id, r.event_id) in src for r in pdf.itertuples())
    # deterministic: same seed identical, different seed differs
    again = deterministic_sample(df, ["user_id"], "event_id", k=5, seed=7)
    assert sorted(map(tuple, pdf.values.tolist())) == sorted(
        map(tuple, again.toPandas().values.tolist())
    )
    other = deterministic_sample(df, ["user_id"], "event_id", k=5, seed=8)
    assert sorted(
        map(tuple, other.toPandas()[["user_id", "event_id"]].values.tolist())
    ) != sorted(map(tuple, pdf[["user_id", "event_id"]].values.tolist()))


def test_deterministic_sample_small_groups(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "user_id long, event_id long"
    )
    pdf = deterministic_sample(df, ["user_id"], "event_id", k=5).toPandas()
    # groups smaller than k keep every row
    assert len(pdf) == 3
    assert set(pdf["sample_rank"]) <= {1, 2}
