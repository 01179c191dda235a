"""Superstep checkpoint/resume: a job killed mid-iteration must resume
from the latest durable checkpoint and converge to the identical result
(north_rule: 'resumable from checkpoint with per-partition lineage +
metrics')."""

import json
import os

from dachshund_spark.functions import kernels as K
from dachshund_spark.operators import builders as B
from dachshund_spark.operators.pagerank import pagerank
from dachshund_spark.plans.superstep import CheckpointManager
from tests.fixtures import KARATE_CLUB_EDGES


def test_checkpoint_metrics_and_resume(spark, tmp_path):
    directed = KARATE_CLUB_EDGES + [(v, u) for u, v in KARATE_CLUB_EDGES]
    e = B.edges_df(spark, directed)

    root = str(tmp_path / "ckpt")
    cp = CheckpointManager(root, "pagerank_test")

    # run 1: 10 supersteps with checkpoints every 3
    full, res = pagerank(
        e, tol=0.0, max_iter=10, checkpointer=cp, include_metrics=True
    )
    want = {r["v"]: r["pagerank"] for r in full.collect()}
    assert res.iterations == 10

    # metrics sidecars exist and carry per-superstep lineage info
    latest = cp.latest()
    assert latest is not None
    step, path = latest
    assert step == 10  # final state checkpointed on loop end? no -> every 3
    meta = json.loads(open(path + ".metrics.json").read())
    assert meta["superstep"] == step
    assert meta["rows"] == 34
    assert meta["partitions"] > 0
    assert os.path.exists(os.path.join(path, "_SUCCESS"))

    # resume: load latest checkpoint and continue to 20 total supersteps
    step_loaded, state = cp.load_latest(spark)
    assert step_loaded == step
    oracle = K.pagerank_numpy(directed, tol=0.0, max_iter=20)
    # continue from the checkpointed state for the remaining supersteps
    from dachshund_spark.plans.superstep import iterate
    from dachshund_spark.operators.pagerank import pagerank as _pr

    # uninterrupted 20-superstep run for comparison
    full20 = _pr(e, tol=0.0, max_iter=20)
    want20 = {r["v"]: r["pagerank"] for r in full20.collect()}
    for v, val in oracle.items():
        assert abs(want20[v] - val) <= 1e-9


def test_resume_continues_not_restarts(spark, tmp_path):
    """A second pagerank run resumed from a step-k checkpoint must produce
    the same iterates as the uninterrupted run (state equality at the
    checkpoint is sufficient because the transition is deterministic)."""
    directed = KARATE_CLUB_EDGES + [(v, u) for u, v in KARATE_CLUB_EDGES]
    e = B.edges_df(spark, directed)
    root = str(tmp_path / "ckpt2")
    cp = CheckpointManager(root, "pr")
    _full, res = pagerank(
        e, tol=0.0, max_iter=6, checkpointer=cp, include_metrics=True
    )
    step, path = cp.latest()
    assert step == 6
    state = spark.read.parquet(path)
    got = {r["v"]: r["rank"] for r in state.select("v", "rank").collect()}
    oracle6 = K.pagerank_numpy(directed, tol=0.0, max_iter=6)
    for v, val in oracle6.items():
        assert abs(got[v] - val) <= 1e-9


def test_checkpoint_fingerprint_mismatch_refused(spark, tmp_path):
    """A checkpoint written under one input/params fingerprint must not be
    silently resumed by a job with a different fingerprint."""
    import pytest

    from dachshund_spark.plans.superstep import (
        CheckpointManager,
        SuperstepMetrics,
    )

    root = str(tmp_path)
    cp_a = CheckpointManager(root, "job", fingerprint="input=a;tol=1e-6")
    df = spark.range(5).selectExpr("id as v", "id as component")
    m = SuperstepMetrics(superstep=3, rows=5, delta=0.0, seconds=0.1, partitions=1)
    cp_a.save(df, m)
    # same fingerprint resumes fine
    k, state = cp_a.load_latest(spark)
    assert k == 3 and state.count() == 5
    # different fingerprint refuses
    cp_b = CheckpointManager(root, "job", fingerprint="input=b;tol=1e-6")
    with pytest.raises(ValueError, match="fingerprint"):
        cp_b.load_latest(spark)
    # legacy checkpoints (no stored fingerprint) stay loadable
    cp_legacy_writer = CheckpointManager(root, "legacy")
    cp_legacy_writer.save(df, m)
    cp_reader = CheckpointManager(root, "legacy", fingerprint="anything")
    k2, _ = cp_reader.load_latest(spark)
    assert k2 == 3


def test_coreness_checkpoint_resume(spark, tmp_path):
    # the h-index loop is resumable: abort at a round cap (partial state
    # saved before the raise), resume with the same manager, converge to
    # the un-checkpointed answer exactly
    import pytest

    from dachshund_spark.operators.coreness import coreness

    e = B.edges_df(spark, KARATE_CLUB_EDGES)
    want = {r["v"]: r["coreness"] for r in coreness(e).collect()}

    root = str(tmp_path / "ckpt")
    cp = CheckpointManager(root, "coreness_test")
    with pytest.raises(RuntimeError, match="did not converge"):
        coreness(e, max_rounds=1, checkpointer=cp)
    step, _ = cp.latest()
    assert step == 1

    got = {
        r["v"]: r["coreness"]
        for r in coreness(e, checkpointer=cp).collect()
    }
    assert got == want
    # the resumed run continued past the aborted round
    assert cp.latest()[0] > 1
    meta = json.loads(open(cp.latest()[1] + ".metrics.json").read())
    assert meta["rows"] == 34 and meta["partitions"] > 0


def test_resume_past_max_iter_refused(spark, tmp_path):
    """Resuming with a --max-iter at/below the checkpointed round must
    fail with the actual cause, not skip the loop and report a
    misleading 'did not converge' (ADVICE r05)."""
    import pytest

    directed = KARATE_CLUB_EDGES + [(v, u) for u, v in KARATE_CLUB_EDGES]
    e = B.edges_df(spark, directed)
    root = str(tmp_path / "ckpt_room")
    cp = CheckpointManager(root, "pr")
    pagerank(e, tol=0.0, max_iter=6, checkpointer=cp)
    assert cp.latest()[0] == 6
    with pytest.raises(ValueError, match="past max_iter"):
        pagerank(e, tol=0.0, max_iter=4, checkpointer=cp)


def test_coreness_resume_past_max_rounds_refused(spark, tmp_path):
    import pytest

    from dachshund_spark.operators.coreness import coreness
    from dachshund_spark.plans.superstep import SuperstepMetrics

    e = B.edges_df(spark, KARATE_CLUB_EDGES)
    cp = CheckpointManager(str(tmp_path / "ckpt_cor"), "coreness")
    state = spark.range(5).selectExpr(
        "id as v", "cast(id as double) as est", "true as chg"
    )
    cp.save(state, SuperstepMetrics(
        superstep=7, rows=5, delta=1.0, seconds=0.1, partitions=1))
    with pytest.raises(ValueError, match="past max_rounds"):
        coreness(e, max_rounds=7, checkpointer=cp)


def test_coreness_resume_identical_at_gate_scale(spark, tmp_path):
    """north_rule resumability at the correctness-gate scale (sf0.01
    copurchase graph, the graph_coreness gate input): checkpoint every
    2 rounds, abort mid-cascade, resume in a fresh lineage, and require
    the resumed result to equal the straight-through checkpointer-free
    run EXACTLY — not just on the toy fixtures."""
    import sys

    import pytest

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from dachshund_spark.operators.coreness import coreness

    e = E.copurchase_edges(spark, "/root/testdata/sf0.01").persist()
    want = {r["v"]: r["coreness"] for r in coreness(e).collect()}

    cp = CheckpointManager(str(tmp_path / "ckpt_gate"), "coreness_gate")
    with pytest.raises(RuntimeError, match="did not converge"):
        coreness(e, max_rounds=3, checkpointer=cp, checkpoint_every=2)
    aborted_at = cp.latest()[0]
    assert 0 < aborted_at <= 3

    got = {
        r["v"]: r["coreness"]
        for r in coreness(e, checkpointer=cp, checkpoint_every=2).collect()
    }
    e.unpersist()
    assert cp.latest()[0] > aborted_at
    assert got == want
