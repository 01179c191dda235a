"""Superstep driver loop with lineage control, per-superstep checkpoints,
and metrics — the iterative backbone under PageRank / connected components /
label propagation / peeling.

Spark has no native iterate-to-fixpoint, so iterative algorithms are driver
loops where every iteration appends to the logical plan.  Unchecked, plan
depth grows linearly and job setup cost dominates by iteration ~20 (and at
cluster scale a lost executor replays the whole lineage).  The loop
therefore:

* truncates lineage every ``checkpoint_every`` supersteps — either via
  durable parquet checkpoints (resumable across driver restarts; the
  north-rule requirement) or ``localCheckpoint`` (fast, in-cluster),
* records a metrics row per superstep (rows, delta, wall seconds,
  partition count) next to the checkpoint so a resumed job knows exactly
  where it stopped (per-partition lineage lives in the parquet footer +
  metrics row),
* supports resume: ``run`` starts from the latest durable checkpoint when
  one exists for this job name.

The reference engine has no equivalent (single-process loops,
transformer_base.rs:38-91); this is engine-side machinery our Spark design
needs at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + STATISTICS RESET — the lineage cut every iterative
    loop in this engine must use.

    ``Dataset.localCheckpoint`` deliberately carries the checkpointed
    plan's computed statistics into the new LogicalRDD leaf.  For loops
    built from INNER joins that is a time bomb: Catalyst's size-only
    estimator multiplies children's sizeInBytes at every join, so the
    carried stats compound — round r's leaf estimate is a product of
    round r-1's, and the BigInt digit count grows geometrically (measured
    ~3x per round for the k-truss wedge join: 12 → 35 → 105 → ... digits;
    by round ~15 Catalyst spends MINUTES inside BigInteger.multiply in
    SizeInBytesOnlyStatsPlanVisitor.visitJoin).  Anti/semi-join loops
    survive (their estimate is the left child's), which is why only the
    inner-join loops hit it.

    The reset rebuilds the DataFrame from the checkpointed RDD via
    SparkSession.internalCreateDataFrame, whose LogicalRDD carries no
    inherited stats (leaves fall back to defaultSizeInBytes, keeping every
    later estimate bounded).  Falls back to the plain localCheckpoint if
    the internal API is unavailable."""
    cut = df.localCheckpoint(eager=eager)
    try:
        spark = df.sparkSession
        jdf = cut._jdf
        jrdd = jdf.queryExecution().toRdd()
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        out = DataFrame(new_jdf, spark)
        # handle to the checkpointed RDD so release() can drop its storage
        # blocks deterministically (they otherwise live until the JVM
        # ContextCleaner happens to GC the reference — which accumulates
        # driver/executor heap across a long peel cascade)
        out._cut_rdd = jrdd
        return out
    except Exception:  # pragma: no cover - internal API moved/renamed
        return cut


def superstep_state_side(
    state: DataFrame, n_rows: int | None, threshold: int = 100_000
) -> DataFrame:
    """Join-strategy hint for the O(|V|)-row state side of a superstep
    join against a cached, pre-partitioned edge table.

    The lineage-cut state leaf carries no size statistics, so left to the
    static planner the join either broadcasts the EDGE table (when its
    known cached size is under the broadcast threshold — a serial
    |E|-row build every round) or falls to sort-merge.  The operator,
    unlike the optimizer, KNOWS the state's row count from its own
    per-round aggregate, so it picks deliberately (guide §3.1/§8):

    * ``n_rows < threshold``: broadcast the state — zero exchanges on
      either side, the cheapest possible round (this is also what AQE
      eventually discovers at runtime when nothing is hinted and the
      edge table is over-threshold, measured on the 3x fixture);
    * otherwise: ``shuffle_hash`` — only the state shuffles against the
      cached edges; no per-round broadcast build, no sort, and the only
      shape that scales to states too large to broadcast (pagerank's
      rank-vector discipline; its measured crossover, ~100k rows, is the
      default threshold).
    * ``n_rows`` unknown (first round): shuffle_hash, the safe side.
    """
    if n_rows is not None and n_rows < threshold:
        return state.hint("broadcast")
    return state.hint("shuffle_hash")


def release(df: DataFrame | None) -> None:
    """Free the storage behind an intermediate state DataFrame: the
    locally-checkpointed RDD blocks for a ``cut_lineage`` product, plus any
    regular persist() cache.  Only call on states that nothing downstream
    will read again — a released cut cannot be recomputed (local
    checkpoints discard lineage).

    Executor-loss caveat (real clusters): "nothing downstream reads it"
    must hold through RECOMPUTE paths, not just the happy path.  If a
    successor state is merely persist()ed, its cached blocks still
    lineage-depend on this cut; losing one of those blocks after the
    release makes the successor unrecomputable ("Checkpoint block not
    found" job failure).  The loop invariant every caller follows: a
    successor must itself be a ``cut_lineage`` product, materialized
    before its predecessor is released — then the only loss that matters
    is of the successor's own checkpoint blocks, which is the inherent
    localCheckpoint durability trade (use a CheckpointManager for
    durable-resume jobs)."""
    if df is None:
        return
    jrdd = getattr(df, "_cut_rdd", None)
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:  # pragma: no cover - JVM already torn down
            pass
    try:
        df.unpersist()
    except Exception:  # pragma: no cover
        pass
    # a producer may hand over predecessors whose blocks its OWN lineage
    # still needed (deferred-release window, e.g. a persist-only state
    # returned mid-window): once the caller releases the product, the
    # window is unreachable too
    for dep in getattr(df, "_deferred", ()):  # pragma: no branch
        release(dep)


@dataclass
class SuperstepMetrics:
    superstep: int
    rows: int
    delta: float
    seconds: float
    partitions: int

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[SuperstepMetrics] = field(default_factory=list)


class CheckpointManager:
    """Durable parquet checkpoints for vertex-state DataFrames.

    Layout: ``<root>/<name>/step=<k>/`` (parquet) plus
    ``<root>/<name>/step=<k>.metrics.json``.  A checkpoint is only
    considered complete when the metrics sidecar exists (written after the
    parquet commit), so a killed job can never resume from a torn write.
    """

    def __init__(self, root: str, name: str, fingerprint: str | None = None):
        """``fingerprint`` identifies the input + parameters of the job
        (any stable string, e.g. json of input path/tol/damping/block
        size).  It is stored next to every checkpoint; ``load_latest``
        refuses to resume from state written under a different
        fingerprint — preventing a silent resume of stale state when a
        job is re-run with changed inputs or parameters."""
        self.dir = os.path.join(root, name)
        self.fingerprint = fingerprint
        os.makedirs(self.dir, exist_ok=True)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.dir, f"step={step}")

    def save(self, df: DataFrame, metrics: SuperstepMetrics) -> DataFrame:
        path = self._step_path(metrics.superstep)
        df.write.mode("overwrite").parquet(path)
        payload = json.loads(metrics.to_json())
        if self.fingerprint is not None:
            payload["fingerprint"] = self.fingerprint
        with open(path + ".metrics.json", "w") as f:
            f.write(json.dumps(payload))
        return df.sparkSession.read.parquet(path)

    def latest(self) -> tuple[int, str] | None:
        steps = []
        for entry in os.listdir(self.dir):
            if entry.startswith("step=") and entry.endswith(".metrics.json"):
                steps.append(int(entry[len("step="):-len(".metrics.json")]))
        if not steps:
            return None
        k = max(steps)
        return k, self._step_path(k)

    def load_latest(self, spark) -> tuple[int, DataFrame] | None:
        found = self.latest()
        if found is None:
            return None
        k, path = found
        if self.fingerprint is not None:
            with open(path + ".metrics.json") as f:
                saved = json.load(f).get("fingerprint")
            if saved is not None and saved != self.fingerprint:
                raise ValueError(
                    f"checkpoint {path} was written for a different "
                    f"input/parameter fingerprint ({saved!r} != "
                    f"{self.fingerprint!r}); clear() it or use a new job name"
                )
        return k, spark.read.parquet(path)

    def clear(self):
        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], tuple[DataFrame, float]],
    max_iter: int,
    tol: float = 0.0,
    checkpoint_every: int = 3,
    checkpointer: CheckpointManager | None = None,
    start_iteration: int = 0,
) -> SuperstepResult:
    """Run ``step(state, i) -> (new_state, delta[, rows])`` until
    ``delta <= tol`` or ``max_iter``.  ``delta`` is the algorithm's
    convergence measure (L1 score change, #changed labels, #removed
    vertices...).  A step that already materialized its state may return
    ``rows`` as a third element to avoid a redundant count action — at
    cluster scale, extra per-superstep jobs are pure fixed overhead.

    The returned state is persisted; callers unpersist when done.
    """
    if start_iteration > 0 and start_iteration >= max_iter:
        # a resumed checkpoint already at/past the iteration bound would
        # skip the loop body entirely and die later with a misleading
        # "did not converge" — refuse up front with the actual cause
        raise ValueError(
            f"checkpoint resumes at iteration {start_iteration}, already "
            f"past max_iter={max_iter}; rerun with a larger --max-iter "
            "(or clear the checkpoint dir to restart from scratch)"
        )
    state = state.persist()
    state.count()
    metrics: list[SuperstepMetrics] = []
    # deferred-release window (same discipline as the SCC inner loop): a
    # persist-only round's recompute lineage still reads its predecessors,
    # so superseded states are freed only once a lineage-FREE successor —
    # a cut_lineage leaf or a durable parquet reread — has materialized on
    # top of them.  This replaces the old unpersist-immediately pattern,
    # whose cut-leaf blocks were freed only when the JVM ContextCleaner
    # happened to GC them (measured: driver heap accumulation across a
    # 55-query gate run forced clearCache+gc between queries).
    pending: list[DataFrame] = []
    converged = False
    i = start_iteration
    while i < max_iter:
        t0 = time.time()
        out = step(state, i)
        if len(out) == 3:
            new_state, delta, rows = out
            new_state = new_state.persist()
        else:
            new_state, delta = out
            new_state = new_state.persist()
            rows = new_state.count()
        seconds = time.time() - t0
        i += 1
        m = SuperstepMetrics(
            superstep=i,
            rows=rows,
            delta=float(delta),
            seconds=round(seconds, 4),
            partitions=new_state.rdd.getNumPartitions(),
        )
        metrics.append(m)
        sealed = False
        if checkpointer is not None and (
            i % checkpoint_every == 0 or delta <= tol or i == max_iter
        ):
            reread = checkpointer.save(new_state, m)
            new_state.unpersist()
            new_state = reread.persist()
            new_state.count()
            sealed = True  # parquet reread carries no lineage
        elif i % checkpoint_every == 0 or delta <= tol or i == max_iter:
            # lineage cut without durability (stats reset included); also
            # seals the final round so the returned state never drags a
            # window of superseded predecessors behind it
            cut = cut_lineage(new_state)
            new_state.unpersist()
            new_state = cut
            sealed = True
        if sealed:
            # the lineage-free successor is materialized: every older
            # state in the window is unreachable from anything live
            for p in pending:
                release(p)
            pending.clear()
            release(state)
        else:
            pending.append(state)
        state = new_state
        if delta <= tol:
            converged = True
            break
    return SuperstepResult(
        state=state, iterations=i, converged=converged, metrics=metrics
    )
