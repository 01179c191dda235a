"""SparkSession construction with the engine's standard configuration.

Tuned for iterative link-graph supersteps: AQE on (runtime coalescing +
skew-join splitting), Arrow enabled for every pandas-UDF boundary, and a
shuffle-partition default that callers scale with input size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS = {
    # Adaptive execution: runtime shuffle coalescing and skew-join splitting
    # are the first line of defense for power-law degree distributions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE rewrite sort-merge joins to shuffled-hash at runtime when
    # every post-shuffle partition is under 64 MB (default 0 = never).
    # The iterative engine's states are stats-free lineage-cut leaves,
    # so the static planner falls to SMJ wherever no explicit hint
    # applies; this conversion uses ACTUAL runtime sizes, so it is
    # scale-safe by construction (it simply never fires when partitions
    # are big) and the 64 MB per-partition local map is bounded memory.
    # Measured (BENCH/AB_SHJ_THRESHOLD_r07.txt, interleaved cold pairs,
    # outputs md5-identical): betweenness_superstep 2/2 at -23%,
    # coreness 2/2 at -8%, k_truss 2/2 at -8%.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(
        64 * 1024 * 1024
    ),
    # Arrow for applyInPandas / mapInPandas — vectorized, no per-row Python.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Iterative jobs re-plan every superstep; keep plan strings cheap.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # iterative drivers log their own per-superstep metrics; the console
    # progress bar only garbles harness output
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "dachshund_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]); on a real
    cluster pass master=None with spark-submit providing the master.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)
    for k, v in DEFAULT_CONFIGS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    # last-wins overrides from the environment, e.g.
    #   SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;spark.foo=bar"
    # (used by bench children to A/B runtime settings without code edits)
    for pair in os.environ.get("SPARK_GRAFT_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
