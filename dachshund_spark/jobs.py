"""spark-submit entry points (north_rule: 'ships as spark-submit
--py-files jobs').

Inputs/outputs accept EITHER a parquet path or an Iceberg/catalog table
reference (``iceberg:<catalog>.<db>.<table>`` or ``table:<name>``) — see
sources/io.py; on a cluster with an Iceberg catalog configured the same
CLI runs against catalog tables verbatim.

Usage:
  spark-submit --py-files dachshund_spark.zip -m dachshund_spark.jobs \
      <job> [options]

Jobs:
  extract     pages table/parquet -> edge table (+ url dim)
  pagerank    edge parquet -> (v, pagerank) parquet; resumable
  cc          edge parquet -> (v, component) parquet; resumable
  lp          edge parquet -> (v, label) parquet
  triangles   edge parquet -> (v, triangles) parquet + global stats JSON
  coreness    edge parquet -> (v, coreness) parquet
  featurize   (graph_id, src, dst) parquet -> per-graph feature JSON
  cliques     typed-edge parquet -> wide clique rows
  salsa       edge parquet -> (v, hub, authority) parquet
  matching    edge parquet -> (a, b) maximal-matching parquet
  louvain     edge parquet -> (v, community) parquet

Every iterative job accepts --checkpoint-dir; when a checkpoint for the
job name exists there, the run resumes from the latest superstep.
"""

from __future__ import annotations

import argparse
import json
import sys

from .session import get_spark
from .sources.io import read_table, write_table


def main(argv=None, _spark=None):
    """``_spark``: session injection for in-process tests (skips the
    get_spark/stop lifecycle the CLI owns)."""
    p = argparse.ArgumentParser(prog="dachshund_spark.jobs")
    p.add_argument("job", choices=[
        "extract", "pagerank", "hits", "cc", "lp", "triangles", "coreness",
        "ktruss", "scc", "bowtie", "harmonic", "featurize", "cliques",
        "sessions", "mst", "topo", "walks", "mis", "trussness", "salsa",
        "matching", "louvain",
    ])
    p.add_argument("--input", required=True, help="input parquet path")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--impl", default="sql",
                   choices=["sql", "csr", "sketch", "exact"])
    p.add_argument("--max-sources", type=int, default=100,
                   help="sampled sources (harmonic --impl exact)")
    p.add_argument("--block-size", type=int, default=1,
                   help="supersteps chained per Spark action (pagerank)")
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--typespec", default=None, help="JSON typespec for cliques")
    p.add_argument("--weight-col", default="weight",
                   help="edge weight column (mst)")
    p.add_argument("--walks-per-vertex", type=int, default=1,
                   help="walks started per vertex (walks)")
    p.add_argument("--walk-length", type=int, default=10,
                   help="steps per walk (walks)")
    p.add_argument("--seed", type=int, default=0,
                   help="determinism seed (walks, mis)")
    p.add_argument("--p", type=float, default=1.0,
                   help="node2vec return parameter (walks; p or q != 1 "
                        "switches to second-order biased walks)")
    p.add_argument("--q", type=float, default=1.0,
                   help="node2vec in-out parameter (walks)")
    p.add_argument("--gap", default="30 minutes",
                   help="session merge gap (sessions)")
    p.add_argument("--watermark", default="2 hours",
                   help="late-data watermark (sessions)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    spark = _spark or get_spark(
        app_name=f"dachshund_{args.job}",
        shuffle_partitions=args.shuffle_partitions,
    )
    cp = None
    if args.checkpoint_dir:
        from .plans.superstep import CheckpointManager

        # fingerprint = input + every parameter that shapes per-round
        # STATE; a resume against checkpoints written for different inputs
        # or parameters is refused rather than silently continued.
        # max_iter is deliberately excluded: it only bounds the loop, and
        # the documented abort-recovery path is "rerun with a larger
        # --max-iter to resume" — including it would change the
        # fingerprint on exactly that rerun and refuse the resume.
        fp = json.dumps(
            {
                "input": args.input,
                "tol": args.tol,
                "damping": args.damping,
                "impl": args.impl,
                "block_size": args.block_size,
            },
            sort_keys=True,
        )
        cp = CheckpointManager(args.checkpoint_dir, args.job, fingerprint=fp)

    if args.job == "extract":
        from .functions.extraction import extract
        from .sources.pages import edges_from_extracted

        pages = read_table(spark, args.input)
        edges = edges_from_extracted(extract(pages))
        write_table(edges, args.output)
    elif args.job == "pagerank":
        from .operators.pagerank import pagerank

        edges = read_table(spark, args.input)
        out, res = pagerank(
            edges,
            damping=args.damping,
            tol=args.tol,
            max_iter=args.max_iter,
            impl=args.impl,
            checkpointer=cp,
            include_metrics=True,
            block_size=args.block_size,
        )
        write_table(out, args.output)
        print(json.dumps({
            "iterations": res.iterations,
            "converged": res.converged,
            "metrics": [m.__dict__ for m in res.metrics],
        }))
    elif args.job == "hits":
        from .operators.hits import hits

        edges = read_table(spark, args.input)
        # --max-iter defaults to 100, far past HITS' practical fixpoint;
        # the operator runs the fixed count (no tolerance stop — the two
        # L1-normalized vectors converge geometrically)
        out = hits(edges, max_iter=args.max_iter)
        write_table(out, args.output)
    elif args.job == "cc":
        from .operators.components import connected_components

        edges = read_table(spark, args.input)
        out = connected_components(edges, max_iter=args.max_iter, checkpointer=cp)
        write_table(out, args.output)
    elif args.job == "lp":
        from .operators.label_propagation import label_propagation

        edges = read_table(spark, args.input)
        out = label_propagation(edges, max_iter=args.max_iter, checkpointer=cp)
        write_table(out, args.output)
    elif args.job == "triangles":
        from .operators.triangles import global_stats, triangle_counts

        edges = read_table(spark, args.input)
        write_table(triangle_counts(edges), args.output)
        print(json.dumps(global_stats(edges)))
    elif args.job == "coreness":
        from .operators.coreness import coreness

        edges = read_table(spark, args.input)
        # --max-iter defaults to 100 for the superstep jobs; the h-index
        # cascade legitimately runs longer, so scale it here rather than
        # surprising pagerank/cc with a huge default
        write_table(
            coreness(edges, max_rounds=args.max_iter * 100, checkpointer=cp),
            args.output,
        )
    elif args.job == "featurize":
        from .operators.pergraph import featurize

        edges = read_table(spark, args.input)
        write_table(featurize(edges), args.output)
    elif args.job == "ktruss":
        from .operators.coreness import k_truss_edges

        edges = read_table(spark, args.input)
        write_table(k_truss_edges(edges, args.k), args.output)
    elif args.job == "scc":
        from .operators.components import strongly_connected_components

        edges = read_table(spark, args.input)
        write_table(
            strongly_connected_components(edges, max_iter=args.max_iter),
            args.output,
        )
    elif args.job == "bowtie":
        from .operators.bowtie import bowtie_decomposition

        edges = read_table(spark, args.input)
        write_table(bowtie_decomposition(edges), args.output)
    elif args.job == "harmonic":
        edges = read_table(spark, args.input)
        if args.impl == "exact":
            from .operators.centrality import harmonic_centrality

            out = harmonic_centrality(edges, max_sources=args.max_sources)
        else:
            from .operators.anf import anf_harmonic_centrality

            # rounds from --max-iter (small by construction: ball radius)
            out = anf_harmonic_centrality(
                edges, rounds=min(args.max_iter, 16)
            )
        write_table(out, args.output)
    elif args.job == "mst":
        from .operators.mst import minimum_spanning_forest

        edges = read_table(spark, args.input)
        write_table(
            minimum_spanning_forest(edges, weight_col=args.weight_col),
            args.output,
        )
    elif args.job == "topo":
        from .operators.dag import topological_levels

        edges = read_table(spark, args.input)
        write_table(topological_levels(edges), args.output)
    elif args.job == "walks":
        edges = read_table(spark, args.input)
        if args.p != 1.0 or args.q != 1.0:
            from .operators.walks import node2vec_walks

            out = node2vec_walks(
                edges,
                walks_per_vertex=args.walks_per_vertex,
                length=args.walk_length,
                p=args.p,
                q=args.q,
                seed=args.seed,
            )
        else:
            from .operators.walks import random_walks

            out = random_walks(
                edges,
                walks_per_vertex=args.walks_per_vertex,
                length=args.walk_length,
                seed=args.seed,
            )
        write_table(out, args.output)
    elif args.job == "trussness":
        from .operators.coreness import trussness

        edges = read_table(spark, args.input)
        write_table(trussness(edges), args.output)
    elif args.job == "mis":
        from .operators.mis import luby_mis

        edges = read_table(spark, args.input)
        write_table(luby_mis(edges, seed=args.seed), args.output)
    elif args.job == "salsa":
        from .operators.salsa import salsa

        edges = read_table(spark, args.input)
        # --max-iter defaults to 100, far past SALSA's practical fixpoint
        write_table(salsa(edges, max_iter=min(args.max_iter, 50)), args.output)
    elif args.job == "matching":
        from .operators.matching import greedy_matching

        edges = read_table(spark, args.input)
        write_table(greedy_matching(edges), args.output)
    elif args.job == "louvain":
        from .operators.louvain import louvain_moves

        edges = read_table(spark, args.input)
        # fixed gated-round count is part of the spec (no early exit);
        # default to the gate's 6 rounds rather than --max-iter's 100
        write_table(
            louvain_moves(edges, max_rounds=min(args.max_iter, 6)),
            args.output,
        )
    elif args.job == "sessions":
        # Structured Streaming end-to-end: file source -> session_window
        # aggregation -> parquet sink, bounded by the availableNow
        # trigger.  Append mode emits only sessions FINALIZED by the
        # watermark (sessions newer than max(ts) - watermark stay in
        # state), which is the correct incremental-backfill semantics; the
        # batch form (entry query events_sessions) is the completeness
        # oracle.  The streaming sink requires a checkpointLocation — it
        # doubles as the resume point for incremental re-runs over a
        # growing input directory.
        from .streaming.events import stream_session_stats

        sdf = stream_session_stats(
            spark, args.input, gap=args.gap, watermark=args.watermark
        )
        ckpt = args.checkpoint_dir or args.output.rstrip("/") + "_ckpt"
        q = (
            sdf.writeStream.outputMode("append")
            .format("parquet")
            .option("path", args.output)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"job": "sessions", "finalized_sessions": n}))
    elif args.job == "cliques":
        from .functions.clique_kernel import SearchProblem
        from .operators.clique_miner import mine_cliques

        typespec = json.loads(args.typespec)
        edges = read_table(spark, args.input)
        write_table(
            mine_cliques(edges, typespec, SearchProblem()), args.output
        )
    if _spark is None:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
