"""bench_extra.py — round-7 optimization instrumentation (guide §1).

NOT part of the frozen driver contract (bench.py is untouched).  This
harness isolates each headline query against pre-materialized parquet
inputs, labels jobs, and pulls per-stage task metrics from the Spark UI
REST API so time can be attributed to executor compute vs. scheduling /
shuffle / Python boundary — the "measure first" loop.

Usage:
  python bench_extra.py --materialize          # write inputs to /dev/shm
  python bench_extra.py pagerank coreness ...  # run + profile queries
  python bench_extra.py --list
Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_CONF
(last-wins session overrides for A/B runs, see session.get_spark).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

INPUTS = "/dev/shm/r07_inputs"
UI_PORT = 4055


def get_session(cpus: int):
    from dachshund_spark.session import get_spark

    extra = {
        "spark.ui.enabled": "true",
        "spark.ui.port": str(UI_PORT),
        "spark.driver.memory": "20g",
    }
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/dachshund_spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="bench_extra_r07",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def materialize(spark, sf_dir: str, n_pages: int):
    import __spark_entry__ as E
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.sources.pages import edges_from_extracted, synthesize_pages

    os.makedirs(INPUTS, exist_ok=True)
    pages = synthesize_pages(spark, n_pages, n_sites=997, n_hubs=64, seed=42)
    edges_from_extracted(extract(pages)).write.mode("overwrite").parquet(
        f"{INPUTS}/page_edges"
    )
    E.copurchase_edges(spark, sf_dir).write.mode("overwrite").parquet(
        f"{INPUTS}/cp_edges"
    )
    E.event_cyc_edges(spark, sf_dir).write.mode("overwrite").parquet(
        f"{INPUTS}/cyc_edges"
    )
    E.event_chain_edges(spark, sf_dir).write.mode("overwrite").parquet(
        f"{INPUTS}/chain_edges"
    )
    print("materialized:", os.listdir(INPUTS))


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stages():
    apps = _rest("applications")
    app_id = apps[0]["id"]
    out = {}
    for st in _rest(f"applications/{app_id}/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = st
    return out


def profile(name: str, fn, spark, cpus: int):
    spark.sparkContext._jvm.System.gc()
    before = _stages()
    spark.sparkContext.setJobDescription(f"r07:{name}")
    t0 = time.time()
    result = fn()
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    after = _stages()
    new = [v for k, v in after.items() if k not in before]
    tot_run = sum(s.get("executorRunTime", 0) for s in new)
    tot_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e6
    tot_tasks = sum(s.get("numCompleteTasks", 0) for s in new)
    tot_sread = sum(s.get("shuffleReadBytes", 0) for s in new)
    tot_swrite = sum(s.get("shuffleWriteBytes", 0) for s in new)
    tot_fetch = sum(s.get("shuffleFetchWaitTime", 0) for s in new)
    tot_deser = sum(s.get("executorDeserializeTime", 0) for s in new)
    # wall-clock footprint of stages (sum of per-stage spans; overlapping
    # stages double-count, gaps between stages are driver-side time)
    span = 0.0
    for s in new:
        try:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            com = s.get("completionTime")
            if sub and com:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                span += (
                    datetime.strptime(com, fmt) - datetime.strptime(sub, fmt)
                ).total_seconds()
        except Exception:
            pass
    rep = {
        "query": name,
        "wall_sec": round(wall, 3),
        "n_stages": len(new),
        "n_tasks": tot_tasks,
        "stage_span_sec": round(span, 2),
        "driver_gap_sec": round(max(0.0, wall - span), 2),
        "executor_run_sec": round(tot_run / 1e3, 2),
        "executor_cpu_sec": round(tot_cpu / 1e3, 2),
        "deserialize_sec": round(tot_deser / 1e3, 2),
        "fetch_wait_sec": round(tot_fetch / 1e3, 2),
        "shuffle_read_mb": round(tot_sread / 1e6, 1),
        "shuffle_write_mb": round(tot_swrite / 1e6, 1),
        "core_utilization": round(tot_run / 1e3 / (wall * cpus), 3),
        "result": result,
    }
    print("PROFILE " + json.dumps(rep))
    # top stages by executor run time
    top = sorted(new, key=lambda s: -s.get("executorRunTime", 0))[:8]
    for s in top:
        print(
            f"  stage {s['stageId']:>4} tasks={s.get('numCompleteTasks', 0):>3} "
            f"run={s.get('executorRunTime', 0)/1e3:7.2f}s "
            f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
            f"sr={s.get('shuffleReadBytes', 0)/1e6:7.1f}MB "
            f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB  {s.get('name', '')[:70]}"
        )
    return rep


def queries(spark, sf_dir: str, n_pages: int):
    """name -> zero-arg callable replicating the bench.py timed block, but
    over the materialized parquet inputs (graph queries) so runs isolate
    the operator, not the fixture derivation."""
    from pyspark.sql import functions as F

    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.anf import anf_harmonic_centrality, anf_sketches
    from dachshund_spark.operators.centrality import (
        betweenness,
        betweenness_superstep,
    )
    from dachshund_spark.operators.components import (
        connected_components,
        connected_components_two_phase,
        strongly_connected_components,
    )
    from dachshund_spark.operators.coreness import coreness, k_truss_edges
    from dachshund_spark.operators.hits import hits
    from dachshund_spark.operators.label_propagation import label_propagation
    from dachshund_spark.operators.louvain import louvain_moves
    from dachshund_spark.operators.pagerank import pagerank
    from dachshund_spark.operators.triangles import global_stats
    from dachshund_spark.sources.pages import edges_from_extracted, synthesize_pages

    def rd(name):
        return spark.read.parquet(f"{INPUTS}/{name}")

    def _extract():
        pages = synthesize_pages(spark, n_pages, n_sites=997, n_hubs=64, seed=42)
        e = edges_from_extracted(extract(pages)).persist()
        n = e.count()
        e.unpersist()
        return n

    def _pagerank(impl):
        def f():
            e = rd("page_edges").persist()
            e.count()
            pr, res = pagerank(
                e, tol=0.0, max_iter=10, impl=impl, include_metrics=True,
                block_size=1,
            )
            n = pr.count()
            e.unpersist()
            return {"rows": n, "block_secs": [m.seconds for m in res.metrics]}
        return f

    def _cc():
        e = rd("page_edges").persist()
        e.count()
        n = connected_components(e, max_iter=50).select("component").distinct().count()
        e.unpersist()
        return n

    def _lp():
        e = rd("page_edges").persist()
        e.count()
        n = label_propagation(e, max_iter=5).count()
        e.unpersist()
        return n

    def _hits():
        e = rd("page_edges").persist()
        e.count()
        n = hits(e, max_iter=8).count()
        e.unpersist()
        return n

    def _tri():
        cp = rd("cp_edges").persist()
        cp.count()
        st = global_stats(cp)
        cp.unpersist()
        return st["triangles"]

    def _coreness():
        cp = rd("cp_edges").persist()
        cp.count()
        r = coreness(cp).agg(F.max("coreness")).collect()[0][0]
        cp.unpersist()
        return r

    def _ktruss():
        cp = rd("cp_edges").persist()
        cp.count()
        n = k_truss_edges(cp, 10).count()
        cp.unpersist()
        return n

    def _bet(fn_name):
        def f():
            cp = rd("cp_edges").persist()
            cp.count()
            fn = betweenness if fn_name == "taskpar" else betweenness_superstep
            n = fn(cp, max_sources=100, seed=0).count()
            cp.unpersist()
            return n
        return f

    def _anf(kind):
        def f():
            cp = rd("cp_edges").persist()
            cp.count()
            fn = anf_sketches if kind == "sketch" else anf_harmonic_centrality
            n = fn(cp, rounds=3, k=8).count()
            cp.unpersist()
            return n
        return f

    def _louvain():
        cp = rd("cp_edges").persist()
        cp.count()
        n = louvain_moves(cp, max_rounds=6).select("community").distinct().count()
        cp.unpersist()
        return n

    def _scc():
        n = strongly_connected_components(rd("cyc_edges"), max_outer=60).count()
        return n

    def _cc2():
        return connected_components_two_phase(rd("chain_edges")).count()

    def _entry(name):
        def f():
            import __spark_entry__ as E

            return E.queries()[name](spark, sf_dir).count()
        return f

    return {
        "extract": _extract,
        "pagerank": _pagerank("sql"),
        "pagerank_csr": _pagerank("csr"),
        "cc": _cc,
        "lp": _lp,
        "hits": _hits,
        "triangles": _tri,
        "coreness": _coreness,
        "ktruss": _ktruss,
        "bet_taskpar": _bet("taskpar"),
        "bet_superstep": _bet("superstep"),
        "anf_sketch": _anf("sketch"),
        "anf_harmonic": _anf("harmonic"),
        "louvain": _louvain,
        "scc": _scc,
        "cc_twophase": _cc2,
        "tpch_q1": _entry("tpch_q1_pricing_summary"),
        "events_user_activity": _entry("events_user_activity"),
        "doc_quality": _entry("doc_quality_scores"),
        "minhash": _entry("doc_minhash_lsh_pairs"),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_pages = max(2000, int(2_000_000 * sf))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_session(cpus)
    if "--materialize" in sys.argv:
        materialize(spark, sf_dir, n_pages)
        spark.stop()
        return
    qs = queries(spark, sf_dir, n_pages)
    if "--list" in sys.argv:
        print(" ".join(qs))
        spark.stop()
        return
    reports = []
    for name in args:
        reports.append(profile(name, qs[name], spark, cpus))
    print("SUMMARY " + json.dumps(
        {r["query"]: r["wall_sec"] for r in reports}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
