"""Self-check harness mirroring the driver's correctness gate: run every
``queries()`` entry through Spark and the matching ``oracle_sql()`` through
DuckDB on the same sf dir; compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df, float_dp=9):
    """pandas DataFrame -> sorted list of value tuples with column-name
    sorting, NaN/None unification, float normalization."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None:
                vals.append(None)
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(None)
                else:
                    vals.append(round(v, float_dp))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from dachshund_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    # kernel oracles derive their expected values from the sf dir being
    # checked (the driver's default is sf0.01 — the gate scale)
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    oracles = E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got_df = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(ex)[:400]}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got_df)} rows (no oracle) [{spark_s:.1f}s]")
            continue
        t0 = time.time()
        try:
            want_df = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(ex)[:400]}")
            continue
        duck_s = time.time() - t0
        gc, gv = normalize(got_df)
        wc, wv = normalize(want_df)
        status = "OK  "
        msg = ""
        if len(gv) != len(wv):
            status = "FAIL"
            msg = f" rows {len(gv)} vs {len(wv)}"
        elif gc != wc:
            status = "FAIL"
            msg = f" cols {gc} vs {wc}"
        elif gv != wv:
            status = "FAIL"
            bad = sum(1 for a, b in zip(gv, wv) if a != b)
            for a, b in zip(gv, wv):
                if a != b:
                    msg = f" {bad} mismatched rows; first: {a} vs {b}"
                    break
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: {len(gv)} rows [spark {spark_s:.1f}s, duckdb {duck_s:.1f}s]{msg}"
        )
        # between-query hygiene: drop leftover caches and release py4j
        # proxies so the JVM ContextCleaner can free localCheckpoint RDD
        # blocks — a 55-query sf0.1 run otherwise accumulates enough
        # driver-heap block data to OOM near the end of the session
        spark.catalog.clearCache()
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
